-- ORDER ... USING a case-insensitive comparator (honored as
-- lower(key) + raw-key-tiebreak sort keys). Half the rows get an
-- UPPER()'d key, so a case-SENSITIVE sort would put every even
-- doc_id first (ASCII upper < lower) and select a provably different
-- LIMIT set — the comparator semantics, not just the ordering, are
-- what the oracle checks.
D = LOAD '$DIR/documents.parquet' USING parquet;
K = FOREACH D GENERATE doc_id, (doc_id % 2 == 0 ? UPPER(text) : text) AS k;
S = ORDER K BY k USING org.example.CaseInsensitiveComparator;
T = LIMIT S 25;
STORE T INTO '/tmp/graft_pig_out/q131' USING parquet;
