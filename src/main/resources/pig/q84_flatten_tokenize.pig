-- FLATTEN(TOKENIZE(...)) word count (the canonical Pig script)
D = LOAD '$DIR/documents.parquet' USING parquet;
T = FOREACH D GENERATE doc_id, FLATTEN(TOKENIZE(LOWER(text))) AS token;
F = FILTER T BY token matches '[a-z]{6,}';
G = GROUP F BY token;
A = FOREACH G GENERATE group AS token, COUNT_STAR(F) AS n;
H = FILTER A BY n >= 2;
STORE H INTO '/tmp/graft_pig_out/q84' USING parquet;
