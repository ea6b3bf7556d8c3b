-- nested FOREACH with inner FLATTEN: a sub-bag field expands INSIDE
-- the block (transform^2 + flatten HOFs, Pig's inner-join FLATTEN
-- semantics) - the inner pipeline never shuffles and never explodes;
-- DISTINCT + counts then run over the flattened bag per group.
D = LOAD '$DIR/documents.parquet' USING parquet;
P = FOREACH D GENERATE source, TOKENIZE(text) AS words;
G = GROUP P BY source;
A = FOREACH G {
  w = FOREACH P GENERATE FLATTEN(words) AS word;
  d = DISTINCT w;
  GENERATE group AS source, COUNT_STAR(w) AS n_words, COUNT_STAR(d) AS n_uniq;
};
STORE A INTO '/tmp/graft_pig_out/q228' USING parquet;
