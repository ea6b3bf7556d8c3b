-- PigMix L1 variant (front-end hardening, round 13): FLATTEN of a
-- COMPUTED expression inside the nested block (no pre-projection),
-- then nested DISTINCT — distinct tokens per language.
D = LOAD '$DIR/documents.parquet' USING parquet;
G = GROUP D BY lang;
A = FOREACH G {
  toks = FOREACH D GENERATE FLATTEN(TOKENIZE(text)) AS tok;
  d = DISTINCT toks;
  GENERATE group AS lang, COUNT_STAR(d) AS n_distinct_tok;
};
