-- PigMix L1 shape (explode a nested field, then re-group): page_views'
-- FLATTEN of the bag field -> documents' token bag. Exercises
-- explode -> shuffle -> aggregate through the front-end.
D = LOAD '$DIR/documents.parquet' USING parquet;
T = FOREACH D GENERATE doc_id, FLATTEN(TOKENIZE(text)) AS tok;
G = GROUP T BY doc_id;
A = FOREACH G GENERATE group AS doc_id, COUNT_STAR(T) AS n_tok;
