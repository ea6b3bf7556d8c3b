-- PigMix L12 shape (multi-output: one scan fanned into branches, each
-- summarized; PigMix multi-stores, we SPLIT + union the summaries).
E = LOAD '$DIR/events.parquet' USING parquet;
SPLIT E INTO err IF event_type == 'error',
             buy IF event_type == 'purchase',
             rest OTHERWISE;
G1 = GROUP err ALL;
A1 = FOREACH G1 GENERATE 'error' AS bucket, COUNT_STAR(err) AS n, MAX(err.value) AS max_value;
G2 = GROUP buy ALL;
A2 = FOREACH G2 GENERATE 'purchase' AS bucket, COUNT_STAR(buy) AS n, MAX(buy.value) AS max_value;
G3 = GROUP rest ALL;
A3 = FOREACH G3 GENERATE 'rest' AS bucket, COUNT_STAR(rest) AS n, MAX(rest.value) AS max_value;
A = UNION A1, A2, A3;
