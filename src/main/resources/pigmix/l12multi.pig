-- PigMix L12 multi-output variant: the SAME fan-out, but every branch
-- summary lands in its OWN sink — the MultiQueryOptimizer shape
-- (reference SURVEY §4.2). The shared-scan policy must serve all three
-- STOREs from ONE scan of events (persist at the unsplit point),
-- ~1x the single-store L12 cost instead of ~3x.
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
STORE A1 INTO '$OUT/err' USING parquet;
STORE A2 INTO '$OUT/buy' USING parquet;
STORE A3 INTO '$OUT/rest' USING parquet;
