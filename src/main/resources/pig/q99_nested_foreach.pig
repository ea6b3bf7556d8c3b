-- nested FOREACH with an inner FOREACH projection (bag-field
-- projection before aggregation) plus a FILTER over the projected bag:
-- both absorbed by the combiner path - aggregates compile to
-- conditional aggregates over the projection EXPRESSIONS, no bag ever
-- materializes.
L = LOAD '$DIR/lineitem.parquet' USING parquet;
G = GROUP L BY l_suppkey;
A = FOREACH G {
  dq  = FOREACH L GENERATE l_quantity * 2.0 AS dqty, l_linenumber;
  big = FILTER dq BY dqty > 60.0;
  GENERATE group AS l_suppkey, SUM(dq.dqty) AS sum_dqty,
           COUNT(big) AS n_big, MAX(big.dqty) AS max_big;
};
STORE A INTO '/tmp/graft_pig_out/q99' USING parquet;
