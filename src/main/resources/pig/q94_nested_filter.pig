-- nested FOREACH block, FILTER-only: compiles to FILTERED relational
-- aggregates (count/max over when(pred)) - no bag materializes
L = LOAD '$DIR/lineitem.parquet' USING parquet;
G = GROUP L BY l_orderkey;
A = FOREACH G {
  big = FILTER L BY l_quantity > 25.0;
  GENERATE group AS l_orderkey, COUNT_STAR(L) AS n_items,
           COUNT_STAR(big) AS n_big, MAX(big.l_quantity) AS max_big;
};
STORE A INTO '/tmp/graft_pig_out/q94' USING parquet;
