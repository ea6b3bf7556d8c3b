-- PigMix L15 shape (multiple DISTINCT aggregates in one nested
-- FOREACH): distinct users + distinct actions per group.
O = LOAD '$DIR/orders.parquet' USING parquet;
G = GROUP O BY o_orderpriority;
A = FOREACH G {
  cu = FOREACH O GENERATE o_custkey;
  du = DISTINCT cu;
  st = FOREACH O GENERATE o_orderstatus;
  ds = DISTINCT st;
  GENERATE group AS o_orderpriority, COUNT_STAR(O) AS n_orders,
           COUNT_STAR(du) AS n_cust, COUNT_STAR(ds) AS n_status;
};
