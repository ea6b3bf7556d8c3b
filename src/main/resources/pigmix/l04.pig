-- PigMix L4 shape (nested DISTINCT inside FOREACH): distinct
-- timespent values per user -> distinct order priorities per customer.
O = LOAD '$DIR/orders.parquet' USING parquet;
G = GROUP O BY o_custkey;
A = FOREACH G {
  p = FOREACH O GENERATE o_orderpriority;
  d = DISTINCT p;
  GENERATE group AS o_custkey, COUNT_STAR(d) AS n_prio;
};
