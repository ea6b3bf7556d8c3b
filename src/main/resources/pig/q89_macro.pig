-- DEFINE ... RETURNS macro with params, expanded with alias hygiene
DEFINE priority_counts(REL, prio) RETURNS OUT {
  f = FILTER $REL BY o_orderpriority == $prio;
  g = GROUP f BY o_custkey;
  $OUT = FOREACH g GENERATE group AS o_custkey, COUNT_STAR(f) AS n;
};
O = LOAD '$DIR/orders.parquet' USING parquet;
U = priority_counts(O, '1-URGENT');
T = ORDER U BY n DESC, o_custkey ASC;
R = LIMIT T 15;
STORE R INTO '/tmp/graft_pig_out/q89' USING parquet;
