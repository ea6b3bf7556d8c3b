-- nested FOREACH with ORDER + LIMIT: per-group top-k via bag HOFs
-- (sortBagBy + slice), inner pipeline never shuffles
O = LOAD '$DIR/orders.parquet' USING parquet;
G = GROUP O BY o_custkey;
A = FOREACH G {
  s = ORDER O BY o_totalprice DESC;
  t = LIMIT s 3;
  GENERATE group AS o_custkey, COUNT_STAR(t) AS n_top,
           FLATTEN(t.o_totalprice) AS o_totalprice;
};
STORE A INTO '/tmp/graft_pig_out/q95' USING parquet;
