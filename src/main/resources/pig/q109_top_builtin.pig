-- TOP(n, field, bag) builtin [Pig: o.a.p.builtin.TOP]: per-group top-3
-- by o_orderkey (field 1 of the bag tuple — unique, so the result is
-- deterministic and oracle-exact), flattened back to rows
O = LOAD '$DIR/orders.parquet' USING parquet;
P = FOREACH O GENERATE o_custkey AS ck, o_orderkey, o_totalprice;
G = GROUP P BY ck;
T = FOREACH G GENERATE TOP(3, 1, P) AS top3;
R = FOREACH T GENERATE FLATTEN(top3);
STORE R INTO '/tmp/graft_pig_out/q109' USING parquet;
