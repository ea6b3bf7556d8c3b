-- UNION (bag semantics) + DISTINCT
O = LOAD '$DIR/orders.parquet' USING parquet;
U = FILTER O BY o_orderpriority == '1-URGENT';
H = FILTER O BY o_orderpriority == '2-HIGH';
B = UNION U, H;
P = FOREACH B GENERATE o_custkey, o_orderpriority;
D = DISTINCT P;
STORE D INTO '/tmp/graft_pig_out/q82' USING parquet;
