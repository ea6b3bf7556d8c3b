-- ORDER ... BY with mixed directions + LIMIT (TakeOrderedAndProject)
O = LOAD '$DIR/orders.parquet' USING parquet;
S = ORDER O BY o_totalprice DESC, o_orderkey ASC;
T = LIMIT S 10;
P = FOREACH T GENERATE o_orderkey, o_totalprice;
STORE P INTO '/tmp/graft_pig_out/q83' USING parquet;
