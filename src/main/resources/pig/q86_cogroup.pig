-- COGROUP two relations; bag sizes per key (empty bags -> 0)
C = LOAD '$DIR/customer.parquet' USING parquet;
O = LOAD '$DIR/orders.parquet' USING parquet;
CG = COGROUP C BY c_custkey, O BY o_custkey;
A = FOREACH CG GENERATE group AS c_custkey, COUNT_STAR(C) AS n_cust, COUNT_STAR(O) AS n_orders;
STORE A INTO '/tmp/graft_pig_out/q86' USING parquet;
