-- the Pig semi-join idiom: COGROUP + IsEmpty filter + FLATTEN
C = LOAD '$DIR/customer.parquet' USING parquet;
O = LOAD '$DIR/orders.parquet' USING parquet;
U = FILTER O BY o_orderpriority == '1-URGENT';
CG = COGROUP C BY c_custkey, U BY o_custkey;
F = FILTER CG BY NOT ISEMPTY(U) AND NOT ISEMPTY(C);
P = FOREACH F GENERATE group AS c_custkey, FLATTEN(C.c_name) AS c_name;
STORE P INTO '/tmp/graft_pig_out/q91' USING parquet;
