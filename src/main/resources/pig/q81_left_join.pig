-- LEFT OUTER join; COUNT (not COUNT_STAR) skips the null-padded rows
C = LOAD '$DIR/customer.parquet' USING parquet;
O = LOAD '$DIR/orders.parquet' USING parquet;
J = JOIN C BY c_custkey LEFT OUTER, O BY o_custkey;
G = GROUP J BY c_custkey;
A = FOREACH G GENERATE group AS c_custkey, COUNT(J.o_orderkey) AS n_orders;
STORE A INTO '/tmp/graft_pig_out/q81' USING parquet;
