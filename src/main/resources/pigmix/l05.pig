-- PigMix L5 shape (anti-join via COGROUP + empty-bag filter):
-- users with no page_views -> customers with no URGENT orders
-- (the unfiltered variant is empty on this data — every customer
-- orders — so the probe side is filtered to keep the test real).
C = LOAD '$DIR/customer.parquet' USING parquet;
O = LOAD '$DIR/orders.parquet' USING parquet;
U = FILTER O BY o_orderpriority == '1-URGENT';
CG = COGROUP C BY c_custkey, U BY o_custkey;
F = FILTER CG BY ISEMPTY(U) AND NOT ISEMPTY(C);
A = FOREACH F GENERATE group AS c_custkey, FLATTEN(C.c_name) AS c_name;
