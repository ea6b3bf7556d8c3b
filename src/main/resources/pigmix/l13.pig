-- PigMix L13 shape (LEFT OUTER join, null-padded right side kept):
-- page_views LEFT OUTER power_users_samples -> customers LEFT OUTER
-- their high-value orders.
C = LOAD '$DIR/customer.parquet' USING parquet;
O = LOAD '$DIR/orders.parquet' USING parquet;
H = FILTER O BY o_totalprice > 300000.0;
J = JOIN C BY c_custkey LEFT OUTER, H BY o_custkey;
A = FOREACH J GENERATE c_custkey, c_acctbal, o_orderkey, o_totalprice;
