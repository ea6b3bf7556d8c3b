-- PigMix L9 shape (ORDER BY a single key: total sort via sampled
-- range partitioning).
O = LOAD '$DIR/orders.parquet' USING parquet;
P = FOREACH O GENERATE o_orderkey, o_totalprice;
A = ORDER P BY o_totalprice;
