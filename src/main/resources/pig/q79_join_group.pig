-- shuffle JOIN then GROUP/agg (q05 shape)
O = LOAD '$DIR/orders.parquet' USING parquet;
L = LOAD '$DIR/lineitem.parquet' USING parquet;
J = JOIN O BY o_orderkey, L BY l_orderkey;
G = GROUP J BY o_orderstatus;
A = FOREACH G GENERATE group AS o_orderstatus, COUNT_STAR(J) AS n_lines,
    SUM(J.l_quantity) AS sum_qty;
STORE A INTO '/tmp/graft_pig_out/q79' USING parquet;
