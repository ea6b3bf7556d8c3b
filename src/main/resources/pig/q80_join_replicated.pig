-- USING 'replicated' -> broadcast joins (q06 shape)
L = LOAD '$DIR/lineitem.parquet' USING parquet;
S = LOAD '$DIR/supplier.parquet' USING parquet;
N = LOAD '$DIR/nation.parquet' USING parquet;
J = JOIN L BY l_suppkey, S BY s_suppkey USING 'replicated';
J2 = JOIN J BY s_nationkey, N BY n_nationkey USING 'replicated';
G = GROUP J2 BY n_name;
A = FOREACH G GENERATE group AS n_name, COUNT_STAR(J2) AS n_lines,
    SUM(J2.l_quantity) AS sum_qty;
STORE A INTO '/tmp/graft_pig_out/q80' USING parquet;
