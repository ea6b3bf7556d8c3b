-- GROUP BY + algebraic FOREACH: compiles to groupBy().agg(), no bags
L = LOAD '$DIR/lineitem.parquet' USING parquet;
F = FILTER L BY l_shipdate <= ToDate('1998-09-02');
G = GROUP F BY (l_returnflag, l_linestatus);
A = FOREACH G GENERATE FLATTEN(group) AS (l_returnflag, l_linestatus),
    COUNT_STAR(F) AS count_order, SUM(F.l_quantity) AS sum_qty,
    MIN(F.l_quantity) AS min_qty, MAX(F.l_quantity) AS max_qty;
STORE A INTO '/tmp/graft_pig_out/q78' USING parquet;
