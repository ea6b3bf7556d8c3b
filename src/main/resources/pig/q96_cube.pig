-- CUBE statement (Pig 0.11): grouping-set aggregate over two dims
L = LOAD '$DIR/lineitem.parquet' USING parquet;
C = CUBE L BY CUBE(l_returnflag, l_linestatus);
A = FOREACH C GENERATE FLATTEN(group) AS (l_returnflag, l_linestatus),
    COUNT_STAR(cube) AS cnt, SUM(cube.l_quantity) AS sum_qty;
STORE A INTO '/tmp/graft_pig_out/q96' USING parquet;
