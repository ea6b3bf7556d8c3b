-- ROLLUP variant of the CUBE statement
O = LOAD '$DIR/orders.parquet' USING parquet;
C = CUBE O BY ROLLUP(o_orderstatus, o_orderpriority);
A = FOREACH C GENERATE FLATTEN(group) AS (o_orderstatus, o_orderpriority),
    COUNT_STAR(cube) AS cnt;
STORE A INTO '/tmp/graft_pig_out/q97' USING parquet;
