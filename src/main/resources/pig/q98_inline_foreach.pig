-- inline-relation FOREACH: Pig's canonical one-liner idiom. The GROUP
-- is compiled unbound (RInline) and the algebraic combiner rewrite
-- still applies - groupBy().agg(), no bag, partial agg map-side.
L = LOAD '$DIR/lineitem.parquet' USING parquet;
A = FOREACH (GROUP L BY l_returnflag) GENERATE group AS l_returnflag,
    COUNT_STAR(L) AS n_lines, SUM(L.l_quantity) AS sum_qty;
STORE A INTO '/tmp/graft_pig_out/q98' USING parquet;
