-- LOAD + FILTER + FOREACH...GENERATE (q01 shape through the textual front-end)
L = LOAD '$DIR/lineitem.parquet' USING parquet;
F = FILTER L BY l_shipdate >= ToDate('1997-01-01') AND l_shipdate < ToDate('1997-02-01');
P = FOREACH F GENERATE l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS revenue;
STORE P INTO '/tmp/graft_pig_out/q77' USING parquet;
