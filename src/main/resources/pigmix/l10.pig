-- PigMix L10 shape (ORDER BY multiple keys of mixed types and
-- directions).
L = LOAD '$DIR/lineitem.parquet' USING parquet;
F = FILTER L BY l_shipdate >= ToDate('1997-01-01') AND l_shipdate < ToDate('1997-04-01');
P = FOREACH F GENERATE l_returnflag, l_quantity, l_shipdate, l_orderkey, l_linenumber;
A = ORDER P BY l_returnflag ASC, l_quantity DESC, l_shipdate ASC;
