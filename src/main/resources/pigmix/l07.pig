-- PigMix L7 shape (group over a mid-cardinality key, algebraic
-- aggregates riding the combiner): per-part line statistics.
L = LOAD '$DIR/lineitem.parquet' USING parquet;
G = GROUP L BY l_partkey;
A = FOREACH G GENERATE group AS l_partkey, COUNT_STAR(L) AS n,
    MIN(L.l_quantity) AS min_qty, MAX(L.l_quantity) AS max_qty,
    AVG(L.l_quantity) AS avg_qty;
