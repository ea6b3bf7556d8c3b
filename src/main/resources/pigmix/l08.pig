-- PigMix L8 shape (GROUP ALL: whole-table aggregate in one pass).
L = LOAD '$DIR/lineitem.parquet' USING parquet;
G = GROUP L ALL;
A = FOREACH G GENERATE COUNT_STAR(L) AS n_lines,
    SUM(L.l_quantity) AS sum_qty, AVG(L.l_quantity) AS avg_qty,
    MIN(L.l_extendedprice) AS min_price, MAX(L.l_extendedprice) AS max_price;
