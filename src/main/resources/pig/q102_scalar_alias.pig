-- scalar alias (Pig 0.8+): a one-row relation's field used as a
-- per-row scalar in FILTER and FOREACH. Compiles to a broadcast
-- cross join of the guarded one-row aggregate - no shuffle, and the
-- "more than one row" runtime guard rides along.
L = LOAD '$DIR/lineitem.parquet' USING parquet;
T = FOREACH (GROUP L ALL) GENERATE AVG(L.l_quantity) AS avg_qty;
H = FILTER L BY l_quantity > T.avg_qty * 1.5;
R = FOREACH H GENERATE l_orderkey, l_linenumber, l_quantity / T.avg_qty AS qty_ratio;
STORE R INTO '/tmp/graft_pig_out/q102' USING parquet;
