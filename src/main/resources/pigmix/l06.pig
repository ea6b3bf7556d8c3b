-- PigMix L6 shape (multi-key group with combiner-friendly aggregates):
-- group by (user, action) + counts -> lineitem by flag/status/line.
L = LOAD '$DIR/lineitem.parquet' USING parquet;
G = GROUP L BY (l_returnflag, l_linestatus, l_linenumber);
A = FOREACH G GENERATE
    FLATTEN(group) AS (l_returnflag, l_linestatus, l_linenumber),
    COUNT_STAR(L) AS n_lines, SUM(L.l_quantity) AS sum_qty,
    MAX(L.l_extendedprice) AS max_price;
