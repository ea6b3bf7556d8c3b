-- Scripting UDFs end-to-end: REGISTER '<script>' USING <jsr223-lang> AS ns,
-- then ns.fn(...) in filters and projections ($UDF is the .toy source the
-- q201 entry writes; 'toy' is the in-repo reference JSR-223 engine).
REGISTER '$UDF' USING toy AS m;
O = LOAD '$DIR/orders.parquet' USING parquet;
F = FILTER O BY m.double_it(o_totalprice) > 200000.0;
B = FOREACH F GENERATE o_orderkey, m.shout(o_orderpriority) AS pr,
    m.add(o_orderkey, 7) AS k7, m.klen(o_orderpriority) AS plen;
