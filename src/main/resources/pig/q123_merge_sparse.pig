-- JOIN ... USING 'merge-sparse': selective probe against the sorted,
-- footer-indexed lineitem copy; the compiler routes to the file-pruned
-- sparse lookup (falls back to SMJ for non-qualifying shapes).
O = LOAD '$DIR/orders.parquet' USING parquet;
P = FILTER O BY o_orderkey % 997 == 0;
B = LOAD '$SORTED' USING parquet;
J = JOIN P BY o_orderkey, B BY l_orderkey USING 'merge-sparse';
R = FOREACH J GENERATE l_orderkey, l_linenumber, l_quantity, o_orderpriority;
STORE R INTO '/tmp/graft_pig_out/q123' USING parquet;
