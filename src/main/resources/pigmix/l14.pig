-- PigMix L14 shape (merge join over pre-sorted inputs: USING 'merge').
-- Both sides are sorted-by-key parquet fixtures written by the entry.
O = LOAD '$SORTED_O' USING parquet;
B = LOAD '$SORTED_L' USING parquet;
J = JOIN O BY o_orderkey, B BY l_orderkey USING 'merge';
A = FOREACH J GENERATE o_orderkey, l_linenumber, l_quantity, o_orderstatus;
