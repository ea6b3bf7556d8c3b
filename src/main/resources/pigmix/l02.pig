-- PigMix L2 shape (fragment-replicate join): page_views x power_users
-- USING 'replicated' -> lineitem x part (small dim broadcast).
L = LOAD '$DIR/lineitem.parquet' USING parquet;
P = LOAD '$DIR/part.parquet' USING parquet;
S = FILTER P BY p_size < 5;
J = JOIN L BY l_partkey, S BY p_partkey USING 'replicated';
A = FOREACH J GENERATE l_orderkey, l_linenumber, p_brand, l_quantity;
