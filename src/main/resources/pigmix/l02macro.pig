-- PigMix L2 variant (front-end hardening, round 13): the replicated
-- join wrapped in a user macro — relation-valued macro params must
-- carry the join hint through expansion unchanged.
DEFINE smalljoin(big, small) RETURNS J {
  $J = JOIN $big BY l_partkey, $small BY p_partkey USING 'replicated';
};
L = LOAD '$DIR/lineitem.parquet' USING parquet;
P = LOAD '$DIR/part.parquet' USING parquet;
S = FILTER P BY p_size < 5;
J = smalljoin(L, S);
A = FOREACH J GENERATE l_orderkey, l_linenumber, p_brand, l_quantity;
