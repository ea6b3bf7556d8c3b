-- RANK ... BY (global two-pass rank, competition semantics)
C = LOAD '$DIR/customer.parquet' USING parquet;
R = RANK C BY c_acctbal DESC;
F = FILTER R BY rank_C <= 20;
P = FOREACH F GENERATE rank_C AS rnk, c_custkey, c_acctbal;
STORE P INTO '/tmp/graft_pig_out/q87' USING parquet;
