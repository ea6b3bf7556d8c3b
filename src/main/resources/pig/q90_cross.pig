-- CROSS + FILTER: the Pig theta-join idiom (q11 shape)
N = LOAD '$DIR/nation.parquet' USING parquet;
R = LOAD '$DIR/region.parquet' USING parquet;
X = CROSS N, R;
F = FILTER X BY n_regionkey != r_regionkey;
P = FOREACH F GENERATE n_name, r_name;
STORE P INTO '/tmp/graft_pig_out/q90' USING parquet;
