-- AS-less delimited LOAD: positional $0.. refs, cast-at-use (SURVEY S1.3)
N = LOAD '$CSV' USING PigStorage(',');
F = FILTER N BY (int)$2 != 2;
P = FOREACH F GENERATE (int)$0 AS n_nationkey, UPPER($1) AS n_name_uc, (int)$2 AS n_regionkey;
STORE P INTO '/tmp/graft_pig_out/q88' USING parquet;
