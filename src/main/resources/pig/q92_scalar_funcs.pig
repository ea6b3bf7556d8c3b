-- scalar builtins + bincond ternary + cast
C = LOAD '$DIR/customer.parquet' USING parquet;
P = FOREACH C GENERATE c_custkey,
    UPPER(c_name) AS name_uc,
    SUBSTRING(c_name, 0, 8) AS name8,
    (c_acctbal > 5000.0 ? 'high' : (c_acctbal >= 0.0 ? 'mid' : 'neg')) AS tier,
    ROUND(c_acctbal) AS bal_round,
    ABS(c_acctbal) AS bal_abs,
    (long)c_nationkey AS nk;
STORE P INTO '/tmp/graft_pig_out/q92' USING parquet;
