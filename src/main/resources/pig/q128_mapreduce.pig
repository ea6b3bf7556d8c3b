-- MAPREDUCE native-job operator [Pig: LONative]: the dataflow hands a
-- materialized input to an opaque external job and ingests its output.
-- $MRJOB is a shell script (the "jar"); it filters n_regionkey >= 3
-- and projects (key, name) — which the DuckDB oracle recomputes.
N = LOAD '$DIR/nation.parquet' USING parquet;
P = FOREACH N GENERATE n_nationkey, n_name, n_regionkey;
R = MAPREDUCE 'sh $MRJOB' STORE P INTO '$MRIN' USING PigStorage()
    LOAD '$MROUT' USING PigStorage()
    AS (n_nationkey:int, n_name:chararray) `$MRIN $MROUT`;
STORE R INTO '/tmp/graft_pig_out/q128' USING parquet;
