-- SPLIT ... OTHERWISE + GROUP ALL + UNION of the branch summaries
O = LOAD '$DIR/orders.parquet' USING parquet;
SPLIT O INTO big IF o_totalprice > 200000.0,
             mid IF o_totalprice > 50000.0 AND o_totalprice <= 200000.0,
             small OTHERWISE;
GB = GROUP big ALL;
A1 = FOREACH GB GENERATE 'big' AS bucket, COUNT_STAR(big) AS n;
GM = GROUP mid ALL;
A2 = FOREACH GM GENERATE 'mid' AS bucket, COUNT_STAR(mid) AS n;
GS = GROUP small ALL;
A3 = FOREACH GS GENERATE 'small' AS bucket, COUNT_STAR(small) AS n;
R = UNION A1, A2, A3;
STORE R INTO '/tmp/graft_pig_out/q85' USING parquet;
