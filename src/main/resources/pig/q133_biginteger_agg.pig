-- Arbitrary-precision BIGINTEGER end-to-end (SURVEY §1.1, §2.6): the
-- per-row product scaled by 1e15 exceeds int64 at every SF, per-flag
-- SUMs reach ~1e25+, and the FILTER bound (5e19) is itself beyond
-- Long.MAX — selection set, aggregates, and ordering all ride the
-- exact string-backed bignum rep. DuckDB checks with HUGEINT (int128
-- covers this range; past 38 digits only java.math can check — see
-- BigNumSpec's 40-digit laws).
L = LOAD '$DIR/lineitem.parquet' USING parquet;
P = FOREACH L GENERATE l_returnflag,
      (biginteger)l_orderkey * (biginteger)l_partkey * 1000000000000000BI AS amt;
F = FILTER P BY amt > 50000000000000000000BI;
G = GROUP F BY l_returnflag;
S = FOREACH G GENERATE group AS flag, SUM(F.amt) AS sum_amt,
      MIN(F.amt) AS min_amt, MAX(F.amt) AS max_amt, COUNT(F) AS n;
O = ORDER S BY flag;
STORE O INTO '/tmp/graft_pig_out/q133' USING parquet;
