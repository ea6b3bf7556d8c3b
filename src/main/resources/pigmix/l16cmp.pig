-- PigMix L16 variant (front-end hardening, round 13): nested ORDER
-- carrying a USING comparator resolved through a DEFINE alias —
-- reverse-of-DESC = the 2 SMALLEST prices per supplier.
DEFINE rev org.example.ReverseComparator();
L = LOAD '$DIR/lineitem.parquet' USING parquet;
G = GROUP L BY l_suppkey;
A = FOREACH G {
  s = ORDER L BY l_extendedprice DESC USING rev;
  t = LIMIT s 2;
  GENERATE group AS l_suppkey, FLATTEN(t.l_extendedprice) AS price;
};
