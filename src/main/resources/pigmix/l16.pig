-- PigMix L16 shape (nested ORDER + LIMIT: per-group top-k then
-- flatten): top-2 line prices per supplier.
L = LOAD '$DIR/lineitem.parquet' USING parquet;
G = GROUP L BY l_suppkey;
A = FOREACH G {
  s = ORDER L BY l_extendedprice DESC;
  t = LIMIT s 2;
  GENERATE group AS l_suppkey, FLATTEN(t.l_extendedprice) AS price;
};
