-- Pig 0.12 CASE expression, both forms: searched (boolean WHENs) and
-- simple (equality tests over an operand). Also exercised inside the
-- algebraic combiner path (CASE over FLATTENed group keys and
-- aggregates stays bag-free).
O = LOAD '$DIR/orders.parquet' USING parquet;
B = FOREACH O GENERATE o_orderkey,
    (CASE WHEN o_totalprice > 200000.0 THEN 'big'
          WHEN o_totalprice > 100000.0 THEN 'mid'
          ELSE 'small' END) AS bucket,
    (CASE o_orderstatus WHEN 'F' THEN 'done' WHEN 'O' THEN 'open'
          ELSE 'other' END) AS status_word;
G = FOREACH (GROUP B BY (bucket, status_word)) GENERATE
    FLATTEN(group) AS (bucket, status_word), COUNT_STAR(B) AS n,
    (CASE WHEN COUNT_STAR(B) > 100 THEN 'common' ELSE 'rare' END) AS freq;
STORE G INTO '/tmp/graft_pig_out/q103' USING parquet;
