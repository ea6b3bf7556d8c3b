-- PigMix L17 shape (wide group key: many grouping columns at once).
E = LOAD '$DIR/events.parquet' USING parquet;
G = GROUP E BY (event_type, props, user_id);
A = FOREACH G GENERATE FLATTEN(group) AS (event_type, props, user_id),
    COUNT_STAR(E) AS n, MAX(E.value) AS max_value;
