-- PigMix L11 shape (DISTINCT + UNION + DISTINCT: the distinct-users
-- union): purchasing event users UNION ordering customers.
E = LOAD '$DIR/events.parquet' USING parquet;
P = FILTER E BY event_type == 'purchase';
E1 = FOREACH P GENERATE user_id AS id;
D1 = DISTINCT E1;
O = LOAD '$DIR/orders.parquet' USING parquet;
O1 = FOREACH O GENERATE o_custkey AS id;
D2 = DISTINCT O1;
U = UNION D1, D2;
A = DISTINCT U;
