-- PigMix L3 shape (join then group-aggregate): page_views x users on
-- name, group the join result, sum -> orders x customer on custkey,
-- group by market segment.
O = LOAD '$DIR/orders.parquet' USING parquet;
C = LOAD '$DIR/customer.parquet' USING parquet;
J = JOIN O BY o_custkey, C BY c_custkey;
G = GROUP J BY c_mktsegment;
A = FOREACH G GENERATE group AS c_mktsegment, COUNT_STAR(J) AS n_orders,
    MIN(J.o_totalprice) AS min_price, MAX(J.o_totalprice) AS max_price;
