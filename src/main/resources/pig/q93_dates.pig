-- datetime builtins incl. *Between in BOTH directions (Joda truncation)
O = LOAD '$DIR/orders.parquet' USING parquet;
P = FOREACH O GENERATE o_orderkey,
    GetYear(o_orderdate) AS yr,
    GetMonth(o_orderdate) AS mo,
    DaysBetween(ToDate('1998-01-01'), o_orderdate) AS days_from_98,
    HoursBetween(o_orderdate, ToDate('1998-01-01')) AS hours_to_98;
STORE P INTO '/tmp/graft_pig_out/q93' USING parquet;
