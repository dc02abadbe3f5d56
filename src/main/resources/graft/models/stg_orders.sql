-- staging: typed/enriched orders (the dbt staging layer the reference
-- declares but ships empty)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       year(o_orderdate) AS order_year
FROM orders
