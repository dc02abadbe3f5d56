-- staging: lineitem with the exact-decimal revenue measure
-- (DECIMAL(18,4) before aggregation — see Relational.scala oracle-parity
-- discipline)
SELECT l_orderkey, l_quantity,
       CAST(l_extendedprice AS DECIMAL(18,4))
         * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS revenue
FROM lineitem
