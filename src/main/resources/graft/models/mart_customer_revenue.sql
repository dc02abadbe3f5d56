-- mart: per-customer revenue over the staging layer. Because models are
-- lazy views, Catalyst optimizes ACROSS the model boundary (column
-- pruning reaches the base scans).
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       CAST(CAST(SUM(s.revenue) AS STRING) AS DOUBLE) AS revenue,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM stg_orders o
JOIN stg_lineitem s ON s.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
