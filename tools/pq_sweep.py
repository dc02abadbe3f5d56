#!/usr/bin/env python3
"""PQ-ADC recall sweep (companion to ann_sweep.py / ivf_sweep.py).

Evaluates product-quantization recall@5 on the q34 32-query panel:
vectors L2-normalized, codebook per subspace = sub-vectors of the K
lowest-vec_id vectors (q226's deterministic, oracle-expressible
quantizer), assignment by squared-L2 argmin, query-side asymmetric
distance (per-query LUT frozen to BIGINT at 1e12, integer sums across
subspaces). Sweeps the geometry (M subspaces x K centroids); the bytes
column is the storage cost per vector (M * ceil(log2 K) / 8 — the number
PQ exists to minimize). Ground truth = exact cosine top-5.

Usage: python3 tools/pq_sweep.py [sfDir]
"""
import math
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
n = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]

con.execute("""
CREATE TEMP TABLE nv AS
SELECT vec_id,
  list_transform(embedding::DOUBLE[],
    x -> x / sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS v
FROM embeddings
WHERE list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0""")
con.execute("""
CREATE TEMP TABLE q AS
SELECT vec_id FROM embeddings
ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32""")
con.execute("""
CREATE TEMP TABLE ex AS
SELECT a_id, b_id FROM (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
    ROW_NUMBER() OVER (PARTITION BY a.vec_id
      ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
               b.vec_id) AS rk
  FROM (SELECT e.* FROM embeddings e JOIN q ON q.vec_id = e.vec_id) a
  JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE NOT isnan(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]))) t
WHERE rk <= 5""")

SQ = "list_sum(list_transform(list_zip({a}, {b}), z -> (z[1]-z[2])*(z[1]-z[2])))"


def run(m_sub, k_cent):
    sub_dim = 64 // m_sub
    sq = SQ.format(a="s.sv", b="c.cv")
    rows = con.sql(f"""
WITH ms AS (SELECT unnest(range(0, {m_sub})) AS m),
cent AS (
  SELECT c_id, m, v[m*{sub_dim}+1 : m*{sub_dim}+{sub_dim}] AS cv FROM (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) AS c_id, v
    FROM (SELECT vec_id, v FROM nv ORDER BY vec_id LIMIT {k_cent}) z) c, ms),
sub AS (SELECT vec_id, m, v[m*{sub_dim}+1 : m*{sub_dim}+{sub_dim}] AS sv FROM nv, ms),
codes AS (
  SELECT vec_id AS b_id, m, c_id AS code FROM (
    SELECT s.vec_id, s.m, c.c_id, ROW_NUMBER() OVER (
      PARTITION BY s.vec_id, s.m ORDER BY {sq}, c.c_id) AS rk
    FROM sub s JOIN cent c ON c.m = s.m) t WHERE rk = 1),
lut AS (
  SELECT s.vec_id AS a_id, s.m, c.c_id,
    CAST(floor({sq} * 1e12) AS BIGINT) AS lf
  FROM sub s JOIN q ON q.vec_id = s.vec_id JOIN cent c ON c.m = s.m),
adc AS (
  SELECT l.a_id, c.b_id, sum(l.lf) AS dist
  FROM codes c JOIN lut l ON l.m = c.m AND l.c_id = c.code
  WHERE c.b_id <> l.a_id GROUP BY 1, 2),
ann AS (SELECT a_id, b_id FROM (
  SELECT a_id, b_id, ROW_NUMBER() OVER (
    PARTITION BY a_id ORDER BY dist, b_id) AS rk FROM adc) t WHERE rk <= 5),
ov AS (SELECT e.a_id, count(*) AS hits FROM ex e
       JOIN ann a ON a.a_id = e.a_id AND a.b_id = e.b_id GROUP BY 1)
SELECT coalesce(sum(hits), 0), count(*) FILTER (hits > 0)
FROM q LEFT JOIN ov ON ov.a_id = q.vec_id""").fetchone()
    return rows


print(f"sf={sf} n={n}  (recall vs exact cosine top-5, 32-query panel)")
for m_sub in (4, 8, 16):
    for k_cent in (8, 16, 32, 64):
        if k_cent > n:
            continue
        hits, qhit = run(m_sub, k_cent)
        bytes_per = m_sub * math.ceil(math.log2(k_cent)) / 8
        print(f"M={m_sub:2d} K={k_cent:2d}  bytes/vec={bytes_per:4.1f}  "
              f"hits={hits:3d}/160  queries_with_hit={qhit:2d}/32")
