#!/usr/bin/env python3
"""ANN index-configuration sweep (r10 verdict #4).

Evaluates sign-LSH recall@5 on the q34 32-query panel for a grid of
(signature bits b, table count L, probe radius r) using the exact same
md5-seeded hyperplane construction as graft lshVectors / the q217/q221
oracles — plane weight for (table t, bit h, dim d) is seeded
md5(f"{t*b+h}_{d}") so table 0 of a b=8 sweep IS the production index.

Prints, per config: candidate cost (mean candidates/query as corpus
fraction), queries with >=1 true neighbor recovered, total hits of 160
(32 queries x top-5). Run at sf0.01 and sf0.1 to pick a configuration
whose recall holds as the corpus grows.

Usage: python3 tools/ann_sweep.py [sfDir]
"""
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
n = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]

con.execute("""
CREATE TEMP TABLE q AS
SELECT vec_id, embedding FROM embeddings
ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32""")
con.execute("""
CREATE TEMP TABLE ex AS
SELECT a_id, b_id FROM (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
    ROW_NUMBER() OVER (PARTITION BY a.vec_id
      ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]) DESC,
               b.vec_id) AS rk
  FROM q a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE NOT isnan(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]))) t
WHERE rk <= 5""")


def signatures(total_planes):
    """(vec_id, plane p, sign bit) for planes 0..total_planes-1."""
    con.execute("DROP TABLE IF EXISTS sig")
    con.execute(f"""
CREATE TEMP TABLE sig AS
WITH planes AS (
  SELECT p, d,
    CAST(CAST('0x' || substr(md5(CAST(p AS VARCHAR) || '_' ||
      CAST(d AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000 AS BIGINT) AS w
  FROM range({total_planes}) t1(p), range(64) t2(d)),
vx AS (SELECT vec_id, i AS d, embedding[i+1] AS v
       FROM embeddings, range(64) r(i))
SELECT vec_id, p,
  CASE WHEN SUM(CAST(round(CAST(v AS DOUBLE) * w * 1000000.0) AS BIGINT)) > 0
       THEN 1 ELSE 0 END AS bit
FROM vx JOIN planes USING (d) GROUP BY 1, 2""")


def eval_config(b, tables, radius):
    # per-table bucket: bits t*b .. t*b+b-1
    con.execute("DROP TABLE IF EXISTS bk")
    con.execute(f"""
CREATE TEMP TABLE bk AS
SELECT vec_id, p // {b} AS tbl,
  SUM(bit << CAST(p % {b} AS INT)) AS bucket
FROM sig WHERE p < {b * tables} GROUP BY 1, 2""")
    # probe set per panel query: home bucket (+ Hamming-1 flips if radius=1)
    if radius == 0:
        probes = "[x.bucket]"
    else:
        flips = ", ".join(f"xor(x.bucket, CAST({1 << h} AS BIGINT))"
                          for h in range(b))
        probes = f"[x.bucket, {flips}]"
    cand = con.sql(f"""
WITH pq AS (
  SELECT x.vec_id, x.tbl, unnest({probes}) AS bucket
  FROM bk x JOIN q ON q.vec_id = x.vec_id),
c AS (
  SELECT DISTINCT pq.vec_id AS a_id, w.vec_id AS b_id
  FROM pq JOIN bk w ON w.tbl = pq.tbl AND w.bucket = pq.bucket
  WHERE w.vec_id <> pq.vec_id),
ncand AS (SELECT count(*) / 32.0 AS mean_cand FROM c),
hit AS (SELECT count(*) AS hits,
               count(DISTINCT e.a_id) AS q_hit
        FROM ex e JOIN c ON c.a_id = e.a_id AND c.b_id = e.b_id)
SELECT mean_cand, hits, q_hit FROM ncand, hit""").fetchone()
    return cand


grid = []
signatures(12 * 8)  # enough planes for the largest config
for b in (4, 6, 8, 10, 12):
    for tables in (1, 2, 4, 8):
        for radius in (0, 1):
            mean_cand, hits, q_hit = eval_config(b, tables, radius)
            frac = mean_cand / n
            grid.append((b, tables, radius, mean_cand, frac, hits, q_hit))
            print(f"b={b:2d} L={tables} r={radius}  cand/query={mean_cand:7.1f}"
                  f" ({100*frac:5.1f}% of corpus)  hits={hits:3d}/160"
                  f"  queries_with_hit={q_hit:2d}/32")

print("\nbest recall per cost band (<=15% corpus candidates):")
for b, tables, radius, mc, frac, hits, q_hit in sorted(
        (g for g in grid if g[4] <= 0.15), key=lambda g: -g[5])[:8]:
    print(f"  b={b} L={tables} r={radius} cand={mc:.1f} ({100*frac:.1f}%)"
          f" hits={hits}/160 q_hit={q_hit}/32")
