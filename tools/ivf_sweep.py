#!/usr/bin/env python3
"""IVF recall sweep (companion to ann_sweep.py, r10 verdict #4).

Evaluates IVF coarse-quantizer recall@5 on the q34 32-query panel:
pivots = the `nlist` lowest-vec_id vectors (q48's deterministic,
oracle-expressible quantizer), each corpus vector indexed under its
`m_index` nearest pivots, each panel query probing its `nprobe` nearest
pivots; candidates share >= 1 probed pivot. Prints candidate cost and
recall per (nlist, m_index, nprobe).

Usage: python3 tools/ivf_sweep.py [sfDir]
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

for nlist in (16, 32, 64):
    con.execute("DROP TABLE IF EXISTS rkp")
    con.execute(f"""
CREATE TEMP TABLE rkp AS
WITH piv AS (SELECT vec_id AS p_id, embedding AS pe
             FROM embeddings ORDER BY vec_id LIMIT {nlist})
SELECT e.vec_id, p.p_id,
  ROW_NUMBER() OVER (PARTITION BY e.vec_id
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
                                    p.pe::DOUBLE[]) DESC, p.p_id) AS rk
FROM embeddings e CROSS JOIN piv p""")
    for m_index in (1, 2, 4):
        for nprobe in (2, 4, 8):
            mean_cand, hits, q_hit = con.sql(f"""
WITH idx AS (SELECT vec_id, p_id FROM rkp WHERE rk <= {m_index}),
pq AS (SELECT r.vec_id AS a_id, r.p_id FROM rkp r
       JOIN q ON q.vec_id = r.vec_id WHERE r.rk <= {nprobe}),
c AS (SELECT DISTINCT pq.a_id, i.vec_id AS b_id
      FROM pq JOIN idx i ON i.p_id = pq.p_id
      WHERE i.vec_id <> pq.a_id),
nc AS (SELECT count(*) / 32.0 AS mean_cand FROM c),
h AS (SELECT count(*) AS hits, count(DISTINCT e.a_id) AS q_hit
      FROM ex e JOIN c ON c.a_id = e.a_id AND c.b_id = e.b_id)
SELECT mean_cand, hits, q_hit FROM nc, h""").fetchone()
            frac = mean_cand / n
            print(f"nlist={nlist:3d} m={m_index} probe={nprobe}"
                  f"  cand/query={mean_cand:7.1f} ({100*frac:5.1f}%)"
                  f"  hits={hits:3d}/160  queries_with_hit={q_hit:2d}/32")
