package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Snapshot reconciliation — the diff-two-table-versions job behind
  * migration validation, replication audits, and CDC end-checks ("did
  * yesterday's snapshot plus today's changes reproduce today's
  * snapshot?"). The reference's integrity story is row-count probes
  * after a `DROP TABLE` + full reload (`citibike_project/etl/
  * ingest_data.py:242-249`); this is the principled form: classify
  * every key as unchanged / changed / inserted / deleted in one pass.
  *
  * Scale shape: ONE full-outer hash join on the key — the only shuffle
  * — with the row payload collapsed to a single fingerprint per side
  * BEFORE the join, so arbitrary row width crosses the shuffle as a
  * 32-byte digest and the change test is one string comparison per
  * key. On bucketed/co-partitioned snapshot tables the join is
  * shuffle-free; the classified relation aggregates map-side to four
  * rows. This is how 100 TB snapshots reconcile: fingerprint early,
  * join narrow, never compare column-by-column across the wire.
  */
object Reconcile {

  /** q133 — snapshot diff: today's `orders` vs a deterministically
    * simulated yesterday (keys ≡0 mod 97 absent → today's inserts;
    * payload perturbed +100 cents on keys ≡0 mod 89 → changed; ghost
    * keys shifted past the domain on ≡0 mod 101 → deleted). Money is
    * frozen to cents BIGINT before fingerprinting (the q113
    * discipline) so no float formatting crosses the md5; the digest
    * input is an explicit `'|'`-joined canonical form, identical
    * byte-for-byte in both engines. Output: per-class row count and
    * exact key checksum — a dropped or double-counted key flips the
    * driver hash.
    */
  def q133SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cur = Tables.orders(spark, dir).select(
      $"o_orderkey".as("k"), $"o_orderstatus".as("st"),
      round($"o_totalprice" * 100).cast("long").as("cents"))
    val prev = cur.filter($"k" % 97 =!= 0)
      .withColumn("cents",
        when($"k" % 89 === 0, $"cents" + 100L).otherwise($"cents"))
      .unionByName(cur.filter($"k" % 101 === 0)
        .withColumn("k", $"k" + 2000000000L))
    def fp(side: DataFrame, as: String): DataFrame = {
      import side.sparkSession.implicits._
      side.select($"k",
        md5(concat_ws("|", $"st", $"cents".cast("string"))).as(as))
    }
    fp(prev, "h_prev").join(fp(cur, "h_cur"), Seq("k"), "full_outer")
      .withColumn("change_type",
        when($"h_prev".isNull, "inserted")
          .when($"h_cur".isNull, "deleted")
          .when($"h_prev" === $"h_cur", "unchanged")
          .otherwise("changed"))
      .groupBy($"change_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("key_sum"))
      .orderBy($"change_type")
  }

  val q133Sql: String =
    """WITH cur AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |prev AS (
      |  SELECT k, st,
      |         CASE WHEN k % 89 = 0 THEN cents + 100 ELSE cents END AS cents
      |  FROM cur WHERE k % 97 <> 0
      |  UNION ALL
      |  SELECT k + 2000000000, st, cents FROM cur WHERE k % 101 = 0),
      |a AS (SELECT k, md5(concat_ws('|', st, CAST(cents AS VARCHAR))) AS h
      |      FROM prev),
      |b AS (SELECT k, md5(concat_ws('|', st, CAST(cents AS VARCHAR))) AS h
      |      FROM cur)
      |SELECT CASE WHEN a.h IS NULL THEN 'inserted'
      |            WHEN b.h IS NULL THEN 'deleted'
      |            WHEN a.h = b.h THEN 'unchanged'
      |            ELSE 'changed' END AS change_type,
      |       count(*) AS n, CAST(sum(COALESCE(a.k, b.k)) AS BIGINT) AS key_sum
      |FROM a FULL OUTER JOIN b ON a.k = b.k
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q182 — Merkle-style anti-entropy: LOCATE where two snapshots
    * diverge with two bucket-checksum relations instead of a row-level
    * join. Each row collapses to a 60-bit digest
    * ([[graft.functions.Md5Prefix60]] over the q133 canonical form);
    * rows hash-bucket on their KEY (256 leaf buckets, rolled up to 16
    * supers = the Merkle levels); per (side, bucket) the state is
    * (count, Σ digest) — the sum is COMMUTATIVE, so the checksum is
    * order-independent, map-side combinable, and incrementally
    * maintainable (a CDC delta adjusts it by ± the changed rows'
    * digests without touching the rest of the bucket). The query emits
    * only the MISMATCHED rows of both levels: the drill-down path an
    * anti-entropy repair walks before running the q133 row diff on
    * just the differing 1/256 key slices.
    *
    * Versus q133 (row-level full outer join, shuffle sized by the
    * table): each side here is one map-side-combinable aggregate to
    * 256 rows and the comparison join is 256×256 — at 100 TB the
    * checksums live as a tiny side table maintained per ingest batch,
    * and reconciliation touches the fact only for buckets that
    * actually differ. Digest sums are DECIMAL(38,0)/HUGEINT (rows ×
    * 2^60 crosses BIGINT at ~8 rows/bucket) and cross the gate as the
    * mod-10^15 residue — identical in both engines, and a single
    * flipped row digest changes the residue.
    *
    * The simulated divergence is the q133 discipline at anti-entropy-
    * sized moduli: payload +1 cent on keys ≡0 (mod 1024) [changed],
    * keys ≡0 (mod 1501) absent from prev [inserted], ghost keys
    * shifted past the domain on ≡0 (mod 1777) [deleted] — ~34 touched
    * keys at sf0.01, so mismatched leaves stay a small subset of 256
    * and the "locate, don't scan" story is visible in the output.
    */
  def q182MerkleDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cur = Tables.orders(spark, dir).select(
      $"o_orderkey".as("k"), $"o_orderstatus".as("st"),
      round($"o_totalprice" * 100).cast("long").as("cents"))
    val prev = cur.filter($"k" % 1501 =!= 0)
      .withColumn("cents",
        when($"k" % 1024 === 0, $"cents" + 1L).otherwise($"cents"))
      .unionByName(cur.filter($"k" % 1777 === 0)
        .withColumn("k", $"k" + 2000000000L))
    def leaves(side: DataFrame): DataFrame = {
      import side.sparkSession.implicits._
      side
        .select(
          pmod(graft.functions.Md5Prefix60($"k".cast("string")), lit(256L))
            .as("bucket"),
          graft.functions.Md5Prefix60(
            concat_ws("|", $"k", $"st", $"cents")).as("h"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          sum($"h".cast(DecimalType(38, 0))).as("hs"))
    }
    def levels(side: DataFrame, nPfx: String, cPfx: String): DataFrame = {
      import side.sparkSession.implicits._
      val leaf = side.select(lit(2L).as("level"), $"bucket", $"n", $"hs")
      val sup = side.groupBy(expr("bucket div 16").as("bucket"))
        .agg(sum($"n").as("n"), sum($"hs").as("hs"))
        .select(lit(1L).as("level"), $"bucket", $"n", $"hs")
      leaf.unionByName(sup)
        .select($"level", $"bucket", $"n".as(nPfx),
          expr("CAST(hs % 1000000000000000 AS BIGINT)").as(cPfx))
    }
    levels(leaves(prev), "n_prev", "chk_prev")
      .join(levels(leaves(cur), "n_cur", "chk_cur"),
        Seq("level", "bucket"), "full_outer")
      .filter($"n_prev".isNull || $"n_cur".isNull ||
        $"n_prev" =!= $"n_cur" || $"chk_prev" =!= $"chk_cur")
      .select($"level", $"bucket",
        coalesce($"n_prev", lit(0L)).as("n_prev"),
        coalesce($"n_cur", lit(0L)).as("n_cur"),
        coalesce($"chk_prev", lit(-1L)).as("chk_prev"),
        coalesce($"chk_cur", lit(-1L)).as("chk_cur"))
      .orderBy($"level", $"bucket")
  }

  val q182Sql: String =
    """WITH cur AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |prev AS (
      |  SELECT k, st,
      |         CASE WHEN k % 1024 = 0 THEN cents + 1 ELSE cents END AS cents
      |  FROM cur WHERE k % 1501 <> 0
      |  UNION ALL
      |  SELECT k + 2000000000, st, cents FROM cur WHERE k % 1777 = 0),
      |pl AS (
      |  SELECT CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT)
      |           % 256 AS bucket,
      |         CAST(count(*) AS BIGINT) AS n,
      |         sum(CAST(CAST('0x' || substr(md5(concat_ws('|',
      |               CAST(k AS VARCHAR), st, CAST(cents AS VARCHAR))), 1, 15)
      |             AS BIGINT) AS HUGEINT)) AS hs
      |  FROM prev GROUP BY 1),
      |cl AS (
      |  SELECT CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT)
      |           % 256 AS bucket,
      |         CAST(count(*) AS BIGINT) AS n,
      |         sum(CAST(CAST('0x' || substr(md5(concat_ws('|',
      |               CAST(k AS VARCHAR), st, CAST(cents AS VARCHAR))), 1, 15)
      |             AS BIGINT) AS HUGEINT)) AS hs
      |  FROM cur GROUP BY 1),
      |p2 AS (
      |  SELECT CAST(2 AS BIGINT) AS level, bucket, n,
      |         CAST(hs % 1000000000000000 AS BIGINT) AS chk FROM pl
      |  UNION ALL
      |  SELECT 1, bucket // 16, CAST(sum(n) AS BIGINT),
      |         CAST(sum(hs) % 1000000000000000 AS BIGINT)
      |  FROM pl GROUP BY 2),
      |c2 AS (
      |  SELECT CAST(2 AS BIGINT) AS level, bucket, n,
      |         CAST(hs % 1000000000000000 AS BIGINT) AS chk FROM cl
      |  UNION ALL
      |  SELECT 1, bucket // 16, CAST(sum(n) AS BIGINT),
      |         CAST(sum(hs) % 1000000000000000 AS BIGINT)
      |  FROM cl GROUP BY 2)
      |SELECT COALESCE(p2.level, c2.level) AS level,
      |       COALESCE(p2.bucket, c2.bucket) AS bucket,
      |       COALESCE(p2.n, 0) AS n_prev, COALESCE(c2.n, 0) AS n_cur,
      |       COALESCE(p2.chk, -1) AS chk_prev, COALESCE(c2.chk, -1) AS chk_cur
      |FROM p2 FULL OUTER JOIN c2
      |  ON p2.level = c2.level AND p2.bucket = c2.bucket
      |WHERE p2.n IS NULL OR c2.n IS NULL OR p2.n <> c2.n OR p2.chk <> c2.chk
      |ORDER BY level, bucket""".stripMargin

  /** q208 — incremental JOIN maintenance (delta-join IVM): q166 proved
    * stored partials + delta == full for a single-table rollup; this is
    * the same contract for a two-table JOIN view, where the delta
    * algebra has cross terms. With both sides split base/delta
    * deterministically (ΔO = order keys ≡ 0 mod 10, ΔL = line rows with
    * (orderkey + linenumber) ≡ 3 mod 7 — independent rules, so every
    * cross term is non-empty), the view V = γ(O ⋈ L) satisfies the
    * inclusion–exclusion identity
    *
    *   V = γ(Ob ⋈ Lb)  +  γ(ΔO ⋈ L)  +  γ(O ⋈ ΔL)  −  γ(ΔO ⋈ ΔL)
    *
    * (the ΔO⋈ΔL term is double-counted by the two middle terms — the
    * subtraction is exact because count/sum are additive with signed
    * weights). The base term comes from a STORED parquet rollup
    * materialized once (the q166 store seam); the query emits the
    * incremental and full answers side by side with equality booleans,
    * so a broken delta algebra in either engine flips the driver hash.
    *
    * Scale shape: the base term is never re-joined — it is a ≤5-row
    * stored rollup read. Each delta term joins a delta against the
    * OPPOSITE full side; at 100 TB those joins prune to the delta's key
    * range against the bucketed snapshot store (the
    * `CdcStreams.applyBatchPartitioned` seam) instead of full scans —
    * per-run cost proportional to the deltas, not to history. All four
    * γ terms are map-side-combinable aggregates to the 5-row priority
    * relation; the signed merge is a union of tiny relations.
    */
  def q208JoinIvm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = scratchDir("graft_ivm_join")
    val o = Tables.orders(spark, dir).select($"o_orderkey",
      $"o_orderpriority", ($"o_orderkey" % 10 === 0).as("d_o"))
    val l = Tables.lineitem(spark, dir).select($"l_orderkey",
      expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")
        .as("cents"),
      (($"l_orderkey" + $"l_linenumber") % 7 === 3).as("d_l"))
    def view(os: DataFrame, ls: DataFrame): DataFrame =
      os.join(ls, os("o_orderkey") === ls("l_orderkey"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), sum($"cents").as("rev"))
    view(o.filter(!$"d_o"), l.filter(!$"d_l"))
      .write.mode("overwrite").parquet(out)
    val signed = spark.read.parquet(out).withColumn("sgn", lit(1L))
      .unionByName(view(o.filter($"d_o"), l).withColumn("sgn", lit(1L)))
      .unionByName(view(o, l.filter($"d_l")).withColumn("sgn", lit(1L)))
      .unionByName(view(o.filter($"d_o"), l.filter($"d_l"))
        .withColumn("sgn", lit(-1L)))
    val incr = signed.groupBy($"o_orderpriority")
      .agg(sum($"n" * $"sgn").as("n_incr"), sum($"rev" * $"sgn").as("rev_incr"))
    view(o, l)
      .select($"o_orderpriority", $"n".as("n_full"), $"rev".as("rev_full"))
      .join(incr, Seq("o_orderpriority"), "full")
      .select($"o_orderpriority", $"n_full", $"rev_full", $"n_incr",
        $"rev_incr",
        ($"n_full" <=> $"n_incr").as("counts_match"),
        ($"rev_full" <=> $"rev_incr").as("revenue_match"))
      .orderBy($"o_orderpriority")
  }

  val q208Sql: String =
    """WITH o AS (SELECT o_orderkey, o_orderpriority,
      |                  o_orderkey % 10 = 0 AS d_o FROM orders),
      |l AS (SELECT l_orderkey,
      |             CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |                  AS BIGINT) AS cents,
      |             (l_orderkey + l_linenumber) % 7 = 3 AS d_l
      |      FROM lineitem),
      |full_v AS (
      |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_full,
      |         CAST(sum(cents) AS BIGINT) AS rev_full
      |  FROM o JOIN l ON o_orderkey = l_orderkey GROUP BY 1),
      |terms AS (
      |  SELECT o_orderpriority, count(*) AS n, sum(cents) AS rev, 1 AS sgn
      |  FROM o JOIN l ON o_orderkey = l_orderkey
      |  WHERE NOT d_o AND NOT d_l GROUP BY 1
      |  UNION ALL
      |  SELECT o_orderpriority, count(*), sum(cents), 1
      |  FROM o JOIN l ON o_orderkey = l_orderkey WHERE d_o GROUP BY 1
      |  UNION ALL
      |  SELECT o_orderpriority, count(*), sum(cents), 1
      |  FROM o JOIN l ON o_orderkey = l_orderkey WHERE d_l GROUP BY 1
      |  UNION ALL
      |  SELECT o_orderpriority, count(*), sum(cents), -1
      |  FROM o JOIN l ON o_orderkey = l_orderkey
      |  WHERE d_o AND d_l GROUP BY 1),
      |incr AS (
      |  SELECT o_orderpriority, CAST(sum(n * sgn) AS BIGINT) AS n_incr,
      |         CAST(sum(rev * sgn) AS BIGINT) AS rev_incr
      |  FROM terms GROUP BY 1)
      |SELECT f.o_orderpriority, f.n_full, f.rev_full, i.n_incr, i.rev_incr,
      |       f.n_full = i.n_incr AS counts_match,
      |       f.rev_full = i.rev_incr AS revenue_match
      |FROM full_v f FULL OUTER JOIN incr i USING (o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin

  /** tmpfs scratch for the stored base-term rollup (q49/q166 policy),
    * tracked + swept by OpUtils.Scratch.
    */
  private def scratchDir(prefix: String): String = OpUtils.Scratch.dir(prefix)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q208_join_ivm" -> (q208JoinIvm _),
    "q133_snapshot_diff" -> (q133SnapshotDiff _),
    "q182_merkle_diff" -> (q182MerkleDiff _))

  val oracleSql: Map[String, String] = Map(
    "q208_join_ivm" -> q208Sql,
    "q133_snapshot_diff" -> q133Sql,
    "q182_merkle_diff" -> q182Sql)
}
