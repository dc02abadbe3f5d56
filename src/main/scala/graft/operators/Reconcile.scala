package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_snapshot_diff" -> (q133SnapshotDiff _))

  val oracleSql: Map[String, String] = Map(
    "q133_snapshot_diff" -> q133Sql)
}
