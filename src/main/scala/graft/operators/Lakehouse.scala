package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Warehouse/lakehouse physical-design and change-data operators: Z-order
  * multi-dimensional layout (with a measurable file-skipping audit), SCD
  * Type-2 effective-dated dimensions, batch CDC MERGE application, and
  * RANGE-frame trailing windows. The reference stops at "load the CSV into
  * postgres" (`citibike_project/etl/ingest_data.py`); these are the
  * operations the same warehouse needs once the table is 100 TB and
  * append-only reloads stop being an option.
  *
  * Scale notes:
  *   - q109's shard assignment is VALUE-RANGE based (`z div 1024`, day
  *     range div), not ntile — no global-order window, no single-task
  *     sort; the audit is two map-side-combinable aggregations. This is
  *     exactly how a distributed writer lays out files
  *     (repartitionByRange on the interleaved key), so the audit measures
  *     the layout a cluster would actually produce.
  *   - q110/q113 are one shuffle each (partition by the entity key), all
  *     window work local to the partition.
  *   - q111 is the Delta/Iceberg MERGE semantic expressed as
  *     latest-change window + full-outer join — the join key is the
  *     merge key, so AQE can pick broadcast or shuffle sides freely.
  */
object Lakehouse {

  /** Morton interleave of the low `bits` of two cell columns: bit i of x
    * lands at position 2i+1, bit i of y at 2i. Pure codegen'd integer
    * expressions — no UDF.
    */
  def interleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** Appends `xcell`/`ycell` (rank-space quantization of two numeric
    * columns into 2^bits linear cells via a broadcast one-row stats
    * join) and `zval` (their Morton interleave). The generic form of
    * q109's layout key, reusable over any two numeric columns.
    */
  def mortonize(df: DataFrame, xCol: String, yCol: String, bits: Int = 8): DataFrame = {
    val b = 1 << bits
    val stats = df.agg(
      min(col(xCol)).cast("long").as("__minx"), max(col(xCol)).cast("long").as("__maxx"),
      min(col(yCol)).cast("long").as("__miny"), max(col(yCol)).cast("long").as("__maxy"))
    df.crossJoin(broadcast(stats))
      .withColumn("xcell",
        expr(s"((CAST($xCol AS BIGINT) - __minx) * $b) div (__maxx - __minx + 1)"))
      .withColumn("ycell",
        expr(s"((CAST($yCol AS BIGINT) - __miny) * $b) div (__maxy - __miny + 1)"))
      .withColumn("zval", interleave(col("xcell"), col("ycell"), bits))
      .drop("__minx", "__maxx", "__miny", "__maxy")
  }

  /** Z-order layout writer — the Delta `OPTIMIZE ZORDER BY` analog:
    * range-partitions rows on the Morton key into `shards` files, each
    * sorted on the key, so every file's footer min/max stats are tight
    * in BOTH dimensions and a reader's row-group pruning can skip on
    * either column. `repartitionByRange` samples the key distribution,
    * which is exactly how a 1000-executor writer would lay this out; no
    * global sort, no single-task stage. The cell/zval working columns
    * are dropped before the write — the layout is carried by row order,
    * not extra columns.
    */
  def writeZOrdered(df: DataFrame, dest: String, xCol: String, yCol: String,
      shards: Int, bits: Int = 8): Unit =
    mortonize(df, xCol, yCol, bits)
      .repartitionByRange(shards, col("zval"))
      .sortWithinPartitions("zval")
      .drop("xcell", "ycell", "zval")
      .write.mode("overwrite").parquet(dest)

  /** q109 — Z-order (Morton-interleaved) layout vs linear sort layout,
    * audited for file-skipping effectiveness. Both o_custkey and
    * order-day are quantized to 256 rank-space cells with pure integer
    * arithmetic; the Morton code interleaves 8 bits of each; shards are
    * value ranges of the resulting key (64 shards either way). Per shard
    * we keep min/max cell stats — the parquet footer stats a reader
    * prunes on — and count how many shards a 16-cell probe rectangle
    * must scan per dimension and for the conjunction. Z-order reads
    * ~1/8 of the shards for the key probe and ~1 shard for the
    * conjunctive probe where the linear layout reads all 64 / several.
    * All-integer, so the audit is bit-identical cross-engine.
    */
  def q109ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        datediff($"o_orderdate", lit("1992-01-01").cast("date")).cast("long").as("day"))
    val stats = o.agg(
      min($"o_custkey").as("minc"), max($"o_custkey").as("maxc"),
      min($"day").as("mind"), max($"day").as("maxd"))
    val cells = o.crossJoin(broadcast(stats))
      .withColumn("xcell", expr("((o_custkey - minc) * 256) div (maxc - minc + 1)"))
      .withColumn("ycell", expr("((day - mind) * 256) div (maxd - mind + 1)"))
      .withColumn("lshard", expr("((day - mind) * 64) div (maxd - mind + 1)"))
    val sharded = cells.withColumn("zshard",
      shiftright(interleave($"xcell", $"ycell", 8), 10))

    def audit(shardCol: String, layout: String): DataFrame =
      sharded.groupBy(col(shardCol).as("shard"))
        .agg(min($"xcell").as("xmin"), max($"xcell").as("xmax"),
          min($"ycell").as("ymin"), max($"ycell").as("ymax"))
        .agg(count(lit(1)).as("n_shards"),
          count(when($"xmax" >= 96 && $"xmin" <= 111, lit(1))).as("shards_key_probe"),
          count(when($"ymax" >= 96 && $"ymin" <= 111, lit(1))).as("shards_date_probe"),
          count(when($"xmax" >= 96 && $"xmin" <= 111 &&
            $"ymax" >= 96 && $"ymin" <= 111, lit(1))).as("shards_both_probe"))
        .select(lit(layout).as("layout"), $"n_shards",
          $"shards_key_probe", $"shards_date_probe", $"shards_both_probe")

    audit("lshard", "linear").union(audit("zshard", "zorder")).orderBy($"layout")
  }

  private val zTermsSql: String = (0 until 8).map { i =>
    s"(((xcell >> $i) & 1) << ${2 * i + 1}) + (((ycell >> $i) & 1) << ${2 * i})"
  }.mkString(" + ")

  val q109Sql: String =
    s"""WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |         date_diff('day', DATE '1992-01-01', o_orderdate) AS day
      |  FROM orders),
      |s AS (SELECT min(o_custkey) minc, max(o_custkey) maxc,
      |             min(day) mind, max(day) maxd FROM o),
      |cells AS (
      |  SELECT o_orderkey,
      |    ((o_custkey - minc) * 256) // (maxc - minc + 1) AS xcell,
      |    ((day - mind) * 256) // (maxd - mind + 1) AS ycell,
      |    ((day - mind) * 64) // (maxd - mind + 1) AS lshard
      |  FROM o, s),
      |sharded AS (SELECT *, ($zTermsSql) >> 10 AS zshard FROM cells),
      |za AS (SELECT zshard AS shard, min(xcell) xmin, max(xcell) xmax,
      |              min(ycell) ymin, max(ycell) ymax FROM sharded GROUP BY 1),
      |la AS (SELECT lshard AS shard, min(xcell) xmin, max(xcell) xmax,
      |              min(ycell) ymin, max(ycell) ymax FROM sharded GROUP BY 1),
      |audit AS (
      |  SELECT 'linear' AS layout, count(*) AS n_shards,
      |    count(*) FILTER (WHERE xmax >= 96 AND xmin <= 111) AS shards_key_probe,
      |    count(*) FILTER (WHERE ymax >= 96 AND ymin <= 111) AS shards_date_probe,
      |    count(*) FILTER (WHERE xmax >= 96 AND xmin <= 111
      |      AND ymax >= 96 AND ymin <= 111) AS shards_both_probe
      |  FROM la
      |  UNION ALL
      |  SELECT 'zorder', count(*),
      |    count(*) FILTER (WHERE xmax >= 96 AND xmin <= 111),
      |    count(*) FILTER (WHERE ymax >= 96 AND ymin <= 111),
      |    count(*) FILTER (WHERE xmax >= 96 AND xmin <= 111
      |      AND ymax >= 96 AND ymin <= 111)
      |  FROM za)
      |SELECT * FROM audit ORDER BY layout""".stripMargin

  /** q110 — SCD Type-2 effective-dated dimension built from the event
    * stream: per user, collapse consecutive repeats of event_type into
    * status episodes with [effective_from, effective_to) validity, a
    * monotone version number, and an is_current flag on the open row.
    * Two windows over ONE partitioning (user_id) — a single shuffle; the
    * change filter runs between them so the second window sees only
    * change rows. The (ts, event_id) sort key makes episode boundaries
    * deterministic under ties.
    */
  def q110Scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changes = Tables.events(spark, dir)
      .select($"user_id", $"event_type".as("status"), $"ts", $"event_id")
      .withColumn("prev", lag($"status", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"status")
    val w2 = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    changes.select($"user_id", $"status",
        $"ts".as("effective_from"),
        lead($"ts", 1).over(w2).as("effective_to"),
        row_number().over(w2).cast("long").as("version"),
        lead($"ts", 1).over(w2).isNull.as("is_current"))
      .orderBy($"user_id", $"version")
  }

  val q110Sql: String =
    """WITH c AS (
      |  SELECT user_id, event_type AS status, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events)
      |SELECT user_id, status, ts AS effective_from,
      |       lead(ts) OVER w AS effective_to,
      |       row_number() OVER w AS version,
      |       lead(ts) OVER w IS NULL AS is_current
      |FROM c WHERE prev IS NULL OR prev <> status
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** q111 — batch CDC MERGE application (the Delta/Iceberg `MERGE INTO`
    * semantic): a keyed change stream (derived from events — 'error'
    * rows are deletes, everything else an upsert carrying `value`) is
    * applied onto a base snapshot (even customer keys under 1000; the
    * parity split leaves odd event users as pure inserts and even
    * non-user keys as untouched base rows) with last-writer-wins
    * ordering on (ts, event_id). Output is the merged snapshot: kept
    * rows (no change arrived), updated rows (base + upsert), inserted
    * rows (upsert with no base), with deletes absent. One window
    * shuffle on the merge key + one join on the same key.
    */
  def q111CdcMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.customer(spark, dir)
      .filter($"c_custkey" < 1000 && $"c_custkey" % 2 === 0)
      .select($"c_custkey".as("cust_key"), $"c_acctbal".as("base_balance"))
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val latest = Tables.events(spark, dir)
      .select($"user_id",
        when($"event_type" === "error", lit("D")).otherwise(lit("U")).as("op"),
        $"value", $"ts", $"event_id")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id".as("cust_key"), $"op", $"value")
    base.join(latest, Seq("cust_key"), "full_outer")
      .filter($"op".isNull || $"op" === "U")
      .select($"cust_key",
        when($"op" === "U", $"value").otherwise($"base_balance").as("balance"),
        when($"op".isNull, lit("kept"))
          .when($"base_balance".isNull, lit("inserted"))
          .otherwise(lit("updated")).as("change"))
      .orderBy($"cust_key")
  }

  val q111Sql: String =
    """WITH base AS (
      |  SELECT c_custkey AS cust_key, c_acctbal AS base_balance
      |  FROM customer WHERE c_custkey < 1000 AND c_custkey % 2 = 0),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT user_id AS cust_key,
      |           CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |           value,
      |           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events) t WHERE rn = 1)
      |SELECT COALESCE(b.cust_key, l.cust_key) AS cust_key,
      |       CASE WHEN l.op = 'U' THEN l.value ELSE b.base_balance END AS balance,
      |       CASE WHEN l.op IS NULL THEN 'kept'
      |            WHEN b.base_balance IS NULL THEN 'inserted'
      |            ELSE 'updated' END AS change
      |FROM base b FULL OUTER JOIN latest l ON b.cust_key = l.cust_key
      |WHERE l.op IS NULL OR l.op = 'U'
      |ORDER BY cust_key""".stripMargin

  /** q113 — RANGE-frame trailing window (the frame variant q9's ROWS
    * frame doesn't cover): per customer, trailing-7-day order revenue
    * and order count, with the frame keyed on the integer day so peers
    * (same-day orders) are included regardless of row order. Money is
    * frozen to cents (BIGINT) before the frame sum so the accumulation
    * is exact and association-order-free — a RANGE frame's segment-tree
    * evaluation order differs between engines, and exact integers make
    * that unobservable. One shuffle on the customer key.
    */
  def q113RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        datediff($"o_orderdate", lit("1992-01-01").cast("date")).cast("long").as("day"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
    val w = Window.partitionBy($"o_custkey").orderBy($"day").rangeBetween(-6, 0)
    o.select($"o_orderkey", $"o_custkey", $"day",
        sum($"cents").over(w).as("rev7_cents"),
        count(lit(1)).over(w).as("n_orders_7d"))
      .orderBy($"o_orderkey")
  }

  val q113Sql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |         date_diff('day', DATE '1992-01-01', o_orderdate) AS day,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_orderkey, o_custkey, day,
      |       CAST(sum(cents) OVER w AS BIGINT) AS rev7_cents,
      |       count(*) OVER w AS n_orders_7d
      |FROM o
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
      |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  /** q114 — interval merge ("gaps and islands" with VARIABLE-length
    * intervals, which fixed-gap sessionization like q23 cannot express):
    * each event opens an interval [ts, ts + dur) whose duration is a
    * deterministic function of event_id (1–24.5 h); overlapping
    * intervals per user merge into islands. The merge is the classic
    * one-pass form: an island boundary is a start strictly after the
    * running max of all PRIOR ends (ROWS UNBOUNDED PRECEDING TO 1
    * PRECEDING), island id is the running sum of boundaries, then one
    * aggregation per island. All epoch-millis integer arithmetic; two
    * windows + the final aggregate share ONE user_id partitioning, so
    * the whole query is a single shuffle.
    */
  def q114IntervalMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val iv = Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        unix_millis($"ts").as("start_ms"),
        (unix_millis($"ts") + lit(3600000L) + ($"event_id" % 48) * lit(1800000L)).as("end_ms"))
    val w = Window.partitionBy($"user_id").orderBy($"start_ms", $"event_id")
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val islands = iv
      .withColumn("boundary",
        when($"start_ms" > max($"end_ms").over(prior), 1L).otherwise(
          when(max($"end_ms").over(prior).isNull, 1L).otherwise(0L)))
      .withColumn("island", sum($"boundary").over(w))
    islands.groupBy($"user_id", $"island")
      .agg(min($"start_ms").as("island_start_ms"),
        max($"end_ms").as("island_end_ms"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"island")
  }

  val q114Sql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id,
      |         epoch_ms(ts) AS start_ms,
      |         epoch_ms(ts) + 3600000 + (event_id % 48) * 1800000 AS end_ms
      |  FROM events),
      |b AS (
      |  SELECT *,
      |    CASE WHEN max(end_ms) OVER (PARTITION BY user_id ORDER BY start_ms, event_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |           OR start_ms > max(end_ms) OVER (PARTITION BY user_id ORDER BY start_ms, event_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS boundary
      |  FROM iv),
      |i AS (
      |  SELECT *, CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY start_ms, event_id) AS BIGINT) AS island
      |  FROM b)
      |SELECT user_id, island, min(start_ms) AS island_start_ms,
      |       max(end_ms) AS island_end_ms, count(*) AS n_events
      |FROM i GROUP BY user_id, island
      |ORDER BY user_id, island""".stripMargin

  /** q205 — metadata-only table stats via parquet AGGREGATE PUSHDOWN:
    * count(*) / min / max over the fact answered from parquet FOOTER
    * statistics, never decoding a data page — the 100 TB freshness
    * probe ("how many rows, what key range landed?") at the cost of
    * reading file metadata. Spark's DSv2 parquet scan rewrites the
    * whole aggregate into the scan when `spark.sql.parquet.
    * aggregatePushdown` is on and the query is filter-free min/max/
    * count over non-nested, non-float columns; PlanSpec pins the
    * `PushedAggregation` clause in the scan node so a regression to a
    * full decode is a test failure, and this query carries the SAME
    * numbers through the driver hash gate so the footer answer is
    * proven equal to DuckDB's full-scan answer.
    *
    * The conf is set on a CLONED session (`spark.newSession()` —
    * shared SparkContext, isolated SQL conf), so no other query in the
    * Verify/Bench process sees the flag.
    */
  def q205FooterStats(spark: SparkSession, dir: String): DataFrame = {
    val s2 = spark.newSession()
    // aggregate pushdown is a DSv2-scan feature; the default read path
    // keeps parquet on V1, so the cloned session routes parquet through
    // DSv2 as well (both confs session-scoped, nothing global changes)
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    footerStatsDf(s2, dir)
  }

  /** The aggregate that qualifies for parquet footer pushdown (shared
    * with PlanSpec's `PushedAggregation` pin): filter-free count/min/
    * max over integer key columns of the raw scan.
    */
  private[graft] def footerStatsDf(s2: SparkSession, dir: String): DataFrame = {
    import s2.implicits._
    s2.read.parquet(s"$dir/lineitem.parquet")
      .agg(expr("count(*)").as("n_rows"),
        min($"l_orderkey").as("min_orderkey"),
        max($"l_orderkey").as("max_orderkey"),
        min($"l_partkey").as("min_partkey"),
        max($"l_partkey").as("max_partkey"))
  }

  val q205Sql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(min(l_orderkey) AS BIGINT) AS min_orderkey,
      |       CAST(max(l_orderkey) AS BIGINT) AS max_orderkey,
      |       CAST(min(l_partkey) AS BIGINT) AS min_partkey,
      |       CAST(max(l_partkey) AS BIGINT) AS max_partkey
      |FROM lineitem""".stripMargin

  /** q209 — bucketed co-located join: the shuffle-elimination physical
    * design for the recurring big-big join. Both sides are materialized
    * as catalog tables CLUSTERED BY the join key into the same bucket
    * count (8), so the sort-merge join consumes the on-disk bucketing
    * as its required distribution and plans with ZERO Exchange — at
    * 100 TB this converts the nightly orders⋈lineitem shuffle (the
    * single largest network cost in the star) into a local per-bucket
    * merge, paid once at write time and amortized over every
    * subsequent join on that key. The declared query runs the join on
    * a session clone with broadcast disabled so the bucket-to-bucket
    * path is the one actually exercised (and pinned Exchange-free in
    * PlanSpec); the oracle joins the raw tables directly, so the
    * driver hash gate proves bucketed == unbucketed.
    *
    * Bucket-write shape: each side is repartitioned ON the bucket key
    * to `buckets` tasks before the write, so the table lands as one
    * file per bucket instead of tasks × buckets small files (the
    * bucketed-table version of the small-files discipline).
    */
  def q209BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val s2 = spark.newSession()
    import s2.implicits._
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val buckets = 8
    // EXTERNAL tables on per-run scratch paths: the catalog entry is
    // dropped and re-created each run, and the data location is fresh —
    // a managed table's warehouse path would survive the JVM while the
    // in-memory catalog forgets it, failing the next CREATE.
    val tmp = scratchDir("graft_bucketed")
    // the catalog is shared per SparkContext (session clones see the same
    // tables), so suffix the names with this run's scratch token —
    // interleaved runs (different SF dirs in one JVM) can't race on
    // DROP/CREATE or read each other's data
    val tok = new java.io.File(tmp).getName.replaceAll("[^A-Za-z0-9_]", "_")
    val (tOrders, tLineitem) = (s"graft_bkt_orders_$tok", s"graft_bkt_lineitem_$tok")
    // sweep STALE graft_bkt_* catalog entries: per-run tokens mean a
    // prior run's tables would otherwise linger forever, pointing at
    // scratch dirs Scratch.dir() already deleted — dangling paths that
    // trip any catalog-wide listTables+resolve. Only entries whose
    // external LOCATION no longer exists are dropped (r12 advisor): a
    // catalog-wide unconditional drop would delete a concurrent run's
    // live tables between its saveAsTable and read, breaking the
    // per-run-token isolation the tokens exist to provide. A prior
    // run's dirs are already deleted by this run's Scratch.dir() call
    // above (same prefix), so its entries always qualify as stale.
    // SHOW TABLES is a bounded meta read (catalog rows, not data).
    s2.sql("SHOW TABLES LIKE 'graft_bkt_*'").collect().foreach { r =>
      val t = r.getAs[String]("tableName")
      val locGone =
        try {
          val meta = s2.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(t))
          val p = new org.apache.hadoop.fs.Path(meta.location)
          !p.getFileSystem(s2.sparkContext.hadoopConfiguration).exists(p)
        } catch { case _: Exception => true } // unresolvable entry = stale
      if (locGone) s2.sql(s"DROP TABLE IF EXISTS $t")
    }
    // this run's own names are always safe to clear (fresh unique token)
    Seq(tOrders, tLineitem).foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
    Tables.orders(s2, dir).select($"o_orderkey", $"o_orderpriority")
      .repartition(buckets, $"o_orderkey")
      .write.format("parquet").option("path", s"$tmp/orders")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(tOrders)
    Tables.lineitem(s2, dir).select($"l_orderkey",
      expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")
        .as("cents"))
      .repartition(buckets, $"l_orderkey")
      .write.format("parquet").option("path", s"$tmp/lineitem")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(tLineitem)
    s2.table(tOrders)
      .join(s2.table(tLineitem),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), sum($"cents").as("revenue_cents"))
      .orderBy($"o_orderpriority")
  }

  /** tmpfs scratch (q49/q166 policy), tracked + swept by OpUtils.Scratch. */
  private def scratchDir(prefix: String): String = OpUtils.Scratch.dir(prefix)

  val q209Sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |                     AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** q214 — hive-partitioned lake write + partition-PRUNED read: the
    * directory-level data skipping that complements q109's z-order
    * statistics skipping — events land under `day=<epoch-day>/`
    * directories (`partitionBy` at write), and the two-day consumer
    * query prunes to exactly those directories at PLANNING time
    * (`PartitionFilters` in the scan, pinned in PlanSpec), so at 100 TB
    * a day-scoped query lists two directories instead of scanning the
    * calendar. The oracle reproduces the same two-day aggregate from
    * the raw events table via the identical epoch-day arithmetic, so
    * the hash gate covers write → partition → prune → read.
    *
    * The probe window is the lake's own first two days (one-row min
    * meta read, the q166 high-watermark precedent) — data-derived, so
    * the query works at every SF.
    */
  def q214PartitionPrunedLake(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = scratchDir("graft_day_lake")
    Tables.events(spark, dir)
      .select($"event_type",
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val lake = spark.read.parquet(out)
    val d0 = lake.agg(min($"day").cast("long")).collect()(0).getLong(0)
    prunedTwoDayRollup(lake, d0)
  }

  /** The consumer whose scan must carry `PartitionFilters` (shared with
    * the PlanSpec pin): a two-day slice aggregated per (day, type).
    */
  private[graft] def prunedTwoDayRollup(lake: DataFrame, d0: Long): DataFrame = {
    import lake.sparkSession.implicits._
    lake.filter($"day" >= d0 && $"day" <= d0 + 1)
      // partition-column type inference may surface `day` as INT —
      // canonicalize to BIGINT so the emitted schema is layout-invariant
      .groupBy($"day".cast("long").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"v").as("value_micro"))
      .orderBy($"day", $"event_type")
  }

  val q214Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |         CAST(round(value * 1000000) AS BIGINT) AS v
      |  FROM events),
      |d0 AS (SELECT min(day) AS d0 FROM e)
      |SELECT CAST(day AS BIGINT) AS day, event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(v) AS BIGINT) AS value_micro
      |FROM e, d0 WHERE day >= d0 AND day <= d0 + 1
      |GROUP BY day, event_type ORDER BY day, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q214_partition_pruned_lake" -> (q214PartitionPrunedLake _),
    "q209_bucketed_join" -> (q209BucketedJoin _),
    "q205_footer_stats" -> (q205FooterStats _),
    "q109_zorder_layout" -> (q109ZorderLayout _),
    "q110_scd2_dim" -> (q110Scd2Dim _),
    "q111_cdc_merge" -> (q111CdcMerge _),
    "q113_range_frame" -> (q113RangeFrame _),
    "q114_interval_merge" -> (q114IntervalMerge _))

  val oracleSql: Map[String, String] = Map(
    "q214_partition_pruned_lake" -> q214Sql,
    "q209_bucketed_join" -> q209Sql,
    "q205_footer_stats" -> q205Sql,
    "q109_zorder_layout" -> q109Sql,
    "q110_scd2_dim" -> q110Sql,
    "q111_cdc_merge" -> q111Sql,
    "q113_range_frame" -> q113Sql,
    "q114_interval_merge" -> q114Sql)
}
