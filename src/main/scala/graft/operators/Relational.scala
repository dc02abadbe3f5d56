package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables
import OpUtils.dec

/** Core relational operator surface (SURVEY.md §2.2-§2.8): filters,
  * projections, joins (broadcast/shuffle/semi/anti), aggregations, windows,
  * sorts/top-k, set ops, scalar functions — the query layer the reference's
  * declared dbt marts imply (reference has no queries of its own:
  * `citibike_project/docker-compose.yaml:115-126` declares dbt with no
  * models), expressed Spark-first so Catalyst handles pushdown, pruning and
  * join strategy selection.
  *
  * Oracle-parity discipline (BASELINE.md t2 contract):
  *   - money-ish doubles are cast to DECIMAL(18,4) *before* aggregation in
  *     both the Spark plan and the DuckDB oracle SQL — decimal sums are
  *     exact and order-independent, so results are bit-stable across both
  *     engines regardless of partitioning/parallelism;
  *   - derived doubles (avg, variance) are computed from those exact
  *     decimal aggregates with an identical IEEE expression tree;
  *   - integer-valued outputs are cast to the same width on both sides
  *     (DuckDB SUM(int) is HUGEINT, Spark's is LONG — always pin BIGINT);
  *   - every query ends in a total-order sort so row order hashes stably.
  *
  * Scale notes (100 TB design): dimension tables (region 5 rows, nation 25,
  * supplier ~sf*100, part ~sf*20k) are explicitly `broadcast()` so the big
  * fact-side scan never shuffles for them; fact-fact joins (lineitem ⋈
  * orders) shuffle on the join key once and AQE handles skew; every filter
  * lands in `PushedFilters` of the parquet scan and projections prune the
  * read schema.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan-heavy agg with partial (map-side)
    * aggregation; shuffles only the tiny per-group partials. At 100 TB this
    * is bound by parquet scan throughput — only the needed lineitem columns
    * are read (column pruning) and the shipdate filter is pushed to the scan.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Row-level filter + projection (SURVEY.md §2.2 P3/P4 family): every
    * predicate is parquet-pushable and the read schema is 5 of 11 columns.
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        $"l_quantity" >= 45 && $"l_discount" < 0.03)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_shipdate")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_quantity >= 45 AND l_discount < 0.03
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3-style shipping priority: customer ⋈ orders ⋈ lineitem, top-10
    * unshipped orders by revenue. customer is broadcast (dimension-sized);
    * orders ⋈ lineitem shuffles on orderkey. The final top-k runs as
    * TakeOrderedAndProject — no full sort of the agg output.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit("1998-06-15").cast("timestamp")
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(spark, dir).filter($"o_orderdate" < cutoff)
    val li = Tables.lineitem(spark, dir).filter($"l_shipdate" > cutoff)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      // customer scales with SF (unlike fixed-size nation/region): no
      // broadcast hint — Catalyst/AQE broadcasts it from its parquet
      // size stats while small and shuffle-joins past the threshold
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-06-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Semi join (EXISTS; SURVEY.md §2.3): orders having at least one
    * high-quantity lineitem, counted by priority. left_semi never widens
    * rows — at scale it shuffles only the two key columns after pushdown.
    */
  def q4SemiJoinExists(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigLines = Tables.lineitem(spark, dir).filter($"l_quantity" >= 48)
      .select($"l_orderkey")
    Tables.orders(spark, dir)
      .join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q5-style: 6-way star join — all four dimension sides broadcast,
    * the lineitem ⋈ orders fact join is the only shuffle. Revenue by nation
    * for one region/year.
    */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      // customer/supplier scale with SF — unhinted (see q3's note);
      // nation (25 rows) and region (5) are FIXED size, so their hints
      // are safe at any scale
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount")))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6-style single-row filter aggregate: pure scan + pushed range
    * predicates, no shuffle beyond the single-partial merge.
    */
  def q6RevenueForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(
        sum(dec($"l_extendedprice") * dec($"l_discount")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q6Sql: String =
    """SELECT
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Anti join (NOT EXISTS; SURVEY.md §2.3) — customers that never ordered,
    * rolled up by nation. The moral equivalent of the reference's
    * "skip if table exists" idempotency probe
    * (`citibike_project/etl/ingest_data.py:251-262`) done relationally.
    */
  def q7CustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders1995 = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      .select($"o_custkey")
    Tables.customer(spark, dir)
      .join(orders1995, $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"n_name")
  }

  val q7Sql: String =
    """SELECT n_name, COUNT(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Window top-N per group (SURVEY.md §2.5): each customer's 3 largest
    * orders by row_number. One shuffle on the partition key; the rank filter
    * is applied before any join so only N rows per key survive.
    */
  def q8TopOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk")
  }

  val q8Sql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Running aggregate window frame (rowsBetween): cumulative revenue per
    * supplier in ship order. Decimal accumulation keeps the running sum
    * bit-exact under any partitioning; the unique (shipdate, orderkey,
    * linenumber) sort key makes the frame deterministic.
    */
  def q9RunningRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-04-01").cast("timestamp"))
      .withColumn("running_revenue",
        sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount")))
          .over(w).cast("double"))
      .select($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber", $"running_revenue")
      .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
  }

  val q9Sql: String =
    """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
      |    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE) AS running_revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin

  /** lag/lead (SURVEY.md §2.5): days between consecutive orders per
    * customer. datediff on midnight timestamps is engine-identical.
    */
  def q10OrderGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
      .withColumn("gap_days", datediff($"o_orderdate", $"prev_date").cast("long"))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"gap_days")
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  val q10Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(DATE_DIFF('day', LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) AS BIGINT) AS gap_days
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** Set operations (SURVEY.md §2.7): customers active in both 1995 and
    * 1996 (INTERSECT) vs only 1995 (EXCEPT), tagged and unioned.
    */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def active(y: Int) = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
        $"o_orderdate" < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select($"o_custkey")
    val both = active(1995).intersect(active(1996)).withColumn("cohort", lit("both"))
    val only95 = active(1995).except(active(1996)).withColumn("cohort", lit("only_1995"))
    both.union(only95)
      .select($"cohort", $"o_custkey")
      .orderBy($"cohort", $"o_custkey")
  }

  val q11Sql: String =
    """WITH a95 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
      |     a96 AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      |SELECT 'both' AS cohort, o_custkey FROM (SELECT o_custkey FROM a95 INTERSECT SELECT o_custkey FROM a96) t
      |UNION ALL
      |SELECT 'only_1995' AS cohort, o_custkey FROM (SELECT o_custkey FROM a95 EXCEPT SELECT o_custkey FROM a96) t
      |ORDER BY cohort, o_custkey""".stripMargin

  /** ROLLUP with GROUPING markers (SURVEY.md §2.4 cube/rollup family).
    * Grouping-set NULLs + grouping() flags pinned to INT on both sides.
    */
  def q12Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        grouping($"l_returnflag").cast("int").as("g_flag"),
        grouping($"l_linestatus").cast("int").as("g_status"))
      .orderBy($"g_flag", $"g_status", $"l_returnflag", $"l_linestatus")
  }

  val q12Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_qty,
      |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin

  /** Pivot (conditional aggregation): order counts + totals per nation by
    * order status. Spark's `pivot()` yields NULL for empty cells — coalesce
    * to 0 to match SQL's FILTER counts.
    */
  def q13PivotStatus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey") // unhinted: scales with SF
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"n_name",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
      .orderBy($"n_name")
  }

  val q13Sql: String =
    """SELECT n_name,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** DISTINCT aggregation (SURVEY.md §2.4): exact distinct counts per
    * market segment. countDistinct expands to a two-phase hash agg —
    * the expensive-but-exact path (approx_count_distinct is the scale
    * alternative, not oracle-checkable).
    */
  def q14DistinctCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey") // unhinted: scales with SF
      .groupBy($"c_mktsegment")
      .agg(
        countDistinct($"o_custkey").as("n_active_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy($"c_mktsegment")
  }

  val q14Sql: String =
    """SELECT c_mktsegment,
      |  COUNT(DISTINCT o_custkey) AS n_active_customers,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Scalar subquery without float drift: parts priced above their type's
    * average. The avg comparison is cross-multiplied into exact decimal
    * space (`price * n > total`) so both engines pick the identical row set
    * — a double `avg` would differ in the last ulp between engines.
    */
  def q15AboveAvgParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.part(spark, dir)
      .groupBy($"p_type")
      .agg(sum(dec($"p_retailprice")).as("total"), count(lit(1)).as("n"))
    Tables.part(spark, dir)
      .join(broadcast(stats), Seq("p_type"))
      .filter(dec($"p_retailprice") * $"n" > $"total")
      .select($"p_partkey", $"p_name", $"p_type", $"p_retailprice")
      .orderBy($"p_partkey")
  }

  val q15Sql: String =
    """SELECT p_partkey, p_name, p_type, p_retailprice
      |FROM part
      |JOIN (SELECT p_type AS t, SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS total, COUNT(*) AS n
      |      FROM part GROUP BY p_type) s ON p_type = s.t
      |WHERE CAST(p_retailprice AS DECIMAL(18,4)) * n > total
      |ORDER BY p_partkey""".stripMargin

  /** String functions (SURVEY.md §2.8 F2/F3 family): id extraction via
    * regexp, case/substring/concat/length — all codegen'd built-ins, no
    * UDFs.
    */
  def q16StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select(
        $"c_custkey",
        regexp_extract($"c_name", "(\\d+)", 1).cast("long").as("name_id"),
        upper(substring($"c_name", 1, 8)).as("name_prefix"),
        length($"c_name").cast("long").as("name_len"),
        concat_ws("/", $"c_mktsegment", $"c_name").as("tagged"))
      .orderBy($"c_custkey")
  }

  val q16Sql: String =
    """SELECT c_custkey,
      |  CAST(regexp_extract(c_name, '(\d+)', 1) AS BIGINT) AS name_id,
      |  UPPER(SUBSTRING(c_name, 1, 8)) AS name_prefix,
      |  CAST(LENGTH(c_name) AS BIGINT) AS name_len,
      |  CONCAT_WS('/', c_mktsegment, c_name) AS tagged
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Date bucketing (SURVEY.md §2.8 F1: the reference's only relational
    * predicate is EXTRACT(YEAR), `citibike_project/etl/ingest_data.py:268`):
    * year/quarter/month rollups of order value.
    */
  def q17DateBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(
        year($"o_orderdate").cast("long").as("o_year"),
        quarter($"o_orderdate").cast("long").as("o_quarter"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec($"o_totalprice")).cast("double").as("total_value"))
      .orderBy($"o_year", $"o_quarter")
  }

  val q17Sql: String =
    """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(QUARTER(o_orderdate) AS BIGINT) AS o_quarter,
      |  COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS total_value
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY o_year, o_quarter""".stripMargin

  /** Sort + LIMIT/OFFSET pagination (SURVEY.md §2.6 L1/L2 — done right:
    * the reference paginates without ORDER BY, a nondeterminism bug we fix
    * per §7.4). Spark plans the limit as TakeOrderedAndProject.
    */
  def q18TopkPagination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .offset(10)
      .limit(20)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
  }

  val q18Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20 OFFSET 10""".stripMargin

  /** Math scalar functions over exact inputs: abs/round/floor/ceil/sqrt
    * (IEEE-correctly-rounded, engine-identical) + integer modulo.
    */
  def q19MathFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" % 97 === 0)
      .select(
        $"o_orderkey",
        abs($"o_totalprice" - 1000.0).as("abs_centered"),
        round($"o_totalprice", 1).as("rounded"),
        floor($"o_totalprice").cast("long").as("floored"),
        ceil($"o_totalprice").cast("long").as("ceiled"),
        sqrt($"o_totalprice").as("sq"),
        ($"o_orderkey" % 7).cast("long").as("mod7"))
      .orderBy($"o_orderkey")
  }

  val q19Sql: String =
    """SELECT o_orderkey,
      |  ABS(o_totalprice - 1000.0) AS abs_centered,
      |  ROUND(o_totalprice, 1) AS rounded,
      |  CAST(FLOOR(o_totalprice) AS BIGINT) AS floored,
      |  CAST(CEIL(o_totalprice) AS BIGINT) AS ceiled,
      |  SQRT(o_totalprice) AS sq,
      |  CAST(o_orderkey % 7 AS BIGINT) AS mod7
      |FROM orders
      |WHERE o_orderkey % 97 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** q116 — relational division ("for all"): customers whose orders
    * cover EVERY order priority in the corpus. The scalable form is the
    * count-match reduction, not a quintuple nested NOT EXISTS: one
    * distinct-pair aggregation per customer (map-side combinable on the
    * (custkey, priority) pair), compared against the broadcast one-row
    * universe count. Output also carries the covering order count so
    * the row is informative, computed in the same aggregation pass.
    */
  def q116RelationalDivision(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val universe = o.agg(countDistinct($"o_orderpriority").as("n_prio"))
    o.groupBy($"o_custkey")
      .agg(countDistinct($"o_orderpriority").as("n_covered"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(universe))
      .filter($"n_covered" === $"n_prio")
      .select($"o_custkey", $"n_orders")
      .orderBy($"o_custkey")
  }

  val q116Sql: String =
    """SELECT o_custkey, count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(DISTINCT o_orderpriority) =
      |  (SELECT count(DISTINCT o_orderpriority) FROM orders)
      |ORDER BY o_custkey""".stripMargin

  /** q128 — ordered list aggregation (LISTAGG / string_agg): each
    * customer's order-priority "journey" concatenated in strict
    * (order-date, order-key) sequence. Determinism does NOT come from
    * `collect_list` (whose order is partition-arrival chaos) but from
    * `array_sort` over structs whose FIELD ORDER is the sort key —
    * lexicographic struct comparison gives (date, key, priority), and
    * the higher-order `transform` then projects the payload. Scale
    * note: list-agg state is the group's row count; orders-per-customer
    * is domain-bounded here, and the unbounded-group form of this
    * operator is `slice(array_sort(...), 1, k)` — truncate AFTER the
    * sort, keeping the same determinism. The oracle runs DuckDB's
    * native `string_agg(... ORDER BY)` — a different mechanism, same
    * string.
    */
  def q128OrderJourney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        concat_ws(">", transform(
          array_sort(collect_list(struct($"o_orderdate".as("d"),
            $"o_orderkey".as("k"), $"o_orderpriority".as("p")))),
          x => x.getField("p"))).as("journey"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_custkey")
  }

  val q128Sql: String =
    """SELECT o_custkey,
      |       string_agg(o_orderpriority, '>' ORDER BY o_orderdate, o_orderkey)
      |         AS journey,
      |       count(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** q139 — market share (the TPC-H Q8 shape, generalized): within the
    * ASIA-customer market, each supplier nation's share of yearly
    * revenue in exact basis points. Two levels of aggregation over a
    * six-table join: per-(year, supplier-nation) revenue, then per-year
    * totals joined back — the total relation is years-sized, so the
    * share join is a broadcast, never a second pass over the fact.
    *
    * Join-order showcase: the fact-fact join (lineitem ⋈ orders)
    * shuffles on the order key; customer/supplier ride their keys
    * unhinted (they scale with SF — AQE picks broadcast when they
    * fit); nation (25 rows) and region (5) are fixed-size and
    * explicitly broadcast. Catalyst pushes the region filter through
    * the join chain so non-ASIA customers never reach the fact join.
    *
    * Exactness: per-line revenue frozen to cents BIGINT at the leaf
    * (`round(ep·(1−disc)·100)` — the q113/q133 freeze, with the same
    * double expression text in both engines), so the two aggregation
    * levels and the share division (`rev·10000 div total`, both floor)
    * are pure integer arithmetic. Headroom: year-total cents ~2e12 at
    * sf1, ×10⁴ ~2e16 — BIGINT holds to ~sf400; past that the share
    * arithmetic widens to DECIMAL(38,0).
    */
  def q139MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val cnation = Tables.nation(spark, dir)
    val snation = Tables.nation(spark, dir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(cnation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(snation), $"s_nationkey" === $"sn_key")
      .withColumn("cents",
        expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"))
      .groupBy(year($"o_orderdate").cast("long").as("o_year"), $"supp_nation")
      .agg(sum($"cents").as("rev_cents"))
    val totals = rev.groupBy($"o_year").agg(sum($"rev_cents").as("tot_cents"))
    rev.join(broadcast(totals), Seq("o_year"))
      .withColumn("share_bp", expr("rev_cents * 10000 div tot_cents"))
      .select($"o_year", $"supp_nation", $"rev_cents", $"share_bp")
      .orderBy($"o_year", $"supp_nation")
  }

  val q139Sql: String =
    """WITH rev AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         sn.n_name AS supp_nation,
      |         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
      |                       AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region   ON cn.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY 1, 2),
      |tot AS (SELECT o_year, CAST(sum(rev_cents) AS BIGINT) AS tot_cents
      |        FROM rev GROUP BY 1)
      |SELECT rev.o_year, rev.supp_nation, rev.rev_cents,
      |       rev.rev_cents * 10000 // tot.tot_cents AS share_bp
      |FROM rev JOIN tot ON rev.o_year = tot.o_year
      |ORDER BY rev.o_year, rev.supp_nation""".stripMargin

  /** q170 — three-valued-logic audit: `NOT IN` vs `NOT EXISTS` against a
    * NULL-bearing subquery, the classic SQL semantics trap an engine must
    * get exactly right. The probe list is 12 nation keys with two
    * deterministically NULLed out (`k % 5 = 2`); the audit emits the
    * same anti-membership count three ways: NOT IN against the
    * NULL-free list (the baseline), NOT IN against the NULL-bearing
    * list (standard semantics: one NULL poisons the predicate to
    * UNKNOWN for every non-member, so the count MUST be 0), and
    * NOT EXISTS on the equality correlation (NULL never equals, so it
    * matches the clean baseline). The two boolean identities ride the
    * driver hash gate; Spark must plan the poisoned variant as a
    * null-aware anti join (pinned in PlanSpec-style within
    * RelationalSpec) rather than a plain anti join.
    *
    * Scale shape: the probe relation is nation-bounded (≤12 rows,
    * broadcast); all three counts are single-pass anti joins over the
    * customer fact. Expressed through `spark.sql` because NOT IN
    * subquery semantics are exactly the surface under test.
    */
  def q170NullSemantics(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_q170_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_q170_nation")
    spark.sql(
      """WITH probe AS (
        |  SELECT CASE WHEN n_nationkey % 5 = 2 THEN NULL
        |              ELSE n_nationkey END AS k
        |  FROM graft_q170_nation WHERE n_nationkey < 12),
        |clean AS (SELECT k FROM probe WHERE k IS NOT NULL)
        |SELECT
        |  (SELECT COUNT(*) FROM graft_q170_customer
        |   WHERE c_nationkey NOT IN (SELECT k FROM clean)) AS n_not_in_clean,
        |  (SELECT COUNT(*) FROM graft_q170_customer
        |   WHERE c_nationkey NOT IN (SELECT k FROM probe)) AS n_not_in_null,
        |  (SELECT COUNT(*) FROM graft_q170_customer c
        |   WHERE NOT EXISTS (SELECT 1 FROM probe p
        |                     WHERE p.k = c.c_nationkey)) AS n_not_exists
        |""".stripMargin)
      .selectExpr("n_not_in_clean", "n_not_in_null", "n_not_exists",
        "n_not_in_null = 0 AS null_poisons_not_in",
        "n_not_exists = n_not_in_clean AS not_exists_ignores_null")
  }

  val q170Sql: String =
    """WITH probe AS (
      |  SELECT CASE WHEN n_nationkey % 5 = 2 THEN NULL
      |              ELSE n_nationkey END AS k
      |  FROM nation WHERE n_nationkey < 12),
      |clean AS (SELECT k FROM probe WHERE k IS NOT NULL),
      |x AS (SELECT
      |  (SELECT COUNT(*) FROM customer
      |   WHERE c_nationkey NOT IN (SELECT k FROM clean)) AS n_not_in_clean,
      |  (SELECT COUNT(*) FROM customer
      |   WHERE c_nationkey NOT IN (SELECT k FROM probe)) AS n_not_in_null,
      |  (SELECT COUNT(*) FROM customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM probe p
      |                     WHERE p.k = c.c_nationkey)) AS n_not_exists)
      |SELECT n_not_in_clean, n_not_in_null, n_not_exists,
      |       n_not_in_null = 0 AS null_poisons_not_in,
      |       n_not_exists = n_not_in_clean AS not_exists_ignores_null
      |FROM x""".stripMargin

  /** q172 — inclusion–exclusion audit over three customer cohorts
    * (placed an URGENT / HIGH / MEDIUM order): |A∪B∪C| computed TWO
    * ways — directly as a distinct count, and via the
    * inclusion–exclusion identity from the seven intersection
    * cardinalities — with the equality boolean in the driver hash
    * gate. Two genuinely different mechanisms (distinct aggregation vs
    * arithmetic over flag sums), so a drop or double-count in either
    * flips the gate (the q117 two-algorithms discipline applied to set
    * algebra).
    *
    * Scale shape: ONE pass builds per-customer membership flags (hash
    * aggregate, map-side combinable); every one of the nine counts is
    * then a sum over that flags relation in a single second aggregate —
    * no per-cohort rescans, no joins.
    */
  def q172InclusionExclusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flags = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        max(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L)).as("a"),
        max(when($"o_orderpriority" === "2-HIGH", 1L).otherwise(0L)).as("b"),
        max(when($"o_orderpriority" === "3-MEDIUM", 1L).otherwise(0L)).as("c"))
    flags.agg(
      sum($"a").as("n_a"), sum($"b").as("n_b"), sum($"c").as("n_c"),
      sum($"a" * $"b").as("n_ab"), sum($"a" * $"c").as("n_ac"),
      sum($"b" * $"c").as("n_bc"),
      sum($"a" * $"b" * $"c").as("n_abc"),
      sum(when($"a" + $"b" + $"c" > 0, 1L).otherwise(0L)).as("union_direct"))
      .select($"n_a", $"n_b", $"n_c", $"n_ab", $"n_ac", $"n_bc", $"n_abc",
        $"union_direct",
        ($"n_a" + $"n_b" + $"n_c" - $"n_ab" - $"n_ac" - $"n_bc" + $"n_abc")
          .as("union_ie"),
        ($"union_direct" ===
          $"n_a" + $"n_b" + $"n_c" - $"n_ab" - $"n_ac" - $"n_bc" + $"n_abc")
          .as("ie_holds"))
  }

  val q172Sql: String =
    """WITH f AS (
      |  SELECT o_custkey,
      |    max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS a,
      |    max(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS b,
      |    max(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS c
      |  FROM orders GROUP BY 1),
      |s AS (SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
      |        CAST(sum(c) AS BIGINT) AS n_c,
      |        CAST(sum(a * b) AS BIGINT) AS n_ab,
      |        CAST(sum(a * c) AS BIGINT) AS n_ac,
      |        CAST(sum(b * c) AS BIGINT) AS n_bc,
      |        CAST(sum(a * b * c) AS BIGINT) AS n_abc,
      |        CAST(sum(CASE WHEN a + b + c > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS union_direct
      |      FROM f)
      |SELECT n_a, n_b, n_c, n_ab, n_ac, n_bc, n_abc, union_direct,
      |       n_a + n_b + n_c - n_ab - n_ac - n_bc + n_abc AS union_ie,
      |       union_direct = n_a + n_b + n_c - n_ab - n_ac - n_bc + n_abc
      |         AS ie_holds
      |FROM s""".stripMargin

  /** q173 — presence-set encoding (the bitmap-index primitive): each
    * customer's order-priority usage compressed to a 5-bit mask via
    * `bit_or` of per-priority powers of two, then the distribution of
    * masks — which priority COMBINATIONS exist and how common each is
    * (the "customer segments by behavior signature" rollup). `bit_count`
    * recovers the set size from the mask. Output ≤ 2⁵ rows at any
    * scale; the mask aggregate is map-side combinable and the mask is
    * exchangeable — two shards' masks OR together, the same
    * mergeability argument as the sketch tables (q106), but exact,
    * because the domain is 5 values.
    */
  def q173PresenceMask(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bit = expr(
      """CASE o_orderpriority
        |  WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 4
        |  WHEN '4-NOT SPECIFIED' THEN 8 ELSE 16 END""".stripMargin)
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(bit_or(bit).cast("long").as("mask"))
      .groupBy($"mask")
      .agg(count(lit(1)).as("n_customers"))
      .select($"mask", expr("bit_count(mask)").cast("long").as("n_priorities"),
        $"n_customers")
      .orderBy($"mask")
  }

  val q173Sql: String =
    """WITH m AS (
      |  SELECT o_custkey,
      |         bit_or(CASE o_orderpriority
      |           WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
      |           WHEN '3-MEDIUM' THEN 4 WHEN '4-NOT SPECIFIED' THEN 8
      |           ELSE 16 END) AS mask
      |  FROM orders GROUP BY 1)
      |SELECT CAST(mask AS BIGINT) AS mask,
      |       CAST(bit_count(CAST(mask AS BIGINT)) AS BIGINT) AS n_priorities,
      |       count(*) AS n_customers
      |FROM m GROUP BY 1 ORDER BY mask""".stripMargin

  /** The q178 twins: the same 1996-orders aggregate expressed
    * non-sargably (`year(o_orderdate) = 1996` — a function over the
    * column, opaque to parquet min/max pruning) and sargably (the
    * equivalent half-open date range, pushed to the scan as
    * GreaterThanOrEqual/LessThan). Exposed separately so PlanSpec can
    * pin the PushedFilters difference — the rewrite every query author
    * on a 100 TB table must know.
    */
  def q178YearFnAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter(expr("year(CAST(o_orderdate AS DATE)) = 1996"))
      .agg(count(lit(1)).as("n_fn"),
        sum(round($"o_totalprice" * 100).cast("long")).as("cents_fn"))
  }

  def q178RangeAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .agg(count(lit(1)).as("n_range"),
        sum(round($"o_totalprice" * 100).cast("long")).as("cents_range"))
  }

  /** q178 — sargability twin audit: both forms MUST agree (equality
    * booleans in the driver hash gate — a timezone or boundary slip in
    * the rewrite flips them), while PlanSpec pins that only the range
    * form reaches the parquet scan as a pushed filter. The declared
    * query carries the semantics; the plan difference is the lesson.
    */
  def q178SargabilityTwin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    q178YearFnAgg(spark, dir).crossJoin(broadcast(q178RangeAgg(spark, dir)))
      .select($"n_fn", $"cents_fn", $"n_range", $"cents_range",
        ($"n_fn" === $"n_range" && $"cents_fn" === $"cents_range")
          .as("rewrite_equivalent"))
  }

  val q178Sql: String =
    """WITH f AS (SELECT COUNT(*) AS n_fn,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents_fn
      |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996),
      |r AS (SELECT COUNT(*) AS n_range,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents_range
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1997-01-01')
      |SELECT n_fn, cents_fn, n_range, cents_range,
      |       n_fn = n_range AND cents_fn = cents_range AS rewrite_equivalent
      |FROM f, r""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q178_sargability_twin" -> (q178SargabilityTwin _),
    "q172_inclusion_exclusion" -> (q172InclusionExclusion _),
    "q173_presence_mask" -> (q173PresenceMask _),
    "q170_null_semantics" -> (q170NullSemantics _),
    "q139_market_share" -> (q139MarketShare _),
    "q128_order_journey" -> (q128OrderJourney _),
    "q116_relational_division" -> (q116RelationalDivision _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q4_semi_join_exists" -> (q4SemiJoinExists _),
    "q5_region_revenue" -> (q5RegionRevenue _),
    "q6_revenue_forecast" -> (q6RevenueForecast _),
    "q7_customers_without_orders" -> (q7CustomersWithoutOrders _),
    "q8_top_orders_per_customer" -> (q8TopOrdersPerCustomer _),
    "q9_running_revenue" -> (q9RunningRevenue _),
    "q10_order_gaps" -> (q10OrderGaps _),
    "q11_set_ops" -> (q11SetOps _),
    "q12_rollup" -> (q12Rollup _),
    "q13_pivot_status" -> (q13PivotStatus _),
    "q14_distinct_counts" -> (q14DistinctCounts _),
    "q15_above_avg_parts" -> (q15AboveAvgParts _),
    "q16_string_funcs" -> (q16StringFuncs _),
    "q17_date_buckets" -> (q17DateBuckets _),
    "q18_topk_pagination" -> (q18TopkPagination _),
    "q19_math_funcs" -> (q19MathFuncs _))

  val oracleSql: Map[String, String] = Map(
    "q178_sargability_twin" -> q178Sql,
    "q172_inclusion_exclusion" -> q172Sql,
    "q173_presence_mask" -> q173Sql,
    "q170_null_semantics" -> q170Sql,
    "q139_market_share" -> q139Sql,
    "q128_order_journey" -> q128Sql,
    "q116_relational_division" -> q116Sql,
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_shipping_priority" -> q3Sql,
    "q4_semi_join_exists" -> q4Sql,
    "q5_region_revenue" -> q5Sql,
    "q6_revenue_forecast" -> q6Sql,
    "q7_customers_without_orders" -> q7Sql,
    "q8_top_orders_per_customer" -> q8Sql,
    "q9_running_revenue" -> q9Sql,
    "q10_order_gaps" -> q10Sql,
    "q11_set_ops" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q13_pivot_status" -> q13Sql,
    "q14_distinct_counts" -> q14Sql,
    "q15_above_avg_parts" -> q15Sql,
    "q16_string_funcs" -> q16Sql,
    "q17_date_buckets" -> q17Sql,
    "q18_topk_pagination" -> q18Sql,
    "q19_math_funcs" -> q19Sql)
}
