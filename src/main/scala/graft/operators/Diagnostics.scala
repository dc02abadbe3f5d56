package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Operability diagnostics — the queries an engine runs about ITSELF
  * before committing to a plan at 100 TB: key-skew censuses (is this
  * join key salt-worthy? — the measurement behind q57's salting
  * decision) and join-cardinality estimation (will this shuffle blow
  * up? — the stats a cost-based optimizer consumes). The reference has
  * no operability layer at all; these make the engine's scale
  * disciplines (salting, broadcast thresholds, AQE skew handling)
  * data-driven instead of guessed.
  */
object Diagnostics {

  /** q144 — join-key skew census over the three hot keys (lineitem.
    * l_orderkey, orders.o_custkey, events.user_id): the group-size
    * distribution in power-of-two bands, (col_name, band, n_keys,
    * n_rows) — band = ⌊log₂(group size)⌋ computed EXACTLY as
    * binary-digit count (`conv(·,10,2)` / `bin(·)` length — never
    * float log₂, whose 2.999… rounding at powers of two differs per
    * libm). A heavy band at the top is the signal that feeds the q57
    * salting path / AQE skew thresholds.
    *
    * Scale shape: one hash aggregate to the key-count relation per
    * column (map-side combinable), then a bands-sized second
    * aggregate — the census costs one shuffle per audited key and its
    * output is ~64 rows regardless of data size.
    */
  def q144SkewCensus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def census(df: DataFrame, key: String, name: String): DataFrame = {
      import df.sparkSession.implicits._
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
        .select(lit(name).as("col_name"),
          (length(conv($"cnt".cast("string"), 10, 2)) - 1).cast("long").as("band"),
          $"cnt")
        .groupBy($"col_name", $"band")
        .agg(count(lit(1)).as("n_keys"), sum($"cnt").as("n_rows"))
    }
    census(Tables.lineitem(spark, dir), "l_orderkey", "lineitem.l_orderkey")
      .unionByName(census(Tables.orders(spark, dir), "o_custkey",
        "orders.o_custkey"))
      .unionByName(census(Tables.events(spark, dir), "user_id",
        "events.user_id"))
      .orderBy($"col_name", $"band")
  }

  val q144Sql: String =
    """WITH src AS (
      |  SELECT 'lineitem.l_orderkey' AS col_name, l_orderkey AS k FROM lineitem
      |  UNION ALL SELECT 'orders.o_custkey', o_custkey FROM orders
      |  UNION ALL SELECT 'events.user_id', user_id FROM events),
      |c AS (SELECT col_name, k, CAST(count(*) AS BIGINT) AS cnt
      |      FROM src GROUP BY 1, 2)
      |SELECT col_name, CAST(length(bin(cnt)) - 1 AS BIGINT) AS band,
      |       count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows
      |FROM c GROUP BY 1, 2 ORDER BY col_name, band""".stripMargin

  /** q145 — join-cardinality estimation sandwich for the self-join on
    * `l_partkey` (the co-purchase blowup predictor): the EXACT output
    * size Σₖ cnt(k)² from the key-count relation, next to the
    * 256-bucket hash-histogram upper bound Σ_b (Σ_{k∈b} cntₖ)² — the
    * O(1)-state statistic a planner keeps per column. The bound is a
    * THEOREM (expanding the square: cross terms are non-negative), so
    * the emitted `ub_ge_exact` must be true on any input — a false
    * value means the bucketing lost rows and flips the driver hash —
    * and `ratio_bp` quantifies how loose 256 buckets are on this key
    * distribution (planner folklore: within ~2× on non-adversarial
    * keys; adversarial = many keys colliding into one bucket).
    *
    * Scale: the exact side costs one hash aggregate (|keys| rows);
    * the estimator side aggregates 256 rows of state — at 100 TB only
    * the estimator is kept fresh per partition/day and the exact pass
    * runs as a periodic calibration, the q42/q97 production/audit
    * cadence applied to optimizer statistics.
    */
  def q145JoinCardEstimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the exact, bucketed, and meta branches
    val exact = counts.agg(sum($"cnt").as("n_rows"),
      count(lit(1)).as("n_keys"), sum($"cnt" * $"cnt").as("exact_pairs"))
    val ub = counts
      .select(pmod(graft.functions.Md5Prefix60($"l_partkey".cast("string")),
        lit(256L)).as("b"), $"cnt")
      .groupBy($"b").agg(sum($"cnt").as("tb"))
      .agg(sum($"tb" * $"tb").as("bucket_ub"))
    exact.crossJoin(broadcast(ub))
      .select($"n_rows", $"n_keys", $"exact_pairs", $"bucket_ub",
        ($"bucket_ub" >= $"exact_pairs").as("ub_ge_exact"),
        expr("bucket_ub * 10000 div exact_pairs").as("ratio_bp"))
  }

  val q145Sql: String =
    """WITH c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
      |           FROM lineitem GROUP BY 1),
      |e AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
      |        CAST(count(*) AS BIGINT) AS n_keys,
      |        CAST(sum(cnt * cnt) AS BIGINT) AS exact_pairs FROM c),
      |b AS (SELECT CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
      |               AS BIGINT) % 256 AS b, CAST(sum(cnt) AS BIGINT) AS tb
      |      FROM c GROUP BY 1),
      |u AS (SELECT CAST(sum(tb * tb) AS BIGINT) AS bucket_ub FROM b)
      |SELECT n_rows, n_keys, exact_pairs, bucket_ub,
      |       bucket_ub >= exact_pairs AS ub_ge_exact,
      |       bucket_ub * 10000 // exact_pairs AS ratio_bp
      |FROM e, u""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q144_skew_census" -> (q144SkewCensus _),
    "q145_join_card_estimate" -> (q145JoinCardEstimate _))

  val oracleSql: Map[String, String] = Map(
    "q144_skew_census" -> q144Sql,
    "q145_join_card_estimate" -> q145Sql)
}
