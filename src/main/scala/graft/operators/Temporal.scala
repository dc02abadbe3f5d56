package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import OpUtils.dec

/** Time-series operators over the event stream: point-in-time dimension
  * lookup, gap-fill with last-observation-carried-forward, Markov
  * transition matrices, and duration-weighted averages. The reference's
  * time handling stops at casting pickup timestamps on ingest
  * (`citibike_project/etl/ingest_data.py:171-178`); these are the
  * operations an analytics engine needs once the timestamps are load-
  * bearing (attribution at event time, state duration, sequence models).
  *
  * Scale discipline shared by the family: every window partitions by
  * `user_id` (the natural shard key — millions of partitions, each tiny),
  * so the sort inside each window is local and the whole query is one
  * hash shuffle; date spines are generated per-row with `sequence()`
  * (bounded by the series span, never a driver-side loop); and every
  * accumulated quantity is frozen to exact integer/decimal units before
  * aggregation so segment-tree/accumulation order is unobservable.
  */
object Temporal {

  /** q118 — point-in-time (bitemporal) lookup against an SCD2 dimension:
    * the user's *status* dimension is built from the non-purchase events
    * (consecutive-repeat collapse, [effective_from, effective_to)
    * half-open validity — the q110 construction over a filtered input),
    * then each purchase event is enriched with the status that was
    * valid AT its event time and revenue is rolled up by that status.
    * The temporal predicate rides on the `user_id` equi-key, so the
    * plan is a plain hash join with a range post-filter — never a range
    * scan across users. Purchases before a user's first status row
    * surface as 'unknown' (LEFT join), so the lookup's coverage is
    * auditable from the output itself.
    */
  def q118PitLookup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val dim = events.filter($"event_type" =!= "purchase")
      .select($"user_id", $"event_type".as("status"), $"ts", $"event_id")
      .withColumn("prev", lag($"status", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"status")
      .select($"user_id".as("d_user"), $"status",
        $"ts".as("valid_from"), lead($"ts", 1).over(w).as("valid_to"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", dec($"value").as("v"))
    purchases
      .join(dim,
        purchases("user_id") === dim("d_user") &&
          purchases("ts") >= dim("valid_from") &&
          (dim("valid_to").isNull || purchases("ts") < dim("valid_to")),
        "left")
      .groupBy(coalesce($"status", lit("unknown")).as("status_at_purchase"))
      .agg(count(lit(1)).as("n_purchases"),
        sum($"v").cast("double").as("total_value"))
      .orderBy($"status_at_purchase")
  }

  val q118Sql: String =
    """WITH se AS (
      |  SELECT user_id, event_type AS status, ts, event_id,
      |         lag(event_type) OVER w AS prev
      |  FROM events WHERE event_type <> 'purchase'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |dim AS (
      |  SELECT user_id, status, ts AS valid_from, lead(ts) OVER w AS valid_to
      |  FROM se WHERE prev IS NULL OR prev <> status
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |p AS (
      |  SELECT user_id, ts, CAST(value AS DECIMAL(18,4)) AS v
      |  FROM events WHERE event_type = 'purchase')
      |SELECT COALESCE(d.status, 'unknown') AS status_at_purchase,
      |       count(*) AS n_purchases,
      |       CAST(CAST(sum(p.v) AS STRING) AS DOUBLE) AS total_value
      |FROM p LEFT JOIN dim d
      |  ON p.user_id = d.user_id AND p.ts >= d.valid_from
      |  AND (d.valid_to IS NULL OR p.ts < d.valid_to)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q119 — daily gap-fill with last-observation-carried-forward: per
    * user, daily purchase totals are projected onto a dense date spine
    * (user's first purchase day → the corpus's last event day) and gap
    * days carry the last observed total forward — the resample/ffill
    * primitive every downstream time-series consumer (drift monitors,
    * retention curves, forecasting features) assumes exists. The spine
    * is `sequence()` per user (array bounded by the series span, built
    * executor-side — no driver loop, no numbers-table scan), the global
    * right edge is a broadcast one-row aggregate, and the fill is a
    * running `last(ignoreNulls)` inside the per-user window. Totals sum
    * in DECIMAL (exact, order-independent) then freeze to DOUBLE at the
    * output boundary — the repo-wide convention — so the carried copies
    * inherit a driver-stable type rather than an engine-specific
    * decimal precision.
    */
  def q119GapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val daily = events.filter($"event_type" === "purchase")
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(sum(dec($"value")).cast("double").as("observed"))
    val edge = events.agg(max(to_date($"ts")).as("dmax"))
    val spine = daily.groupBy($"user_id").agg(min($"day").as("d0"))
      .crossJoin(broadcast(edge))
      .select($"user_id",
        explode(sequence($"d0", $"dmax", expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
    spine.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        last($"observed", ignoreNulls = true).over(w).as("filled"),
        $"observed".isNotNull.as("is_observed"))
      .orderBy($"user_id", $"day")
  }

  val q119Sql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS STRING) AS DOUBLE)
      |           AS observed
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |edge AS (SELECT CAST(max(ts) AS DATE) AS dmax FROM events),
      |spine AS (
      |  SELECT b.user_id,
      |         CAST(unnest(generate_series(b.d0, e.dmax, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, min(day) AS d0 FROM daily GROUP BY 1) b
      |  CROSS JOIN edge e)
      |SELECT s.user_id, s.day,
      |       last_value(d.observed IGNORE NULLS)
      |         OVER (PARTITION BY s.user_id ORDER BY s.day) AS filled,
      |       d.observed IS NOT NULL AS is_observed
      |FROM spine s LEFT JOIN daily d
      |  ON s.user_id = d.user_id AND s.day = d.day
      |ORDER BY s.user_id, s.day""".stripMargin

  /** q120 — first-order Markov transition matrix over event types: per
    * user the event sequence is ordered by (ts, event_id) and adjacent
    * pairs counted into (from_state, to_state) cells, with the row-
    * conditional probability emitted in exact basis points (integer
    * `div` against the broadcast-small row totals — both engines floor,
    * so no float division crosses the oracle hash). One per-user window
    * shuffle + one hash aggregation; the matrix itself is
    * |states|² — tiny at any corpus scale, which is what makes sequence
    * models cheap to fit even at 100 TB of raw events.
    */
  def q120TransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val counts = Tables.events(spark, dir)
      .select($"user_id", $"event_type".as("to_state"), $"ts", $"event_id")
      .withColumn("from_state", lag($"to_state", 1).over(w))
      .filter($"from_state".isNotNull)
      .groupBy($"from_state", $"to_state")
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy($"from_state")
    counts
      .withColumn("from_total", sum($"n").over(wf))
      .withColumn("share_bp", expr("n * 10000 div from_total"))
      .select($"from_state", $"to_state", $"n", $"from_total", $"share_bp")
      .orderBy($"from_state", $"to_state")
  }

  val q120Sql: String =
    """WITH pairs AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           AS from_state,
      |         event_type AS to_state
      |  FROM events),
      |counts AS (
      |  SELECT from_state, to_state, count(*) AS n
      |  FROM pairs WHERE from_state IS NOT NULL GROUP BY 1, 2)
      |SELECT from_state, to_state, n,
      |       CAST(sum(n) OVER (PARTITION BY from_state) AS BIGINT) AS from_total,
      |       CAST((n * 10000) // sum(n) OVER (PARTITION BY from_state) AS BIGINT)
      |         AS share_bp
      |FROM counts ORDER BY from_state, to_state""".stripMargin

  /** q123 — duration-weighted (time-weighted) average event value per
    * user: each event's value holds until the user's next event, so the
    * average weights each value by its holding duration — the TWAP /
    * state-duration primitive that a plain `avg` silently gets wrong on
    * irregular series. All arithmetic is exact integers end to end:
    * values frozen to milli-units (`floor(value*1000)` — floor, not
    * cast, because Spark truncates and DuckDB rounds on cast), holding
    * times in epoch micros, and the final quotient by integer `div`
    * (both engines floor non-negative quotients identically). Worst-case
    * per-user numerator is ~5e5 milli-units × 2.6e12 µs (a 30-day span)
    * ≈ 1.3e18 — inside BIGINT with 7× headroom, so no decimal widening
    * is needed at any SF with a bounded series span; a multi-year span
    * at larger values is the documented point to widen to DECIMAL(38,0).
    * One per-user window shuffle carries the whole query.
    */
  def q123TimeWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id",
        floor($"value" * 1000).cast("long").as("vm"))
      .withColumn("dur_us", unix_micros(lead($"ts", 1).over(w)) - unix_micros($"ts"))
      .filter($"dur_us".isNotNull)
      .groupBy($"user_id")
      .agg(sum($"vm" * $"dur_us").as("vt_sum"), sum($"dur_us").as("dur_sum"))
      .withColumn("twa_milli", expr("vt_sum div dur_sum"))
      .orderBy($"user_id")
  }

  val q123Sql: String =
    """WITH seq AS (
      |  SELECT user_id,
      |         CAST(floor(value * 1000) AS BIGINT) AS vm,
      |         epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(sum(vm * dur_us) AS BIGINT) AS vt_sum,
      |       CAST(sum(dur_us) AS BIGINT) AS dur_sum,
      |       CAST(sum(vm * dur_us) // sum(dur_us) AS BIGINT) AS twa_milli
      |FROM seq WHERE dur_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q124 — interval-overlap join via temporal binning: which user
    * sessions (q23's 30-min-gap sessionization) were live during
    * incident windows (±30 min around each error event), with the
    * exact overlap duration — the ops-analytics "who was affected"
    * join. A direct overlap predicate is a theta join (quadratic, and
    * Spark would plan it as a nested loop); instead both interval sets
    * are EXPLODED onto a shared hour-bin grid and equi-joined on the
    * bin — the standard distributed interval join. Replication factor
    * is `len/bin + 1 ≤ 3` here because the bin width (1 h) is chosen at
    * the scale of the intervals; pairs sharing several bins are deduped
    * before aggregation, and the whole-bin candidate set bounds the
    * work at (sessions/bin)×(incidents/bin) per bin instead of
    * sessions×incidents. The DuckDB oracle runs the quadratic theta
    * join directly — an independent algorithm, so a bin-edge bug
    * (dropped boundary pair) flips the driver hash. A pathological bin
    * (incident storm) is q57's salting situation; the grid key salts
    * trivially.
    */
  def q124IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binUs = 3600L * 1000000
    val halfWinUs = 30L * 60 * 1000000
    val gapUs = 30L * 60 * 1000000
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val events = Tables.events(spark, dir)
    val sessions = events
      .withColumn("us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"us", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_us".isNull || $"us" - $"prev_us" > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_session")
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"us").as("s_start"), max($"us").as("s_end"))
    val incidents = events.filter($"event_type" === "error")
      .select($"event_id".as("incident_id"),
        (unix_micros($"ts") - halfWinUs).as("i_start"),
        (unix_micros($"ts") + halfWinUs).as("i_end"))
    val sBinned = sessions.withColumn("bin",
      explode(sequence(expr(s"s_start div $binUs"), expr(s"s_end div $binUs"))))
    val iBinned = incidents.withColumn("bin",
      explode(sequence(expr(s"i_start div $binUs"), expr(s"i_end div $binUs"))))
    sBinned.join(iBinned, Seq("bin"))
      .filter($"s_start" <= $"i_end" && $"i_start" <= $"s_end")
      .select($"user_id", $"session_id", $"incident_id",
        (least($"s_end", $"i_end") - greatest($"s_start", $"i_start")).as("overlap_us"))
      .dropDuplicates("user_id", "session_id", "incident_id")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_overlaps"), sum($"overlap_us").as("overlap_us_sum"))
      .orderBy($"user_id")
  }

  val q124Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, session_id, min(us) AS s_start, max(us) AS s_end
      |  FROM (SELECT user_id, us,
      |          sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |        FROM flagged) t
      |  GROUP BY 1, 2),
      |i AS (
      |  SELECT event_id AS incident_id,
      |         epoch_us(ts) - 1800000000 AS i_start,
      |         epoch_us(ts) + 1800000000 AS i_end
      |  FROM events WHERE event_type = 'error')
      |SELECT s.user_id, count(*) AS n_overlaps,
      |       CAST(sum(least(s_end, i_end) - greatest(s_start, i_start)) AS BIGINT)
      |         AS overlap_us_sum
      |FROM s JOIN i ON s.s_start <= i.i_end AND i.i_start <= s.s_end
      |GROUP BY s.user_id
      |ORDER BY user_id""".stripMargin

  /** q126 — cumulative distinct reach (users ever seen, per day): the
    * DAU-accumulation curve. COUNT(DISTINCT) OVER a growing window is
    * either unsupported (Spark) or a per-day rescan (naive SQL); the
    * scalable identity is that a user enters the cumulative count
    * exactly once — on their FIRST day — so the curve is
    * first-day-per-user (one hash aggregate over the fact) → new-user
    * counts per day (aggregate over users) → prefix sum over the tiny
    * day relation. The only window runs over ≤ series-span rows. The
    * oracle computes each day's COUNT(DISTINCT) against the raw fact
    * directly — quadratic in days×fact, fine at oracle scale, and a
    * genuinely different evaluation.
    */
  def q126CumulativeReach(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val days = events.select(to_date($"ts").as("day")).distinct()
    val newPerDay = events.groupBy($"user_id").agg(min(to_date($"ts")).as("day"))
      .groupBy($"day").agg(count(lit(1)).as("nu"))
    val w = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(newPerDay, Seq("day"), "left")
      .withColumn("new_users", coalesce($"nu", lit(0L)))
      .withColumn("cum_users", sum($"new_users").over(w))
      .select($"day", $"new_users", $"cum_users")
      .orderBy($"day")
  }

  val q126Sql: String =
    """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
      |SELECT d.day,
      |  (SELECT count(DISTINCT e.user_id) FROM events e
      |   WHERE CAST(e.ts AS DATE) = d.day
      |     AND NOT EXISTS (SELECT 1 FROM events p
      |                     WHERE p.user_id = e.user_id
      |                       AND CAST(p.ts AS DATE) < d.day)) AS new_users,
      |  (SELECT count(DISTINCT e.user_id) FROM events e
      |   WHERE CAST(e.ts AS DATE) <= d.day) AS cum_users
      |FROM days d
      |ORDER BY day""".stripMargin

  /** q127 — rolling 7-day distinct users per day (the sliding-window
    * reach metric): COUNT(DISTINCT) over a sliding RANGE frame doesn't
    * exist in either engine's window support at scale; the distributed
    * form replicates each (user, active-day) pair onto the ≤7 window
    * anchor days it can serve (bounded replication = window length,
    * same discipline as q124's interval bins), dedups to (anchor-day,
    * user), and counts — three hash aggregates, no global sort, no
    * per-day rescan. Anchor days are restricted to days the corpus
    * actually contains (dense here; an empty anchor day would simply
    * not appear). The oracle recomputes each day's distinct set
    * directly against the raw fact.
    */
  def q127RollingReach(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val userDays = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val anchors = userDays.select($"day").distinct()
      .select($"day".as("anchor"))
    val contrib = userDays
      .withColumn("anchor",
        explode(sequence($"day", date_add($"day", 6), expr("interval 1 day"))))
      .select($"anchor", $"user_id").distinct()
    contrib.join(anchors, Seq("anchor"))
      .groupBy($"anchor".as("day"))
      .agg(count(lit(1)).as("users_7d"))
      .orderBy($"day")
  }

  val q127Sql: String =
    """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
      |SELECT d.day,
      |  (SELECT count(DISTINCT e.user_id) FROM events e
      |   WHERE CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day) AS users_7d
      |FROM days d
      |ORDER BY day""".stripMargin

  /** q129 — rolling reach, sketch-production form: q127's exact
    * replication answer is the calibration baseline; THIS is what runs
    * at 100 TB — one `hll_sketch_agg` partial per day (mergeable,
    * storable, the q106 rollup-table discipline applied to reach), the
    * 7-day window answered by `hll_union_agg` over ≤7 daily sketches
    * replicated onto their anchor days (the q127 grid, but carrying
    * ~KB sketches instead of every user row). The fact is touched
    * exactly once; window width changes (7→30→90 days) re-merge stored
    * sketches without re-scanning history. The emitted columns are the
    * exact reach plus an engine-portable boolean pinning the estimate
    * inside the lgK=12 error envelope (±5%) — sketch VALUES never
    * cross the oracle boundary (merge-order-dependent), the same
    * discipline as q96/q99/q106.
    */
  def q129RollingReachSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val anchors = daily.select($"day".as("anchor"))
    val merged = daily
      .withColumn("anchor",
        explode(sequence($"day", date_add($"day", 6), expr("interval 1 day"))))
      .join(anchors, Seq("anchor"))
      .groupBy($"anchor".as("day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
    merged.join(q127RollingReach(spark, dir), Seq("day"))
      .select($"day", $"users_7d",
        (abs($"est" - $"users_7d").cast("double") / $"users_7d" <= 0.05)
          .as("est_in_bounds"))
      .orderBy($"day")
  }

  val q129Sql: String =
    """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
      |SELECT d.day,
      |  (SELECT count(DISTINCT e.user_id) FROM events e
      |   WHERE CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day) AS users_7d,
      |  TRUE AS est_in_bounds
      |FROM days d
      |ORDER BY day""".stripMargin

  /** q130 — day-over-day audience churn (Jaccard of consecutive daily
    * active-user sets): the set-overlap time series behind retention
    * alarms. Both the intersection (equi-join on (user, shifted day) —
    * each user-day row matches at most one successor row) and the
    * per-day sizes are exact integer counts; the Jaccard lands in
    * integer basis points via `div` (both engines floor), so no float
    * division crosses the oracle hash. Work is two hash aggregates +
    * one equi-join on the deduped user-day relation — the same shape at
    * any corpus size.
    */
  def q130DailyChurn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ud = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val sizes = ud.groupBy($"day").agg(count(lit(1)).as("n"))
    val common = ud.as("a")
      .join(ud.as("b"),
        $"a.user_id" === $"b.user_id" && date_add($"a.day", 1) === $"b.day")
      .groupBy($"b.day".as("day")).agg(count(lit(1)).as("n_common"))
    sizes.select($"day", $"n".as("n_curr"))
      .join(sizes.select(date_add($"day", 1).as("day"), $"n".as("n_prev")), Seq("day"))
      .join(common, Seq("day"), "left")
      .withColumn("n_common", coalesce($"n_common", lit(0L)))
      .withColumn("jaccard_bp",
        expr("n_common * 10000 div (n_prev + n_curr - n_common)"))
      .select($"day", $"n_prev", $"n_curr", $"n_common", $"jaccard_bp")
      .orderBy($"day")
  }

  val q130Sql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |sizes AS (SELECT day, count(*) AS n FROM ud GROUP BY day),
      |common AS (
      |  SELECT b.day AS day, count(*) AS n_common
      |  FROM ud a JOIN ud b ON a.user_id = b.user_id AND a.day + 1 = b.day
      |  GROUP BY 1)
      |SELECT c.day, p.n AS n_prev, c.n AS n_curr,
      |       COALESCE(m.n_common, 0) AS n_common,
      |       (COALESCE(m.n_common, 0) * 10000)
      |         // (p.n + c.n - COALESCE(m.n_common, 0)) AS jaccard_bp
      |FROM sizes c
      |JOIN sizes p ON p.day + 1 = c.day
      |LEFT JOIN common m ON m.day = c.day
      |ORDER BY c.day""".stripMargin

  /** q147 — activity-rate anomaly flags: a user-day is anomalous when
    * its event count exceeds 3× the user's trailing-28-day daily
    * average — division-free, in pure integers: the flag is
    * `cnt·28 > 3·trailing_sum` (cross-multiplied, so no float ratio
    * and no floor-rounding question exists at all), computed with ONE
    * RANGE-frame window (28 PRECEDING .. 1 PRECEDING on the integer
    * epoch-day key — calendar-gap-correct where a ROWS frame would
    * silently span months for sparse users). One user_id shuffle for
    * the daily rollup and the frame; output only the flagged rows, so
    * result size tracks anomalies, not activity.
    */
  def q147RateAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"user_id",
        expr("unix_micros(ts) div 86400000000").as("epoch_day"))
      .agg(count(lit(1)).as("cnt"))
    val trail = Window.partitionBy($"user_id").orderBy($"epoch_day")
      .rangeBetween(-28L, -1L)
    daily
      .withColumn("trail_cnt", coalesce(sum($"cnt").over(trail), lit(0L)))
      .filter($"trail_cnt" > 0 && $"cnt" * 28 > $"trail_cnt" * 3)
      .select($"user_id", $"epoch_day", $"cnt", $"trail_cnt")
      .orderBy($"user_id", $"epoch_day")
  }

  val q147Sql: String =
    """WITH daily AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS epoch_day,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT user_id, epoch_day, cnt,
      |        COALESCE(CAST(sum(cnt) OVER (PARTITION BY user_id ORDER BY epoch_day
      |          RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |          AS trail_cnt
      |      FROM daily)
      |SELECT user_id, epoch_day, cnt, trail_cnt
      |FROM w WHERE trail_cnt > 0 AND cnt * 28 > trail_cnt * 3
      |ORDER BY user_id, epoch_day""".stripMargin

  /** q159 — CUSUM change-point detection over daily event volumes, per
    * event type: the classic cumulative-sum control chart
    * (Page 1954), division-free in pure integers. With D = the type's
    * day count and T its total events, the running statistic is
    * `S_t = Σ_{u≤t} (cnt_u·D − T)` — cnt·D−T is the ×D-cross-multiplied
    * deviation from the type's mean daily rate, so S drifts monotonely
    * through a level shift and hovers near 0 under stationarity; a day
    * is flagged when |S_t| > T (cumulative drift past one average
    * day's volume ×D — a deterministic, unitless-consistent
    * threshold). No float mean, no division anywhere.
    *
    * Scale shape: one hash aggregate to the (type, day) relation
    * (map-side combinable), per-type totals re-aggregated from it and
    * broadcast back, then ONE cumulative window partitioned by type
    * over the days axis — state bounded by the calendar span × type
    * dimension, never by event count.
    */
  def q159CusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type",
        expr("unix_micros(ts) div 86400000000").as("epoch_day"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // (type, day)-sized; feeds totals + the chart
    val totals = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("d_days"), sum($"cnt").as("t_total"))
    val wCum = Window.partitionBy($"event_type").orderBy($"epoch_day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(totals), "event_type")
      .withColumn("cusum", sum($"cnt" * $"d_days" - $"t_total").over(wCum))
      .select($"event_type", $"epoch_day", $"cnt", $"cusum",
        (abs($"cusum") > $"t_total").as("flagged"))
      .orderBy($"event_type", $"epoch_day")
  }

  val q159Sql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS epoch_day,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS d_days,
      |             CAST(sum(cnt) AS BIGINT) AS t_total
      |      FROM daily GROUP BY 1)
      |SELECT daily.event_type, daily.epoch_day, daily.cnt,
      |       CAST(sum(daily.cnt * t.d_days - t.t_total)
      |            OVER (PARTITION BY daily.event_type ORDER BY daily.epoch_day)
      |            AS BIGINT) AS cusum,
      |       abs(CAST(sum(daily.cnt * t.d_days - t.t_total)
      |            OVER (PARTITION BY daily.event_type ORDER BY daily.epoch_day)
      |            AS BIGINT)) > t.t_total AS flagged
      |FROM daily JOIN t ON daily.event_type = t.event_type
      |ORDER BY daily.event_type, daily.epoch_day""".stripMargin

  /** q171 — walk-forward forecast backtest with integer MAPE: the
    * persistence ("naive last-week") forecast scored per market
    * segment — the baseline every real revenue model must beat, and
    * the eval harness is the operator worth shipping: weekly actuals,
    * one lag per segment for the prediction, absolute percentage
    * error frozen to basis points per scored week
    * (`|act − pred|·10⁴ div act`, positive so `div`/`//` agree), then
    * the mean of those integer bp (`Σape div n` — mean-of-frozen, the
    * exact analogue of the micro-nat discipline). Emitted per
    * segment: weeks scored, MAPE bp, and the worst single week.
    *
    * Scale shape: one hash aggregate to the (segment, week) relation;
    * the lag window and the final rollup both run on that tiny
    * relation (segments × calendar weeks), never the fact.
    */
  def q171ForecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weekly = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment".as("segment"),
        date_trunc("week", $"o_orderdate").as("week"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("act"))
    val wLag = Window.partitionBy($"segment").orderBy($"week")
    weekly
      .withColumn("pred", lag($"act", 1).over(wLag))
      .filter($"pred".isNotNull)
      .withColumn("ape_bp", expr("abs(act - pred) * 10000 div act"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_weeks"),
        expr("sum(ape_bp) div count(1)").as("mape_bp"),
        max($"ape_bp").as("worst_ape_bp"))
      .orderBy($"segment")
  }

  val q171Sql: String =
    """WITH w AS (
      |  SELECT c.c_mktsegment AS segment, date_trunc('week', o.o_orderdate) AS week,
      |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |           AS act
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |p AS (SELECT segment, week, act,
      |        lag(act, 1) OVER (PARTITION BY segment ORDER BY week) AS pred
      |      FROM w),
      |e AS (SELECT segment, abs(act - pred) * 10000 // act AS ape_bp
      |      FROM p WHERE pred IS NOT NULL)
      |SELECT segment, CAST(count(*) AS BIGINT) AS n_weeks,
      |       CAST(sum(ape_bp) // count(*) AS BIGINT) AS mape_bp,
      |       CAST(max(ape_bp) AS BIGINT) AS worst_ape_bp
      |FROM e GROUP BY 1 ORDER BY segment""".stripMargin

  /** q176 — activity rhythm matrix (the ops-dashboard heatmap): event
    * counts on the hour-of-day × day-of-week grid, with day-of-week
    * computed ENGINE-FREE as `(epoch_day + 4) % 7` (1970-01-01 was a
    * Thursday; Spark's `dayofweek` is 1=Sunday while DuckDB's `dow` is
    * 0=Sunday — the class of off-by-one that silently shifts a whole
    * heatmap, excluded by pure integer arithmetic). The week is
    * pivoted into columns (`sum(when)` — the static-pivot form both
    * engines express identically), 24 rows at any scale.
    *
    * Scale shape: one map-side-combinable hash aggregate to the
    * 24×7 grid; the pivot is projection arithmetic on that grid.
    */
  def q176RhythmMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .select(
        expr("(unix_micros(ts) div 3600000000) % 24").as("hour"),
        expr("((unix_micros(ts) div 86400000000) + 4) % 7").as("dow"))
      .groupBy($"hour", $"dow").agg(count(lit(1)).as("n"))
    val cols = (0 to 6).map(d =>
      sum(when($"dow" === d, $"n").otherwise(0L)).as(s"d$d"))
    base.groupBy($"hour")
      .agg(cols.head, cols.tail: _*)
      .orderBy($"hour")
  }

  val q176Sql: String = {
    val cols = (0 to 6).map(d =>
      s"CAST(sum(CASE WHEN dow = $d THEN 1 ELSE 0 END) AS BIGINT) AS d$d")
      .mkString(",\n      |       ")
    s"""WITH e AS (
       |  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
       |         ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow
       |  FROM events)
       |SELECT hour, $cols
       |FROM e GROUP BY hour ORDER BY hour""".stripMargin
  }

  /** q181 — dyadic time-decay engagement leaderboard: recency-weighted
    * per-user value where the decay base is EXACTLY 1/2 per week, so
    * "exponential decay" becomes an integer arithmetic right-shift
    * (`value_micro >> age_weeks` — both engines shift arithmetically,
    * i.e. floor), and the classic float `pow(λ, age)` — whose libm
    * differences could never cross the hash gate — disappears
    * entirely. Half-life-per-week is the standard practitioner choice
    * anyway; any dyadic half-life (per day, per 4 weeks) is the same
    * shift with a different divisor. The horizon is the data's own max
    * day (deterministic; production passes its watermark). Top-20 by
    * score, ties broken by user id.
    *
    * Scale shape: one map-side-combinable aggregate per user after a
    * broadcast of the one-row horizon; TakeOrdered(20) — no global
    * sort. Shift amounts are capped at 62 so ancient events decay to
    * 0 rather than overflowing the shift.
    */
  def q181DecayScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v"))
    val h = ev.agg(max($"day").as("h_day"))
    ev.crossJoin(broadcast(h))
      .withColumn("k", least(expr("(h_day - day) div 7"), lit(62L)).cast("int"))
      .withColumn("dv", expr("shiftright(v, k)"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"dv").as("score_micro"))
      .orderBy($"score_micro".desc, $"user_id")
      .limit(20)
  }

  val q181Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |             CAST(round(value * 1000000) AS BIGINT) AS v
      |           FROM events),
      |h AS (SELECT max(day) AS h_day FROM e),
      |d AS (SELECT user_id,
      |        v >> CAST(least((h.h_day - day) // 7, 62) AS INTEGER) AS dv
      |      FROM e, h)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(dv) AS BIGINT) AS score_micro
      |FROM d GROUP BY 1
      |ORDER BY score_micro DESC, user_id LIMIT 20""".stripMargin

  /** q187 — sample autocorrelation (ACF) of the daily event-count
    * series at lags 1–7: the seasonality/trend diagnostic read before
    * trusting q171's persistence baseline or picking q147's anomaly
    * window (a strong lag-7 says "weekly rhythm — compare same-weekday,
    * not yesterday"; q176 shows the rhythm's shape, this quantifies its
    * strength). Exact arithmetic end-to-end: with S = Σx and n days,
    * the mean-centered value is cleared of the rational x̄ = S/n by
    * scaling — z_t = n·x_t − S (exact BIGINT) — so
    * acf_k = Σ z_t·z_{t+k} / Σ z_t² is a ratio of exact integers,
    * emitted in basis points with the q152 SIGN-SPLIT division
    * (autocorrelations go negative; Spark `div` truncates, DuckDB `//`
    * floors). Products widen to DECIMAL(38,0)/HUGEINT (z² ~ (n·x)²
    * crosses BIGINT once n·x̄ passes ~3e9 — a decade of 100M-event
    * days). Lag is CALENDAR days: a pair exists only when both day and
    * day+k are present, so series gaps contribute nothing — the
    * convention both engines share by construction.
    *
    * Scale shape: one hash aggregate to the days-sized series relation
    * (bounded by the calendar, not the corpus); the 7 lag pairings are
    * one broadcast of the 7-row lag spine + one equi self-join of the
    * tiny series; output is 7 rows at any scale.
    */
  def q187Acf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val s = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // days-sized; feeds z (used on both join sides)
    val st = s.agg(count(lit(1)).as("n"), sum($"cnt").as("sm"))
    val z = s.crossJoin(broadcast(st))
      .select($"day", ($"n" * $"cnt" - $"sm").as("z"))
      .localCheckpoint()
    val den = z.agg(sum($"z".cast(d38) * $"z").as("den"))
    val lags = spark.range(1, 8).select($"id".as("lag"))
    z.crossJoin(broadcast(lags))
      .select($"lag", ($"day" + $"lag").as("day"), $"z".as("za"))
      .join(z.select($"day", $"z".as("zb")), Seq("day"))
      .groupBy($"lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"za".cast(d38) * $"zb").as("num"))
      .crossJoin(broadcast(den))
      .select($"lag", $"n_pairs",
        expr("""CAST(CASE WHEN num < 0 THEN -((-num * 10000) div den)
                          ELSE (num * 10000) div den END AS BIGINT)""")
          .as("acf_bp"))
      .orderBy($"lag")
  }

  val q187Sql: String =
    """WITH s AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |             CAST(count(*) AS BIGINT) AS cnt
      |           FROM events GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(cnt) AS BIGINT) AS sm FROM s),
      |z AS (SELECT day, n * cnt - sm AS z FROM s, st),
      |den AS (SELECT CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS den
      |        FROM z),
      |l AS (SELECT CAST(k AS BIGINT) AS lag FROM range(1, 8) t(k)),
      |p AS (SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
      |        CAST(sum(CAST(a.z AS HUGEINT) * b.z) AS HUGEINT) AS num
      |      FROM l JOIN z a ON true JOIN z b ON b.day = a.day + l.lag
      |      GROUP BY 1)
      |SELECT p.lag, p.n_pairs,
      |       CAST(CASE WHEN num < 0 THEN -((-num * 10000) // den)
      |                 ELSE (num * 10000) // den END AS BIGINT) AS acf_bp
      |FROM p, den ORDER BY p.lag""".stripMargin

  /** q197 — clamped running balance (floor-at-zero inventory): per
    * user, credits (purchases) and debits (errors) in event-time order
    * with the balance CLAMPED below at zero — the stateful recurrence
    * `S_t = max(0, S_{t−1} + δ_t)` that naive window sums cannot
    * express because clamping makes it non-associative. The engine
    * form uses the exact one-sided-clamp identity
    * `S_t = P_t − min(0, min_{j≤t} P_j)` (P = unclamped prefix sum):
    * two frames over ONE user_id×ts window ordering, pure BIGINT cents
    * end-to-end, so the "sequential" recurrence runs as an ordinary
    * data-parallel window — the identity is the whole trick, and the
    * spec re-derives it against a literal sequential driver fold. One
    * clamp side only: a cap-above-AND-floor-below band is genuinely
    * order-coupled and would need the mapPartitions escape hatch.
    *
    * Output per user: move count, raw final sum, clamped final
    * balance, and how much was absorbed by the floor (the overdraft a
    * real ledger would have rejected).
    *
    * Scale shape: one user_id shuffle shared by both window frames and
    * the final aggregate; per-user partitions sort locally.
    */
  def q197ClampedBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mv = Tables.events(spark, dir)
      .filter($"event_type".isin("purchase", "error"))
      .select($"user_id", $"event_id",
        expr("unix_micros(ts)").as("us"),
        when($"event_type" === "purchase", round($"value" * 100).cast("long"))
          .otherwise(-round($"value" * 100).cast("long")).as("delta"))
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mv.withColumn("p", sum($"delta").over(w))
      .withColumn("mn", least(min($"p").over(w), lit(0L)))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_moves"),
        sum($"delta").as("raw_final"),
        // last row per user = the full-frame values: max(us, event_id)
        // keys the argmax through the struct-max aggregate (no second
        // window pass)
        max(struct($"us", $"event_id", ($"p" - $"mn").as("bal"))).as("t"))
      .select($"user_id", $"n_moves", $"raw_final",
        $"t.bal".as("clamped_final"),
        ($"t.bal" - $"raw_final").as("absorbed"))
      .orderBy($"user_id")
  }

  val q197Sql: String =
    """WITH mv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |         CASE WHEN event_type = 'purchase'
      |              THEN CAST(round(value * 100) AS BIGINT)
      |              ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
      |  FROM events WHERE event_type IN ('purchase', 'error')),
      |q AS (SELECT user_id, event_id, us, delta, psum AS p,
      |        least(CAST(min(psum) OVER (PARTITION BY user_id
      |          ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT), 0)
      |          AS mn
      |      FROM (SELECT user_id, event_id, us, delta,
      |              CAST(sum(delta) OVER (PARTITION BY user_id
      |                ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
      |                AS BIGINT) AS psum
      |            FROM mv) z)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_moves,
      |       CAST(sum(delta) AS BIGINT) AS raw_final,
      |       CAST(max(struct_pack(us := us, event_id := event_id,
      |                            bal := p - mn)).bal AS BIGINT)
      |         AS clamped_final,
      |       CAST(max(struct_pack(us := us, event_id := event_id,
      |                            bal := p - mn)).bal
      |            - sum(delta) AS BIGINT) AS absorbed
      |FROM q GROUP BY 1 ORDER BY user_id""".stripMargin

  /** q207 — business-day SLA latency (order date → line ship date in
    * WEEKDAYS, per order priority): the operational form of shipping
    * latency — calendars, not wall-clock — that every fulfilment /
    * freshness SLA is written against. The weekday count is a closed-
    * form integer expression, never a generated calendar join: with
    * d = epoch day, g(m) = 5·(m div 7) + least(greatest(m mod 7 − 1,
    * 0), 5) counts weekdays in [0, m) of the Sunday-aligned line
    * (epoch day −4 was a Sunday, hence the +5 shift), and weekdays in
    * (d₁, d₂] = g(d₂+5) − g(d₁+5). The formula is validated against an
    * independent busday implementation in TemporalSpec and is the SAME
    * integer text in both engines — no dow() convention (Spark
    * 1=Sunday vs DuckDB 0=Sunday, the q176 hazard) can shift it.
    *
    * Scale shape: one equi hash join orders⋈lineitem on the order key
    * (both sides big — a genuine shuffle join, AQE-handled), then one
    * map-side-combinable aggregate to the 5-row priority relation.
    * avg is exact milli-days (sum·1000 div n, non-negative so div/`//`
    * agree); breach = > 14 business days.
    */
  def q207BusinessDaySla(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def g(m: String): String =
      s"(5 * (($m) div 7) + least(greatest(($m) % 7 - 1, 0L), 5L))"
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey",
        expr("unix_date(cast(l_shipdate as date))").cast("long").as("sd"))
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority",
        expr("unix_date(cast(o_orderdate as date))").cast("long").as("od"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .withColumn("bd", expr(s"${g("sd + 5")} - ${g("od + 5")}"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum($"bd").as("total_busdays"),
        max($"bd").as("max_busdays"),
        sum(when($"bd" > 14, 1L).otherwise(0L)).as("n_breach"))
      .select($"o_orderpriority", $"n_lines", $"total_busdays",
        expr("(total_busdays * 1000) div n_lines").as("avg_busdays_milli"),
        $"max_busdays", $"n_breach")
      .orderBy($"o_orderpriority")
  }

  val q207Sql: String =
    """WITH j AS (
      |  SELECT o_orderpriority,
      |         (5 * ((CAST(CAST(l_shipdate AS DATE)
      |                     - DATE '1970-01-01' AS BIGINT) + 5) // 7)
      |          + least(greatest((CAST(CAST(l_shipdate AS DATE)
      |                     - DATE '1970-01-01' AS BIGINT) + 5) % 7 - 1, 0), 5))
      |         - (5 * ((CAST(CAST(o_orderdate AS DATE)
      |                     - DATE '1970-01-01' AS BIGINT) + 5) // 7)
      |          + least(greatest((CAST(CAST(o_orderdate AS DATE)
      |                     - DATE '1970-01-01' AS BIGINT) + 5) % 7 - 1, 0), 5))
      |           AS bd
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(sum(bd) AS BIGINT) AS total_busdays,
      |       CAST(sum(bd) * 1000 // count(*) AS BIGINT) AS avg_busdays_milli,
      |       CAST(max(bd) AS BIGINT) AS max_busdays,
      |       CAST(sum(CASE WHEN bd > 14 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_breach
      |FROM j GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q207_business_day_sla" -> (q207BusinessDaySla _),
    "q187_acf" -> (q187Acf _),
    "q197_clamped_balance" -> (q197ClampedBalance _),
    "q181_decay_score" -> (q181DecayScore _),
    "q176_rhythm_matrix" -> (q176RhythmMatrix _),
    "q171_forecast_backtest" -> (q171ForecastBacktest _),
    "q159_cusum_changepoint" -> (q159CusumChangepoint _),
    "q147_rate_anomaly" -> (q147RateAnomaly _),
    "q129_rolling_reach_sketch" -> (q129RollingReachSketch _),
    "q130_daily_churn" -> (q130DailyChurn _),
    "q126_cumulative_reach" -> (q126CumulativeReach _),
    "q127_rolling_reach" -> (q127RollingReach _),
    "q124_interval_overlap" -> (q124IntervalOverlap _),
    "q118_pit_lookup" -> (q118PitLookup _),
    "q119_gap_fill" -> (q119GapFill _),
    "q120_transition_matrix" -> (q120TransitionMatrix _),
    "q123_time_weighted" -> (q123TimeWeighted _))

  val oracleSql: Map[String, String] = Map(
    "q207_business_day_sla" -> q207Sql,
    "q187_acf" -> q187Sql,
    "q197_clamped_balance" -> q197Sql,
    "q181_decay_score" -> q181Sql,
    "q176_rhythm_matrix" -> q176Sql,
    "q171_forecast_backtest" -> q171Sql,
    "q159_cusum_changepoint" -> q159Sql,
    "q147_rate_anomaly" -> q147Sql,
    "q129_rolling_reach_sketch" -> q129Sql,
    "q130_daily_churn" -> q130Sql,
    "q126_cumulative_reach" -> q126Sql,
    "q127_rolling_reach" -> q127Sql,
    "q124_interval_overlap" -> q124Sql,
    "q118_pit_lookup" -> q118Sql,
    "q119_gap_fill" -> q119Sql,
    "q120_transition_matrix" -> q120Sql,
    "q123_time_weighted" -> q123Sql)
}
