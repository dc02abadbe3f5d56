package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Structured Streaming surface over the `events` shape (SURVEY.md §2.9):
  * watermarked tumbling/sliding windows, session windows, stateful dedup.
  * The reference's only "stream" is a chunk-at-a-time pull loop
  * (`citibike_project/etl/ingest_data.py:168-181`) — these are the real
  * micro-batch equivalents, and the batch queries in graft.operators.Events
  * (q21-q23) define the semantics they must agree with (tested in
  * StreamingSpec by running both over the same data).
  *
  * All aggregations here are watermark-bounded, so state is finite at any
  * scale: windows older than the watermark are emitted and dropped.
  */
object EventStreams {

  /** File-based stream over events-shaped parquet. Streaming reads require
    * a declared schema, but the on-disk `ts` encoding differs by harness
    * generation (raw nanos-as-long under Spark 3's legacy conf vs
    * TIMESTAMP_NTZ micros under Spark 4 — see `Tables.events`). A one-time
    * batch probe of the same path (footer read only, no data scan) picks
    * the matching read schema (raw-long nanos, NTZ micros, or
    * adjusted-to-UTC TIMESTAMP micros); any OTHER probed type fails here
    * at stream construction — a silently mismatched declared schema would
    * fail or misread batches later. An empty/not-yet-populated source dir
    * falls back to the current-toolchain NTZ shape. Either way
    * `Tables.normalizeEventTs` canonicalizes to session-UTC TIMESTAMP so
    * stream and batch semantics agree byte-for-byte.
    */
  def fileStream(spark: SparkSession, dir: String, globFilter: Option[String] = None,
      extraOptions: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val probed: Option[org.apache.spark.sql.types.DataType] =
      scala.util.Try {
        val b = spark.read
        globFilter.foreach(g => b.option("pathGlobFilter", g))
        b.parquet(dir).schema("ts").dataType
      }.toOption
    val schema = probed match {
      case Some(LongType)         => Schemas.eventsRaw
      case Some(TimestampNTZType) => Schemas.eventsNtz
      case Some(TimestampType)    => Schemas.eventsTz // adjusted-to-UTC micros
      case Some(other) =>
        // a declared-schema mismatch would fail (or silently misread) at
        // runtime, possibly batches later — fail at stream construction
        throw new IllegalStateException(
          s"events stream at $dir probed ts: $other; expected LongType " +
            "(nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP")
      case None => Schemas.eventsNtz // empty/not-yet-populated dir: current toolchain
    }
    val r = spark.readStream.schema(schema)
    globFilter.foreach(g => r.option("pathGlobFilter", g))
    extraOptions.foreach { case (k, v) => r.option(k, v) }
    graft.sources.Tables.normalizeEventTs(r.parquet(dir))
  }

  /** Continuous warehouse load — the reference's CSV→postgres ETL
    * (`citibike_project/etl/ingest_data.py:161-176`) run as a stream
    * instead of a nightly batch: each micro-batch lands in the JDBC
    * table through the S6 sink (foreachBatch, because the jdbc format
    * has no native streaming sink), EXACTLY-ONCE under replay: every row
    * carries its micro-batch id, and the writer first deletes any rows
    * already stamped with that id (a partial write from a crashed
    * attempt, or a full write whose checkpoint commit was lost) before
    * appending — the standard DELETE-then-insert idempotent protocol,
    * and the principled form of the reference's replace-vs-append
    * hacks (`etl/ingest_data.py:166,277-279`). The fixture spec pins
    * both accumulation across batches and replay invariance on an
    * embedded Derby.
    */
  def streamToJdbc(events: DataFrame, cfg: graft.sources.Sinks.JdbcConfig,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(jdbcBatchWriter(cfg))
      .start()

  /** The idempotent per-batch writer [[streamToJdbc]] runs — exposed so
    * tests (and any non-streaming replayer) can drive the exact code
    * path with a chosen batch id.
    */
  def jdbcBatchWriter(cfg: graft.sources.Sinks.JdbcConfig)
      : (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, batchId) => {
      // quoted identifier: Spark's JDBC writer creates columns as quoted
      // lower-case, so an unquoted name would fold (to upper on Derby,
      // lower on Postgres) and miss
      graft.sources.Sinks.deleteWhere(cfg, s""""batch_id" = $batchId""")
      graft.sources.Sinks.writeJdbc(
        batch.withColumn("batch_id", lit(batchId)), cfg,
        org.apache.spark.sql.SaveMode.Append)
    }

  /** Tumbling 1-hour windowed counts/sums with a 2-hour watermark —
    * the streaming form of q21HourlyWindows.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 2h/1h windows — streaming form of q22SlidingWindows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("win"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("n"))

  /** Session windows with a 30-minute inactivity gap per user — streaming
    * form of q23Sessionize (same gap).
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("session_start"), col("win.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stateful dedup by event_id bounded by the watermark — the streaming
    * idempotent-load guard (reference's moral equivalent: skip-if-exists,
    * `citibike_project/etl/ingest_data.py:259-262`).
    */
  def dedupedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked STREAM-STREAM join — q43RangeJoin's attribution
    * semantics (clicks within 30 minutes after a same-user purchase) as a
    * continuous query. Both sides carry watermarks and the join condition
    * bounds c_ts relative to p_ts, so the state store buffers each side
    * only within its watermark horizon: a purchase row can be dropped
    * once the click watermark passes p_ts + 30 min, a click once the
    * purchase watermark passes c_ts — bounded state at any scale, sharded
    * on user_id. (Without the time bound Spark rejects the inner
    * stream-stream join outright in append mode — the bound IS the state
    * contract.) Batch q43 defines the semantics; the spec runs both over
    * the same harness events and asserts set equality.
    */
  def attributedClicks(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") > col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr("interval 30 minutes"))
      .select(col("p_id"), col("c_id"), col("user_id"), col("p_ts"), col("c_ts"))
  }

  /** LEFT OUTER stream-stream attribution: same join as
    * [[attributedClicks]], but purchases that see NO click in their
    * 30-minute window ALSO emit — with null click columns — once the
    * click-side watermark proves no match can still arrive (i.e. the
    * watermark passed `p_ts + 30min`; a row held until then is the
    * null-emission latency every outer stream join pays). This is the
    * completeness-critical form: an attribution pipeline that only
    * emits matches silently undercounts un-attributed conversions.
    * State bounds are identical to the inner form — both sides evict
    * at the watermark horizon.
    */
  def attributedClicksOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") > col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr("interval 30 minutes"),
      "left_outer")
      .select(col("p_id"), col("c_id"), col("user_id"), col("p_ts"), col("c_ts"))
  }

  /** STREAM-STATIC enrichment join: each micro-batch joins against a
    * static dimension snapshot — the per-batch planner broadcasts the
    * small side, so this is a stateless map-side enrichment (no streaming
    * state at all, unlike the stream-stream form above). The standard
    * shape for attaching reference data (type metadata, mix weights,
    * routing tables) to an event stream.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left_outer")

  /** Custom state machine via flatMapGroupsWithState (SURVEY.md §2.9): a
    * per-user running profile (event count, value sum, purchase count)
    * emitted on every update — state Spark's built-in windows can't
    * express because it never closes. State is per-key and O(1); at scale
    * the state store shards with the user_id shuffle.
    */
  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserProfile(user_id: Long, n_events: Long, total_value: Double, n_purchases: Long)

  def userProfiles(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserProfile] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserProfile]) => {
          val prev = state.getOption.getOrElse(UserProfile(uid, 0L, 0.0, 0L))
          val next = rows.foldLeft(prev) { (p, e) =>
            UserProfile(uid, p.n_events + 1, p.total_value + e.value,
              p.n_purchases + (if (e.event_type == "purchase") 1L else 0L))
          }
          state.update(next)
          Iterator.single(next)
        })
  }

  /** Spark 4's arbitrary-state v2 (`transformWithState` +
    * [[org.apache.spark.sql.streaming.StatefulProcessor]]): inactivity-gap
    * sessionization with an EXPLICIT event-time timer per user. The
    * built-in `session_window` (see [[sessionCounts]]) fixes the payload
    * and the close policy; a StatefulProcessor owns both — typed
    * `ValueState` merged per micro-batch, a timer re-armed to
    * `last event + gap` on every arrival, and the session record emitted
    * from `handleExpiredTimer` when the WATERMARK (not wall clock) passes
    * that deadline. Within a micro-batch, rows are processed in event-time
    * order and a >gap stretch closes the session immediately (emitted from
    * `handleInputRows` — append mode permits it), so boundaries match
    * q23Sessionize / `session_window` even when a backlog replay lands a
    * user's whole history in one trigger. State is per-key, O(1) per user, sharded with the
    * user_id shuffle, and deleted on emit, so the state store holds only
    * OPEN sessions at any scale. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`), which is also the
    * right provider at 100 TB: changelog-checkpointed, spills off-heap.
    * (For state that should instead expire silently, the v2 API's
    * per-state `TTLConfig` does it without timer code — not needed here
    * because emit-then-clear IS this operator's lifecycle.)
    */
  final case class SessionEvent(ts: java.sql.Timestamp, user_id: Long, value: Double)
  final case class OpenSession(n_events: Long, sum_value: Double, first_ms: Long, last_ms: Long)
  final case class SessionRecord(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  final class InactivitySessionizer(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SessionEvent, SessionRecord] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState}
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
        timers: TimerValues): Iterator[SessionRecord] = {
      // Sort the batch's rows by event time: iterator order is
      // partition-arbitrary, and a backlog replay (a file stream drains
      // ALL pending files in one trigger by default) can land a user's
      // whole history in one micro-batch. Splitting on the inactivity gap
      // HERE — closed sessions emit directly from handleInputRows, legal
      // in append mode — keeps session boundaries identical to
      // q23Sessionize / session_window regardless of micro-batch sizing;
      // folding the batch into one min/max merge would weld >gap-apart
      // events into a single session. A user's per-batch rows are one
      // task's group iterator — batch-bounded, safe to buffer.
      val sorted = rows.toArray.sortBy(_.ts.getTime)
      val closed = scala.collection.mutable.ArrayBuffer[SessionRecord]()
      var s: OpenSession = if (open.exists()) open.get() else null
      sorted.foreach { e =>
        val ms = e.ts.getTime
        if (s == null) s = OpenSession(1L, e.value, ms, ms)
        else if (ms > s.last_ms + gapMs) {
          // gap exceeded inside the batch (or vs the carried-over open
          // session, incl. one whose deadline the watermark already
          // passed this batch): close it NOW — its timer would otherwise
          // wrongly merge these arrivals into it
          closed += SessionRecord(user, new java.sql.Timestamp(s.first_ms),
            new java.sql.Timestamp(s.last_ms), s.n_events, s.sum_value)
          s = OpenSession(1L, e.value, ms, ms)
        } else {
          // within the gap: merge (min/max absorbs late events that
          // arrive within the watermark delay out of order)
          s = OpenSession(s.n_events + 1, s.sum_value + e.value,
            math.min(s.first_ms, ms), math.max(s.last_ms, ms))
        }
      }
      if (s != null) {
        open.update(s)
        // one armed timer per user: re-arm to the new inactivity deadline
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.last_ms + gapMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionRecord] = {
      val out =
        if (!open.exists()) Iterator.empty
        else {
          val s = open.get()
          Iterator.single(SessionRecord(user,
            new java.sql.Timestamp(s.first_ms), new java.sql.Timestamp(s.last_ms),
            s.n_events, s.sum_value))
        }
      open.clear()
      out
    }
  }

  /** Sessionize a typed event stream with [[InactivitySessionizer]]:
    * watermark-driven, append-mode, 30-minute default gap (the q23 /
    * `sessionCounts` gap, so all three sessionization forms agree on
    * boundaries).
    */
  def sessionizeWithState(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapMs: Long = 30L * 60 * 1000, watermarkDelay: String = "2 hours")
      : org.apache.spark.sql.Dataset[SessionRecord] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new InactivitySessionizer(gapMs),
        TimeMode.EventTime, OutputMode.Append)
  }

  // ---- arbitrary-state v2, remaining state shapes ----
  // The sessionizer covers ValueState + event-time timers; these two cover
  // the OTHER typed state primitives the v2 API offers — ListState
  // (bounded per-key collections) and MapState with native TTL (per-entry
  // expiry without timer code).

  final case class UserValueEvent(user_id: Long, event_id: Long, value: Double)
  final case class RankedEvent(user_id: Long, rank: Int, event_id: Long, value: Double)
  final case class Scored(value: Double, event_id: Long)

  /** Per-user running top-k by value via typed `ListState` — the
    * leaderboard/`ORDER BY value LIMIT k` shape kept incrementally per
    * key, which no built-in streaming aggregate expresses (a windowed agg
    * closes; this never does, yet must stay bounded). State is EXACTLY
    * the current top-k list (`put` replaces wholesale, ≤ k elements per
    * user — bounded by construction, never by the corpus), so the store
    * holds users × k rows at any scale, sharded with the user_id shuffle.
    * Emission is an append-mode changelog: a batch emits the user's full
    * re-ranked top-k iff the set changed (ties break on event_id for
    * determinism; replayed duplicates dedup via `distinct`, keeping the
    * emission idempotent under micro-batch replay).
    */
  final class TopKPerUser(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserValueEvent, RankedEvent] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TimerValues, TTLConfig}
    @transient private var topk: ListState[Scored] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      topk = getHandle.getListState[Scored]("topk",
        org.apache.spark.sql.Encoders.product[Scored], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[UserValueEvent],
        timers: TimerValues): Iterator[RankedEvent] = {
      val cur = topk.get().toSeq
      val merged = (cur ++ rows.map(e => Scored(e.value, e.event_id)))
        .distinct
        .sortBy(s => (-s.value, s.event_id))
        .take(k)
      if (merged == cur) Iterator.empty
      else {
        topk.put(merged.toArray)
        merged.iterator.zipWithIndex.map { case (s, i) =>
          RankedEvent(user, i + 1, s.event_id, s.value) }
      }
    }
  }

  /** Per-user top-k leaderboard stream (no timers: `TimeMode.None`). */
  def topKPerUser(events: org.apache.spark.sql.Dataset[UserValueEvent], k: Int = 3)
      : org.apache.spark.sql.Dataset[RankedEvent] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TopKPerUser(k), TimeMode.None, OutputMode.Append)
  }

  /** TTL'd per-user dedup via typed `MapState` — the idempotent-intake
    * guard with WALL-CLOCK expiry instead of a watermark bound
    * (cf. [[dedupedStream]]): each user's seen event_ids live in a
    * MapState whose per-entry `TTLConfig` silently expires them after
    * `ttl`, so state is bounded by the TTL window's distinct ids, not the
    * stream's history, with zero timer code (TTL is the v2 API's native
    * mechanism for state that should fade rather than close — exactly
    * this operator's lifecycle; requires `TimeMode.ProcessingTime`).
    * A re-arrival after expiry re-emits — the standard documented
    * tradeoff of any bounded-memory dedup (dropDuplicatesWithinWatermark
    * has the same contract in event time). MapState, not ValueState:
    * many event_ids per user key, point-probed per arrival; the map
    * shards with the user_id shuffle.
    */
  final class PerUserTtlDedup(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserValueEvent, UserValueEvent] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TimerValues, TTLConfig}
    @transient private var seen: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[Long, Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(user: Long, rows: Iterator[UserValueEvent],
        timers: TimerValues): Iterator[UserValueEvent] =
      rows.filter { e =>
        val fresh = !seen.containsKey(e.event_id)
        if (fresh) seen.updateValue(e.event_id, 1L)
        fresh
      }
  }

  /** First occurrence of each (user, event_id) within a rolling TTL.
    *
    * Run this under a PACED trigger (e.g. `Trigger.ProcessingTime`):
    * processing-time state makes the engine schedule no-data micro-batches
    * to advance wall-clock state, and an unpaced (ASAP) trigger turns that
    * into a busy loop of empty batches.
    */
  def dedupWithTtl(events: org.apache.spark.sql.Dataset[UserValueEvent],
      ttl: java.time.Duration): org.apache.spark.sql.Dataset[UserValueEvent] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new PerUserTtlDedup(ttl.toMillis),
        TimeMode.ProcessingTime, OutputMode.Append)
  }
}
