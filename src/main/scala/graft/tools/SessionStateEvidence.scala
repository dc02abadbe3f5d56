package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.SessionEvent

/** Scale evidence for the transformWithState operators: state must be
  * bounded by the OPERATOR'S invariant (open sessions; k per user), not by
  * events processed.
  *
  * Default (sessionizer) mode: drives W waves of U users × E events
  * through `sessionizeWithState`; each wave's event times advance far
  * enough that the watermark closes the previous wave's sessions, so the
  * state store should hold ~U open sessions at any wave while cumulative
  * input grows W×. Prints, per wave: cumulative events, state rows
  * (`stateOperators.numRowsTotal`), sessions emitted so far. A naive
  * "keep everything" stateful operator would show state ~= cumulative
  * events; the sessionizer must show a flat line.
  *
  * `topk` mode: the SAME U users receive E fresh events per wave through
  * `topKPerUser(k)` — the ListState leaderboard. State must flatten at
  * the users × k invariant from wave 1 on while cumulative input grows
  * W×; emissions only when a ranking actually changes.
  *
  * Usage: `tools/run.sh graft.tools.SessionStateEvidence [waves] [users] [events]`
  *    or: `tools/run.sh graft.tools.SessionStateEvidence topk [waves] [users] [events]`
  */
object SessionStateEvidence {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("topk")) topk(args.drop(1))
    else sessionizer(args)

  private def topk(args: Array[String]): Unit = {
    val waves = if (args.length > 0) args(0).toInt else 20
    val users = if (args.length > 1) args(1).toInt else 2000
    val evPerUser = if (args.length > 2) args(2).toInt else 5
    val spark = graft.core.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[EventStreams.UserValueEvent]
    val q = EventStreams.topKPerUser(mem.toDS(), k = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("topk_evidence").start()
    var cumulative = 0L
    var nextId = 0L
    try {
      (0 until waves).foreach { w =>
        val evs = for {
          u <- 1 to users
          e <- 0 until evPerUser
        } yield {
          nextId += 1
          // deterministic pseudo-random value so some waves displace
          // leaders and some don't
          EventStreams.UserValueEvent(u.toLong, nextId,
            ((nextId * 2654435761L) % 10007L).toDouble)
        }
        mem.addData(evs)
        q.processAllAvailable()
        cumulative += evs.size
        val p = q.lastProgress
        val stateRows = Option(p.stateOperators).filter(_.nonEmpty)
          .map(_.map(_.numRowsTotal).sum).getOrElse(-1L)
        val emitted = spark.table("topk_evidence").count()
        println(f"wave=$w%2d cumulative_events=$cumulative%8d state_rows=$stateRows%7d rank_rows_emitted=$emitted%8d")
      }
    } finally q.stop()
    spark.stop()
  }

  private def sessionizer(args: Array[String]): Unit = {
    val waves = if (args.length > 0) args(0).toInt else 20
    val users = if (args.length > 1) args(1).toInt else 500
    val evPerUser = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionizeWithState(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_evidence").start()
    val base = 1700000000000L
    // waves are 4h apart; watermark delay 2h + gap 30m < 4h, so wave N's
    // arrival closes every wave-(N-1) session
    val waveMs = 4L * 3600 * 1000
    var cumulative = 0L
    try {
      (0 until waves).foreach { w =>
        val t0 = base + w * waveMs
        val evs = for {
          u <- 1 to users
          e <- 0 until evPerUser
        } yield SessionEvent(new java.sql.Timestamp(t0 + e * 60000L),
          w.toLong * users + u, 1.0)
        mem.addData(evs)
        q.processAllAvailable()
        cumulative += evs.size
        val p = q.lastProgress
        val stateRows = Option(p.stateOperators).filter(_.nonEmpty)
          .map(_.map(_.numRowsTotal).sum).getOrElse(-1L)
        val emitted = spark.table("sessions_evidence").count()
        println(f"wave=$w%2d cumulative_events=$cumulative%7d state_rows=$stateRows%6d sessions_emitted=$emitted%6d")
      }
    } finally q.stop()
    spark.stop()
  }
}
