package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle control for `Dataset.localCheckpoint()` blocks.
  *
  * A local checkpoint materializes the plan into persisted RDD blocks and
  * rewrites the Dataset over a `LogicalRDD` leaf; Spark exposes no public
  * "uncheckpoint", so iterative algorithms that checkpoint every round
  * (connected-components label propagation, large-star/small-star) would
  * otherwise hold O(rounds) block generations in the block manager until
  * GC notices — at cluster scale, on a long-chain graph, that is an
  * executor-storage leak. [[free]] unpersists the checkpointed RDD behind
  * a Dataset as soon as the NEXT round's checkpoint has materialized.
  *
  * Lives under org.apache.spark.sql because `LogicalRDD` is package-
  * private to Spark SQL (same access technique as [[ColumnBridge]]).
  */
object CheckpointUtils {

  /** Unpersist the checkpoint blocks behind `df` (non-blocking). Safe on
    * any Dataset: plans without a `LogicalRDD` leaf are left untouched,
    * and unpersisting twice is a no-op.
    */
  def free(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Registry of checkpoint RDDs pinned for the life of the session —
    * session-scoped memo tables (the shared dedup pair table family)
    * that the harness mains' between-query block sweeps must NOT drop:
    * a localCheckpoint has truncated lineage, so unpersisting it makes
    * every memoized consumer fail instead of recompute.
    *
    * Keyed by (applicationId, rddId), not the raw rddId: RDD ids restart
    * from 0 in a new SparkContext, so a raw-id pin from a stopped context
    * would shield an unrelated scratch RDD in its successor from the
    * sweep (blocks would then accumulate exactly as before the pin
    * mechanism existed).
    */
  @volatile private var pinned = Set.empty[(String, Int)]

  private def pinKeys(df: Dataset[_]): Seq[(String, Int)] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => (lr.rdd.context.applicationId, lr.rdd.id)
    }

  /** Pin the checkpoint blocks behind `df` against [[sweepUnpinned]]. */
  def pin(df: Dataset[_]): Unit = {
    val ids = pinKeys(df)
    synchronized { pinned ++= ids }
  }

  /** Remove `df`'s pins (the memo-release lifecycle; the blocks are then
    * fair game for the next sweep and can be [[free]]d immediately).
    */
  def unpin(df: Dataset[_]): Unit = {
    val ids = pinKeys(df)
    synchronized { pinned --= ids }
  }

  /** Drop every persisted RDD except the pinned memo tables — the
    * between-query sweep Bench/Verify run so per-query scratch
    * checkpoints don't accumulate across a 95-query suite. Also prunes
    * pin entries from dead applications (a long-lived JVM restarting
    * SparkContexts would otherwise grow the registry unboundedly).
    */
  def sweepUnpinned(sc: org.apache.spark.SparkContext): Unit = {
    val app = sc.applicationId
    synchronized { pinned = pinned.filter(_._1 == app) }
    sc.getPersistentRDDs.values
      .filterNot(r => pinned.contains((app, r.id)))
      .foreach(_.unpersist(blocking = false))
  }
}
