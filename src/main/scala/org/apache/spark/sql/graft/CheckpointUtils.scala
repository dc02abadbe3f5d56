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
    */
  @volatile private var pinned = Set.empty[Int]

  /** Pin the checkpoint blocks behind `df` against [[sweepUnpinned]]. */
  def pin(df: Dataset[_]): Unit = {
    val ids = df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd.id
    }
    synchronized { pinned ++= ids }
  }

  /** Drop every persisted RDD except the pinned memo tables — the
    * between-query sweep Bench/Verify run so per-query scratch
    * checkpoints don't accumulate across a 95-query suite.
    */
  def sweepUnpinned(sc: org.apache.spark.SparkContext): Unit =
    sc.getPersistentRDDs.values
      .filterNot(r => pinned.contains(r.id))
      .foreach(_.unpersist(blocking = false))
}
