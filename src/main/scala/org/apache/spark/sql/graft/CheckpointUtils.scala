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
}
