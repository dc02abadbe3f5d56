package graft.tools

import graft.SparkEntry

/** Repeat-timing for one query: `tools/run.sh graft.tools.Time <sfDir> <query> [reps]`.
  * Prints per-rep seconds; use the min as the noise-resistant figure.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      // sweep ONLY unpinned checkpoint blocks (same policy as Bench):
      // unpersisting a session-pinned memo's localCheckpoint makes its
      // consumers fail on the next rep rather than recompute
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
    }
    spark.stop()
  }
}
