package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are sized for the driver's local[32] single-JVM harness but are
  * scale-safe: AQE on (runtime re-plan, skew-join handling), shuffle
  * partitions pinned to the core count instead of Spark's default 200 (on a
  * real cluster this would be set ~2-3x total cores), UTC sessions so
  * tz-naive reference semantics (SURVEY.md §1.2) hash-match the DuckDB
  * oracle.
  */
object Sessions {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder = {
    // Shuffle/spill to tmpfs when available: local-mode shuffle files on a
    // throttled block device dominate small-stage runtimes and add noise.
    val localDir =
      if (new java.io.File("/dev/shm").canWrite) "/dev/shm/spark_local" else null
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
    if (localDir != null) b.config("spark.local.dir", localDir)
    b
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .config("spark.ui.enabled", "false")
  }
}
