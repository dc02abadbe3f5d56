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
      // InferFiltersFromGenerate synthesizes `size(arr) > 0 AND isnotnull`
      // from every explode(); predicate pushdown then drags that filter —
      // with the FULL array-building expression inlined (and lambda-bound
      // aliases like `toks` re-expanded per element, turning one split()
      // per row into one per array element) — below the repartition
      // exchange onto the single-task scan side. Measured on the shingle
      // pipeline: ~5 s of single-threaded CPU per execution at sf0.1,
      // recomputed on every run. The inferred filter only pre-drops rows
      // explode would drop anyway; excluding the rule never changes
      // results.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE's coalesce target is max(bytes/parallelism, minPartitionSize);
      // the 1 MB default floor collapses small-but-CPU-dense shuffles
      // (decimal aggs, array kernels) to 3-5 tasks on this harness. A
      // 64 KB floor lets parallelismFirst actually use the cores; at real
      // scale partitions are orders of magnitude above either floor, so
      // the setting only changes behavior where coalescing was hurting.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS), which the vectorized
      // reader rejects; read nanos as raw longs session-wide (the
      // Tables.events loader does the integer-division truncation).
      // Set here, not in the loader: a conf mutated inside a read is
      // global and order-dependent for every other parquet read.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .config("spark.ui.enabled", "false")
  }
}
