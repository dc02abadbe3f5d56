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
      // Scan-split sizing (r16, guide §6): Spark charges every file
      // spark.sql.files.openCostInBytes (default 4 MB — sized for remote
      // object stores) when packing splits, and maxSplitBytes =
      // min(maxPartitionBytes, max(openCost, bytes/parallelism)) — so on
      // this harness's single-file ~11 MB fact tables the 4 MB floor
      // planned THREE scan tasks on 32 cores and every CPU-dense first
      // stage (decimal aggs, md5 shingles, sketch updates) ran ~3-way
      // parallel. 512 KB models the real open cost of local/page-cached
      // parquet; at production scale bytes/parallelism >> openCost, the
      // max() ignores the floor entirely and splits stay maxPartitionBytes
      // — the setting only changes behavior where the floor was the
      // binding (wrong) term. Env-overridable for object-store deploys.
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "524288"))
      // Join strategy (r16, guide §3.1/§9): let the planner use shuffled
      // hash join when its size conditions hold instead of always sorting
      // both sides, and let AQE rewrite SMJ→SHJ at runtime when every
      // post-shuffle partition is under 64 MB (bounded per-task build
      // memory — far under executor-memory-per-core on any sane deploy;
      // SMJ still planned for genuinely large per-partition sides, which
      // is exactly the spill-safety split the guide prescribes). Measured
      // on the join-dense suite queries: q215 2.6 s → 1.3 s, sort CPU
      // gone from the profile.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      // Spark-3-era `spark.sql.legacy.parquet.nanosAsLong` is no longer
      // set: the harness now ships events.ts as TIMESTAMP(MICROS,
      // isAdjustedToUTC=false) — which that conf never touched — and
      // `Tables.normalizeEventTs` adapts to whichever type the scan
      // yields (raw long nanos, TIMESTAMP_NTZ, or TIMESTAMP), so no
      // reader conf is needed on any toolchain generation.
      // The rebase confs below still exist on 4.1.2 (verified against
      // the installed jar); CORRECTED skips the per-file legacy-hybrid
      // calendar check on write, and all harness data is post-1900.
      .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .config("spark.ui.enabled", "false")
  }
}
