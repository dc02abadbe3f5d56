package graft.sql

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** SQL-transform layer (the reference declares dbt with `dbt run` but
  * ships no models — `citibike_project/docker-compose.yaml:115-126`,
  * `dbt/requirements.txt:2`; SURVEY.md §0). This is the engine-native
  * equivalent: a directory of `<name>.sql` files, each one model;
  * dependencies are inferred from references to other model names;
  * models run in topological order as temp views; requested finals
  * materialize to parquet.
  *
  * Views stay lazy, so Catalyst optimizes ACROSS models — a filter in a
  * downstream mart pushes into the upstream staging view's scan, which a
  * materialize-every-model dbt run can't do.
  */
object ModelRunner {

  final case class Model(name: String, sql: String, deps: Set[String])

  /** Load every `<name>.sql` in `dir`; deps = other model names that
    * appear as identifiers in this model's SQL (comments stripped first,
    * so a model name mentioned in a `--` or block comment doesn't create
    * a phantom dependency). Model names that collide with base table
    * names are rejected — the model view would silently shadow the table.
    */
  def load(dir: Path): Seq[Model] = {
    val stream = Files.list(dir)
    val files =
      try stream.iterator().asScala.filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.toString)
      finally stream.close()
    val names = files.map(f => f.getFileName.toString.stripSuffix(".sql")).toSet
    val clash = names.intersect(Tables.all.toSet)
    require(clash.isEmpty, s"model names shadow base tables: ${clash.mkString(", ")}")
    files.map { f =>
      val name = f.getFileName.toString.stripSuffix(".sql")
      val sql = Files.readString(f)
      val noComments = sql
        .replaceAll("(?s)/\\*.*?\\*/", " ")
        .replaceAll("--[^\n]*", " ")
      val ids = "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(noComments).toSet
      Model(name, sql, (names - name).intersect(ids))
    }
  }

  /** The model files packaged with the engine (src/main/resources), the
    * 3-model staging -> mart DAG that q49 runs. Extracted to a temp dir
    * so the Path-based loader works from any classpath form.
    */
  val packagedModelNames: Seq[String] =
    Seq("stg_orders.sql", "stg_lineitem.sql", "mart_customer_revenue.sql",
      "mart_daily_events.sql")

  def packagedModelsDir(): Path = {
    val dir = Files.createTempDirectory("graft_models")
    packagedModelNames.foreach { n =>
      val in = getClass.getResourceAsStream(s"/graft/models/$n")
      require(in != null, s"missing packaged model resource $n")
      try Files.write(dir.resolve(n), in.readAllBytes()) finally in.close()
    }
    dir
  }

  /** Kahn topological order; cycles are an error. */
  def topoSort(models: Seq[Model]): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    val order = scala.collection.mutable.ArrayBuffer[Model]()
    val done = scala.collection.mutable.Set[String]()
    val visiting = scala.collection.mutable.Set[String]()
    def visit(m: Model): Unit = {
      if (done(m.name)) return
      require(!visiting(m.name), s"model cycle through ${m.name}")
      visiting += m.name
      m.deps.toSeq.sorted.foreach(d => visit(byName(d)))
      visiting -= m.name
      done += m.name
      order += m
    }
    models.foreach(visit)
    order.toSeq
  }

  /** Register base tables + all models as views (dependency order),
    * returning the model DataFrames by name.
    */
  def run(spark: SparkSession, modelsDir: Path, sfDir: String,
      overrides: Map[String, DataFrame] = Map.empty): Map[String, DataFrame] = {
    Tables.registerAll(spark, sfDir)
    // source overrides (e.g. "only the data that has arrived so far" in
    // an incremental backfill scenario) replace the base views
    overrides.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    // The harness fact files are single-row-group parquet, so their scans
    // plan ONE task and the whole mart pipeline below the first exchange
    // (decimal measure, broadcast joins, count-distinct Expand partials)
    // runs single-threaded — measured 1.8 s of the 3.7 s q49 wall at
    // sf0.1. Spread a fact scan across the cores ONLY when its planned
    // parallelism is far below the session's (a ~10 MB shuffle here); at
    // production file sizes the scan already has >= cores partitions and
    // this is a no-op — no forced fact-table shuffle at scale.
    val cores = spark.sparkContext.defaultParallelism
    Seq("lineitem", "orders").foreach { t =>
      val df = spark.table(t)
      if (df.rdd.getNumPartitions < math.max(2, cores / 2))
        df.repartition(cores).createOrReplaceTempView(t)
    }
    topoSort(load(modelsDir)).map { m =>
      val df = spark.sql(m.sql)
      df.createOrReplaceTempView(m.name)
      m.name -> df
    }.toMap
  }

  /** `dbt run`: materialize the named finals (or every model) to parquet. */
  def materialize(spark: SparkSession, modelsDir: Path, sfDir: String,
      outDir: String, finals: Seq[String] = Seq.empty): Unit = {
    val all = run(spark, modelsDir, sfDir)
    val picked = if (finals.nonEmpty) finals else all.keys.toSeq.sorted
    picked.foreach(n => all(n).write.mode("overwrite").parquet(s"$outDir/$n"))
  }

  /** Incremental-materialization config, declared in the model file's
    * header comment: `-- graft: incremental partition=<col>`.
    */
  final case class Incremental(partition: String)

  def incrementalConfig(m: Model): Option[Incremental] =
    "--\\s*graft:\\s*incremental\\s+partition=([A-Za-z_][A-Za-z0-9_]*)".r
      .findFirstMatchIn(m.sql).map(g => Incremental(g.group(1)))

  /** dbt-style INCREMENTAL `dbt run`: models tagged
    * `-- graft: incremental partition=<col>` re-materialize, on re-runs,
    * ONLY the newest already-materialized partition and anything later —
    * older partitions are immutable by contract (the standard
    * append-mostly warehouse assumption; late data lands in the newest
    * open partition, which IS recomputed). The mechanics are
    * Spark-native: the partition bound filters the model's LAZY view (so
    * Catalyst pushes it into the upstream plan and the recompute reads
    * the source tail, not the source), and the write uses DYNAMIC
    * partition overwrite, which replaces exactly the partitions present
    * in the recomputed frame and leaves every older partition's files
    * untouched (spec-pinned by listing). Untagged models fall back to
    * full refresh. Returns the mode each final ran in
    * (`full` / `first_full` / `incremental`).
    */
  def materializeIncremental(spark: SparkSession, modelsDir: Path, sfDir: String,
      outDir: String, finals: Seq[String] = Seq.empty,
      overrides: Map[String, DataFrame] = Map.empty): Map[String, String] = {
    import org.apache.spark.sql.functions.{col, lit}
    val byName = load(modelsDir).map(m => m.name -> m).toMap
    val all = run(spark, modelsDir, sfDir, overrides)
    val picked = if (finals.nonEmpty) finals else all.keys.toSeq.sorted
    picked.map { n =>
      val df = all(n)
      val out = s"$outDir/$n"
      val mode = incrementalConfig(byName(n)) match {
        case None =>
          df.write.mode("overwrite").parquet(out); "full"
        case Some(Incremental(p)) =>
          val path = new org.apache.hadoop.fs.Path(out)
          val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val pmax =
            if (!fs.exists(path)) null
            else spark.read.parquet(out)
              .agg(org.apache.spark.sql.functions.max(col(p))).head().get(0)
          if (pmax == null) {
            df.write.mode("overwrite").partitionBy(p).parquet(out); "first_full"
          } else {
            val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try df.filter(col(p) >= lit(pmax))
              .write.mode("overwrite").partitionBy(p).parquet(out)
            finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            "incremental"
          }
      }
      n -> mode
    }.toMap
  }

  /** Declared query for the SQL-transform layer: run the packaged
    * staging -> mart DAG end to end (extract models, topo-order, lazy
    * views, materialize the mart to parquet) and read the mart back —
    * the `dbt run && SELECT * FROM mart` round trip. Only the mart is
    * materialized; the staging models stay lazy views, so the mart's
    * column pruning reaches the base parquet scans.
    */
  def q49ModelMart(spark: SparkSession, sfDir: String): DataFrame = {
    val out = scratchDir("graft_mart")
    materialize(spark, packagedModelsDir(), sfDir, out,
      finals = Seq("mart_customer_revenue"))
    spark.read.parquet(s"$out/mart_customer_revenue")
      .orderBy("c_custkey")
  }

  /** q103 — the incremental-materialization lifecycle as a declared,
    * oracle-checked query: run 1 materializes the daily-events mart from
    * only the EARLY half of the source (an `events` view override
    * simulating "what had arrived by the cut"); run 2 sees the full
    * source and re-materializes ONLY the newest existing day-partition
    * and later (dynamic partition overwrite). The read-back must equal a
    * full-refresh aggregation of the whole source — which is exactly what
    * the DuckDB oracle computes, so the driver's hash gate verifies
    * incremental == full refresh end to end (a missed partition, a
    * double-write, or a wrong bound changes a count and fails the hash).
    */
  def q103IncrementalMart(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = scratchDir("graft_incmart")
    val modelsDir = packagedModelsDir()
    val ev = Tables.events(spark, sfDir)
    val mm = ev.agg(min(unix_micros($"ts")).as("a"), max(unix_micros($"ts")).as("b")).head()
    val cutUs = (mm.getLong(0) + mm.getLong(1)) / 2 // deterministic mid-span cut
    materializeIncremental(spark, modelsDir, sfDir, out,
      finals = Seq("mart_daily_events"),
      overrides = Map("events" -> ev.filter(unix_micros($"ts") < cutUs)))
    materializeIncremental(spark, modelsDir, sfDir, out,
      finals = Seq("mart_daily_events"))
    spark.read.parquet(s"$out/mart_daily_events")
      .select($"event_date", $"event_type", $"n", $"sum_value")
      .orderBy($"event_date", $"event_type")
  }

  val q103Sql: String =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS event_date, event_type,
      |  COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Scratch location for ephemeral mart materialization: tmpfs when
    * available, same policy (and rationale) as Sessions' shuffle-dir —
    * the harness's throttled block device dominates small-write round
    * trips and adds noise. A production run materializes marts to the
    * lakehouse, not here. Tracked + swept by OpUtils.Scratch.
    */
  private def scratchDir(prefix: String): String =
    graft.operators.OpUtils.Scratch.dir(prefix)

  val q49Sql: String =
    """SELECT c.c_custkey, c.c_name, n.n_name AS nation,
      |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
      |    * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o.o_orderkey) AS n_orders
      |FROM orders o
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_model_mart" -> (q49ModelMart _),
    "q103_incremental_mart" -> (q103IncrementalMart _))

  val oracleSql: Map[String, String] = Map(
    "q49_model_mart" -> q49Sql,
    "q103_incremental_mart" -> q103Sql)
}
