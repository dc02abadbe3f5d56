package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{Ingest, Sinks}

/** CLI entry matching the reference lifecycle (SURVEY.md §3.1):
  * enumerate → fetch/extract → discover → scan → normalize → write.
  *
  * `graft.Main --staging <dir> [--zip <file>]... --out <dir>`
  *
  * Config precedence is CLI > env > default (the reference ignores its
  * own env wiring and hardcodes localhost, `citibike_project/
  * etl/ingest_data.py:52` vs `docker-compose.yaml:64` — §7.4 bug 5).
  */
object Main {

  final case class Config(
      staging: String = sys.env.getOrElse("GRAFT_STAGING", "/tmp/graft_staging"),
      out: String = sys.env.getOrElse("GRAFT_OUT", "/tmp/graft_out"),
      zips: Seq[String] = Seq.empty,
      urls: Seq[String] = Seq.empty,
      cores: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()),
      limitInputs: Option[Int] = None,
      gcArtifacts: Option[String] = None,
      releases: Seq[String] = Seq.empty,
      rebuildIndex: Option[(String, String)] = None,
      smoke: Option[String] = None,
      query: Option[(String, String)] = None,
      explain: Boolean = false,
      show: Int = 20) {
    /** Warm-tier maintenance flags short-circuit the ingest pipeline. */
    def isMaintenance: Boolean =
      gcArtifacts.nonEmpty || releases.nonEmpty || rebuildIndex.nonEmpty
  }

  def parse(args: Array[String]): Config = {
    @annotation.tailrec
    def loop(rest: List[String], c: Config): Config = rest match {
      case "--staging" :: v :: t => loop(t, c.copy(staging = v))
      case "--out" :: v :: t => loop(t, c.copy(out = v))
      case "--zip" :: v :: t => loop(t, c.copy(zips = c.zips :+ v))
      case "--url" :: v :: t => loop(t, c.copy(urls = c.urls :+ v))
      case "--cores" :: v :: t => loop(t, c.copy(cores = v.toInt))
      // L3: dev guard — scan only the first N discovered CSVs (the
      // reference's --limit-inputs, etl/ingest_data.py:158,313)
      case "--limit-inputs" :: v :: t => loop(t, c.copy(limitInputs = Some(v.toInt)))
      // warm-tier lifecycle (OpUtils.SessionMemo): reap superseded
      // artifact generations under <root> / drop this process's memo
      // entries for <dir> without writing Scala
      case "--gc-artifacts" :: v :: t => loop(t, c.copy(gcArtifacts = Some(v)))
      case "--release" :: v :: t => loop(t, c.copy(releases = c.releases :+ v))
      // streaming near-dup index bootstrap/recovery: derive the
      // NearDupIndex stores from an admitted corpus (migration from the
      // naive intake, or a lost/stale index — the corpus is the source
      // of truth)
      case "--rebuild-index" :: corpus :: index :: t =>
        loop(t, c.copy(rebuildIndex = Some((corpus, index))))
      // 10-second pre-flight: flagship query + one events-table query
      // against <sfDir>; exit non-zero on any failure — the check that
      // would have caught round 8's silent toolchain swap before a full
      // bench ran
      case "--smoke" :: v :: t => loop(t, c.copy(smoke = Some(v)))
      // ad-hoc runner: execute one declared query by name against a
      // table dir — the "run what the engine ships" entry a reference
      // user reaches for first. `--explain` adds the formatted physical
      // plan; `--show N` bounds the printed rows (collect stays off the
      // driver beyond that bound).
      case "--query" :: name :: dir :: t => loop(t, c.copy(query = Some((name, dir))))
      case "--explain" :: t => loop(t, c.copy(explain = true))
      case "--show" :: v :: t => loop(t, c.copy(show = v.toInt))
      case Nil => c
      case x :: _ => throw new IllegalArgumentException(s"unknown arg: $x")
    }
    loop(args.toList, Config())
  }

  /** Maintenance entry: `--release <dir>` drops memo entries (unpins +
    * frees checkpoint blocks, invalidates the fingerprint cache) for
    * each dir; `--rebuild-index <corpus> <index>` derives the streaming
    * near-dup index stores from an admitted corpus;
    * `--gc-artifacts <root>` reaps superseded artifact generations under
    * root. Run from its own fresh session (this main), no other session
    * can hold artifact-backed memos over the reaped files — the safety
    * precondition gcArtifacts documents. Returns the number of
    * generations reaped.
    */
  def runMaintenance(spark: SparkSession, cfg: Config): Int = {
    cfg.releases.foreach { d =>
      graft.operators.OpUtils.SessionMemo.releaseAll(spark, d)
      println(s"[graft] released memo entries for $d")
    }
    cfg.rebuildIndex.foreach { case (corpus, index) =>
      val n = graft.streaming.NearDupIndex.rebuild(spark, corpus, index)
      println(s"[graft] rebuild-index: indexed $n docs from $corpus into $index")
    }
    cfg.gcArtifacts.fold(0) { root =>
      spark.conf.set("spark.graft.artifactDir", root)
      val n = graft.operators.OpUtils.SessionMemo.gcArtifacts(spark)
      println(s"[graft] gc-artifacts: reaped $n superseded generation(s) under $root")
      n
    }
  }

  def run(spark: SparkSession, cfg: Config): Long = {
    val staging = Paths.get(cfg.staging)
    Files.createDirectories(staging)
    // fetch remote archives first (S2 first half), then extract all
    val fetched = cfg.urls.map(u => Ingest.fetch(u, staging.resolve("_downloads")))
    (cfg.zips.map(Paths.get(_)) ++ fetched).foreach(z => Ingest.extractZip(z, staging))
    val csvs = Ingest.discoverCsvs(staging)
    if (csvs.isEmpty) return 0L
    // --limit-inputs: explicit truncated file list; otherwise one glob
    // (globs let the reader plan the whole input in one listing)
    val source = cfg.limitInputs match {
      case Some(n) => Ingest.scanTripFiles(spark, csvs.take(n).map(_.toString))
      case None => Ingest.scanTrips(spark, s"${cfg.staging}/*/*.csv")
    }
    val trips = source
      .withColumn("month", date_format(col("started_at"), "yyyyMM"))
    Sinks.writeLake(trips, cfg.out, partitionCols = Seq("month"))
    // flagship mart (SURVEY.md §7.2): monthly member vs casual ride counts
    val mart = spark.read.parquet(cfg.out)
      .groupBy(col("month"), col("member_casual"))
      .agg(count(lit(1)).as("n_rides"))
      .orderBy(col("month"), col("member_casual"))
    Sinks.writeLake(mart, cfg.out + "_mart")
    spark.read.parquet(cfg.out).count()
  }

  /** Pre-flight: the flagship query plus one events-table query (the
    * type-sensitive load round 8's toolchain swap broke) must both
    * produce rows. Returns the failures as name → message; empty = go.
    */
  def runSmoke(spark: SparkSession, sfDir: String): Seq[(String, String)] = {
    val probes: Seq[(String, () => Long)] = Seq(
      "entry" -> (() => SparkEntry.entry(spark).count()),
      "q20_json_extract" -> (() => SparkEntry.queries("q20_json_extract")(spark, sfDir).count()))
    probes.flatMap { case (name, go) =>
      try { if (go() > 0) None else Some(name -> "returned 0 rows") }
      catch { case e: Throwable =>
        Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val spark = graft.core.Sessions.local(cfg.cores)
    spark.sparkContext.setLogLevel("WARN")
    (cfg.smoke, cfg.query) match {
      case (Some(sfDir), _) =>
        val failures = runSmoke(spark, sfDir)
        println(s"[graft] smoke on Spark ${spark.version} at $sfDir: " +
          (if (failures.isEmpty) "OK" else s"FAILED ${failures.map(_._1).mkString(",")}"))
        failures.foreach { case (n, m) => System.err.println(s"[graft] smoke $n: $m") }
        spark.stop()
        if (failures.nonEmpty) sys.exit(1)
      case (None, Some((name, dir))) =>
        SparkEntry.queries.get(name) match {
          case None =>
            System.err.println(s"[graft] unknown query '$name'; declared: " +
              SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
            spark.stop()
            sys.exit(2)
          case Some(q) =>
            val df = q(spark, dir)
            if (cfg.explain)
              println(df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode))
            df.show(cfg.show, truncate = false)
            println(s"[graft] $name on $dir: showed up to ${cfg.show} rows")
            spark.stop()
        }
      case (None, None) =>
        if (cfg.isMaintenance) runMaintenance(spark, cfg)
        else {
          val n = run(spark, cfg)
          println(s"[graft] wrote $n trip rows to ${cfg.out}")
        }
        spark.stop()
    }
  }
}
