package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.SparkSpec

/** Lifecycle of the shared pair-table memo (OpUtils.SessionMemo): the
  * persistent parquet artifact tier (a FRESH session — the driver-restart
  * production case — reuses the table instead of rebuilding), corpus
  * fingerprinting (a changed corpus orphans artifacts), and release
  * (eviction returns the pinned blocks and the next touch rebuilds).
  */
class MemoLifecycleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def writeCorpus(d: String, seed: String, n: Int = 4): Unit = {
    val mk = (tag: String) => (1 to 40).map(i => s"$tag$i").mkString(" ")
    val base = mk(seed)
    val near = (1 to 40).map(i => if (i == 7) "changed" else s"$seed$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),
      (2L, near, "en", "src2", near.length.toLong),
      (3L, mk(s"zz$seed"), "en", "src3", 1L)).take(n)
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
  }

  private def pairsOf(s: org.apache.spark.sql.SparkSession, d: String): Set[(Long, Long)] =
    Dedup.q31MinhashLsh(s, d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("fresh session reuses the persisted artifact instead of rebuilding") {
    val dir = Files.createTempDirectory("graft_memo_art").toString
    val artRoot = Files.createTempDirectory("graft_artifacts").toString
    writeCorpus(dir, "word")
    spark.conf.set("spark.graft.artifactDir", artRoot)
    try {
      Dedup.release(spark, dir)
      val built = pairsOf(spark, dir)
      assert(built.contains((0L, 1L)))
      // the first-touch build landed in the ledger Bench reports from
      assert(OpUtils.SessionMemo.buildSeconds.contains("dedup.q31_pairs"))
      // the build persisted an artifact under the fingerprinted path
      val fp = OpUtils.SessionMemo.corpusFingerprint(spark, dir)
      val art = new java.io.File(s"$artRoot/$fp/dedup.q31_pairs.parquet/_SUCCESS")
      assert(art.exists(), s"expected artifact at $art")

      // a FRESH session (driver restart analog: isolated session state,
      // so the in-memory memo misses) must LOAD, not rebuild
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.artifactDir", artRoot)
      val df2 = Dedup.q31MinhashLsh(s2, dir)
      val leaves = df2.queryExecution.analyzed.collect {
        case _: LogicalRDD => "rdd"
        case _: LogicalRelation => "file"
      }
      assert(leaves == Seq("file"),
        s"fresh-session memo head must be a parquet artifact scan, got $leaves")
      assert(df2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == built)
      assert(OpUtils.SessionMemo.loadSeconds.contains("dedup.q31_pairs"))
      Dedup.release(s2, dir)

      // releasing the hot tier must fall back to the warm artifact, not
      // a rebuild: the re-touched head is again a parquet scan
      Dedup.release(spark, dir)
      val df3 = Dedup.q31MinhashLsh(spark, dir)
      assert(df3.queryExecution.analyzed.collect {
        case _: LogicalRelation => "file" }.nonEmpty,
        "post-release touch with an artifact present must reload, not rebuild")
      assert(df3.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == built)
    } finally {
      spark.conf.unset("spark.graft.artifactDir")
      Dedup.release(spark, dir)
    }
  }

  test("q63 manifest is restart-incremental under the artifact tier") {
    // the query a trainer actually consumes: a FRESH session must
    // compose the manifest from the persisted gx / cluster artifacts
    // instead of re-running the sketch pipeline
    val dir = Files.createTempDirectory("graft_memo_q63").toString
    val artRoot = Files.createTempDirectory("graft_artifacts_q63").toString
    writeCorpus(dir, "mani")
    spark.conf.set("spark.graft.artifactDir", artRoot)
    try {
      Dedup.release(spark, dir)
      val r1 = Dedup.q63TrainingManifest(spark, dir).collect().toSeq
      assert(r1.nonEmpty)
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.artifactDir", artRoot)
      val r2 = Dedup.q63TrainingManifest(s2, dir).collect().toSeq
      assert(r2 == r1, "fresh-session manifest must equal the original")
      val loads = OpUtils.SessionMemo.loadSeconds.keySet
      assert(loads.contains("dedup.gx") && loads.contains("dedup.q51_clusters"),
        s"manifest feeds must come from artifacts, loaded: $loads")
      Dedup.release(s2, dir)
    } finally {
      spark.conf.unset("spark.graft.artifactDir")
      Dedup.release(spark, dir)
    }
  }

  test("a changed corpus orphans the artifact (fingerprint moves)") {
    val dir = Files.createTempDirectory("graft_memo_fp").toString
    writeCorpus(dir, "alpha")
    val fp1 = OpUtils.SessionMemo.corpusFingerprint(spark, dir)
    // re-ingest with different content (different lengths => different
    // fingerprint even at equal mtime granularity)
    writeCorpus(dir, "betaextra")
    val fp2 = OpUtils.SessionMemo.corpusFingerprint(spark, dir)
    assert(fp1 != fp2, "corpus fingerprint must change when the corpus does")
  }

  test("gcArtifacts reaps superseded generations, keeps the live one") {
    val dir = Files.createTempDirectory("graft_memo_gc").toString
    val artRoot = Files.createTempDirectory("graft_artifacts_gc").toString
    spark.conf.set("spark.graft.artifactDir", artRoot)
    try {
      writeCorpus(dir, "genone")
      Dedup.release(spark, dir)
      val r1 = pairsOf(spark, dir)
      assert(r1.nonEmpty)
      // re-ingest: fingerprint moves, old generation is orphaned
      writeCorpus(dir, "gentwolonger")
      Dedup.release(spark, dir)
      val r2 = pairsOf(spark, dir)
      val gens = new java.io.File(artRoot).listFiles().count(_.isDirectory)
      assert(gens == 2, s"expected two generations before gc, got $gens")
      assert(OpUtils.SessionMemo.gcArtifacts(spark) == 1)
      assert(new java.io.File(artRoot).listFiles().count(_.isDirectory) == 1)
      // the surviving generation still serves a fresh session
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.artifactDir", artRoot)
      assert(pairsOf(s2, dir) == r2)
      assert(OpUtils.SessionMemo.gcArtifacts(spark) == 0, "live generation must survive gc")
      Dedup.release(s2, dir)
    } finally {
      spark.conf.unset("spark.graft.artifactDir")
      Dedup.release(spark, dir)
    }
  }

  test("release evicts pinned blocks and the next touch rebuilds correctly") {
    val dir = Files.createTempDirectory("graft_memo_rel").toString
    writeCorpus(dir, "relw")
    val sc = spark.sparkContext
    Dedup.release(spark, dir)
    org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(sc)
    val first = pairsOf(spark, dir)
    val withMemo = sc.getPersistentRDDs.size
    assert(withMemo > 0, "memo build must leave pinned checkpoint blocks")
    // sweeping with the memo live must keep the pinned blocks...
    org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(sc)
    assert(pairsOf(spark, dir) == first)
    // ...but after release they are unpinned: the sweep drops them
    Dedup.release(spark, dir)
    org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(sc)
    val deadline = System.currentTimeMillis() + 10000
    def persistedForApp = sc.getPersistentRDDs.size
    var now = persistedForApp
    while (now >= withMemo && System.currentTimeMillis() < deadline) {
      Thread.sleep(100); now = persistedForApp
    }
    assert(now < withMemo,
      s"released memo blocks must leave the block manager ($now vs $withMemo)")
    // and a post-release touch rebuilds the same answer
    assert(pairsOf(spark, dir) == first)
    Dedup.release(spark, dir)
  }
}
