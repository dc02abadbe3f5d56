package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Streaming CDC apply == batch MERGE (q111) over arbitrary batch
  * splits — including splits that deliver a key's changes OUT of
  * event-time order across micro-batches, which is exactly what the
  * tombstoned last-writer-wins merge exists to survive.
  */
class CdcStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def base() = graft.sources.Tables.customer(spark, sfDir)
    .filter($"c_custkey" < 1000 && $"c_custkey" % 2 === 0)
    .select($"c_custkey".as("cust_key"), $"c_acctbal".as("balance"))

  private def batchExpected(): Set[(Long, Double, String)] =
    graft.operators.Lakehouse.q111CdcMerge(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("cust_key"), r.getAs[Double]("balance"),
        r.getAs[String]("change"))).toSet

  private def visible(dir: String): Set[(Long, Double, String)] =
    CdcStreams.snapshot(spark, dir).collect()
      .map(r => (r.getAs[Long]("cust_key"), r.getAs[Double]("balance"),
        r.getAs[String]("change"))).toSet

  test("three out-of-order waves of applyBatch converge to the batch MERGE result") {
    val snapDir = Files.createTempDirectory("graft_cdc_snap").toString + "/snap"
    CdcStreams.initSnapshot(base(), snapDir)
    val events = graft.sources.Tables.events(spark, sfDir)
    // waves keyed on event_id % 3: arrival order is UNCORRELATED with
    // event time, so cross-batch last-writer-wins does real work
    (0 until 3).foreach { wave =>
      CdcStreams.applyBatch(spark, events.filter($"event_id" % 3 === wave), snapDir)
    }
    assert(visible(snapDir) == batchExpected())
    // no tmp/old trees left behind by the swaps
    val parent = new java.io.File(snapDir).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("snap"))
  }

  test("continuous cdcApplyStream over wave files reaches the same snapshot") {
    val root = Files.createTempDirectory("graft_cdc_stream").toString
    val srcDir = s"$root/src"
    val snapDir = s"$root/snap"
    CdcStreams.initSnapshot(base(), snapDir)
    val events = graft.sources.Tables.events(spark, sfDir)
    (0 until 3).foreach { wave =>
      events.filter($"event_id" % 3 === wave)
        .coalesce(1).write.parquet(s"$srcDir/wave$wave")
    }
    val q = CdcStreams.cdcApplyStream(spark, s"$srcDir/*", snapDir,
      s"$root/ckpt", maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "maxFilesPerTrigger=1 should spread the waves over multiple batches")
    } finally q.stop()
    assert(visible(snapDir) == batchExpected())
  }

  test("replaying an already-applied batch is a no-op (idempotent under restart)") {
    val snapDir = Files.createTempDirectory("graft_cdc_replay").toString + "/snap"
    CdcStreams.initSnapshot(base(), snapDir)
    val events = graft.sources.Tables.events(spark, sfDir)
    CdcStreams.applyBatch(spark, events, snapDir)
    val once = visible(snapDir)
    CdcStreams.applyBatch(spark, events.filter($"event_id" % 2 === 0), snapDir)
    assert(visible(snapDir) == once, "replayed subset must not change the snapshot")
    assert(once == batchExpected())
  }

  test("partitioned store tier converges identically over the same out-of-order waves") {
    val snapDir = Files.createTempDirectory("graft_cdc_part").toString + "/snap"
    CdcStreams.initSnapshotPartitioned(base(), snapDir)
    val events = graft.sources.Tables.events(spark, sfDir)
    (0 until 3).foreach { wave =>
      CdcStreams.applyBatchPartitioned(spark,
        events.filter($"event_id" % 3 === wave), snapDir)
    }
    assert(visible(snapDir) == batchExpected(),
      "bucket-sliced merges must equal the full-rewrite tier and batch q111")
  }

  test("partitioned tier rewrites ONLY the buckets a batch touches") {
    val snapDir = Files.createTempDirectory("graft_cdc_prune").toString + "/snap"
    CdcStreams.initSnapshotPartitioned(base(), snapDir)
    val events = graft.sources.Tables.events(spark, sfDir)
    CdcStreams.applyBatchPartitioned(spark, events, snapDir) // populate all
    def fileState(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(snapDir))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> ((f.lastModified(), f.length()))).toMap
    }
    val before = fileState()
    Thread.sleep(1100) // mtime granularity guard
    // a batch confined to ONE bucket: user_id ≡ 5 (mod 16)
    val targeted = events.filter($"user_id" % 16 === 5)
    assert(targeted.count() > 0, "fixture must populate the targeted bucket")
    CdcStreams.applyBatchPartitioned(spark, targeted, snapDir)
    val after = fileState()
    val untouchedBefore = before.filter(!_._1.contains("pk_bucket=5"))
    val untouchedAfter = after.filter(!_._1.contains("pk_bucket=5"))
    assert(untouchedAfter == untouchedBefore,
      "files outside the arrived bucket must be byte-for-byte untouched")
    assert(after.keys.exists(_.contains("pk_bucket=5")) &&
      after.filter(_._1.contains("pk_bucket=5")) !=
        before.filter(_._1.contains("pk_bucket=5")),
      "the arrived bucket must actually be rewritten")
    assert(visible(snapDir) == batchExpected(),
      "the targeted replay is a no-op on the visible table")
  }
}
