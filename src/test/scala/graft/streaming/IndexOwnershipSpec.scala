package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Checkpoint OWNERSHIP across the index family (the r15 review
  * finding, reproduced live before the fix): rebuild/admitBatch used to
  * end with a blanket `sweepUnpinned`, so a HEAL-path rebuild — which
  * runs before the batch's own derivations — dropped the blocks of a
  * caller-checkpointed incoming batch, and the subsequent probe crashed
  * with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (truncated lineage cannot
  * recompute). A foreachBatch consumer is free to checkpoint what it
  * hands in; the library must only ever free what it created. Each test
  * below: build a store, orphan the corpus (the crash window), hand in
  * a CALLER-CHECKPOINTED batch carrying the orphan's near-dup — the
  * heal must fire, the batch must survive, and the dup must be
  * rejected in the same batch.
  */
class IndexOwnershipSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dirs(tag: String): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory(s"graft_own_$tag")
    (base.resolve("corpus").toString, base.resolve("index").toString)
  }

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64)(d => math.sin(seed * 64 + d + 1).toFloat)

  test("IvfIndex: heal-path rebuild must not free a caller-checkpointed batch") {
    val (corpus, index) = dirs("ivf")
    IvfIndex.admitBatch((1 to 6).map(i => (i.toLong, vec(i), 0))
      .toDF("vec_id", "embedding", "label"), corpus, index)
    Seq((50L, vec(50), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("append").parquet(corpus)
    val batch = Seq((51L, vec(50), 0), (9L, vec(9), 0))
      .toDF("vec_id", "embedding", "label").localCheckpoint()
    IvfIndex.admitBatch(batch, corpus, index)
    val admitted = spark.read.schema(IvfIndex.vecSchema).parquet(corpus)
      .select($"vec_id").as[Long].collect().toSet
    assert(admitted == (1L to 6L).toSet + 9L + 50L, s"got $admitted")
  }

  test("AnnIndex: heal-path rebuild must not free a caller-checkpointed batch") {
    val (corpus, index) = dirs("ann")
    AnnIndex.admitBatch(Seq((1L, vec(1), 0)).toDF("vec_id", "embedding", "label"),
      corpus, index)
    Seq((50L, vec(50), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("append").parquet(corpus)
    val batch = Seq((51L, vec(50), 0), (2L, vec(2), 0))
      .toDF("vec_id", "embedding", "label").localCheckpoint()
    AnnIndex.admitBatch(batch, corpus, index)
    val admitted = spark.read.schema(AnnIndex.vecSchema).parquet(corpus)
      .select($"vec_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 50L), s"got $admitted")
  }

  test("NearDupIndex: heal-path rebuild must not free a caller-checkpointed batch") {
    val (corpus, index) = dirs("ndi")
    def doc(i: Int, text: String) = (i.toLong, "src", text)
    val base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    NearDupIndex.admitBatch(
      Seq(doc(1, base), doc(2, "completely different words about spark shuffles and parquet footers"))
        .toDF("doc_id", "source", "text"), corpus, index)
    // orphan: a corpus row bypassing the index append (full store schema)
    val orphanText = "entirely novel sentence describing broadcast joins and window functions calmly"
    Seq((50L, "src", "fp-orphan", 10L, orphanText))
      .toDF("doc_id", "source", "fp", "n_tokens", "text")
      .write.mode("append").parquet(corpus)
    val batch = Seq(doc(51, orphanText),
        doc(9, "unrelated fresh content mentioning bloom filters and sketch accumulators"))
      .toDF("doc_id", "source", "text").localCheckpoint()
    NearDupIndex.admitBatch(batch, corpus, index)
    val admitted = spark.read.schema(CorpusStreams.corpusStoreSchema).parquet(corpus)
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 9L, 50L),
      s"the orphan's near-dup must be rejected same-batch: $admitted")
  }

  test("FingerprintIndex: heal-path rebuild must not free a caller-checkpointed batch") {
    val (corpus, index) = dirs("fpi")
    // seed must shape the PATTERN, not just shift it: the stub aHash is
    // mean-threshold (brightness-shift tolerant), so a constant-offset
    // family would all collide as "near-dups" — correctly!
    def blob(seed: Int): Array[Byte] =
      Array.tabulate[Byte](128)(i => ((seed * 31 + i * i * seed + i * 7) % 251).toByte)
    FingerprintIndex.admitBatch(
      Seq((1L, blob(1)), (2L, blob(2))).toDF("doc_id", "blob"),
      corpus, index, FingerprintIndex.imageHasher)
    Seq((50L, blob(50))).toDF("doc_id", "blob")
      .write.mode("append").parquet(corpus)
    val batch = Seq((51L, blob(50)), (9L, blob(9))).toDF("doc_id", "blob")
      .localCheckpoint()
    FingerprintIndex.admitBatch(batch, corpus, index, FingerprintIndex.imageHasher)
    val admitted = spark.read.parquet(corpus)
      .select($"doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 9L, 50L), s"got $admitted")
  }
}
