package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Streaming corpus intake: cross-batch exact dedup + token gating agree
  * with the batch admission semantics over the same data.
  */
class CorpusStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  private def doc(id: Long, text: String) = Doc(id, text, "en", "src0", text.length.toLong)

  test("intake admits each distinct text once across micro-batches, gates short docs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = CorpusStreams.intake(mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("intake").start()
    try {
      val textA = "alpha beta gamma delta epsilon zeta"
      val textB = "one two three four five six seven"
      // batch 1: textA twice (same-batch dup) + a gated 1-token doc
      mem.addData(doc(0, textA), doc(1, textA), doc(2, "tiny"))
      q.processAllAvailable()
      val after1 = spark.table("intake").collect()
      assert(after1.length == 1, "one admission for two copies, short doc gated")
      assert(after1.head.getAs[Long]("n_tokens") == 6L)
      // batch 2: textA again (cross-batch dup), a case/whitespace variant
      // of it (q30 normalization must catch it), and a genuinely new text
      mem.addData(doc(3, textA), doc(4, "Alpha  BETA gamma delta epsilon zeta"),
        doc(5, textB))
      q.processAllAvailable()
      val after2 = spark.table("intake").collect()
      assert(after2.length == 2, "cross-batch and normalized duplicates must not re-admit")
      assert(after2.map(_.getAs[String]("fp")).distinct.length == 2)
    } finally q.stop()
  }

  test("file-stream intake over harness documents matches batch admission") {
    val q = CorpusStreams.intake(CorpusStreams.fileStream(spark, sfDir))
      .writeStream.outputMode("append").format("memory").queryName("intake_file").start()
    try {
      q.processAllAvailable()
      val admitted = spark.table("intake_file")
        .select("fp").collect().map(_.getString(0))
      assert(admitted.length == admitted.distinct.length, "no fingerprint admitted twice")
      val expected = graft.sources.Tables.documents(spark, sfDir)
        .filter(size(split(trim($"text"), " ")) >= 5)
        .select(md5(lower(trim(regexp_replace($"text", "\\s+", " ")))).as("fp")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(admitted.toSet == expected, "streaming admission set == batch distinct set")
    } finally q.stop()
  }
}
