package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column handling (north star): media payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct; the
  * decode/feature-extract stages are per-partition batch transforms.
  *
  * The container has no image/audio codecs, so `StubDecoder` is a
  * clearly-marked deterministic fake — but the Spark-side plumbing is real:
  * binary schema, mapPartitions batching, metadata extraction, and the
  * partition sizing that matters at 100 TB (media blobs are large — a
  * `maxPartitionBytes`-sized parquet partition holds few rows, and decode
  * is CPU-bound, so the stage parallelizes by partition with no shuffle).
  */
object Multimodal {

  /** A decoded media record: what a real image/audio decode stage would
    * emit. `payload` stands in for pixels/samples.
    */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Deterministic fake decoder — the seam where a real codec (javax.imageio,
    * ffmpeg bindings, ...) would plug in. Derives "dimensions" from the
    * byte length so results are stable and testable.
    */
  object StubDecoder {
    def decode(id: Long, mediaType: String, bytes: Array[Byte]): MediaRecord = {
      val w = 16 + (bytes.length % 64)
      val h = 16 + ((bytes.length / 64) % 64)
      MediaRecord(id, mediaType, bytes.length.toLong, w, h, bytes.take(16))
    }
  }

  /** The real plumbing: binary column in → mapPartitions decode → typed
    * Dataset out. Batching happens naturally per parquet partition; a real
    * deployment would tune `spark.sql.files.maxPartitionBytes` down so a
    * partition of blobs fits executor memory.
    */
  def decodeAll(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"text".cast("binary").as("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, src, bytes) => StubDecoder.decode(id, src, bytes) })
  }

  /** Oracle-checkable binary-column surface: byte length, base64 of a
    * slice, leading byte — the metadata/sampling ops that stay engine-side
    * even when decode is external.
    */
  def q37BinaryOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        octet_length($"text").cast("long").as("n_bytes"),
        base64(substring($"text", 1, 24).cast("binary")).as("head_b64"),
        ascii(substring($"text", 10, 1)).cast("long").as("byte10"))
      .orderBy($"doc_id")
  }

  val q37Sql: String =
    """SELECT doc_id,
      |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
      |  base64(substring(text, 1, 24)::BLOB) AS head_b64,
      |  CAST(ascii(substring(text, 10, 1)) AS BIGINT) AS byte10
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_binary_ops" -> (q37BinaryOps _))

  val oracleSql: Map[String, String] = Map(
    "q37_binary_ops" -> q37Sql)
}
