package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming corpus intake — the continuous-ingestion form of the batch
  * corpus-prep operators: document files land as they are crawled, and
  * each micro-batch admits quality-gated, never-seen-before texts exactly
  * once. Composes the batch semantics of q27 (token gate), q30 (exact
  * dedup on the text fingerprint) and q76's token accounting into the
  * `readStream → transform → writeStream` shape, so a deployment can run
  * the same admission policy continuously instead of in nightly batches.
  *
  * State note: exact first-occurrence dedup is inherently full-history —
  * `dropDuplicates` on the fingerprint keeps one state row per distinct
  * admitted text, which is the deduped corpus cardinality (not the
  * ingest volume). At 100 TB that state lives in a checkpointed state
  * store scaled by `spark.sql.shuffle.partitions`; the cheaper
  * approximate regime (Bloom prefilter + periodic compaction) is the
  * batch q59 machinery applied per micro-batch.
  */
object CorpusStreams {

  /** documents-shaped schema for streaming file sources (streaming reads
    * require a declared schema).
    */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based stream over the documents table. The source needs a
    * directory base path, so the fixture dir is narrowed to the table's
    * own file(s) with a glob — without it the stream would list and
    * decode every sibling table through this schema on each batch.
    */
  def fileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Admission pipeline: fingerprint, token-gate (>= minTokens), and
    * cross-batch exact dedup by fingerprint — first occurrence wins,
    * every later exact copy (same batch or any later one) is dropped.
    * The fingerprint is q30's normalized form (whitespace-collapsed,
    * trimmed, lowercased) so the stream admits exactly what the nightly
    * batch dedup would keep — not a stricter byte-identical variant.
    */
  def intake(docs: DataFrame, minTokens: Int = 5): DataFrame =
    docs
      .withColumn("fp", md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .withColumn("n_tokens", size(split(trim(col("text")), " ")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
      .dropDuplicates("fp")
      .select(col("doc_id"), col("source"), col("fp"), col("n_tokens"))
}
