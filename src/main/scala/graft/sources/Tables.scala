package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness star schema (TESTDATA.md): one parquet file per
  * table under `sfDir`. Reads are plain `spark.read.parquet` so Catalyst
  * column pruning + predicate pushdown reach the vectorized parquet scan —
  * at 100 TB this is the difference between scanning a column subset of a
  * partition-pruned range and scanning the world.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet schema-inference cache (r16): a bare `spark.read.parquet`
    * runs a small footer-read job on EVERY call (~35 ms of driver+task
    * latency), and the suite calls the loaders thousands of times —
    * q103 alone planned 21 such jobs per execution. The corpus schemas
    * are immutable per path within a process, so infer once per path and
    * supply the schema explicitly afterwards — the bare-path equivalent
    * of reading through a catalog with a declared schema, which is what
    * a 100 TB deployment does anyway (Iceberg/HMS). Values and plans are
    * unchanged: the supplied schema IS the inferred one.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  /** `events.ts` has shipped in two parquet encodings across harness
    * generations, so the loader adapts to whatever type the scan yields
    * instead of assuming one toolchain:
    *
    *  - TIMESTAMP(NANOS): Spark 3's reader rejected it unless
    *    `spark.sql.legacy.parquet.nanosAsLong` surfaced it as raw longs —
    *    that path truncates nanos→micros with *integer* division (ns epoch
    *    values ~1.7e18 exceed double's 53-bit exact range, so `/ 1000.0`
    *    would corrupt microseconds), matching DuckDB's own truncation.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads it as
    *    TIMESTAMP_NTZ; the session is pinned UTC, so the cast to the
    *    session timestamp type is micros-identical to DuckDB's naive
    *    TIMESTAMP read.
    *
    * Either way downstream queries see one canonical `ts: TIMESTAMP`
    * (session-UTC), and the oracle comparison stays hash-exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(apply(spark, dir, "events"))

  /** Canonicalize an events-shaped frame's `ts` to session-UTC TIMESTAMP,
    * whatever on-disk encoding the scan surfaced (see [[events]]). Shared
    * with the streaming reader so batch and stream agree byte-for-byte.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // raw nanos (Spark 3 nanosAsLong era)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // Spark 4 NTZ read of naive micros
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df // already session-tz micros
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other; expected " +
          "LongType (nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every table as a temp view so `spark.sql` text matches the
    * oracle SQL verbatim where we want SQL-surface queries. `events` goes
    * through its nanos-timestamp shim, not the raw reader.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    all.filterNot(_ == "events")
      .foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
    events(spark, sfDir).createOrReplaceTempView("events")
  }
}
