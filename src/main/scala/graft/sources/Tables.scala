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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). The nanosAsLong legacy conf is set ONCE in
    * `Sessions.builder` (a session-wide reader setting, not a loader side
    * effect); this loader truncates the raw nanos to microseconds with
    * *integer* division (ns epoch values ~1.7e18 exceed double's 53-bit
    * exact range, so `/ 1000.0` would corrupt microseconds) — matching
    * DuckDB's own nanos→micros truncation so event queries stay
    * oracle-comparable.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
