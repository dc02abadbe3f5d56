package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory (one entry per
  * implemented SURVEY.md §2 capability); `oracleSql` carries the DuckDB
  * equivalent the driver hash-compares against on sf0.01. Each operator
  * module contributes its own map; SparkEntry is just the union.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Analytics.queries ++ Corpus.queries ++ Selection.queries ++
      Contracts.queries ++ Lakehouse.queries ++ Resolution.queries ++
      Temporal.queries ++ Graphs.queries ++ Reconcile.queries ++
      Diagnostics.queries ++ graft.sql.ModelRunner.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Events.oracleSql ++ TextAnalysis.oracleSql ++
      Dedup.oracleSql ++ Similarity.oracleSql ++ Multimodal.oracleSql ++
      Analytics.oracleSql ++ Corpus.oracleSql ++ Selection.oracleSql ++
      Contracts.oracleSql ++ Lakehouse.oracleSql ++ Resolution.oracleSql ++
      Temporal.oracleSql ++ Graphs.oracleSql ++ Reconcile.oracleSql ++
      Diagnostics.oracleSql ++ graft.sql.ModelRunner.oracleSql
}
