package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse copy-in (SURVEY.md §2.1 S7): the reference pages BigQuery with
  * serial LIMIT/OFFSET and no ORDER BY
  * (`citibike_project/etl/ingest_data.py:254-284`) — nondeterministic and
  * single-threaded (§7.4 bug 2). The Spark replacement is a partitioned
  * JDBC range read: N parallel range scans on the partition column, with
  * the year predicate pushed into the source by Catalyst
  * (JDBC `pushDownPredicate` is on by default).
  */
object Warehouse {

  final case class ExtractConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: String,
      lowerBound: String,
      upperBound: String,
      numPartitions: Int = 16,
      driver: String = "org.postgresql.Driver")

  /** Partitioned JDBC scan; compose `.filter(year(col) === y)` on the
    * result — the filter reaches the remote WHERE clause via pushdown.
    */
  def partitionedJdbc(spark: SparkSession, cfg: ExtractConfig): DataFrame =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("partitionColumn", cfg.partitionColumn)
      .option("lowerBound", cfg.lowerBound)
      .option("upperBound", cfg.upperBound)
      .option("numPartitions", cfg.numPartitions.toString)
      .load()

  /** The reference's one relational predicate (EXTRACT(YEAR ...) = y,
    * `etl/ingest_data.py:268`) as a composable filter.
    */
  def yearFilter(df: DataFrame, tsCol: String, y: Int): DataFrame =
    df.filter(year(col(tsCol)) === lit(y))
}
