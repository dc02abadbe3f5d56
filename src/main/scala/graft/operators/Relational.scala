package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Core relational operator surface (SURVEY.md §2.2-§2.8): filters,
  * projections, joins, aggregations, windows, sorts/top-k, set ops — the
  * query layer the reference's declared dbt marts imply, expressed
  * Spark-first so Catalyst handles pushdown/pruning/join-strategy.
  *
  * Oracle-parity discipline (BASELINE.md t2 contract):
  *   - money-ish doubles are cast to DECIMAL(18,4) *before* aggregation in
  *     both the Spark plan and the DuckDB oracle SQL — decimal sums are
  *     exact and order-independent, so results are bit-stable across both
  *     engines regardless of partitioning/parallelism;
  *   - final outputs cast back to double (one deterministic conversion);
  *   - every query ends in a total-order sort so row order hashes stably.
  */
object Relational {

  /** Exact, order-independent aggregation input (see object doc). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** TPC-H Q1-style pricing summary: scan-heavy agg with partial (map-side)
    * aggregation; shuffles only the tiny per-group partials. At 100 TB this
    * is bound by parquet scan throughput — only 7 of 11 lineitem columns are
    * read (column pruning), and the shipdate filter is pushed to the scan.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
