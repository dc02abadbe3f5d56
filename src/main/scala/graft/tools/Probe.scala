package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe main — rewritten per investigation; not part of the
  * engine surface.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val li = spark.read.parquet(s"/root/testdata/sf$sf/lineitem.parquet")
      li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.05).as("est_o"),
          countDistinct(col("l_orderkey")).as("ex_o"),
          approx_count_distinct(col("l_partkey"), 0.05).as("est_p"),
          countDistinct(col("l_partkey")).as("ex_p"))
        .withColumn("rel_o", abs(col("est_o") - col("ex_o")).cast("double") / col("ex_o"))
        .withColumn("rel_p", abs(col("est_p") - col("ex_p")).cast("double") / col("ex_p"))
        .orderBy(col("l_returnflag"))
        .show(10, false)
    }
    spark.stop()
  }
}
