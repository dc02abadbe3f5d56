package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.extract.Warehouse

/** Integration test of the JDBC load/extract protocol (SURVEY.md §2.1
  * S6/S7) against embedded Derby (the JDBC engine Spark ships for its Hive
  * metastore) — the same `DataFrameWriter.jdbc`/partitioned-read code paths
  * a Postgres deployment uses, minus the network.
  */
class JdbcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private def cfg(table: String) = Sinks.JdbcConfig(
    url = url, table = table, user = "", password = "", driver = driver,
    batchSize = 500, numPartitions = Some(2))

  test("writeJdbc overwrite then append, read back") {
    val df = (1 to 100).map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "name", "v")
    Sinks.writeJdbc(df, cfg("trips"), SaveMode.Overwrite)
    val appended = Seq((101L, "name101", 1.0)).toDF("id", "name", "v")
    Sinks.writeJdbc(appended, cfg("trips"), SaveMode.Append)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "trips").option("driver", driver)
      .load()
    assert(back.count() == 101)
  }

  test("deleteWhere: missing table is the no-op first-batch case, other SQL errors propagate") {
    // missing table: Derby raises SQLState 42X05 — swallowed, 0 rows
    assert(Sinks.deleteWhere(cfg("never_created"), "1 = 1") == 0)
    // existing table, bad predicate (unknown column, SQLState 42X04):
    // NOT the first-batch case — swallowing it would let a replayed
    // batch double-append, so it must propagate
    val df = Seq((1L, "a")).toDF("id", "name")
    Sinks.writeJdbc(df, cfg("del_probe"), SaveMode.Overwrite)
    intercept[java.sql.SQLException] {
      Sinks.deleteWhere(cfg("del_probe"), "\"no_such_col\" = 1")
    }
    // and a well-formed delete still works against the live table
    assert(Sinks.deleteWhere(cfg("del_probe"), "\"id\" = 1") == 1)
  }

  test("partitioned JDBC extract parallelizes range scans") {
    val df = (1 to 1000).map(i => (i.toLong, s"u$i")).toDF("id", "payload")
    Sinks.writeJdbc(df, cfg("big"), SaveMode.Overwrite)
    val scan = Warehouse.partitionedJdbc(spark, Warehouse.ExtractConfig(
      url = url, table = "big", user = "", password = "",
      partitionColumn = "id", lowerBound = "1", upperBound = "1000",
      numPartitions = 4, driver = driver))
    assert(scan.rdd.getNumPartitions == 4)
    assert(scan.count() == 1000)
    // predicate composes and filters remotely/locally to the same result
    assert(scan.filter($"id" <= 10).count() == 10)
  }
}
