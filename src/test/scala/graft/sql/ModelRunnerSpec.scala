package graft.sql

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ModelRunnerSpec extends AnyFunSuite with SparkSpec {

  private lazy val modelsDir = {
    val d = Files.createTempDirectory("graft_models")
    Files.writeString(d.resolve("stg_orders.sql"),
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       YEAR(o_orderdate) AS o_year
        |FROM orders WHERE o_orderstatus <> 'P'""".stripMargin)
    Files.writeString(d.resolve("mart_yearly.sql"),
      """SELECT o_year, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM stg_orders GROUP BY o_year""".stripMargin)
    Files.writeString(d.resolve("mart_top_customers.sql"),
      """SELECT o_custkey, COUNT(*) AS n FROM stg_orders
        |GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 5""".stripMargin)
    d
  }

  test("dependency inference and topological order") {
    val models = ModelRunner.load(modelsDir)
    assert(models.map(_.name).toSet == Set("stg_orders", "mart_yearly", "mart_top_customers"))
    assert(models.find(_.name == "mart_yearly").get.deps == Set("stg_orders"))
    val order = ModelRunner.topoSort(models).map(_.name)
    assert(order.indexOf("stg_orders") < order.indexOf("mart_yearly"))
  }

  test("run builds all models over the harness tables") {
    val out = ModelRunner.run(spark, modelsDir, sfDir)
    assert(out("stg_orders").count() > 0)
    assert(out("mart_yearly").columns.toSeq == Seq("o_year", "n_orders", "total"))
    assert(out("mart_top_customers").count() == 5)
  }

  test("materialize writes parquet per final model") {
    val dest = Files.createTempDirectory("graft_marts").toString
    ModelRunner.materialize(spark, modelsDir, sfDir, dest, Seq("mart_yearly"))
    assert(spark.read.parquet(s"$dest/mart_yearly").count() > 0)
  }

  test("cycles are rejected") {
    val d = Files.createTempDirectory("graft_cycle")
    Files.writeString(d.resolve("a.sql"), "SELECT * FROM b")
    Files.writeString(d.resolve("b.sql"), "SELECT * FROM a")
    intercept[IllegalArgumentException] {
      ModelRunner.topoSort(ModelRunner.load(d))
    }
  }
}
