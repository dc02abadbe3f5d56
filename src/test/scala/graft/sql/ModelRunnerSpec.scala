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

  test("incremental materialization rewrites only the tail partitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Files.createTempDirectory("graft_inc").toString
    val modelsDir = ModelRunner.packagedModelsDir()
    val ev = graft.sources.Tables.events(spark, sfDir)
    val mm = ev.agg(min(unix_micros($"ts")).as("a"), max(unix_micros($"ts")).as("b")).head()
    val cutUs = (mm.getLong(0) + mm.getLong(1)) / 2
    // run 1: early half only
    val m1 = ModelRunner.materializeIncremental(spark, modelsDir, sfDir, out,
      finals = Seq("mart_daily_events"),
      overrides = Map("events" -> ev.filter(unix_micros($"ts") < cutUs)))
    assert(m1 == Map("mart_daily_events" -> "first_full"))
    val martDir = new java.io.File(s"$out/mart_daily_events")
    def partFiles(): Map[String, Set[String]] =
      martDir.listFiles.filter(d => d.isDirectory && d.getName.startsWith("event_date="))
        .map(d => d.getName -> d.listFiles.map(_.getName).toSet).toMap
    val before = partFiles()
    val pmax = before.keys.max // lexicographic == chronological for ISO dates
    // run 2: full source; only pmax-and-later partitions may be rewritten
    val m2 = ModelRunner.materializeIncremental(spark, modelsDir, sfDir, out,
      finals = Seq("mart_daily_events"))
    assert(m2 == Map("mart_daily_events" -> "incremental"))
    val after = partFiles()
    before.filter(_._1 < pmax).foreach { case (p, files) =>
      assert(after(p) == files, s"immutable partition $p was rewritten")
    }
    assert(after.keys.max > pmax, "new partitions must have appeared")
    // and the incremental result equals a full refresh of the whole source
    val got = spark.read.parquet(s"$out/mart_daily_events")
      .select($"event_date".cast("string"), $"event_type", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet
    val full = ev.groupBy(date_trunc("day", $"ts").cast("date").as("event_date"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,4)")).cast("string").cast("double").as("sum_value"))
      .select($"event_date".cast("string"), $"event_type", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet
    assert(got == full)
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
