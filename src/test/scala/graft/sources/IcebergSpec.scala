package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** S13 Iceberg surface. The write/merge round trip is probe-gated: this
  * sandbox ships no Iceberg runtime jar (and has no egress to fetch one),
  * so the round trip CANCELS here with the probe result visible in the
  * report, and runs for real the moment a jar lands on the classpath.
  * The probe and the catalog-config mapping are always tested.
  */
class IcebergSpec extends AnyFunSuite with SparkSpec {

  test("capability probe reflects the classpath") {
    // in this build the jar is absent by environment constraint; the
    // probe must say so (and the write path must refuse cleanly)
    if (!Sinks.icebergAvailable) {
      val e = intercept[IllegalArgumentException] {
        Sinks.writeIceberg(spark.range(1).toDF(), "lake.db.t")
      }
      assert(e.getMessage.contains("Iceberg runtime jar"))
      val m = intercept[IllegalArgumentException] {
        Sinks.mergeIceberg(spark.range(1).toDF(), "lake.db.t", Seq("id"))
      }
      assert(m.getMessage.contains("Iceberg runtime jar"))
    }
  }

  test("catalog conf maps the reference's spark-defaults settings") {
    val c = Sinks.icebergCatalogConf("lake", "file:///tmp/wh")
    assert(c("spark.sql.catalog.lake") == "org.apache.iceberg.spark.SparkCatalog")
    assert(c("spark.sql.catalog.lake.type") == "hadoop")
    assert(c("spark.sql.catalog.lake.warehouse") == "file:///tmp/wh")
  }

  test("iceberg write + merge round trip (runs when the runtime jar is present)") {
    assume(Sinks.icebergAvailable,
      s"Iceberg runtime jar absent (icebergAvailable=false) — environment-blocked, code ready")
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_iceberg_wh").toString
    Sinks.icebergCatalogConf("lake", s"file://$wh").foreach { case (k, v) =>
      spark.conf.set(k, v)
    }
    val t = "lake.db.events_wh"
    Sinks.writeIceberg(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    assert(spark.table(t).count() == 2)
    // merge: update one, insert one — replay-idempotent upsert
    Sinks.mergeIceberg(Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), t, Seq("id"))
    val got = spark.table(t).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // replaying the same merge changes nothing
    Sinks.mergeIceberg(Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), t, Seq("id"))
    assert(spark.table(t).count() == 3)
  }
}
