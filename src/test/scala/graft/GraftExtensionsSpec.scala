package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The extensions entry point installs graft functions into a fresh
  * session's SQL surface.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions exposes graft functions to spark.sql") {
    // getOrCreate returns any existing default session (ignoring
    // extensions), so detach the shared test session first and restore it
    // after — the SparkContext itself is reused.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      s.sparkContext.setLogLevel("ERROR")
      val cos = s.sql("SELECT cosine_similarity(array(1.0F, 0.0F), array(0.0F, 1.0F)) c")
        .collect().head.getDouble(0)
      assert(cos == 0.0)
      val ic = s.sql("SELECT intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) c")
        .collect().head.getLong(0)
      assert(ic == 2L)
      val dp = s.sql("SELECT dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) c")
        .collect().head.getDouble(0)
      assert(dp == 11.0)
      val h = s.sql("SELECT md5_prefix60('alpha beta') h, CAST(conv(substr(md5('alpha beta'), 1, 15), 16, 10) AS BIGINT) c")
        .collect().head
      assert(h.getLong(0) == h.getLong(1))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
