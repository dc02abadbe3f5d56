package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites execute
  * sequentially; see build.sbt Test/parallelExecution).
  */
object SparkTestSession {
  lazy val get: SparkSession = {
    val s = graft.core.Sessions.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"
}
