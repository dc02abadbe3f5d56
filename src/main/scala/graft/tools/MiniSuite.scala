package graft.tools

import graft.SparkEntry

/** Suite-context timing probe: run a chosen subsequence of declared
  * queries in ONE session, in order, printing per-query wall seconds plus
  * JIT code-heap usage after each — the tool for adjudicating "query X is
  * slow only mid-suite" claims (ambient burst vs code-cache pressure vs
  * genuinely order-dependent state). Usage:
  * `tools/run.sh graft.tools.MiniSuite <sfDir> <query> [query...]`
  */
object MiniSuite {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = graft.core.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      import scala.jdk.CollectionConverters._
      val code = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.contains("CodeHeap"))
        .map(p => f"${p.getName}:${p.getUsage.getUsed / 1e6}%.0fM").mkString(" ")
      println(f"$n%-35s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $code")
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
    }
    spark.stop()
  }
}
