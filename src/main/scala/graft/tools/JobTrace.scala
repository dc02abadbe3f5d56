package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable
import graft.SparkEntry

/** Per-job/per-stage wall-time trace for one declared query (throwaway
  * diagnostic): `tools/run.sh graft.tools.JobTrace <sfDir> <query> [reps]`.
  * Prints every Spark job's duration and its stages' task-time sums so
  * fixed scheduling overhead vs real compute is visible.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")

    val jobStart = mutable.Map[Int, Long]()
    val stageInfo = mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = System.nanoTime()
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val dur = (System.nanoTime() - jobStart.getOrElse(e.jobId, System.nanoTime())) / 1e9
        println(f"    job ${e.jobId}%3d: $dur%7.3f s")
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val run = si.taskMetrics.executorRunTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val gc = si.taskMetrics.jvmGCTime / 1e3
        val ser = si.taskMetrics.resultSerializationTime / 1e3
        val dser = si.taskMetrics.executorDeserializeTime / 1e3
        println(f"      stage ${si.stageId}%3d [${si.numTasks}%3d tasks] ${si.name.takeWhile(_ != '\n').take(60)}%-60s run=$run%7.2f cpu=$cpu%7.2f gc=$gc%6.2f deser=$dser%6.2f ser=$ser%5.2f")
        if (run > 3.0 && si.numTasks <= 4) {
          println("        ---- details ----")
          si.details.linesIterator.take(12).foreach(l => println(s"        $l"))
        }
      }
    })

    (1 to reps).foreach { i =>
      println(s"== rep $i ==")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"  total: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
