package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Memory-pressure evidence for the biggest shuffles (round-notes
  * material, not a spec): runs the heaviest declared pipelines with the
  * session memo RELEASED first (so the pair-table builds — the largest
  * shuffles in the engine — execute inside the measured window) and
  * records per-query wall, spill bytes (in-memory + disk), and peak
  * single-task execution memory. Driven with a deliberately small driver
  * heap (`SPARK_DRIVER_MEM=2g tools/run.sh …`) and/or a lowered
  * `SPARK_GRAFT_MEM_FRACTION`, it is the local[N] analog of a
  * memory-pressured cluster: the claim under test is that the plans
  * SPILL AND COMPLETE rather than OOM when execution memory is scarce —
  * Spark's sort/aggregate/join operators degrade to external
  * (spilling) mode, so partition sizing mistakes cost throughput, not
  * correctness.
  *
  * `SPARK_DRIVER_MEM=2g SPARK_GRAFT_MEM_FRACTION=0.2 SPARK_GRAFT_CPUS=16 \
  *   tools/run.sh graft.tools.SpillEvidence /root/testdata/sf0.1 [query ...]`
  */
object SpillEvidence {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q47_ngram_jaccard_inverted", "q31_minhash_lsh", "q63_training_manifest")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val memFraction = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.6")
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus)
      .config("spark.memory.fraction", memFraction)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val peakTaskMem = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        Option(e.taskMetrics).foreach { m =>
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakTaskMem.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
        }
    })

    println(f"== Spill evidence: heap=${Runtime.getRuntime.maxMemory / 1e9}%.1fGB " +
      f"memory.fraction=$memFraction cores=$cpus sf=$sfDir ==")
    names.foreach { name =>
      // release so the memoized pair-table BUILDS run inside the window
      graft.operators.OpUtils.SessionMemo.releaseAll(spark, sfDir)
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      memSpill.set(0); diskSpill.set(0); peakTaskMem.set(0)
      val t0 = System.nanoTime()
      val outcome =
        try {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          "completed"
        } catch { case e: Throwable => s"FAILED: ${e.getMessage}" }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      println(f"$name%-28s wall=$wall%7.1f s  spillMem=${memSpill.get / 1e6}%9.1fMB " +
        f"spillDisk=${diskSpill.get / 1e6}%9.1fMB peakTaskMem=${peakTaskMem.get / 1e6}%8.1fMB  $outcome")
    }
    spark.stop()
  }
}
