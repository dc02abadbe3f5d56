package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query wall seconds.
  *
  * Materialization is a noop-sink write (`format("noop")`) — full plan
  * execution including final projections/sorts, zero sink I/O — instead of
  * `count()`, which would let Catalyst prune aggregate/sort work and
  * under-measure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Sketch queries localCheckpoint intermediates; without an explicit
      // unpersist those blocks live until the DataFrame is GC'd, so a
      // 50-query x 2-run suite accumulates hundreds of dead cached RDDs
      // (block-manager bloat + GC pressure showed up as multi-second
      // mid-suite outliers). Drop them between runs, outside the timing.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }

    // Min of two runs: the first execution of each query pays one-time
    // whole-stage-codegen compile + JIT, and this machine shows ±30%
    // run-to-run noise — the minimum is the stable, comparable figure.
    // When the two runs disagree by more than 50% the box is mid-burst
    // (co-tenant load spikes to 8+ with an idle process table); one
    // adaptive third rep recovers the real figure without inflating the
    // suite wall clock in the common case.
    def timed(name: String): Double = {
      val a = runOnce(name)
      if (a < 0) return a
      val b = runOnce(name)
      if (b < 0) return a
      val m = math.min(a, b)
      if (math.max(a, b) <= m * 1.5) m
      else {
        val c = runOnce(name)
        if (c < 0) m else math.min(m, c)
      }
    }

    // Warmup: JIT + codegen + parquet footer caches on a cheap query.
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(q => q(spark, sfDir).write.mode("overwrite").format("noop").save())

    val names = SparkEntry.queries.keys.toSeq.sortBy { n =>
      val num = n.drop(1).takeWhile(_.isDigit)
      if (num.nonEmpty) num.toInt else Int.MaxValue
    }
    val results = names.map(n => n -> timed(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
