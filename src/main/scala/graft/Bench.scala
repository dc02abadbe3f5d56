package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query wall seconds.
  *
  * Materialization is a noop-sink write (`format("noop")`) — full plan
  * execution including final projections/sorts, zero sink I/O — instead of
  * `count()`, which would let Catalyst prune aggregate/sort work and
  * under-measure.
  *
  * `total` = sum of per-query minima PLUS the `memo_build` entries (the
  * session-memo first-touch builds, reported separately since r7) — the
  * cost of a one-shot suite run. Rounds ≤ 6 reported per-query sums only,
  * so cross-round total comparisons should add ~nothing for r ≤ 5 (no
  * memo) and the r6 NOTES' ~4-5 s estimate for r6.
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
      // mid-suite outliers). Drop them between runs, outside the timing —
      // EXCEPT the session-pinned memo tables (shared dedup pair-table
      // family): those are materialized once per session by design, and
      // sweeping a localCheckpoint makes its consumers fail, not recompute.
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      dt
    }

    // Warmup: JIT + codegen + parquet footer caches on a cheap query.
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(q => q(spark, sfDir).write.mode("overwrite").format("noop").save())

    val names = SparkEntry.queries.keys.toSeq.sortBy { n =>
      val num = n.drop(1).takeWhile(_.isDigit)
      if (num.nonEmpty) num.toInt else Int.MaxValue
    }

    // Min over two FULL suite passes (+ adaptive third rep per query):
    // the first execution of each query pays one-time whole-stage-codegen
    // compile + JIT, and this box has noisy co-tenants whose load bursts
    // last minutes — long enough to swallow back-to-back reps of the same
    // query (the r3 driver run shows a contiguous q40-q49 block at 10-28x
    // its warm floor while the rest of the suite is normal). Two
    // interleaved passes cost the same number of executions but separate
    // each query's reps by ~the suite length, so a burst can only inflate
    // one of them. Queries whose two reps still disagree by >50% get one
    // targeted third rep at the end.
    val pass1 = names.map(n => n -> runOnce(n)).toMap
    val pass2 = names.map(n => n -> runOnce(n)).toMap
    val results = names.map { n =>
      val (a, b) = (pass1(n), pass2(n))
      val v =
        if (a < 0) b
        else if (b < 0) a
        else {
          val m = math.min(a, b)
          if (math.max(a, b) <= m * 1.5) m
          else { val c = runOnce(n); if (c < 0) m else math.min(m, c) }
        }
      n -> v
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // Session-memo first-touch builds (the shared dedup/similarity pair
    // tables) are paid ONCE, inside whichever pass-1 query touched first;
    // min-of-two-passes therefore reports every memoized query at its
    // steady state and the build shows up in NO per-query figure. Emit
    // the builds as explicit line items so per-query + memo_build sums
    // to what a one-shot suite actually costs, and cross-round per-query
    // comparisons of the memoized heads stay meaningful.
    val builds = graft.operators.OpUtils.SessionMemo.buildSeconds.toSeq.sortBy(_._1)
    val mb = builds.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + builds.map(_._2).sum
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"memo_build":$mb,"sf":"$sfDir"}""")
    spark.stop()
  }
}
