package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical data-skipping evidence for the q109 layout audit (round-notes
  * material, not a spec): writes the SAME orders table twice — once
  * linear-sorted on order day, once Z-ordered on (custkey, day) via
  * `Lakehouse.writeZOrdered` — as `shards` parquet files each, then runs
  * the three probe shapes (key range, date range, conjunction) against
  * both layouts and reports what the scan ACTUALLY read: surviving
  * row-group rows (the parquet footer-stats pruning the q109 audit
  * predicts) from the FileSourceScanExec's own metrics. The claim under
  * test: the shard-count audit in q109 is not a paper exercise — the
  * written z-layout's footer stats really do let the vectorized reader
  * skip ~7/8 of the row groups on the non-sort dimension.
  *
  * `tools/run.sh graft.tools.LayoutEvidence [sfDir] [shards]`
  */
object LayoutEvidence {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shards = if (args.length > 1) args(1).toInt else 64
    val spark = graft.core.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val o = graft.sources.Tables.orders(spark, sfDir)
      .withColumn("day",
        datediff($"o_orderdate", lit("1992-01-01").cast("date")).cast("long"))
    val Array(minc, maxc, mind, maxd) = o.agg(
      min($"o_custkey"), max($"o_custkey"), min($"day"), max($"day"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val total = o.count()

    // probe rectangles = the q109 16/256-cell windows mapped back to values
    def lo(mn: Long, mx: Long) = mn + ((mx - mn + 1) * 96) / 256
    def hi(mn: Long, mx: Long) = mn + ((mx - mn + 1) * 112) / 256 - 1
    val (ckLo, ckHi) = (lo(minc, maxc), hi(minc, maxc))
    val (dLo, dHi) = (lo(mind, maxd), hi(mind, maxd))

    val base = Files.createTempDirectory("graft_layout").toString
    val linDest = s"$base/linear"
    val zDest = s"$base/zorder"
    o.repartitionByRange(shards, $"day").sortWithinPartitions("day")
      .write.mode("overwrite").parquet(linDest)
    graft.operators.Lakehouse.writeZOrdered(o, zDest, "o_custkey", "day", shards)

    // execute the captured plan itself (a fresh count() would build its
    // own QueryExecution and leave these metrics untouched), then read
    // the scan leaf's numOutputRows = rows surviving parquet row-group
    // pruning, i.e. what the executors actually decoded
    def scanRows(dest: String, probe: DataFrame => DataFrame): (Long, Long) = {
      val df = probe(spark.read.parquet(dest))
      val qe = df.queryExecution
      val matched = qe.executedPlan.execute().count()
      val finalPlan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scanned = finalPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      (scanned, matched)
    }

    println(s"== Layout evidence: sf=$sfDir shards=$shards rows=$total " +
      s"key probe=[$ckLo,$ckHi] date probe=[$dLo,$dHi] ==")
    println(f"${"probe"}%-12s ${"layout"}%-8s ${"rows_scanned"}%14s ${"rows_matched"}%14s ${"scan_frac"}%10s")
    val probes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "key" -> (df => df.filter($"o_custkey".between(ckLo, ckHi))),
      "date" -> (df => df.filter($"day".between(dLo, dHi))),
      "key+date" -> (df => df.filter($"o_custkey".between(ckLo, ckHi) &&
        $"day".between(dLo, dHi))))
    for ((pname, probe) <- probes; (lname, dest) <- Seq("linear" -> linDest, "zorder" -> zDest)) {
      val (scanned, matched) = scanRows(dest, probe)
      println(f"$pname%-12s $lname%-8s $scanned%14d $matched%14d ${scanned.toDouble / total}%10.3f")
    }
  }
}
