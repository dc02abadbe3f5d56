package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.OpUtils.SpreadOps

/** Trained-PQ parameter sweep (the Scala sibling of `tools/pq_sweep.py`,
  * which swept the GEOMETRY; this sweeps the TRAINING): recall@5 of
  * [[graft.operators.Similarity.trainedPqAnnTop5]] at the adopted
  * 16×4-dim/K=16 geometry over sample size × Lloyd iterations, on the
  * same synthetic corpus recipe `ScaleEvidence ann` uses — so the sweep
  * point can be read directly against the scale audit's decayed
  * fixed-codebook row (n=128000: fixed 16/160).
  *
  * Usage: `tools/run.sh graft.tools.TrainedPqSweep [n] [samples...]`
  * (default n=128000, samples 64/256/1024 × iters 0/2/4/8; iters=0 is
  * the sample-init codebook with no training — isolating how much of
  * the win is Lloyd vs just initializing from the sample).
  */
object TrainedPqSweep {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(128000)
    val samples = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(64, 256, 1024)
    val iters = Seq(0, 2, 4, 8)
    val spark = graft.core.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val top5 = graft.functions.TopKByScore(5)
    val emb = spark.range(n).select($"id".as("vec_id"),
      expr("""transform(sequence(0, 63),
             |  d -> CAST((pmod(xxhash64(id, d), 2001) - 1000) / 1000.0 AS FLOAT))"""
        .stripMargin).as("embedding"))
      .spreadAcrossCores
      .localCheckpoint()
    val panel = emb.select($"vec_id", xxhash64($"vec_id").as("o"))
      .orderBy($"o", $"vec_id").limit(32).select($"vec_id".as("a_id"))
      .localCheckpoint()
    val pe = emb.join(broadcast(panel), emb("vec_id") === panel("a_id"))
      .select($"a_id", $"embedding".as("ea")).localCheckpoint()
    val exact = emb.crossJoin(broadcast(pe))
      .filter($"vec_id" =!= $"a_id")
      .withColumn("cs", graft.functions.VectorFunctions.cosineSim($"ea", $"embedding"))
      .filter(!isnan($"cs"))
      .groupBy($"a_id").agg(top5($"cs", $"vec_id").as("top"))
      .select($"a_id", explode($"top.b_id").as("b_id"))
      .localCheckpoint()
    for (s <- samples; t <- iters) {
      val t0 = System.nanoTime()
      val ann = graft.operators.Similarity
        .trainedPqAnnTop5(emb, panel, 16, 4, 16, s, t).localCheckpoint()
      val hits = exact.join(ann, Seq("a_id", "b_id")).count()
      println(f"n=$n%7d sample=$s%5d iters=$t%2d  hits=$hits%3d/160" +
        f"  wall=${(System.nanoTime() - t0) / 1e9}%6.1fs")
      // no per-point sweepUnpinned: it would delete the SHARED corpus /
      // ground-truth checkpoint blocks mid-grid (the ScaleEvidence
      // fpstream lesson, NOTES_r13 §14) — blocks are small, freed at stop
    }
    spark.stop()
  }
}
