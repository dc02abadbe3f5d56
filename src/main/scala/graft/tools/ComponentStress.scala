package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Off-fixture stress of the connected-component algorithms (round-notes
  * evidence, not a spec): a long chain (adversarial diameter) and a
  * power-law edge set (realistic near-dup graph at scale), comparing
  * min-label propagation (`dedupClusters`, O(diameter) rounds) against
  * large-star/small-star (`dedupClustersStar`, O(log n) rounds) on
  * rounds, wall time, shuffle bytes, and leftover persisted blocks (the
  * checkpoint-lifecycle fix should keep block count O(1) in rounds).
  *
  * `tools/run.sh graft.tools.ComponentStress [chainLen] [plEdges]`
  */
object ComponentStress {
  def main(args: Array[String]): Unit = {
    val chainLen = if (args.length > 0) args(0).toInt else 100000
    val plEdges = if (args.length > 1) args(1).toLong else 10000000L
    val spark = graft.core.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        shufWrite.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })

    def run(label: String, algo: DataFrame => DataFrame, pairs: DataFrame): (Long, Long) = {
      shufWrite.set(0); shufRead.set(0)
      val t0 = System.nanoTime()
      val out = algo(pairs)
      // order-invariant fingerprint of (doc_id, cluster_rep, cluster_size)
      val r = out.agg(count(lit(1)), bit_xor(xxhash64($"doc_id", $"cluster_rep", $"cluster_size"))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain stage metrics
      val blocks = spark.sparkContext.getPersistentRDDs.size
      println(f"$label%-28s rounds=${Dedup.lastRounds.get()}%5d wall=$dt%8.2fs " +
        f"shufW=${shufWrite.get() / 1e6}%9.1fMB shufR=${shufRead.get() / 1e6}%9.1fMB " +
        f"persistedBlocks=$blocks%3d n=${r.getLong(0)}%9d fp=${r.getLong(1)}%20d")
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      (r.getLong(0), r.getLong(1))
    }

    // 1. adversarial chain: 0-1-2-...-N. Propagation needs ~N rounds —
    // infeasible past a few hundred; star needs ~log N.
    println(s"== chain of $chainLen hops ==")
    val chain = spark.range(chainLen)
      .select($"id".as("a_id"), ($"id" + 1).as("b_id"))
    val starChain = run("star (chain)", Dedup.dedupClustersStar, chain)
    assert(starChain._1 == chainLen + 1, "one component containing every vertex")
    val shortChain = spark.range(400).select($"id".as("a_id"), ($"id" + 1).as("b_id"))
    val p400 = run("propagation (chain 400)", Dedup.dedupClusters, shortChain)
    val s400 = run("star        (chain 400)", Dedup.dedupClustersStar, shortChain)
    assert(p400 == s400, "identical output contract on the 400-hop chain")

    // 2. power-law-ish graph: hub-biased endpoints over n vertices give a
    // heavy-tailed degree distribution (v ~ h mod (h2 mod cap)) — the
    // realistic shape of a near-dup graph with template families.
    val nVerts = plEdges / 10
    println(s"== power-law-ish: $plEdges edges over ~$nVerts vertices ==")
    val pl = spark.range(plEdges)
      .select(
        pmod(xxhash64($"id"), lit(nVerts)).as("a_id"),
        pmod(xxhash64($"id", lit(1)),
          pmod(xxhash64($"id", lit(2)), lit(nVerts - 1)) + 1).as("b_id"))
      .localCheckpoint()
    // the input graph is read by BOTH runs — pin it against the
    // between-run sweep (a swept localCheckpoint cannot recompute)
    org.apache.spark.sql.graft.CheckpointUtils.pin(pl)
    val pPl = run("propagation (power-law)", Dedup.dedupClusters, pl)
    val sPl = run("star        (power-law)", Dedup.dedupClustersStar, pl)
    assert(pPl == sPl, "identical output contract on the power-law graph")
    println("equality: propagation == star on both stress graphs")
    spark.stop()
  }
}
