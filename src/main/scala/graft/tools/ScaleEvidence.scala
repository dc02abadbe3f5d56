package graft.tools

import graft.operators.OpUtils.SpreadOps
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Joins}

/** Off-fixture at-scale evidence (round-notes material, not a spec):
  *
  *  - `ssjoin [nDocs]` — synthetic Zipf corpus (default 50k docs, 10x the
  *    sf0.1 fixture) through the prefix-filtered inverted-index dedup
  *    path, recording candidate pairs vs n(n-1)/2 and shuffle bytes: the
  *    empirical form of the sum-over-rare-shingles(df^2) claim the
  *    100 TB story rests on.
  *  - `skew [nRows]` — a deliberately skewed join (one key = 50% of
  *    rows) with broadcast disabled, showing AQE's skew-split activating
  *    in the post-execution plan vs the manual salted-join path.
  *  - `stream [nDocs] [nWaves] [indexed] [storm]` — the Zipf corpus
  *    arriving as micro-batches through the streaming near-dup intake
  *    (naive or NearDupIndex-indexed), recording per-batch wall, shuffle
  *    and candidate volume; `storm` plants a fresh boilerplate header
  *    from the midpoint wave (the frozen-snapshot adversarial case).
  *  - `probe` — Iceberg / S3A classpath probes (S13/S11 env gates).
  *
  * `tools/run.sh graft.tools.ScaleEvidence ssjoin|skew|stream|probe [args]`
  */
object ScaleEvidence {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("probe")
    val spark = graft.core.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
        .getOrElse(Runtime.getRuntime.availableProcessors()))
    spark.sparkContext.setLogLevel("ERROR")

    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        shufWrite.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })
    def resetShuffle(): Unit = { shufWrite.set(0); shufRead.set(0) }
    def shuffleMB: (Double, Double) = {
      Thread.sleep(500) // listener bus drain
      (shufWrite.get() / 1e6, shufRead.get() / 1e6)
    }

    mode match {
      case "ssjoin" => ssjoin(spark, args.lift(1).map(_.toInt).getOrElse(50000),
        resetShuffle _, () => shuffleMB)
      case "skew" => skew(spark, args.lift(1).map(_.toLong).getOrElse(10000000L),
        resetShuffle _, () => shuffleMB)
      // 21 waves, not 20: wave = doc_id % nWaves, and clones sit at
      // ids ≡ 1 (mod 100) — a wave count dividing 100 would funnel every
      // clone into one wave instead of spreading rejections across the run
      case "stream" => stream(spark, args.lift(1).map(_.toInt).getOrElse(20000),
        args.lift(2).map(_.toInt).getOrElse(21), resetShuffle _, () => shuffleMB,
        indexed = args.drop(3).contains("indexed"),
        storm = args.drop(3).contains("storm"))
      case "probe" => probe()
      case "qnorm" => qnormScale(spark,
        if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(5000, 20000, 50000, 100000, 200000))
      case "memoscale" => memoScale(spark,
        if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(5000, 10000, 20000, 50000))
      case "triangles" => triangleScale(spark,
        if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(15000, 30000, 60000, 120000, 240000),
        resetShuffle _, () => shuffleMB)
      case "intervals" => intervalScale(spark,
        if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(10000, 20000, 40000, 80000, 160000, 320000))
      case "graphiter" => graphIterScale(spark,
        if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(15000, 30000, 60000, 120000, 240000),
        resetShuffle _, () => shuffleMB)
      case "gaps" => gapScale(spark,
        if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(1000000, 2000000, 4000000, 8000000, 16000000))
      case "ann" => annScale(spark,
        if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(2000, 8000, 32000, 128000),
        resetShuffle _, () => shuffleMB)
      case "fpstream" => fpStream(spark,
        args.lift(1).map(_.toInt).getOrElse(40000),
        args.lift(2).map(_.toInt).getOrElse(21),
        resetShuffle _, () => shuffleMB)
      case "lloyd" => lloydScale(spark,
        if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(64, 256, 512, 1024, 2048, 4096))
      case "ivfindex" => ivfIndexStream(spark,
        args.lift(1).map(_.toInt).getOrElse(128000),
        args.lift(2).map(_.toInt).getOrElse(7),
        args.lift(3).map(_.toInt), args.lift(4).map(_.toInt))
      case other => sys.error(s"unknown mode $other (ssjoin|skew|stream|probe|memoscale|qnorm|triangles|intervals|graphiter|gaps|ann|fpstream|lloyd|ivfindex)")
    }
    spark.stop()
  }

  /** The ssjoin Zipf document frame (see [[ssjoin]] doc for the
    * construction: Zipf tokens, planted near-dup clones every 100th doc,
    * 30% boilerplate headers) — shared by the batch and streaming
    * stress modes. With `stormWave >= 0` (streaming mode), every doc in
    * wave `doc_id % nWaves >= stormWave` opens with a NEW 10-token
    * header no earlier doc carries — a site-redesign boilerplate storm,
    * the adversarial case for a FROZEN rarity snapshot (the fresh
    * header's shingles have df 0 in the snapshot, so they flood
    * prefixes until the next rebuild demotes them).
    */
  private def zipfDocs(spark: org.apache.spark.sql.SparkSession, nDocs: Int,
      stormWave: Int = -1, nWaves: Int = 1): DataFrame = {
    import spark.implicits._
    val vocab = 100000L
    val m = 1000000L
    val srcId = when($"doc_id" % 100 === 1, $"doc_id" - 1).otherwise($"doc_id")
    val docLen = (pmod(xxhash64(srcId), lit(41L)) + 40L).cast("int")
    val u = (pmod(xxhash64(srcId, $"pos"), lit(m)).cast("double") + 1.0) / m.toDouble
    val rank = least(lit(vocab), floor(pow(lit(vocab.toDouble), u))).cast("long")
    val boiler = pmod(xxhash64(srcId, lit(99)), lit(10L)) < 3 && $"pos" < 10
    val storm = lit(stormWave >= 0) && $"doc_id" % nWaves >= stormWave && $"pos" < 10
    val tok = when($"doc_id" % 100 === 1 && $"pos" === docLen - 1,
      concat(lit("x"), $"doc_id"))
      .when(storm, concat(lit("strm"), $"pos"))
      .when(boiler, concat(lit("hdr"), $"pos"))
      .otherwise(concat(lit("t"), rank))
    spark.range(nDocs.toLong).select($"id".as("doc_id"))
      .select($"doc_id", explode(sequence(lit(0), docLen - 1)).as("pos"))
      .select($"doc_id", $"pos", tok.as("tok"))
      .groupBy($"doc_id")
      .agg(array_join(expr("transform(array_sort(collect_list(struct(pos, tok))), p -> p.tok)"), " ").as("text"))
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("zipf").as("source"), length($"text").cast("long").as("n_chars"))
  }

  /** Streaming near-dup intake at stress scale: the Zipf corpus arrives
    * as `nWaves` micro-batches through
    * [[graft.streaming.CorpusStreams.nearDupIntake]]; per wave we record
    * wall seconds, shuffle volume, cross candidate-pair count (via the
    * staged kernel on identical inputs) and cumulative admitted corpus —
    * the streaming sibling of the ssjoin table. Waves are `doc_id %
    * nWaves`, so every planted clone (id ≡ 1 mod 100) lands one wave
    * AFTER its source (id−1): all clone rejections exercise the
    * CROSS-batch probe against the grown corpus, the path whose cost
    * stability is on trial.
    */
  private def stream(spark: org.apache.spark.sql.SparkSession, nDocs: Int,
      nWaves: Int, reset: () => Unit, shuffle: () => (Double, Double),
      indexed: Boolean, storm: Boolean = false): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_stream_stress")
    val srcDir = root.resolve("src"); java.nio.file.Files.createDirectories(srcDir)
    val corpusDir = root.resolve("corpus").toString
    val ckpt = root.resolve("ckpt").toString
    val staged = root.resolve("waves")
    val stormWave = if (storm) nWaves / 2 else -1
    val label = (if (indexed) "INDEXED (NearDupIndex)" else "naive (re-shingle per batch)") +
      (if (storm) s", boilerplate STORM from wave $stormWave" else "")
    println(s"== Streaming near-dup intake stress [$label]: $nDocs Zipf docs in $nWaves waves ==")
    val docs = zipfDocs(spark, nDocs, stormWave, nWaves).localCheckpoint()
    (0 until nWaves).foreach { w =>
      docs.filter($"doc_id" % nWaves === w)
        .coalesce(1).write.parquet(staged.resolve(s"w$w").toString)
    }
    val q =
      if (indexed) graft.streaming.NearDupIndex.nearDupIntakeIndexed(
        spark, srcDir.toString, corpusDir, root.resolve("index").toString, ckpt,
        glob = "*.parquet")
      else graft.streaming.CorpusStreams.nearDupIntake(
        spark, srcDir.toString, corpusDir, ckpt, glob = "*.parquet")
    var prevAdmitted = 0L
    val walls = scala.collection.mutable.ArrayBuffer[Double]()
    (0 until nWaves).foreach { w =>
      val part = java.nio.file.Files.list(staged.resolve(s"w$w")).iterator()
      var src: java.nio.file.Path = null
      while (part.hasNext) { val p = part.next(); if (p.toString.endsWith(".parquet")) src = p }
      // candidate volume of the probe this wave will run, measured
      // OUTSIDE the streaming timing: the staged naive kernel over
      // identical inputs, or (indexed) the same probe the batch will pay
      // against the persisted index under the current frozen order
      val corpusNow =
        if (prevAdmitted == 0) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          graft.streaming.CorpusStreams.corpusStoreSchema)
        else spark.read.schema(graft.streaming.CorpusStreams.corpusStoreSchema).parquet(corpusDir)
      val nCand =
        if (indexed) graft.streaming.NearDupIndex.candidateCount(
          spark, root.resolve("index").toString,
          spark.read.parquet(src.toString).select($"doc_id", $"text"), 0.7)
        else graft.operators.Dedup.crossCandidates(
          corpusNow.select($"doc_id", $"text"),
          spark.read.parquet(src.toString).select($"doc_id", $"text"), 0.7).count()
      reset()
      java.nio.file.Files.move(src, srcDir.resolve(s"w$w.parquet"))
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      walls += wall
      val (sw, sr) = shuffle()
      val admitted = spark.read.parquet(corpusDir).count()
      println(f"wave $w%3d: wall=$wall%6.2f s  cand=$nCand%8d  admitted=+${admitted - prevAdmitted}%5d (cum $admitted%7d)  shufW=$sw%8.1fMB shufR=$sr%8.1fMB")
      prevAdmitted = admitted
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
    }
    q.stop()
    val firstAvg = walls.take(3).sum / 3
    val lastAvg = walls.takeRight(3).sum / 3
    println(f"per-batch wall first-3 avg ${firstAvg}%.2f s, last-3 avg ${lastAvg}%.2f s, ratio ${lastAvg / firstAvg}%.2f")
    val expectedClones = nDocs / 100
    val rejected = nDocs - prevAdmitted
    println(s"admitted $prevAdmitted of $nDocs (rejected $rejected; planted clones $expectedClones)")
    assert(rejected >= expectedClones * 9 / 10,
      "nearly all planted clones must be rejected by the cross-batch probe")
  }

  /** Zipf corpus at the natural-text exponent: P(rank = k) ~ 1/k (Zipf's
    * law), sampled by the inverse-CDF rank = V^u — a heavy head ("the",
    * "of") AND a long rare tail, the regime the rarest-prefix filter
    * exploits; every 100th doc is cloned with its last token changed,
    * planting ~nDocs/100 true near-dup pairs at bigram Jaccard well
    * above 0.7.
    */
  private def ssjoin(spark: org.apache.spark.sql.SparkSession, nDocs: Int,
      reset: () => Unit, shuffle: () => (Double, Double)): Unit = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ssjoin").toString
    val vocab = 100000L
    val m = 1000000L
    // clones draw content from the PREVIOUS doc id (same length, same
    // tokens) and mutate the final position
    val srcId = when($"doc_id" % 100 === 1, $"doc_id" - 1).otherwise($"doc_id")
    val docLen = (pmod(xxhash64(srcId), lit(41L)) + 40L).cast("int")
    val u = (pmod(xxhash64(srcId, $"pos"), lit(m)).cast("double") + 1.0) / m.toDouble
    val rank = least(lit(vocab), floor(pow(lit(vocab.toDouble), u))).cast("long")
    // adversarial boilerplate: 30% of docs open with an IDENTICAL
    // 10-token crawl header ("skip to main content..." analog) — shared
    // shingles at df ~ 0.3n, the shape that breaks naive shingle-join
    // candidate generation; the ascending-df prefix order must keep
    // them out of every prefix
    val boiler = pmod(xxhash64(srcId, lit(99)), lit(10L)) < 3 && $"pos" < 10
    val tok = when($"doc_id" % 100 === 1 && $"pos" === docLen - 1,
      concat(lit("x"), $"doc_id"))
      .when(boiler, concat(lit("hdr"), $"pos"))
      .otherwise(concat(lit("t"), rank))
    spark.range(nDocs.toLong).select($"id".as("doc_id"))
      .select($"doc_id", explode(sequence(lit(0), docLen - 1)).as("pos"))
      .select($"doc_id", $"pos", tok.as("tok"))
      .groupBy($"doc_id")
      .agg(array_join(expr("transform(array_sort(collect_list(struct(pos, tok))), p -> p.tok)"), " ").as("text"))
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("zipf").as("source"), length($"text").cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    println(s"== SSJoin stress: $nDocs Zipf docs at $dir ==")

    val t0 = System.nanoTime()
    reset()
    val hx = Dedup.invertedHxFast(spark, dir)
    val docs = Dedup.invertedDocsFromHx(spark, hx, 0.7)
    val nShingleRows = hx.count()
    val tDocs = (System.nanoTime() - t0) / 1e9

    reset()
    val t1 = System.nanoTime()
    val cand = Dedup.invertedCandidatesFromDocs(docs, 0.7).localCheckpoint()
    val nCand = cand.count()
    val tCand = (System.nanoTime() - t1) / 1e9
    val (cw, cr) = shuffle()

    reset()
    val t2 = System.nanoTime()
    val pairs = Dedup.invertedVerifyFromDocs(docs, cand, 0.7)
    val nPairs = pairs.count()
    val tVer = (System.nanoTime() - t2) / 1e9
    val (vw, vr) = shuffle()

    val allPairs = nDocs.toDouble * (nDocs - 1) / 2
    println(f"shingle rows          : $nShingleRows%12d  (index build ${tDocs}%6.1f s)")
    println(f"candidate pairs       : $nCand%12d  in ${tCand}%6.1f s  shufW=$cw%9.1fMB shufR=$cr%9.1fMB")
    println(f"all-pairs n(n-1)/2    : ${allPairs}%12.0f")
    println(f"candidate fraction    : ${nCand / allPairs}%12.2e")
    println(f"verified pairs >= 0.7 : $nPairs%12d  in ${tVer}%6.1f s  shufW=$vw%9.1fMB shufR=$vr%9.1fMB")
    println(f"planted clone pairs   : ${nDocs / 100}%12d")
    assert(nPairs >= nDocs / 100,
      "every planted clone pair must survive verification")
  }

  /** Skewed join: 50% of the fact rows share one key; the dimension is
    * forced past the broadcast path so the shuffled-join skew machinery
    * is actually on trial. Runs AQE's automatic skew split and the
    * manual salted path over identical inputs.
    */
  private def skew(spark: org.apache.spark.sql.SparkSession, nRows: Long,
      reset: () => Unit, shuffle: () => (Double, Double)): Unit = {
    import spark.implicits._
    val nKeys = 1000000L
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // AQE flags a partition as skewed only above 5x median AND an
    // absolute floor of 256 MB — sized for cluster-scale partitions. The
    // harness fixture's skewed partition is ~80 MB, so scale the floor
    // down with the data (at 100 TB the DEFAULT floor triggers on the
    // same 50%-one-key shape; this is a proxy, not a tuning claim).
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    try {
      val fact = spark.range(nRows).select(
        when(pmod(xxhash64($"id"), lit(2L)) === 0, 0L)
          .otherwise(pmod(xxhash64($"id", lit(1)), lit(nKeys))).as("k"),
        ($"id" % 997).as("v")).localCheckpoint()
      org.apache.spark.sql.graft.CheckpointUtils.pin(fact)
      val dim = spark.range(nKeys).select($"id".as("k"),
        pmod(xxhash64($"id"), lit(1000L)).as("w")).localCheckpoint()
      org.apache.spark.sql.graft.CheckpointUtils.pin(dim)
      println(s"== skew stress: $nRows fact rows (50% on one key) vs $nKeys-key dim, broadcast off ==")

      reset()
      val t0 = System.nanoTime()
      val aqe = fact.join(dim, "k").agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
      // collect(), not head(): head() executes a DERIVED limit plan and
      // would leave this queryExecution un-run (isFinalPlan=false)
      val aqeRow = aqe.collect().head
      val tAqe = (System.nanoTime() - t0) / 1e9
      val (aw, ar) = shuffle()
      val plan = aqe.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val skewLines = plan.linesIterator
        .filter(l => l.contains("skew") || l.contains("AQEShuffleRead")).take(6).toSeq
      println(f"AQE skew join         : ${tAqe}%6.1f s  shufW=$aw%9.1fMB shufR=$ar%9.1fMB  n=${aqeRow.getLong(0)}")
      println(if (skewLines.nonEmpty) skewLines.map("  plan> " + _.trim).mkString("\n")
        else "  plan> NO skew-split marker found")

      reset()
      val t1 = System.nanoTime()
      val salted = Joins.saltedJoin(fact, dim, "k", 16)
        .agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s"))
      val saltRow = salted.collect().head
      val tSalt = (System.nanoTime() - t1) / 1e9
      val (sw, sr) = shuffle()
      println(f"manual salted join(16): ${tSalt}%6.1f s  shufW=$sw%9.1fMB shufR=$sr%9.1fMB  n=${saltRow.getLong(0)}")
      assert(aqeRow.getLong(0) == saltRow.getLong(0) &&
        aqeRow.getLong(1) == saltRow.getLong(1),
        "AQE and salted paths must agree bit-for-bit")
      assert(skewLines.nonEmpty, "expected AQE to mark skewed partitions in the final plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  /** Memo-build cost model: wall seconds of the two expensive session-memo
    * builds (the q31 MinHash+LSH pair table, first touch — includes its
    * gx/hx feeder builds — and the inv_pairs_0.7 SSJoin pair table, which
    * rides the then-memoized hx) across a geometric ladder of Zipf corpus
    * sizes, with the empirical growth exponent between consecutive rungs
    * (α in t ∝ n^α). Both pipelines are banded/bucketed equi-joins, so the
    * claim on trial is α ≈ 1 (linear in the corpus, modulo the Zipf df
    * tail) — NOT the α ≈ 2 an all-pairs stage would show. Each rung's memo
    * state is released before the next so rungs are independent
    * first-touch builds.
    */
  /** Triangle-counting scaling on synthetic skewed co-occurrence graphs:
    * `basket` orders × 5 items drawn with a quadratic-skew popularity
    * (u² mapping — low part ids are hubs), so both E and the hub degree
    * grow with the rung. Records wall time, |E|, Σ triangles, shuffle
    * bytes, and the end-to-end exponent α (t ∝ n^α) per rung pair.
    * First rung repeats once as a discarded JIT warmup (the memoscale
    * discipline).
    */
  /** Iterative-graph cost model: wall seconds and shuffle volume of
    * 3-hop BFS ([[graft.operators.Graphs.bfsLevels]]) and 3-round
    * integer PageRank ([[graft.operators.Graphs.pagerankRanks]]) over
    * synthetic basket graphs of increasing size — the per-round
    * join+aggregate structure predicts t ∝ E (α ≈ 1, modulo fixed
    * per-round overhead that depresses the exponent at small sizes);
    * anything superlinear would mean frontier/rank state is being
    * recomputed across rounds instead of checkpoint-truncated.
    */
  private def graphIterScale(spark: org.apache.spark.sql.SparkSession,
      sizes: Seq[Int], resetShuffle: () => Unit,
      shuffleMB: () => (Double, Double)): Unit = {
    import spark.implicits._
    println(s"== BFS/PageRank iteration scaling over synthetic baskets $sizes ==")
    def basketEdges(nOrders: Int): DataFrame = {
      val nParts = math.max(200L, nOrders / 30L)
      val m = 1000000L
      val po = spark.range(nOrders.toLong).select($"id".as("ord"))
        .select($"ord", explode(sequence(lit(0), lit(4))).as("i"))
        .select($"ord",
          floor(pow((pmod(xxhash64($"ord", $"i"), lit(m)).cast("double") + 0.5) / m, 2.0)
            * nParts).cast("long").as("part"))
        .distinct()
      val half = po.as("a").join(po.as("b"), Seq("ord"))
        .filter($"a.part" < $"b.part")
        .select($"a.part".as("u"), $"b.part".as("v")).distinct()
      half.unionByName(half.select($"v".as("u"), $"u".as("v")))
    }
    case class Rung(n: Int, e: Long, tBfs: Double, tPr: Double, sw: Double)
    val allSizes = sizes.head +: sizes // first rung doubles as JIT warmup
    val rungs = allSizes.zipWithIndex.map { case (n, idx) =>
      val edges = basketEdges(n).localCheckpoint()
      val e = edges.count()
      val seeds = edges.select($"u".as("p")).distinct()
        .filter($"p" % 100 === 0)
      resetShuffle()
      val t0 = System.nanoTime()
      val reached = graft.operators.Graphs.bfsLevels(edges, seeds, 3).count()
      val tBfs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val mass = graft.operators.Graphs.pagerankRanks(edges, 3)
        .agg(sum($"r")).collect()(0).getLong(0)
      val tPr = (System.nanoTime() - t1) / 1e9
      val (sw, _) = shuffleMB()
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      val tag = if (idx == 0) " (warmup, discarded)" else ""
      println(f"n=$n%7d  edges=$e%9d  reached=$reached%8d  prMass=$mass%16d  " +
        f"tBFS=$tBfs%6.2f s  tPR=$tPr%6.2f s  shufW=$sw%8.1f MB$tag")
      Rung(n, e, tBfs, tPr, sw)
    }.drop(1)
    rungs.sliding(2).foreach {
      case Seq(a, b) =>
        val r = math.log(b.e.toDouble / a.e)
        println(f"E=${a.e}%8d -> ${b.e}%8d: alpha_bfs=${math.log(b.tBfs / a.tBfs) / r}%5.2f  " +
          f"alpha_pr=${math.log(b.tPr / a.tPr) / r}%5.2f  alpha_shuf=${math.log(b.sw / a.sw) / r}%5.2f")
      case _ =>
    }
  }

  private def triangleScale(spark: org.apache.spark.sql.SparkSession,
      sizes: Seq[Int], resetShuffle: () => Unit,
      shuffleMB: () => (Double, Double)): Unit = {
    import spark.implicits._
    println(s"== triangle-count scaling over synthetic baskets $sizes ==")
    def basketEdges(nOrders: Int): DataFrame = {
      val nParts = math.max(200L, nOrders / 30L)
      val m = 1000000L
      val po = spark.range(nOrders.toLong).select($"id".as("ord"))
        .select($"ord", explode(sequence(lit(0), lit(4))).as("i"))
        .select($"ord",
          floor(pow((pmod(xxhash64($"ord", $"i"), lit(m)).cast("double") + 0.5) / m, 2.0)
            * nParts).cast("long").as("part"))
        .distinct()
      po.as("a").join(po.as("b"), Seq("ord"))
        .filter($"a.part" < $"b.part")
        .select($"a.part".as("u"), $"b.part".as("v")).distinct()
    }
    case class Rung(n: Int, t: Double, e: Long, tri: Long, sw: Double)
    val allSizes = sizes.head +: sizes // first rung doubles as JIT warmup
    val rungs = allSizes.zipWithIndex.map { case (n, idx) =>
      resetShuffle()
      val edges = basketEdges(n).localCheckpoint()
      val e = edges.count()
      val t0 = System.nanoTime()
      val tri = graft.operators.Graphs.triangleCounts(edges)
        .agg(org.apache.spark.sql.functions.sum($"n_triangles")).collect()(0).getLong(0) / 3
      val t = (System.nanoTime() - t0) / 1e9
      val (sw, _) = shuffleMB()
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      val tag = if (idx == 0) " (warmup, discarded)" else ""
      println(f"n=$n%7d  edges=$e%9d  triangles=$tri%10d  t=$t%7.2f s  shufW=$sw%8.1f MB$tag")
      Rung(n, t, e, tri, sw)
    }.drop(1)
    rungs.sliding(2).foreach {
      case Seq(a, b) =>
        val r = math.log(b.n.toDouble / a.n)
        println(f"${a.n}%7d -> ${b.n}%7d: alpha_t=${math.log(b.t / a.t) / r}%5.2f  alpha_E=${math.log(b.e.toDouble / a.e) / r}%5.2f")
      case _ =>
    }
  }

  /** Binned interval join (the q124 shape) vs the direct theta join, on
    * synthetic interval sets over a fixed 30-day span: n sessions
    * (≤30 min) and n/4 incident windows (1 h), both hash-placed. The
    * theta join's candidate space is n²/4 regardless of interval
    * density; the binned join's is (per-bin sessions)×(per-bin
    * incidents) summed — linear in n at fixed span density per bin
    * width. The theta side is measured only while it stays affordable;
    * the binned side runs every rung. Both sides must agree on the
    * overlap-pair count (checked per rung — evidence is worthless if
    * the fast path is wrong).
    */
  private def intervalScale(spark: org.apache.spark.sql.SparkSession,
      sizes: Seq[Int]): Unit = {
    import spark.implicits._
    println(s"== interval-overlap join: binned vs theta over $sizes ==")
    // span grows with n (fixed interval density — a longer history, not a
    // denser one): true overlap pairs stay LINEAR in n while the theta
    // join's probed candidate space is n²/4 regardless
    val binUs = 3600L * 1000000
    def intervals(n: Int, nBase: Int, widthUs: Long, salt: Int): DataFrame = {
      val spanUs = 30L * 86400 * 1000000 * (n.toLong max nBase) / nBase
      spark.range(n.toLong).select($"id",
        pmod(xxhash64($"id", lit(salt)), lit(spanUs - widthUs)).as("start"))
        .select($"id", $"start", ($"start" + widthUs).as("end"))
    }
    def binned(s: DataFrame, i: DataFrame): Long = {
      val sb = s.withColumn("bin",
        explode(sequence(expr(s"start div $binUs"), expr(s"end div $binUs"))))
        .select($"id".as("sid"), $"start".as("ss"), $"end".as("se"), $"bin")
      val ib = i.withColumn("bin",
        explode(sequence(expr(s"start div $binUs"), expr(s"end div $binUs"))))
        .select($"id".as("iid"), $"start".as("is"), $"end".as("ie"), $"bin")
      sb.join(ib, Seq("bin"))
        .filter($"ss" <= $"ie" && $"is" <= $"se")
        .select($"sid", $"iid").distinct().count()
    }
    def theta(s: DataFrame, i: DataFrame): Long =
      s.select($"id".as("sid"), $"start".as("ss"), $"end".as("se"))
        .join(i.select($"id".as("iid"), $"start".as("is"), $"end".as("ie")),
          $"ss" <= $"ie" && $"is" <= $"se")
        .count()
    val thetaCutoff = 200000
    val allSizes = sizes.head +: sizes // JIT warmup rung, discarded
    val rungs = allSizes.zipWithIndex.map { case (n, idx) =>
      val s = intervals(n, sizes.head, 30L * 60 * 1000000, 1).localCheckpoint()
      val i = intervals(n / 4, sizes.head / 4, binUs, 2).localCheckpoint()
      val t0 = System.nanoTime()
      val pairsB = binned(s, i)
      val tB = (System.nanoTime() - t0) / 1e9
      val (tT, agree) = if (n <= thetaCutoff) {
        val t1 = System.nanoTime()
        val pairsT = theta(s, i)
        ((System.nanoTime() - t1) / 1e9, pairsT == pairsB)
      } else (-1.0, true)
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      val tag = if (idx == 0) " (warmup, discarded)" else ""
      val tTs = if (tT >= 0) f"theta=$tT%7.2f s agree=$agree" else "theta=    (skipped)"
      println(f"n=$n%7d  pairs=$pairsB%9d  binned=$tB%7.2f s  $tTs$tag")
      require(agree, s"binned and theta joins disagree at n=$n")
      (n, tB, tT)
    }.drop(1)
    rungs.sliding(2).foreach {
      case Seq((na, ta, tta), (nb, tb, ttb)) =>
        val r = math.log(nb.toDouble / na)
        val thetaA = if (tta > 0 && ttb > 0)
          f"  alpha_theta=${math.log(ttb / tta) / r}%5.2f" else ""
        println(f"$na%7d -> $nb%7d: alpha_binned=${math.log(tb / ta) / r}%5.2f$thetaA")
      case _ =>
    }
  }

  /** q218 scaling: the quantile-normalization claim is that rank
    * machinery is bounded by the SCORE DOMAIN, not the corpus — so
    * total time should scale like the two initial aggregations
    * (≈ linear in tokens) with no super-linear rank/sort term. Zipf
    * corpora with 20 sources; first rung repeated as a discarded JIT
    * warmup (memoscale discipline); checkpoint blocks swept per rung.
    */
  private def qnormScale(spark: org.apache.spark.sql.SparkSession,
      sizes: Seq[Int]): Unit = {
    import org.apache.spark.sql.functions._
    println(s"== q218 quantile-normalization scaling over 20-source Zipf corpora $sizes ==")
    case class Rung(n: Int, t: Double, rows: Long)
    val allSizes = sizes.head +: sizes
    val rungs = allSizes.zipWithIndex.map { case (n, idx) =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_qnorm_$n").toString
      zipfDocs(spark, n)
        .withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20L)).cast("string")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val rows = graft.operators.TextAnalysis.q218QuantileNormalize(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      if (idx > 0) println(f"n=$n%7d  q218=$t%7.2f s ($rows%3d source rows)")
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      Rung(n, t, rows)
    }.drop(1)
    rungs.sliding(2).foreach {
      case Seq(a, b) =>
        val r = math.log(b.n.toDouble / a.n)
        println(f"${a.n}%7d -> ${b.n}%7d: alpha_q218=${math.log(b.t / a.t) / r}%5.2f")
      case _ =>
    }
  }

  private def memoScale(spark: org.apache.spark.sql.SparkSession,
      sizes: Seq[Int]): Unit = {
    println(s"== memo-build scaling: q31_pairs + inv_pairs_0.7 over Zipf corpora $sizes ==")
    case class Rung(n: Int, t31: Double, tInv: Double, p31: Long, pInv: Long)
    val rungs = sizes.map { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_memoscale_$n").toString
      zipfDocs(spark, n).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val p31 = Dedup.q31MinhashLsh(spark, dir).count()
      val t31 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pInv = Dedup.ngramJaccardInverted(spark, dir, 0.7).count()
      val tInv = (System.nanoTime() - t1) / 1e9
      println(f"n=$n%7d  q31 build+count=$t31%7.2f s ($p31%7d pairs)  inv build+count=$tInv%7.2f s ($pInv%7d pairs)")
      graft.operators.OpUtils.SessionMemo.releaseAll(spark, dir)
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      Rung(n, t31, tInv, p31, pInv)
    }
    rungs.sliding(2).foreach {
      case Seq(a, b) =>
        val r = math.log(b.n.toDouble / a.n) // rung ratio
        println(f"${a.n}%7d -> ${b.n}%7d: alpha_q31=${math.log(b.t31 / a.t31) / r}%5.2f  alpha_inv=${math.log(b.tInv / a.tInv) / r}%5.2f")
      case _ =>
    }
  }

  /** Distributed gap census (the q169 shape) vs the naive global-window
    * lag, on synthetic key sets with ~10% hash-deleted keys. The naive
    * form sorts the ENTIRE key set into one partition for its lag();
    * the two-level form lags inside 4096-key buckets (parallel) and
    * closes bucket boundaries on the tiny extrema relation. Both sides
    * must produce the identical census row per rung — the evidence is
    * worthless if the fast path is wrong.
    */
  private def gapScale(spark: org.apache.spark.sql.SparkSession,
      sizes: Seq[Int]): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    println(s"== key-gap census: bucketed vs global-window over $sizes ==")
    def keys(n: Int): DataFrame =
      spark.range(n.toLong).select($"id".as("k"))
        .filter(pmod(xxhash64($"k"), lit(10L)) =!= 0)
    def naive(ks: DataFrame): org.apache.spark.sql.Row = {
      val gaps = ks.select($"k").distinct()
        .withColumn("pk", lag($"k", 1).over(Window.orderBy($"k")))
        .filter($"pk".isNotNull && $"k" - $"pk" > 1)
        .select(($"k" - $"pk" - 1).as("missing"))
      val tot = ks.select($"k").distinct().agg(count(lit(1)).as("n_keys"),
        min($"k").as("min_key"), max($"k").as("max_key"))
      gaps.agg(count(lit(1)).as("n_gaps"),
          coalesce(sum($"missing"), lit(0L)).as("n_missing"),
          coalesce(max($"missing"), lit(0L)).as("max_gap"))
        .crossJoin(broadcast(tot))
        .select($"n_keys", $"min_key", $"max_key", $"n_gaps", $"n_missing",
          $"max_gap",
          ($"max_key" - $"min_key" + 1 - $"n_keys" === $"n_missing")
            .as("conservation_ok"))
        .collect()(0)
    }
    val allSizes = sizes.head +: sizes // JIT warmup rung, discarded
    val rungs = allSizes.zipWithIndex.map { case (n, idx) =>
      val ks = keys(n).localCheckpoint()
      val t0 = System.nanoTime()
      val rB = graft.operators.Diagnostics.gapCensus(ks).collect()(0)
      val tB = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rN = naive(ks)
      val tN = (System.nanoTime() - t1) / 1e9
      require(rB == rN, s"bucketed and naive censuses disagree at n=$n: $rB vs $rN")
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      val tag = if (idx == 0) " (warmup, discarded)" else ""
      println(f"n=$n%9d  gaps=${rB.getAs[Long]("n_gaps")}%9d  " +
        f"bucketed=$tB%7.2f s  naive=$tN%7.2f s$tag")
      (n, tB, tN)
    }.drop(1)
    rungs.sliding(2).foreach {
      case Seq((na, ta, tna), (nb, tb, tnb)) =>
        val r = math.log(nb.toDouble / na)
        println(f"$na%9d -> $nb%9d: alpha_bucketed=${math.log(tb / ta) / r}%5.2f" +
          f"  alpha_naive=${math.log(tnb / tna) / r}%5.2f")
      case _ =>
    }
  }

  private def probe(): Unit = {
    def has(cn: String): String =
      try { Class.forName(cn); "PRESENT" } catch { case _: ClassNotFoundException => "absent" }
    println(s"iceberg runtime (org.apache.iceberg.spark.SparkCatalog): ${has("org.apache.iceberg.spark.SparkCatalog")}")
    println(s"icebergAvailable probe gate                            : ${graft.sources.Sinks.icebergAvailable}")
    println(s"hadoop-aws S3A (org.apache.hadoop.fs.s3a.S3AFileSystem): ${has("org.apache.hadoop.fs.s3a.S3AFileSystem")}")
  }

  /** `ann [n…]` — measured scaling evidence for the tuned ANN index
    * configurations (q225 multi-table LSH, q226 IVF): synthetic unit-ish
    * embedding corpora at growing n, recording per rung
    *
    *  - the mean candidate FRACTION per panel query — the q225 claim is
    *    that ~probes·n/2^bits stays a constant fraction of the corpus at
    *    any n (and the fixed-nlist IVF likewise ~nprobe/nlist), while an
    *    nlist ≈ √n IVF's fraction SHRINKS as the corpus grows — the knob
    *    a 100 TB deployment actually turns;
    *  - recall@5 of 160 against the exact panel ground truth — showing
    *    how a FROZEN configuration decays as n grows (the honest reason
    *    index parameters must scale with the corpus, not folklore);
    *  - wall seconds and shuffle MB per rung.
    *
    * Vectors are deterministic xxhash64 uniforms (Spark-only naming —
    * no oracle needed for evidence runs); planes/pivots mirror the
    * production constructions (4×8 sign planes, Hamming-1 probes;
    * single-assignment lists, 8 probes).
    */
  private def annScale(spark: org.apache.spark.sql.SparkSession, sizes: Seq[Int],
      resetShuffle: () => Unit, shuffleMB: () => (Double, Double)): Unit = {
    import spark.implicits._
    val top5 = graft.functions.TopKByScore(5)
    def run(n: Int): String = {
      val t0 = System.nanoTime()
      resetShuffle()
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
      // exact ground truth: panel × corpus, bounded top-5 state
      val exact = emb.crossJoin(broadcast(pe))
        .filter($"vec_id" =!= $"a_id")
        .withColumn("cs", graft.functions.VectorFunctions.cosineSim($"ea", $"embedding"))
        .filter(!isnan($"cs"))
        .groupBy($"a_id").agg(top5($"cs", $"vec_id").as("top"))
        .select($"a_id", explode($"top.b_id").as("b_id"))
        .localCheckpoint()
      def recallAndFrac(cand: DataFrame): (Long, Double) = {
        val c = cand.localCheckpoint()
        val frac = c.count().toDouble / 32.0 / n
        val hits = exact.join(c, Seq("a_id", "b_id")).count()
        (hits, frac)
      }
      // --- tuned multi-table LSH (4 tables × 8 planes, Hamming-1 probes)
      val planes = spark.range(32).select($"id".cast("int").as("p"))
        .crossJoin(spark.range(64).select($"id".cast("int").as("d")))
        .withColumn("w", (pmod(xxhash64($"p", $"d"), lit(2001L)) - 1000L))
      val vx = emb.select($"vec_id", posexplode($"embedding").as(Seq("d", "v")))
      val buckets = vx.join(broadcast(planes), Seq("d"))
        .withColumn("prod", round($"v".cast("double") * $"w" * 1e6).cast("long"))
        .groupBy($"vec_id", $"p").agg(sum($"prod").as("s"))
        .withColumn("tbl", expr("p DIV 8"))
        .withColumn("bit",
          when($"s" > 0, expr("shiftleft(CAST(1 AS BIGINT), p % 8)")).otherwise(0L))
        .groupBy($"vec_id", $"tbl").agg(sum($"bit").as("bucket"))
        .localCheckpoint()
      val probeList = "bucket" +: (0 until 8).map(h => s"bucket ^ ${1L << h}L")
      val probes = buckets.join(broadcast(panel), buckets("vec_id") === panel("a_id"))
        .select($"a_id", $"tbl",
          explode(expr(probeList.mkString("array(", ", ", ")"))).as("bucket"))
      val lshCand = probes
        .join(buckets.select($"vec_id".as("b_id"), $"tbl", $"bucket"), Seq("tbl", "bucket"))
        .filter($"a_id" =!= $"b_id").select($"a_id", $"b_id").distinct()
      val (lshHits, lshFrac) = recallAndFrac(lshCand)
      // --- IVF: fixed nlist=64/p8, grown nlist≈√n at FIXED p8 (the
      // decay demonstration), and the adopted POLICY (nlist=⌊√n⌋,
      // nprobe=⌈nlist/8⌉ — Similarity.ivfPolicy*, the q236 constructor):
      // the policy row must hold recall AND candidate fraction across
      // the 64× growth, which is the r11-verdict "done" criterion.
      def ivf(nlist: Int, nprobe: Int): (Long, Double) = {
        val pivots = emb.filter($"vec_id" < nlist)
          .select($"vec_id".as("p_id"), $"embedding".as("pv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id").orderBy($"cs_p".desc, $"p_id")
        val near = emb.crossJoin(broadcast(pivots))
          .withColumn("cs_p", graft.functions.VectorFunctions.cosineSim($"embedding", $"pv"))
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= nprobe).select($"vec_id", $"p_id", $"rk")
          .localCheckpoint()
        val idx = near.filter($"rk" === 1).select($"vec_id".as("b_id"), $"p_id")
        val pq = near.join(broadcast(panel), near("vec_id") === panel("a_id"))
          .select($"a_id", $"p_id")
        recallAndFrac(pq.join(idx, Seq("p_id")).filter($"a_id" =!= $"b_id")
          .select($"a_id", $"b_id"))
      }
      val (i64Hits, i64Frac) = ivf(64, 8)
      val sq = math.max(64, math.ceil(math.sqrt(n.toDouble)).toInt)
      val (isqHits, isqFrac) = ivf(sq, 8)
      val pl = graft.operators.Similarity.ivfPolicyNlist(n.toLong)
      val pp = graft.operators.Similarity.ivfPolicyNprobe(pl)
      val (polHits, polFrac) = ivf(pl, pp)
      // --- TRAINED coarse pivots at the policy point (q245's kernel,
      // 64 points/centroid sample, 8 Lloyd iterations): does pivot
      // training lift recall at the SAME candidate budget across growth?
      // constants REFERENCED from the gated kernel, not copied (r14
      // advisor): a re-tune that bumps pqTrainedLogicVersion re-tunes
      // this measurement arm with it.
      val nvr = graft.operators.Similarity.pqNormalized(emb)
      val coarseDim = graft.operators.Similarity.pqSubspaces *
        graft.operators.Similarity.pqSubDim
      val centT = graft.operators.Similarity
        .pqTrainedCentroids(nvr, 1, coarseDim, pl, 64 * pl,
          graft.operators.Similarity.pqTrainIters).localCheckpoint()
      val (polTHits, polTFrac) = {
        val lists = graft.operators.Similarity
          .trainedCoarseLists(nvr, centT).localCheckpoint()
        val probes = graft.operators.Similarity
          .trainedCoarseProbes(nvr, centT, panel, pp).localCheckpoint()
        recallAndFrac(probes.join(lists, Seq("c_id"))
          .filter($"a_id" =!= $"b_id").select($"a_id", $"b_id"))
      }
      // --- the SPHERICAL form of the same trained pivots: cosine-ranked
      // assignment (IvfIndex's ivfNearOf kernel, which is what the
      // streaming index would run if handed trained pivots verbatim —
      // cosine is scale-invariant in the pivot, so no renormalization
      // arm is needed). Measures the q245-docstring metric seam:
      // integer-L2 rank vs cosine rank against non-unit centroids.
      val (sphHits, sphFrac) = {
        val pivT = graft.operators.Similarity.thawedPivots(centT)
          .localCheckpoint()
        val near = graft.operators.Similarity.ivfNearOf(emb, pivT, pp)
          .localCheckpoint()
        val idx = near.filter($"rk" === 1).select($"vec_id".as("b_id"), $"p_id")
        val pq2 = near.join(broadcast(panel), near("vec_id") === panel("a_id"))
          .select($"a_id", $"p_id")
        recallAndFrac(pq2.join(idx, Seq("p_id")).filter($"a_id" =!= $"b_id")
          .select($"a_id", $"b_id"))
      }
      // --- PQ-ADC (q239's kernel, the compression tier): the scan is
      // always the full code relation (no candidate fraction — the
      // scaling lever is BYTES per vector, not a corpus-dependent
      // parameter); the adopted 8-byte geometry vs the halved budget,
      // measured across the same growth
      def pq(mSub: Int, subDim: Int): Long = {
        val ann = graft.operators.Similarity
          .pqAnnTop5(emb, panel, mSub, subDim, 16).localCheckpoint()
        exact.join(ann, Seq("a_id", "b_id")).count()
      }
      val pq8 = pq(16, 4)
      val pq4 = pq(8, 8)
      // --- TRAINED PQ (q244's kernel): same 8-byte budget, codebook
      // re-trained per corpus size on the deterministic 1024-vector
      // sample (the adopted 64·K sizing, TrainedPqSweep) — the r13
      // honest negative's stated answer, measured: does training hold
      // recall where the fixed codebook decays?
      val pqt8 = {
        val ann = graft.operators.Similarity
          .trainedPqAnnTop5(emb, panel, 16, 4, 16, 1024, 8).localCheckpoint()
        exact.join(ann, Seq("a_id", "b_id")).count()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val (sw, _) = shuffleMB()
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      f"ann n=$n%7d  lsh(4x8,r1): cand=${lshFrac * 100}%5.1f%% hits=$lshHits%3d/160" +
        f"  ivf(64,p8): cand=${i64Frac * 100}%5.1f%% hits=$i64Hits%3d/160" +
        f"  ivf($sq%4d,p8): cand=${isqFrac * 100}%5.1f%% hits=$isqHits%3d/160" +
        f"  ivf-policy($pl%4d,p$pp%-2d): cand=${polFrac * 100}%5.1f%% hits=$polHits%3d/160" +
        f"  ivf-trained($pl%4d,p$pp%-2d): cand=${polTFrac * 100}%5.1f%% hits=$polTHits%3d/160" +
        f"  ivf-trained-sph: cand=${sphFrac * 100}%5.1f%% hits=$sphHits%3d/160" +
        f"  pq(16x4,8B): hits=$pq8%3d/160  pq(8x8,4B): hits=$pq4%3d/160" +
        f"  pq-trained(16x4,8B,s1024,t8): hits=$pqt8%3d/160" +
        f"  wall=$wall%7.1fs shufW=$sw%8.1fMB"
    }
    println(run(sizes.head) + "  (JIT warmup, discard)")
    sizes.foreach(n => println(run(n)))
  }

  /** `lloyd [K…]` — wall-time + bit-equality evidence for the sharded
    * Lloyd kernel past the serial-infeasibility knee (the r14 verdict's
    * one named scale defect). Per K: a synthetic 64·K-vector corpus (the
    * 64-points-per-centroid rule's sample IS the corpus), the production
    * coarse-quantizer geometry (mSub=1, [[graft.operators.Similarity]]'s
    * pqSubspaces·pqSubDim dims), pqTrainIters iterations. For K ≤ 1024
    * the serial reference kernel ALSO runs and the two codebooks are
    * REQUIRED bit-equal — the at-scale extension of SimilaritySpec's
    * fixture-shape pin. Above that only the sharded kernel runs; the
    * serial wall is extrapolable from its measured K² law, and not
    * running it is the point (K=4096 serial ≈ 10+ min of single
    * driver-core integer ops).
    */
  private def lloydScale(spark: org.apache.spark.sql.SparkSession,
      ks: Seq[Int]): Unit = {
    import spark.implicits._
    val sim = graft.operators.Similarity
    val dim = sim.pqSubspaces * sim.pqSubDim
    val iters = sim.pqTrainIters
    def collectSorted(df: DataFrame): Seq[(Int, Int, Seq[Long])] =
      df.collect().toSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
        .sortBy(t => (t._1, t._2))
    def run(k: Int): String = {
      val n = 64 * k
      val nv = sim.pqNormalized(spark.range(n).select($"id".as("vec_id"),
          expr(s"""transform(sequence(0, ${dim - 1}),
                 |  d -> CAST((pmod(xxhash64(id, d), 2001) - 1000) / 1000.0 AS FLOAT))"""
            .stripMargin).as("embedding"))
          .spreadAcrossCores)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val sh = collectSorted(
        sim.pqTrainedCentroidsSharded(nv, 1, dim, k, 64 * k, iters))
      val tSh = (System.nanoTime() - t0) / 1e9
      val serialNote = if (k <= 1024) {
        val t1 = System.nanoTime()
        val se = collectSorted(
          sim.pqTrainedCentroidsSerial(nv, 1, dim, k, 64 * k, iters))
        val tSe = (System.nanoTime() - t1) / 1e9
        require(sh == se, s"sharded != serial at K=$k")
        f"serial=$tSe%8.1f s  BIT-EQUAL"
      } else "serial=skipped (K^2 law; sharded-only rung)"
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      f"lloyd K=$k%5d n=$n%8d dim=$dim iters=$iters  " +
        f"sharded=$tSh%8.1f s  $serialNote"
    }
    println(run(ks.head) + "  (JIT warmup, discard)")
    ks.foreach(k => println(run(k)))
  }

  /** `ivfindex [n] [waves]` — the incremental IVF+PQ index under
    * continuous intake at evidence scale: a synthetic corpus arrives in
    * DOUBLING micro-batches (n/2^(waves−1) twice, then 2×, 4×, …)
    * through [[graft.streaming.IvfIndex.admitBatch]] with trained
    * pivots on. Per wave: admission wall seconds, whether the epoch
    * re-policied (meta snapshot count moved), the epoch's nlist/nprobe,
    * and a fixed 32-query panel's candidate FRACTION + probe wall
    * against the post-wave store. The claims on trial (the r8
    * NearDupIndex evidence, for the vector family): per-batch cost
    * tracks the BATCH except on the O(log n) re-policy waves, and the
    * √n policy holds the panel's candidate fraction flat across growth.
    */
  private def ivfIndexStream(spark: org.apache.spark.sql.SparkSession,
      n: Int, waves: Int, admitNprobe: Option[Int] = None,
      admitListRk: Option[Int] = None): Unit = {
    import spark.implicits._
    import graft.streaming.IvfIndex
    val sim = graft.operators.Similarity
    admitNprobe.foreach(k =>
      spark.conf.set("spark.graft.ivfIndex.admitNprobe", k.toString))
    admitListRk.foreach(r =>
      spark.conf.set("spark.graft.ivfIndex.admitListRk", r.toString))
    println(s"ivfindex admitNprobe=${admitNprobe.getOrElse("default")} " +
      s"admitListRk=${admitListRk.getOrElse("default")}")
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_stream")
    val corpusDir = root.resolve("corpus").toString
    val indexDir = root.resolve("index").toString
    val dim = sim.pqSubspaces * sim.pqSubDim
    // ids ≡ 1 (mod 100) past wave 0: a planted NEAR-DUP (the fpStream
    // clone discipline) of source id 2·(id mod base/2) — ALWAYS an
    // even-id WAVE-0 vector (never itself a clone, and admitted waves
    // before the clone arrives — the first cut derived sources at
    // id−101, which mostly landed in the clone's OWN wave where
    // in-batch pairs are admitted by policy, silently shrinking the
    // real cross-wave sample to one pair per wave). The clone is the
    // source plus a 0.15-scaled independent perturbation: cosine
    // ≈ 1/√1.0225 ≈ 0.989 > the 0.92 admission gate (measured
    // 0.988–0.990 on the first ids). Rejections therefore exercise the
    // cross-batch indexed probe — the production-gate catch-rate
    // measurement q249 cannot take from the fixture (no 0.92-band
    // pairs there).
    val base = math.max(2, n >> (waves - 1))
    def emb(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select($"id".as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}),
               |  d -> CAST(CASE WHEN id % 100 = 1 AND id >= $base THEN
               |    (pmod(xxhash64(2 * (id % ${base / 2}), d), 2001) - 1000) / 1000.0
               |      + 0.15 * (pmod(xxhash64(id + 1000000, d), 2001) - 1000) / 1000.0
               |  ELSE (pmod(xxhash64(id, d), 2001) - 1000) / 1000.0 END AS FLOAT))"""
          .stripMargin).as("embedding"), lit(0).as("label"))
        .spreadAcrossCores
    spark.conf.set("spark.graft.ivfIndex.trainedPivots", "true")
    try {
      // the doubling ladder trips a RE-POLICY rebuild every wave by
      // construction (cumulative doubles each time); the four trailing
      // STEADY-STATE waves (n/64 each, far below the next doubling
      // trigger) are where the incremental per-batch cost claim is
      // actually measured — admit wall there must track the BATCH, not
      // the corpus
      val sizes = (base +: (0 until waves - 1).map(i => base << i)) ++
        Seq.fill(4)(math.max(1, n / 64))
      // a cheap generator, deliberately un-checkpointed (recomputing
      // per wave costs ~nothing; under the r15 CkptScope contract a
      // checkpoint would also survive admitBatch, but there is nothing
      // to cache). Panel ids sit ABOVE every wave the run can admit —
      // the doubling ladder ends at n and the steady-state waves add
      // 4·(n/64), so ids from 2n are never admitted (the first cut,
      // [n, n+32), landed inside the first steady wave and the panel
      // was silently admitted mid-run — r15 review finding).
      val panel = emb(2L * n, 2L * n + 32)
        .select($"vec_id", $"embedding") // never admitted
      var lo = 0L
      var lastSnapshot = -1L
      var prevCorpus = 0L
      sizes.zipWithIndex.foreach { case (sz, w) =>
        val batch = emb(lo, lo + sz).localCheckpoint()
        // clones in this wave (sources are all wave-0 vectors, admitted
        // long before; wave 0 itself plants none)
        val planted =
          (lo until lo + sz).count(id => id % 100 == 1 && id >= base).toLong
        val t0 = System.nanoTime()
        IvfIndex.admitBatch(batch, corpusDir, indexDir)
        val wall = (System.nanoTime() - t0) / 1e9
        val meta = spark.read.parquet(s"$indexDir/meta").head()
        val snap = meta.getAs[Long]("n_vecs")
        val nlist = meta.getAs[Int]("nlist")
        val nprobe = meta.getAs[Int]("nprobe")
        val rebuilt = snap != lastSnapshot
        lastSnapshot = snap
        val corpusN = spark.read.schema(IvfIndex.vecSchema)
          .parquet(corpusDir).count()
        val rejected = sz - (corpusN - prevCorpus)
        prevCorpus = corpusN
        val piv = spark.read.schema(IvfIndex.pivSchema)
          .parquet(s"$indexDir/piv").localCheckpoint()
        val t1 = System.nanoTime()
        val cand = IvfIndex.candidatePairs(spark, indexDir,
          sim.ivfNearOf(panel, piv, nprobe)).count()
        val probeWall = (System.nanoTime() - t1) / 1e9
        // the panel's ADMISSION-shaped band census (admitNprobe slice,
        // production predicates): gray fraction per epoch is the
        // codebook-staleness signal — a drifting corpus under a frozen
        // codebook widens the gray band (more raw-vector fetches)
        // before it slows anything else (r15 verdict item 5)
        val (bCd, bGy, bCc) = IvfIndex.admitBandCounts(
          spark, indexDir, panel.withColumn("label", lit(0)))
        val bTot = math.max(1L, bCd + bGy + bCc)
        // the SERVING probe (r16 topK: ADC shortlist + exact re-rank)
        // against the post-wave store — the search-side scale claim:
        // per-query wall must track the probe slice (nprobe/nlist ≈
        // 1/8 of the corpus under the policy), not the corpus
        val t2 = System.nanoTime()
        val tkRows = IvfIndex.topK(spark, indexDir, corpusDir, panel, 5).count()
        val topkWall = (System.nanoTime() - t2) / 1e9
        org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
        println(f"ivfindex wave=$w%2d batch=$sz%7d corpus=$corpusN%7d  " +
          f"admit=$wall%7.1f s ${if (rebuilt) "REBUILT" else "incr   "} " +
          f"nlist=$nlist%4d p$nprobe%-3d  " +
          f"rej=$rejected%4d/$planted%-4d planted  " +
          f"panelCand=${cand / 32.0 / corpusN * 100}%5.2f%% probe=$probeWall%5.1f s  " +
          // bTot doubles as the ADMISSION-shaped candidate volume
          // (admitNprobe slice × membership depth), vs panelCand's
          // recall-shaped (nprobe-probe) volume above
          f"admCand=${bTot * 100.0 / 32.0 / corpusN}%5.2f%% " +
          f"bands=$bCd%d/$bGy%d/$bCc%d gray=${bGy * 100.0 / bTot}%5.2f%%  " +
          f"topk=$topkWall%4.1f s/${tkRows}r")
        lo += sz
      }
    } finally {
      spark.conf.unset("spark.graft.ivfIndex.trainedPivots")
      spark.conf.unset("spark.graft.ivfIndex.admitNprobe")
      spark.conf.unset("spark.graft.ivfIndex.admitListRk")
    }
  }

  /** Streaming perceptual-dedup intake at stress scale: the Zipf blob
    * corpus ([[zipfDocs]] text as binary payloads — stub-branch hashing,
    * the same arithmetic grade as the fixture) arrives as `nWaves`
    * micro-batches through [[graft.streaming.FingerprintIndex]]. Per
    * wave: wall seconds, shuffle volume, cumulative admissions — against
    * the NAIVE arm (re-hash the ENTIRE cumulative corpus and re-run the
    * full band self-join each wave, the cost a per-session-memo design
    * pays under streaming arrival). The claim on trial: indexed per-wave
    * cost tracks the BATCH (decode is batch-sized, the store is only
    * scanned), while the naive arm's per-wave cost grows with the
    * corpus. Clones (id ≡ 1 mod 100, one late token changed) land one
    * wave after their source, so rejections exercise the cross-batch
    * probe. (Admission counts reject far more than the planted clones:
    * the STUB grid hashes the first 64 payload bytes, so Zipf docs with
    * the same boilerplate header collapse to one signature — an artifact
    * of the stub's window, not of real image decode; the cost curves are
    * the measurement here, not the admission rate.)
    *
    * Measured r13 (20k docs, 11 waves, 32 cores, SAME aHash family both
    * arms): indexed wall FLAT at 3.0–5.0 s/wave (fixed per-batch
    * overhead dominates) while the naive arm grows 1.5 → 21.2 s with
    * the cumulative arrivals, crossing over at wave 4 — the
    * per-batch-cost claim, measured. Part of the naive blow-up is that
    * it re-pairs every ARRIVAL (no admission dedup), so its
    * boilerplate-collapsed buckets grow quadratically (17M candidate
    * pairs by wave 10) — which is precisely the work admission-time
    * dedup exists to avoid; the flat idx column alone carries the
    * per-batch claim.
    */
  private def fpStream(spark: org.apache.spark.sql.SparkSession, nDocs: Int,
      nWaves: Int, reset: () => Unit, shuffle: () => (Double, Double)): Unit = {
    import spark.implicits._
    import graft.streaming.FingerprintIndex
    val root = java.nio.file.Files.createTempDirectory("graft_fp_stress")
    val corpusDir = root.resolve("corpus").toString
    val indexDir = root.resolve("index").toString
    // materialized to parquet, not localCheckpoint: admitBatch sweeps
    // unpinned checkpoint blocks after every wave
    val srcDir = root.resolve("src").toString
    zipfDocs(spark, nDocs)
      .select($"doc_id", $"text".cast("binary").as("blob"))
      .write.parquet(srcDir)
    val blobs = spark.read.schema(FingerprintIndex.blobSchema).parquet(srcDir)
    println(s"== fpstream: $nDocs Zipf blobs over $nWaves waves, indexed vs naive ==")
    var naiveCum = 0L
    (0 until nWaves).foreach { w =>
      val batch = blobs.filter($"doc_id" % nWaves === w)
      val bn = batch.count()
      // indexed arm: the FingerprintIndex admission
      reset()
      val t0 = System.nanoTime()
      FingerprintIndex.admitBatch(batch, corpusDir, indexDir,
        FingerprintIndex.imageHasher)
      val wallIdx = (System.nanoTime() - t0) / 1e9
      val (swIdx, _) = shuffle()
      val admitted = spark.read.schema(FingerprintIndex.blobSchema)
        .parquet(corpusDir).count()
      // naive arm: re-hash the cumulative corpus with the SAME hasher
      // family (aHash — a mismatched hasher would bias the comparison)
      // and run the full band self-join (measure only — admissions come
      // from the indexed arm)
      naiveCum += bn
      val t1 = System.nanoTime()
      val cum = blobs.filter($"doc_id" % nWaves <= w)
      val nPairs = graft.operators.Multimodal.phashPairs(cum)
        .filter($"ham_ahash" <= 7).count()
      val wallNaive = (System.nanoTime() - t1) / 1e9
      println(f"fpstream wave=$w%2d batch=$bn%6d corpus=$admitted%7d " +
        f"idx: wall=$wallIdx%6.2fs shufW=$swIdx%7.1fMB   " +
        f"naive: wall=$wallNaive%6.2fs pairs=$nPairs%6d")
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
    }
  }
}
