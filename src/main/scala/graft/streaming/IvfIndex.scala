package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

/** Incrementally-maintained IVF index — the [[IndexLifecycle]] applied
  * to the coarse-quantizer inverted-list family (q226/q242's production
  * path), closing the r13 verdict gap: the LSH family had [[AnnIndex]],
  * but growing an IVF corpus still required a batch re-assignment pass.
  *
  * The structural position sits BETWEEN the siblings. [[AnnIndex]]'s
  * planes are data-independent, so append-only maintenance is exact
  * forever; [[NearDupIndex]]'s rarity order is a drifting heuristic, so
  * rebuild refreshes it for efficiency only. IVF pivots are
  * DATA-DEPENDENT AND CORRECTNESS-BEARING: an assignment is only
  * comparable to another under the SAME pivot set, and the √n policy
  * (q236 — `Similarity.ivfPolicyNlist/Nprobe`) says the right nlist
  * GROWS with the corpus. So:
  *
  *  - between rebuilds the pivot set is FROZEN in its own store —
  *    incremental assignment of a batch against frozen pivots is EXACT
  *    (bit-equal to what the batch path computes under those pivots;
  *    pinned by IvfIndexSpec). New lower-id arrivals must NOT move the
  *    pivots mid-epoch, which is why pivots are persisted rather than
  *    re-derived from the corpus on every batch;
  *  - rebuild-on-doubling (the NearDupIndex discipline) RE-POLICIES:
  *    fresh n → fresh nlist = ⌊√n⌋, nprobe = ⌈nlist/8⌉, fresh pivot
  *    set, full O(corpus) re-assignment — paid O(log n) times, so
  *    per-admitted-vector cost stays amortized O(1) while per-list
  *    size and candidate fraction track the q236 policy across growth.
  *
  * Stores under `indexDir`:
  *  - `near/` — (vec_id, p_id, rk): the rk ≤ nprobe assignment slice
  *    (the q226-shape relation — rk = 1 IS the m=1 inverted index, the
  *    full slice is the probe set, and q242's ADC stage consumes the
  *    same shape).
  *  - `piv/`  — (p_id, pe): the frozen pivot set of the current epoch.
  *  - `meta/` — (n_vecs at last rebuild, nlist, nprobe, logic_version).
  *
  * Per-batch cost = batch + candidates: the batch assigns against the
  * BROADCAST frozen pivots (nlist·|batch| cosine kernels), the list
  * store is only ever SCANNED against a broadcast of the batch's probe
  * rows, and verification fetches corpus embeddings for candidate
  * partners only — no corpus-sized shuffle anywhere (the all-broadcast
  * probe-plan pin).
  *
  * Crash story identical to the siblings: corpus parquet is the source
  * of truth, stores append after it, pre-probe divergence heal rebuilds
  * ([[IndexLifecycle]] ordering argument).
  */
object IvfIndex extends IndexLifecycle {

  protected def confScope: String = "ivfIndex"

  // rk is INT: row_number's type, preserved by the shared kernel
  val nearSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("p_id", LongType),
    StructField("rk", IntegerType)))

  val pivSchema: StructType = StructType(Seq(
    StructField("p_id", LongType),
    StructField("pe", ArrayType(FloatType))))

  /** embeddings-shaped schema for streaming file sources and store reads. */
  val vecSchema: StructType = AnnIndex.vecSchema

  private def metaRow(spark: SparkSession,
      indexDir: String): Option[(Long, Int, Int, String)] =
    metaRowRaw(spark, indexDir)
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))

  private def writeMeta(spark: SparkSession, indexDir: String, n: Long,
      nlist: Int, nprobe: Int): Unit = {
    import spark.implicits._
    Seq((n, nlist, nprobe, graft.operators.Similarity.ivfLogicVersion))
      .toDF("n_vecs", "nlist", "nprobe", "logic_version").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/meta")
  }

  /** The current epoch's frozen (nlist, nprobe) — q236-policy values
    * stamped at the last rebuild (fallback to the policy of n=0 for a
    * store that has never rebuilt).
    */
  private def epochParams(spark: SparkSession, indexDir: String): (Int, Int) =
    metaRow(spark, indexDir).map { case (_, nl, np, _) => (nl, np) }
      .getOrElse {
        val nl = graft.operators.Similarity.ivfPolicyNlist(0L)
        (nl, graft.operators.Similarity.ivfPolicyNprobe(nl))
      }

  /** Candidate (corpus, batch) pairs from probing the persisted m=1
    * lists with a batch's probe assignments: the batch assigns against
    * the BROADCAST frozen pivots, then the rk = 1 list store is scanned
    * once against a broadcast of the batch's probe rows (the q226
    * candidate shape at micro-batch grain). No distinct needed on the
    * store side (m=1: each corpus vector sits in exactly one list), but
    * a batch vector probes nprobe lists, so pairs dedup.
    */
  def candidatePairs(spark: SparkSession, indexDir: String,
      batchNear: DataFrame): DataFrame = {
    import spark.implicits._
    val store = readOrEmpty(spark, s"$indexDir/near", nearSchema)
    val lists = store.filter($"rk" === 1).select($"vec_id".as("a_id"), $"p_id")
    lists.join(broadcast(batchNear.select($"vec_id".as("b_id"), $"p_id")),
        Seq("p_id"))
      .filter($"a_id" =!= $"b_id")
      .select($"a_id", $"b_id")
      .distinct()
  }

  /** Plan view for the cost-shape pin: the full per-batch probe (assign
    * against frozen pivots → candidates → cosine verify), no writes,
    * fully symbolic so the joins stay visible in the explained plan.
    */
  private[graft] def batchProbePlan(spark: SparkSession, indexDir: String,
      corpusDir: String, batch: DataFrame, maxCosine: Double): DataFrame = {
    val (_, nprobe) = epochParams(spark, indexDir)
    val piv = readOrEmpty(spark, s"$indexDir/piv", pivSchema)
    val bn = graft.operators.Similarity.ivfNearOf(
      batch.select(col("vec_id"), col("embedding")), piv, nprobe)
    cosineRejectedIds(spark, corpusDir, vecSchema, batch,
      candidatePairs(spark, indexDir, bn), maxCosine)
  }

  /** Full index (re)derivation from the corpus store — bootstrap,
    * doubling RE-POLICY, compaction, crash recovery. Derives fresh
    * q236-policy parameters from the CURRENT corpus size, freezes the
    * fresh pivot set, and re-assigns everything: one O(corpus·nlist)
    * pass, paid O(log n) times under the doubling trigger.
    */
  /** Pivot source for rebuilds: `spark.graft.ivfIndex.trainedPivots`
    * (default false = q226's lowest-vec_id pivots). When true, each
    * rebuild TRAINS the epoch's pivots (q245's frozen-integer Lloyd, 64
    * points per centroid, 8 iterations) and freezes the centroids as
    * the `piv/` payload. Assignment stays the cosine [[ivfNearOf]]
    * kernel either way — validated by the `ScaleEvidence ann`
    * spherical arm: cosine-ranked assignment against trained centroids
    * matches the gated q245 integer-L2 form's recall at every rung of
    * 64× growth (73/85/97/105 vs 73/82/94/106 of 160), because cosine
    * is scale-invariant in the pivot. The flag only steers the NEXT
    * rebuild; probes always rank against the FROZEN stored payload, so
    * epochs stay internally consistent whatever the flag does later.
    */
  private def trainedPivots(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.ivfIndex.trainedPivots")
      .exists(_.toBoolean)

  def rebuild(spark: SparkSession, corpusDir: String, indexDir: String): Long = {
    import spark.implicits._
    val corpus = readOrEmpty(spark, corpusDir, vecSchema)
      .select($"vec_id", $"embedding")
    val n = corpus.count()
    val nlist = graft.operators.Similarity.ivfPolicyNlist(n)
    val nprobe = graft.operators.Similarity.ivfPolicyNprobe(nlist)
    val piv = (if (trainedPivots(spark))
      graft.operators.Similarity.trainedCoarsePivots(corpus, nlist)
    else graft.operators.Similarity.ivfPivotsOf(corpus, nlist))
      .localCheckpoint()
    piv.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/piv")
    // meta BEFORE the near store (review finding): if it were last, a
    // crash between the near write and the meta write would leave
    // matching counts under a missing/stale meta — the next batch
    // would re-stamp first-touch params (nlist=4, nprobe=1) and probe
    // a wide store far too narrowly, admitting near-dups the store can
    // see. Written in this order, EVERY crash window leaves the near
    // count diverged from the corpus count (or, for a pure-compaction
    // rebuild, leaves the deterministic old store, which is the same
    // relation), so the pre-probe heal catches it.
    writeMeta(spark, indexDir, n, nlist, nprobe)
    val near = graft.operators.Similarity.ivfNearOf(corpus, piv, nprobe)
      .localCheckpoint()
    near.coalesce(compactFiles(spark, n)).write.mode("overwrite")
      .parquet(s"$indexDir/near")
    org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
    n
  }

  /** One micro-batch of IVF-indexed admission: reject batch vectors with
    * an indexed cosine neighbor >= maxCosine among their IVF candidates,
    * append survivors to the corpus AND their frozen-pivot assignments
    * to the list store; RE-POLICY rebuild when the corpus has doubled
    * since the last snapshot (which also bootstraps a first-touch or
    * pre-existing-corpus intake — the rebuild re-derives this batch's
    * rows too, so the incremental append is skipped that batch).
    * In-batch near-dups are both admitted; replay-safe via the exact id
    * anti-join, as in the siblings.
    */
  def admitBatch(batch: DataFrame, corpusDir: String, indexDir: String,
      maxCosine: Double = 0.92): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // ONE meta read serves the guard and the first-touch stamp (the
    // hot-path meta chatter the review flagged); it is re-read only
    // after a heal can have rewritten it.
    val meta0 = metaRow(spark, indexDir)
    meta0.foreach { case (_, _, _, v) =>
      require(v == graft.operators.Similarity.ivfLogicVersion,
        s"index at $indexDir was built with IVF version $v, this code is " +
          s"${graft.operators.Similarity.ivfLogicVersion} — rebuild() required")
    }
    if (meta0.isEmpty) {
      val nl = graft.operators.Similarity.ivfPolicyNlist(0L)
      writeMeta(spark, indexDir, 0L, nl,
        graft.operators.Similarity.ivfPolicyNprobe(nl))
    }
    // Pre-probe self-heal ([[IndexLifecycle.healIfNeeded]] — ordering
    // argument in the trait doc). Both probes are metadata reads.
    val preIdxCount = readOrEmpty(spark, s"$indexDir/near", nearSchema)
      .select($"vec_id").distinct().count()
    val preCorpusCount = readOrEmpty(spark, corpusDir, vecSchema).count()
    var healed = false
    healIfNeeded(spark, preCorpusCount, preIdxCount,
        Seq(s"$indexDir/near")) {
      rebuild(spark, corpusDir, indexDir); healed = true
    }
    // the post-heal epoch: re-read only if the heal rewrote it
    val meta1 = if (healed || meta0.isEmpty) metaRow(spark, indexDir) else meta0
    val lastN = meta1.map(_._1).getOrElse(0L)
    val nprobe = meta1.map(_._3).getOrElse(
      graft.operators.Similarity.ivfPolicyNprobe(
        graft.operators.Similarity.ivfPolicyNlist(0L)))
    val existingIds = readOrEmpty(spark, corpusDir, vecSchema).select($"vec_id")
    val idHits = existingIds
      .join(broadcast(batch.select($"vec_id")), Seq("vec_id")).distinct()
    // in-batch exact-id dedup — same rationale and winner rule as
    // [[AnnIndex.admitBatch]] (a duplicated vec_id in one batch would
    // wedge the row-vs-distinct heal into perpetual rebuilds)
    val fresh = batch.join(broadcast(idHits), Seq("vec_id"), "left_anti")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"vec_id")
          .orderBy(xxhash64($"embedding"), $"label")))
      .filter($"rk" === 1)
      .select($"vec_id", $"embedding", $"label")
      .localCheckpoint()
    val piv = readOrEmpty(spark, s"$indexDir/piv", pivSchema).localCheckpoint()
    val batchNear = graft.operators.Similarity
      .ivfNearOf(fresh.select($"vec_id", $"embedding"), piv, nprobe)
      .localCheckpoint()
    val rejected = cosineRejectedIds(spark, corpusDir, vecSchema, fresh,
      candidatePairs(spark, indexDir, batchNear).localCheckpoint(), maxCosine)
    val admitted = fresh.join(broadcast(rejected), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    val nAdmitted = admitted.count()
    admitted.write.mode("append").parquet(corpusDir)
    // RE-POLICY trigger (post-append, so the rebuild sees this batch):
    // doubling since the last snapshot re-derives nlist/nprobe/pivots
    // and every assignment — the incremental append is skipped, the
    // rebuild already indexed the admitted rows. corpusTotal is derived
    // (pre-heal count + this batch's admissions — fresh ids are by
    // construction absent from the corpus), not a second full count.
    val corpusTotal = preCorpusCount + nAdmitted
    if (corpusTotal >= 2L * math.max(1L, lastN)) {
      rebuild(spark, corpusDir, indexDir)
    } else {
      val admittedNear = batchNear
        .join(broadcast(admitted.select($"vec_id")), Seq("vec_id"))
        .localCheckpoint()
      admittedNear.repartition(appendWriters(spark, nAdmitted), $"p_id")
        .write.mode("append").parquet(s"$indexDir/near")
      compactIfOverCap(spark, Seq(s"$indexDir/near")) {
        rebuild(spark, corpusDir, indexDir)
      }
    }
    org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
  }

  /** The IVF-indexed admission policy as a continuous query — the
    * [[AnnIndex.annIntakeIndexed]] sibling for the inverted-list family.
    */
  def ivfIntakeIndexed(spark: SparkSession, srcDir: String,
      corpusDir: String, indexDir: String, checkpointDir: String,
      maxCosine: Double = 0.92,
      glob: String = "embeddings.parquet"): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(vecSchema)
      .option("pathGlobFilter", glob)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        admitBatch(batch, corpusDir, indexDir, maxCosine)
      }
      .start()
}
