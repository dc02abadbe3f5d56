package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the two-stage IVF near-dup (q48) against the brute-force baseline
  * (q46): precision must be exactly 1.0 (stage-2 verification is exact, so
  * every emitted pair is a true pair with the identical cosine value), and
  * recall on this fixture's random-tail pairs is pinned at its measured
  * floor — the documented IVF tradeoff, not an accident.
  */
class SimilaritySpec extends AnyFunSuite with SparkSpec {

  test("q48 IVF near-dup: precision 1.0 against brute q46, recall pinned") {
    val brute = Similarity.embeddingNeardupAllPairs(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.q48IvfNeardup(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // precision: every IVF pair is a brute pair with the identical score
    ivf.foreach { case (k, cs) =>
      assert(brute.contains(k), s"spurious pair $k")
      assert(brute(k) == cs, s"cosine mismatch for $k: ${brute(k)} vs $cs")
    }
    // recall floor: >= 70% of the brute pairs at this SF (measured 5/7;
    // these pairs sit at cs 0.45-0.52 in a 0.40-mode random background,
    // where no sublinear prefilter is lossless)
    assert(brute.nonEmpty)
    val recall = ivf.size.toDouble / brute.size
    assert(recall >= 0.7, s"recall $recall (${ivf.size}/${brute.size})")
  }

  test("q193 mutual pairs replay from a driver-side fold over the multi-table index") {
    // independent route: collect the tuned index's (vec_id, tbl, bucket)
    // rows, form candidate sets serially, score with the same sequential
    // double fold the native CosineSimilarity expression uses, take each
    // anchor's (cs desc, id asc) argmax, keep reciprocal pairs.
    val buckets = Similarity.lshMultiBuckets(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("tbl"), r.getAs[Long]("bucket")))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCell: Seq[Seq[Long]] =
      buckets.toSeq.groupBy(t => (t._2, t._3)).values.toSeq.map(_.map(_._1))
    val cands: Set[(Long, Long)] = byCell.flatMap(cell =>
      for (x <- cell; y <- cell if x != y) yield (x, y)).toSet // multi-table co-occurrences score once
    val nn = cands.groupBy(_._1).flatMap { case (a, ps) =>
      val scored = ps.toSeq.map { case (_, b) => (b, cos(emb(a), emb(b))) }
        .filterNot(t => t._2.isNaN)
      if (scored.isEmpty) None
      else Some(a -> scored.minBy { case (b, cs) => (-cs, b) })
    }
    val expected = nn.collect {
      case (a, (b, cs)) if a < b && nn.get(b).exists(_._1 == a) => (a, b, cs)
    }.toSet
    val got = Similarity.q193MutualNn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cs"))).toSet
    assert(got == expected, s"got ${got.size} expected ${expected.size} pairs")
    assert(got.nonEmpty, "fixture must produce mutual pairs")
    // mutuality makes pairs a matching: every id appears at most once
    val ids = got.toSeq.flatMap(p => Seq(p._1, p._2))
    assert(ids.distinct.size == ids.size, "a vector joined two mutual pairs")
  }

  test("q236: policy parameters derive from the corpus count, histogram complete, recall held") {
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val nlist = Similarity.ivfPolicyNlist(n)
    val nprobe = Similarity.ivfPolicyNprobe(nlist)
    assert(nlist == math.max(4, math.sqrt(n.toDouble).toInt))
    assert(nprobe == math.max(1, (nlist + 7) / 8))
    val rows = Similarity.q236IvfPolicyRecall(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("nlist") == nlist.toLong, "nlist column")
      assert(r.getAs[Long]("nprobe") == nprobe.toLong, "nprobe column")
    }
    // the histogram partitions the whole panel
    assert(rows.map(_.getAs[Long]("n_queries")).sum == 32L)
    // the policy's whole point: recall comparable to the fixed-sweep
    // point — most of the panel recovers at least one true neighbor
    val withHit = rows.filter(_.getAs[Long]("hits") > 0L)
      .map(_.getAs[Long]("n_queries")).sum
    assert(withHit >= 24L, s"policy recall collapsed: $withHit/32 queries with a hit")
  }

  test("q50 typed-UDAF centroids agree bit-for-bit with q36 column form") {
    val q36 = Similarity.q36LabelCentroids(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val q50 = Similarity.q50CentroidUdaf(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(q50.keySet == q36.keySet)
    q50.foreach { case (k, c) =>
      assert(q36(k) == c, s"centroid mismatch at $k: ${q36(k)} vs $c")
    }
  }

  test("q75 semantic dedup: planted clusters give hand-computed verdicts") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    def v(xs: Double*): Array[Float] = (xs.map(_.toFloat) ++ Seq.fill(6)(0f)).toArray
    // cluster 0: v1 duplicates v0 exactly (cs=1); v2 orthogonal (kept);
    //   v3 at cs=0.8 to v0/v1 and 0.6 to v2 -> dropped, earliest dup v0,
    //   strongest similarity 0.8. cluster 1: opposite vectors (cs=-1), both
    //   kept — and never compared against cluster 0's identical v4 twin.
    val rows = Seq(
      (0L, v(1, 0), 0), (1L, v(1, 0), 0), (2L, v(0, 1), 0), (3L, v(0.8, 0.6), 0),
      (4L, v(1, 0), 1), (5L, v(-1, 0), 1))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = Similarity.q75SemanticDedup(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.size == 6)
    val expected = Map( // vec_id -> (dropped, dup_of, max_cs)
      0L -> (false, -1L, 0.0), 1L -> (true, 0L, 1.0), 2L -> (false, -1L, 0.0),
      3L -> (true, 0L, 0.8), 4L -> (false, -1L, 0.0), 5L -> (false, -1L, 0.0))
    expected.foreach { case (id, (dropped, dupOf, maxCs)) =>
      val row = r(id)
      assert(row.getAs[Boolean]("dropped") == dropped, s"dropped($id)")
      assert(row.getAs[Long]("dup_of") == dupOf, s"dup_of($id)")
      assert(math.abs(row.getAs[Double]("max_cs") - maxCs) < 1e-6, s"max_cs($id)")
    }
  }

  test("q75 semantic dedup: verdict invariants on the fixture corpus") {
    val rows = Similarity.q75SemanticDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val id = row.getAs[Long]("vec_id")
      if (row.getAs[Boolean]("dropped")) {
        assert(row.getAs[Long]("dup_of") >= 0 && row.getAs[Long]("dup_of") < id)
        assert(row.getAs[Double]("max_cs") >= 0.45)
      } else {
        assert(row.getAs[Long]("dup_of") == -1L)
        assert(row.getAs[Double]("max_cs") == 0.0)
      }
    }
  }

  test("q77 semantic clusters: exact match against union-find over q48 pairs") {
    val pairs = Similarity.q48IvfNeardup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // reference components via driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.groupBy(find)
    val expected = members.flatMap { case (_, vs) =>
      val rep = vs.min
      vs.map(v => v -> (rep, vs.size.toLong))
    }
    val got = Similarity.q77SemanticClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, s"clusters differ: got $got expected $expected")
  }

  test("q89 embedding health: hand-computed moments and collapsed flag on planted vectors") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_health").toString
    // dim 0: values 1,3 -> mean 2, var 1, range [1,3]
    // dim 1: constant 0 -> collapsed (var 0)
    // dim 2: values 2,4 -> mean 3, var 1, range [2,4]
    val rows = Seq(
      (0L, Array(1f, 0f, 2f), 0),
      (1L, Array(3f, 0f, 4f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = Similarity.q89EmbeddingHealth(spark, d).collect()
      .map(x => x.getAs[Long]("d") ->
        ((x.getAs[Long]("n"), x.getAs[Double]("mean"), x.getAs[Double]("variance"),
          x.getAs[Double]("min_v"), x.getAs[Double]("max_v"),
          x.getAs[Boolean]("collapsed")))).toMap
    assert(r == Map(
      0L -> ((2L, 2.0, 1.0, 1.0, 3.0, false)),
      1L -> ((2L, 0.0, 0.0, 0.0, 0.0, true)),
      2L -> ((2L, 3.0, 1.0, 2.0, 4.0, false))))
  }

  test("q89 embedding health: every dimension accounts for every vector at sfDir") {
    val rows = Similarity.q89EmbeddingHealth(spark, sfDir).collect()
    val nVecs = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == nVecs)
      // fixed-point variance can round microscopically below zero only if
      // a dimension is constant; real data sits clearly positive
      assert(r.getAs[Double]("variance") > 0)
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("mean"))
      assert(r.getAs[Double]("mean") <= r.getAs[Double]("max_v"))
    }
  }

  test("q82 centroid assignment: planted clusters classify to the nearest axis") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_assign").toString
    def v(xs: Double*): Array[Float] = (xs.map(_.toFloat) ++ Seq.fill(6)(0f)).toArray
    // label 0 centroid = (1, 1/3) (v0/v1 straddle e1, mislabeled v5 drags
    // it up); label 1 centroid = (1/3, 2/3) (v2/v3 straddle e2, mislabeled
    // v4 drags it right). Both mislabeled vectors land nearer the OTHER
    // label's centroid (18.4 deg vs 26.6+ deg), so the assignment flags
    // exactly them.
    val rows = Seq(
      (0L, v(1, 0.1), 0), (1L, v(1, -0.1), 0),
      (2L, v(0.1, 1), 1), (3L, v(-0.1, 1), 1),
      (4L, v(1, 0), 1),
      (5L, v(1, 1), 0))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = Similarity.q82CentroidAssign(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getBoolean(4)))).toMap
    assert(r.size == 6)
    // centroids: label0 = mean{(1,.1),(1,-.1),(1,1)} = (1, 1/3); label1 =
    // mean{(.1,1),(-.1,1),(1,0)} = (1/3, 2/3). v0/v1 -> 0, v2/v3 -> 1.
    assert(r(0L) == ((0L, 0L, true)) && r(1L) == ((0L, 0L, true)))
    assert(r(2L) == ((1L, 1L, true)) && r(3L) == ((1L, 1L, true)))
    // both mislabeled vectors are caught by the assignment
    assert(r(4L)._2 == 0L && !r(4L)._3, "v4 must be predicted into cluster 0")
    assert(r(5L)._2 == 1L && !r(5L)._3, "v5 must be predicted into cluster 1")
  }

  test("q82 centroid assignment: one verdict per vector, scores in [-1, 1]") {
    val rows = Similarity.q82CentroidAssign(spark, sfDir).collect()
    val n = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(rows.length == n)
    rows.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
    }
  }

  test("q64 int8 quantization: exact error accounting on planted vectors") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_quant").toString
    // label 0: components 0.5/127 -> vd=0.5, q=1 (HALF_UP), err=-0.5
    //          components 1.0     -> vd=127, q=127, err=0
    // label 1: 2.0 -> vd=254 clamps to q=127, err=127 -> max_abs 127
    val rows = Seq(
      (0L, Array.fill(32)(0.5f / 127) ++ Array.fill(32)(1.0f), 0),
      (1L, Array.fill(64)(2.0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = Similarity.q64QuantizeEmbeddings(spark, d)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Long]("n_components") == 64L)
    // float 0.5f/127 widened to double * 127 is ~0.5 up to float rounding
    assert(math.abs(r(0L).getAs[Double]("max_abs_err") - 0.5) < 1e-6)
    // 32 components at err ~0.5 + 32 at 0 -> mse ~ 32*0.25/64 = 0.125
    assert(math.abs(r(0L).getAs[Double]("mse") - 0.125) < 1e-6)
    assert(r(1L).getAs[Double]("max_abs_err") == 127.0)
  }

  test("q204: greedy k-center replays exhaustively; coverage radius non-increasing") {
    import spark.implicits._
    val got = Similarity.q204KcenterCoreset(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("sel_dist2")))
    // independent driver-side replay of the quantize + farthest-first fold
    val vs = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x * 1024.0).toLong).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var centers = Vector((vs.head._1, vs.head._2, 0L))
    var md = vs.map { case (id, v) => id -> d2(v, vs.head._2) }.toMap
    for (_ <- 2 to 5) {
      val (fid, fd) = md.toSeq.maxBy { case (id, d) => (d, -id) }
      val fv = vs.find(_._1 == fid).get._2
      centers :+= ((fid, fv, fd))
      md = md.map { case (id, d) =>
        id -> math.min(d, d2(vs.find(_._1 == id).get._2, fv)) }
    }
    val expected = centers.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1L, id, d) }
    assert(got.toSeq == expected)
    // rounds 2..5 carry the shrinking coverage radius of the prefix
    val radii = got.filter(_._1 >= 2).sortBy(_._1).map(_._3).toSeq
    assert(radii == radii.sortBy(-_),
      s"coverage radius must be non-increasing: $radii")
  }

  test("q217: recall histogram replays from a driver-side scalar pipeline") {
    // independent replay: panel by driver-side md5 order, exact top-5 and
    // in-bucket top-5 by plain-Scala cosine with the SAME sequential
    // accumulation as the codegen kernel (bit-identical doubles), overlap
    // histogram compared to the distributed query
    val got = Similarity.q217AnnRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hits") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("a_checksum")))).toMap
    val wv = Similarity.lshVectors(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bucket"),
        r.getAs[Seq[Float]]("embedding").toArray))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val panel = wv.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(32).toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def top5(aId: Long, av: Array[Float], cands: Seq[(Long, Array[Float])]): Set[Long] =
      cands.filter(_._1 != aId)
        .map { case (bId, bv) => (bId, cos(av, bv)) }
        .filterNot(t => t._2.isNaN)
        .sortBy { case (bId, cs) => (-cs, bId) }.take(5).map(_._1).toSet
    val all = wv.map(t => (t._1, t._3)).toSeq
    val byBucket = wv.groupBy(_._2).view.mapValues(_.map(t => (t._1, t._3)).toSeq).toMap
    val expected = panel.toSeq.map { aId =>
      val (_, bkt, av) = wv.find(_._1 == aId).get
      aId -> (top5(aId, av, all) intersect top5(aId, av, byBucket(bkt))).size.toLong
    }.groupBy(_._2).map { case (h, qs) =>
      h -> ((qs.size.toLong, qs.map(_._1).sum))
    }
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.map(_._1).sum == 32L, "histogram must cover the full panel")
  }

  test("q221: multi-probe recall replays driver-side and dominates single-probe per query") {
    val got = Similarity.q221MultiProbeRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hits") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("a_checksum")))).toMap
    val wv = Similarity.lshVectors(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("bucket"),
        r.getAs[Seq[Float]]("embedding").toArray))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val panel = wv.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(32).toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def top5(aId: Long, av: Array[Float], cands: Seq[(Long, Array[Float])]): Set[Long] =
      cands.filter(_._1 != aId)
        .map { case (bId, bv) => (bId, cos(av, bv)) }
        .filterNot(t => t._2.isNaN)
        .sortBy { case (bId, cs) => (-cs, bId) }.take(5).map(_._1).toSet
    val all = wv.map(t => (t._1, t._3)).toSeq
    val byBucket = wv.groupBy(_._2).view.mapValues(_.map(t => (t._1, t._3)).toSeq).toMap
    val perQuery = panel.toSeq.map { aId =>
      val (_, bkt, av) = wv.find(_._1 == aId).get
      val exact = top5(aId, av, all)
      val single = (exact intersect top5(aId, av, byBucket(bkt))).size.toLong
      val probes = bkt +: (0 until 8).map(h => bkt ^ (1L << h))
      val cands = probes.flatMap(b => byBucket.getOrElse(b, Seq.empty))
      val multi = (exact intersect top5(aId, av, cands)).size.toLong
      (aId, single, multi)
    }
    val expected = perQuery.groupBy(_._3).map { case (h, qs) =>
      h -> ((qs.size.toLong, qs.map(_._1).sum))
    }
    assert(got == expected, s"got $got expected $expected")
    // superset candidates can never evict a true neighbor from the ANN
    // top-5 (at most 4 vectors outscore a true top-5 member), so
    // multi-probe hits dominate single-probe hits for EVERY query
    perQuery.foreach { case (a, s, m) =>
      assert(m >= s, s"query $a lost recall going multi-probe: $s -> $m") }
    // and the widening must actually buy something on this fixture
    assert(perQuery.map(_._3).sum > perQuery.map(_._2).sum,
      "multi-probe should strictly improve total recall here")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def cosD(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def top5Of(aId: Long, av: Array[Float],
      cands: Seq[(Long, Array[Float])]): Set[Long] =
    cands.filter(_._1 != aId)
      .map { case (bId, bv) => (bId, cosD(av, bv)) }
      .filterNot(_._2.isNaN)
      .sortBy { case (bId, cs) => (-cs, bId) }.take(5).map(_._1).toSet

  test("q225: table 0 of the multi-table index IS the single-table index, " +
      "and tuned recall dominates q221 per query") {
    val single = Similarity.lshVectors(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val multi = Similarity.lshMultiBuckets(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("tbl"), r.getAs[Long]("bucket")))
    // seeding pin: plane p = tbl*8 + h means table 0 replays lshVectors
    multi.filter(_._2 == 0L).foreach { case (v, _, b) =>
      assert(single(v) == b, s"vec $v: table-0 bucket $b != single-table ${single(v)}")
    }
    assert(multi.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // per-query dominance: q225's candidate set per query is a SUPERSET
    // of q221's (same Hamming-1 probes on table 0, plus 3 more tables),
    // and superset candidates cannot evict a true top-5 neighbor
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    val panel = emb.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(32)
    val all = emb.toSeq
    val byTblBucket = multi.groupBy(t => (t._2, t._3))
      .view.mapValues(_.map(t => (t._1, emb(t._1))).toSeq).toMap
    val singleByBucket = single.toSeq.groupBy(_._2)
      .view.mapValues(_.map(t => (t._1, emb(t._1)))).toMap
    val perQuery = panel.map { aId =>
      val av = emb(aId)
      val exact = top5Of(aId, av, all)
      val sb = single(aId)
      val probes1 = sb +: (0 until 8).map(h => sb ^ (1L << h))
      val c221 = probes1.flatMap(b => singleByBucket.getOrElse(b, Seq.empty))
      val c225 = multi.filter(_._1 == aId).flatMap { case (_, tbl, b) =>
        (b +: (0 until 8).map(h => b ^ (1L << h)))
          .flatMap(pb => byTblBucket.getOrElse((tbl, pb), Seq.empty))
      }.distinctBy(_._1)
      val h221 = (exact intersect top5Of(aId, av, c221)).size.toLong
      val h225 = (exact intersect top5Of(aId, av, c225)).size.toLong
      (aId, h221, h225)
    }
    val got = Similarity.q225LshTunedRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hits") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("a_checksum")))).toMap
    val expected = perQuery.groupBy(_._3).map { case (h, qs) =>
      h -> ((qs.size.toLong, qs.map(_._1).sum))
    }
    assert(got == expected, s"got $got expected $expected")
    perQuery.foreach { case (a, s, m) =>
      assert(m >= s, s"query $a lost recall going multi-table: $s -> $m") }
    assert(perQuery.map(_._3).sum > perQuery.map(_._2).sum,
      "the tuned index should strictly improve total recall here")
  }

  test("q226: IVF recall histogram replays driver-side (m=1 lists, 8-probe queries)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    val pivots = emb.keys.toSeq.sorted.take(64).map(id => id -> emb(id))
    def ranked(v: Array[Float]): Seq[Long] =
      pivots.map { case (pid, pv) => (pid, cosD(v, pv)) }
        .sortBy { case (pid, cs) => (-cs, pid) }.map(_._1)
    val idx = emb.toSeq.map { case (id, v) => id -> ranked(v).head }
    val byList = idx.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val panel = emb.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(32)
    val all = emb.toSeq
    val perQuery = panel.map { aId =>
      val av = emb(aId)
      val exact = top5Of(aId, av, all)
      val cands = ranked(av).take(8)
        .flatMap(p => byList.getOrElse(p, Seq.empty))
        .map(id => (id, emb(id)))
      aId -> (exact intersect top5Of(aId, av, cands)).size.toLong
    }
    val got = Similarity.q226IvfRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hits") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("a_checksum")))).toMap
    val expected = perQuery.groupBy(_._2).map { case (h, qs) =>
      h -> ((qs.size.toLong, qs.map(_._1).sum))
    }
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.map(_._1).sum == 32L, "histogram must cover the full panel")
  }

  test("q227: scorecard equals the rollup of the nine recall histograms") {
    def hist(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("hits"), r.getAs[Long]("n_queries"))).toSeq
    val parts = Map(
      "lsh_single" -> hist(Similarity.q217AnnRecall(spark, sfDir)),
      "lsh_multiprobe" -> hist(Similarity.q221MultiProbeRecall(spark, sfDir)),
      "lsh_tuned" -> hist(Similarity.q225LshTunedRecall(spark, sfDir)),
      "ivf" -> hist(Similarity.q226IvfRecall(spark, sfDir)),
      "ivf_trained" -> hist(Similarity.q245IvfTrainedRecall(spark, sfDir)),
      "pq" -> hist(Similarity.q239PqAdcRecall(spark, sfDir)),
      "pq_trained" -> hist(Similarity.q244TrainedPqRecall(spark, sfDir)),
      "ivfpq" -> hist(Similarity.q242IvfPqRecall(spark, sfDir)),
      "ivfpq_trained" -> hist(Similarity.q246TrainedIvfPqRecall(spark, sfDir)))
    val got = Similarity.q227AnnScorecard(spark, sfDir).collect().map { r =>
      r.getAs[String]("method") -> ((r.getAs[Long]("hits_total"),
        r.getAs[Long]("queries_with_hit"), r.getAs[Long]("n_queries"),
        r.getAs[Long]("recall_bp")))
    }.toMap
    assert(got.keySet == parts.keySet)
    parts.foreach { case (m, h) =>
      val hitsTotal = h.map { case (k, n) => k * n }.sum
      val qHit = h.collect { case (k, n) if k > 0 => n }.sum
      val n = h.map(_._2).sum
      assert(got(m) == ((hitsTotal, qHit, n, hitsTotal * 10000 / (n * 5))),
        s"method $m: ${got(m)} vs ($hitsTotal, $qHit, $n)")
      assert(n == 32L, s"method $m histogram must cover the panel")
    }
  }

  test("q230: hard negatives sit strictly below the near-dup band, ranks replay") {
    val rows = Similarity.q230HardNegatives(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neg_id"), r.getAs[Double]("cs")))
    assert(rows.nonEmpty, "the sub-threshold band must be populated here")
    rows.foreach { case (v, _, n, cs) =>
      assert(cs < 0.45, s"($v,$n) cs=$cs is a near-dup, not a negative")
      assert(v != n, "anchor can never be its own negative")
    }
    // ranks are dense 1..k per anchor and ordered by (cs desc, neg_id)
    rows.groupBy(_._1).foreach { case (v, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rs.length.toLong), s"anchor $v ranks")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
            s"anchor $v rank order broken: $a then $b")
        case _ =>
      }
    }
    // no emitted negative may be a verified near-dup pair (q48's output)
    val dups = Similarity.q48IvfNeardup(spark, sfDir).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    rows.foreach { case (v, _, n, _) =>
      assert(!dups.contains((v, n)), s"($v,$n) is a verified near-dup") }
  }

  test("q239: PQ-ADC recall histogram replays driver-side " +
      "(16x4-dim subspaces, 16-centroid codebook, frozen LUT)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    // the engine's arithmetic, replayed serially: double accumulation
    // left-to-right everywhere, squared-L2 argmin ties to the lowest
    // c_id, LUT frozen at 1e12, integer ADC sums
    def norm2(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }; s
    }
    val nv = emb.toSeq.collect { case (id, v) if norm2(v) > 0 =>
      val n = math.sqrt(norm2(v))
      id -> v.map(_.toDouble / n)
    }.toMap
    def sqd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    def sliceOf(v: Array[Double], m: Int): Array[Double] = v.slice(m * 4, m * 4 + 4)
    val cents = nv.keys.toSeq.sorted.take(16).zipWithIndex
      .map { case (id, i) => (i + 1) -> nv(id) }
    def codeOf(v: Array[Double], m: Int): Int =
      cents.map { case (c, cv) => (c, sqd(sliceOf(v, m), sliceOf(cv, m))) }
        .minBy { case (c, d) => (d, c) }._1
    val codes = nv.map { case (id, v) => id -> (0 until 16).map(codeOf(v, _)) }
    val panel = emb.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(32)
    val all = emb.toSeq
    val perQuery = panel.map { aId =>
      val hits: Long =
        if (!nv.contains(aId)) 0L
        else {
          val exact = top5Of(aId, emb(aId), all)
          val av = nv(aId)
          val lut = (for { m <- 0 until 16; (c, cv) <- cents } yield
            (m, c) -> math.floor(sqd(sliceOf(av, m), sliceOf(cv, m)) * 1e12).toLong).toMap
          val ann = codes.toSeq.filter(_._1 != aId)
            .map { case (bId, cs) =>
              (bId, cs.zipWithIndex.map { case (c, m) => lut((m, c)) }.sum) }
            .sortBy { case (bId, d) => (d, bId) }.take(5).map(_._1).toSet
          (exact intersect ann).size.toLong
        }
      aId -> hits
    }
    val got = Similarity.q239PqAdcRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hits") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("a_checksum")))).toMap
    val expected = perQuery.groupBy(_._2).map { case (h, qs) =>
      h -> ((qs.size.toLong, qs.map(_._1).sum))
    }
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.map(_._1).sum == 32L, "histogram must cover the full panel")
    // the compression tier must beat chance: with 4-byte codes some of
    // the panel still recovers true neighbors on this fixture
    assert(got.filter(_._1 > 0L).values.map(_._1).sum >= 1L,
      "PQ recall collapsed to zero across the whole panel")
  }

  test("q244: trained-PQ recall histogram replays driver-side " +
      "(frozen-integer Lloyd, 1024-sample, 8 iterations)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    def norm2(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }; s
    }
    val nv = emb.toSeq.collect { case (id, v) if norm2(v) > 0 =>
      val n = math.sqrt(norm2(v))
      id -> v.map(_.toDouble / n)
    }.toMap
    // the engine's arithmetic replayed serially: coordinates frozen to
    // BIGINT at 1e6, squared-L2 and centroid means entirely in Long
    // space (Scala Long `/` truncates toward zero exactly as Spark
    // `div`), argmin ties to the lowest c_id, empty clusters keep
    // their previous centroid
    def fsub(v: Array[Double], m: Int): Array[Long] =
      v.slice(m * 4, m * 4 + 4).map(x => math.floor(x * 1e6).toLong)
    def isq(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val ids = nv.keys.toSeq.sorted
    val sampIds = ids.take(1024)
    var cent: Map[(Int, Int), Array[Long]] = (for {
      (id, i) <- ids.take(16).zipWithIndex
      m <- 0 until 16
    } yield (m, i + 1) -> fsub(nv(id), m)).toMap
    for (_ <- 1 to 8) {
      val asg = for { id <- sampIds; m <- 0 until 16 } yield {
        val fs = fsub(nv(id), m)
        val c = (1 to 16).map(c => (c, isq(fs, cent((m, c)))))
          .minBy { case (ci, d) => (d, ci) }._1
        ((m, c), fs)
      }
      val upd = asg.groupBy(_._1).map { case (k, rows) =>
        k -> Array.tabulate(4)(d => rows.map(_._2(d)).sum / rows.size)
      }
      cent = cent.map { case (k, old) => k -> upd.getOrElse(k, old) }
    }
    def codeOf(v: Array[Double], m: Int): Int =
      (1 to 16).map(c => (c, isq(fsub(v, m), cent((m, c)))))
        .minBy { case (c, d) => (d, c) }._1
    val codes = nv.map { case (id, v) => id -> (0 until 16).map(codeOf(v, _)) }
    val panel = emb.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(32)
    val all = emb.toSeq
    val perQuery = panel.map { aId =>
      val hits: Long =
        if (!nv.contains(aId)) 0L
        else {
          val exact = top5Of(aId, emb(aId), all)
          val av = nv(aId)
          val lut = (for { m <- 0 until 16; c <- 1 to 16 } yield
            (m, c) -> isq(fsub(av, m), cent((m, c)))).toMap
          val ann = codes.toSeq.filter(_._1 != aId)
            .map { case (bId, cs) =>
              (bId, cs.zipWithIndex.map { case (c, m) => lut((m, c)) }.sum) }
            .sortBy { case (bId, d) => (d, bId) }.take(5).map(_._1).toSet
          (exact intersect ann).size.toLong
        }
      aId -> hits
    }
    val got = Similarity.q244TrainedPqRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hits") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("a_checksum")))).toMap
    val expected = perQuery.groupBy(_._2).map { case (h, qs) =>
      h -> ((qs.size.toLong, qs.map(_._1).sum))
    }
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.map(_._1).sum == 32L, "histogram must cover the full panel")
  }

  test("q245: trained-pivot IVF recall histogram replays driver-side " +
      "(frozen-integer Lloyd over full vectors, 64 pivots, nprobe=8)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    def norm2(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }; s
    }
    val nv = emb.toSeq.collect { case (id, v) if norm2(v) > 0 =>
      val n = math.sqrt(norm2(v))
      id -> v.map(_.toDouble / n)
    }.toMap
    // the single-subspace (dim 64) instantiation of the q244 training
    // arithmetic: K=64 pivots, 64·K-sample (= the whole fixture corpus
    // here), 8 Lloyd iterations, Long-truncating centroid means
    def fvec(v: Array[Double]): Array[Long] = v.map(x => math.floor(x * 1e6).toLong)
    def isq(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val ids = nv.keys.toSeq.sorted
    val sampIds = ids.take(4096)
    var cent: Map[Int, Array[Long]] = ids.take(64).zipWithIndex
      .map { case (id, i) => (i + 1) -> fvec(nv(id)) }.toMap
    val ks = cent.keys.toSeq.sorted
    for (_ <- 1 to 8) {
      val asg = sampIds.map { id =>
        val fs = fvec(nv(id))
        val c = ks.map(c => (c, isq(fs, cent(c)))).minBy { case (ci, d) => (d, ci) }._1
        (c, fs)
      }
      val upd = asg.groupBy(_._1).map { case (k, rows) =>
        k -> Array.tabulate(64)(d => rows.map(_._2(d)).sum / rows.size)
      }
      cent = cent.map { case (k, old) => k -> upd.getOrElse(k, old) }
    }
    def nearestPivots(v: Array[Double], take: Int): Seq[Int] = {
      val fs = fvec(v)
      ks.map(c => (c, isq(fs, cent(c)))).sortBy { case (c, d) => (d, c) }
        .take(take).map(_._1)
    }
    val lists = nv.map { case (id, v) => id -> nearestPivots(v, 1).head }
    val panel = emb.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(32)
    val all = emb.toSeq
    val perQuery = panel.map { aId =>
      val hits: Long =
        if (!nv.contains(aId)) 0L
        else {
          val exact = top5Of(aId, emb(aId), all)
          val probed = nearestPivots(nv(aId), 8).toSet
          val cand = lists.collect {
            case (bId, c) if bId != aId && probed.contains(c) => bId }.toSet
          val ann = cand.toSeq
            .map(bId => bId -> cosD(emb(aId), emb(bId)))
            .filterNot { case (_, cs) => cs.isNaN }
            .sortBy { case (bId, cs) => (-cs, bId) }.take(5).map(_._1).toSet
          (exact intersect ann).size.toLong
        }
      aId -> hits
    }
    val got = Similarity.q245IvfTrainedRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hits") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("a_checksum")))).toMap
    val expected = perQuery.groupBy(_._2).map { case (h, qs) =>
      h -> ((qs.size.toLong, qs.map(_._1).sum))
    }
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.map(_._1).sum == 32L, "histogram must cover the full panel")
  }

  test("q246: fully-trained IVF+PQ replays driver-side " +
      "(trained coarse prune composed with trained-codebook ADC)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    def norm2(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }; s
    }
    val nv = emb.toSeq.collect { case (id, v) if norm2(v) > 0 =>
      val n = math.sqrt(norm2(v))
      id -> v.map(_.toDouble / n)
    }.toMap
    def isq(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val ids = nv.keys.toSeq.sorted
    // ONE serial Lloyd, both geometries (the q244/q245 replays' shared
    // core): trains on the sampleN lowest-vec_id vectors over the given
    // coordinate slice
    def lloyd(slice: Array[Double] => Array[Long], k: Int,
        sampleN: Int): IndexedSeq[Array[Long]] = {
      val samp = ids.take(sampleN).map(id => slice(nv(id)))
      var cent: Array[Array[Long]] = samp.take(k).map(_.clone()).toArray
      for (_ <- 1 to 8) {
        val sums = Array.fill(cent.length)(new Array[Long](cent(0).length))
        val counts = new Array[Long](cent.length)
        samp.foreach { f =>
          var best = 0; var bestD = Long.MaxValue; var c = 0
          while (c < cent.length) {
            val d = isq(f, cent(c)); if (d < bestD) { bestD = d; best = c }; c += 1
          }
          counts(best) += 1L
          var i = 0
          while (i < f.length) { sums(best)(i) += f(i); i += 1 }
        }
        cent = Array.tabulate(cent.length)(c =>
          if (counts(c) == 0L) cent(c)
          else Array.tabulate(cent(0).length)(i => sums(c)(i) / counts(c)))
      }
      cent.toIndexedSeq
    }
    def fvec(v: Array[Double]): Array[Long] = v.map(x => math.floor(x * 1e6).toLong)
    def fsub(v: Array[Double], m: Int): Array[Long] =
      v.slice(m * 4, m * 4 + 4).map(x => math.floor(x * 1e6).toLong)
    val coarse = lloyd(fvec, 64, 4096)
    val pqCents = (0 until 16).map(m => lloyd(fsub(_, m), 16, 1024))
    def argmin(f: Array[Long], cs: IndexedSeq[Array[Long]]): Int =
      cs.zipWithIndex.map { case (c, i) => (i + 1, isq(f, c)) }
        .minBy { case (ci, d) => (d, ci) }._1
    val lists = nv.map { case (id, v) => id -> argmin(fvec(v), coarse) }
    val codes = nv.map { case (id, v) =>
      id -> (0 until 16).map(m => argmin(fsub(v, m), pqCents(m))) }
    val panel = emb.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(32)
    val all = emb.toSeq
    val perQuery = panel.map { aId =>
      val hits: Long =
        if (!nv.contains(aId)) 0L
        else {
          val exact = top5Of(aId, emb(aId), all)
          val av = nv(aId)
          val fa = fvec(av)
          val probed = coarse.zipWithIndex.map { case (c, i) => (i + 1, isq(fa, c)) }
            .sortBy { case (ci, d) => (d, ci) }.take(8).map(_._1).toSet
          val cand = lists.collect {
            case (bId, c) if bId != aId && probed.contains(c) => bId }.toSet
          val lut = (for { m <- 0 until 16; c <- 1 to 16 } yield
            (m, c) -> isq(fsub(av, m), pqCents(m)(c - 1))).toMap
          val ann = cand.toSeq
            .map(bId => bId ->
              codes(bId).zipWithIndex.map { case (c, m) => lut((m, c)) }.sum)
            .sortBy { case (bId, d) => (d, bId) }.take(5).map(_._1).toSet
          (exact intersect ann).size.toLong
        }
      aId -> hits
    }
    val got = Similarity.q246TrainedIvfPqRecall(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hits") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("a_checksum")))).toMap
    val expected = perQuery.groupBy(_._2).map { case (h, qs) =>
      h -> ((qs.size.toLong, qs.map(_._1).sum))
    }
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.map(_._1).sum == 32L, "histogram must cover the full panel")
  }

  test("sharded Lloyd == serial Lloyd bit-for-bit (every geometry the queries freeze)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // The r15 scale fix: pqTrainedCentroids dispatches past the serial
    // op budget to the distributed kernel, which is only sound if the
    // two are indistinguishable on BYTES. Pin every geometry the gated
    // queries use (q244's 16×4/K16, q245/q246's coarse 1×64/K64) plus a
    // small-K shape prone to emptied clusters, on BOTH the fixture
    // corpus and a synthetic uniform corpus (different value
    // distribution, different partition count).
    val fixture = Similarity.pqNormalized(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select($"vec_id", $"embedding"))
    val synth = Similarity.pqNormalized(
      spark.range(3000).select($"id".as("vec_id"),
        expr("""transform(sequence(0, 63),
               |  d -> CAST((pmod(xxhash64(id, d), 2001) - 1000) / 1000.0 AS FLOAT))"""
          .stripMargin).as("embedding")).repartition(7))
    def collectSorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
        .sortBy(t => (t._1, t._2))
    for {
      (nv, tag) <- Seq((fixture, "fixture"), (synth, "synth"))
      (mSub, subDim, k, samp, iters) <- Seq(
        (16, 4, 16, 1024, 8), // q244 PQ geometry
        (1, 64, 64, 4096, 8), // q245/q246 coarse geometry
        (1, 64, 7, 100, 3))   // small-K odd shape (empty-cluster prone)
    } {
      val serial = collectSorted(
        Similarity.pqTrainedCentroidsSerial(nv, mSub, subDim, k, samp, iters))
      val sharded = collectSorted(
        Similarity.pqTrainedCentroidsSharded(nv, mSub, subDim, k, samp, iters))
      assert(serial.nonEmpty && sharded == serial,
        s"sharded != serial at $tag m=$mSub k=$k s=$samp t=$iters")
    }
    // the empty relation degenerates identically (no rows, same schema)
    val empty = fixture.filter($"vec_id" < -1)
    assert(Similarity.pqTrainedCentroidsSharded(empty, 1, 64, 4, 16, 2).count() == 0L)
    assert(Similarity.pqTrainedCentroidsSerial(empty, 1, 64, 4, 16, 2).count() == 0L)
  }
}
