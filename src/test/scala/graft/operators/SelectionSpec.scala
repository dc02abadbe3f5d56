package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Data-selection operators on the CorpusSpec planted corpus, where every
  * count is exactly known so KL divergences and DSIR weights can be brute
  * recomputed in plain Scala; plus the rounding-boundary guards that make
  * the frozen micro-nat tables provably cross-engine identical (the q76
  * argument, extended to both new frozen tables).
  *
  * Plant: 4 "web" docs of "p q" x25 (50 tokens each), 4 "books" docs of
  * "r" x6. Unigrams p=100 q=100 (web only), r=24 (books only); N=224;
  * n_web=200, n_books=24; vocabulary V=3; min(source)="books".
  */
class SelectionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_sel").toString
    val web = Seq.fill(25)("p q").mkString(" ")
    val books = Seq.fill(6)("r").mkString(" ")
    val docs =
      (0L to 3L).map(i => (i, web, "en", "web", web.length.toLong)) ++
        (4L to 7L).map(i => (i, books, "en", "books", books.length.toLong))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  // the operator's frozen micro-nat step, replicated exactly: positive and
  // negative arguments both round half away from zero (Spark HALF_UP ==
  // DuckDB round); planted values sit far from .5 so the direction choice
  // never actually fires
  private def microNats(x: Double): Long =
    math.round(math.log(x) * 1e6) // Math.round = floor(x+0.5): equals
                                  // HALF_UP for values not at a boundary

  test("q84: KL divergences match a brute recount on the planted corpus") {
    val got = Selection.q84SourceKl(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("kl_nats")))).toMap
    // web: tokens p,q each c_st=100, n_s=200, c_t=100, N=224
    val dWeb = microNats(100.0 * 224 / (200.0 * 100))
    val klWeb = (100L * dWeb + 100L * dWeb).toDouble / 1e6 / 200
    // books: token r c_st=24, n_s=24, c_t=24
    val dBooks = microNats(24.0 * 224 / (24.0 * 24))
    val klBooks = (24L * dBooks).toDouble / 1e6 / 24
    assert(got == Map("web" -> ((200L, klWeb)), "books" -> ((24L, klBooks))))
    assert(klWeb > 0 && klBooks > 0)
  }

  test("q84: KL is nonnegative for every source on real data") {
    Selection.q84SourceKl(spark, sfDir).collect().foreach { r =>
      // frozen rounding can push a tiny true KL at most 0.5 micro-nat
      // per type below zero; the corpus sources sit well above that
      assert(r.getAs[Double]("kl_nats") > -1e-6,
        s"KL(${r.getAs[String]("source")} || corpus) negative")
    }
  }

  test("q85: DSIR weights and selection order match a brute recount") {
    val rows = Selection.q85ImportanceWeights(spark, dir).collect()
    // target = min(source) = books; V=3, n_bg=224, n_tgt=24; add-one
    val wP = microNats((0 + 1.0) * (224 + 3) / ((24 + 3.0) * (100 + 1)))
    val wR = microNats((24 + 1.0) * (224 + 3) / ((24 + 3.0) * (24 + 1)))
    // books docs: 24 r-tokens... per doc 6 tokens of r
    val avgBooks = (6L * wR).toDouble / 1e6 / 6
    val avgWeb = (25L * wP + 25L * wP).toDouble / 1e6 / 50
    assert(avgBooks > 0 && avgWeb < 0, "target docs score positive, off-target negative")
    val got = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("avg_llr")))
    // ranking: books docs (4-7) first in doc_id order, then web (0-3)
    assert(got.toSeq == Seq(4L, 5L, 6L, 7L).map(_ -> avgBooks) ++
      Seq(0L, 1L, 2L, 3L).map(_ -> avgWeb))
  }

  test("q85: avg_llr is non-increasing down the selection on real data") {
    val avgs = Selection.q85ImportanceWeights(spark, sfDir).collect()
      .map(_.getAs[Double]("avg_llr"))
    assert(avgs.nonEmpty)
    avgs.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
  }

  test("q90: PSI terms and total match a brute recount on the planted corpus") {
    val rows = Selection.q90LengthDrift(spark, dir).collect()
    // snapshot split doc_id % 10: incoming = {0} (web, 50 tokens, bucket
    // 2), base = {1..7} (3 web bucket 2, 4 books bucket 0); k = 2
    val (nb, ni, k) = (7L, 1L, 2L)
    def term(cb: Long, ci: Long): (Double, Double, Long) = {
      val p = (cb + 1).toDouble / (nb + k)
      val q = (ci + 1).toDouble / (ni + k)
      val t = math.round((p - q) * math.log(
        (cb + 1).toDouble * (ni + k).toDouble / ((nb + k).toDouble * (ci + 1).toDouble)) * 1e6)
      (p, q, t)
    }
    val (p0, q0, t0) = term(4L, 0L)
    val (p2, q2, t2) = term(3L, 1L)
    val psi = (t0 + t2).toDouble / 1e6
    val got = rows.map(r => r.getAs[Long]("bucket") ->
      ((r.getAs[Long]("c_base"), r.getAs[Long]("c_in"), r.getAs[Double]("p_base"),
        r.getAs[Double]("p_in"), r.getAs[Double]("term_nats"),
        r.getAs[Double]("psi_nats")))).toMap
    assert(got == Map(
      0L -> ((4L, 0L, p0, q0, t0.toDouble / 1e6, psi)),
      2L -> ((3L, 1L, p2, q2, t2.toDouble / 1e6, psi))))
    assert(psi > 0, "diverged snapshots must alarm")
  }

  test("q91: vocab drift statuses and ratios match a brute recount") {
    val got = Selection.q91VocabDrift(spark, dir).collect()
      .map(r => r.getAs[String]("tok") ->
        ((r.getAs[Long]("c_base"), r.getAs[Long]("c_in"), r.getAs[String]("status"),
          r.getAs[Long]("drift_micro")))).toMap
    // base = docs 1..7: p=75 q=75 (web docs 1-3), r=24 (books 4-7);
    // incoming = doc 0: p=25 q=25. n_base=174, n_in=50, V=3
    val (nb, ni, v) = (174L, 50L, 3L)
    def drift(cb: Long, ci: Long): Long =
      math.round(math.log((ci + 1).toDouble * (nb + v).toDouble /
        ((ni + v).toDouble * (cb + 1).toDouble)) * 1e6)
    assert(got == Map(
      "p" -> ((75L, 25L, "shared", drift(75L, 25L))),
      "q" -> ((75L, 25L, "shared", drift(75L, 25L))),
      "r" -> ((24L, 0L, "vanished", drift(24L, 0L)))))
    assert(got("r")._4 < 0, "vanished tokens must drift negative")
  }

  test("q84/q85 identity: a single-source corpus has zero divergence and zero weights") {
    // when the source IS the corpus, every ln argument is exactly 1 and
    // every frozen value exactly 0 — the fixed point both operators must
    // hit with no rounding slack at all
    val d = Files.createTempDirectory("graft_sel_id").toString
    val docs = (0L to 4L).map(i => (i, "x y z w", "en", "only", 7L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val kl = Selection.q84SourceKl(spark, d).collect()
    assert(kl.length == 1 && kl.head.getAs[Double]("kl_nats") == 0.0)
    // target = the only source = background: smoothed LLR is exactly 0
    // for every type, so every doc scores 0 and ordering falls to doc_id
    val sel = Selection.q85ImportanceWeights(spark, d).collect()
    assert(sel.map(_.getAs[Double]("avg_llr")).forall(_ == 0.0))
    assert(sel.map(_.getAs[Long]("doc_id")).toSeq == (0L to 4L))
  }

  test("q95: correlation matches an exact BigInt recount composed from q27 and q76") {
    // independent composition: take the two per-doc scores from their own
    // declared queries, freeze and correlate in arbitrary-precision Scala
    val nll = TextAnalysis.q76UnigramNll(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    val qual = TextAnalysis.q27QualityScore(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val src = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = src.keys.groupBy(src).view.mapValues { ids =>
      val xs = ids.toSeq.map(id => (BigInt(math.round(nll(id) * 1e9)),
        BigInt(math.round(qual(id) * 1e9))))
      val n = BigInt(xs.size)
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val syy = xs.map(p => p._2 * p._2).sum
      val (num, d1, d2) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
      (xs.size.toLong,
        num.toDouble / math.sqrt(d1.toDouble * d2.toDouble))
    }.toMap
    val got = Selection.q95QualityNllCorrelation(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("corr")))).toMap
    assert(got == expected)
    got.values.foreach { case (_, c) => assert(c >= -1.0 && c <= 1.0) }
  }

  test("q115: distributed prefix scan equals the single-window scan; exactly n strides land") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = Selection.q115PpsSample(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum"), r.getAs[Long]("n_picks")))
    // naive reference: one global-order window (fine at test scale)
    val naive = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars").as("w"))
      .withColumn("cum", sum(col("w")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum")).toMap
    got.foreach { case (id, cum, _) =>
      assert(naive(id) == cum, s"doc $id: bucketed cum $cum != naive ${naive(id)}")
    }
    assert(got.map(_._3).sum == 100L, s"stride count must be exactly n: ${got.map(_._3).sum}")
    assert(got.forall(_._3 >= 1))
    // scale pin: the corpus-sized window is bucket-partitioned; only the
    // tiny per-bucket-totals relation sees a global-order window
    val p = Selection.q115PpsSample(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("hashpartitioning(bkt"),
      "corpus prefix scan must shuffle by bucket, not run as one global window")
  }

  test("frozen tables sit far from rounding boundaries at every shipped SF") {
    // The only cross-engine risk is a libm-vs-JVM ln ulp (~1e-8 in
    // micro-nat units: 2 ulps of a ~30-nat value) flipping a round();
    // prove every frozen value in ALL FOUR tables (q84 divergences, q85
    // weights, q90 PSI terms, q91 drift ratios) sits > 1e-6 from the
    // nearest .5 boundary for every corpus the driver gates on. The
    // measured floor across all three SFs is 9.1e-5 (sf0.001, q84
    // src16/"value"; q90/q91's own floor is 1.5e-2) — 10^4 above the
    // ulp, and the guard threshold sits 100x above the ulp with 90x
    // headroom to the floor.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val st = graft.sources.Tables.documents(spark, d)
        .select($"source", explode(split(trim($"text"), " ")).as("tok"))
        .groupBy($"source", $"tok").agg(count(lit(1)).as("c_st"))
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[String]("tok"), r.getAs[Long]("c_st")))
      val types = st.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val srcTot = st.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val n = types.values.sum
      val v = types.size.toLong
      def guard(x: Double, what: String): Unit = {
        val m = x * 1e6
        val dist = math.abs(m - math.floor(m) - 0.5)
        assert(dist > 1e-6, s"$sf $what at $dist from a rounding boundary")
      }
      // q84 per-(source, type) divergence arguments
      st.foreach { case (s, t, c) =>
        guard(math.log(c.toDouble * n / (srcTot(s).toDouble * types(t))), s"q84 $s/$t")
      }
      // q85 per-type weight arguments (target = alphabetically-first source)
      val tgtSource = srcTot.keys.min
      val tgtCounts = st.filter(_._1 == tgtSource).map(x => x._2 -> x._3).toMap
      val nTgt = srcTot(tgtSource)
      types.foreach { case (t, cBg) =>
        val cTgt = tgtCounts.getOrElse(t, 0L)
        guard(math.log((cTgt + 1.0) * (n + v) / ((nTgt + v).toDouble * (cBg + 1))),
          s"q85 $t")
      }
      // q90 per-bucket PSI terms (snapshot split doc_id % 10)
      val buckets = graft.sources.Tables.documents(spark, d)
        .select($"doc_id",
          least(expr("CAST(size(split(trim(text), ' ')) AS BIGINT) div 20"), lit(9L)).as("b"))
        .collect().map(r => (r.getAs[Long]("b"), r.getAs[Long]("doc_id") % 10 != 0))
      val byB = buckets.groupBy(_._1).view
        .mapValues(xs => (xs.count(_._2).toLong, xs.count(!_._2).toLong)).toMap
      val (nb, ni, k) = (byB.values.map(_._1).sum, byB.values.map(_._2).sum, byB.size.toLong)
      byB.foreach { case (b, (cb, ci)) =>
        val p = (cb + 1).toDouble / (nb + k)
        val q = (ci + 1).toDouble / (ni + k)
        guard((p - q) * math.log(
          (cb + 1).toDouble * (ni + k).toDouble / ((nb + k).toDouble * (ci + 1).toDouble)),
          s"q90 bucket $b")
      }
      // q91 per-token drift ratios over the same split
      val splitCounts = graft.sources.Tables.documents(spark, d)
        .select($"doc_id", explode(split(trim($"text"), " ")).as("tok"))
        .groupBy($"tok")
        .agg(count(when($"doc_id" % 10 =!= 0, 1)).as("cb"),
          count(when($"doc_id" % 10 === 0, 1)).as("ci"))
        .collect().map(r => (r.getAs[String]("tok"), r.getAs[Long]("cb"), r.getAs[Long]("ci")))
      val (nb2, ni2, v2) =
        (splitCounts.map(_._2).sum, splitCounts.map(_._3).sum, splitCounts.length.toLong)
      splitCounts.foreach { case (t, cb, ci) =>
        guard(math.log((ci + 1).toDouble * (nb2 + v2).toDouble /
          ((ni2 + v2).toDouble * (cb + 1).toDouble)), s"q91 $t")
      }
    }
  }

  test("q84: the DECIMAL(38,0) KL aggregate survives corpus-scale counts") {
    // the q69 overflow class, this time in the SUM: a 1e13-token source
    // times a 3e7 micro-nat bound is ~3e20 > 2^63. The operator's exact
    // aggregate tree must not wrap where a BIGINT sum would.
    val big = Seq((10000000000000L, 30000000L), (10000000000000L, -30000000L),
      (10000000000000L, 30000000L))
      .toDF("c_st", "d_micro")
    val s = big.agg(
      sum($"c_st".cast(org.apache.spark.sql.types.DecimalType(38, 0)) * $"d_micro")
        .as("kl_sum"))
      .select($"kl_sum".cast("double")).collect()(0).getDouble(0)
    assert(s == 3e20, "exact decimal aggregate, no Int64 wrap")
  }

  test("q117: skyline equals brute-force dominance; plan is join-free of nested loops") {
    val sf = "/root/testdata/sf0.001"
    val got = Selection.q117Skyline(spark, sf).collect()
      .map(r => (r.getAs[Long]("p_partkey"),
        r.getAs[Double]("price"), r.getAs[Int]("p_size")))
    // independent quadratic reference over the raw table
    val parts = graft.sources.Tables.part(spark, sf)
      .select($"p_partkey", $"p_retailprice", $"p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expected = parts.filter { a =>
      !parts.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.sortBy(_._1)
    assert(got.map(_._1).toSeq == expected.map(_._1).toSeq,
      s"skyline mismatch: got ${got.map(_._1).mkString(",")}")
    // frontier property: a pricier survivor must offer a strictly larger
    // size (else the cheaper one dominates it)
    val frontier = got.sortBy(t => (t._2, t._1)).map(_._3)
    assert(frontier.zip(frontier.tail).forall { case (a, b) => a <= b })
    val p = Selection.q117Skyline(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "skyline must never form the all-pairs dominance join")
  }

  test("q151: Gini matches an exact BigInt replay over the naive global sort") {
    import org.apache.spark.sql.functions._
    val xs = graft.sources.Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, x) => (x, k) }.map(_._2)
    val n = BigInt(xs.length)
    val sx = xs.map(BigInt(_)).sum
    val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expected = ((2 * six - (n + 1) * sx) * 10000 / (n * sx)).toLong
    val r = Selection.q151GiniConcentration(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n") == xs.length && r.getAs[Long]("sx") == sx.toLong)
    assert(r.getAs[Long]("gini_bp") == expected,
      "bucketed value-space rank must equal the naive global sort's Gini")
    assert(r.getAs[Long]("gini_bp") >= 0 && r.getAs[Long]("gini_bp") < 10000)
  }

  test("q158: apportionment sums to exactly 100 and the drawn sets replay via MD5") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val strata = docs.groupBy(_._2).map { case (l, xs) => l -> BigInt(xs.length) }
    val ntot = BigInt(docs.length)
    val base = strata.map { case (l, nd) => l -> nd * 100 / ntot }
    val rem = strata.map { case (l, nd) => l -> (nd * 100 - base(l) * ntot) }
    val leftover = (BigInt(100) - base.values.sum).toInt
    val plus = strata.keys.toSeq.sortBy(l => (-rem(l), l)).take(leftover).toSet
    val alloc = strata.map { case (l, _) =>
      l -> (base(l) + (if (plus(l)) 1 else 0)).toLong }
    val drawn = docs.groupBy(_._2).map { case (l, xs) =>
      l -> xs.map(_._1).sortBy(id => (md5hex(id.toString), id))
        .take(alloc(l).toInt) }
    val got = Selection.q158StratifiedSample(spark, sfDir).collect()
    assert(got.map(_.getAs[Long]("alloc")).sum == 100L,
      "largest-remainder apportionment must hit the target exactly")
    assert(got.length == strata.size)
    got.foreach { r =>
      val l = r.getAs[String]("lang")
      assert(r.getAs[Long]("alloc") == alloc(l))
      assert(r.getAs[Long]("n_drawn") == drawn(l).length.toLong)
      assert(r.getAs[Long]("drawn_id_sum") == drawn(l).sum,
        s"stratum $l drew a different sample than the MD5-rank replay")
    }
    assert(leftover > 0,
      "fixture strata must be uneven enough to exercise the remainder step")
  }

  test("q162: quartiles and fence counts equal a sorted-array replay per flag") {
    val rows = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_extendedprice").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    def lowQ(xs: Array[Long], num: Int): Long = {
      val s = xs.sorted
      val n = s.length
      s(s.indices.find(i => (i + 1).toLong * 4 >= num.toLong * n).get)
    }
    val got = Selection.q162IqrOutliers(spark, sfDir).collect()
    assert(got.length == rows.map(_._1).distinct.length)
    got.foreach { r =>
      val xs = rows.filter(_._1 == r.getAs[String]("flag")).map(_._2)
      val (q1, q3) = (lowQ(xs, 1), lowQ(xs, 3))
      assert(r.getAs[Long]("q1_cents") == q1)
      assert(r.getAs[Long]("q3_cents") == q3)
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(r.getAs[Long]("n_low_outliers") ==
        xs.count(v => 2 * v < 5 * q1 - 3 * q3).toLong)
      assert(r.getAs[Long]("n_high_outliers") ==
        xs.count(v => 2 * v > 5 * q3 - 3 * q1).toLong)
    }
  }

  test("q174: the 80% Pareto cut equals a descending-sort replay, ties resolved") {
    val rev = graft.sources.Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val desc = rev.values.toSeq.sortBy(-_)
    val tot = desc.sum
    var cum = 0L
    val nTop = desc.indexWhere { v => cum += v; cum * 5 >= tot * 4 } + 1
    val r = Selection.q174ParetoCut(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_customers") == rev.size.toLong)
    assert(r.getAs[Long]("total_cents") == tot)
    assert(r.getAs[Long]("n_top80") == nTop.toLong,
      s"expected the minimal top set to be $nTop customers")
    assert(r.getAs[Long]("top80_customer_share_bp") ==
      nTop.toLong * 10000 / rev.size)
    assert(nTop > 0 && nTop < rev.size, "cut must be strictly inside")
  }

  test("q161: median and MAD equal the sorted-array low-median replay") {
    def lowMed(xs: Array[Long]): Long = {
      val s = xs.sorted; s((s.length + 1) / 2 - 1)
    }
    val cents = graft.sources.Tables.orders(spark, sfDir)
      .select($"o_totalprice").collect().map(r => math.round(r.getDouble(0) * 100))
    val m = lowMed(cents)
    val mad = lowMed(cents.map(c => math.abs(c - m)))
    val r = Selection.q161MadDispersion(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("median_cents") == m)
    assert(r.getAs[Long]("mad_cents") == mad)
    assert(r.getAs[Long]("n") == cents.length.toLong)
  }

  test("q183: sample membership equals the driver-side priority sort") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val pick = docs.map { case (id, src, w) =>
      (graft.functions.Md5Prefix60.hash(id.toString.getBytes) / w, id, src, w) }
      .sortBy(t => (t._1, t._2)).take(200)
    val exp = docs.groupBy(_._2).map { case (src, ds) =>
      val dr = pick.filter(_._3 == src)
      src -> ((ds.size.toLong, ds.map(_._3).sum, dr.size.toLong,
        dr.map(_._2).sum, dr.map(_._4).sum))
    }
    val got = Selection.q183WeightedSample(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
          r.getAs[Long]("n_drawn"), r.getAs[Long]("drawn_id_sum"),
          r.getAs[Long]("drawn_chars")))).toMap
    assert(got == exp, s"got $got expected $exp")
    assert(got.values.map(_._3).sum == math.min(200L, docs.size.toLong))
  }

  test("q184: winsorized/trimmed means equal the sorted-array replay") {
    val cents = graft.sources.Tables.orders(spark, sfDir)
      .select($"o_totalprice").collect()
      .map(r => math.round(r.getDouble(0) * 100)).sorted
    val n = cents.length.toLong
    val p05 = cents(((5 * n + 99) / 100).toInt - 1)
    val p95 = cents(((95 * n + 99) / 100).toInt - 1)
    val winSum = cents.map(v => math.max(p05, math.min(p95, v))).sum
    val tr = cents.filter(v => v >= p05 && v <= p95)
    val r = Selection.q184RobustMeans(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("p05_cents") == p05)
    assert(r.getAs[Long]("p95_cents") == p95)
    assert(r.getAs[Long]("win_mean_milli") == winSum * 1000 / n)
    assert(r.getAs[Long]("n_trimmed") == tr.length.toLong)
    assert(r.getAs[Long]("trim_mean_milli") == tr.sum * 1000 / tr.length)
    assert(p05 < p95 && tr.length < cents.length,
      "fixture must actually trim both tails")
  }
}
