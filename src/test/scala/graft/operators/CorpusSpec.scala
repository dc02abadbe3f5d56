package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Corpus-prep operators on a planted corpus with exactly known token,
  * bigram, and count structure, so ranks / lifts / shares can be brute
  * recounted in plain Scala and compared.
  *
  * Planted layout: 4 "web" docs of "p q" repeated 25 times (50 tokens
  * each) and 4 "books" docs of "r" repeated 6 times. Exact counts:
  * unigrams p=100 q=100 r=24; bigrams (p,q)=100 (q,p)=96 (r,r)=20;
  * n_uni=224, n_bi=216. Every token count >= 5 (q68 gate keeps the full
  * vocabulary) and every bigram count >= 20 (q69 gate keeps all three).
  */
class CorpusSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_corpus").toString
    val web = Seq.fill(25)("p q").mkString(" ")
    val books = Seq.fill(6)("r").mkString(" ")
    val docs =
      (0L to 3L).map(i => (i, web, "en", "web", web.length.toLong)) ++
        (4L to 7L).map(i => (i, books, "en", "books", books.length.toLong))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q68: ranks and cumulative shares match a brute recount") {
    val rows = Corpus.q68VocabCoverage(spark, dir).collect()
    val got = rows.map(r => (r.getAs[String]("token"),
      r.getAs[Long]("cnt"), r.getAs[Long]("rank"), r.getAs[Double]("cum_share")))
    // brute: counts p=100 q=100 r=24; rank by (cnt desc, token)
    assert(got.toSeq == Seq(
      ("p", 100L, 1L, 100.0 / 224),
      ("q", 100L, 2L, 200.0 / 224),
      ("r", 24L, 3L, 1.0)))
    // cum_share monotone nondecreasing, 1.0 at max rank
    assert(got.map(_._4).toSeq == got.map(_._4).sorted.toSeq)
    assert(got.last._4 == 1.0)
  }

  test("q69: lift matches brute-force computation with identical IEEE tree") {
    val got = Corpus.q69BigramLift(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val nUni = 224L; val nBi = 216L
    val uni = Map("p" -> 100L, "q" -> 100L, "r" -> 24L)
    def lift(cab: Long, a: String, b: String): Double =
      (cab.toDouble * nUni.toDouble * nUni.toDouble) /
        (nBi.toDouble * uni(a).toDouble * uni(b).toDouble)
    assert(got == Map(
      ("p", "q") -> ((100L, lift(100L, "p", "q"))),
      ("q", "p") -> ((96L, lift(96L, "q", "p"))),
      ("r", "r") -> ((20L, lift(20L, "r", "r")))))
  }

  test("q69: lift expression survives corpus-scale counts (no Int64 overflow)") {
    // n_uni ~ 1e13 (100 TB of text): n_uni^2 overflows Int64; the
    // double-first expression must not wrap. Evaluate the exact column
    // expression q69 uses over planted big counts.
    val df = Seq((40L, 10000000000000L, 9000000000000L, 2000000L, 3000000L))
      .toDF("c_ab", "n_uni", "n_bi", "c_a", "c_b")
      .withColumn("lift",
        ($"c_ab".cast("double") * $"n_uni".cast("double") * $"n_uni".cast("double")) /
          ($"n_bi".cast("double") * $"c_a".cast("double") * $"c_b".cast("double")))
    val v = df.collect()(0).getAs[Double]("lift")
    val expect = (40L.toDouble * 1e13 * 1e13) / (9e12 * 2e6.toDouble * 3e6.toDouble)
    assert(v == expect && v > 0 && !v.isInfinite)
  }

  test("q70: per-source shares sum to 1 and doc totals match the plant") {
    val rows = Corpus.q70StratifiedSplit(spark, dir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet == Set("web", "books"))
    bySource.foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 8L)
    // token totals: web docs 4*50, books docs 4*6
    val tok = rows.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    assert(tok == Map("web" -> 200L, "books" -> 24L))
  }

  test("splitColumn: stable under reshuffling, content-free, ~12/2/2") {
    val ids = spark.range(0, 2000).toDF("id")
    val a = ids.withColumn("split", Corpus.splitColumn($"id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same ids through a different partitioning and row order
    val b = ids.repartition(7).sortWithinPartitions($"id".desc)
      .withColumn("split", Corpus.splitColumn($"id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 12.0 / 16) < 0.05)
    assert(math.abs(frac("val") - 2.0 / 16) < 0.03)
    assert(math.abs(frac("test") - 2.0 / 16) < 0.03)
  }

  test("q71: cross-source duplicate matrix counts shared texts and induced pairs") {
    // plant: web = 4 copies of one text, books = 4 copies of another.
    // Add a third source sharing web's text twice -> (books,web) disjoint.
    val d = Files.createTempDirectory("graft_q71").toString
    val web = Seq.fill(25)("p q").mkString(" ")
    val books = Seq.fill(6)("r").mkString(" ")
    val rows =
      (0L to 3L).map(i => (i, web, "en", "web", web.length.toLong)) ++
        (4L to 7L).map(i => (i, books, "en", "books", books.length.toLong)) ++
        (8L to 9L).map(i => (i, web, "en", "crawl", web.length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Corpus.q71SourceOverlap(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // off-diagonal: web text in crawl(2) and web(4) -> 1 shared hash,
    // 2*4=8 cross pairs. Diagonal: 4 copies -> C(4,2)=6; 2 copies -> 1.
    assert(got == Map(
      ("books", "books") -> ((1L, 6L)),
      ("crawl", "crawl") -> ((1L, 1L)),
      ("crawl", "web") -> ((1L, 8L)),
      ("web", "web") -> ((1L, 6L))))
  }

  test("q72: boilerplate prefix ranks the dominant 8-token header with its share") {
    val got = Corpus.q72BoilerplatePrefixes(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    // every web doc opens "p q p q p q p q"; every books doc "r r r r r r"
    assert(got.toSeq == Seq(
      ("books", 1L, "r r r r r r", 4L, 1.0),
      ("web", 1L, Seq.fill(4)("p q").mkString(" "), 4L, 1.0)))
  }

  test("q73: source vocab jaccard is exact on disjoint vocabularies") {
    // web vocab {p,q}, books vocab {r}: intersection 0, union 3
    val got = Corpus.q73SourceVocabJaccard(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(("books", "web") -> ((0L, 0.0))))
  }

  test("q73: overlapping vocabularies give |A∩B|/|A∪B| exactly") {
    val d = Files.createTempDirectory("graft_q73").toString
    // source s1 vocab {a,b,c}, s2 vocab {b,c,d}: inter 2, union 4 -> 0.5
    val rows = Seq(
      (0L, Seq.fill(5)("a b c").mkString(" "), "en", "s1"),
      (1L, Seq.fill(5)("b c d").mkString(" "), "en", "s2"))
      .map { case (i, t, l, s) => (i, t, l, s, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Corpus.q73SourceVocabJaccard(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(("s1", "s2") -> ((2L, 0.5))))
  }

  test("q78: sqrt-temperature weights are exact on a 900/100 token split") {
    val d = Files.createTempDirectory("graft_q78").toString
    // p = 0.9 / 0.1; nano-frozen sqrts are 948683298 / 316227766 — exactly
    // 3:1, so the normalized weights are exactly 0.75 / 0.25
    val rows = Seq(
      (0L, Seq.fill(900)("x").mkString(" "), "en", "big"),
      (1L, Seq.fill(100)("x").mkString(" "), "en", "small"))
      .map { case (i, t, l, s) => (i, t, l, s, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Corpus.q78TemperatureMix(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (nBig, pBig, wBig, boostBig) = got("big")
    val (nSmall, pSmall, wSmall, boostSmall) = got("small")
    assert(nBig == 900L && nSmall == 100L)
    assert(pBig == 0.9 && pSmall == 0.1)
    assert(wBig == 0.75 && wSmall == 0.25)
    assert(math.abs(boostBig - 0.75 / 0.9) < 1e-15)
    assert(boostSmall == 2.5)
  }

  test("q78: weights sum to 1 and boost is monotone against natural share") {
    val rows = Corpus.q78TemperatureMix(spark, sfDir).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    // temperature flattening: rarer sources get the larger boost
    val byShare = rows.sortBy(_._1)
    assert(byShare.map(_._3).reverse.sameElements(byShare.map(_._3).sorted))
  }

  test("q80: shard layout is the md5-hash permutation, computed independently") {
    def h60(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val rows = Corpus.q80ShardLayout(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val allIds = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == allIds, "every doc appears exactly once")
    rows.groupBy(_._2).foreach { case (shard, members) =>
      assert(0 <= shard && shard < 64)
      // pos must be 1..n and agree with the independent hash ordering
      val byPos = members.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (1L to members.length).toSeq)
      val expectedOrder = members.map(_._1).sortBy(id => (h60(id), id)).toSeq
      assert(byPos.map(_._1).toSeq == expectedOrder, s"shard $shard order")
      members.foreach { case (id, s, _) => assert(h60(id) % 64 == s) }
    }
  }

  test("q81: per-source budgets and prefix selection on a planted 900/100 corpus") {
    val d = Files.createTempDirectory("graft_q81").toString
    // big: 9 docs x 100 tokens, small: 4 docs x 25 tokens -> total 1000,
    // 20% budget 200, weights 0.75/0.25 (exact, see q78 spec) ->
    // b_big = 150, b_small = 50 -> hash-order prefix of 2 docs each
    // (cum_before 0,100 < 150; 0,25 < 50)
    val rows =
      (0L until 9L).map(i => (i, Seq.fill(100)("x").mkString(" "), "en", "big")) ++
        (9L until 13L).map(i => (i, Seq.fill(25)("x").mkString(" "), "en", "small"))
    rows.map { case (i, t, l, s) => (i, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Corpus.q81MixSubsample(spark, d).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val bySource = got.groupBy(_._1)
    assert(bySource("big").length == 2 && bySource("big").forall(_._4 == 150L))
    assert(bySource("small").length == 2 && bySource("small").forall(_._4 == 50L))
    got.foreach { case (_, _, cumBefore, b) => assert(cumBefore < b) }
  }

  test("q63 manifest split column agrees with splitColumn on doc_id") {
    val r = Dedup.q63TrainingManifest(spark, sfDir)
      .withColumn("expect", Corpus.splitColumn($"doc_id"))
      .filter($"split" =!= $"expect")
    assert(r.count() == 0)
  }

  test("q189: boilerplate strip replays driver-side and actually strips") {
    val ds = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    def pfx(t: String): String = t.trim.split(" ", -1).take(8).mkString(" ")
    val expected = ds.groupBy(_._2).map { case (src, docs) =>
      val byPfx = docs.groupBy(d => pfx(d._3)).view.mapValues(_.size).toMap
      val (bp, cnt) = byPfx.toSeq.minBy { case (p, c) => (-c, p) }
      val shared = cnt >= 2
      val hits = if (shared) docs.filter(d => pfx(d._3) == bp) else Seq.empty
      val removed = hits.map { d =>
        if (d._3.length > bp.length) bp.length + 1L else bp.length.toLong }.sum
      src -> ((if (shared) bp else "", if (shared) cnt.toLong else 0L,
        docs.size.toLong, hits.size.toLong,
        docs.map(_._3.length.toLong).sum, removed, hits.map(_._1).sum))
    }
    val got = Corpus.q189BoilerplateStrip(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[String]("boilerplate_prefix"), r.getAs[Long]("prefix_cnt"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_stripped"),
          r.getAs[Long]("chars_before"), r.getAs[Long]("chars_removed"),
          r.getAs[Long]("stripped_id_sum")))).toMap
    assert(got == expected, s"got $got expected $expected")
    // the fixture must exercise the transform: at least one source strips
    assert(got.values.exists(_._4 > 0), "no source had shared boilerplate")
    // conservation: chars_removed never exceeds what stripped docs held
    got.values.foreach { case (_, _, _, nStripped, before, removed, _) =>
      assert(removed >= 0 && removed <= before)
      if (nStripped == 0) assert(removed == 0)
    }
  }

  test("q199: scorecard metrics agree with their parent operators") {
    val card = Corpus.q199ReleaseScorecard(spark, sfDir).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    val ds = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(card("n_docs") == ds.size.toLong)
    assert(card("n_sources") == ds.map(_._3).distinct.size.toLong)
    assert(card("n_tokens") ==
      ds.map(_._2.trim.split(" ", -1).length.toLong).sum)
    val fps = ds.map(_._2.trim.toLowerCase.replaceAll("\\s+", " "))
    assert(card("exact_dup_docs") == (fps.size - fps.distinct.size).toLong)
    // splits partition the corpus exactly
    assert(card("docs_train") + card("docs_val") + card("docs_test")
      == card("n_docs"))
    // near-dup count equals the parent pair relation at the threshold
    val nd = Dedup.q47NgramJaccardInverted(spark, sfDir)
      .filter($"jaccard" >= 0.8).count()
    assert(card("neardup_pairs_08") == nd)
    // mean quality agrees with the declared q27 relation
    val qs = TextAnalysis.q27QualityScore(spark, sfDir)
      .selectExpr("CAST(round(quality * 1e6) AS BIGINT)").collect()
      .map(_.getLong(0))
    assert(card("mean_quality_micro") == qs.sum / qs.length)
  }

  test("q191: Zipf slopes replay from a driver-side frozen-log OLS") {
    val vocab = graft.sources.Tables.documents(spark, sfDir)
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).trim.split(" ", -1)
        .map(t => (r.getString(0), t))).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = vocab.keys.map(_._1).toSeq.distinct.map { src =>
      val head = vocab.collect { case ((`src`, t), c) => (t, c) }.toSeq
        .sortBy { case (t, c) => (-c, t) }.take(256).zipWithIndex
        .map { case ((_, c), i) =>
          (math.round(math.log(i + 1.0) * 1e6),
            math.round(math.log(c.toDouble) * 1e6)) }
      val n = BigInt(head.size)
      val sx = head.map(p => BigInt(p._1)).sum
      val sy = head.map(p => BigInt(p._2)).sum
      val sxy = head.map(p => BigInt(p._1) * p._2).sum
      val sxx = head.map(p => BigInt(p._1) * p._1).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val slope =
        if (num < 0) -((-num * 1000000) / den) else (num * 1000000) / den
      src -> ((head.size.toLong, slope.toLong))
    }.toMap
    val got = Corpus.q191ZipfFit(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("zipf_slope_micro")))).toMap
    assert(got == expected, s"got $got expected $expected")
    // word frequencies decay: every fitted slope is negative
    assert(got.values.forall(_._2 < 0L), "a Zipf head cannot slope upward")
  }

  test("q192: manifest checksums replay and cover the whole corpus") {
    val ds = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val M = BigInt(1000000000000000L)
    val expected = ds.map { case (id, text) =>
      val hx = md5hex(id.toString).charAt(31)
      val split = if (hx <= 'b') "train" else if (hx <= 'd') "val" else "test"
      val shard = graft.functions.Md5Prefix60.hash(id.toString.getBytes) % 64
      ((split, shard), (id, text))
    }.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.size.toLong,
        xs.map(_._2._2.trim.split(" ", -1).length.toLong).sum,
        xs.map(_._2._1).sum,
        (xs.map(x => BigInt(graft.functions.Md5Prefix60.hash(x._2._2.getBytes)))
          .sum % M).toLong))
    }
    val got = Corpus.q192ShardManifest(spark, sfDir).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("shard")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("token_sum"),
          r.getAs[Long]("id_sum"), r.getAs[Long]("content_checksum")))).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.map(_._1).sum == ds.size.toLong,
      "manifest must account for every document")
    // a flipped byte flips the residue: re-fold with one doc's text
    // perturbed and require a different checksum for its cell
    val (pid, ptext) = ds.head
    val phx = md5hex(pid.toString).charAt(31)
    val psplit = if (phx <= 'b') "train" else if (phx <= 'd') "val" else "test"
    val pshard = graft.functions.Md5Prefix60.hash(pid.toString.getBytes) % 64
    val cell = got((psplit, pshard))
    val perturbed = (BigInt(cell._4) - BigInt(
      graft.functions.Md5Prefix60.hash(ptext.getBytes)) + BigInt(
      graft.functions.Md5Prefix60.hash((ptext + "x").getBytes))).mod(M)
    assert(perturbed.toLong != cell._4, "checksum blind to a content flip")
  }

  test("q210: water-filling replays against an iterative driver-side fill") {
    val got = Corpus.q210WaterfillQuota(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_chars"),
        r.getAs[Long]("alloc_chars"), r.getAs[Boolean]("capped"),
        r.getAs[Boolean]("conservation_ok")))).toMap
    assert(got.values.forall(_._4), "conservation must hold")
    // independent replay: literally lower the water level source by source
    val sizes = got.view.mapValues(_._1).toMap
    val budget = sizes.values.sum * 3 / 5
    var remaining = budget
    var pool = sizes.toSeq.sortBy { case (s, n) => (n, s) }
    val alloc = scala.collection.mutable.Map[String, Long]()
    while (pool.nonEmpty && pool.head._2 <= remaining / pool.length) {
      val (s, n) = pool.head
      alloc(s) = n; remaining -= n; pool = pool.tail
    }
    if (pool.nonEmpty) {
      val base = remaining / pool.length
      val r = remaining % pool.length
      pool.map(_._1).sorted.zipWithIndex.foreach { case (s, j) =>
        alloc(s) = base + (if (j < r) 1L else 0L)
      }
    }
    got.foreach { case (s, (n, a, capped, _)) =>
      assert(a == alloc(s), s"alloc mismatch for $s: got $a want ${alloc(s)}")
      assert(capped == (a < n) || (capped && a == n && pool.exists(_._1 == s)),
        s"cap flag inconsistent for $s")
    }
    // max–min fairness: capped allocations differ by at most one char
    val capAllocs = got.values.collect { case (_, a, true, _) => a }
    if (capAllocs.nonEmpty)
      assert(capAllocs.max - capAllocs.min <= 1,
        "capped sources must sit at a common water level")
  }

  test("q219: exact overlap replays from driver-side vocab sets; sketches all in envelope") {
    import org.apache.spark.sql.functions._
    val vocab = graft.sources.Tables.documents(spark, sfDir)
      .select($"source", explode(split(trim($"text"), " ")).as("token"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      a <- vocab.keys; b <- vocab.keys; if a < b
      ia = (vocab(a) intersect vocab(b)).size.toLong
      na = vocab(a).size.toLong; nb = vocab(b).size.toLong
    } yield (a, b) -> ((na, nb, ia, ia * 10000L / (na + nb - ia)))).toMap
    val got = Corpus.q219SketchVocabOverlap(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_inter"),
          r.getAs[Long]("jaccard_bp"), r.getAs[Boolean]("sketch_in_envelope"))))
      .toMap
    assert(got.view.mapValues(t => (t._1, t._2, t._3, t._4)).toMap == expected)
    // the inclusion–exclusion estimate must hold for EVERY pair — one
    // false boolean is a broken sketch merge, not noise (gate is >6 sigma)
    assert(got.values.forall(_._5), s"out-of-envelope pairs: ${got.filterNot(_._2._5).keys}")
    assert(got.size == vocab.size * (vocab.size - 1) / 2, "full pair frame")
  }

  test("q220: minimizer signatures replay from a driver-side sliding-window fold") {
    import org.apache.spark.sql.functions._
    val w = 5
    val docsT = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim($"text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val expected = docsT.collect { case (d, ts) if ts.size >= w =>
      val hs = ts.map(t => graft.functions.Md5Prefix60.hash(t.getBytes("UTF-8")))
      val mins = (0 to hs.size - w).map(p => hs.slice(p, p + w).min).toSet
      d -> ((ts.size.toLong, (ts.size - w + 1).toLong, mins.size.toLong,
        mins.size.toLong * 10000L / (ts.size - w + 1)))
    }
    val got = TextAnalysis.q220MinimizerSignature(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_windows"),
          r.getAs[Long]("n_minimizers"), r.getAs[Long]("retention_bp")))).toMap
    assert(got == expected)
    // winnowing's positional density floor does NOT survive the
    // distinct-VALUE collapse (word-soup text repeats tokens, so one
    // hash value serves many far-apart windows); only the trivial
    // bounds hold on values: at least one, never more than windows
    got.values.foreach { case (_, nw, nm, _) =>
      assert(nm >= 1 && nm <= nw, s"minimizer count $nm outside [1, $nw]") }
    // and signatures genuinely compress: aggregate retention well
    // under the 100% a keep-everything "sampler" would show
    val totalMin = got.values.map(_._3).sum
    val totalWin = got.values.map(_._2).sum
    assert(totalMin * 2 <= totalWin,
      s"winnowing should at least halve the position count: $totalMin/$totalWin")
  }

  test("q229: the growth curve replays from a driver-side debut census and telescopes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val mx = docs.map(_._1).max
    def bucketOf(id: Long): Long = id * 10 / (mx + 1)
    def toksOf(t: String): Array[String] = t.trim.split(" ", -1)
    val perBucket = docs.groupBy(d => bucketOf(d._1)).view.mapValues { ds =>
      (ds.length.toLong, ds.map(d => toksOf(d._2).length.toLong).sum)
    }.toMap
    val debut = docs.flatMap { case (id, t) => toksOf(t).map(_ -> id) }
      .groupBy(_._1).view.mapValues(v => bucketOf(v.map(_._2).min)).toMap
    val newTerms = debut.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Corpus.q229VocabGrowth(spark, sfDir).collect().map { r =>
      r.getAs[Long]("bucket") -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("new_terms"), r.getAs[Long]("cum_docs"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("cum_vocab")))
    }.toMap
    assert(got.keySet == perBucket.keySet)
    var (cd, ct, cv) = (0L, 0L, 0L)
    perBucket.keys.toSeq.sorted.foreach { b =>
      val (nd, nt) = perBucket(b)
      val nw = newTerms.getOrElse(b, 0L)
      cd += nd; ct += nt; cv += nw
      assert(got(b) == ((nd, nt, nw, cd, ct, cv)), s"bucket $b: ${got(b)}")
    }
    // telescoping: the final cumulative vocabulary IS the distinct type
    // count, and every token ever seen is accounted in cum_tokens
    assert(cv == debut.size.toLong)
    assert(ct == docs.map(d => toksOf(d._2).length.toLong).sum)
    // the curve must flatten (Heaps): the last decile adds fewer new
    // types than the first on any corpus with repeated vocabulary
    val first = newTerms(perBucket.keys.min)
    val last = newTerms.getOrElse(perBucket.keys.max, 0L)
    assert(last < first, s"no vocabulary saturation: first=$first last=$last")
  }
}
