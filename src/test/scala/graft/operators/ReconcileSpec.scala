package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FormattedMode
import graft.SparkSpec
import graft.sources.Tables

/** Driver-side replays + plan pins for the round-10 reconciliation /
  * survivorship / blocking batch (q133, q135, q136, q137). Each replay
  * re-derives the answer with plain Scala collections — a genuinely
  * different evaluation order from both the Spark plan and the DuckDB
  * oracle — so the three agree only if the semantics are right.
  */
class ReconcileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q133: per-class counts and checksums match the simulated-change arithmetic") {
    val keys = Tables.orders(spark, sfDir).select($"o_orderkey").collect()
      .map(_.getLong(0))
    val inserted = keys.filter(_ % 97 == 0)
    val changed = keys.filter(k => k % 89 == 0 && k % 97 != 0)
    val deleted = keys.filter(_ % 101 == 0).map(_ + 2000000000L)
    val unchanged = keys.filter(k => k % 97 != 0 && k % 89 != 0)
    val expected = Map(
      "inserted" -> ((inserted.length.toLong, inserted.sum)),
      "changed" -> ((changed.length.toLong, changed.sum)),
      "deleted" -> ((deleted.length.toLong, deleted.sum)),
      "unchanged" -> ((unchanged.length.toLong, unchanged.sum)))
      .filter(_._2._1 > 0)
    val got = Reconcile.q133SnapshotDiff(spark, sfDir).collect()
      .map(r => r.getAs[String]("change_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("key_sum")))).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("q133 plans one full-outer equi join — payload crosses as a fingerprint") {
    val plan = Reconcile.q133SnapshotDiff(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("FullOuter"), "diff must be a single full-outer join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q135: canonical picks and merged attributes match a survivorship replay") {
    val members = Dedup.q51DedupClusters(spark, sfDir)
      .select($"doc_id", $"cluster_rep").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val attrs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val expected = members.groupBy(_._2).map { case (rep, ms) =>
      val ds = ms.map(_._1)
      val canonical = ds.minBy(d => (-attrs(d)._2, d))
      rep -> ((canonical, ds.length.toLong,
        ds.map(attrs(_)._1).distinct.length.toLong, ds.map(attrs(_)._2).sum))
    }
    val got = Dedup.q135GoldenRecord(spark, sfDir).collect()
      .map(r => r.getAs[Long]("cluster_rep") ->
        ((r.getAs[Long]("canonical_doc"), r.getAs[Long]("n_members"),
          r.getAs[Long]("n_sources"), r.getAs[Long]("total_chars")))).toMap
    assert(got == expected, s"got ${got.size} clusters expected ${expected.size}")
    assert(got.nonEmpty, "fixture must produce clusters to make this test meaningful")
  }

  private def lev(a: String, b: String): Int = {
    val prev = Array.range(0, b.length + 1)
    var cur = new Array[Int](b.length + 1)
    var p = prev
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, p(j) + 1),
          p(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      val t = p; p = cur; cur = t
    }
    p(b.length)
  }

  test("q136: pairs match a brute sorted-window replay (rank scan == global sort)") {
    val d = Tables.documents(spark, sfDir).select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .map { case (id, t) => (id, t.take(240), t.take(64)) }
      .sortBy { case (id, _, k) => (k, id) }
    val expected = (for {
      i <- d.indices
      g <- 1 to 3
      if i + g < d.length
      dist = lev(d(i)._2, d(i + g)._2)
      if dist <= 40
    } yield {
      val (a, b) = (d(i)._1, d(i + g)._1)
      (math.min(a, b), math.max(a, b), g.toLong, dist.toLong)
    }).toSet
    val got = Resolution.q136SortedNeighborhood(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("gap"), r.getAs[Long]("dist"))).toSet
    assert(got == expected, s"got ${got.size} pairs expected ${expected.size}")
    assert(got.nonEmpty, "fixture must contain sorted-adjacent near-dups")
  }

  test("q136 plans the neighbor probe as an equi join on rank+j — never a theta join") {
    val plan = Resolution.q136SortedNeighborhood(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("q142: cascade purge counts match a driver-side key-set replay") {
    val custs = Tables.customer(spark, sfDir).select($"c_custkey").collect()
      .map(_.getLong(0))
    val tomb = custs.filter(_ % 100 == 0).toSet
    val orders = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val purgedOrd = orders.filter(o => tomb(o._2)).map(_._1).toSet
    val liKeys = Tables.lineitem(spark, sfDir).select($"l_orderkey").collect()
      .map(_.getLong(0))
    val expected = Map(
      "customer" -> ((custs.length.toLong, tomb.size.toLong)),
      "orders" -> ((orders.length.toLong, purgedOrd.size.toLong)),
      "lineitem" -> ((liKeys.length.toLong, liKeys.count(purgedOrd).toLong)))
    val got = Contracts.q142ErasureAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("table_name") ->
        ((r.getAs[Long]("n_before"), r.getAs[Long]("n_purged")))).toMap
    assert(got == expected, s"got $got expected $expected")
    Contracts.q142ErasureAudit(spark, sfDir).collect().foreach(r =>
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") - r.getAs[Long]("n_purged")))
  }

  test("q143: greedy coverage picks match an exhaustive driver-side greedy") {
    val docGrams = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").collect()
      .map { r =>
        val t = r.getString(1).trim.split(" ", -1)
        r.getLong(0) -> (if (t.length < 2) Set.empty[String]
          else t.sliding(2).map(_.mkString(" ")).toSet)
      }.toMap
    var covered = Set.empty[String]
    val expected = (1 to 3).map { round =>
      val (doc, gain) = docGrams.view
        .map { case (d, g) => (d, (g -- covered).size.toLong) }
        .minBy { case (d, g) => (-g, d) }
      covered ++= docGrams(doc)
      (round.toLong, doc, gain)
    }
    val rows = Corpus.q143GreedyCoverage(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("gain"), r.getAs[Long]("covered_after")))
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq == expected,
      s"got ${rows.toSeq} expected $expected")
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq,
      "greedy gains must be non-increasing (submodularity)")
    assert(rows.last._4 == rows.map(_._3).sum,
      "covered_after must be the running gain sum")
  }

  test("q146: percent-of-parent shares obey the floor-sum bound at both levels") {
    val rows = Analytics.q146PercentOfParent(spark, sfDir).collect()
      .map(r => (r.getAs[String]("r_name"), r.getAs[Long]("rev_cents"),
        r.getAs[Long]("nation_share_bp"), r.getAs[Long]("region_share_bp")))
    rows.groupBy(_._1).foreach { case (region, ns) =>
      val bp = ns.map(_._3).sum
      assert(bp <= 10000 && bp > 10000 - ns.length,
        s"$region: nation shares must floor-sum into (10000-n, 10000], got $bp")
    }
    val regionBp = rows.groupBy(_._1).values.map(_.head._4).sum
    assert(regionBp <= 10000 && regionBp > 10000 - rows.groupBy(_._1).size)
  }

  test("q147: anomaly flags match a driver-side trailing-window replay") {
    import org.apache.spark.sql.functions.unix_micros
    val days = Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000L))
      .groupBy(identity).map { case ((u, d), v) => (u, d, v.size.toLong) }.toSeq
    val byUser = days.groupBy(_._1)
    val expected = (for {
      (u, ds) <- byUser.toSeq
      (_, d, cnt) <- ds
      trail = ds.filter(x => x._2 >= d - 28 && x._2 <= d - 1).map(_._3).sum
      if trail > 0 && cnt * 28 > trail * 3
    } yield (u, d, cnt, trail)).toSet
    val got = Temporal.q147RateAnomaly(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("epoch_day"),
        r.getAs[Long]("cnt"), r.getAs[Long]("trail_cnt"))).toSet
    assert(got == expected, s"got ${got.size} flags expected ${expected.size}")
    assert(got.nonEmpty, "fixture must contain rate anomalies")
  }

  test("q150: first-digit census replays exactly; Benford constants fixed") {
    val digits = Tables.orders(spark, sfDir).select($"o_totalprice").collect()
      .map(r => math.round(r.getDouble(0) * 100))
      .filter(_ > 0).map(_.toString.head.asDigit)
    val expected = digits.groupBy(identity).map { case (d, v) =>
      d.toString -> v.size.toLong
    }
    val rows = Contracts.q150BenfordAudit(spark, sfDir).collect()
    val got = rows.map(r => r.getAs[String]("digit") -> r.getAs[Long]("n")).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.sum == digits.length, "every positive total lands in a digit")
    val benford = Map("1" -> 3010L, "2" -> 1761L, "9" -> 458L)
    rows.filter(r => benford.contains(r.getAs[String]("digit"))).foreach(r =>
      assert(r.getAs[Long]("benford_bp") == benford(r.getAs[String]("digit"))))
  }

  test("q154: equi-width bands partition the fact exactly; edges pure integer") {
    val cents = Tables.orders(spark, sfDir).select($"o_totalprice").collect()
      .map(r => math.round(r.getDouble(0) * 100))
    val (lo, hi) = (cents.min, cents.max)
    val w = (hi - lo) / 20 + 1
    val expected = cents.groupBy(c => (c - lo) / w)
      .map { case (b, cs) => b -> ((cs.length.toLong, cs.sum)) }
    val got = Analytics.q154EquiwidthHist(spark, sfDir).collect()
      .map(r => r.getAs[Long]("band") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_cents")))).toMap
    assert(got == expected)
    assert(got.keys.forall(b => b >= 0 && b < 20), "max must land inside band 19")
    assert(got.values.map(_._1).sum == cents.length)
  }

  test("q155: weighted median matches the driver-sorted cumulative-weight walk") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, v) => (v, id) }
    val tot = docs.map(_._2).sum
    var cum = 0L
    val (medLen, medCum) = docs.iterator.map { case (_, v) =>
      cum += v; (v, cum)
    }.find(_._2 * 2 >= tot).get
    val r = Selection.q155WeightedMedian(spark, sfDir).collect()(0)
    assert((r.getAs[Long]("median_len"), r.getAs[Long]("cum"),
      r.getAs[Long]("tot")) == ((medLen, medCum, tot)))
  }

  test("q153: cohort LTV conserves cohort purchase value at the curve's end") {
    import org.apache.spark.sql.functions.{round => sround}
    val totalMicro = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .agg(org.apache.spark.sql.functions.sum(
        sround($"value" * 1000000).cast("long"))).collect()(0).getLong(0)
    val rows = Events.q153CohortLtv(spark, sfDir).collect()
    val lastCumPerCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_week"))
      .map { case (_, rs) => rs.maxBy(_.getAs[Long]("week_offset")).getAs[Long]("cum_micro") }
    assert(lastCumPerCohort.sum == totalMicro,
      "end-of-curve cumulative value must equal total purchase value")
    rows.groupBy(_.getAs[java.sql.Date]("cohort_week")).values.foreach { rs =>
      val cums = rs.sortBy(_.getAs[Long]("week_offset")).map(_.getAs[Long]("cum_micro"))
      assert(cums.toSeq == cums.sorted.toSeq, "LTV curves are monotone")
    }
  }

  test("q137: rendezvous minimal-movement property holds exactly") {
    val rows = Corpus.q137RendezvousSharding(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_moved")))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum == nDocs, "every doc routed exactly once")
    rows.foreach { case (shard, n, moved) =>
      if (shard == 3L)
        assert(moved == n, "removing shard 3 must relocate ALL of its docs")
      else
        assert(moved == 0L,
          s"shard $shard: HRW must not move docs between surviving shards")
    }
  }

  test("q168: l distribution replays from a driver-side QI fold") {
    val custs = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment", $"c_nationkey", $"c_acctbal")
      .collect()
      .map(r => (r.getLong(0),
        (r.getString(1), r.getInt(2), math.floor(r.getDouble(3) / 1000).toLong)))
    val prio = Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lByGroup = custs.groupBy(_._2).map { case (_, members) =>
      members.flatMap(m => prio.getOrElse(m._1, Set.empty)).toSet.size.toLong
    }
    val exp = lByGroup.groupBy(identity).map { case (l, ls) =>
      l -> ls.size.toLong }
    val got = Contracts.q168LDiversity(spark, sfDir).collect()
      .map(r => r.getAs[Long]("l") ->
        ((r.getAs[Long]("n_groups"), r.getAs[Boolean]("homogeneity_risk"))))
      .toMap
    assert(got.view.mapValues(_._1).toMap == exp, s"got $got expected $exp")
    got.foreach { case (l, (_, risk)) => assert(risk == (l < 3)) }
    assert(got.keySet.exists(_ < 3),
      "fixture must contain at least one homogeneity-risk group")
  }

  test("q182: mismatched merkle buckets replay from a driver-side checksum fold") {
    def h(s: String): Long = graft.functions.Md5Prefix60.hash(s.getBytes)
    val M = BigInt(1000000000000000L)
    val rows = Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_orderstatus",
        "CAST(round(o_totalprice * 100) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val prev = rows.filter(_._1 % 1501 != 0)
      .map { case (k, st, c) => (k, st, if (k % 1024 == 0) c + 1 else c) } ++
      rows.filter(_._1 % 1777 == 0)
        .map { case (k, st, c) => (k + 2000000000L, st, c) }
    def levels(side: Seq[(Long, String, Long)]): Map[(Long, Long), (Long, Long)] = {
      val leaves = side
        .groupBy { case (k, _, _) => math.floorMod(h(k.toString), 256L) }
        .map { case (b, ms) => b -> ((ms.size.toLong,
          ms.map(m => BigInt(h(s"${m._1}|${m._2}|${m._3}"))).sum)) }
      val leaf = leaves.map { case (b, (n, hs)) =>
        (2L, b) -> ((n, (hs % M).toLong)) }
      val sup = leaves.groupBy(_._1 / 16).map { case (b, ms) =>
        (1L, b) -> ((ms.values.map(_._1).sum,
          (ms.values.map(_._2).sum % M).toLong)) }
      leaf ++ sup
    }
    val p = levels(prev)
    val c = levels(rows)
    val expected = (p.keySet ++ c.keySet).toSeq.flatMap { key =>
      val (pv, cv) = (p.get(key), c.get(key))
      if (pv == cv) None
      else Some(key -> ((pv.map(_._1).getOrElse(0L), cv.map(_._1).getOrElse(0L),
        pv.map(_._2).getOrElse(-1L), cv.map(_._2).getOrElse(-1L))))
    }.toMap
    val got = Reconcile.q182MerkleDiff(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("bucket")) ->
        ((r.getAs[Long]("n_prev"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("chk_prev"), r.getAs[Long]("chk_cur")))).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.keys.exists(_._1 == 2L),
      "fixture perturbation must produce at least one mismatched leaf")
    // the Merkle drill-down invariant: a mismatched leaf ALWAYS has a
    // mismatched super (commutative sums make parent = Σ children)
    got.keys.filter(_._1 == 2L).foreach { case (_, b) =>
      assert(got.contains((1L, b / 16)),
        s"leaf $b mismatched but super ${b / 16} reported clean") }
  }

  test("q182 locates: mismatched leaves are a strict subset of 256") {
    val leaves = Reconcile.q182MerkleDiff(spark, sfDir)
      .filter("level = 2").count()
    assert(leaves > 0 && leaves < 256,
      s"anti-entropy must narrow the repair set, got $leaves leaves")
  }

  test("q212: integer Wilson bound tracks the float formula; isqrt exact") {
    val rows = Contracts.q212WilsonBound(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_defect"))
      val (rate, ub) = (r.getAs[Long]("rate_bp"), r.getAs[Long]("wilson_ub_bp"))
      assert(r.getAs[Boolean]("ub_dominates") && ub >= rate)
      // float replay of the textbook formula — the integer build must
      // land within 1 bp (one floored radicand + three floored divides)
      val z2 = 3.8416
      val p = k.toDouble / n
      val fub = (p + z2 / (2 * n) + math.sqrt(
        z2 * p * (1 - p) / n + z2 * z2 / (4.0 * n * n)) * 1.0) /
        (1 + z2 / n)
      assert(math.abs(ub - fub * 10000).toLong <= 1,
        s"integer Wilson diverged: n=$n k=$k ub_bp=$ub float=${fub * 10000}")
      // even k = 0 must carry a strictly positive ceiling
      if (k == 0) assert(ub > 0, "zero observed defects still need a ceiling")
    }
  }

  test("q211: fixture assignment is healthy and the identity is internally consistent") {
    val r = Contracts.q211SrmAudit(spark, sfDir).collect()(0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na > 0 && nb > 0)
    assert(r.getAs[Long]("chi2_micro") ==
      (na - nb) * (na - nb) * 1000000L / (na + nb))
    assert(!r.getAs[Boolean]("srm_flag"),
      s"md5 hex-digit split must pass SRM on the fixture: $na vs $nb")
  }

  test("q208: delta-join identity holds and every cross term is exercised") {
    import spark.implicits._
    val rows = Reconcile.q208JoinIvm(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("counts_match") &&
        r.getAs[Boolean]("revenue_match"),
        s"IVM algebra diverged for ${r.getString(0)}")
    }
    // the identity is only a real test if all four terms are non-empty —
    // check the split rules actually produce joined rows in each class
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey", ($"o_orderkey" % 10 === 0).as("d_o"))
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", (($"l_orderkey" + $"l_linenumber") % 7 === 3).as("d_l"))
    val j = o.join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"d_o", $"d_l").count().collect()
    assert(j.length == 4, s"expected all 4 base/delta classes, got ${j.toSeq}")
  }
}
