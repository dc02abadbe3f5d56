package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Value-level checks for the sketch and vocabulary-census queries beyond
  * the driver's oracle gate: the HLL production rollup must actually land
  * inside its error envelope against exact truth, and the two-stage global
  * rank must equal a driver-side reference computation.
  */
class AnalyticsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q96 sketch-only rollup: booleans true AND estimates near exact truth") {
    val rows = Analytics.q96DistinctSketch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("orders_sketches_agree"), r.toString)
      assert(r.getAs[Boolean]("orders_est_bounded"), r.toString)
      assert(r.getAs[Boolean]("parts_sketches_agree"), r.toString)
      assert(r.getAs[Boolean]("parts_est_bounded"), r.toString)
    }
    // the cross-sketch gate is weaker than truth by construction — also
    // assert, test-side, that the high-precision sketch the query runs
    // (DataSketches lgK=14, rse ≈ 0.0081) is within 4 standard errors of
    // the EXACT distinct count (what q42 checks in-query)
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct($"l_orderkey").as("d"),
        org.apache.spark.sql.functions
          .expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 14))").as("e"))
      .collect()
    exact.foreach { r =>
      val (d, e) = (r.getAs[Long]("d"), r.getAs[Long]("e"))
      assert(math.abs(e - d).toDouble / d <= 0.04, s"est $e vs exact $d")
    }
  }

  test("q68 two-stage global rank equals a driver-side reference") {
    val got = Corpus.q68VocabCoverage(spark, sfDir).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"),
        r.getAs[Long]("rank"), r.getAs[Double]("cum_share")))
    // independent reference: collect raw token counts, sort, prefix-sum
    val counts = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim($"text"), " ")).as("t"))
      .groupBy($"t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ordered = counts.sortBy { case (t, c) => (-c, t) }
    val total = ordered.map(_._2).sum
    var cum = 0L
    val expected = ordered.zipWithIndex.flatMap { case ((t, c), i) =>
      cum += c
      if (c >= 5) Some((t, c, (i + 1).toLong, cum.toDouble / total)) else None
    }
    assert(got.toSeq == expected.toSeq)
  }

  test("q122: aggregation-only mode equals window-rank reference, no Window in plan") {
    val got = Analytics.q122ModalPriority(spark, sfDir).collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[String]("modal_priority"),
        r.getAs[Long]("cnt"), r.getAs[Long]("n_orders")))
    // independent driver-side reference with the same tie-break
    val raw = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = raw.groupBy(_._1).map { case (seg, rs) =>
      val counts = rs.groupBy(_._2).map { case (p, v) => (p, v.size.toLong) }
      val (pri, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      (seg, pri, cnt, rs.size.toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected)
    val plan = Analytics.q122ModalPriority(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"),
      "mode must stay pure aggregation — no per-group sort/window")
  }

  test("q152: per-segment OLS slopes match an exact BigInt replay (negatives included)") {
    import org.apache.spark.sql.functions._
    val pts = graft.sources.Tables.orders(spark, sfDir)
      .join(graft.sources.Tables.customer(spark, sfDir),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment".as("segment"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)")
          .as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("y"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val expected = pts.groupBy(_._1).map { case (seg, ps) =>
      val n = BigInt(ps.length)
      val sx = ps.map(_._2).sum; val sy = ps.map(_._3).sum
      val sxy = ps.map(p => p._2 * p._3).sum
      val sxx = ps.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      // sign-split trunc-toward-zero, matching both engines' construction
      val slope = if (num < 0) -((-num * 1000000) / den) else (num * 1000000) / den
      seg -> ((ps.length.toLong, slope.toLong))
    }
    val got = Analytics.q152SegmentTrend(spark, sfDir).collect()
      .map(r => r.getAs[String]("segment") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("slope_micro")))).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("q177: bridge additivity is exact and the volume effect replays in BigInt") {
    val rows = Analytics.q177RevenueBridge(spark, sfDir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (ra, rb) = (BigInt(r.getAs[Long]("rev_a")), BigInt(r.getAs[Long]("rev_b")))
      val (qa, qb) = (BigInt(r.getAs[Long]("qty_a")), BigInt(r.getAs[Long]("qty_b")))
      val num = (qb - qa) * ra * 1000
      val vol = if (num < 0) -((-num) / qa) else num / qa
      assert(BigInt(r.getAs[Long]("volume_effect_milli")) == vol)
      assert(r.getAs[Long]("delta_milli") ==
        r.getAs[Long]("volume_effect_milli") + r.getAs[Long]("price_effect_milli"),
        "volume + price must reconstruct the delta EXACTLY — residual assignment")
      assert(r.getAs[Long]("delta_milli") == (rb - ra).toLong * 1000)
    }
    assert(rows.exists(_.getAs[Long]("volume_effect_milli") < 0),
      "fixture must exercise the negative-quotient sign split")
  }

  test("q175: jackknife variance replays from an MD5-sliced driver fold") {
    def md5first(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString.take(1)
    val rows = graft.sources.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => (md5first(r.getLong(0).toString), math.round(r.getDouble(1) * 100)))
    val slices = rows.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val n = rows.length.toLong
    val tot = rows.map(_._2).sum
    val loo = slices.values.toSeq.map { case (ng, sg) =>
      (tot - sg) * 1000L / (n - ng) }
    val bar = loo.sum / loo.length
    val ss = loo.map(m => BigInt(m - bar) * BigInt(m - bar)).sum
    val expVar = (BigInt(loo.length - 1) * ss / loo.length).toLong
    val r = Analytics.q175JackknifeVariance(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_orders") == n)
    assert(r.getAs[Long]("total_cents") == tot)
    assert(r.getAs[Long]("mean_micro") == tot * 1000000L / n)
    assert(r.getAs[Long]("jk_var_milli2") == expVar,
      s"got ${r.getAs[Long]("jk_var_milli2")} expected $expVar")
    assert(slices.size == 16, "md5 first hex char must populate all 16 slices")
  }

  test("q198: Theil-Sen slopes replay from a driver-side pairwise fold") {
    val pts = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .selectExpr("c_mktsegment",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT) div 7",
        "CAST(round(o_totalprice * 100) AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).sum).toSeq
      .map { case ((s, w), y) => (s, w, y) }
    val expected = pts.groupBy(_._1).map { case (seg, xs) =>
      val slopes = for {
        a <- xs; b <- xs if b._2 > a._2
      } yield {
        val num = BigInt(b._3 - a._3) * 1000000
        val den = BigInt(b._2 - a._2)
        (if (num < 0) -((-num) / den) else num / den).toLong
      }
      val sorted = slopes.toSeq.sorted
      // min v with 2·cum >= n == the ceil(n/2)-th smallest (low median)
      seg -> ((slopes.size.toLong,
        sorted(((sorted.size + 1) / 2) - 1)))
    }
    val got = Analytics.q198TheilSen(spark, sfDir).collect()
      .map(r => r.getAs[String]("segment") ->
        ((r.getAs[Long]("n_pairs"),
          r.getAs[Long]("theilsen_slope_micro")))).toMap
    assert(got == expected, s"got $got expected $expected")
    // pair counts are exactly C(weeks-with-distinct-key, 2) per segment
    pts.groupBy(_._1).foreach { case (seg, xs) =>
      val k = xs.size.toLong
      assert(got(seg)._1 == k * (k - 1) / 2) }
  }

  test("q186: RFM cells equal a sorted-array quintile replay") {
    val metrics = Tables.orders(spark, sfDir)
      .selectExpr("o_custkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)",
        "CAST(round(o_totalprice * 100) AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .groupBy(_._1)
      .map { case (ck, os) =>
        (ck, os.map(_._2).max, os.size.toLong, os.map(_._3).sum) }.toSeq
    val n = metrics.size.toLong
    def cuts(vs: Seq[Long]): Seq[Long] = {
      val sorted = vs.sorted
      // min v with cum*5 >= n*k == the ceil(n*k/5)-th smallest
      (1 to 4).map(k => sorted((((n * k + 4) / 5) - 1).toInt))
    }
    val (rc, fc, mc) =
      (cuts(metrics.map(_._2)), cuts(metrics.map(_._3)), cuts(metrics.map(_._4)))
    def score(v: Long, cs: Seq[Long]): Long = 1L + cs.count(v > _)
    val expected = metrics
      .map { case (ck, r, f, m) => (score(r, rc), score(f, fc), score(m, mc), ck) }
      .groupBy { case (r, f, m, _) => (r, f, m) }
      .map { case (k, cs) => k -> ((cs.size.toLong, cs.map(_._4).sum)) }
    val got = Analytics.q186RfmSegments(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("f"), r.getAs[Long]("m")) ->
        ((r.getAs[Long]("n_customers"), r.getAs[Long]("cust_checksum")))).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.map(_._1).sum == n, "every ordering customer is in a cell")
    assert(got.keys.forall { case (r, f, m) =>
      Seq(r, f, m).forall(s => s >= 1 && s <= 5) }, "scores in 1..5")
    // fixture must spread: at least 3 distinct values on each axis
    assert(got.keys.map(_._1).toSet.size >= 3)
    assert(got.keys.map(_._2).toSet.size >= 3)
    assert(got.keys.map(_._3).toSet.size >= 3)
  }
}
