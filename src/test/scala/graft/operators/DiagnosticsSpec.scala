package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Driver-side replays for the operability diagnostics (q144/q145). */
class DiagnosticsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q144: band histogram matches an exact driver-side recount (events.user_id)") {
    val counts = Tables.events(spark, sfDir).select($"user_id").collect()
      .map(_.getLong(0)).groupBy(identity).map(_._2.length.toLong)
    val expected = counts.groupBy(c => 63 - java.lang.Long.numberOfLeadingZeros(c))
      .map { case (band, cs) => band.toLong -> ((cs.size.toLong, cs.sum)) }
    val got = Diagnostics.q144SkewCensus(spark, sfDir).collect()
      .filter(_.getAs[String]("col_name") == "events.user_id")
      .map(r => r.getAs[Long]("band") ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("n_rows")))).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.values.map(_._2).sum == counts.sum, "every row lands in a band")
  }

  test("q145: exact pair count replays; bucket bound is a valid upper bound") {
    val cnts = Tables.lineitem(spark, sfDir).select($"l_partkey").collect()
      .map(_.getLong(0)).groupBy(identity).map(_._2.length.toLong)
    val r = Diagnostics.q145JoinCardEstimate(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("exact_pairs") == cnts.map(c => c * c).sum)
    assert(r.getAs[Long]("n_keys") == cnts.size)
    assert(r.getAs[Boolean]("ub_ge_exact"), "Σ_b tot_b² ≥ Σ_k cnt_k² is a theorem")
    assert(r.getAs[Long]("ratio_bp") >= 10000L)
  }

  test("q157: every chi-square cell replays exactly in BigInt") {
    val rows = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = rows.groupBy(identity).map { case (k, v) => k -> BigInt(v.length) }
    val rowM = cells.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val colM = cells.groupBy(_._1._2).map { case (p, m) => p -> m.values.sum }
    val n = BigInt(rows.length)
    val got = Diagnostics.q157ChiSquare(spark, sfDir).collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      val k = (r.getAs[String]("segment"), r.getAs[String]("priority"))
      val (o, rn, cn) = (cells(k), rowM(k._1), colM(k._2))
      assert(BigInt(r.getAs[Long]("o")) == o)
      assert(BigInt(r.getAs[Long]("e_milli")) == rn * cn * 1000 / n)
      val dev = o * n - rn * cn
      assert(BigInt(r.getAs[Long]("contrib_micro")) ==
        dev * dev * 1000000 / (rn * cn * n))
    }
    // per-row (and by symmetry per-column) cross-multiplied deviations
    // telescope to zero — the margin arithmetic is consistent
    cells.groupBy(_._1._1).foreach { case (s, m) =>
      assert(m.map { case ((_, p), o) => o * n - rowM(s) * colM(p) }.sum == 0)
    }
  }

  test("q169: gap census equals the naive sorted-scan replay, and conserves the span") {
    val ks = Tables.lineitem(spark, sfDir).select($"l_orderkey").collect()
      .map(_.getLong(0)).distinct.sorted
    val gaps = ks.zip(ks.tail).collect { case (a, b) if b - a > 1 => b - a - 1 }
    val r = Diagnostics.q169KeyGapCensus(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_keys") == ks.length.toLong)
    assert(r.getAs[Long]("min_key") == ks.head && r.getAs[Long]("max_key") == ks.last)
    assert(r.getAs[Long]("n_gaps") == gaps.length.toLong)
    assert(r.getAs[Long]("n_missing") == gaps.sum)
    assert(r.getAs[Long]("max_gap") == (if (gaps.isEmpty) 0L else gaps.max))
    assert(r.getAs[Boolean]("conservation_ok"),
      "span − n_keys must equal total missing — a lost boundary gap breaks this")
    assert(gaps.nonEmpty, "fixture must contain lineitem-less orders")
  }

  test("q160: per-column profile replays on price; string columns profile null extrema") {
    val got = Diagnostics.q160ColumnProfile(spark, sfDir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(got.size == 11)
    val prices = Tables.lineitem(spark, sfDir).select($"l_extendedprice")
      .collect().map(_.getDouble(0))
    val cents = prices.map(p => math.round(p * 100))
    val pr = got("l_extendedprice")
    assert(pr.getAs[Long]("n_rows") == prices.length.toLong)
    assert(pr.getAs[Long]("n_null") == 0L)
    assert(pr.getAs[Long]("n_distinct") == prices.distinct.length.toLong)
    assert(pr.getAs[Long]("min_v") == cents.min)
    assert(pr.getAs[Long]("max_v") == cents.max)
    val rf = got("l_returnflag")
    assert(rf.isNullAt(rf.fieldIndex("min_v")) && rf.isNullAt(rf.fieldIndex("max_v")))
    assert(rf.getAs[Long]("n_distinct") == 3L)
    assert(got.values.forall(_.getAs[Long]("n_rows") == prices.length.toLong),
      "all columns census the same relation")
  }

  test("q200: both partitionings agree with each other and a driver fold") {
    val li = Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey",
        "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = Map(
      "revenue_cents" -> li.map(_._2).sum,
      "n_rows" -> li.length.toLong,
      "n_orders" -> li.map(_._1).distinct.length.toLong)
    val got = Diagnostics.q200DeterminismAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("metric") ->
        ((r.getAs[Long]("run_a"), r.getAs[Long]("run_b"),
          r.getAs[Boolean]("identical")))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (m, (a, b, id)) =>
      assert(id && a == b, s"$m diverged across partitionings: $a vs $b")
      assert(a == expected(m), s"$m: $a != driver fold ${expected(m)}")
    }
  }
}
