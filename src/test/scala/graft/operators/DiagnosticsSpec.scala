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
}
