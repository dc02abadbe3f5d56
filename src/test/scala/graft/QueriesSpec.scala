package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query executes at sf0.001 with a sane shape; queries
  * whose fixtures guarantee output are additionally rows>0. The value-level
  * gate is the driver's DuckDB oracle (tools/check.py locally).
  */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  // Pair-finding queries can legitimately be empty on a tiny SF; everything
  // else must produce rows at sf0.001.
  private val mayBeEmpty = Set("q31_minhash_lsh", "q32_simhash", "q33_ngram_jaccard",
    "q7_customers_without_orders", "q46_embedding_neardup")

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
