package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.10): element-wise centroid of Array[Float]
  * vectors via `Aggregator[IN, BUF, OUT]` — usable on
  * `Dataset.groupByKey(...).agg(CentroidAggregator.toColumn)` or registered
  * with `functions.udaf`. Buffer is (sum vector, count); merge is
  * element-wise — associative and commutative, so partial aggregation
  * (map-side combine) applies and the shuffle carries one vector per
  * group per partition, not per row.
  */
object CentroidAggregator extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    if (v == null) b
    else if (sums.isEmpty) (v.map(_.toDouble), n + 1)
    else {
      var i = 0
      while (i < sums.length && i < v.length) { sums(i) += v(i); i += 1 }
      (sums, n + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length && i < b._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.empty[Double] else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

/** Oracle-exact centroid variant: element-wise sums in scaled-integer
  * space (round(v * 1e9) as Long, HALF_UP like Spark's/DuckDB's round),
  * one double division at finish. Long sums are associative, commutative
  * AND bit-order-insensitive, so the grouped result is identical under
  * any partitioning and hash-matches a SQL oracle computing
  * `CAST(SUM(CAST(round(v * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*)`
  * — the same discipline as Similarity.q36LabelCentroids. The plain
  * [[CentroidAggregator]] keeps raw double sums for general use where
  * last-bit reproducibility across partitionings isn't required.
  */
object ExactCentroidAggregator extends Aggregator[Array[Float], (Array[Long], Long), Array[Double]] {

  private def scaled(v: Float): Long =
    BigDecimal(v.toDouble * 1e9)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).longValue

  override def zero: (Array[Long], Long) = (Array.empty[Long], 0L)

  override def reduce(b: (Array[Long], Long), v: Array[Float]): (Array[Long], Long) = {
    if (v == null) b
    else {
      val sums = if (b._1.isEmpty) new Array[Long](v.length) else b._1
      var i = 0
      while (i < sums.length && i < v.length) { sums(i) += scaled(v(i)); i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length && i < b._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Long], Long)): Array[Double] =
    if (r._2 == 0) Array.empty[Double]
    else r._1.map(s => s.toDouble / 1e9 / r._2)

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
