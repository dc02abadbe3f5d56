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
