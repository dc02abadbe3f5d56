package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, IntersectCountSortedLong, Md5Prefix60}

/** SparkSessionExtensions entry point: installs graft's native expressions
  * into the session function registry so they are first-class SQL
  * functions — usable from `spark.sql`, visible to Catalyst, codegen'd.
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * or SparkSession.builder().withExtensions(new GraftExtensions) ...
  *
  * This is the library's registration seam: a custom Rule/Strategy (e.g. a
  * top-k-similarity → LSH-prefilter rewrite, SURVEY.md §4 item c) would be
  * injected here too once benchmarks justify it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float/double arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float/double arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("intersect_count"),
      info("intersect_count", "intersect_count(a, b) - intersection size of two sorted bigint arrays"),
      (exprs: Seq[Expression]) => IntersectCountSortedLong(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("md5_prefix60"),
      info("md5_prefix60", "md5_prefix60(s) - first 60 bits of md5(s) as a non-negative bigint (engine-portable hash)"),
      (exprs: Seq[Expression]) => Md5Prefix60(exprs(0))))
  }
}
