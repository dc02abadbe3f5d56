package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable join operators beyond Spark's built-ins (SURVEY.md §2.3):
  * generic as-of alignment and skew-salted equi joins. Both are plan
  * combinators over DataFrames — no custom physical operators needed, the
  * patterns compose from exchanges/windows Catalyst already optimizes.
  */
object Joins {

  /** As-of join: for each left row, attach the latest right row with
    * `right.tsCol <= left.tsCol` per key — via union + running `last()`
    * over one (key)-shuffle, O(n log n) in the partition sort, never a
    * per-key nested loop or range cross product. Right value columns come
    * back null when no prior right row exists (left outer as-of).
    *
    * At equal timestamps the right row is considered visible to the left
    * row (<= semantics), implemented by sorting right-markers first.
    * When multiple right rows share the same (key, ts), ties are broken
    * by the greatest value tuple (the window also orders by the value
    * columns) — a deterministic total order, so the result is identical
    * under any partitioning or retry.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__kind", lit(1))
    val r = right.select(
      (Seq(col(key), col(tsCol), lit(0).as("__kind")) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    // align schemas: left gets null __v_ columns, right gets null left cols
    val leftCols = left.columns
    val lAligned = valueCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__v_$c", lit(null).cast(right.schema(c).dataType)))
    val rAligned = leftCols.filterNot(c => c == key || c == tsCol)
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(lAligned.columns.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy((Seq(col(tsCol), col("__kind")) ++
        valueCols.map(c => col(s"__v_$c"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(lAligned.unionByName(rAligned))((df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w)))
    filled.filter(col("__kind") === 1)
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c"))): _*)
  }

  /** Salted equi join for skewed keys: replicate the (small) right side
    * `saltFactor` ways and scatter the left side's hot keys uniformly, so
    * one executor no longer owns an entire hot key. AQE's skew-join split
    * handles moderate skew automatically; salting is the explicit fix when
    * a single key exceeds what one task should hold.
    *
    * The salt is a deterministic hash of the whole left row — NOT
    * rand(seed), whose per-partition stream re-salts rows differently if
    * AQE re-coalesces partitions between a task's attempts, corrupting
    * the join under retry. Identical left rows share a salt (slightly
    * uneven scatter), which is safe: correctness never depends on which
    * salt a row gets.
    *
    * Right/full outer joins are rejected: the right side is replicated
    * `saltFactor` ways, so an unmatched right row would surface once per
    * replica.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin replicates the right side; '$joinType' would duplicate unmatched right rows")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = right
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Range join: pairs within a time window (|l.ts - r.ts| bounds). Spark
    * plans theta conditions as BroadcastNestedLoopJoin when one side fits;
    * callers should pre-filter/bucket at very large scale (or use the
    * asOf form when "latest before" is the real question).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond)
}
