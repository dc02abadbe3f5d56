package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd merge-intersection count over two SORTED distinct long arrays.
  *
  * The pairwise-similarity kernel for set-overlap measures (n-gram Jaccard,
  * candidate verification after MinHash/LSH): documents are represented
  * once as sorted arrays of 60-bit shingle hashes, and each pair compare is
  * a linear merge — no per-pair hash-set allocation (what
  * `size(array_intersect(...))` would do in interpreted mode), no
  * inverted-index shuffle explosion when shingle frequency is high. At
  * 12.5M pairs × ~100-element arrays this is the difference between
  * seconds and minutes.
  *
  * Precondition: inputs sorted ascending, duplicates allowed but counted
  * per matching element pair advance (i.e. treat as sets — both cursors
  * advance on match).
  */
case class IntersectCountSortedLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"intersect_count expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val nx = xs.numElements(); val ny = ys.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0, $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  def intersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCountSortedLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "intersect_count",
      exprs => IntersectCountSortedLong(exprs(0), exprs(1)))
}
