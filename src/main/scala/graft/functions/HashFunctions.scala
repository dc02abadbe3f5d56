package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the repo's engine-portable 60-bit hash
  * `CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)` — the value the
  * dedup family keys every shingle join on (Dedup.h60Expr) and the DuckDB
  * oracles reproduce with `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
  *
  * The composed form pays, per distinct shingle: digest → 32-char hex
  * UTF8String → substring copy → `Conv`'s per-character base-16 decode
  * through its general radix machinery. The first 15 hex digits ARE the
  * first 60 bits of the digest, so this expression reads them straight
  * off the digest bytes: one unsigned big-endian load of bytes 0..7
  * shifted right 4 — no hex string, no substring, no radix decode.
  * HashFunctionsSpec pins value-equality with the composed expression on
  * random inputs (so oracle parity is inherited), and PlanSpec asserts
  * codegen capability.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix60 expects string, got $t")
    }

  override def nullSafeEval(s: Any): Any =
    Md5Prefix60.hash(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Prefix60.hash($s.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  /** First 60 bits of md5(bytes) as a non-negative long — numerically
    * identical to parsing the digest's first 15 hex digits base 16.
    */
  def hash(bytes: Array[Byte]): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def apply(c: Column): Column = ColumnBridge.column(Md5Prefix60(ColumnBridge.expression(c)))
}
