package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Md5Prefix60 must be value-identical to the composed portable form
  * `CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)` it replaces —
  * that equality is what keeps the dedup family oracle-checkable.
  */
class HashFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("md5 prefix60 equals the conv/substr composed expression") {
    val rnd = new scala.util.Random(7)
    val strs = Seq("", " ", "a", "the quick brown fox", "naïve café — ünïcode") ++
      Seq.fill(2000)(rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString)
    val df = strs.toDF("s")
      .withColumn("native", Md5Prefix60($"s"))
      .withColumn("composed",
        expr("CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)"))
    assert(df.filter($"native" =!= $"composed").count() == 0)
    // non-negative 60-bit range
    assert(df.filter($"native" < 0 || $"native" >= (1L << 60)).count() == 0)
  }

  test("md5 prefix60 driver-side helper agrees with the expression") {
    val s = "alpha beta"
    val fromDf = Seq(s).toDF("s").select(Md5Prefix60($"s")).head().getLong(0)
    assert(Md5Prefix60.hash(s.getBytes("UTF-8")) == fromDf)
  }
}
