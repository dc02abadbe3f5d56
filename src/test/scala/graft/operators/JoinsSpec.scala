package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class JoinsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def t(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  test("asOf attaches latest right row at or before left ts") {
    val quotes = Seq((1L, t(0), 100.0), (1L, t(10), 110.0), (2L, t(5), 50.0))
      .toDF("k", "ts", "price")
    val trades = Seq((1L, t(5), "a"), (1L, t(10), "b"), (1L, t(20), "c"),
      (2L, t(0), "d"))
      .toDF("k", "ts", "tag")
    val got = Joins.asOf(trades, quotes, "k", "ts", Seq("price"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[java.lang.Double]("asof_price")))).toMap
    assert(got("a").contains(100.0))
    assert(got("b").contains(110.0)) // equal ts -> right visible
    assert(got("c").contains(110.0))
    assert(got("d").isEmpty)         // no quote yet for key 2
  }

  test("saltedJoin equals plain join") {
    val left = (1 to 1000).map(i => (i.toLong % 3, i.toLong)).toDF("k", "v")
    val right = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Joins.saltedJoin(left, right, "k", saltFactor = 8)
      .groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("asOf ties on (key, ts) resolve deterministically to the greatest value") {
    val quotes = Seq((1L, t(5), 100.0), (1L, t(5), 110.0), (1L, t(5), 90.0))
      .toDF("k", "ts", "price")
    val trades = Seq((1L, t(6), "a")).toDF("k", "ts", "tag")
    // repeat under different partitionings: same winner every time
    (1 to 3).foreach { n =>
      val got = Joins.asOf(trades, quotes.repartition(n), "k", "ts", Seq("price"))
        .collect().map(r => r.getAs[Double]("asof_price"))
      assert(got.toSeq == Seq(110.0), s"partitioning $n picked ${got.toSeq}")
    }
  }

  test("saltedJoin left_outer keeps unmatched left rows exactly once") {
    val left = Seq((0L, 1L), (1L, 2L), (9L, 3L)).toDF("k", "v") // 9 unmatched
    val right = Seq((0L, "x"), (1L, "y")).toDF("k", "name")
    val got = Joins.saltedJoin(left, right, "k", saltFactor = 4, joinType = "left_outer")
      .collect().map(r => (r.getLong(1), Option(r.getAs[String]("name"))))
    assert(got.length == 3)
    assert(got.toMap.apply(3L).isEmpty)
  }

  test("saltedJoin rejects right/full outer join types") {
    val df = Seq((0L, 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(df, df, "k", saltFactor = 2, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(df, df, "k", saltFactor = 2, joinType = "right")
    }
  }

  test("rangeJoin pairs within bounds") {
    val a = Seq((1L, 10L), (2L, 100L)).toDF("id", "x")
    val b = Seq((10L, 12L), (10L, 50L)).toDF("y", "z")
    val got = Joins.rangeJoin(a, b,
      $"x" <= $"y" && $"y" - $"x" <= 5).collect()
    assert(got.length == 2) // (10,10,12) and (10,10,50)
  }
}
