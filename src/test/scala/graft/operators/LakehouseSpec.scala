package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FormattedMode
import graft.SparkSpec

/** Value- and plan-shape checks for the lakehouse/CDC/resolution queries
  * beyond the driver's oracle gate: the Z-order audit must actually show
  * the skipping win it exists to measure (and plan with no global-order
  * window), the SCD2 dimension must tile each user's history exactly,
  * the CDC merge must preserve the keyed-snapshot invariants, and the
  * fuzzy blocked join must plan as an equi-join, never a nested loop.
  */
class LakehouseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q109: z-order layout prunes more shards than linear for key and conjunctive probes") {
    val rows = Lakehouse.q109ZorderLayout(spark, sfDir).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_shards"), r.getAs[Long]("shards_key_probe"),
          r.getAs[Long]("shards_both_probe"))).toMap
    val (ln, lkey, lboth) = rows("linear")
    val (zn, zkey, zboth) = rows("zorder")
    assert(ln > 1 && zn > 1, s"degenerate shard counts: $rows")
    // linear layout cannot prune on the non-sort key: reads every shard
    assert(lkey == ln, s"linear key probe should scan all shards: $rows")
    // z-order reads a small fraction for the key probe and fewer shards
    // than linear for the conjunctive probe
    assert(zkey * 4 <= ln, s"z-order key probe should scan <= 1/4 of shards: $rows")
    assert(zboth < lboth || (zboth <= 2 && lboth <= 2), s"conjunctive probe: $rows")
  }

  test("q109 plans with no window (value-range sharding, not ntile)") {
    val plan = Lakehouse.q109ZorderLayout(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("Window"), "shard assignment must not need a global-order window")
  }

  test("q110: SCD2 episodes tile each user's history — one current row per user, half-open intervals chain") {
    val rows = Lakehouse.q110Scd2Dim(spark, sfDir).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq == (1L to rs.length.toLong),
        s"user $u versions not dense")
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1, s"user $u current rows")
      assert(sorted.last.getAs[Boolean]("is_current"), s"user $u last row must be current")
      // each row's effective_to equals the next row's effective_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("effective_to") ==
            b.getAs[java.sql.Timestamp]("effective_from"), s"user $u gap in validity chain")
          assert(a.getAs[String]("status") != b.getAs[String]("status"),
            s"user $u consecutive episodes share a status — change filter broken")
        case _ =>
      }
    }
  }

  test("q111: CDC merge preserves keyed-snapshot invariants") {
    val rows = Lakehouse.q111CdcMerge(spark, sfDir).collect()
    val keys = rows.map(_.getAs[Long]("cust_key"))
    assert(keys.distinct.length == keys.length, "merge output must be keyed")
    val byChange = rows.groupBy(_.getAs[String]("change")).view.mapValues(_.length).toMap
    // harness data produces all three outcomes: untouched base rows,
    // updated base rows, and inserts from users >= the base cutoff
    assert(byChange.keySet == Set("kept", "updated", "inserted"), byChange.toString)
    // driver-side reference: each key's last op decides its fate
    val lastOps = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts", $"event_id").collect()
      .groupBy(_.getLong(0)).map { case (u, es) =>
        u -> es.maxBy(e => (e.getAs[java.sql.Timestamp]("ts").getTime,
          e.getAs[Long]("event_id"))).getAs[String]("event_type")
      }
    // parity split: inserts are event users absent from the even-key
    // base; updates are even event users; kept rows saw no change at all
    rows.foreach { r =>
      val k = r.getAs[Long]("cust_key")
      r.getAs[String]("change") match {
        case "inserted" => assert(k % 2 == 1 && lastOps(k) != "error", r.toString)
        case "updated"  => assert(k % 2 == 0 && lastOps(k) != "error", r.toString)
        case "kept"     => assert(k % 2 == 0 && !lastOps.contains(k), r.toString)
      }
    }
    // a key whose last event is 'error' must be absent entirely
    val deleted = lastOps.collect { case (u, "error") => u }.toSet
    assert(deleted.nonEmpty, "fixture should contain trailing-delete users")
    assert(keys.toSet.intersect(deleted).isEmpty, "deleted keys leaked into the snapshot")
  }

  test("q112 plans as an equi-join on the block key — no nested loop, no cartesian") {
    val plan = Resolution.q112FuzzyMatch(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(30).mkString("\n"))
  }

  test("q112 recovers the planted near-dup pairs, including nonzero-distance fuzzy hits") {
    val rows = Resolution.q112FuzzyMatch(spark, sfDir).collect()
    assert(rows.length >= 20, s"expected the planted near-dup pairs, got ${rows.length}")
    assert(rows.exists(_.getAs[Long]("dist") > 0), "no nonzero-distance hit — filter is vacuous")
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("q110/q113/q114 plan with a single data shuffle on the entity key") {
    // the two windows (q110), the RANGE frame (q113), and the
    // window+window+aggregate chain (q114) must all reuse ONE
    // hash-partitioning on the entity key — hashpartitioning on user_id
    // satisfies the (user_id, island) aggregate's clustered distribution
    for (name <- Seq("q110_scd2_dim", "q113_range_frame", "q114_interval_merge")) {
      val p = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      // count hash exchanges via their Arguments lines (the final
      // orderBy's rangepartitioning exchange is presentation, not a
      // per-key data shuffle)
      val dataShuffles = "hashpartitioning\\(".r.findAllIn(p).size
      assert(dataShuffles == 1, s"$name: expected 1 hash exchange, got $dataShuffles\n" +
        p.linesIterator.filter(l => l.contains("Exchange") || l.contains("partitioning"))
          .mkString("\n"))
    }
  }

  test("q113: RANGE frame includes same-day peers and trailing week only") {
    val rows = Lakehouse.q113RangeFrame(spark, sfDir).collect()
    // driver-side reference on one customer
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    val (cust, rs) = byCust.maxBy(_._2.length)
    val orders = rs.map(r => (r.getAs[Long]("day"), r.getAs[Long]("o_orderkey")))
    val cents = graft.sources.Tables.orders(spark, sfDir)
      .filter($"o_custkey" === cust)
      .select($"o_orderkey", org.apache.spark.sql.functions.round($"o_totalprice" * 100)
        .cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rs.foreach { r =>
      val d = r.getAs[Long]("day")
      val expect = orders.filter { case (d2, _) => d2 >= d - 6 && d2 <= d }
      assert(r.getAs[Long]("n_orders_7d") == expect.length, r.toString)
      assert(r.getAs[Long]("rev7_cents") == expect.map(x => cents(x._2)).sum, r.toString)
    }
  }
}
