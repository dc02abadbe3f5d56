package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FormattedMode
import graft.SparkSpec
import graft.sources.Tables

/** Semantic + plan-shape pins for the time-series family (q118–q120,
  * q123). Semantics are cross-checked by driver-side replay over the
  * sf0.001 events fixture (the per-user series are small enough to fold
  * in plain Scala, which is a genuinely independent evaluation order);
  * plan pins hold the one-shuffle-per-user-key discipline the scaladocs
  * claim.
  */
class TemporalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val events =
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000L +
        (r.getTimestamp(1).getNanos / 1000) % 1000, r.getLong(2),
        r.getString(3), r.getDouble(4)))

  test("q118: every purchase is accounted once; statuses come from the status event domain") {
    val rows = Temporal.q118PitLookup(spark, sfDir).collect()
    val nPurchases = events.count(_._4 == "purchase")
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == nPurchases,
      "PIT join dropped or duplicated purchases — validity intervals don't tile")
    val statuses = rows.map(_.getAs[String]("status_at_purchase")).toSet
    assert(statuses.subsetOf(Set("signup", "click", "view", "error", "unknown")))
    assert(!statuses.contains("purchase"), "purchase leaked into its own status dim")
  }

  test("q118: statuses match a driver-side as-of replay") {
    val rows = Temporal.q118PitLookup(spark, sfDir).collect()
      .map(r => r.getAs[String]("status_at_purchase") -> r.getAs[Long]("n_purchases"))
      .toMap
    // replay: per user, order events; a purchase's status = type of the
    // latest non-purchase event at-or-before it (episode starts are
    // exactly those events' timestamps, and repeats don't move them)
    val replay = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var status: String = null
      val seen = scala.collection.mutable.ArrayBuffer[String]()
      sorted.foreach { e =>
        if (e._4 != "purchase") status = e._4
        else seen += (if (status == null) "unknown" else status)
      }
      seen.toSeq
    }
    val expected: Map[String, Long] =
      replay.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows == expected, s"got $rows expected $expected")
  }

  test("q119: dense spine, observed days exact, gaps carry the last observation") {
    val rows = Temporal.q119GapFill(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toLocalDate,
        r.getAs[java.lang.Double]("filled"), r.getAs[Boolean]("is_observed")))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 != null), "filled must never be null on the spine")
    val gmax = events.map(_._2).max / 1000000L / 86400L
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val byDay = rs.sortBy(_._2.toEpochDay)
      // contiguous from first purchase day through the global max day
      assert(byDay.head._4, s"user $u spine must start on an observed day")
      assert(byDay.last._2.toEpochDay == gmax, s"user $u spine must end at the corpus edge")
      assert(byDay.map(_._2.toEpochDay) === (byDay.head._2.toEpochDay to gmax),
        s"user $u spine has holes")
      byDay.zip(byDay.tail).foreach { case (prev, cur) =>
        if (!cur._4) assert(cur._3 == prev._3,
          s"user $u day ${cur._2}: gap day must carry ${prev._3}, got ${cur._3}")
      }
    }
  }

  test("q120: transitions conserve mass and rows sum to their totals") {
    val rows = Temporal.q120TransitionMatrix(spark, sfDir).collect()
    val nUsers = events.map(_._1).distinct.length
    assert(rows.map(_.getAs[Long]("n")).sum == events.length - nUsers,
      "each user contributes exactly (events-1) transitions")
    rows.groupBy(_.getAs[String]("from_state")).foreach { case (s, rs) =>
      val tot = rs.head.getAs[Long]("from_total")
      assert(rs.map(_.getAs[Long]("n")).sum == tot, s"row $s total mismatch")
      assert(rs.forall(r => r.getAs[Long]("share_bp") >= 0 &&
        r.getAs[Long]("share_bp") <= 10000))
    }
  }

  test("q123: time-weighted average matches an exact driver-side fold") {
    val rows = Temporal.q123TimeWeighted(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("vt_sum"), r.getAs[Long]("dur_sum"), r.getAs[Long]("twa_milli")))
      .toMap
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val terms = sorted.zip(sorted.tail).map { case (a, b) =>
        val vm = math.floor(a._5 * 1000).toLong
        val dur = b._2 - a._2
        (vm * dur, dur)
      }
      u -> (terms.map(_._1).sum, terms.map(_._2).sum)
    }
    assert(rows.keySet == expected.keySet)
    expected.foreach { case (u, (vt, dur)) =>
      val (gvt, gdur, gtwa) = rows(u)
      assert(gvt == vt && gdur == dur, s"user $u: got ($gvt,$gdur) expected ($vt,$dur)")
      assert(gtwa == Math.floorDiv(vt, dur), s"user $u quotient")
    }
  }

  test("q120/q123 plan with a single data shuffle on user_id") {
    // the per-user window is the only per-row shuffle; everything after
    // runs on the tiny (states² / per-user) relations
    for (name <- Seq("q123_time_weighted")) {
      val p = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(FormattedMode)
      val dataShuffles = "hashpartitioning\\(".r.findAllIn(p).size
      assert(dataShuffles == 1, s"$name: expected 1 hash exchange, got $dataShuffles")
    }
    // q120 re-aggregates the pair counts (a |states|²-sized relation) —
    // two more exchanges over 25 rows; the pin is that only ONE shuffle
    // ever carries user_id (the fact-sized one)
    val p120 = graft.SparkEntry.queries("q120_transition_matrix")(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    val userShuffles = "hashpartitioning\\(user_id".r.findAllIn(p120).size
    assert(userShuffles == 1, s"q120: expected 1 user_id exchange, got $userShuffles")
  }

  test("q124: binned interval join equals a driver-side quadratic overlap scan") {
    val got = Temporal.q124IntervalOverlap(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("overlap_us_sum"))).toMap
    // sessions via exact replay (30-min gap), incidents = ±30 min around errors
    val gap = 30L * 60 * 1000000
    val sessions = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      val bounds = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var (s0, last) = (ts.head, ts.head)
      ts.tail.foreach { t =>
        if (t - last > gap) { bounds += ((s0, last)); s0 = t }
        last = t
      }
      bounds += ((s0, last))
      bounds.map { case (a, b) => (u, a, b) }
    }
    val incidents = events.filter(_._4 == "error").map(e => (e._2 - gap, e._2 + gap))
    val expected = sessions
      .flatMap { case (u, a, b) =>
        incidents.filter { case (i0, i1) => a <= i1 && i0 <= b }
          .map { case (i0, i1) => (u, math.min(b, i1) - math.max(a, i0)) }
      }
      .groupBy(_._1).map { case (u, v) => u -> (v.size.toLong, v.map(_._2).sum) }
    assert(got == expected,
      s"got ${got.size} users vs ${expected.size} — bin-edge pair drop?")
  }

  test("q124 plans the bin key as an equi join, never a theta nested loop") {
    val p = graft.SparkEntry.queries("q124_interval_overlap")(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("q126/q127: reach curves match a per-day distinct replay") {
    val dayOf = (us: Long) => us / 1000000L / 86400L
    val userDays = events.map(e => (e._1, dayOf(e._2))).distinct
    val allDays = userDays.map(_._2).distinct.sorted
    // q126: cumulative distinct = users whose first day is <= d
    val firstDay = userDays.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val got126 = Temporal.q126CumulativeReach(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        r.getAs[Long]("new_users"), r.getAs[Long]("cum_users")))
    assert(got126.map(_._1).toSeq == allDays.toSeq, "q126 must emit every active day")
    got126.foreach { case (d, nu, cu) =>
      assert(nu == firstDay.values.count(_ == d), s"day $d new_users")
      assert(cu == firstDay.values.count(_ <= d), s"day $d cum_users")
    }
    assert(got126.last._3 == firstDay.size, "final reach = all users")
    // q127: trailing-7-day distinct
    val got127 = Temporal.q127RollingReach(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        r.getAs[Long]("users_7d"))).toMap
    assert(got127.keySet == allDays.toSet)
    allDays.foreach { d =>
      val expect = userDays.filter { case (_, ud) => ud >= d - 6 && ud <= d }
        .map(_._1).distinct.length
      assert(got127(d) == expect, s"day $d users_7d: got ${got127(d)} expected $expect")
    }
  }

  test("q130: day-over-day Jaccard matches an exact set replay") {
    val dayOf = (us: Long) => us / 1000000L / 86400L
    val byDay = events.map(e => (dayOf(e._2), e._1)).distinct
      .groupBy(_._1).map { case (d, v) => d -> v.map(_._2).toSet }
    val got = Temporal.q130DailyChurn(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        r.getAs[Long]("n_prev"), r.getAs[Long]("n_curr"),
        r.getAs[Long]("n_common"), r.getAs[Long]("jaccard_bp")))
    assert(got.nonEmpty)
    got.foreach { case (d, np, nc, ncom, jbp) =>
      val (prev, cur) = (byDay(d - 1), byDay(d))
      assert(np == prev.size && nc == cur.size, s"day $d sizes")
      assert(ncom == prev.intersect(cur).size, s"day $d intersection")
      assert(jbp == ncom * 10000 / prev.union(cur).size, s"day $d jaccard")
    }
    // every consecutive-day pair present
    val days = byDay.keySet
    assert(got.length == days.count(d => days.contains(d - 1)))
  }

  test("q118 plans as an equi hash join on user_id, never a nested loop") {
    val p = graft.SparkEntry.queries("q118_pit_lookup")(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "temporal predicate must ride the user_id equi key:\n" +
        p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("q181: dyadic decay leaderboard replays via integer shifts") {
    val byUser = events.map { case (u, us, _, _, v) =>
      (u, us / 86400000000L, math.round(v * 1000000)) }
    val hDay = byUser.map(_._2).max
    val scores = byUser.groupBy(_._1).map { case (u, xs) =>
      u -> ((xs.length.toLong,
        xs.map { case (_, day, v) =>
          v >> math.min((hDay - day) / 7, 62L).toInt }.sum))
    }
    val expTop = scores.toSeq.sortBy { case (u, (_, s)) => (-s, u) }.take(20)
      .map { case (u, (n, s)) => (u, n, s) }
    val got = Temporal.q181DecayScore(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("score_micro"))).toSeq
    assert(got == expTop, s"got $got expected $expTop")
    assert(expTop.head._3 > 0)
  }

  test("q176: rhythm grid replays from pure integer hour/dow arithmetic") {
    val grid = events.map { case (_, us, _, _, _) =>
      ((us / 3600000000L) % 24, ((us / 86400000000L) + 4) % 7)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Temporal.q176RhythmMatrix(spark, sfDir).collect()
    got.foreach { r =>
      val h = r.getAs[Long]("hour")
      (0 to 6).foreach { d =>
        assert(r.getAs[Long](s"d$d") == grid.getOrElse((h, d.toLong), 0L),
          s"hour $h dow $d")
      }
    }
    assert(got.map(r => (0 to 6).map(d => r.getAs[Long](s"d$d")).sum).sum ==
      events.length.toLong, "every event lands in exactly one cell")
  }

  test("q171: MAPE replays from the weekly relation in BigInt-free Long arithmetic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // take only the week truncation from Spark (its Monday semantics are
    // oracle-pinned via q93); rebuild the lag, APEs and rollup in Scala
    val weekly = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", date_trunc("week", $"o_orderdate").as("w"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).getTime), r.getLong(2)))
    val acts = weekly.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Temporal.q171ForecastBacktest(spark, sfDir).collect()
      .map(r => r.getAs[String]("segment") -> ((r.getAs[Long]("n_weeks"),
        r.getAs[Long]("mape_bp"), r.getAs[Long]("worst_ape_bp")))).toMap
    val bySeg = acts.groupBy(_._1._1)
    bySeg.foreach { case (seg, m) =>
      val series = m.toSeq.map { case ((_, w), a) => (w, a) }.sortBy(_._1)
      val apes = series.zip(series.tail).map { case ((_, prev), (_, act)) =>
        math.abs(act - prev) * 10000L / act }
      val exp = (apes.length.toLong, apes.sum / apes.length, apes.max)
      assert(got(seg) == exp, s"$seg: got ${got(seg)} expected $exp")
    }
    assert(got.keySet == bySeg.keySet)
  }

  test("q159: cusum replays exactly per type and telescopes to zero at the last day") {
    val daily = events
      .map { case (_, us, _, tpe, _) => (tpe, us / 86400000000L) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = Temporal.q159CusumChangepoint(spark, sfDir).collect()
      .groupBy(_.getAs[String]("event_type"))
    daily.groupBy(_._1._1).foreach { case (tpe, m) =>
      val d = m.size.toLong
      val tot = m.values.sum
      var s = 0L
      val expect = m.map { case ((_, day), c) => (day, c) }.toSeq.sortBy(_._1)
        .map { case (day, c) =>
          s += c * d - tot; (day, c, s, math.abs(s) > tot)
        }
      val g = got(tpe).sortBy(_.getAs[Long]("epoch_day"))
        .map(r => (r.getAs[Long]("epoch_day"), r.getAs[Long]("cnt"),
          r.getAs[Long]("cusum"), r.getAs[Boolean]("flagged"))).toSeq
      assert(g == expect, s"type $tpe chart diverges from the driver replay")
      assert(expect.last._3 == 0L,
        "Σ (cnt·D − T) over all of a type's days is identically zero")
    }
  }

  test("q197: clamped balance equals the literal sequential recurrence") {
    val mv = Tables.events(spark, sfDir)
      .filter($"event_type".isin("purchase", "error"))
      .selectExpr("user_id", "event_id", "unix_micros(ts)",
        """CASE WHEN event_type = 'purchase'
          |THEN CAST(round(value * 100) AS BIGINT)
          |ELSE -CAST(round(value * 100) AS BIGINT) END""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the ground truth is the SEQUENTIAL recurrence S_t = max(0, S+δ) —
    // not the identity the query uses, so this test proves the identity
    val expected = mv.groupBy(_._1).map { case (u, xs) =>
      val ordered = xs.sortBy(x => (x._3, x._2))
      var s = 0L
      ordered.foreach(x => s = math.max(0L, s + x._4))
      u -> ((ordered.length.toLong, ordered.map(_._4).sum, s,
        s - ordered.map(_._4).sum))
    }
    val got = Temporal.q197ClampedBalance(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_moves"), r.getAs[Long]("raw_final"),
          r.getAs[Long]("clamped_final"), r.getAs[Long]("absorbed")))).toMap
    assert(got == expected, "prefix-min identity diverges from the recurrence")
    // the clamp must actually engage somewhere or the fixture is vacuous
    assert(got.values.exists(_._4 > 0), "no user ever hit the zero floor")
    got.values.foreach { case (_, raw, clamped, absorbed) =>
      assert(clamped >= 0 && clamped >= raw && absorbed >= 0) }
  }

  test("q187: ACF replays from a driver-side BigInt fold") {
    val days = Tables.events(spark, sfDir)
      .selectExpr("unix_micros(ts) div 86400000000 AS day").collect()
      .map(_.getLong(0)).groupBy(identity)
      .map { case (d, xs) => d -> xs.length.toLong }
    val n = days.size.toLong
    val sm = days.values.sum
    val z = days.map { case (d, c) => d -> BigInt(n * c - sm) }
    val den = z.values.map(v => v * v).sum
    val expected = (1L to 7L).map { k =>
      val pairs = z.keys.filter(d => z.contains(d + k)).toSeq
      val num = pairs.map(d => z(d) * z(d + k)).sum
      val bp =
        if (num < 0) -((-num * 10000) / den) else (num * 10000) / den
      (k, pairs.size.toLong, bp.toLong)
    }
    val got = Temporal.q187Acf(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("lag"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("acf_bp"))).toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(got.map(_._2).forall(_ > 0), "every lag must have pairs")
    // zero-sum invariant of the centered series: Σ z_t == 0 exactly
    assert(z.values.sum == 0)
  }

  test("q207: the closed-form weekday count equals a literal calendar walk") {
    // g(m) counts weekdays in [0, m) of the Sunday-aligned day line;
    // the query's busdays(d1, d2) = g(d2+5) − g(d1+5) must equal walking
    // day-by-day over (d1, d2] and testing dow ∈ Mon..Fri — across every
    // weekday phase and span shape (incl. zero-length and multi-week).
    def g(m: Long): Long = 5 * (m / 7) + math.min(math.max(m % 7 - 1, 0), 5)
    def closed(d1: Long, d2: Long): Long = g(d2 + 5) - g(d1 + 5)
    def walk(d1: Long, d2: Long): Long =
      (d1 + 1 to d2).count(d => { val w = (d + 4) % 7; w >= 1 && w <= 5 })
    for (d1 <- 9128L to 9141L; span <- 0L to 45L)
      assert(closed(d1, d1 + span) == walk(d1, d1 + span),
        s"formula diverges at d1=$d1 span=$span")
  }

  test("q207: per-priority aggregates are internally consistent") {
    val rows = Temporal.q207BusinessDaySla(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, tot, avgMilli) = (r.getAs[Long]("n_lines"),
        r.getAs[Long]("total_busdays"), r.getAs[Long]("avg_busdays_milli"))
      assert(n > 0 && tot >= 0)
      assert(avgMilli == tot * 1000 / n)
      assert(r.getAs[Long]("max_busdays") * n >= tot)
      assert(r.getAs[Long]("n_breach") <= n)
    }
  }
}
