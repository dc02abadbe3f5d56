package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Semantics of sessionization and the as-of join on a hand-built event
  * log. `ts` is written as raw nanos longs — the ORIGINAL harness parquet
  * layout — so these fixtures permanently exercise the LongType branch of
  * `Tables.normalizeEventTs` while the regenerated harness data (naive
  * micros → TIMESTAMP_NTZ on Spark 4) exercises the NTZ branch.
  */
class EventsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour in ns
  private val M = 60L * 1000000000L   // one minute in ns

  test("q93 cohort retention matches a brute recount at sfDir") {
    import org.apache.spark.sql.functions._
    // independent composition: take only the week truncation from Spark
    // (its Monday semantics are oracle-pinned), rebuild cohorts, offsets,
    // counts and retention in plain Scala
    val pairs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", date_trunc("week", $"ts").as("w")).distinct()
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val first = pairs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val weekMs = 7L * 24 * 3600 * 1000
    val counts = pairs
      .groupBy { case (u, w) => (first(u), (w - first(u)) / weekMs) }
      .view.mapValues(_.length.toLong).toMap
    val sizes = first.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Events.q93CohortRetention(spark, sfDir).collect().map { r =>
      ((r.getDate(0).getTime, r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
    }.toMap
    val expected = counts.map { case ((cw, off), n) =>
      ((cw, off), (n, sizes(cw), n.toDouble / sizes(cw)))
    }
    assert(got == expected)
    // every user is active in their own first week
    got.filter(_._1._2 == 0L).values.foreach(v => assert(v._3 == 1.0))
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_events").toString
    val base = 1700000000L * 1000000000L
    // user 1: events at t0, t0+10m, t0+50m (gap>30m -> new session), t0+55m
    // user 2: purchase at t0+5m, clicks at t0 (before) and t0+20m (after)
    val rows = Seq(
      (0L, base, 1L, "view", 1.0, """{"k": 1}"""),
      (1L, base + 10 * M, 1L, "view", 1.0, """{"k": 2}"""),
      (2L, base + 50 * M, 1L, "view", 1.0, """{"k": 3}"""),
      (3L, base + 55 * M, 1L, "view", 1.0, """{"k": 4}"""),
      (4L, base, 2L, "click", 1.0, """{"k": 5}"""),
      (5L, base + 5 * M, 2L, "purchase", 2.0, """{"k": 6}"""),
      (6L, base + 20 * M, 2L, "click", 1.0, """{"k": 7}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q94 funnel: planted signups convert exactly within the 7-day horizon") {
    val d = Files.createTempDirectory("graft_funnel").toString
    val D = 24L * H
    val base = 1700000000L * 1000000000L
    // user 1: signup then purchase 1 day later -> converted
    // user 2: signup, purchase 8 days later -> NOT converted
    // user 3: signup, no purchase -> NOT converted
    // user 4: purchase BEFORE its signup only -> NOT converted
    // user 5: two signups; purchase sits within 7d of the second only
    val rows = Seq(
      (0L, base, 1L, "signup", 1.0, "{}"),
      (1L, base + D, 1L, "purchase", 2.0, "{}"),
      (2L, base, 2L, "signup", 1.0, "{}"),
      (3L, base + 8 * D, 2L, "purchase", 2.0, "{}"),
      (4L, base, 3L, "signup", 1.0, "{}"),
      (5L, base, 4L, "purchase", 2.0, "{}"),
      (6L, base + D, 4L, "signup", 1.0, "{}"),
      (7L, base, 5L, "signup", 1.0, "{}"),
      (8L, base + 9 * D, 5L, "signup", 1.0, "{}"),
      (9L, base + 10 * D, 5L, "purchase", 2.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Events.q94ConversionFunnel(spark, d).collect()
    // signups: 5 in week(base) + 1 (user 5's second) in week(base+9d);
    // converted: user 1 (week 1) and user 5's second signup (week 2)
    assert(r.map(_.getAs[Long]("n_signups")).sum == 6L)
    val byWeek = r.map(x => (x.getAs[Long]("n_signups"), x.getAs[Long]("n_converted"),
      x.getAs[Double]("conversion"))).toSeq
    assert(byWeek == Seq((5L, 1L, 0.2), (1L, 1L, 1.0)))
  }

  test("q94 funnel: conversion bounded and consistent at sfDir") {
    val rows = Events.q94ConversionFunnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, f) = (r.getAs[Long]("n_signups"), r.getAs[Long]("n_converted"),
        r.getAs[Double]("conversion"))
      assert(c >= 0 && c <= n)
      assert(f == c.toDouble / n)
    }
  }

  test("sessionize splits on >30min gaps") {
    val r = Events.q23Sessionize(spark, dir)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getAs[Long]("n_events"))).toMap
    assert(r((1L, 1L)) == 2L) // t0, t0+10m
    assert(r((1L, 2L)) == 2L) // t0+50m, t0+55m
    assert(r((2L, 1L)) == 3L) // user 2: all within 30m gaps
  }

  test("asof join picks most recent purchase at or before click") {
    val r = Events.q24AsofJoin(spark, dir).collect()
      .map(x => x.getLong(0) -> Option(x.getTimestamp(3))).toMap
    assert(r(4L).isEmpty)     // click before any purchase
    assert(r(6L).isDefined)   // click after purchase at t0+5m
  }

  test("json extraction sums props.k") {
    val r = Events.q20JsonExtract(spark, dir).collect()
      .map(x => x.getString(0) -> x.getAs[Long]("sum_k")).toMap
    assert(r("view") == 1L + 2 + 3 + 4)
    assert(r("click") == 5L + 7)
    assert(r("purchase") == 6L)
  }

  test("pseudonymize: stable keyed pseudonyms, digit redaction, decade buckets") {
    val r = Events.q60Pseudonymize(spark, dir).collect()
    val byId = r.map(x => x.getAs[Long]("event_id") -> x).toMap
    // same user -> same pseudonym; different users -> different
    val u1 = Seq(0L, 1L, 2L, 3L).map(byId(_).getAs[String]("pseudo_uid")).toSet
    val u2 = Seq(4L, 5L, 6L).map(byId(_).getAs[String]("pseudo_uid")).toSet
    assert(u1.size == 1 && u2.size == 1 && u1 != u2)
    // raw user_id never appears; pseudonym is 16 hex chars
    assert(u1.head.matches("[0-9a-f]{16}"))
    // digit runs in props are redacted and counted
    assert(byId(0L).getAs[String]("props_redacted") == """{"k": #}""")
    assert(r.forall(_.getAs[Long]("n_redacted") == 1L))
    // decade bucketing
    assert(byId(0L).getAs[Long]("value_bucket") == 0L)  // 1.0 -> 0
    assert(byId(5L).getAs[Long]("value_bucket") == 0L)  // 2.0 -> 0
  }

  test("outlier flags: every flagged event deviates by more than 2 sigma") {
    val r = Events.q67OutlierFlags(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (v, avg, varv) = (x.getAs[Double]("value"),
        x.getAs[Double]("avg_value"), x.getAs[Double]("var_value"))
      assert((v - avg) * (v - avg) > 4.0 * varv)
    }
    // flags are the tail, not the bulk
    val total = graft.sources.Tables.events(spark, sfDir).count()
    assert(r.length < total / 4)
  }

  test("salted skew join equals the unsalted plan on real events") {
    import org.apache.spark.sql.functions._
    import OpUtils.dec
    val ev = graft.sources.Tables.events(spark, sfDir)
    val dim = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n_type"), sum(dec($"value")).as("sum_v"))
    val plain = ev.join(dim, Seq("event_type"))
      .filter(dec($"value") * $"n_type" > $"sum_v")
      .groupBy($"event_type")
      .agg(first($"n_type").as("n_type"), count(lit(1)).as("n_above"),
        sum(dec($"value")).cast("string").cast("double").as("sum_above"))
      .orderBy($"event_type")
      .collect().map(_.toSeq).toSeq
    val salted = Events.q57SaltedSkewJoin(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(salted.nonEmpty)
    assert(salted == plain)
  }

  test("q98 variant path agrees with the q20 string path on shared aggregates") {
    import org.apache.spark.sql.functions._
    val v = Events.q98VariantProps(spark, sfDir)
      .select($"event_type", $"n", $"sum_k").collect().map(_.toSeq).toSeq
    val s = Events.q20JsonExtract(spark, sfDir)
      .select($"event_type", $"n", $"sum_k").collect().map(_.toSeq).toSeq
    assert(v.nonEmpty && v == s)
  }

  test("schema_of_variant_agg gives the corpus-wide props schema (drift census)") {
    // the schema-drift detector for semi-structured columns: one
    // aggregate over the variant column yields the merged observed schema
    import org.apache.spark.sql.functions._
    val schema = graft.sources.Tables.events(spark, sfDir)
      .select(schema_of_variant_agg(parse_json($"props")).as("s"))
      .head().getString(0)
    assert(schema == "OBJECT<k: BIGINT>" || schema == "STRUCT<k: BIGINT>", schema)
  }

  test("q101 consumer reads stored variant without re-parsing; agrees with q98") {
    import org.apache.spark.sql.execution.FormattedMode
    val df = Events.q101VariantIngest(spark, sfDir)
    // the consumer plan extracts from the STORED binary variant — no
    // parse_json anywhere after ingest. In fact Spark 4 goes one better:
    // variant SHREDDING rewrites the typed variant_get accesses into
    // struct subcolumns of the parquet ReadSchema, so the scan reads the
    // shredded fields directly and no variant decode runs at all. Accept
    // either form (explicit variant_get, or the fully-pushed shred).
    val plan = df.queryExecution.explainString(FormattedMode)
    assert(plan.contains("variant_get") || plan.contains("props_v"),
      "consumer must extract from the stored variant column:\n" + plan)
    assert(!plan.toLowerCase.contains("parse_json") &&
      !plan.contains("JsonToVariant"),
      "consumer plan must not re-parse JSON text:\n" + plan)
    // end-to-end values equal the parse-per-query path
    val a = df.collect().map(_.toSeq).toSeq
    val b = Events.q98VariantProps(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("VariantType round-trips through parquet (parse-at-ingest shape)") {
    // the 100 TB form of q98: parse JSON once at ingest, store the variant
    // column in parquet, extract on read without ever re-parsing text
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("variant_rt").toString
    val src = Seq((1L, """{"k": 7, "tag": "a"}"""), (2L, """{"k": 35}"""))
      .toDF("id", "props")
    src.select($"id", parse_json($"props").as("v"))
      .write.mode("overwrite").parquet(s"$dir/variant")
    val back = spark.read.parquet(s"$dir/variant")
    assert(back.schema("v").dataType ===
      org.apache.spark.sql.types.VariantType)
    val got = back
      .select($"id",
        variant_get($"v", "$.k", "long").as("k"),
        try_variant_get($"v", "$.tag", "string").as("tag"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    assert(got.toSeq === Seq((1L, 7L, Some("a")), (2L, 35L, None)))
  }

  /** The harness events fixture, collected once for the q140/q141
    * driver-side replays (epoch micros, frozen micro-value).
    */
  private lazy val harnessEvents: Array[(Long, String, Long, Long, Long)] = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("t"),
        $"event_id", expr("CAST(round(value * 1000000) AS BIGINT)").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
  }

  test("q140: linear attribution conserves purchase value exactly and matches a replay") {
    val purchases = harnessEvents.filter(_._2 == "purchase")
    val clicks = harnessEvents.filter(_._2 == "click")
    val byUserClicks = clicks.groupBy(_._1)
    val week = 604800000000L
    val dayOf = (t: Long) => t / 86400000000L
    val credit = scala.collection.mutable.Map[(String, Long), (Long, Long)]()
      .withDefaultValue((0L, 0L))
    for ((u, _, pt, _, v) <- purchases) {
      val touches = byUserClicks.getOrElse(u, Array.empty)
        .filter(c => c._3 >= pt - week && c._3 < pt)
      if (touches.isEmpty) {
        val k = ("direct", dayOf(pt))
        val (n, s) = credit(k); credit(k) = (n + 1, s + v)
      } else {
        val n = touches.length.toLong
        val last = touches.maxBy(c => (c._3, c._4))
        for (c <- touches) {
          val share = if (c eq last) v - (v / n) * (n - 1) else v / n
          val k = ("click", dayOf(c._3))
          val (cn, s) = credit(k); credit(k) = (cn + 1, s + share)
        }
      }
    }
    val got = Events.q140MultiTouchAttribution(spark, sfDir).collect()
      .map(r => (r.getAs[String]("kind"),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay) ->
        ((r.getAs[Long]("n_touches"), r.getAs[Long]("credited_micro")))).toMap
    assert(got == credit.toMap, "per-(kind, day) credits must match the replay")
    assert(got.values.map(_._2).sum == purchases.map(_._5).sum,
      "attribution must conserve total purchase value to the micro-unit")
  }

  test("q141: strict sequence funnel matches a driver-side scan") {
    val gap = 86400000000L
    val byUser = harnessEvents.groupBy(_._1)
    val dayOf = (t: Long) => t / 86400000000L
    val agg = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
      .withDefaultValue((0L, 0L, 0L))
    for ((_, es) <- byUser) {
      val clicks = es.filter(_._2 == "click").map(_._3).sorted
      val buys = es.filter(_._2 == "purchase").map(_._3).sorted
      for ((_, _, t, _, _) <- es.filter(_._2 == "signup")) {
        val t2 = clicks.find(c => c > t && c <= t + gap)
        val t3 = t2.flatMap(c2 => buys.find(p => p > c2 && p <= c2 + gap))
        val k = dayOf(t)
        val (a, b, c) = agg(k)
        agg(k) = (a + 1, b + (if (t2.isDefined) 1 else 0),
          c + (if (t3.isDefined) 1 else 0))
      }
    }
    val got = Events.q141SequenceFunnel(spark, sfDir).collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay ->
        ((r.getAs[Long]("n_signups"), r.getAs[Long]("n_clicked"),
          r.getAs[Long]("n_completed")))).toMap
    assert(got == agg.toMap, s"got $got expected $agg")
    assert(got.values.map(_._3).sum > 0, "fixture must complete some funnels")
  }

  test("q163: z² and the significance decision replay exactly in BigInt") {
    import org.apache.spark.sql.functions._
    val custs = graft.sources.Tables.customer(spark, sfDir)
      .select($"c_custkey").collect().map(_.getLong(0))
    val urgent = graft.sources.Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").collect().map(_.getLong(0)).toSet
    val byArm = custs.groupBy(_ % 2).view
      .mapValues(ks => (BigInt(ks.length), BigInt(ks.count(urgent)))).toMap
    val ((na, ca), (nb, cb)) = (byArm(0), byArm(1))
    val (n, c) = (na + nb, ca + cb)
    val num = ca * nb - cb * na
    val r = Events.q163AbZTest(spark, sfDir).collect()(0)
    assert(BigInt(r.getAs[Long]("n_a")) == na && BigInt(r.getAs[Long]("c_a")) == ca)
    assert(BigInt(r.getAs[Long]("n_b")) == nb && BigInt(r.getAs[Long]("c_b")) == cb)
    assert(ca < na || cb < nb, "fixture outcome must not be degenerate")
    assert(BigInt(r.getAs[Long]("z2_micro")) ==
      num * num * n * 1000000 / (na * nb * c * (n - c)))
    assert(r.getAs[Boolean]("significant") ==
      (num * num * n * 10000 >= BigInt(38416) * na * nb * c * (n - c)))
  }

  test("q164: KM table replays; every ln term sits far from its rounding boundary") {
    import org.apache.spark.sql.functions._
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type",
        expr("unix_micros(ts) div 86400000000").as("day")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sDay = evs.filter(_._2 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val hDay = evs.map(_._3).max
    val dur = sDay.toSeq.map { case (u, s) =>
      val ps = evs.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= s)
        .map(_._3)
      if (ps.nonEmpty) (ps.min - s, true) else (hDay - s, false)
    }
    var atRisk = dur.size.toLong
    var lnSurv = 0L
    val expected = dur.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val (d, c) = (xs.count(_._2).toLong, xs.count(!_._2).toLong)
      val nRisk = atRisk
      if (d > 0 && nRisk > d) {
        val x = math.log((nRisk - d).toDouble / nRisk) * 1e6
        assert(math.abs(x - math.floor(x) - 0.5) > 1e-3,
          s"frozen micro-nat term at t=$t is at a rounding boundary: $x")
        lnSurv += math.round(x)
      } // d == 0 adds 0; the d == nRisk absorbing plateau adds a skipped NULL
      atRisk -= d + c
      (t, nRisk, d, c, lnSurv)
    }
    val got = Events.q164SurvivalCurve(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"), r.getAs[Long]("d"),
        r.getAs[Long]("c"), r.getAs[Long]("ln_surv_micro"))).toSeq
    assert(got == expected, s"got $got expected $expected")
    assert(expected.last._2 > 0, "risk set never empties before the horizon")
  }

  test("q166: merged partials equal a direct recount; the fact is scanned once") {
    import org.apache.spark.sql.functions._
    val df = Events.q166IncrementalRollup(spark, sfDir)
    val got = df.collect().map(r => r.getAs[String]("event_type") ->
      ((r.getAs[Long]("n"), r.getAs[Long]("n_days"),
        r.getAs[Long]("value_micro")))).toMap
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"event_type", expr("unix_micros(ts) div 86400000000"),
        expr("CAST(round(value * 1000000) AS BIGINT)")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = evs.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.length.toLong, xs.map(_._2).distinct.length.toLong,
        xs.map(_._3).sum))
    }
    assert(got == exp, "stored partials + delta must equal full recomputation")
    // the merge plan reads the raw fact ONCE (the delta); the base half
    // comes from the materialized rollup store
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("events\\.parquet".r.findAllIn(p).size == 1,
      "base segment must be answered from the rollup store, not the fact")
  }

  test("q167: top paths replay from a driver-side session fold") {
    import org.apache.spark.sql.functions._
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", expr("unix_micros(ts)"), $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      var prev = Long.MinValue
      for (e <- s) {
        if (prev != Long.MinValue && e._2 - prev > 1800000000L)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += e._4
        prev = e._2
      }
      sessions.map(_.mkString(">"))
    }
    val cnt = paths.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expTop = cnt.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = Events.q167TopSessionPaths(spark, sfDir).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"))).toSeq
    assert(got == expTop, s"got $got expected $expTop")
    assert(expTop.exists(_._1.contains(">")), "fixture has multi-event sessions")
  }

  test("q165: merged read buckets the pre-evolution vintage as unknown, exactly") {
    import org.apache.spark.sql.functions._
    val r = Events.q165SchemaEvolution(spark, sfDir).collect()
      .map(x => x.getAs[String]("event_type") -> x.getAs[Long]("n")).toMap
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select($"event_id", $"event_type").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r("unknown") == evs.count(_._1 % 2 == 0).toLong,
      "every v1 (even-id) row must surface a NULL event_type after the merge")
    evs.filter(_._1 % 2 == 1).groupBy(_._2).foreach { case (t, xs) =>
      assert(r(t) == xs.length.toLong)
    }
    assert(r.values.sum == evs.length.toLong, "no row lost across vintages")
  }

  test("q196: conversion quartiles replay from a sorted-array fold") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val su = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val durs = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, us) =>
        su.get(u).filter(us >= _).map(s => (u, s, us - s)) }
      .groupBy(_._1).toSeq
      .map { case (_, xs) => (xs.head._2 / 604800000000L, xs.map(_._3).min) }
    val expected = durs.groupBy(_._1).map { case (wk, xs) =>
      val vs = xs.map(_._2).sorted
      val n = vs.length.toLong
      def cut(num: Long, den: Long): Long = vs((((n * num + den - 1) / den) - 1).toInt)
      wk -> ((n, cut(1, 4), cut(1, 2), cut(3, 4)))
    }
    val got = Events.q196ConvertQuartiles(spark, sfDir).collect()
      .map(r => r.getAs[Long]("signup_week") ->
        ((r.getAs[Long]("n_converters"), r.getAs[Long]("q1_us"),
          r.getAs[Long]("median_us"), r.getAs[Long]("q3_us")))).toMap
    assert(got == expected, s"got $got expected $expected")
    // quartiles ordered within every cohort
    got.values.foreach { case (_, q1, med, q3) =>
      assert(q1 <= med && med <= q3) }
    assert(got.nonEmpty, "fixture must contain signup→purchase converters")
  }

  test("q190: entropy census replays from a driver-side micro-nat fold") {
    val cells = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(floor(value / 10) * 10 AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = cells.keys.map(_._1).toSeq.distinct.map { t =>
      val cs = cells.collect { case ((`t`, _), c) => c }.toSeq
      val n = cs.sum
      val h = cs.map(c =>
        c * math.round(math.log(n.toDouble / c) * 1e6)).sum / n
      t -> ((n, cs.size.toLong, h, math.round(math.log(cs.size.toDouble) * 1e6)))
    }.toMap
    val got = Events.q190EntropyCensus(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_buckets"),
          r.getAs[Long]("h_micro"), r.getAs[Long]("h_max_micro")))).toMap
    assert(got == expected, s"got $got expected $expected")
    // entropy bounded by the uniform maximum (micro-rounding slack)
    got.values.foreach { case (_, _, h, hMax) =>
      assert(h >= 0 && h <= hMax + 5, s"H=$h outside [0, $hMax]") }
  }

  test("q216: sequence-regex census replays via java.util.regex on driver-sorted strings") {
    import org.apache.spark.sql.functions._
    val seqs = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues { rows =>
        rows.sortBy(r => (r._2, r._3)).map(_._4.head).mkString
      }.toMap
    def count(s: String, pat: String): Long = {
      val m = java.util.regex.Pattern.compile(pat).matcher(s)
      var n = 0L; while (m.find()) n += 1; n
    }
    val pats = Seq("vp", "v+p", "s[cv]*p", "ee")
    val expected = pats.map { p =>
      val per = seqs.map { case (u, s) => u -> count(s, p) }
      p -> ((per.count(_._2 > 0).toLong, per.values.sum,
        per.map { case (u, c) => u * c }.sum))
    }.toMap
    val got = Events.q216SequenceRegex(spark, sfDir).collect()
      .map(r => r.getAs[String]("pattern") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_matches"),
          r.getAs[Long]("user_checksum")))).toMap
    assert(got == expected, s"got $got expected $expected")
    // the fixture event mix makes every pattern realizable; a zero-match
    // census would mean the sequence assembly (not the regex) broke
    assert(got.values.forall(_._2 > 0), s"every pattern should match somewhere: $got")
    // v+p matches are a superset-by-position of vp matches: each vp match
    // extends leftward to a v+p match, and distinct vp matches cannot
    // collapse into one v+p match (each contains exactly one p)
    assert(got("v+p")._2 == got("vp")._2,
      "v+p and vp must biject: one match per view-run ending in a purchase")
  }
}
