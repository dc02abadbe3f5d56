package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-contract validation — the nightly schema/constraint audit a
  * production pipeline runs before data is allowed downstream (the
  * principled form of the reference's ad-hoc `to_regclass`/row-count
  * probes, `citibike_project/etl/ingest_data.py:251-262`): primary-key
  * uniqueness, referential integrity, null and domain checks, each
  * emitted as one (check, n_checked, n_violations) row so the gate is a
  * single `max(n_violations) == 0` read.
  *
  * Scale shape: every check is ONE aggregation or ONE anti-join on its
  * natural key — PK checks are map-side-combinable count-per-key
  * aggregates that only retain groups with n > 1; FK checks are
  * anti-joins that broadcast the dimension while it fits and degrade to
  * shuffle joins at corpus scale; null/domain checks are pure map-side
  * conditional counts folded into a single pass over each fact. The
  * per-check results are one-row relations; the union is free.
  */
object Contracts {

  /** q102 — the contract audit over the orders/lineitem/customer star:
    * 2 PK checks, 2 FK checks, 1 null check, 3 domain checks. Fixture
    * data is clean, so every n_violations is 0 — which is exactly what
    * the DuckDB oracle asserts value-for-value (a violated contract or a
    * broken check flips a count and fails the driver's hash gate).
    */
  def q102DataContract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)

    def check(name: String, checked: DataFrame, violations: DataFrame): DataFrame =
      checked.agg(count(lit(1)).as("n_checked")).crossJoin(
          violations.agg(count(lit(1)).as("n_violations")))
        .select(lit(name).as("check"), $"n_checked", $"n_violations")

    val pkOrders = check("pk_orders_unique", orders,
      orders.groupBy($"o_orderkey").agg(count(lit(1)).as("n")).filter($"n" > 1))
    val pkLineitem = check("pk_lineitem_unique", lineitem,
      lineitem.groupBy($"l_orderkey", $"l_linenumber")
        .agg(count(lit(1)).as("n")).filter($"n" > 1))
    val fkLineOrders = check("fk_lineitem_orders", lineitem,
      lineitem.select($"l_orderkey")
        .join(orders.select($"o_orderkey"),
          $"l_orderkey" === $"o_orderkey", "left_anti"))
    val fkOrdersCust = check("fk_orders_customer", orders,
      orders.select($"o_custkey")
        .join(customer.select($"c_custkey"),
          $"o_custkey" === $"c_custkey", "left_anti"))
    val nnOrderdate = check("nn_orders_orderdate", orders,
      orders.filter($"o_orderdate".isNull))
    // domain checks fold into one conditional-count pass over lineitem
    val domains = lineitem.agg(
      count(lit(1)).as("n_checked"),
      sum(when($"l_quantity" < 1 || $"l_quantity" > 50, 1L).otherwise(0L)).as("v_qty"),
      sum(when($"l_discount" < 0 || $"l_discount" > 0.1, 1L).otherwise(0L)).as("v_disc"),
      sum(when(!$"l_returnflag".isin("A", "N", "R"), 1L).otherwise(0L)).as("v_flag"))
    val domQty = domains.select(lit("dom_lineitem_quantity").as("check"),
      $"n_checked", $"v_qty".as("n_violations"))
    val domDisc = domains.select(lit("dom_lineitem_discount").as("check"),
      $"n_checked", $"v_disc".as("n_violations"))
    val domFlag = domains.select(lit("dom_lineitem_returnflag").as("check"),
      $"n_checked", $"v_flag".as("n_violations"))

    pkOrders.union(pkLineitem).union(fkLineOrders).union(fkOrdersCust)
      .union(nnOrderdate).union(domQty).union(domDisc).union(domFlag)
      .orderBy($"check")
  }

  val q102Sql: String =
    """SELECT * FROM (
      |  SELECT 'pk_orders_unique' AS "check",
      |    (SELECT COUNT(*) FROM orders) AS n_checked,
      |    (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)) AS n_violations
      |  UNION ALL
      |  SELECT 'pk_lineitem_unique',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1))
      |  UNION ALL
      |  SELECT 'fk_lineitem_orders',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 'fk_orders_customer',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL
      |  SELECT 'nn_orders_orderdate',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
      |  UNION ALL
      |  SELECT 'dom_lineitem_quantity',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
      |  UNION ALL
      |  SELECT 'dom_lineitem_discount',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1)
      |  UNION ALL
      |  SELECT 'dom_lineitem_returnflag',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem WHERE l_returnflag NOT IN ('A', 'N', 'R'))
      |) t
      |ORDER BY "check"""".stripMargin

  /** q121 — k-anonymity audit over the customer quasi-identifiers
    * (market segment × nation × account-balance band): the re-
    * identification risk check that must pass before a "pseudonymized"
    * extract (q60) is actually safe to share — any QI group smaller
    * than k=5 is a linkage attack surface, and this emits exactly those
    * groups with their sizes. One map-side-combinable hash aggregation
    * over the dimension (group count then filter) — the same shape at
    * 100 TB, since the QI space (segments × nations × bands), not the
    * row count, bounds the aggregate state. The balance band uses
    * `floor(bal/1000)` (floor, not cast — Spark truncates toward zero
    * and DuckDB rounds on cast, and balances can be negative, where
    * truncate and floor disagree).
    */
  def q121KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .groupBy($"c_mktsegment".as("segment"), $"c_nationkey".as("nation"),
        floor($"c_acctbal" / 1000).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("group_size"))
      .filter($"group_size" < 5)
      .orderBy($"segment", $"nation", $"bal_band")
  }

  val q121Sql: String =
    """SELECT c_mktsegment AS segment, c_nationkey AS nation,
      |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
      |       count(*) AS group_size
      |FROM customer
      |GROUP BY 1, 2, 3
      |HAVING count(*) < 5
      |ORDER BY segment, nation, bal_band""".stripMargin

  /** q142 — erasure-cascade audit (the GDPR right-to-be-forgotten job):
    * given a tombstone set (here customers with key ≡ 0 mod 100), count
    * exactly what a purge would remove at every level of the foreign-key
    * cascade — customer rows directly, their orders via `o_custkey`,
    * those orders' lineitems via `l_orderkey` — and emit the
    * (table, n_before, n_purged, n_after) audit every deletion run must
    * publish BEFORE it mutates anything.
    *
    * Scale shape: the cascade is two levels of SEMI joins — tombstone
    * keys are dimension-sized (broadcast; a billion-row tombstone list
    * degrades to a shuffle semi join, same plan class), and the
    * order-key frontier of level 2 is itself derived via a semi join,
    * never materialized to the driver. Each audit row is a count
    * aggregate over a semi/anti join — no row is ever copied, the purge
    * itself would be the same anti-joins written back (`Sinks
    * .deleteWhere` / partition overwrite are the mutation seams).
    */
  def q142ErasureAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tomb = Tables.customer(spark, dir)
      .filter($"c_custkey" % 100 === 0).select($"c_custkey")
    val orders = Tables.orders(spark, dir)
    val purgedOrders = orders
      .join(broadcast(tomb), $"o_custkey" === $"c_custkey", "left_semi")
    val li = Tables.lineitem(spark, dir)
    val purgedLi = li.join(purgedOrders.select($"o_orderkey"),
      $"l_orderkey" === $"o_orderkey", "left_semi")
    def audit(name: String, all: DataFrame, purged: DataFrame): DataFrame =
      all.agg(count(lit(1)).as("n_before"))
        .crossJoin(purged.agg(count(lit(1)).as("n_purged")))
        .select(lit(name).as("table_name"), $"n_before", $"n_purged",
          ($"n_before" - $"n_purged").as("n_after"))
    audit("customer", Tables.customer(spark, dir),
        Tables.customer(spark, dir).filter($"c_custkey" % 100 === 0))
      .unionByName(audit("orders", orders, purgedOrders))
      .unionByName(audit("lineitem", li, purgedLi))
      .orderBy($"table_name")
  }

  val q142Sql: String =
    """WITH tomb AS (SELECT c_custkey FROM customer WHERE c_custkey % 100 = 0),
      |po AS (SELECT o_orderkey FROM orders
      |       WHERE o_custkey IN (SELECT c_custkey FROM tomb)),
      |a AS (
      |  SELECT 'customer' AS table_name,
      |         (SELECT count(*) FROM customer) AS n_before,
      |         (SELECT count(*) FROM tomb) AS n_purged
      |  UNION ALL
      |  SELECT 'orders', (SELECT count(*) FROM orders),
      |         (SELECT count(*) FROM po)
      |  UNION ALL
      |  SELECT 'lineitem', (SELECT count(*) FROM lineitem),
      |         (SELECT count(*) FROM lineitem
      |          WHERE l_orderkey IN (SELECT o_orderkey FROM po)))
      |SELECT table_name, n_before, n_purged, n_before - n_purged AS n_after
      |FROM a ORDER BY table_name""".stripMargin

  /** q150 — Benford first-digit audit over order totals (the classic
    * fabricated-data screen): observed first-digit shares vs Benford's
    * law, everything in exact basis points. The Benford expectations
    * `round(log₁₀(1+1/d)·10⁴)` are FROZEN LITERALS in both engines
    * (3010, 1761, …) rather than computed — two libms' log₁₀ can
    * differ in the last ulp, and a frozen constant is the only form a
    * hash gate can carry. First digit = first character of the cents
    * BIGINT rendered as a string (pure integer path, no float log).
    * One map + one 9-row aggregate; the fixture's uniform-ish price
    * distribution does NOT follow Benford — the audit reports the
    * deviation rather than asserting conformance, which is exactly
    * what it would do on real ledgers.
    */
  def q150BenfordAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val benford = Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)
    val bexpr =
      s"CAST(element_at(array(${benford.mkString(",")}), CAST(digit AS INT)) AS BIGINT)"
    val d = Tables.orders(spark, dir)
      .select(round($"o_totalprice" * 100).cast("long").as("cents"))
      .filter($"cents" > 0)
      .select(substring($"cents".cast("string"), 1, 1).as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
    d.crossJoin(broadcast(d.agg(sum($"n").as("tot"))))
      .select($"digit", $"n",
        expr("n * 10000 div tot").as("share_bp"),
        expr(bexpr).as("benford_bp"))
      .withColumn("abs_dev_bp", abs($"share_bp" - $"benford_bp"))
      .orderBy($"digit")
  }

  val q150Sql: String =
    """WITH d AS (
      |  SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
      |                1, 1) AS digit
      |  FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
      |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
      |SELECT c.digit, c.n,
      |       c.n * 10000 // t.tot AS share_bp,
      |       CAST(([3010, 1761, 1249, 969, 792, 669, 580, 512, 458])[CAST(c.digit AS INT)]
      |            AS BIGINT) AS benford_bp,
      |       abs(c.n * 10000 // t.tot -
      |           CAST(([3010, 1761, 1249, 969, 792, 669, 580, 512, 458])[CAST(c.digit AS INT)]
      |                AS BIGINT)) AS abs_dev_bp
      |FROM c, t ORDER BY c.digit""".stripMargin

  /** q168 — l-diversity audit, the companion check q121's k-anonymity
    * is NOT sufficient without: a QI group can be large (k-safe) yet
    * have every member share one sensitive value, so membership alone
    * discloses it (the homogeneity attack). Sensitive attribute here:
    * order priority; for each q121 QI group (segment × nation ×
    * balance band) count the DISTINCT priorities across the group's
    * orders, then publish the distribution — (l, n_groups) — plus how
    * many groups sit below l = 3. Customers with no orders form l = 0
    * groups (LEFT join, distinct over non-NULL only) — the most
    * disclosing bucket, not a dropped row.
    *
    * Scale shape: one customer×orders equi join (the fact side), one
    * hash aggregate to the QI space (bounded by segments × nations ×
    * bands, not rows — distinct-priority state bounded by the ~5-value
    * sensitive domain), one aggregate over the ≤|priorities|+1-row l
    * dimension. Same shape at 100 TB.
    */
  def q168LDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_mktsegment", $"c_nationkey",
        floor($"c_acctbal" / 1000).cast("long").as("bal_band"))
      .agg(countDistinct($"o_orderpriority").as("l"))
      .groupBy($"l")
      .agg(count(lit(1)).as("n_groups"))
      .select($"l", $"n_groups", ($"l" < 3).as("homogeneity_risk"))
      .orderBy($"l")
  }

  val q168Sql: String =
    """WITH g AS (
      |  SELECT c.c_mktsegment, c.c_nationkey,
      |         CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_band,
      |         CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2, 3)
      |SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
      |       l < 3 AS homogeneity_risk
      |FROM g GROUP BY 1 ORDER BY l""".stripMargin

  /** q203 — corrupt-record quarantine audit at the CSV ingest seam: the
    * dead-letter accounting every production loader needs (the
    * reference ingests citibike CSVs with pandas `read_csv` and dies on
    * the first malformed line; a 100 TB loader must instead QUARANTINE
    * bad records and publish exact counts). The query materializes a
    * CSV extract of the customer slice (key ≤ 2000) with a
    * deterministic 1-in-7 malformation (a non-numeric balance field),
    * re-reads it under PERMISSIVE mode with a `_corrupt_record` column,
    * and emits the audit row: totals, good/bad splits, the good-side
    * balance checksum, and the bad-side KEY checksum recovered from the
    * raw quarantined line (split on the delimiter — the raw line is
    * always present for a quarantined record, independent of which
    * fields happened to parse). The oracle reproduces every number from
    * the harness table by the same key-parity rule, so the driver hash
    * gate covers write → malform → permissive-parse → classify.
    *
    * Scale shape: the write and the audited read are both
    * embarrassingly parallel scans; the audit is one map-side-
    * combinable aggregate. No driver-side row handling anywhere.
    */
  def q203CorruptRecordAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val out = scratchDir("graft_corrupt_csv")
    Tables.customer(spark, dir)
      .filter($"c_custkey" <= 2000)
      .select(concat_ws(",", $"c_custkey", $"c_name",
        when($"c_custkey" % 7 === 0, concat(lit("X"), $"c_custkey"))
          .otherwise(expr("CAST(round(c_acctbal * 100) AS BIGINT)")
            .cast("string"))).as("value"))
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("custkey", LongType), StructField("name", StringType),
      StructField("acctbal_cents", LongType),
      StructField("_corrupt_record", StringType)))
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(out)
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"_corrupt_record".isNotNull, 1L).otherwise(0L)).as("n_bad"),
        sum(when($"_corrupt_record".isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when($"_corrupt_record".isNull, $"acctbal_cents")
          .otherwise(0L)).as("good_cents_sum"),
        sum(coalesce(expr("CAST(split(_corrupt_record, ',')[0] AS BIGINT)"),
          lit(0L))).as("bad_key_checksum"))
  }

  val q203Sql: String =
    """WITH c AS (
      |  SELECT c_custkey AS k,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer WHERE c_custkey <= 2000)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_bad,
      |       CAST(sum(CASE WHEN k % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_good,
      |       CAST(sum(CASE WHEN k % 7 <> 0 THEN cents ELSE 0 END) AS BIGINT)
      |         AS good_cents_sum,
      |       CAST(sum(CASE WHEN k % 7 = 0 THEN k ELSE 0 END) AS BIGINT)
      |         AS bad_key_checksum
      |FROM c""".stripMargin

  /** q211 — experiment-assignment health (sample-ratio mismatch): the
    * audit every A/B platform runs BEFORE reading effects (q163 reads
    * the effect; this validates the randomization that makes the
    * effect meaningful). Assignment is the deterministic md5 first-hex-
    * digit split (< '8' → arm A — the q97 hash-slice discipline, ~50/50
    * by construction and reproducible in both engines), and the SRM
    * test is the 2-cell chi-square against the declared 50/50 ratio
    * cleared of all floats: χ² = (n_a − n_b)²/n, emitted in micro-units
    * by exact integer division and compared against the FROZEN 3.8416
    * critical constant (q150/q163 frozen-constant discipline). A true
    * srm_flag means the assignment itself is broken and any effect
    * readout is invalid.
    *
    * Scale shape: one map-side-combinable two-cell aggregate over the
    * key relation; everything after is arithmetic on one row.
    */
  def q211SrmAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select(when(expr("substr(md5(CAST(c_custkey AS STRING)), 1, 1)") < "8",
        1L).otherwise(0L).as("a"))
      .agg(sum($"a").as("n_a"), (count(lit(1)) - sum($"a")).as("n_b"))
      .select($"n_a", $"n_b",
        expr("((n_a - n_b) * (n_a - n_b) * 1000000) div (n_a + n_b)")
          .as("chi2_micro"),
        expr("(n_a * 10000) div (n_a + n_b)").as("share_a_bp"))
      .withColumn("srm_flag", $"chi2_micro" > 3841600L)
  }

  val q211Sql: String =
    """WITH c AS (
      |  SELECT CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < '8'
      |              THEN 1 ELSE 0 END AS a
      |  FROM customer),
      |t AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
      |             CAST(count(*) - sum(a) AS BIGINT) AS n_b FROM c)
      |SELECT n_a, n_b,
      |       CAST((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b)
      |            AS BIGINT) AS chi2_micro,
      |       CAST(n_a * 10000 // (n_a + n_b) AS BIGINT) AS share_a_bp,
      |       (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) > 3841600
      |         AS srm_flag
      |FROM t""".stripMargin

  /** q212 — Wilson 95% upper bound on per-source defect rates: the
    * one-sided confidence ceiling a release gate quotes ("defect rate
    * is AT MOST x%"), companion to q203's exact defect counting — a
    * small sample with zero observed defects still gets a non-zero
    * ceiling, which is the whole point of the interval over the naive
    * rate. Defect = doc with n_chars < 200 (deterministic). The bound
    * is computed in EXACT integer arithmetic end-to-end: with
    * a = z²·10⁴ = 38416 frozen (q150 discipline), the radicand
    * R = (4·10⁴·a·k·(n−k)) div n + a² is floored once (documented —
    * rank-scale ulp), its integer square root is float-sqrt CORRECTED
    * to the true isqrt by ±1 integer comparisons (exact for R < 2⁵²;
    * BIGINT headroom to n ≈ 10⁹ rows/source, the documented
    * DECIMAL(38,0) widen-point), and
    * ub_bp = (2·10⁴k + a + isqrt(R))·10⁴ div (2·10⁴n + 2a). Both
    * engines evaluate the identical integer text, so the driver hash
    * gates the whole construction; ub ≥ the naive rate is emitted as a
    * theorem boolean.
    *
    * Scale shape: one conditional aggregate to the source relation;
    * the interval arithmetic is per-row on ~20 rows.
    */
  def q212WilsonBound(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(count(lit(1)).as("n"),
        sum(when($"n_chars" < 200, 1L).otherwise(0L)).as("k"))
      .withColumn("rate_bp", expr("(k * 10000) div n"))
      .withColumn("rad", expr("(40000 * 38416 * k * (n - k)) div n" +
        " + CAST(38416 AS BIGINT) * 38416"))
      .withColumn("s0",
        expr("CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT)"))
      .withColumn("isq", expr("CASE WHEN (s0 + 1) * (s0 + 1) <= rad" +
        " THEN s0 + 1 WHEN s0 * s0 > rad THEN s0 - 1 ELSE s0 END"))
      .withColumn("wilson_ub_bp",
        expr("((20000 * k + 38416 + isq) * 10000) div (20000 * n + 76832)"))
      .select($"source", $"n".as("n_docs"), $"k".as("n_defect"),
        $"rate_bp", $"wilson_ub_bp",
        ($"wilson_ub_bp" >= $"rate_bp").as("ub_dominates"))
      .orderBy($"source")
  }

  val q212Sql: String =
    """WITH s AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END)
      |              AS BIGINT) AS k
      |  FROM documents GROUP BY source),
      |r AS (SELECT *, (40000 * 38416 * k * (n - k)) // n
      |               + CAST(38416 AS BIGINT) * 38416 AS rad FROM s),
      |q AS (SELECT *, CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT)
      |               AS s0 FROM r),
      |i AS (SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= rad THEN s0 + 1
      |                     WHEN s0 * s0 > rad THEN s0 - 1 ELSE s0 END
      |               AS isq FROM q)
      |SELECT source, n AS n_docs, k AS n_defect,
      |       CAST(k * 10000 // n AS BIGINT) AS rate_bp,
      |       CAST((20000 * k + 38416 + isq) * 10000
      |            // (20000 * n + 76832) AS BIGINT) AS wilson_ub_bp,
      |       (20000 * k + 38416 + isq) * 10000 // (20000 * n + 76832)
      |         >= k * 10000 // n AS ub_dominates
      |FROM i ORDER BY source""".stripMargin

  /** tmpfs scratch for the ephemeral CSV extract (same policy as the
    * q49 mart / q101 variant-compaction scratch), tracked + swept by
    * OpUtils.Scratch.
    */
  private def scratchDir(prefix: String): String = OpUtils.Scratch.dir(prefix)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_data_contract" -> (q102DataContract _),
    "q203_corrupt_record_audit" -> (q203CorruptRecordAudit _),
    "q211_srm_audit" -> (q211SrmAudit _),
    "q212_wilson_bound" -> (q212WilsonBound _),
    "q121_k_anonymity" -> (q121KAnonymity _),
    "q142_erasure_audit" -> (q142ErasureAudit _),
    "q150_benford_audit" -> (q150BenfordAudit _),
    "q168_l_diversity" -> (q168LDiversity _))

  val oracleSql: Map[String, String] = Map(
    "q203_corrupt_record_audit" -> q203Sql,
    "q211_srm_audit" -> q211Sql,
    "q212_wilson_bound" -> q212Sql,
    "q102_data_contract" -> q102Sql,
    "q121_k_anonymity" -> q121Sql,
    "q142_erasure_audit" -> q142Sql,
    "q150_benford_audit" -> q150Sql,
    "q168_l_diversity" -> q168Sql)
}
