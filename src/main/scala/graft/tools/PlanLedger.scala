package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan

/** Plan-fingerprint regression ledger (r12 verdict item 1).
  *
  * The q220 regression (r11) — an avoidable unbounded window sneaking into
  * an otherwise hash-green query — was caught by a human reading the bench
  * artifact. PlanSpec pins ~dozens of queries' plan properties by hand; the
  * other ~200 declared queries could regress to a worse physical plan while
  * staying value-identical, and nothing would fail. This module makes plan
  * SHAPE a first-class regression surface for every declared query:
  *
  *  - [[canonical]] renders a query's physical plan as a normalized
  *    operator tree: node classes, join types + build sides, aggregate
  *    modes + functions, window frames + partition-spec arity, exchange
  *    partitioning kinds, sort scope (global vs per-partition), pushed
  *    parquet filters and read schemas. Everything environment- or
  *    run-specific is excluded by construction: no expression IDs, no
  *    paths/locations, no partition COUNTS (core-count dependent), no
  *    stats, no codegen IDs.
  *  - [[PlanLedger.main]] materializes the ledger for every declared
  *    query at the spec fixture (sf0.001, the same local[4] session shape
  *    the test suite uses) into `tools/plan_ledger.txt` — a committed,
  *    line-diffable artifact.
  *  - `PlanLedgerSpec` recomputes all fingerprints and fails on ANY drift
  *    from the committed ledger. An intentional plan change is an explicit
  *    ledger regeneration + commit, reviewed as a diff; an accidental one
  *    is a red test naming the exact operator lines that moved.
  *
  * The canonical form deliberately reads top-down like `explain`, so a
  * ledger diff in review answers "what did this change do to the plan?"
  * without rerunning anything.
  *
  * Determinism contract: fingerprints are taken on the PRE-EXECUTION plan
  * (AQE's initial plan, before any runtime re-optimization) in a fresh
  * session, so they depend only on code + fixture + session config — the
  * same inputs the committed ledger was generated from.
  */
object PlanLedger {

  /** The deterministic pre-execution physical plan: under AQE the top node
    * is AdaptiveSparkPlanExec (a leaf to tree traversal), whose
    * `initialPlan` is the fully prepared plan — exchanges inserted by
    * EnsureRequirements — before any runtime adaptivity. Never executes.
    */
  private def root(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
    case p => p
  }

  /** One normalized line per operator, indented by tree depth. */
  def canonical(df: DataFrame): String = {
    val sb = new StringBuilder
    def walk(n: SparkPlan, d: Int): Unit = {
      sb.append("  " * d).append(describe(n)).append('\n')
      n.children.foreach(walk(_, d + 1))
    }
    walk(root(df), 0)
    sb.toString
  }

  private def cls(n: Any): String =
    n.getClass.getSimpleName.stripSuffix("$").stripSuffix("Exec")

  private def describe(n: SparkPlan): String = {
    import org.apache.spark.sql.execution
    // subquery expressions (scalar/IN) hang off expressions, not children;
    // their inner plans are planned lazily under AQE, so record presence
    // + arity rather than recursing into a runtime-dependent tree
    val subqN = n.expressions.flatMap(_.collect {
      case p: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => p
    }).size
    val subq = if (subqN > 0) s" subq=$subqN" else ""
    val body = n match {
      case j: execution.joins.BaseJoinExec =>
        val side = j match {
          case b: execution.joins.BroadcastHashJoinExec => s" build=${cls(b.buildSide)}"
          case s: execution.joins.ShuffledHashJoinExec => s" build=${cls(s.buildSide)}"
          case b: execution.joins.BroadcastNestedLoopJoinExec => s" build=${cls(b.buildSide)}"
          case _ => ""
        }
        s"${cls(j)}[${j.joinType}$side]"
      case a: execution.aggregate.BaseAggregateExec =>
        val modes = a.aggregateExpressions.map(_.mode.toString).distinct.sorted.mkString("+")
        val funcs = a.aggregateExpressions.map(_.aggregateFunction.prettyName)
          .distinct.sorted.mkString(",")
        s"${cls(a)}[ngroup=${a.groupingExpressions.size} modes=$modes funcs=$funcs]"
      case w: execution.window.WindowExecBase =>
        val frames = w.windowExpression.flatMap(_.collect {
          case we: org.apache.spark.sql.catalyst.expressions.WindowExpression =>
            s"${we.windowFunction.prettyName} ${we.windowSpec.frameSpecification.sql}"
        }).distinct.sorted.mkString("; ")
        s"${cls(w)}[npart=${w.partitionSpec.size} $frames]"
      case w: execution.window.WindowGroupLimitExec =>
        s"${cls(w)}[${w.rankLikeFunction.prettyName} limit=${w.limit}]"
      case e: execution.exchange.ShuffleExchangeExec =>
        s"${cls(e)}[${cls(e.outputPartitioning)}]"
      case e: execution.exchange.BroadcastExchangeExec =>
        s"${cls(e)}[${cls(e.mode)}]"
      case s: execution.SortExec =>
        s"${cls(s)}[global=${s.global} nkeys=${s.sortOrder.size}]"
      case t: execution.TakeOrderedAndProjectExec =>
        s"${cls(t)}[limit=${t.limit}]"
      case g: execution.GenerateExec =>
        s"${cls(g)}[${g.generator.prettyName} outer=${g.outer}]"
      case e: execution.ExpandExec =>
        s"${cls(e)}[nproj=${e.projections.size}]"
      case f: execution.FileSourceScanExec =>
        // pushed filters use source.Filter column-name strings (no expr
        // IDs — stable); ReadSchema is the pruned column set. Location is
        // deliberately absent (scratch tokens / absolute paths).
        val pushed = f.metadata.get("PushedFilters").map(p => s" pushed=$p").getOrElse("")
        val schema = f.metadata.get("ReadSchema").map(s => s" read=$s").getOrElse("")
        val pf = if (f.partitionFilters.nonEmpty) s" npartfilters=${f.partitionFilters.size}" else ""
        s"${cls(f)}[format=${f.relation.fileFormat.toString}$pushed$schema$pf]"
      case _ =>
        cls(n)
    }
    body + subq
  }

  /** Fingerprints for every declared query, in the suite's canonical
    * (numeric) order — the order matters because first-touch memo builds
    * change which relations are already checkpointed when later queries
    * plan, and the committed ledger must be reproducible.
    */
  def build(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val names = graft.SparkEntry.queries.keys.toSeq.sortBy { n =>
      val num = n.drop(1).takeWhile(_.isDigit)
      (if (num.nonEmpty) num.toInt else Int.MaxValue, n)
    }
    names.map { n =>
      val fp = canonical(graft.SparkEntry.queries(n)(spark, dir))
      // construction can localCheckpoint bounded intermediates; sweep the
      // unpinned ones between queries (the Bench discipline) so 237
      // constructions don't accumulate dead blocks. The fingerprint is
      // already taken; the plan is never executed afterwards.
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
      n -> fp
    }
  }

  /** Serialize to the committed, diffable text format:
    * `== <name> ==` header lines, canonical tree beneath each.
    */
  def render(entries: Seq[(String, String)]): String =
    entries.map { case (n, fp) => s"== $n ==\n$fp" }.mkString

  /** Parse [[render]]'s format back to (name, fingerprint) pairs. */
  def parse(text: String): Seq[(String, String)] = {
    val header = "^== (.+) ==$".r
    val out = scala.collection.mutable.ArrayBuffer[(String, StringBuilder)]()
    text.linesIterator.foreach {
      case header(name) => out += (name -> new StringBuilder)
      case line if out.nonEmpty => out.last._2.append(line).append('\n')
      case _ => ()
    }
    out.map { case (n, b) => (n, b.toString) }.toSeq
  }

  /** Regenerate tools/plan_ledger.txt. Mirrors the spec environment
    * exactly: local[4], 4 shuffle partitions, sf0.001.
    */
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "tools/plan_ledger.txt"
    val spark = graft.core.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val entries = build(spark.newSession(), dir)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      render(entries).getBytes("UTF-8"))
    println(s"[plan-ledger] wrote ${entries.size} fingerprints to $out")
    spark.stop()
  }
}
