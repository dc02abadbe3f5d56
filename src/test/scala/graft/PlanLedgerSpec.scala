package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-fingerprint regression gate over EVERY declared query (r12 verdict
  * item 1): recompute each query's canonical physical-plan fingerprint
  * ([[graft.tools.PlanLedger.canonical]]) and fail on any drift from the
  * committed ledger (`tools/plan_ledger.txt`).
  *
  * PlanSpec pins specific plan PROPERTIES for ~dozens of queries; this
  * suite pins plan SHAPE for all of them, so a q220-class regression (an
  * extra window, a lost pushdown, a broadcast flipping to a shuffle) is a
  * red test naming the exact operator lines that moved — not something a
  * human has to notice in a bench artifact.
  *
  * Intentional plan changes are an explicit ledger update:
  *
  *   sbt "runMain graft.tools.PlanLedger"   # rewrites tools/plan_ledger.txt
  *
  * then commit the diff — the canonical form is line-diffable, so review
  * answers "what did this change do to the plan?" directly.
  *
  * Environment contract: fingerprints are environment-normalized (no ids,
  * paths, or partition counts) but memo-state-dependent at the margins, so
  * BOTH the generator and this suite plan all queries in the same numeric
  * order inside a FRESH session (clean memo state) on the same fixture
  * (sf0.001) and session shape (local[4], 4 shuffle partitions).
  */
class PlanLedgerSpec extends AnyFunSuite with SparkSpec {

  private lazy val committed: Map[String, String] =
    graft.tools.PlanLedger.parse(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("tools/plan_ledger.txt")), "UTF-8")).toMap

  // One construction pass for all queries, in ledger order, in a fresh
  // session: memo hot state keys on the session instance, so a fresh
  // session reproduces the generator's cold-start build order exactly
  // regardless of which suites ran before this one.
  private lazy val recomputed: Map[String, String] =
    graft.tools.PlanLedger.build(spark.newSession(), sfDir).toMap

  test("ledger covers exactly the declared query set") {
    val declared = SparkEntry.queries.keySet
    val inLedger = committed.keySet
    assert(inLedger == declared,
      s"ledger out of sync — missing: ${(declared -- inLedger).toSeq.sorted}, " +
        s"stale: ${(inLedger -- declared).toSeq.sorted}. " +
        "Regenerate: sbt \"runMain graft.tools.PlanLedger\" and commit.")
  }

  private def firstDiff(a: String, b: String): String = {
    val (la, lb) = (a.linesIterator.toVector, b.linesIterator.toVector)
    val i = la.zipAll(lb, "<missing>", "<missing>").indexWhere { case (x, y) => x != y }
    if (i < 0) "(identical?)"
    else s"first drift at line ${i + 1}:\n  ledger:   ${la.lift(i).getOrElse("<missing>")}\n" +
      s"  current:  ${lb.lift(i).getOrElse("<missing>")}"
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name plan shape matches the committed ledger") {
      val want = committed.getOrElse(name, "")
      val got = recomputed(name)
      assert(want == got,
        s"\nUNEXPLAINED PLAN DRIFT for $name — if intentional, regenerate the " +
          "ledger (sbt \"runMain graft.tools.PlanLedger\") and commit the diff.\n" +
          firstDiff(want, got) +
          s"\n--- committed ---\n$want--- current ---\n$got")
    }
  }
}
