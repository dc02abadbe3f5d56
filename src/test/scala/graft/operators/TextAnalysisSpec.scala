package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Language-ID semantics on PLANTED real-language sentences: the marker
  * heuristic must genuinely discriminate when the text carries signal
  * (the harness fixture's docs are language-tagged English salad with no
  * signal — see TextAnalysis.langMarkers — so this is where the
  * classifier's correctness is actually proven).
  */
class TextAnalysisSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("langId classifies planted multilingual sentences correctly") {
    val docs = Seq(
      (0L, "the cat and the dog of the house and the tree", "en"),
      (1L, "der hund und die katze und das haus nicht der baum", "de"),
      (2L, "el perro y la casa que para los gatos el sol", "es"),
      (3L, "le chien est pour les maisons des chats le soleil", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langId(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("labeled_lang"), r.getAs[String]("predicted_lang"))).toMap
    got.foreach { case (id, (labeled, predicted)) =>
      assert(predicted == labeled, s"doc $id: labeled $labeled, predicted $predicted")
    }
  }

  test("langId tie-break is declaration-order deterministic") {
    // no markers at all -> all scores 0 -> first declared language wins
    val docs = Seq((0L, "xyzzy plugh", "zz")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langId(docs).collect().head
    assert(got.getAs[String]("predicted_lang") == TextAnalysis.langMarkers.head._1)
  }

  test("training mix: exact 1-in-5 per stratum, stable under repartitioning") {
    val a = TextAnalysis.q53TrainingMix(spark, sfDir).collect()
    // per-source counts are exactly floor(n/5)
    val bySource = a.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rows) =>
      val n = rows.head.getAs[Long]("n_source")
      assert(rows.length == (n / 5).toInt, s"$src: ${rows.length} of $n")
    }
    // determinism: same doc set on a second run
    val b = TextAnalysis.q53TrainingMix(spark, sfDir).collect()
    assert(a.map(_.getLong(0)).toSet == b.map(_.getLong(0)).toSet)
  }

  test("fixture corpus exercises every classifier branch") {
    val preds = TextAnalysis.q28LangId(spark, sfDir)
      .groupBy("predicted_lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(preds.keySet == TextAnalysis.langMarkers.map(_._1).toSet,
      s"expected all branches live, got $preds")
  }

  test("sequence packing lays docs contiguously within per-source budgets") {
    val rows = TextAnalysis.q55SequencePacking(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      // replay the layout serially: each doc starts where the previous
      // one in doc_id order ended, sequences are cum/512
      var cum = 0L
      rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("seq_id") == cum / 512, s"$src seq_id")
        assert(r.getAs[Long]("seq_offset") == cum % 512, s"$src seq_offset")
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("tfidf top terms: exactly 5 per stratum, scores consistent") {
    val rows = TextAnalysis.q56TfidfTopTerms(spark, sfDir).collect()
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      assert(rs.length == 5, s"$src: ${rs.length}")
      // descending score within stratum (output is ordered source, score desc)
      val scores = rs.map(_.getAs[Long]("score")).toSeq
      assert(scores == scores.sorted.reverse, s"$src not rank-ordered")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("score") ==
        r.getAs[Long]("tf") * n * 1000L / r.getAs[Long]("df"))
    }
  }
}
