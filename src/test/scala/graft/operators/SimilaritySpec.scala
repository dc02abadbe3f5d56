package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the two-stage IVF near-dup (q48) against the brute-force baseline
  * (q46): precision must be exactly 1.0 (stage-2 verification is exact, so
  * every emitted pair is a true pair with the identical cosine value), and
  * recall on this fixture's random-tail pairs is pinned at its measured
  * floor — the documented IVF tradeoff, not an accident.
  */
class SimilaritySpec extends AnyFunSuite with SparkSpec {

  test("q48 IVF near-dup: precision 1.0 against brute q46, recall pinned") {
    val brute = Similarity.q46EmbeddingNeardup(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.q48IvfNeardup(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // precision: every IVF pair is a brute pair with the identical score
    ivf.foreach { case (k, cs) =>
      assert(brute.contains(k), s"spurious pair $k")
      assert(brute(k) == cs, s"cosine mismatch for $k: ${brute(k)} vs $cs")
    }
    // recall floor: >= 70% of the brute pairs at this SF (measured 5/7;
    // these pairs sit at cs 0.45-0.52 in a 0.40-mode random background,
    // where no sublinear prefilter is lossless)
    assert(brute.nonEmpty)
    val recall = ivf.size.toDouble / brute.size
    assert(recall >= 0.7, s"recall $recall (${ivf.size}/${brute.size})")
  }

  test("q50 typed-UDAF centroids agree bit-for-bit with q36 column form") {
    val q36 = Similarity.q36LabelCentroids(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val q50 = Similarity.q50CentroidUdaf(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(q50.keySet == q36.keySet)
    q50.foreach { case (k, c) =>
      assert(q36(k) == c, s"centroid mismatch at $k: ${q36(k)} vs $c")
    }
  }
}
