package graft.ml

import java.nio.file.Files
import org.apache.spark.ml.PipelineModel
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

class ScoringSpec extends AnyFunSuite with SparkSpec {

  test("train, persist, reload, batch-score orders") {
    val model = Scoring.trainOrderClassifier(spark, sfDir)
    val dir = Files.createTempDirectory("graft_model").toString + "/m"
    model.write.overwrite().save(dir)
    val reloaded = PipelineModel.load(dir)
    val scored = Scoring.scoreOrders(reloaded, Tables.orders(spark, sfDir))
    assert(scored.count() == Tables.orders(spark, sfDir).count())
    val preds = scored.select("prediction").distinct()
      .collect().map(_.getDouble(0)).toSet
    assert(preds.subsetOf(Set(0.0, 1.0)))
  }

  test("kmeans clusters embeddings into k groups") {
    val clustered = Scoring.clusterEmbeddings(spark, sfDir, k = 4)
    assert(clustered.count() == 500)
    val clusters = clustered.select("cluster").distinct().count()
    assert(clusters > 1 && clusters <= 4)
  }

  test("ivf top-k returns exact cosines, bounded per query, within cluster") {
    val res = Scoring.ivfTopK(spark, sfDir, k = 4, topK = 3)
    val rows = res.collect()
    assert(rows.nonEmpty)
    // at most topK per query, ranks contiguous from 1
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.values.forall(_.length <= 3))
    assert(byQuery.values.forall(g => g.map(_.getInt(1)).sorted.sameElements(1 to g.length)))
    // scores are true cosines: spot-check one against brute force
    val q = byQuery.keys.head
    val top = byQuery(q).minBy(_.getInt(1))
    val brute = graft.operators.Similarity.cosineTopkAllPairs(spark, sfDir)
      .filter(s"a_id = $q").collect()
    assert(brute.exists(r => r.getLong(2) == top.getLong(2) &&
      r.getDouble(3) == top.getDouble(4)) ||
      brute.forall(_.getDouble(3) >= top.getDouble(4)))
  }
}
