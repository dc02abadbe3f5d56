package graft.ml

import graft.operators.OpUtils.SpreadOps
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** ML-scoring hook (SURVEY.md §0: the reference declares a FastAPI +
  * scikit-learn scoring service with an empty app,
  * `citibike_project/ml_service/requirements.txt:1-6`,
  * `ml_service/app.py` 0 bytes). The Spark-native equivalent is batch
  * scoring inside the engine: MLlib pipelines over the same DataFrames,
  * trained and applied distributed — no service hop, no row-at-a-time
  * REST scoring. Model persistence via `PipelineModel.save/load` replaces
  * joblib.
  */
object Scoring {

  /** Train a trip-duration-style classifier surrogate on the harness data:
    * predict high-value orders from (quantity-ish) features. Returns the
    * fitted pipeline — `save(path)` for the model registry.
    */
  def trainOrderClassifier(spark: SparkSession, dir: String): PipelineModel = {
    import spark.implicits._
    val df = Tables.orders(spark, dir)
      .withColumn("label", when($"o_totalprice" > 1000.0, 1.0).otherwise(0.0))
      .withColumn("month", month($"o_orderdate").cast("double"))
      .withColumn("prio", regexp_extract($"o_orderpriority", "^(\\d)", 1).cast("double"))
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("month", "prio")).setOutputCol("features"),
      new LogisticRegression().setMaxIter(10).setLabelCol("label")))
    pipeline.fit(df)
  }

  /** Batch scoring: model applied as a plan stage over any orders-shaped
    * input (the "ML service" as a DataFrame transform).
    */
  def scoreOrders(model: PipelineModel, orders: DataFrame): DataFrame = {
    val df = orders
      .withColumn("month", month(col("o_orderdate")).cast("double"))
      .withColumn("prio", regexp_extract(col("o_orderpriority"), "^(\\d)", 1).cast("double"))
    model.transform(df)
      .select(col("o_orderkey"), col("prediction"), col("probability"))
  }

  /** Unsupervised structure over the embedding table: KMeans on the
    * Array[Float] vectors (array_to_vector bridges to MLlib's VectorUDT).
    * The distributed counterpart of the "IVF coarse quantizer" an ANN
    * index would train.
    */
  def clusterEmbeddings(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, dir)
      .withColumn("features", array_to_vector($"embedding"))
    val model = new KMeans().setK(k).setSeed(42L).setFeaturesCol("features").fit(vecs)
    model.transform(vecs).select($"vec_id", $"label", $"prediction".as("cluster"))
  }

  /** IVF-style ANN: KMeans coarse quantizer assigns every vector to a
    * cluster; queries search only their own cluster's inverted list
    * (nProbe=1 here) with the exact codegen cosine kernel. The scale
    * companion to the hyperplane-LSH variant (Similarity.q35AnnLsh):
    * centroids broadcast, candidate generation is an equi-join on
    * cluster id — n²/k pairs instead of n². Not oracle-checked (KMeans
    * initialization is MLlib-internal); quality is asserted in tests
    * against the brute-force baseline.
    */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 8, topK: Int = 3): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val assigned = clusterEmbeddings(spark, dir, k)
      .join(Tables.embeddings(spark, dir), Seq("vec_id"))
      .select($"vec_id", $"cluster", $"embedding")
      .spreadAcrossCores
      .localCheckpoint()
    val a = assigned.select($"vec_id".as("a_id"), $"cluster", $"embedding".as("ea"))
    val b = assigned.select($"vec_id".as("b_id"), $"cluster", $"embedding".as("eb"))
    val w = Window.partitionBy($"a_id").orderBy($"cs".desc, $"b_id")
    a.join(b, Seq("cluster"))
      .filter($"a_id" =!= $"b_id")
      .withColumn("cs", graft.functions.VectorFunctions.cosineSim($"ea", $"eb"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= topK)
      .select($"a_id", $"rk", $"b_id", $"cluster", $"cs")
  }
}
