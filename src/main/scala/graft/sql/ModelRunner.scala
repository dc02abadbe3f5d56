package graft.sql

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** SQL-transform layer (the reference declares dbt with `dbt run` but
  * ships no models — `citibike_project/docker-compose.yaml:115-126`,
  * `dbt/requirements.txt:2`; SURVEY.md §0). This is the engine-native
  * equivalent: a directory of `<name>.sql` files, each one model;
  * dependencies are inferred from references to other model names;
  * models run in topological order as temp views; requested finals
  * materialize to parquet.
  *
  * Views stay lazy, so Catalyst optimizes ACROSS models — a filter in a
  * downstream mart pushes into the upstream staging view's scan, which a
  * materialize-every-model dbt run can't do.
  */
object ModelRunner {

  final case class Model(name: String, sql: String, deps: Set[String])

  /** Load every `<name>.sql` in `dir`; deps = other model names that
    * appear as identifiers in this model's SQL.
    */
  def load(dir: Path): Seq[Model] = {
    val files = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.toString)
    val names = files.map(f => f.getFileName.toString.stripSuffix(".sql")).toSet
    files.map { f =>
      val name = f.getFileName.toString.stripSuffix(".sql")
      val sql = Files.readString(f)
      val ids = "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(sql).toSet
      Model(name, sql, (names - name).intersect(ids))
    }
  }

  /** Kahn topological order; cycles are an error. */
  def topoSort(models: Seq[Model]): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    val order = scala.collection.mutable.ArrayBuffer[Model]()
    val done = scala.collection.mutable.Set[String]()
    val visiting = scala.collection.mutable.Set[String]()
    def visit(m: Model): Unit = {
      if (done(m.name)) return
      require(!visiting(m.name), s"model cycle through ${m.name}")
      visiting += m.name
      m.deps.toSeq.sorted.foreach(d => visit(byName(d)))
      visiting -= m.name
      done += m.name
      order += m
    }
    models.foreach(visit)
    order.toSeq
  }

  /** Register base tables + all models as views (dependency order),
    * returning the model DataFrames by name.
    */
  def run(spark: SparkSession, modelsDir: Path, sfDir: String): Map[String, DataFrame] = {
    Tables.registerAll(spark, sfDir)
    topoSort(load(modelsDir)).map { m =>
      val df = spark.sql(m.sql)
      df.createOrReplaceTempView(m.name)
      m.name -> df
    }.toMap
  }

  /** `dbt run`: materialize the named finals (or every model) to parquet. */
  def materialize(spark: SparkSession, modelsDir: Path, sfDir: String,
      outDir: String, finals: Seq[String] = Seq.empty): Unit = {
    val all = run(spark, modelsDir, sfDir)
    val picked = if (finals.nonEmpty) finals else all.keys.toSeq.sorted
    picked.foreach(n => all(n).write.mode("overwrite").parquet(s"$outDir/$n"))
  }
}
