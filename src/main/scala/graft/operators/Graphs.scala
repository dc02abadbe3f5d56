package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph analytics over relational co-occurrence — the family the
  * connected-components dedup clustering (q51/q83, large-star/small-star)
  * opened, extended to local structure: triangle counting with
  * degree-ordered orientation, the classic MapReduce-era technique
  * (Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11) that keeps the wedge join bounded on skewed degree
  * distributions. The reference has no graph layer at all; co-purchase
  * structure is the kind of signal its declared-but-empty ML service
  * (`citibike_project/api/app.py`, 0 bytes) would consume.
  */
object Graphs {

  /** q125 — per-part triangle counts in the co-purchase graph: parts are
    * vertices, an edge connects two parts that appear in the same order,
    * and a triangle is three mutually co-purchased parts (the density
    * signal behind bundle detection / item-item communities).
    *
    * Scale shape: the naive wedge join explodes on hubs — a vertex of
    * degree d contributes C(d,2) wedges, and real co-purchase graphs are
    * heavy-tailed. Orienting every edge from its lower-(degree, id)
    * endpoint to its higher one makes out-degree O(√E) for ANY degree
    * distribution, so wedge count drops from Σ C(deg,2) (quadratic in
    * the hub degree) to Σ C(outdeg,2) ≤ O(E^1.5) worst-case — each
    * triangle found exactly once at its lowest-ranked vertex. Three
    * equi-joins total (degree attach ×2, wedge close ×1), all
    * hash-shuffleable; no theta join anywhere. The DuckDB oracle orients
    * by raw part id instead — an independent orientation finding the
    * same (orientation-invariant) triangle set, so a double-count or
    * drop in either orientation flips the driver hash.
    */
  /** Orient an undirected edge list (columns `u`, `v`) from each edge's
    * lower-(degree, id) endpoint to its higher one. Returns (s, t, dt)
    * with `dt` = degree of the target, the rank key later wedge
    * ordering needs. This is the whole skew defence: the measured hub
    * demonstration (GraphsSpec) shows a 20k-star graph forming 2×10⁸
    * wedges under id orientation and 2×10⁴ under this one — the hub is
    * always the TARGET, so it contributes no wedges at all.
    */
  def orientByDegree(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val deg = edges.select(explode(array($"u", $"v")).as("p"))
      .groupBy($"p").agg(count(lit(1)).as("d"))
    edges
      .join(deg.select($"p".as("u"), $"d".as("du")), Seq("u"))
      .join(deg.select($"p".as("v"), $"d".as("dv")), Seq("v"))
      .select(
        when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"),
          struct($"u".as("s"), $"v".as("t"), $"dv".as("dt")))
          .otherwise(struct($"v".as("s"), $"u".as("t"), $"du".as("dt"))).as("e"))
      .select($"e.s".as("s"), $"e.t".as("t"), $"e.dt".as("dt"))
  }

  /** Per-vertex triangle counts for an undirected edge list (`u`, `v`):
    * orient by degree, form wedges at each lowest-ranked vertex with
    * rank-ordered targets, close them against the oriented edge set,
    * attribute each triangle to its three corners.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val oriented = orientByDegree(edges)
    val wedges = oriented.as("x").join(oriented.as("y"),
        $"x.s" === $"y.s" &&
          ($"x.dt" < $"y.dt" || ($"x.dt" === $"y.dt" && $"x.t" < $"y.t")))
      .select($"x.s".as("a"), $"x.t".as("b"), $"y.t".as("c"))
    val triangles = wedges.join(
      oriented.select($"s".as("b"), $"t".as("c")), Seq("b", "c"))
    triangles
      .select(explode(array($"a", $"b", $"c")).as("part"))
      .groupBy($"part").agg(count(lit(1)).as("n_triangles"))
  }

  def q125TriangleCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val po = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ord"), $"l_partkey".as("part")).distinct()
    val edges = po.as("a").join(po.as("b"), Seq("ord"))
      .filter($"a.part" < $"b.part")
      .select($"a.part".as("u"), $"b.part".as("v")).distinct()
    triangleCounts(edges).orderBy($"part")
  }

  val q125Sql: String =
    """WITH po AS (
      |  SELECT DISTINCT l_orderkey AS ord, l_partkey AS part FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.part AS u, b.part AS v
      |  FROM po a JOIN po b ON a.ord = b.ord AND a.part < b.part),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM e e1
      |  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
      |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
      |SELECT part, count(*) AS n_triangles
      |FROM (SELECT a AS part FROM tri
      |      UNION ALL SELECT b FROM tri
      |      UNION ALL SELECT c FROM tri) t
      |GROUP BY part ORDER BY part""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q125_triangle_count" -> (q125TriangleCount _))

  val oracleSql: Map[String, String] = Map(
    "q125_triangle_count" -> q125Sql)
}
