package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus-preparation operators over `documents` — the tokenizer-training
  * and data-splitting stages of an LLM pipeline (north star; the reference
  * has no text layer — its nearest analogue is the idempotent-load
  * discipline of `citibike_project/etl/ingest_data.py:251-262`).
  *
  * All three queries follow the repo's oracle-parity discipline: counts
  * stay integer until a final IEEE-exact division, hash-derived values are
  * md5-based (engine-portable), and every ordering is total.
  */
object Corpus {

  private def toks: Column = split(trim(col("text")), " ")

  /** Documents spread across all cores (harness parquet is a single row
    * group — one scan partition otherwise).
    */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).repartition(spark.sparkContext.defaultParallelism)

  /** q68 — vocabulary builder with cumulative coverage: token frequencies,
    * frequency rank, and the cumulative share of the corpus each rank
    * prefix covers, gated at min_count >= 5. This is the tokenizer-prep
    * census (vocab truncation point = where cum_share crosses the target).
    *
    * Scale shape: one (token) shuffle with map-side partial counts — the
    * token relation is corpus-sized but the aggregated vocabulary is tiny
    * relative to the corpus (Heaps' law: ~1M types for 100 TB of text), so
    * the single-partition ranking window over the VOCABULARY is safe; the
    * corpus itself is never globally sorted.
    */
  def q68VocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"cnt".desc, $"token")
    docs(spark, dir)
      .select(explode(toks).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_cnt", sum($"cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum($"cnt").over(Window.partitionBy()))
      .withColumn("cum_share", $"cum_cnt".cast("double") / $"total")
      .filter($"cnt" >= 5)
      .select($"token", $"cnt", $"rank", $"cum_share")
      .orderBy($"rank")
  }

  val q68Sql: String =
    """WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS token FROM documents),
      |v AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
      |r AS (SELECT token, cnt,
      |        CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank,
      |        CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
      |        CAST(SUM(cnt) OVER () AS BIGINT) AS total
      |      FROM v)
      |SELECT token, cnt, rank, CAST(cum_cnt AS DOUBLE) / total AS cum_share
      |FROM r
      |WHERE cnt >= 5
      |ORDER BY rank""".stripMargin

  /** q69 — bigram collocation mining by lift. For adjacent token pairs
    * (w1, w2): lift = P(w1 w2) / (P(w1)·P(w2)) computed entirely from
    * exact integer counts — lift = (c_ab · N_uni²) / (N_bi · c_a · c_b) —
    * with ONE final double division, so both engines produce the same
    * IEEE value (PMI is log(lift); the log is left to the consumer since
    * transcendental bit-parity across engines is not guaranteed).
    * min-count gate >= 20 keeps the noise floor out.
    *
    * Scale shape: the bigram relation is a pure map (generate) off the
    * token array; two count aggregations (bigram key, unigram key) with
    * map-side combine; the unigram table is vocabulary-sized so both
    * probability joins broadcast. Never quadratic.
    */
  def q69BigramLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = docs(spark, dir).select($"doc_id", toks.as("toks"))
      // branch point: unigrams + bigrams both derive from the token arrays
      .localCheckpoint()
    val uni = t.select(explode($"toks").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    // corpus totals as an in-plan 1-row broadcast, not a driver-side
    // collect: sum(len) tokens, sum(len-1) bigrams
    val totals = t.select(
      sum(size($"toks")).cast("long").as("n_uni"),
      (sum(size($"toks")) - count(lit(1))).cast("long").as("n_bi"))
    val bi = t.select(explode(expr(
        """CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>)
          |ELSE transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))
          |END""".stripMargin)).as("b"))
      .select($"b.w1".as("w1"), $"b.w2".as("w2"))
    bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c_ab"))
      .filter($"c_ab" >= 20)
      .join(broadcast(uni.select($"w".as("w1"), $"c".as("c_a"))), Seq("w1"))
      .join(broadcast(uni.select($"w".as("w2"), $"c".as("c_b"))), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        ($"c_ab" * $"n_uni" * $"n_uni").cast("double") /
          ($"n_bi" * $"c_a" * $"c_b").cast("double"))
      .select($"w1", $"w2", $"c_ab", $"lift")
      .orderBy($"lift".desc, $"w1", $"w2")
  }

  val q69Sql: String =
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
      |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      |        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
      |n_uni AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS n FROM t),
      |n_bi AS (SELECT CAST(SUM(len(toks) - 1) AS BIGINT) AS n FROM t),
      |pos AS (SELECT unnest(range(len(toks) - 1)) AS i, toks FROM t WHERE len(toks) >= 2),
      |bi AS (SELECT toks[i+1] AS w1, toks[i+2] AS w2 FROM pos),
      |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bi GROUP BY 1, 2)
      |SELECT bc.w1, bc.w2, bc.c_ab,
      |  CAST(bc.c_ab * n_uni.n * n_uni.n AS DOUBLE) /
      |  CAST(n_bi.n * a.c * b.c AS DOUBLE) AS lift
      |FROM bc
      |CROSS JOIN n_uni
      |CROSS JOIN n_bi
      |JOIN uni a ON a.w = bc.w1
      |JOIN uni b ON b.w = bc.w2
      |WHERE bc.c_ab >= 20
      |ORDER BY lift DESC, w1, w2""".stripMargin

  /** q70 — deterministic stratified train/val/test split. Assignment is
    * content-free and stable under reshuffling/re-ingestion: the last hex
    * digit of md5(doc_id) buckets 12/2/2 sixteenths into train/val/test
    * (engine-portable — both engines produce the same lowercase hex md5).
    * Output is the split audit a pipeline records: per (source, split)
    * document and token counts plus the realized within-source share.
    *
    * Scale shape: pure map to assign, one (source, split) aggregation,
    * and a window over the per-source partials (at most 3 rows per
    * source) for the share — the corpus is never re-sorted or joined.
    */
  def q70StratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hx = substring(md5($"doc_id".cast("string")), 32, 1)
    val ws = Window.partitionBy($"source")
    docs(spark, dir)
      .withColumn("split",
        when(hx <= "b", "train").when(hx <= "d", "val").otherwise("test"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"), sum(size(toks)).cast("long").as("n_tokens"))
      .withColumn("share", $"n_docs".cast("double") / sum($"n_docs").over(ws))
      .select($"source", $"split", $"n_docs", $"n_tokens", $"share")
      .orderBy($"source", $"split")
  }

  val q70Sql: String =
    """WITH a AS (
      |  SELECT source,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) <= 'b' THEN 'train'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) <= 'd' THEN 'val'
      |         ELSE 'test' END AS split,
      |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |g AS (SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |        CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      |      FROM a GROUP BY 1, 2)
      |SELECT source, split, n_docs, n_tokens,
      |  CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY source) AS share
      |FROM g
      |ORDER BY source, split""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_vocab_coverage" -> (q68VocabCoverage _),
    "q69_bigram_lift" -> (q69BigramLift _),
    "q70_stratified_split" -> (q70StratifiedSplit _))

  val oracleSql: Map[String, String] = Map(
    "q68_vocab_coverage" -> q68Sql,
    "q69_bigram_lift" -> q69Sql,
    "q70_stratified_split" -> q70Sql)
}
