package graft.operators

import graft.operators.OpUtils.SpreadOps
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
    Tables.documents(spark, dir).spreadAcrossCores

  /** q229 — vocabulary growth curve (Heaps' law, measured): the corpus
    * is cut into ten equal doc-id deciles (a proxy for ingest order)
    * and each decile reports the tokens it adds and the vocabulary it
    * CONTRIBUTES FIRST — cumulative types vs cumulative tokens is the
    * V(N) ≈ K·N^β curve that answers the scaling question "does more
    * data still buy new vocabulary, or are we re-reading the same
    * types?" (the saturation signal a corpus steward reads before
    * paying for the next crawl). Every figure is an exact integer:
    * a term's debut decile is min(doc_id) over its occurrences mapped
    * through the same bucket arithmetic as the docs, so Σ new_terms
    * telescopes to the exact distinct-type count.
    *
    * Scale shape: one (token → min(doc_id)) aggregation with map-side
    * combine (vocabulary-sized output, sublinear by this very law),
    * one per-doc token count rollup, and windows only over the 10-row
    * decile relation. The bucket boundary is a broadcast 1-row max —
    * no sort, no rank, no corpus-sized window anywhere.
    */
  def q229VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
    val mx = d.agg(max($"doc_id").as("mx"))
    val bucketed = d.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("(doc_id * 10) div (mx + 1)"))
    val docStats = bucketed.groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum(size(toks).cast("long")).as("n_tokens"))
    val debuts = bucketed
      .select($"doc_id", $"mx", explode(toks).as("token"))
      .groupBy($"token")
      .agg(min($"doc_id").as("first_doc"), max($"mx").as("mx"))
      .select(expr("(first_doc * 10) div (mx + 1)").as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("new_terms"))
    val w = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docStats.join(debuts, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_terms"))
      .select($"bucket", $"n_docs", $"n_tokens", $"new_terms",
        sum($"n_docs").over(w).as("cum_docs"),
        sum($"n_tokens").over(w).as("cum_tokens"),
        sum($"new_terms").over(w).as("cum_vocab"))
      .orderBy($"bucket")
  }

  val q229Sql: String =
    """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
      |b AS (SELECT doc_id, text, (doc_id * 10) // (mx + 1) AS bucket
      |      FROM documents, mx),
      |ds AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |              CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
      |                AS n_tokens
      |       FROM b GROUP BY 1),
      |tf AS (SELECT t.token, min(b.doc_id) AS first_doc
      |       FROM b, unnest(string_split(trim(b.text), ' ')) AS t(token)
      |       GROUP BY 1),
      |nw AS (SELECT (first_doc * 10) // (mx + 1) AS bucket,
      |              CAST(count(*) AS BIGINT) AS new_terms
      |       FROM tf, mx GROUP BY 1)
      |SELECT ds.bucket, n_docs, n_tokens, coalesce(new_terms, 0) AS new_terms,
      |       CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
      |       CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
      |       CAST(sum(coalesce(new_terms, 0)) OVER w AS BIGINT) AS cum_vocab
      |FROM ds LEFT JOIN nw USING (bucket)
      |WINDOW w AS (ORDER BY ds.bucket ROWS BETWEEN UNBOUNDED PRECEDING
      |             AND CURRENT ROW)
      |ORDER BY ds.bucket""".stripMargin

  /** q68 — vocabulary builder with cumulative coverage: token frequencies,
    * frequency rank, and the cumulative share of the corpus each rank
    * prefix covers, gated at min_count >= 5. This is the tokenizer-prep
    * census (vocab truncation point = where cum_share crosses the target).
    *
    * Scale shape: one (token) shuffle with map-side partial counts — the
    * token relation is corpus-sized, the aggregated vocabulary sublinear
    * (Heaps' law: ~1M types for 100 TB of text). The global rank +
    * prefix-sum over the vocabulary is TWO-STAGE rather than a
    * single-partition window: range-partition by the rank order, rank and
    * prefix-sum within each partition, then shift each partition by the
    * (row count, token sum) of the partitions before it — a
    * #partitions-row relation, configuration-sized, not data-sized. No
    * data-dependent relation ever funnels through one task (PlanSpec pins
    * the shape); the checkpoint freezes the range partitioning so the
    * ranked rows and the offset table see identical partition boundaries.
    */
  def q68VocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nParts = spark.sparkContext.defaultParallelism
    val parts = docs(spark, dir)
      .select(explode(toks).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("cnt"))
      .repartitionByRange(nParts, $"cnt".desc, $"token")
      .withColumn("pid", spark_partition_id().cast("long"))
      // branch point (ranked rows + offsets) — and the range sampler must
      // run ONCE: two evaluations could draw different boundaries and
      // disagree on pid between the branches
      .localCheckpoint()
    val wl = Window.partitionBy($"pid").orderBy($"cnt".desc, $"token")
    val ranked = parts
      .withColumn("lrank", row_number().over(wl).cast("long"))
      .withColumn("lcum",
        sum($"cnt").over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wp = Window.orderBy($"pid")
    val offsets = parts.groupBy($"pid")
      .agg(count(lit(1)).as("pn"), sum($"cnt").as("psum"))
      .withColumn("rank_off",
        coalesce(sum($"pn").over(wp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("cum_off",
        coalesce(sum($"psum").over(wp.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total",
        sum($"psum").over(wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"pid", $"rank_off", $"cum_off", $"total")
    ranked.join(broadcast(offsets), Seq("pid"))
      .withColumn("rank", $"lrank" + $"rank_off")
      .withColumn("cum_cnt", $"lcum" + $"cum_off")
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
    * (w1, w2): lift = P(w1 w2) / (P(w1)·P(w2)) =
    * (c_ab · N_uni²) / (N_bi · c_a · c_b), with every factor cast to
    * double BEFORE the multiplies: at the 100 TB design point
    * N_uni ≈ 10¹³, so N_uni² overflows Int64 (Spark would wrap silently,
    * DuckDB would error) — integer products are not an option. Both
    * engines evaluate the identical left-associated IEEE-double tree, so
    * the values still hash-match bit-for-bit (PMI is log(lift); the log
    * is left to the consumer since transcendental bit-parity across
    * engines is not guaranteed). min-count gate >= 20 keeps the noise
    * floor out.
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
      // unigram table unhinted (vocab-sized, scale-dependent — the
      // Selection policy); the 1-row totals stay hinted
      .join(uni.select($"w".as("w1"), $"c".as("c_a")), Seq("w1"))
      .join(uni.select($"w".as("w2"), $"c".as("c_b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        ($"c_ab".cast("double") * $"n_uni".cast("double") * $"n_uni".cast("double")) /
          ($"n_bi".cast("double") * $"c_a".cast("double") * $"c_b".cast("double")))
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
      |  (CAST(bc.c_ab AS DOUBLE) * CAST(n_uni.n AS DOUBLE) * CAST(n_uni.n AS DOUBLE)) /
      |  (CAST(n_bi.n AS DOUBLE) * CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) AS lift
      |FROM bc
      |CROSS JOIN n_uni
      |CROSS JOIN n_bi
      |JOIN uni a ON a.w = bc.w1
      |JOIN uni b ON b.w = bc.w2
      |WHERE bc.c_ab >= 20
      |ORDER BY lift DESC, w1, w2""".stripMargin

  /** Deterministic train/val/test assignment, reusable across pipelines
    * (q70's audit, q63's manifest): the last hex digit of md5(idCol)
    * buckets 12/2/2 sixteenths into train/val/test. Content-free and
    * stable under reshuffling/re-ingestion — the label depends only on
    * the id, never on partition, row order, or session — and
    * engine-portable (both engines produce the same lowercase hex md5;
    * `splitSqlExpr` is the identical DuckDB expression). Pure map: no
    * shuffle, no state, safe at any scale.
    */
  def splitColumn(idCol: Column): Column = {
    val hx = substring(md5(idCol.cast("string")), 32, 1)
    when(hx <= "b", "train").when(hx <= "d", "val").otherwise("test")
  }

  /** DuckDB-side equivalent of [[splitColumn]] for oracle SQL. */
  def splitSqlExpr(idExpr: String): String =
    s"""CASE WHEN substr(md5(CAST($idExpr AS VARCHAR)), 32, 1) <= 'b' THEN 'train'
       |     WHEN substr(md5(CAST($idExpr AS VARCHAR)), 32, 1) <= 'd' THEN 'val'
       |     ELSE 'test' END""".stripMargin

  /** q70 — deterministic stratified train/val/test split audit over
    * [[splitColumn]]'s assignment: per (source, split) document and token
    * counts plus the realized within-source share.
    *
    * Scale shape: pure map to assign, one (source, split) aggregation,
    * and a window over the per-source partials (at most 3 rows per
    * source) for the share — the corpus is never re-sorted or joined.
    */
  def q70StratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ws = Window.partitionBy($"source")
    docs(spark, dir)
      .withColumn("split", splitColumn($"doc_id"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"), sum(size(toks)).cast("long").as("n_tokens"))
      .withColumn("share", $"n_docs".cast("double") / sum($"n_docs").over(ws))
      .select($"source", $"split", $"n_docs", $"n_tokens", $"share")
      .orderBy($"source", $"split")
  }

  val q70Sql: String =
    s"""WITH a AS (
      |  SELECT source,
      |    ${splitSqlExpr("doc_id")} AS split,
      |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |g AS (SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |        CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      |      FROM a GROUP BY 1, 2)
      |SELECT source, split, n_docs, n_tokens,
      |  CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY source) AS share
      |FROM g
      |ORDER BY source, split""".stripMargin

  /** q71 — exact-duplicate overlap matrix over source pairs, diagonal
    * included: for (s_a, s_b) with s_a < s_b, how many distinct texts
    * appear verbatim in both and how many cross-source doc pairs that
    * induces (c_a·c_b per shared text); for the diagonal (s, s), how
    * many texts are duplicated within the source and the induced
    * within-source pairs (c·(c−1)/2, exact — the product is always
    * even, integer DIV). This is the provenance audit run before mixing
    * sources — two "independent" crawls sharing 30% of their content
    * will over-weight that content in the training mix.
    *
    * Scale shape: one (md5(text), source) aggregation, then a self
    * equi-join on the hash — per-hash fan-out is bounded by the number
    * of SOURCES carrying that text (a handful), never by duplicate count,
    * because duplicates are pre-collapsed to (hash, source, cnt) rows;
    * the diagonal is a second aggregate of the same tiny table, no join.
    * The final matrix is #sources² rows. n_pairs sums in BIGINT —
    * bounded while per-source copies of one text stay < ~3·10⁹, i.e.
    * anything short of a corpus that is one document repeated.
    */
  def q71SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = docs(spark, dir)
      .select(md5($"text").as("h"), $"source")
      .groupBy($"h", $"source").agg(count(lit(1)).as("c"))
      // diagonal aggregate and both join sides branch from this table
      .localCheckpoint()
    // unconditional diagonal: a source with zero internal duplication
    // still reports (n_shared=0, n_pairs=0) — the matrix always has its
    // #sources diagonal rows
    val diag = h.groupBy($"source")
      .agg(sum(when($"c" >= 2, 1L).otherwise(0L)).cast("long").as("n_shared"),
        sum(expr("c * (c - 1) DIV 2")).cast("long").as("n_pairs"))
      .select($"source".as("source_a"), $"source".as("source_b"),
        $"n_shared", $"n_pairs")
    val off = h.as("a").join(h.as("b"), "h")
      .filter($"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("n_shared"),
        sum($"a.c" * $"b.c").cast("long").as("n_pairs"))
    diag.unionByName(off).orderBy($"source_a", $"source_b")
  }

  val q71Sql: String =
    """WITH h AS (SELECT md5(text) AS h, source, CAST(COUNT(*) AS BIGINT) AS c
      |           FROM documents GROUP BY 1, 2),
      |diag AS (SELECT source AS source_a, source AS source_b,
      |           CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
      |           CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_pairs
      |         FROM h GROUP BY 1, 2),
      |off AS (SELECT a.source AS source_a, b.source AS source_b,
      |          CAST(COUNT(*) AS BIGINT) AS n_shared,
      |          CAST(SUM(a.c * b.c) AS BIGINT) AS n_pairs
      |        FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
      |        GROUP BY 1, 2)
      |SELECT * FROM diag UNION ALL SELECT * FROM off
      |ORDER BY source_a, source_b""".stripMargin

  /** q72 — boilerplate detection by leading-prefix frequency: the top 5
    * most common 8-token document prefixes per source, with their share
    * of the source's documents. Crawled corpora carry injected headers
    * ("Skip to main content …", cookie banners); a prefix covering a
    * visible share of a source is boilerplate to strip before training.
    *
    * Scale shape: pure map to the prefix key, one (source, prefix)
    * aggregation with map-side combine, then a per-source rank window
    * over the AGGREGATED prefix table (bounded by distinct prefixes per
    * source, vocabulary-like — never the corpus) and a broadcast-sized
    * per-source totals join.
    */
  def q72BoilerplatePrefixes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"cnt".desc, $"prefix")
    val g = docs(spark, dir)
      .select($"source", concat_ws(" ", slice(toks, 1, 8)).as("prefix"))
      .groupBy($"source", $"prefix").agg(count(lit(1)).as("cnt"))
      // ranked rows and per-source totals both branch from this aggregate
      .localCheckpoint()
    val totals = g.groupBy($"source").agg(sum($"cnt").cast("long").as("n_docs"))
    g.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .join(broadcast(totals), Seq("source"))
      .withColumn("share", $"cnt".cast("double") / $"n_docs")
      .select($"source", $"rank", $"prefix", $"cnt", $"share")
      .orderBy($"source", $"rank")
  }

  val q72Sql: String =
    """WITH p AS (SELECT source,
      |             array_to_string(string_split(trim(text), ' ')[1:8], ' ') AS prefix
      |           FROM documents),
      |g AS (SELECT source, prefix, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM p GROUP BY 1, 2),
      |r AS (SELECT source, prefix, cnt,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, prefix) AS BIGINT) AS rank,
      |        CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_docs
      |      FROM g)
      |SELECT source, rank, prefix, cnt, CAST(cnt AS DOUBLE) / n_docs AS share
      |FROM r WHERE rank <= 5
      |ORDER BY source, rank""".stripMargin

  /** q73 — source similarity by top-vocabulary Jaccard: each source's
    * 1000 highest-frequency tokens form its signature set; every source
    * pair gets |A∩B| / |A∪B|. The corpus-mix designer's view of which
    * sources are redundant (high overlap) vs complementary.
    *
    * Scale shape: one (source, token) count aggregation, a per-source
    * rank window over the aggregated per-source vocabulary (vocab-sized,
    * never the corpus), a self equi-join on token over the ≤1000-row-per-
    * source signature sets, and a #sources² cross of the (tiny) size
    * table so zero-overlap pairs still appear. All counts exact integers;
    * one final double division.
    */
  def q73SourceVocabJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"cnt".desc, $"token")
    val sig = docs(spark, dir)
      .select($"source", explode(toks).as("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("cnt"))
      .withColumn("r", row_number().over(w))
      .filter($"r" <= 1000)
      .select($"source", $"token")
      // sizes + both join sides branch from the signature sets
      .localCheckpoint()
    val sizes = sig.groupBy($"source").agg(count(lit(1)).as("n"))
    val inter = sig.as("a").join(sig.as("b"), "token")
      .filter($"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    sizes.as("x").join(sizes.as("y"), $"x.source" < $"y.source")
      .select($"x.source".as("source_a"), $"y.source".as("source_b"),
        $"x.n".as("n_a"), $"y.n".as("n_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("n_inter", coalesce($"n_inter", lit(0L)))
      .withColumn("jaccard",
        $"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"))
      .select($"source_a", $"source_b", $"n_inter", $"jaccard")
      .orderBy($"source_a", $"source_b")
  }

  val q73Sql: String =
    """WITH tok AS (SELECT source, unnest(string_split(trim(text), ' ')) AS token
      |            FROM documents),
      |g AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM tok GROUP BY 1, 2),
      |sig AS (SELECT source, token FROM
      |          (SELECT source, token,
      |             ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, token) AS r
      |           FROM g)
      |        WHERE r <= 1000),
      |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sig GROUP BY 1),
      |inter AS (SELECT a.source AS source_a, b.source AS source_b,
      |            CAST(COUNT(*) AS BIGINT) AS n_inter
      |          FROM sig a JOIN sig b ON a.token = b.token AND a.source < b.source
      |          GROUP BY 1, 2)
      |SELECT x.source AS source_a, y.source AS source_b,
      |  CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
      |  CAST(COALESCE(i.n_inter, 0) AS DOUBLE) / (x.n + y.n - COALESCE(i.n_inter, 0)) AS jaccard
      |FROM sizes x JOIN sizes y ON x.source < y.source
      |LEFT JOIN inter i ON i.source_a = x.source AND i.source_b = y.source
      |ORDER BY source_a, source_b""".stripMargin

  /** q219 — sketch-algebra vocabulary overlap between sources: pairwise
    * Jaccard over the FULL per-source vocabularies, estimated from 20
    * mergeable DataSketches HLL sketches via inclusion–exclusion
    * (|A∩B| ≈ est(A) + est(B) − est(A ∪ B), union by `hll_union` on
    * the stored binary sketches) — the q106 sketch-rollup discipline
    * extended from counts to SET ALGEBRA. At 100 TB this is the form
    * source-overlap monitoring actually runs: one sketch per source per
    * ingest day (bytes, mergeable, exchangeable), any pair/window
    * overlap answered from sketches alone; the exact token-key
    * intersection join (q73's mechanism, here over full vocabularies
    * rather than top-1000 signatures) is the calibration arm, affordable
    * at fixture SF and sliced in production (the q97/q100 pattern).
    * Gate: the estimated Jaccard must sit within ±0.05 absolute of the
    * exact one (lgK=12 ⇒ rsd ≈ 0.8% per estimate; inclusion–exclusion
    * amplifies to a few % of the union — 0.05 ≫ 6σ here). DuckDB emits
    * the exact relation plus TRUE literals, so a broken sketch merge,
    * union, or estimate flips a boolean and fails the hash gate.
    *
    * Scale shape: one explode feeding a 20-row sketch aggregate (hash
    * agg, map-side partial) and the Zipf-bounded (source, token)
    * distinct relation; the exact arm is a token-key equi self-join;
    * the pair frame is a broadcast self-join of a |sources|-row dim.
    */
  def q219SketchVocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = docs(spark, dir).select($"source", explode(toks).as("token"))
    val sk = st.groupBy($"source")
      .agg(expr("hll_sketch_agg(token, 12)").as("sk"))
      .localCheckpoint() // 20 rows; both sides of the pair frame
    val ex = st.distinct().localCheckpoint() // sizes + both exact join sides
    val sizes = ex.groupBy($"source").agg(count(lit(1)).as("n"))
    val inter = ex.as("a").join(ex.as("b"), "token")
      .filter($"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    sk.as("x").join(sk.as("y"), $"x.source" < $"y.source")
      .select($"x.source".as("source_a"), $"y.source".as("source_b"),
        expr("hll_sketch_estimate(x.sk)").as("ea"),
        expr("hll_sketch_estimate(y.sk)").as("eb"),
        expr("hll_sketch_estimate(hll_union(x.sk, y.sk))").as("eu"))
      .join(broadcast(sizes.select($"source".as("source_a"), $"n".as("n_a"))),
        Seq("source_a"))
      .join(broadcast(sizes.select($"source".as("source_b"), $"n".as("n_b"))),
        Seq("source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("n_inter", coalesce($"n_inter", lit(0L)))
      .withColumn("jaccard_bp",
        expr("(n_inter * 10000) div (n_a + n_b - n_inter)"))
      .withColumn("est_j",
        ($"ea" + $"eb" - $"eu").cast("double") / $"eu")
      .select($"source_a", $"source_b", $"n_a", $"n_b", $"n_inter",
        $"jaccard_bp",
        (abs($"est_j" - $"n_inter".cast("double")
          / ($"n_a" + $"n_b" - $"n_inter")) <= 0.05).as("sketch_in_envelope"))
      .orderBy($"source_a", $"source_b")
  }

  val q219Sql: String =
    """WITH st AS (
      |  SELECT DISTINCT source, unnest(string_split(trim(text), ' ')) AS token
      |  FROM documents),
      |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
      |          FROM st GROUP BY source),
      |inter AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |         CAST(count(*) AS BIGINT) AS n_inter
      |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT x.source AS source_a, y.source AS source_b,
      |       x.n AS n_a, y.n AS n_b,
      |       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
      |       (COALESCE(i.n_inter, 0) * 10000)
      |         // (x.n + y.n - COALESCE(i.n_inter, 0)) AS jaccard_bp,
      |       TRUE AS sketch_in_envelope
      |FROM sizes x JOIN sizes y ON x.source < y.source
      |LEFT JOIN inter i ON i.source_a = x.source AND i.source_b = y.source
      |ORDER BY source_a, source_b""".stripMargin

  /** q78 — temperature-resampled source weights: the multilingual/multi-
    * source rebalancing step (α = 0.5): sampling weight w_s ∝ p_s^α where
    * p_s is the source's natural token share, plus the implied up/down-
    * sampling factor (boost = w_s / p_s) a sampler applies per source.
    * α = 0.5 is deliberately √ rather than an arbitrary exponent: IEEE
    * sqrt is correctly rounded, so — unlike pow/exp/ln — both engines
    * produce bit-identical weights with no fixed-point guard needed. The
    * normalizing denominator Σ√p is still an order-dependent float sum,
    * so each √p is frozen to integer nano-units first (round(√p·10⁹))
    * and the denominator is an exact BIGINT aggregate: ≤ 10⁹ per source,
    * so overflow needs ~10¹⁰ sources.
    *
    * Scale shape: one (source) aggregation with map-side combine; every
    * window/join after that is over the #sources-row table. Pure map +
    * one shuffle, nothing corpus-sized survives the aggregate.
    */
  /** Per-source α=0.5 mix weights plus corpus totals — shared by q78 (the
    * audit view) and q81 (the subsampler that applies them).
    */
  private def sourceWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Window.partitionBy()
    docs(spark, dir)
      .groupBy($"source").agg(sum(size(toks)).cast("long").as("n_tokens"))
      .withColumn("total", sum($"n_tokens").over(all).cast("long"))
      .withColumn("p", $"n_tokens".cast("double") / $"total")
      .withColumn("sq", round(sqrt($"p") * lit(1000000000.0)).cast("long"))
      .withColumn("weight", $"sq".cast("double") / sum($"sq").over(all))
  }

  def q78TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sourceWeights(spark, dir)
      .withColumn("boost", $"weight" / $"p")
      .select($"source", $"n_tokens", $"p", $"weight", $"boost")
      .orderBy($"source")
  }

  val q78Sql: String =
    """WITH s AS (SELECT source,
      |             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
      |           FROM documents GROUP BY 1),
      |t AS (SELECT source, n_tokens,
      |        CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS p
      |      FROM s),
      |q AS (SELECT source, n_tokens, p,
      |        CAST(round(sqrt(p) * 1000000000.0) AS BIGINT) AS sq
      |      FROM t)
      |SELECT source, n_tokens, p,
      |  CAST(sq AS DOUBLE) / SUM(sq) OVER () AS weight,
      |  CAST(sq AS DOUBLE) / SUM(sq) OVER () / p AS boost
      |FROM q
      |ORDER BY source""".stripMargin

  /** Engine-portable 60-bit content-free hash of the doc id (the md5
    * prefix trick Dedup uses for shingles): uniform, deterministic, and
    * identical in DuckDB via `hashSqlExpr`.
    */
  private def hashColumn(idCol: Column): Column =
    graft.functions.Md5Prefix60(idCol.cast("string"))

  private def hashSqlExpr(idExpr: String): String =
    s"CAST('0x' || substr(md5(CAST($idExpr AS VARCHAR)), 1, 15) AS BIGINT)"

  private val nShards = 64

  /** q80 — training shard layout: the final "global shuffle" every
    * trainer needs, WITHOUT a global sort. Each doc gets a deterministic
    * pseudo-random 60-bit hash of its id; the hash's low bits pick one of
    * 64 shards and each shard orders its docs by the full hash. Reading
    * shards 0..63 in order then yields a reproducible global permutation,
    * but the engine only ever runs 64 independent shard-local sorts — the
    * 100 TB version raises the shard count (100k+) so each sort stays
    * executor-sized; no stage ever totally orders the corpus. Content-
    * free: the permutation survives re-ingestion and text edits. (The
    * trailing orderBy is the repo's driver-compare presentation
    * convention, not part of the layout — a deployment writes
    * partitionBy(shard)/sortWithinPartitions(h), which is exactly the
    * shard-local-sort plan above it.)
    */
  def q80ShardLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"shard").orderBy($"h", $"doc_id")
    docs(spark, dir)
      .select($"doc_id", size(toks).cast("long").as("n_tokens"))
      .withColumn("h", hashColumn($"doc_id"))
      .withColumn("shard", ($"h" % nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select($"doc_id", $"shard", $"pos", $"n_tokens")
      .orderBy($"shard", $"pos")
  }

  val q80Sql: String =
    s"""WITH h AS (SELECT doc_id,
       |             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
       |             ${hashSqlExpr("doc_id")} AS h
       |           FROM documents)
       |SELECT doc_id, CAST(h % $nShards AS BIGINT) AS shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY h % $nShards ORDER BY h, doc_id) AS BIGINT) AS pos,
       |  n_tokens
       |FROM h
       |ORDER BY shard, pos""".stripMargin

  /** q137 — rendezvous (highest-random-weight) shard routing: each doc
    * scores every shard with the portable 60-bit hash of `id:shard` and
    * lands on the argmax — the assignment scheme whose defining
    * property is MINIMAL MOVEMENT under topology change: removing a
    * shard relocates exactly that shard's docs (each to its runner-up)
    * and NO doc between surviving shards, unlike `h % S` where almost
    * every doc moves. The query proves the property, not just the
    * assignment: it routes against the full 8-shard set AND the set
    * with shard 3 removed, and emits per-shard `n_moved` — identically
    * 0 for survivors, n_docs for the removed shard, so a single
    * misrouted doc flips the driver hash.
    *
    * Shapes that matter at 100 TB: the ×S candidate blowup is a
    * map-side explode feeding a map-side-combinable argmax aggregate
    * (`min(struct(-w, s))`, the q122 precedence idiom — no window, no
    * sort); S is the shard-set size, not data-sized, and past a few
    * hundred shards the standard fix is hierarchical HRW (route to a
    * shard GROUP, then within it), which is this same query applied
    * twice. The DuckDB oracle picks the argmax with a window rank over
    * the identical weight relation — independent mechanism, same
    * routing.
    */
  def q137RendezvousSharding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val S = 8
    val weighted = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars")
      .withColumn("s", explode(array((0 until S).map(i => lit(i.toLong)): _*)))
      .withColumn("w", hashColumn(concat_ws(":", $"doc_id", $"s")))
      .localCheckpoint() // feeds both routing passes
    def route(in: DataFrame, as: String): DataFrame = {
      import in.sparkSession.implicits._
      in.groupBy($"doc_id")
        .agg(min(struct((-$"w").as("nw"), $"s".as("s"))).as("p"),
          first($"n_chars").as("n_chars"))
        .select($"doc_id", $"p.s".as(as), $"n_chars")
    }
    route(weighted, "shard8")
      .join(route(weighted.filter($"s" =!= 3), "shard7").drop("n_chars"),
        Seq("doc_id"))
      .groupBy($"shard8")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"),
        sum(when($"shard7" =!= $"shard8", 1L).otherwise(0L)).as("n_moved"))
      .select($"shard8".as("shard"), $"n_docs", $"total_chars", $"n_moved")
      .orderBy($"shard")
  }

  val q137Sql: String =
    s"""WITH wts AS (
       |  SELECT doc_id, n_chars, t.s,
       |         ${hashSqlExpr("CAST(doc_id AS VARCHAR) || ':' || CAST(t.s AS VARCHAR)")} AS w
       |  FROM documents CROSS JOIN range(0, 8) t(s)),
       |a8 AS (SELECT doc_id, n_chars, s AS shard8,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) AS rn
       |       FROM wts),
       |a7 AS (SELECT doc_id, s AS shard7,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) AS rn
       |       FROM wts WHERE s <> 3)
       |SELECT a8.shard8 AS shard, count(*) AS n_docs,
       |       CAST(sum(a8.n_chars) AS BIGINT) AS total_chars,
       |       CAST(sum(CASE WHEN a7.shard7 <> a8.shard8 THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_moved
       |FROM a8 JOIN a7 ON a7.doc_id = a8.doc_id AND a7.rn = 1
       |WHERE a8.rn = 1
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q143 — greedy max-coverage document selection, three rounds: pick
    * the doc covering the most distinct tokens, remove its tokens from
    * the universe, repeat — the submodular facility-location greedy
    * behind coverage-driven corpus curation ("which k docs teach the
    * vocabulary fastest"), with the classic (1−1/e) guarantee. Each
    * round is ONE broadcast left-anti join (doc-token relation vs the
    * covered-set relation — the covered side is vocabulary-bounded,
    * Heaps-sublinear, never corpus-sized, so it is the natural
    * broadcast build side and the corpus relation is scanned in place,
    * never re-shuffled by token) + one hash aggregate whose exchange
    * carries one partial row per doc + a TakeOrdered(1) argmax with
    * the (gain desc, doc_id) tie rule; `localCheckpoint` stops round i
    * replanning rounds <i. `covered_after` is the running gain sum, so
    * the output is pure relational algebra — no driver-side set is
    * ever built. The oracle unrolls the same three rounds as chained
    * CTEs with NOT IN — independent evaluation; one mis-ranked pick
    * cascades into every later round and flips the hash.
    */
  def q143GreedyCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // coverage universe = bigram shingles (the q31 gram construction):
    // the fixture's unigram vocabulary is ~31 types, which one long doc
    // covers entirely — bigrams give a universe where greedy rounds
    // actually compete. array_distinct INSIDE each doc's shingle array
    // replaces the old corpus-wide .distinct(): doc_id is unique per
    // row group, so per-doc-distinct (doc_id, tok) pairs are already
    // globally distinct — identical relation, one full shuffle gone
    // (guide §2.4).
    val tx = docs(spark, dir)
      .select($"doc_id", toks.as("toks"))
      .select($"doc_id", explode(expr(
        """CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<STRING>)
          |ELSE array_distinct(transform(sequence(0, size(toks)-2),
          |  i -> concat(toks[i], ' ', toks[i+1])))
          |END""".stripMargin)).as("tok"))
      .localCheckpoint()
    var covered = tx.select($"tok").limit(0)
    var picks: DataFrame = null
    for (round <- 1 to 3) {
      val pick = tx.join(broadcast(covered), Seq("tok"), "left_anti")
        .groupBy($"doc_id").agg(count(lit(1)).as("gain"))
        .orderBy($"gain".desc, $"doc_id").limit(1)
        .withColumn("round", lit(round.toLong))
        .localCheckpoint()
      picks = if (picks == null) pick else picks.unionByName(pick)
      // round 3's covered set has no consumer — skip its build job
      if (round < 3)
        covered = covered
          .unionByName(tx.join(broadcast(pick.select($"doc_id")), Seq("doc_id"))
            .select($"tok"))
          .localCheckpoint()
    }
    picks
      .withColumn("covered_after",
        sum($"gain").over(Window.orderBy($"round")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"round", $"doc_id", $"gain", $"covered_after")
      .orderBy($"round")
  }

  val q143Sql: String =
    """WITH tk AS (SELECT doc_id, string_split(trim(text), ' ') AS t
      |            FROM documents),
      |tx AS (SELECT DISTINCT doc_id, tok FROM
      |  (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))])
      |     AS tok FROM tk) z),
      |g1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
      |       FROM tx GROUP BY 1),
      |p1 AS (SELECT doc_id, gain FROM g1 ORDER BY gain DESC, doc_id LIMIT 1),
      |c1 AS (SELECT tok FROM tx WHERE doc_id = (SELECT doc_id FROM p1)),
      |g2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM tx
      |       WHERE tok NOT IN (SELECT tok FROM c1) GROUP BY 1),
      |p2 AS (SELECT doc_id, gain FROM g2 ORDER BY gain DESC, doc_id LIMIT 1),
      |c2 AS (SELECT tok FROM c1 UNION
      |       SELECT tok FROM tx WHERE doc_id = (SELECT doc_id FROM p2)),
      |g3 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM tx
      |       WHERE tok NOT IN (SELECT tok FROM c2) GROUP BY 1),
      |p3 AS (SELECT doc_id, gain FROM g3 ORDER BY gain DESC, doc_id LIMIT 1),
      |u AS (SELECT 1 AS round, doc_id, gain FROM p1
      |      UNION ALL SELECT 2, doc_id, gain FROM p2
      |      UNION ALL SELECT 3, doc_id, gain FROM p3)
      |SELECT CAST(round AS BIGINT) AS round, doc_id, gain,
      |       CAST(sum(gain) OVER (ORDER BY round) AS BIGINT) AS covered_after
      |FROM u ORDER BY round""".stripMargin

  /** q81 — temperature-quota subsample: applies q78's α=0.5 weights to
    * actually SELECT documents. Each source gets a token budget
    * b_s = round(weight_s · 20% of corpus tokens); its docs are laid out
    * in content-free hash order (same family as [[splitColumn]] — stable
    * under re-ingestion) and admitted while the cumulative token count
    * before the doc is under budget — so rare sources are upsampled
    * toward √-flattened shares exactly as the mix design prescribes, and
    * the selection is a deterministic function of (id, source sizes)
    * only. The budget arithmetic mirrors q78's cross-engine-exact
    * discipline: integer token counts, one correctly-rounded double
    * product frozen back to BIGINT.
    *
    * Scale shape: the q78 aggregate (tiny) broadcast back onto the
    * corpus, plus the per-source hash-ordered cumulative window — the
    * q53/q55 stratified shape: sorts are per-source partitions, never
    * global.
    */
  def q81MixSubsample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budgets = sourceWeights(spark, dir)
      .select($"source",
        round($"weight" * ($"total".cast("double") * lit(0.2))).cast("long").as("b_tokens"))
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .select($"doc_id", $"source", size(toks).cast("long").as("n_tokens"))
      .withColumn("h", hashColumn($"doc_id"))
      .withColumn("cum_before", sum($"n_tokens").over(w) - $"n_tokens")
      .join(broadcast(budgets), Seq("source"))
      .filter($"cum_before" < $"b_tokens")
      .select($"doc_id", $"source", $"n_tokens", $"cum_before", $"b_tokens")
      .orderBy($"doc_id")
  }

  val q81Sql: String =
    s"""WITH s AS (SELECT source,
       |             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
       |           FROM documents GROUP BY 1),
       |t AS (SELECT source, n_tokens,
       |        CAST(SUM(n_tokens) OVER () AS BIGINT) AS total,
       |        CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS BIGINT) AS p
       |      FROM s),
       |q AS (SELECT source, total, p,
       |        CAST(round(sqrt(p) * 1000000000.0) AS BIGINT) AS sq
       |      FROM t),
       |b AS (SELECT source,
       |        CAST(round(CAST(sq AS DOUBLE) / SUM(sq) OVER () * (CAST(total AS DOUBLE) * 0.2)) AS BIGINT) AS b_tokens
       |      FROM q),
       |d AS (SELECT doc_id, source,
       |        CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
       |        ${hashSqlExpr("doc_id")} AS h
       |      FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
       |          ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
       |      FROM d)
       |SELECT c.doc_id, c.source, c.n_tokens, c.cum_before, b.b_tokens
       |FROM c JOIN b USING (source)
       |WHERE c.cum_before < b.b_tokens
       |ORDER BY doc_id""".stripMargin

  /** q189 — boilerplate STRIPPING, the transform acting on q72's
    * detection: each source's modal leading 8-gram (its candidate
    * header/banner) is removed from every document that starts with it,
    * provided the prefix is actually SHARED (count ≥ 2 — a unique
    * prefix is content, not boilerplate). The audit row per source
    * carries before/after character totals and a stripped-doc-id
    * checksum, so the transform's exact effect — which docs, how many
    * chars — crosses the driver's hash gate, the q142 publish-before-
    * mutate discipline for destructive curation steps.
    *
    * Mechanics kept engine-portable: the modal prefix is the
    * `min(struct(-cnt, prefix))` aggregation (q122's window-free argmax
    * with the explicit (count desc, prefix asc) tie rule — the oracle
    * uses a rank window instead, two mechanisms one gate), `hit` is
    * exact string equality of the doc's OWN 8-token prefix against the
    * modal one, and chars_removed accounts for the separator space
    * (prefix+1) except when the doc IS the prefix exactly.
    *
    * Scale shape: one (source, prefix) hash aggregate, a source-bounded
    * broadcast of the modal relation, one source rollup — the fact is
    * scanned twice (detection, strip), zero windows over data-sized
    * relations.
    */
  def q189BoilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
      .select($"doc_id", $"source", $"text",
        concat_ws(" ", slice(toks, 1, 8)).as("prefix"))
      .localCheckpoint() // feeds detection and the strip pass
    val top = d.groupBy($"source", $"prefix").agg(count(lit(1)).as("cnt"))
      .groupBy($"source")
      .agg(min(struct(($"cnt" * -1).as("nc"), $"prefix".as("p"))).as("t"))
      .select($"source", $"t.p".as("bp"), (-$"t.nc").as("bp_cnt"))
      .filter($"bp_cnt" >= 2)
    d.join(broadcast(top), Seq("source"), "left")
      .withColumn("hit", $"bp".isNotNull && $"prefix" === $"bp")
      .withColumn("removed", when(!$"hit", lit(0L)).otherwise(
        when(length($"text") > length($"bp"), length($"bp") + 1)
          .otherwise(length($"bp")).cast("long")))
      .groupBy($"source")
      .agg(
        coalesce(max($"bp"), lit("")).as("boilerplate_prefix"),
        coalesce(max($"bp_cnt"), lit(0L)).as("prefix_cnt"),
        count(lit(1)).as("n_docs"),
        sum(when($"hit", 1L).otherwise(0L)).as("n_stripped"),
        sum(length($"text")).cast("long").as("chars_before"),
        sum($"removed").as("chars_removed"),
        sum(when($"hit", $"doc_id").otherwise(0L)).as("stripped_id_sum"))
      .orderBy($"source")
  }

  val q189Sql: String =
    """WITH d AS (SELECT doc_id, source, text,
      |             array_to_string(string_split(trim(text), ' ')[1:8], ' ')
      |               AS prefix
      |           FROM documents),
      |g AS (SELECT source, prefix, CAST(count(*) AS BIGINT) AS cnt
      |      FROM d GROUP BY 1, 2),
      |t AS (SELECT source, prefix AS bp, cnt AS bp_cnt FROM (
      |        SELECT source, prefix, cnt, row_number() OVER (
      |          PARTITION BY source ORDER BY cnt DESC, prefix) AS rn
      |        FROM g) z
      |      WHERE rn = 1 AND cnt >= 2),
      |j AS (SELECT d.doc_id, d.source, d.text,
      |        t.bp IS NOT NULL AND d.prefix = t.bp AS hit,
      |        CASE WHEN t.bp IS NOT NULL AND d.prefix = t.bp
      |             THEN CASE WHEN length(d.text) > length(t.bp)
      |                       THEN length(t.bp) + 1 ELSE length(t.bp) END
      |             ELSE 0 END AS removed,
      |        t.bp, t.bp_cnt
      |      FROM d LEFT JOIN t ON d.source = t.source)
      |SELECT source,
      |       COALESCE(max(bp), '') AS boilerplate_prefix,
      |       COALESCE(max(bp_cnt), 0) AS prefix_cnt,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_stripped,
      |       CAST(sum(length(text)) AS BIGINT) AS chars_before,
      |       CAST(sum(removed) AS BIGINT) AS chars_removed,
      |       CAST(sum(CASE WHEN hit THEN doc_id ELSE 0 END) AS BIGINT)
      |         AS stripped_id_sum
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** q191 — Zipf-law fit per source: the OLS slope of ln(count) against
    * ln(rank) over each source's top-256 vocabulary head — the corpus-
    * health scalar behind q68's coverage curve (natural language sits
    * near slope −1; templated/generated text flattens, OCR noise
    * steepens the tail). The q152 regression discipline on q76's freeze:
    * both axes are frozen to exact micro-nat integers per vocabulary
    * row (`round(ln(rank)·10⁶)`, `round(ln(cnt)·10⁶)`), the five OLS
    * sums accumulate in DECIMAL(38,0)/HUGEINT (x·y ≈ 4e14 per point —
    * a million-type vocabulary would cross BIGINT), and the closed-form
    * slope divides SIGN-SPLIT (slopes are negative; Spark `div`
    * truncates, DuckDB `//` floors). Dimensionless slope emitted in
    * micro-units.
    *
    * Scale shape: one (source, token) aggregate; the rank window runs
    * over the per-source VOCABULARY (Zipf-bounded, never the corpus —
    * the q73 precedent) and the fit only consumes the 256-row head per
    * source; output is |sources| rows.
    */
  def q191ZipfFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy($"source").orderBy($"cnt".desc, $"token")
    val head = docs(spark, dir)
      .select($"source", explode(toks).as("token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 256)
      .select($"source",
        round(log($"rank".cast("double")) * 1e6).cast("long").as("x"),
        round(log($"cnt".cast("double")) * 1e6).cast("long").as("y"))
    head.groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x".cast(d38) * $"y").as("sxy"),
        sum($"x".cast(d38) * $"x").as("sxx"))
      .withColumn("num",
        expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("den",
        expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .select($"source", $"n".as("n_points"),
        expr("""CAST(CASE WHEN num < 0 THEN -((-num * 1000000) div den)
                          ELSE (num * 1000000) div den END AS BIGINT)""")
          .as("zipf_slope_micro"))
      .orderBy($"source")
  }

  val q191Sql: String =
    """WITH v AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT source, unnest(string_split(trim(text), ' ')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2),
      |h AS (SELECT source,
      |        CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
      |        CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
      |      FROM (SELECT source, cnt, row_number() OVER (
      |              PARTITION BY source ORDER BY cnt DESC, tok) AS rank
      |            FROM v) z
      |      WHERE rank <= 256),
      |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      |      FROM h GROUP BY 1),
      |b AS (SELECT source, n,
      |        CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
      |        CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
      |      FROM a)
      |SELECT source, n AS n_points,
      |       CAST(CASE WHEN num < 0 THEN -((-num * 1000000) // den)
      |                 ELSE (num * 1000000) // den END AS BIGINT)
      |         AS zipf_slope_micro
      |FROM b ORDER BY source""".stripMargin

  /** q192 — training-shard export manifest with content checksums: for
    * every (split, shard) cell of the q70 split × q80 shard layout, the
    * counts a trainer verifies BEFORE reading data (docs, tokens) plus
    * two order-invariant integrity sums — Σ doc_id and
    * Σ md5-prefix60(text) mod 10¹⁵ (the q182 Merkle-residue
    * discipline applied to the export boundary: a single flipped BYTE
    * of any document changes the residue, so a corrupted copy or a
    * truncated shard fails the manifest without row-level comparison).
    * This is the handshake artifact between the data pipeline and the
    * training job — the reference's closest analogue is its row-count
    * log lines (`citibike_project/etl/ingest_data.py:172`).
    *
    * Scale shape: pure map (split/shard/hash columns) + ONE map-side-
    * combinable aggregate to the ≤ 3·64 manifest rows; commutative sums
    * make the checksum partition-order-independent and incrementally
    * maintainable per appended batch.
    */
  /** The q192 manifest aggregation over any documents-shaped relation —
    * shared by the batch query and the streaming incremental manifest
    * ([[graft.streaming.CorpusStreams.manifestStream]]), so "streaming
    * partials merge to the batch answer" is true by shared construction
    * AND pinned by spec. Content sums are carried as mod-10¹⁵ residues,
    * which are ADDITIVE under re-aggregation ((Σ rᵢ) mod M =
    * (Σ Sᵢ) mod M), so per-batch partials merge exactly.
    */
  private[graft] def manifestPartials(batch: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    batch
      .select($"doc_id",
        size(split(trim($"text"), " ")).cast("long").as("n_tokens"),
        splitColumn($"doc_id").as("split"),
        (hashColumn($"doc_id") % nShards).cast("long").as("shard"),
        graft.functions.Md5Prefix60($"text").as("content_h"))
      .groupBy($"split", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("token_sum"),
        sum($"doc_id").as("id_sum"),
        expr("CAST(sum(CAST(content_h AS DECIMAL(38,0))) % 1000000000000000 AS BIGINT)")
          .as("content_checksum"))
  }

  /** Merge manifest partials (one or many batches' worth) to the final
    * per-(split, shard) manifest — q192's exact output shape.
    */
  private[graft] def mergeManifest(partials: DataFrame): DataFrame = {
    import partials.sparkSession.implicits._
    partials.groupBy($"split", $"shard")
      .agg(sum($"n_docs").as("n_docs"), sum($"token_sum").as("token_sum"),
        sum($"id_sum").as("id_sum"),
        expr("CAST(sum(CAST(content_checksum AS DECIMAL(38,0))) % 1000000000000000 AS BIGINT)")
          .as("content_checksum"))
      .orderBy($"split", $"shard")
  }

  def q192ShardManifest(spark: SparkSession, dir: String): DataFrame =
    mergeManifest(manifestPartials(docs(spark, dir)))

  val q192Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS BIGINT)
       |           AS n_tokens,
       |         ${splitSqlExpr("doc_id")} AS split,
       |         CAST(${hashSqlExpr("doc_id")} % $nShards AS BIGINT) AS shard,
       |         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS content_h
       |  FROM documents)
       |SELECT split, shard, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS token_sum,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       CAST(sum(CAST(content_h AS HUGEINT)) % 1000000000000000
       |            AS BIGINT) AS content_checksum
       |FROM d GROUP BY 1, 2
       |ORDER BY split, shard""".stripMargin

  /** q199 — corpus release scorecard: the one-pager a release owner
    * signs off on, composed from the governance operators this library
    * already ships — size census (docs/tokens/sources), exact-duplicate
    * mass (q30's normalized fingerprint), near-dup pairs at the 0.8
    * release threshold (riding the MEMOIZED q47 pair relation — the
    * sweep discipline of q194), mean q27 quality in micro-units, and
    * the q70 split sizes. Emitted as (metric, value) BIGINT rows so one
    * hash gate covers the whole card; each number is individually
    * cross-checkable against its parent query.
    *
    * Scale shape: one doc-relation aggregate (+ a 3-group split
    * rollup), one filter over the memoized pair table — composition
    * adds nothing quadratic; the expensive artifact (pairs) is shared,
    * not rebuilt.
    */
  def q199ReleaseScorecard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
      .select($"doc_id", $"source",
        md5(lower(trim(regexp_replace($"text", "\\s+", " ")))).as("fp"),
        size(toks).cast("long").as("n_tokens"),
        round(TextAnalysis.qualityScoreCol($"text", toks) * 1e6)
          .cast("long").as("qs"),
        splitColumn($"doc_id").as("split"))
      .localCheckpoint() // feeds the scalar census and the split rollup
    val base = d.agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        countDistinct($"source").as("n_sources"),
        (count(lit(1)) - countDistinct($"fp")).as("exact_dup_docs"),
        expr("sum(qs) div count(1)").as("mean_quality_micro"))
      .selectExpr(
        """stack(5,
          |  'n_docs', n_docs,
          |  'n_tokens', n_tokens,
          |  'n_sources', n_sources,
          |  'exact_dup_docs', exact_dup_docs,
          |  'mean_quality_micro', mean_quality_micro) AS (metric, value)"""
          .stripMargin)
    val splits = d.groupBy($"split").agg(count(lit(1)).as("value"))
      .select(concat(lit("docs_"), $"split").as("metric"), $"value")
    val nearDups = Dedup.ngramJaccardInverted(spark, dir, 0.7)
      .filter($"jaccard" >= 0.8)
      .agg(count(lit(1)).as("value"))
      .select(lit("neardup_pairs_08").as("metric"), $"value")
    base.unionByName(splits).unionByName(nearDups)
      .orderBy($"metric")
  }

  val q199Sql: String = {
    val grams = Dedup.gramsDuckCte
    s"""WITH tk AS (SELECT doc_id, source, text,
       |              string_split(trim(text), ' ') AS t,
       |              md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
       |                AS fp,
       |              ${splitSqlExpr("doc_id")} AS split
       |            FROM documents),
       |d AS (SELECT doc_id, source, fp, split,
       |        CAST(len(t) AS BIGINT) AS n_tokens,
       |        CAST(round((${TextAnalysis.qualitySqlExpr("text", "t")})
       |             * 1000000.0) AS BIGINT) AS qs
       |      FROM tk),
       |$grams,
       |ver AS (SELECT CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT)
       |          AS i,
       |        CAST(len(a.grams) AS BIGINT) AS na,
       |        CAST(len(b.grams) AS BIGINT) AS nb
       |        FROM grams a JOIN grams b ON a.doc_id < b.doc_id),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS v FROM ver
       |       WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.8
       |         AND CAST(i AS DOUBLE) / (na + nb - i) >= 0.7)
       |SELECT metric, value FROM (
       |  SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM d
       |  UNION ALL
       |  SELECT 'n_tokens', CAST(sum(n_tokens) AS BIGINT) FROM d
       |  UNION ALL
       |  SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT) FROM d
       |  UNION ALL
       |  SELECT 'exact_dup_docs',
       |         CAST(count(*) - count(DISTINCT fp) AS BIGINT) FROM d
       |  UNION ALL
       |  SELECT 'mean_quality_micro',
       |         CAST(sum(qs) AS BIGINT) // count(*) FROM d
       |  UNION ALL
       |  SELECT 'docs_' || split, CAST(count(*) AS BIGINT) FROM d GROUP BY 1
       |  UNION ALL
       |  SELECT 'neardup_pairs_08', v FROM nd
       |) z ORDER BY metric""".stripMargin
  }

  /** q210 — water-filling quota allocation (max–min fair): split a
    * global character budget (60% of the corpus) across sources so no
    * source exceeds its own size, small sources keep everything, and
    * the surplus is shared EQUALLY at a common water level — the
    * standard max–min fair division behind per-source sampling quotas
    * (the allocation dual of q78's temperature mix: temperature
    * reweights by a power law; water-filling enforces a hard cap).
    * Exact integer construction: sources sorted by (size, name), the
    * first index where the equal-share level L_i = (B − cum_prev) div
    * (k − i + 1) falls below the source's size is the crossing point;
    * everything before fills fully, everything after gets the base
    * level with the division remainder spread one char each to the
    * first r capped sources in name order (largest-remainder
    * discipline, q158). Σ alloc == B is then an IDENTITY, carried in
    * the hash gate as `conservation_ok`.
    *
    * Scale shape: one map-side-combinable aggregate to the source
    * relation (domain-bounded, ~20 rows); every window runs over that
    * tiny relation — the corpus is scanned exactly once.
    */
  def q210WaterfillQuota(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .groupBy($"source").agg(sum($"n_chars").as("sz"))
      .localCheckpoint()
    val tot = src.agg(sum($"sz").as("tot"), count(lit(1)).as("k"))
    val w = Window.orderBy($"sz", $"source")
    val ranked = src.crossJoin(broadcast(tot))
      .withColumn("b", expr("(tot * 3) div 5"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cum_prev", coalesce(sum($"sz").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("lvl", expr("(b - cum_prev) div (k - i + 1)"))
      .localCheckpoint() // feeds both the crossing scalar and the output
    val crossing = ranked.filter($"sz" > $"lvl")
      .select(min(struct($"i", $"cum_prev", $"lvl")).as("c"))
      .select($"c.i".as("ci"), $"c.cum_prev".as("ccum"), $"c.lvl".as("base"))
    val wname = Window.orderBy($"source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val alloc = ranked.crossJoin(broadcast(crossing))
      .withColumn("r", expr("(b - ccum) % (k - ci + 1)"))
      .withColumn("cap_rank",
        sum(when($"i" >= $"ci", 1L).otherwise(0L)).over(wname))
      .withColumn("capped", $"i" >= $"ci")
      .withColumn("alloc", when(!$"capped", $"sz")
        .otherwise($"base" + when($"cap_rank" <= $"r", 1L).otherwise(0L)))
    alloc
      .withColumn("total_alloc",
        sum($"alloc").over(Window.partitionBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"source", $"sz".as("n_chars"), $"alloc".as("alloc_chars"),
        $"capped", ($"total_alloc" === $"b").as("conservation_ok"))
      .orderBy($"source")
  }

  val q210Sql: String =
    """WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS sz
      |           FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(sz) AS BIGINT) AS tot,
      |             CAST(count(*) AS BIGINT) AS k,
      |             CAST(sum(sz) * 3 // 5 AS BIGINT) AS b FROM s),
      |rk AS (SELECT s.*, t.k, t.b,
      |              CAST(ROW_NUMBER() OVER (ORDER BY sz, source) AS BIGINT)
      |                AS i,
      |              CAST(coalesce(sum(sz) OVER (ORDER BY sz, source
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |                AS BIGINT) AS cum_prev
      |       FROM s, t),
      |lv AS (SELECT *, CAST((b - cum_prev) // (k - i + 1) AS BIGINT) AS lvl
      |       FROM rk),
      |cr AS (SELECT i AS ci, cum_prev AS ccum, lvl AS base
      |       FROM lv WHERE sz > lvl ORDER BY i LIMIT 1),
      |al AS (SELECT lv.*, cr.ci, cr.base,
      |              CAST((lv.b - cr.ccum) % (lv.k - cr.ci + 1) AS BIGINT)
      |                AS r,
      |              CAST(sum(CASE WHEN lv.i >= cr.ci THEN 1 ELSE 0 END)
      |                OVER (ORDER BY lv.source
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                AS BIGINT) AS cap_rank
      |       FROM lv, cr),
      |fin AS (SELECT source, sz, i >= ci AS capped,
      |               CASE WHEN i < ci THEN sz
      |                    ELSE base + CASE WHEN cap_rank <= r THEN 1 ELSE 0
      |                         END END AS alloc, b
      |        FROM al)
      |SELECT source, sz AS n_chars, CAST(alloc AS BIGINT) AS alloc_chars,
      |       capped,
      |       CAST(sum(alloc) OVER () AS BIGINT) = b AS conservation_ok
      |FROM fin ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_waterfill_quota" -> (q210WaterfillQuota _),
    "q199_release_scorecard" -> (q199ReleaseScorecard _),
    "q191_zipf_fit" -> (q191ZipfFit _),
    "q192_shard_manifest" -> (q192ShardManifest _),
    "q189_boilerplate_strip" -> (q189BoilerplateStrip _),
    "q68_vocab_coverage" -> (q68VocabCoverage _),
    "q229_vocab_growth" -> (q229VocabGrowth _),
    "q78_temperature_mix" -> (q78TemperatureMix _),
    "q80_shard_layout" -> (q80ShardLayout _),
    "q137_rendezvous_sharding" -> (q137RendezvousSharding _),
    "q143_greedy_coverage" -> (q143GreedyCoverage _),
    "q81_mix_subsample" -> (q81MixSubsample _),
    "q69_bigram_lift" -> (q69BigramLift _),
    "q70_stratified_split" -> (q70StratifiedSplit _),
    "q71_source_overlap" -> (q71SourceOverlap _),
    "q72_boilerplate_prefixes" -> (q72BoilerplatePrefixes _),
    "q73_source_vocab_jaccard" -> (q73SourceVocabJaccard _),
    "q219_sketch_vocab_overlap" -> (q219SketchVocabOverlap _))

  val oracleSql: Map[String, String] = Map(
    "q210_waterfill_quota" -> q210Sql,
    "q199_release_scorecard" -> q199Sql,
    "q191_zipf_fit" -> q191Sql,
    "q192_shard_manifest" -> q192Sql,
    "q189_boilerplate_strip" -> q189Sql,
    "q68_vocab_coverage" -> q68Sql,
    "q229_vocab_growth" -> q229Sql,
    "q78_temperature_mix" -> q78Sql,
    "q69_bigram_lift" -> q69Sql,
    "q70_stratified_split" -> q70Sql,
    "q71_source_overlap" -> q71Sql,
    "q72_boilerplate_prefixes" -> q72Sql,
    "q73_source_vocab_jaccard" -> q73Sql,
    "q219_sketch_vocab_overlap" -> q219Sql,
    "q80_shard_layout" -> q80Sql,
    "q81_mix_subsample" -> q81Sql,
    "q137_rendezvous_sharding" -> q137Sql,
    "q143_greedy_coverage" -> q143Sql)
}
