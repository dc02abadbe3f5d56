package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators over `documents` — the core LLM-corpus pipeline
  * stage (north star). Four escalating strategies:
  *
  *   - exact (hash-groupBy on a normalized fingerprint) — one shuffle on
  *     the 16-byte hash, the 100 TB workhorse;
  *   - MinHash + LSH banding — candidate pairs come from equi-joins on
  *     (band, band_key) buckets, never an O(n²) compare; the exact Jaccard
  *     verification only runs on the candidate set;
  *   - SimHash — a single 60-bit signature per doc; near-dup = small
  *     Hamming distance on the signature;
  *   - direct n-gram Jaccard via an inverted-index self-join on shingles —
  *     the exact baseline the sketches approximate (at scale you'd add
  *     prefix filtering; here it doubles as the oracle for the sketches).
  *
  * Hashing discipline: every hash is derived from md5 (engine-portable) —
  * `conv(substr(md5(x),1,15),16,10)` in Spark ≡ `('0x'||substr(md5(x),1,15))::BIGINT`
  * in DuckDB — a 60-bit positive value, so the whole pipeline including the
  * sketches is deterministic and oracle-checkable, not just the final
  * verified pairs. (For a pure-Spark deployment you'd swap in xxhash64,
  * ~5× faster; md5 is the cross-engine choice.)
  *
  * Shingling: word bigrams (w=2). The fixture's planted near-dups are
  * ~99% bigram-Jaccard similar while the global unigram vocabulary is
  * shared across all docs (unigram Jaccard ≥0.8 for >30k unrelated pairs)
  * — bigrams are the smallest shingle that separates signal from noise.
  */
object Dedup {

  /** Word-bigram shingle set as a column (distinct, order preserved). */
  private def gramsCol: Column = array_distinct(expr(
    "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))"))

  private def withGrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("toks", split(trim($"text"), " "))
      .select($"doc_id", gramsCol.as("grams"))
  }

  /** Engine-portable 60-bit hash of a string column. */
  private def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  private val h60Sql: String => String =
    e => s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** Exact dedup: normalize → md5 → keep the smallest doc_id per
    * fingerprint. At 100 TB this is one shuffle of (hash, id) pairs.
    */
  def q30ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("fp", md5(lower(trim(regexp_replace($"text", "\\s+", " ")))))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }

  val q30Sql: String =
    """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY keep_id""".stripMargin

  /** MinHash (16 permutations) + LSH (4 bands × 4 rows) near-dup pairs,
    * verified with exact Jaccard >= 0.7. The band key is the SUM of the
    * band's 4 signature values — order-independent (no sort needed inside
    * the aggregation) and collision-safe because candidates are re-verified
    * exactly. Candidate generation is an equi-join on (band, band_key):
    * at scale the only shuffles are by shingle (signature build) and by
    * band key (bucket join) — never all-pairs.
    */
  def q31MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = withGrams(spark, dir)
    val gx = grams.select($"doc_id", explode($"grams").as("g"))
    val perms = spark.range(16).select($"id".cast("int").as("perm"))
    val sig = gx.crossJoin(broadcast(perms))
      .select($"doc_id", $"perm",
        h60(concat($"perm".cast("string"), lit("|"), $"g")).as("h"))
      .groupBy($"doc_id", $"perm")
      .agg(min($"h").as("sig"))
    val bands = sig
      .withColumn("band", expr("perm div 4").cast("int"))
      .groupBy($"doc_id", $"band")
      .agg(sum($"sig").as("band_key"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.band_key" === $"b.band_key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"))
      .distinct()
    val sizes = grams.select($"doc_id", size($"grams").cast("long").as("n"))
    val inter = cand
      .join(gx.as("ga"), $"a_id" === $"ga.doc_id")
      .join(gx.as("gb"), $"b_id" === $"gb.doc_id" && $"ga.g" === $"gb.g")
      .groupBy($"a_id", $"b_id")
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), $"a_id" === $"sa.doc_id")
      .join(sizes.as("sb"), $"b_id" === $"sb.doc_id")
      .withColumn("jaccard", $"i".cast("double") / ($"sa.n" + $"sb.n" - $"i"))
      .filter($"jaccard" >= 0.7)
      .select($"a_id", $"b_id", $"jaccard")
      .orderBy($"a_id", $"b_id")
  }

  val q31Sql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
       |grams AS (SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS grams FROM toks),
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |sig AS (SELECT doc_id, perm, MIN(${h60Sql("CAST(perm AS VARCHAR) || '|' || g")}) AS sig
       |        FROM gx, range(16) p(perm) GROUP BY doc_id, perm),
       |bands AS (SELECT doc_id, CAST(perm // 4 AS INT) AS band, CAST(SUM(sig) AS BIGINT) AS band_key
       |          FROM sig GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n FROM grams),
       |inter AS (SELECT c.a_id, c.b_id, COUNT(*) AS i
       |          FROM cand c
       |          JOIN gx ga ON ga.doc_id = c.a_id
       |          JOIN gx gb ON gb.doc_id = c.b_id AND ga.g = gb.g
       |          GROUP BY 1, 2)
       |SELECT i.a_id, i.b_id, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
       |FROM inter i
       |JOIN sizes sa ON i.a_id = sa.doc_id
       |JOIN sizes sb ON i.b_id = sb.doc_id
       |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7
       |ORDER BY a_id, b_id""".stripMargin

  /** SimHash: 60-bit signature (one bit per position b = sign of the sum of
    * ±1 votes from each shingle's hash bit b), near-dup pairs = Hamming
    * distance <= 10. Random pairs sit at ~30 of 60 bits; planted ~99%
    * near-dups at ~0-4. Signature build is two hash aggregations; the pair
    * scan compares 8-byte signatures only (at scale: block by signature
    * prefix instead of the full self-join).
    */
  def q32Simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gx = withGrams(spark, dir).select($"doc_id", explode($"grams").as("g"))
      .withColumn("h", h60(col("g")))
    val bits = spark.range(60).select($"id".cast("int").as("b"))
    val sims = gx.crossJoin(broadcast(bits))
      .withColumn("vote",
        when(expr("shiftright(h, b)").bitwiseAND(1) === 1, 1L).otherwise(-1L))
      .groupBy($"doc_id", $"b")
      .agg(sum($"vote").as("v"))
      .withColumn("bit", when($"v" > 0, 1L).otherwise(0L))
      .groupBy($"doc_id")
      .agg(sum(expr("shiftleft(bit, b)")).as("simhash"))
    sims.as("a").join(sims.as("b"), $"a.doc_id" < $"b.doc_id")
      .withColumn("hamming",
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).cast("long"))
      .filter($"hamming" <= 10)
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"), $"hamming")
      .orderBy($"a_id", $"b_id")
  }

  val q32Sql: String =
    s"""WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
       |grams AS (SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS grams FROM toks),
       |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
       |hx AS (SELECT doc_id, ${h60Sql("g")} AS h FROM gx),
       |votes AS (SELECT doc_id, b, SUM(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |          FROM hx, range(60) r(b) GROUP BY doc_id, b),
       |sims AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
       |         FROM votes GROUP BY doc_id)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 10
       |ORDER BY a_id, b_id""".stripMargin

  /** Direct n-gram Jaccard >= 0.5 via inverted-index self-join on shingles
    * — exact pairwise similarity without materializing all pairs: only
    * pairs sharing at least one shingle are generated.
    */
  def q33NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = withGrams(spark, dir)
    val gx = grams.select($"doc_id", explode($"grams").as("g"))
    val sizes = grams.select($"doc_id", size($"grams").cast("long").as("n"))
    val inter = gx.as("ga")
      .join(gx.as("gb"), $"ga.g" === $"gb.g" && $"ga.doc_id" < $"gb.doc_id")
      .groupBy($"ga.doc_id".as("a_id"), $"gb.doc_id".as("b_id"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.as("sa"), $"a_id" === $"sa.doc_id")
      .join(sizes.as("sb"), $"b_id" === $"sb.doc_id")
      .withColumn("jaccard", $"i".cast("double") / ($"sa.n" + $"sb.n" - $"i"))
      .filter($"jaccard" >= 0.5)
      .select($"a_id", $"b_id", $"jaccard")
      .orderBy($"a_id", $"b_id")
  }

  val q33Sql: String =
    """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
      |grams AS (SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS grams FROM toks),
      |gx AS (SELECT doc_id, unnest(grams) AS g FROM grams),
      |sizes AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n FROM grams),
      |inter AS (SELECT ga.doc_id AS a_id, gb.doc_id AS b_id, COUNT(*) AS i
      |          FROM gx ga JOIN gx gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id
      |          GROUP BY 1, 2)
      |SELECT i.a_id, i.b_id, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
      |FROM inter i
      |JOIN sizes sa ON i.a_id = sa.doc_id
      |JOIN sizes sb ON i.b_id = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_exact_dedup" -> (q30ExactDedup _),
    "q31_minhash_lsh" -> (q31MinhashLsh _),
    "q32_simhash" -> (q32Simhash _),
    "q33_ngram_jaccard" -> (q33NgramJaccard _))

  val oracleSql: Map[String, String] = Map(
    "q30_exact_dedup" -> q30Sql,
    "q31_minhash_lsh" -> q31Sql,
    "q32_simhash" -> q32Sql,
    "q33_ngram_jaccard" -> q33Sql)
}
