package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sinks (SURVEY.md §2.1 S6, S8, S9, S11): JDBC create-then-append
  * protocol, lakehouse writes, catalog probes.
  *
  * The reference's load protocol is `df.head(0).to_sql(if_exists="replace")`
  * followed by per-chunk appends (`citibike_project/etl/ingest_data.py:161-176`).
  * In Spark the chunk loop disappears — executors write partitions in
  * parallel with `batchsize`-bounded inserts — and "replace then append"
  * collapses to a single atomic overwrite (also fixing the reference's
  * page-overwrite bug, `etl/ingest_data.py:277-279`, SURVEY.md §7.4 bug 1).
  */
object Sinks {

  final case class JdbcConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      driver: String = "org.postgresql.Driver",
      batchSize: Int = 10000,
      numPartitions: Option[Int] = None)

  /** S6: full-table load. `overwrite + truncate` mimics the reference's
    * replace-keeping-DDL; `Append` is the incremental path.
    */
  def writeJdbc(df: DataFrame, cfg: JdbcConfig, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("batchsize", cfg.batchSize.toString)
      .option("truncate", "true")
    cfg.numPartitions.fold(w)(n => w.option("numPartitions", n.toString)).save()
  }

  /** Row deletion through a plain JDBC statement — the half of the
    * exactly-once replay protocol Spark's jdbc writer doesn't cover
    * (DELETE-then-append keyed on the micro-batch id; see
    * [[graft.streaming.EventStreams.streamToJdbc]]). A missing table is
    * the first-batch case and deletes nothing; any OTHER SQL failure
    * (lock timeout, connection blip) propagates — swallowing it would
    * let the subsequent append double-write under replay, defeating the
    * exactly-once protocol. "Missing table" is decided by the engine's
    * own SQLState, not a metadata re-probe (which itself can fail
    * transiently and mis-handles schema-qualified names).
    */
  def deleteWhere(cfg: JdbcConfig, predicate: String): Int = {
    Class.forName(cfg.driver)
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"DELETE FROM ${cfg.table} WHERE $predicate")
      catch {
        case e: java.sql.SQLException if tableMissing(e, conn, cfg.table) => 0
      } finally st.close()
    } finally conn.close()
  }

  /** The table-does-not-exist SQLStates of the engines this sink targets:
    * Derby 42X05 (table/view not found) and 42Y55, Postgres 42P01
    * (undefined_table), and the ODBC-derived 42S02 family (MySQL,
    * SQLServer). Engines whose SQLState is generic or absent (Oracle
    * reports 42000 for ORA-00942; some drivers return null) fall back to
    * a DatabaseMetaData existence probe on the SAME connection: if the
    * table is verifiably absent, this is still the first-batch case; if
    * the probe finds the table (or itself fails), the original error is
    * NOT "missing table" and must propagate — swallowing it would let
    * the subsequent append double-write under replay.
    */
  private def tableMissing(e: java.sql.SQLException, conn: java.sql.Connection,
      table: String): Boolean = {
    val s = Option(e.getSQLState).getOrElse("")
    s == "42X05" || s == "42Y55" || s == "42P01" || s == "42S02" || {
      // unrecognized state: probe metadata; only a probe that RAN and
      // found nothing downgrades the error
      try {
        val (schema, name) = table.lastIndexOf('.') match {
          case -1 => (null, table)
          case i => (table.substring(0, i), table.substring(i + 1))
        }
        def exists(sch: String, tbl: String): Boolean = {
          val rs = conn.getMetaData.getTables(null, sch, tbl, null)
          try rs.next() finally rs.close()
        }
        // identifier case folding differs per engine (Derby/Oracle upper,
        // Postgres lower): absent means NO casing matches
        !(exists(schema, name) ||
          exists(if (schema == null) null else schema.toUpperCase, name.toUpperCase) ||
          exists(if (schema == null) null else schema.toLowerCase, name.toLowerCase))
      } catch { case _: java.sql.SQLException => false }
    }
  }

  /** S11: object-store/lake write — any Hadoop FS scheme (s3a://, gs://,
    * file://). Parquet+zstd columnar at rest.
    */
  def writeLake(df: DataFrame, dest: String, partitionCols: Seq[String] = Seq.empty,
      codec: String = "zstd"): Unit = {
    val w = df.write.mode("overwrite").option("compression", codec)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(dest)
  }

  /** Small-files compaction — the lake-maintenance job every streaming
    * or incremental writer eventually needs (the same problem
    * NearDupIndex solves with its rebuild-on-doubling; this is the
    * general API): rewrites a parquet directory into
    * `ceil(rows / rowsPerFile)` files, then atomically swaps the new
    * tree in (write to `<dest>.compact.tmp`, rename old aside, rename
    * tmp in, delete old). Readers racing the swap see either the old or
    * the new complete tree, never a mix — rename is atomic per entry on
    * HDFS-like stores; on S3-like stores the swap window is the two
    * renames, which is why production tables put a manifest/catalog
    * (Iceberg, S13) in front. Returns (filesBefore, filesAfter).
    */
  def compactLake(spark: SparkSession, dest: String, rowsPerFile: Long = 1000000L): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val path = new Path(dest)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetCount(p: Path): Int = {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val before = parquetCount(path)
    val df = spark.read.parquet(dest)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / rowsPerFile).toInt)
    val tmp = new Path(dest + ".compact.tmp")
    val old = new Path(dest + ".compact.old")
    fs.delete(tmp, true); fs.delete(old, true)
    df.repartition(nFiles).write.mode("overwrite")
      .option("compression", "zstd").parquet(tmp.toString)
    require(fs.rename(path, old), s"compactLake: could not move $path aside")
    require(fs.rename(tmp, path), s"compactLake: could not move $tmp into place")
    fs.delete(old, true)
    (before, parquetCount(path))
  }

  /** Deployment form of the q80 shard layout (graft.operators.Corpus):
    * one directory per shard, rows laid down in permutation order within
    * it — `repartition(shard)` + `sortWithinPartitions` keeps every sort
    * shard-local (the whole point of the layout: no stage totally orders
    * the corpus), and readers stream shard directories in order to
    * reproduce the global permutation.
    */
  def writeShardedCorpus(docsWithLayout: DataFrame, dest: String): Unit = {
    import org.apache.spark.sql.functions.col
    docsWithLayout
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(dest)
  }

  /** Bucketed catalog-table write — the co-located-join layout: both
    * sides of a recurring equi-join written with the same bucket count
    * and key join WITHOUT an exchange (Catalyst reads the bucketing from
    * the catalog and drops both shuffles — LakeLayoutSpec pins the
    * no-Exchange plan). At 100 TB this converts the nightly fact-to-fact
    * join from two full shuffles into a local zip of pre-sorted buckets;
    * the price is paid once at write time. Bucketing requires
    * `saveAsTable` (file-based `parquet(path)` writes can't carry bucket
    * metadata — a real deployment uses the metastore, the fixture uses
    * the session catalog + warehouse dir).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Gzip CSV write — the reference's compact step as a writer option
    * (`citibike_project/etl/ingest_data.py:145-152`).
    */
  def writeCsvGzip(df: DataFrame, dest: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(dest)

  /** S8: catalog existence probe (`SELECT to_regclass(...)` equivalent,
    * `citibike_project/etl/ingest_data.py:251-253`).
    */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** S9: CREATE DATABASE IF NOT EXISTS (`etl/ingest_data.py:216-222`). */
  def createDatabaseIfNotExists(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $name")

  /** Header-only projection (SURVEY.md §2.2 P1): the reference's
    * `df.head(n=0).to_sql(...)` DDL-emission trick
    * (`citibike_project/etl/ingest_data.py:161-166`) — schema travels,
    * zero rows move. `LimitPushDown` makes this a no-data scan.
    */
  def headerOnly(df: DataFrame): DataFrame = df.limit(0)

  /** S13: Iceberg lakehouse surface, capability-probed. The reference
    * configures an Iceberg catalog over its object store
    * (`citibike_project/spark/spark-defaults.conf:1-3`; runtime jar via
    * `spark/Dockerfile:32-33`). This build ships no Iceberg jar and has
    * no egress to fetch one (probed round 2), so the write path is
    * CODE-READY and probe-gated rather than exercised: the probe
    * reflects the classpath, [[icebergCatalogConf]] maps the reference's
    * defaults, and [[writeIceberg]]/[[mergeIceberg]] go through Spark's
    * stable V2 `writeTo`/SQL-MERGE surfaces — no Iceberg import anywhere,
    * so the code compiles here and lights up unchanged once a runtime
    * jar lands on the classpath (the probe-gated spec then runs the
    * round trip).
    */
  def icebergAvailable: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: ClassNotFoundException => false }

  /** The reference's `spark-defaults.conf:1-3` catalog settings as a
    * session conf map (hadoop-type catalog over any warehouse scheme —
    * s3a:// in the reference, file:// in a local run).
    */
  def icebergCatalogConf(catalogName: String, warehouse: String): Map[String, String] = Map(
    s"spark.sql.catalog.$catalogName" -> "org.apache.iceberg.spark.SparkCatalog",
    s"spark.sql.catalog.$catalogName.type" -> "hadoop",
    s"spark.sql.catalog.$catalogName.warehouse" -> warehouse)

  /** Iceberg table write via the V2 writer: create-or-replace for the
    * full-load path, append for the incremental one. Fails fast when the
    * runtime is absent rather than producing a half-configured table.
    */
  def writeIceberg(df: DataFrame, table: String, replace: Boolean = true): Unit = {
    require(icebergAvailable, "Iceberg runtime jar not on the classpath")
    if (replace) df.writeTo(table).using("iceberg").createOrReplace()
    else df.writeTo(table).append()
  }

  /** Exactly-once upsert into an Iceberg table: MERGE keyed on `keys` —
    * the transactional form of [[newRowsOnly]]'s anti-join and the
    * replay-idempotent alternative to the JDBC DELETE-then-append
    * protocol ([[graft.streaming.EventStreams.streamToJdbc]]).
    */
  def mergeIceberg(incoming: DataFrame, table: String, keys: Seq[String]): Unit = {
    require(icebergAvailable, "Iceberg runtime jar not on the classpath")
    require(keys.nonEmpty, "merge needs at least one key column")
    val spark = incoming.sparkSession
    // per-invocation view name (deterministic counter, no UUID): two
    // concurrent merges in one session must not clobber each other's
    // source view
    val view = s"graft_merge_incoming_${mergeViewSeq.incrementAndGet()}"
    incoming.createOrReplaceTempView(view)
    try {
      // backtick-quoted key identifiers so non-trivial column names
      // (reserved words, dots, spaces) survive the generated SQL
      val on = keys.map(k => s"t.`$k` = s.`$k`").mkString(" AND ")
      spark.sql(
        s"""MERGE INTO $table t USING $view s ON $on
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    } finally spark.catalog.dropTempView(view)
  }

  private val mergeViewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** S12: bucket/prefix creation — driver-side `FileSystem.mkdirs` over
    * any Hadoop FS scheme (s3a://, gs://, file://); the portable form of
    * the reference's boto3 `create_bucket` (notebook cell `cededb10`).
    */
  def ensureDir(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
  }

  /** Idempotent load: only rows whose keys are absent — the relational
    * form of the reference's "skip if table exists" guard
    * (`etl/ingest_data.py:259-262`), done per-row with an anti join
    * instead of per-table.
    */
  def newRowsOnly(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(org.apache.spark.sql.functions.col): _*),
      keys, "left_anti")
}
