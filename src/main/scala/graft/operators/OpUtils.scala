package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for oracle-parity queries (see Relational doc). */
object OpUtils {

  /** Cast a money-ish double to DECIMAL(18,4) so aggregation is exact and
    * order-independent — bit-stable across Spark and the DuckDB oracle
    * regardless of partitioning.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** The matching SQL fragment for the oracle side. */
  def decSql(expr: String): String = s"CAST($expr AS DECIMAL(18,4))"

  /** F8: exact-k seeded random sample — `orderBy(rand(seed)).limit(k)`,
    * mirroring the reference's test pipeline
    * (`citibike_project/tests/pipeline.py:1-10`). Deterministic for a
    * fixed seed AND fixed partitioning; at scale prefer
    * `df.sample(fraction, seed)` (no global sort) when approximate k is
    * acceptable.
    */
  def seededSample(df: org.apache.spark.sql.DataFrame, k: Int, seed: Long): org.apache.spark.sql.DataFrame =
    df.orderBy(org.apache.spark.sql.functions.rand(seed)).limit(k)

  /** Session-scoped memo for shared checkpointed materializations (the
    * dedup pair-table family, the q48 IVF pair table): one build per
    * (session, fixture dir, key), pinned against the harness
    * between-query block sweeps
    * ([[org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned]]) —
    * a swept localCheckpoint cannot recompute. Declared queries stay
    * standalone: first touch builds.
    *
    * Three-tier lifecycle:
    *  - '''hot''': the in-session map — localCheckpoint blocks, pinned.
    *  - '''warm''' (opt-in via `spark.graft.artifactDir`): every build is
    *    also materialized to parquet under a deterministic per-corpus
    *    path, and a FRESH session (driver restart — the production case)
    *    loads the artifact instead of rebuilding. The corpus fingerprint
    *    covers (name, length, mtime) of the fixture's files, so a
    *    changed corpus orphans old artifacts rather than wrongly reusing
    *    them. Unset (the default, and the driver's configuration) this
    *    tier is fully inert.
    *  - '''release''': [[SessionMemo.releaseAll]] / `Dedup.release` drop
    *    a (session, dir)'s entries, unpin and free their blocks; the
    *    next touch rebuilds (or reloads the artifact) correctly.
    *
    * Locking is per-(session,dir,key) cell so first-touch builds of
    * unrelated fixtures/keys don't serialize; the global map itself is a
    * ConcurrentHashMap. Build and artifact-load wall seconds land in a
    * process-wide ledger ([[SessionMemo.buildSeconds]]) keyed
    * `<memoName>.<key>` so Bench can report memo builds as explicit line
    * items instead of hiding them inside whichever query touched first.
    */
  final class SessionMemo(val name: String) {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    SessionMemo.register(this)

    private final class Cell {
      @volatile private var df: DataFrame = _
      def get(mk: => DataFrame): DataFrame = {
        val v = df
        if (v != null) v
        else synchronized { if (df == null) df = mk; df }
      }
      def peek: Option[DataFrame] = Option(df)
    }

    private val cells =
      new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), Cell]()

    /** Drop entries whose SparkContext has stopped — their blocks are
      * gone with the context, and without this a long-lived JVM cycling
      * contexts would grow the map unboundedly (the pin registry prunes
      * dead applications on sweep; this is the map-side half).
      */
    private def pruneStopped(): Unit = {
      val it = cells.keySet().iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    }

    def apply(spark: SparkSession, dir: String, key: String)(
        build: => DataFrame): DataFrame = {
      pruneStopped()
      cells.computeIfAbsent((spark, dir, key), _ => new Cell).get {
        SessionMemo.artifactPath(spark, dir, s"$name.$key") match {
          case Some(p) if SessionMemo.artifactExists(spark, p) =>
            val t0 = System.nanoTime()
            val df = spark.read.parquet(p)
            SessionMemo.record(s"$name.$key", loaded = true, (System.nanoTime() - t0) / 1e9)
            df
          case art =>
            val t0 = System.nanoTime()
            val df = build
            org.apache.spark.sql.graft.CheckpointUtils.pin(df)
            // warm tier: persist the built table for the NEXT session;
            // this session keeps serving the (already paid-for) hot copy
            art.foreach { p =>
              df.write.mode("overwrite").parquet(p)
              SessionMemo.writeSourceMarker(spark, p, dir)
            }
            SessionMemo.record(s"$name.$key", loaded = false, (System.nanoTime() - t0) / 1e9)
            df
        }
      }
    }

    /** Evict every entry of (session, dir): unpin + free the checkpoint
      * blocks (no-op for artifact-loaded parquet entries) and drop the
      * cells so the next touch rebuilds/reloads.
      */
    private[operators] def release(spark: SparkSession, dir: String): Unit = {
      val it = cells.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 == spark && e.getKey._2 == dir) {
          e.getValue.peek.foreach { df =>
            org.apache.spark.sql.graft.CheckpointUtils.unpin(df)
            org.apache.spark.sql.graft.CheckpointUtils.free(df)
          }
          it.remove()
        }
      }
    }
  }

  object SessionMemo {
    private val instances = new java.util.concurrent.CopyOnWriteArrayList[SessionMemo]()
    private def register(m: SessionMemo): Unit = instances.add(m)

    /** Release all memo instances' entries for (session, dir). */
    def releaseAll(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
      instances.forEach(_.release(spark, dir))

    // ---- build/load ledger (process-wide, for Bench accounting) ----
    private val ledger =
      new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Double)]()
    private def record(key: String, loaded: Boolean, sec: Double): Unit =
      ledger.put(key, (loaded, sec))

    /** Wall seconds of first-touch BUILDS since process start, keyed
      * `<memoName>.<key>` (artifact loads excluded — see [[loadSeconds]]).
      */
    def buildSeconds: Map[String, Double] = {
      import scala.jdk.CollectionConverters._
      ledger.asScala.collect { case (k, (false, s)) => k -> s }.toMap
    }

    /** Wall seconds of artifact loads (schema/footer read — lazy). */
    def loadSeconds: Map[String, Double] = {
      import scala.jdk.CollectionConverters._
      ledger.asScala.collect { case (k, (true, s)) => k -> s }.toMap
    }

    // ---- warm tier: deterministic per-corpus artifact paths ----

    /** Root under which pair-table artifacts persist across sessions;
      * unset (the default) disables the warm tier entirely.
      */
    def artifactRoot(spark: org.apache.spark.sql.SparkSession): Option[String] =
      spark.conf.getOption("spark.graft.artifactDir").filter(_.nonEmpty)

    private def artifactPath(spark: org.apache.spark.sql.SparkSession, dir: String,
        fullKey: String): Option[String] =
      artifactRoot(spark).map(root =>
        s"$root/${corpusFingerprint(spark, dir)}/$fullKey.parquet")

    private def artifactExists(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

    /** Each fingerprint dir records which corpus produced it, so
      * [[gcArtifacts]] can recompute that corpus's CURRENT fingerprint
      * and reap superseded generations.
      */
    private def writeSourceMarker(spark: org.apache.spark.sql.SparkSession,
        artifactPath: String, srcDir: String): Unit = {
      val marker = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(artifactPath).getParent, "_source")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(marker, true)
      try out.write(srcDir.getBytes("UTF-8")) finally out.close()
    }

    /** Reap artifact generations whose corpus no longer fingerprints to
      * them (re-ingested/regenerated corpora orphan their old artifacts;
      * without GC a long-lived artifact root grows one generation per
      * re-ingest). A fingerprint dir is deleted when its recorded source
      * corpus is gone, or its CURRENT fingerprint differs from the dir
      * name. Returns the number of generations removed. Dirs without a
      * `_source` marker (foreign content) are left alone.
      */
    def gcArtifacts(spark: org.apache.spark.sql.SparkSession): Int =
      artifactRoot(spark).fold(0) { root =>
        val rp = new org.apache.hadoop.fs.Path(root)
        val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(rp)) 0
        else fs.listStatus(rp).filter(_.isDirectory).count { gen =>
          val marker = new org.apache.hadoop.fs.Path(gen.getPath, "_source")
          val stale = fs.exists(marker) && {
            val in = fs.open(marker)
            val src = try new String(in.readAllBytes(), "UTF-8") finally in.close()
            val srcPath = new org.apache.hadoop.fs.Path(src)
            !fs.exists(srcPath) ||
              corpusFingerprint(spark, src) != gen.getPath.getName
          }
          if (stale) fs.delete(gen.getPath, true) else false
        }
      }

    /** Content fingerprint of a corpus directory: md5 over the sorted
      * (relative path, length, mtime) of every file under it — RECURSIVE
      * (corpora written as parquet directories change their part files,
      * not the top-level listing), metadata-only (FS listings, no data
      * read). Any re-ingest/regeneration of the corpus changes it, so a
      * stale artifact is orphaned, never reused.
      */
    def corpusFingerprint(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val base = p.toUri.getPath
      val entries = scala.collection.mutable.ArrayBuffer[String]()
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val s = it.next()
        val rel = s.getPath.toUri.getPath.stripPrefix(base)
        entries += s"$rel:${s.getLen}:${s.getModificationTime}"
      }
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
      digest.map("%02x".format(_)).mkString.take(16)
    }
  }
}
