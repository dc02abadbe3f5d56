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
    */
  final class SessionMemo {
    private val m = scala.collection.mutable.Map[
      (org.apache.spark.sql.SparkSession, String, String),
      org.apache.spark.sql.DataFrame]()

    def apply(spark: org.apache.spark.sql.SparkSession, dir: String, key: String)(
        build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      m.synchronized {
        m.getOrElseUpdate((spark, dir, key), {
          val df = build
          org.apache.spark.sql.graft.CheckpointUtils.pin(df)
          df
        })
      }
  }
}
