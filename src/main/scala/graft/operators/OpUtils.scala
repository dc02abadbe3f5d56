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
}
