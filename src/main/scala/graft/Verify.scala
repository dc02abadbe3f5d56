package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (local
    // iteration only; the driver's two-arg invocation runs everything)
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // name → exception message for every declared query that throws.
    // Round 8 lost 14 queries because errors only went to stderr while
    // the process exited 0 — the driver's correctness file then OMITTED
    // them (silently green-looking) instead of recording failures. Now
    // any error lands in verify_errors.json AND flips the exit code.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Driver-stable output types: the driver's hasher canonicalizes these
    // identically across Spark and DuckDB. Anything else — DECIMAL above
    // all (r10: q117/q118/q119 were value-identical but hash-red because
    // Spark landed DECIMAL(28,4) where DuckDB derived (38,4)) — must be
    // frozen (STRING→DOUBLE round-trip or BIGINT cents) BEFORE the query
    // boundary. Declaring a query with an unstable output type is a
    // verify error, so it can never reach the driver unfrozen.
    import org.apache.spark.sql.types._
    def stable(dt: DataType): Boolean = dt match {
      case _: LongType | _: IntegerType | _: ShortType | _: ByteType |
           _: DoubleType | _: FloatType | _: StringType | _: DateType |
           _: BooleanType | _: TimestampType | _: TimestampNTZType |
           _: BinaryType => true
      case ArrayType(e, _) => stable(e)
      case _ => false
    }
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val unstable = df.schema.fields.filterNot(f => stable(f.dataType))
        if (unstable.nonEmpty) {
          val msg = "driver-unstable output type(s): " + unstable
            .map(f => s"${f.name}: ${f.dataType.sql}").mkString("; ")
          System.err.println(s"[verify] $name $msg")
          errors(name) = msg
        } else df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
      // drop localCheckpoint blocks left by sketch queries, keeping the
      // session-pinned memo tables (see Bench)
      org.apache.spark.sql.graft.CheckpointUtils.sweepUnpinned(spark.sparkContext)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Toolchain canary + loud failures: which Spark produced this dump,
    // and every query that threw (empty map on a clean run). Written as
    // a SEPARATE file so the driver's strict name→sql parse of
    // oracle_sql.json is untouched.
    val ran = SparkEntry.queries.count(kv => keep(kv._1))
    val errJson = s"""{"spark_version": ${q(spark.version)}, "declared": ${SparkEntry.queries.size}, "ran": $ran, "dumped": ${ran - errors.size}, "errors": ${
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    }}"""
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
