package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Physical-layout behaviors that matter at 100 TB: partition pruning on
  * partitioned lakes, and bucket-join shuffle elimination.
  */
class LakeLayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("partitioned lake write prunes partitions on read") {
    val dest = Files.createTempDirectory("graft_lake_part").toString + "/li"
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .withColumn("ship_year", year($"l_shipdate"))
    graft.sources.Sinks.writeLake(li, dest, partitionCols = Seq("ship_year"))
    val read = spark.read.parquet(dest).filter($"ship_year" === 1996)
    val plan = read.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("ship_year"))
    // only the 1996 directory is scanned
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    assert(read.count() > 0)
  }

  test("multi-file parquet input scans in parallel with identical results") {
    val dest = Files.createTempDirectory("graft_multifile").toString + "/li8"
    graft.sources.Tables.lineitem(spark, sfDir)
      .repartition(8).write.mode("overwrite").parquet(dest)
    val multi = spark.read.parquet(dest)
    assert(multi.rdd.getNumPartitions > 1, "8-file input should scan as multiple partitions")
    val a = multi.groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = graft.sources.Tables.lineitem(spark, sfDir).groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("bucketed tables join without a shuffle") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_layout")
    try {
      graft.sources.Sinks.writeBucketed(
        graft.sources.Tables.orders(spark, sfDir),
        "graft_layout.orders_b", "o_orderkey")
      graft.sources.Sinks.writeBucketed(
        graft.sources.Tables.lineitem(spark, sfDir)
          .select($"l_orderkey", $"l_quantity"),
        "graft_layout.lineitem_b", "l_orderkey")
      val joined = spark.table("graft_layout.lineitem_b")
        .join(spark.table("graft_layout.orders_b"),
          $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no Exchange feeding the join
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == graft.sources.Tables.lineitem(spark, sfDir).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_layout.orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_layout.lineitem_b")
      spark.sql("DROP DATABASE IF EXISTS graft_layout")
    }
  }

  test("schema-evolved lake reads merge old and new file schemas") {
    // a 100 TB lake always contains files written under older schemas;
    // mergeSchema reads must surface the union with nulls for columns
    // absent in old files, and pruning must still reach both file groups
    val dest = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(dest)
    Seq((3L, "c", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dest)
    val merged = spark.read.option("mergeSchema", "true").parquet(dest)
    assert(merged.columns.sorted.sameElements(Array("id", "name", "score")))
    val rows = merged.collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("score"))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(9.5)))
    // filters on the NEW column still prune correctly over old files
    assert(merged.filter($"score" > 5).count() == 1)
  }

  test("sharded corpus write: shard dirs round-trip the q80 permutation in order") {
    val dest = Files.createTempDirectory("graft_shards").toString + "/corpus"
    val layout = graft.operators.Corpus.q80ShardLayout(spark, sfDir)
    graft.sources.Sinks.writeShardedCorpus(layout, dest)
    val shards = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName)
    assert(shards.length > 1, "layout must fan out to multiple shard dirs")
    // within a shard directory, parquet row order IS the permutation order
    for (s <- shards.take(4)) {
      val pos = spark.read.parquet(s"$dest/$s").select("pos")
        .collect().map(_.getLong(0))
      assert(pos.sameElements(pos.sorted), s"$s must be laid down in pos order")
      assert(pos.head == 1L)
    }
    // nothing lost: reading the full tree returns every doc exactly once
    val n = spark.read.parquet(dest).select("doc_id").distinct().count()
    assert(n == layout.count())
  }

  test("z-ordered layout physically skips row groups on the non-sort dimension") {
    // write the same orders twice: linear-sorted on day vs z-ordered on
    // (custkey, day); then measure what the vectorized reader actually
    // decodes (scan-leaf numOutputRows = rows in row groups surviving
    // parquet footer-stats pruning) under a custkey range probe
    val o = graft.sources.Tables.orders(spark, sfDir)
      .withColumn("day", datediff($"o_orderdate", lit("1992-01-01").cast("date")).cast("long"))
    val Array(minc, maxc) = o.agg(min($"o_custkey"), max($"o_custkey"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val (ckLo, ckHi) = (minc + ((maxc - minc + 1) * 96) / 256,
      minc + ((maxc - minc + 1) * 112) / 256 - 1)
    val base = Files.createTempDirectory("graft_zorder").toString
    o.repartitionByRange(32, $"day").sortWithinPartitions("day")
      .write.mode("overwrite").parquet(s"$base/linear")
    graft.operators.Lakehouse.writeZOrdered(o, s"$base/zorder", "o_custkey", "day", 32)

    def decoded(dest: String): (Long, Long) = {
      val df = spark.read.parquet(dest).filter($"o_custkey".between(ckLo, ckHi))
      val qe = df.queryExecution
      val matched = qe.executedPlan.execute().count()
      val finalPlan = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      (finalPlan.collectLeaves().flatMap(_.metrics.get("numOutputRows")).map(_.value).sum,
        matched)
    }
    val total = o.count()
    val (linScanned, linMatched) = decoded(s"$base/linear")
    val (zScanned, zMatched) = decoded(s"$base/zorder")
    assert(linMatched == zMatched, "layouts must return identical results")
    // linear layout has no custkey locality: every row group survives
    assert(linScanned == total, s"linear should decode all $total rows, got $linScanned")
    // z-order: footer stats prune most row groups on the SECOND dimension
    assert(zScanned * 2 <= total, s"z-order should decode <= half the rows, got $zScanned/$total")
  }

  test("compactLake rewrites a fragmented lake into few files and swaps atomically") {
    val dest = Files.createTempDirectory("graft_compact").toString + "/docs"
    val docs = graft.sources.Tables.documents(spark, sfDir)
    docs.repartition(40).write.parquet(dest)
    val rows = docs.count()
    val (before, after) = graft.sources.Sinks.compactLake(spark, dest,
      rowsPerFile = math.max(1L, rows / 2))
    assert(before == 40, s"fragmented write should have produced 40 files, got $before")
    assert(after <= 3, s"compaction should leave <= 3 files, got $after")
    // no temp/backup trees left behind
    val parent = new java.io.File(dest).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("docs"), parent.listFiles().toSeq.toString)
    // data identical
    val got = spark.read.parquet(dest).select("doc_id").collect().map(_.getLong(0)).sorted
    val want = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want))
  }

  test("simhash captures the same near-dup set as exact Jaccard on this corpus") {
    val exact = graft.operators.Dedup.ngramJaccardAllPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = graft.operators.Dedup.q32Simhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim == exact,
      s"hamming<=10 should equal jaccard>=0.5 here: sim-only=${sim -- exact} exact-only=${exact -- sim}")
  }

  test("minhash LSH recall: finds exactly the exact-Jaccard pairs at its threshold") {
    val exact = graft.operators.Dedup.ngramJaccardAllPairs(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = graft.operators.Dedup.q31MinhashLsh(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exactAtThreshold = exact.filter(_._2 >= 0.7)
    assert(lsh == exactAtThreshold,
      s"LSH should recall all >=0.7 pairs here: lsh=${lsh.keySet} exact=${exactAtThreshold.keySet}")
  }
}
