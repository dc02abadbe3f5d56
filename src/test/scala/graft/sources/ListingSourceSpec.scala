package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode
import graft.SparkSpec

/** The bucket-listing DSv2 connector: S3 ListBucket XML shards as a
  * relation with suffix-filter pushdown and column pruning, fetched on
  * executors (one InputPartition per shard).
  */
class ListingSourceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val xml1 =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
      |  <Name>tripdata</Name>
      |  <Contents><Key>JC-202401-citibike-tripdata.csv.zip</Key><Size>1111</Size><LastModified>2024-02-01T00:00:00.000Z</LastModified></Contents>
      |  <Contents><Key>JC-202402-citibike-tripdata.csv.zip</Key><Size>2222</Size><LastModified>2024-03-01T00:00:00.000Z</LastModified></Contents>
      |  <Contents><Key>index.html</Key><Size>33</Size><LastModified>2024-01-01T00:00:00.000Z</LastModified></Contents>
      |</ListBucketResult>""".stripMargin

  private val xml2 =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<ListBucketResult>
      |  <Contents><Key>JC-202501-citibike-tripdata.csv.zip</Key><Size>3333</Size><LastModified>2025-02-01T00:00:00.000Z</LastModified></Contents>
      |</ListBucketResult>""".stripMargin

  test("reads a listing over HTTP with pushed suffix filter and pruned columns") {
    val server = com.sun.net.httpserver.HttpServer
      .create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/list", { ex =>
      val b = xml1.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/list"
      val df = spark.read.format("bucket-listing").option("url", url).load()
        .filter(endswith($"key", lit(".zip")))
        .select($"key", $"size")
      val plan = df.queryExecution.explainString(FormattedMode)
      assert(plan.contains("EndsWith(key,.zip)"),
        s"suffix filter must push into the listing scan:\n$plan")
      val rows = df.orderBy($"key").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq(
        "JC-202401-citibike-tripdata.csv.zip", "JC-202402-citibike-tripdata.csv.zip"))
      assert(rows.map(_.getLong(1)).toSeq == Seq(1111L, 2222L))
    } finally server.stop(0)
  }

  test("multiple shard urls become parallel partitions (file:// shards)") {
    val d = Files.createTempDirectory("graft_listing")
    Files.writeString(d.resolve("a.xml"), xml1)
    Files.writeString(d.resolve("b.xml"), xml2)
    val df = spark.read.format("bucket-listing")
      .option("urls", s"file://$d/a.xml,file://$d/b.xml").load()
      .filter(endswith($"key", lit(".zip")))
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 3)
    // url column carries shard lineage
    assert(df.select($"url").distinct().count() == 2)
  }

  test("full-class-name load works without the service registry") {
    val d = Files.createTempDirectory("graft_listing2")
    Files.writeString(d.resolve("l.xml"), xml2)
    val df = spark.read.format("graft.sources.ListingSource")
      .option("url", s"file://$d/l.xml").load()
    val r = df.collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("last_modified") == "2025-02-01T00:00:00.000Z")
  }

  test("keys feed the existing fetch/extract lifecycle shape") {
    // the connector's keys compose with Ingest.urljoin exactly like the
    // reference's scrape -> urljoin -> wget chain
    val keys = ListingSource.parseListing(xml1).map(_._1).filter(_.endsWith(".zip"))
    val urls = keys.map(k => Ingest.urljoin("https://tripdata.example.com/", k))
    assert(urls == Seq(
      "https://tripdata.example.com/JC-202401-citibike-tripdata.csv.zip",
      "https://tripdata.example.com/JC-202402-citibike-tripdata.csv.zip"))
  }
}
