package graft.sources

import java.io.{FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class IngestSpec extends AnyFunSuite with SparkSpec {

  private val tripCsv =
    """ride_id,rideable_type,started_at,ended_at,start_station_name,start_station_id,end_station_name,end_station_id,start_lat,start_lng,end_lat,end_lng,member_casual
      |AABD1C039D2D622D,electric_bike,2025-08-01 10:00:00.123,2025-08-01 10:15:30.456,Grove St,JC115,Newark Ave,JC116,40.7194,-74.0431,40.7215,-74.0465,member
      |BBCD2C039D2D622E,classic_bike,2025-08-02 11:00:00.000,2025-08-02 11:05:00.000,Hamilton Park,HB105,Grove St,JC115,40.7270,-74.0440,40.7194,-74.0431,casual
      |""".stripMargin

  private def makeZip(dir: Path): Path = {
    val zip = dir.resolve("JC-202508-citibike-tripdata.csv.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zip.toFile))
    zos.putNextEntry(new ZipEntry("JC-202508-citibike-tripdata.csv"))
    zos.write(tripCsv.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    zip
  }

  test("enumerateKeys parses S3 listing XML and filters suffix") {
    val xml =
      """<?xml version="1.0"?>
        |<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
        |  <Contents><Key>JC-202507-citibike-tripdata.csv.zip</Key></Contents>
        |  <Contents><Key>JC-202508-citibike-tripdata.csv.zip</Key></Contents>
        |  <Contents><Key>index.html</Key></Contents>
        |</ListBucketResult>""".stripMargin
    val keys = Ingest.enumerateKeys(xml)
    assert(keys == Seq("JC-202507-citibike-tripdata.csv.zip", "JC-202508-citibike-tripdata.csv.zip"))
  }

  test("monthOf uses regex, not charset strip") {
    assert(Ingest.monthOf("JC-202508-citibike-tripdata.csv.zip").contains("202508"))
    assert(Ingest.monthOf("no-month-here.zip").isEmpty)
  }

  test("zip extract + discover + scan + compact round trip") {
    val staging = Files.createTempDirectory("graft_ingest")
    val zip = makeZip(Files.createTempDirectory("graft_zips"))
    val extracted = Ingest.extractZip(zip, staging)
    assert(extracted.length == 1)
    assert(extracted.head.toString.contains("/202508/"))

    val csvs = Ingest.discoverCsvs(staging)
    assert(csvs.length == 1)

    val trips = Ingest.scanTrips(spark, s"$staging/*/*.csv")
    assert(trips.schema == graft.model.Schemas.trip)
    assert(trips.count() == 2)
    val first = trips.orderBy("ride_id").head()
    assert(first.getAs[String]("ride_id") == "AABD1C039D2D622D")
    assert(first.getAs[java.sql.Timestamp]("started_at").toString.startsWith("2025-08-01 10:00:00"))

    val out = Files.createTempDirectory("graft_lake").toString + "/trips"
    Ingest.compactToParquet(trips, out)
    assert(spark.read.parquet(out).count() == 2)
  }

  test("tar extract round trip: .tar, .tgz, .tar.gz dispatch through extractArchive") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
    def makeTar(dir: Path, name: String, gzip: Boolean): Path = {
      val tar = dir.resolve(name)
      val raw = new FileOutputStream(tar.toFile)
      val tos = new TarArchiveOutputStream(
        if (gzip) new GzipCompressorOutputStream(raw) else raw)
      val bytes = tripCsv.getBytes("UTF-8")
      val e = new TarArchiveEntry("JC-202509-citibike-tripdata.csv")
      e.setSize(bytes.length.toLong)
      tos.putArchiveEntry(e)
      tos.write(bytes)
      tos.closeArchiveEntry(); tos.close()
      tar
    }
    for (name <- Seq("a.tar", "b.tgz", "c.tar.gz")) {
      val staging = Files.createTempDirectory("graft_tar_staging")
      val tar = makeTar(Files.createTempDirectory("graft_tars"), name, gzip = !name.endsWith(".tar"))
      val extracted = Ingest.extractArchive(tar, staging)
      assert(extracted.length == 1, s"$name should yield one file")
      assert(extracted.head.toString.contains("/202509/"), s"$name month routing")
      val trips = Ingest.scanTrips(spark, extracted.head.toString)
      assert(trips.count() == 2)
    }
    // non-archive passthrough
    val d = Files.createTempDirectory("graft_plain")
    val f = d.resolve("plain.csv")
    Files.writeString(f, tripCsv)
    assert(Ingest.extractArchive(f, d) == Seq(f))
  }

  test("extractTar refuses path traversal entries") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    val dir = Files.createTempDirectory("graft_evil")
    val tar = dir.resolve("evil.tar")
    val tos = new TarArchiveOutputStream(new FileOutputStream(tar.toFile))
    val bytes = "x".getBytes("UTF-8")
    val e = new TarArchiveEntry("../../escape-202501.csv")
    e.setSize(bytes.length.toLong)
    tos.putArchiveEntry(e); tos.write(bytes); tos.closeArchiveEntry(); tos.close()
    val staging = Files.createTempDirectory("graft_evil_staging")
    // getFileName flattening already strips directories; the guard is
    // defense in depth — either way nothing may land outside staging
    Ingest.extractTar(tar, staging)
    import scala.jdk.CollectionConverters._
    val landed = Files.walk(staging).iterator().asScala.filter(Files.isRegularFile(_)).toSeq
    assert(landed.forall(_.normalize.startsWith(staging.normalize)))
  }

  test("gzipFile compresses and removes original") {
    val d = Files.createTempDirectory("graft_gz")
    val f = d.resolve("x.csv")
    Files.writeString(f, tripCsv)
    val gz = Ingest.gzipFile(f)
    assert(Files.exists(gz) && !Files.exists(f))
    // spark reads .gz csv natively
    val df = spark.read.option("header", "true").csv(gz.toString)
    assert(df.count() == 2)
  }

  test("Main.run end-to-end: zip -> staging -> partitioned parquet lake") {
    val staging = Files.createTempDirectory("graft_main_staging")
    val out = Files.createTempDirectory("graft_main_out").toString + "/lake"
    val zip = makeZip(Files.createTempDirectory("graft_main_zip"))
    val n = graft.Main.run(spark,
      graft.Main.Config(staging = staging.toString, out = out, zips = Seq(zip.toString)))
    assert(n == 2)
    val lake = spark.read.parquet(out)
    // partition-column type inference reads "202508" back as an int
    assert(lake.select("month").distinct().collect().map(_.get(0).toString).toSet == Set("202508"))
    // flagship mart: monthly member vs casual counts
    val mart = spark.read.parquet(out + "_mart").collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(mart == Set(("202508", "member", 1L), ("202508", "casual", 1L)))
  }

  test("fetch downloads over HTTP and feeds the zip extractor (embedded server)") {
    val zipDir = Files.createTempDirectory("graft_http_zip")
    val zip = makeZip(zipDir)
    val bytes = Files.readAllBytes(zip)
    val server = com.sun.net.httpserver.HttpServer
      .create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/tripdata/", { ex =>
      ex.sendResponseHeaders(200, bytes.length.toLong)
      try ex.getResponseBody.write(bytes) finally ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/tripdata/${zip.getFileName}"
      val staging = Files.createTempDirectory("graft_http_staging")
      val got = Ingest.fetch(url, staging.resolve("_downloads"))
      assert(Files.readAllBytes(got).sameElements(bytes))
      val extracted = Ingest.extractZip(got, staging)
      assert(extracted.length == 1 && extracted.head.toString.contains("/202508/"))
      // end-to-end through Main with --url
      val out = Files.createTempDirectory("graft_http_out").toString + "/lake"
      val cfg = graft.Main.parse(Array(
        "--staging", Files.createTempDirectory("graft_http_staging2").toString,
        "--out", out, "--url", url))
      assert(graft.Main.run(spark, cfg) == 2)
    } finally server.stop(0)
  }

  test("fetch surfaces non-2xx as an error") {
    val server = com.sun.net.httpserver.HttpServer
      .create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { ex =>
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.start()
    try {
      intercept[IllegalArgumentException] {
        Ingest.fetch(s"http://127.0.0.1:${server.getAddress.getPort}/missing.zip",
          Files.createTempDirectory("graft_http_404"))
      }
    } finally server.stop(0)
  }

  test("--query flag parses and resolves a declared query against a table dir") {
    val cfg = graft.Main.parse(Array(
      "--query", "q1_pricing_summary", "/root/testdata/sf0.001",
      "--explain", "--show", "3"))
    assert(cfg.query.contains(("q1_pricing_summary", "/root/testdata/sf0.001")))
    assert(cfg.explain && cfg.show == 3)
    val (name, dir) = cfg.query.get
    assert(graft.SparkEntry.queries(name)(spark, dir).count() > 0)
    assert(!graft.SparkEntry.queries.contains("not_a_query"))
  }

  test("--limit-inputs dev guard scans only the first N discovered CSVs") {
    val staging = Files.createTempDirectory("graft_limit_staging")
    // two months, one CSV each
    Seq("202507", "202508").foreach { m =>
      val d = staging.resolve(m)
      Files.createDirectories(d)
      Files.writeString(d.resolve(s"JC-$m-citibike-tripdata.csv"), tripCsv)
    }
    val out = Files.createTempDirectory("graft_limit_out").toString + "/lake"
    val cfg = graft.Main.parse(Array(
      "--staging", staging.toString, "--out", out, "--limit-inputs", "1"))
    assert(cfg.limitInputs.contains(1))
    val n = graft.Main.run(spark, cfg)
    assert(n == 2, "one 2-row CSV, not both")
  }

  test("urljoin resolves relative keys against the bucket base") {
    assert(Ingest.urljoin("https://s3.amazonaws.com/tripdata/",
      "JC-202508-citibike-tripdata.csv.zip") ==
      "https://s3.amazonaws.com/tripdata/JC-202508-citibike-tripdata.csv.zip")
    // absolute url wins, as with Python's urljoin
    assert(Ingest.urljoin("https://a.example/x/", "https://b.example/y") ==
      "https://b.example/y")
  }

  test("seededSample is deterministic for a fixed seed and partitioning") {
    import spark.implicits._
    val df = spark.range(1, 101).toDF("n")
    val a = graft.operators.OpUtils.seededSample(df, 5, seed = 42L)
      .collect().map(_.getLong(0)).toSeq
    val b = graft.operators.OpUtils.seededSample(df, 5, seed = 42L)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a.length == 5 && a.distinct.length == 5)
  }

  test("json and orc round trips") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "tag", "v")
    val base = Files.createTempDirectory("graft_fmt").toString
    df.write.mode("overwrite").json(s"$base/j")
    val j = Ingest.scanJson(spark, s"$base/j", Some(df.schema))
    // file readers force nullable; compare names + types
    assert(j.count() == 2)
    assert(j.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    df.write.mode("overwrite").orc(s"$base/o")
    val o = Ingest.scanOrc(spark, s"$base/o")
    assert(o.count() == 2)
    assert(o.schema.fields.map(_.name).toSeq == Seq("id", "tag", "v"))
  }

  test("newRowsOnly anti-join keeps only unseen keys") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    val got = Sinks.newRowsOnly(incoming, existing, Seq("id")).collect()
    assert(got.map(_.getLong(0)).toSet == Set(3L))
  }

  test("catalog ops: create database + tableExists") {
    Sinks.createDatabaseIfNotExists(spark, "graft_test_db")
    assert(spark.catalog.databaseExists("graft_test_db"))
    import spark.implicits._
    Seq((1, "x")).toDF("a", "b").write.mode("overwrite").saveAsTable("graft_test_db.t1")
    assert(Sinks.tableExists(spark, "graft_test_db.t1"))
    spark.sql("DROP TABLE graft_test_db.t1")
    spark.sql("DROP DATABASE graft_test_db")
  }
}
