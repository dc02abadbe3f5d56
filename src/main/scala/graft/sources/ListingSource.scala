package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, StringEndsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 at scale: the reference's bucket-listing scrape
  * (`citibike_project/etl/ingest_data.py:59-69` — GET the S3 ListBucket
  * XML, parse `<Key>` elements, filter by suffix) exposed as a DataSource
  * V2 TABLE instead of a driver-side loop, per SURVEY.md §2.1 S1's scale
  * mapping ("a custom DataSource V2 TableProvider that lists the
  * bucket"):
  *
  * {{{
  * spark.read.format("bucket-listing")
  *   .option("urls", "https://bucket/?prefix=2024,https://bucket/?prefix=2025")
  *   .load()
  *   .filter(endswith($"key", ".zip"))
  * }}}
  *
  * Why a connector and not a helper function: the enumeration becomes a
  * relation inside the query plan, so Catalyst's pushdown reaches it —
  * `StringEndsWith` filters on `key` (the reference's `.endswith('.zip')`,
  * P4) are evaluated inside the partition reader and never surface as
  * rows, and column pruning drops the XML fields the query doesn't
  * touch. Each listing URL (one per prefix shard, the standard way to
  * parallelize a 100M-object bucket listing) becomes its own
  * InputPartition, so the fetch+parse runs ON EXECUTORS in parallel, not
  * on the driver. `file://` URLs are supported for airgapped tests and
  * local mirrors; the row schema carries key/size/last_modified/url.
  * The `urls` shard separator defaults to "," and is configurable via
  * `option("separator", ...)` for URLs that legitimately contain commas
  * (S3 prefixes, presigned query parameters) — whitespace is a safe
  * choice there, since URLs never contain it unencoded.
  */
class ListingSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "bucket-listing"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ListingSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // DSv2 contract: reader options are case-insensitive
    val opts = new CaseInsensitiveStringMap(properties)
    // commas are legal inside URLs (S3 prefixes, presigned query params),
    // so the shard separator is configurable; whitespace never is, making
    // it a safe alternative for such URLs
    val sep = Option(opts.get("separator")).getOrElse(",")
    val urls = Option(opts.get("urls"))
      .map(_.split(java.util.regex.Pattern.quote(sep)).toSeq.map(_.trim).filter(_.nonEmpty))
      .orElse(Option(opts.get("url")).map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException(
        "bucket-listing requires option 'url' or separator-delimited 'urls'"))
    new ListingTable(urls)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object ListingSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("size", LongType, nullable = true),
    StructField("last_modified", StringType, nullable = true),
    StructField("url", StringType, nullable = false)))

  /** Fetch a listing document (http/https/file). */
  private[sources] def fetchListing(url: String): String = {
    val uri = java.net.URI.create(url)
    uri.getScheme match {
      case "file" =>
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(uri)), "UTF-8")
      case _ =>
        val client = java.net.http.HttpClient.newBuilder()
          .followRedirects(java.net.http.HttpClient.Redirect.NORMAL).build()
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(uri).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() / 100 == 2, s"GET $url -> HTTP ${resp.statusCode()}")
        resp.body()
    }
  }

  /** Parse S3 ListBucket XML `<Contents>` entries; entries without a
    * `<Contents>` wrapper fall back to bare `<Key>` elements (the
    * reference's parse reads keys only).
    */
  private[sources] def parseListing(xml: String): Seq[(String, Option[Long], Option[String])] = {
    val doc = scala.xml.XML.loadString(xml)
    val contents = doc \\ "Contents"
    if (contents.nonEmpty)
      contents.map { c =>
        ((c \ "Key").text,
          (c \ "Size").headOption.map(_.text.trim.toLong),
          (c \ "LastModified").headOption.map(_.text.trim))
      }.toSeq
    else (doc \\ "Key").map(k => (k.text, None, None)).toSeq
  }
}

private[sources] class ListingTable(urls: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"bucket_listing(${urls.mkString(",")})"
  override def schema(): StructType = ListingSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ListingScanBuilder(urls)
}

private[sources] class ListingScanBuilder(urls: Seq[String]) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ListingSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition {
      case StringEndsWith("key", _) => true
      case _ => false
    }
    pushed = sup
    rest // Spark re-evaluates anything we don't accept; suffix we handle
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    val suffixes = pushed.collect { case StringEndsWith(_, s) => s }
    new ListingScan(urls, suffixes, required)
  }
}

private[sources] class ListingScan(urls: Seq[String], suffixes: Seq[String],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"bucket-listing ${urls.size} shard(s), PushedFilters: [${suffixes.map(s => s"EndsWith(key,$s)").mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    urls.map(u => ListingPartition(u)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ListingReaderFactory(suffixes, required.fieldNames)
}

private[sources] case class ListingPartition(url: String) extends InputPartition

/** Runs on executors: fetch one listing shard, parse, apply the pushed
  * suffix filters, emit only the pruned columns.
  */
private[sources] class ListingReaderFactory(suffixes: Seq[String],
    fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val url = partition.asInstanceOf[ListingPartition].url
    new PartitionReader[InternalRow] {
      private val rows: Iterator[(String, Option[Long], Option[String])] =
        ListingSource.parseListing(ListingSource.fetchListing(url)).iterator
          .filter { case (k, _, _) =>
            suffixes.isEmpty || suffixes.forall(k.endsWith)
          }
      private var cur: (String, Option[Long], Option[String]) = _
      override def next(): Boolean = {
        if (!rows.hasNext) return false
        cur = rows.next(); true
      }
      override def get(): InternalRow = {
        val vals = fields.map {
          case "key" => UTF8String.fromString(cur._1)
          case "size" => cur._2.map(Long.box).orNull
          case "last_modified" => cur._3.map(UTF8String.fromString).orNull
          case "url" => UTF8String.fromString(url)
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
