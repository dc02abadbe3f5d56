package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Canonical schemas for the reference's data model (SURVEY.md §1.2).
  *
  * `Trip` mirrors the 13-column `citibike_data` DDL the reference derives
  * via pandas schema inference (`citibike_project/ingest-citibike.ipynb`
  * cell `b65382b0`); timestamps are tz-naive pinned to UTC session time.
  * The explicit StructType is authoritative — schema inference is only a
  * fallback for ad-hoc files (reference relies on inference everywhere,
  * which at 100 TB means an extra full scan; a declared schema is free).
  */
final case class Trip(
    ride_id: String,
    rideable_type: String,
    started_at: Timestamp,
    ended_at: Timestamp,
    start_station_name: String,
    start_station_id: String,
    end_station_name: String,
    end_station_id: String,
    start_lat: Double,
    start_lng: Double,
    end_lat: Double,
    end_lng: Double,
    member_casual: String)

object Schemas {

  /** citibike_data: the modern trip schema (reference DDL, SURVEY.md §1.2). */
  val trip: StructType = StructType(Seq(
    StructField("ride_id", StringType),
    StructField("rideable_type", StringType),
    StructField("started_at", TimestampType),
    StructField("ended_at", TimestampType),
    StructField("start_station_name", StringType),
    StructField("start_station_id", StringType),
    StructField("end_station_name", StringType),
    StructField("end_station_id", StringType),
    StructField("start_lat", DoubleType),
    StructField("start_lng", DoubleType),
    StructField("end_lat", DoubleType),
    StructField("end_lng", DoubleType),
    StructField("member_casual", StringType)))

  /** citibike_trips_{year}: the legacy BigQuery public-dataset schema the
    * warehouse-extract path copies (`citibike_project/etl/ingest_data.py:265-270`).
    */
  val legacyTrip: StructType = StructType(Seq(
    StructField("tripduration", IntegerType),
    StructField("starttime", TimestampType),
    StructField("stoptime", TimestampType),
    StructField("start_station_id", IntegerType),
    StructField("start_station_name", StringType),
    StructField("start_station_latitude", DoubleType),
    StructField("start_station_longitude", DoubleType),
    StructField("end_station_id", IntegerType),
    StructField("end_station_name", StringType),
    StructField("end_station_latitude", DoubleType),
    StructField("end_station_longitude", DoubleType),
    StructField("bikeid", IntegerType),
    StructField("usertype", StringType),
    StructField("birth_year", IntegerType),
    StructField("gender", StringType)))

  /** events table (driver harness), read-side schema with raw nano ts —
    * matches parquet TIMESTAMP(NANOS) files under Spark 3's nanosAsLong.
    */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as raw nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events table, read-side schema for parquet TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) files, which Spark 4 surfaces as
    * TIMESTAMP_NTZ. `Tables.normalizeEventTs` canonicalizes either
    * variant to session-UTC TIMESTAMP.
    */
  val eventsNtz: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events table, read-side schema for parquet TIMESTAMP(MICROS,
    * isAdjustedToUTC=true) files — already session-instant micros, which
    * `Tables.normalizeEventTs` passes through unchanged.
    */
  val eventsTz: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}
