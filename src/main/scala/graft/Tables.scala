package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Canonical loader for the driver-provided testdata tables (TESTDATA.md).
 *
 * One quirk is normalized here so every query sees clean types: `events.ts`
 * has been written by different driver generations as either parquet
 * TIMESTAMP(NANOS) — which Spark does not read natively (PARQUET_TYPE_ILLEGAL)
 * and only surfaces as a nanos-since-epoch Long under
 * `spark.sql.legacy.parquet.nanosAsLong` — or as a plain TIMESTAMP(MICROS)
 * that Spark reads directly. We inspect the type after the scan and convert
 * the Long form to a microsecond TimestampType, so every query sees the same
 * TimestampType either way. DuckDB (the correctness oracle) reads the column
 * at its native precision, so oracle queries must only use ts at
 * second-or-coarser granularity (date_trunc) — documented per query.
 */
object Tables {

  /** Runtime-settable legacy conf that maps parquet NANOS to LongType. */
  def enableNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") enableNanosAsLong(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: epoch-nanos exceed double's 53-bit mantissa,
        // so float division would perturb timestamps by up to ~1 µs
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet isAdjustedToUTC=false surfaces as NTZ; session tz is UTC in
        // every entry point, so the cast keeps the same instants while letting
        // unix_millis/unix_micros (TIMESTAMP-only) resolve
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** The flo-envelope view of `events` (bridging fixture, FIXTURES.md §3):
    * event_counter=event_id, partition=1+(user_id%3), namespace=/events/<type>,
    * data=props utf-8 bytes, parents null. */
  def floEvents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events").select(
      col("event_id").as("event_counter"),
      (lit(1) + pmod(col("user_id"), lit(3))).cast("int").as("partition"),
      col("ts").as("timestamp"),
      lit(null).cast("long").as("parent_counter"),
      lit(null).cast("int").as("parent_partition"),
      concat(lit("/events/"), col("event_type")).as("namespace"),
      encode(col("props"), "UTF-8").as("data"))
}
