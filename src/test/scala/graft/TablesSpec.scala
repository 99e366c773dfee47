package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Pins `Tables.load`'s normalization of the `events.ts` column across the
 * THREE encodings driver-generated testdata has shipped with:
 *
 *   - parquet TIMESTAMP(NANOS)  → Spark reads it only as a nanos Long under
 *     `spark.sql.legacy.parquet.nanosAsLong` (rounds ≤ 5)
 *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ
 *     (round 6 regeneration — silently broke every events query until the
 *     loader became schema-adaptive)
 *   - plain TIMESTAMP (isAdjustedToUTC=true) → TimestampType directly
 *
 * All three must surface as the SAME TimestampType instants, so every
 * downstream query (unix_millis math, windows, watermarks) is
 * encoding-agnostic. The NTZ leg matters most: session tz is UTC in every
 * entry point, so the NTZ→LTZ cast must not shift instants.
 */
class TablesSpec extends SparkSuite {

  /** 2021-03-04T05:06:07.123456Z in epoch micros. */
  private val micros = 1614834367123456L

  private def writeEvents(dir: String, tsType: DataType, tsValue: Any): Unit = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val row = org.apache.spark.sql.Row(1L, tsValue, 7L, "view", 1.5, "{}")
    spark.createDataFrame(List(row).asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedTs(dir: String): (DataType, Long) = {
    val df = Tables.load(spark, dir, "events")
    val tpe = df.schema("ts").dataType
    val v = df.select(unix_micros(col("ts"))).head().getLong(0)
    (tpe, v)
  }

  test("nanos-as-long ts (legacy TIMESTAMP(NANOS) surface) converts to micros timestamp") {
    val dir = tempDir("tables-nanos")
    // what nanosAsLong hands Spark for TIMESTAMP(NANOS): a raw epoch-nanos Long
    writeEvents(dir, LongType, micros * 1000L)
    val (tpe, v) = loadedTs(dir)
    assert(tpe === TimestampType)
    assert(v === micros)
  }

  test("TIMESTAMP_NTZ ts (round-6 testdata) casts to TimestampType without shifting instants") {
    val dir = tempDir("tables-ntz")
    writeEvents(dir, TimestampNTZType,
      java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    val (tpe, v) = loadedTs(dir)
    assert(tpe === TimestampType)
    assert(v === micros)
  }

  test("native TIMESTAMP ts passes through untouched") {
    val dir = tempDir("tables-ltz")
    writeEvents(dir, TimestampType,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L).toInt * 1000)))
    val (tpe, v) = loadedTs(dir)
    assert(tpe === TimestampType)
    assert(v === micros)
  }

  test("real driver testdata loads with a TimestampType ts and non-null values") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.filter(col("ts").isNull).isEmpty)
    assert(df.count() > 0)
  }
}
