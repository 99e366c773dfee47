package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * JSONL corpus interchange — the lingua franca of LLM data pipelines
 * (one JSON document per line; what web-scale corpus dumps, filtered
 * snapshots, and eval sets ship as).
 *
 * Read side: an EXPLICIT schema, never inference — schema inference
 * reads the data twice and silently unions drifting shapes, which at
 *  100 TB is both a second full scan and a correctness hazard (a typo'd
 * field vanishes instead of failing). Unknown fields are ignored,
 * missing ones are null, and `strict = true` additionally fails the read
 * if any line is unparseable (corrupt-record accounting, not silent
 * drops).
 *
 * Write side: one JSON object per line via the built-in JSON sink
 * (text-file parallelism, no driver involvement), optionally compacted
 * to `targetBytes` files first — JSONL dumps are the classic small-file
 * producer.
 */
object CorpusIO {

  /** The documents-table interchange schema. */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /**
   * Read a JSONL corpus as a documents-shaped frame. `strict = true`
   * turns unparseable lines into a loud failure (FAILFAST); the default
   * PERMISSIVE mode nulls them, and [[countCorrupt]] audits how many.
   */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType = DocumentSchema,
      strict: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (strict) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** Count unparseable lines in a JSONL dump — the data-quality gate
    * before a permissive ingest. One pass over the TEXT lines with
    * `from_json` (null struct = parse failure): no caching, no second
    * scan, and none of the corrupt-record-column query restrictions. */
  def countCorrupt(
      spark: SparkSession, path: String,
      schema: StructType = DocumentSchema): Long = {
    // PERMISSIVE from_json yields an all-null struct for a corrupt line —
    // indistinguishable from legitimate {} — so route the raw text of
    // corrupt lines into an in-struct corrupt-record field and count those
    val audited = schema.add("_corrupt_record", StringType)
    spark.read.text(path)
      .filter(trim(col("value")) =!= "")
      .select(from_json(col("value"), audited,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
      .filter(col("r._corrupt_record").isNotNull)
      .count()
  }

  /** Write a documents-shaped frame as JSONL in `numFiles` files. */
  def writeJsonl(df: DataFrame, path: String, numFiles: Int = 0): Unit = {
    val out = if (numFiles > 0) df.coalesce(numFiles) else df
    out.write.mode("overwrite").json(path)
  }
}
