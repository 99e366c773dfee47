package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.FloEngine
import graft.engine.FloEngine.EventStreamOptions
import graft.functions.payload_utf8

/**
 * Corpus-prep operators on the LIVE stream: the same stateless column
 * pipeline (payload decode -> quality gate -> normalize -> fingerprint ->
 * deterministic hash sample) runs unchanged on `consumeStream`, with
 * `dropDuplicates` adding cross-micro-batch dedup state — the streaming
 * twin of `pipe_clean_corpus`. Structured Streaming plans the identical
 * expressions incrementally, which is the point: one pipeline definition
 * serves the 100 TB backfill (batch) and the live tail.
 */
class StreamingCorpusSpec extends SparkSuite {

  /** The shared pipeline: decode, gate docs under 5 tokens, fingerprint the
    * normalized text, keep a deterministic ~75% hash sample (first hex
    * nibble < 'c' = 12/16), dedup on the fingerprint. Works on any
    * flo-envelope DataFrame, batch or streaming. */
  private def prep(df: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    df.select(col("event_counter").as("doc_id"),
        payload_utf8(col("data")).as("text"))
      .filter(size(split(trim(col("text")), " +")) >= 5)
      .withColumn("fp", md5(norm))
      .filter(substring(md5(concat(lit("graft:"), col("fp"))), 1, 1) < "c")
      .dropDuplicates("fp")
  }

  test("batch and streaming runs of one pipeline agree; later-batch duplicates are suppressed by state") {
    val root = tempDir("flo-corpus-stream")
    val e = new FloEngine(spark, root)
    e.createStream(EventStreamOptions(name = "docs", numPartitions = 1))

    val longDoc = (i: Int) => s"the quick brown fox number $i jumps over the lazy dog"
    val batch1 = (1 to 20).map(i => s"/docs/en/$i" -> longDoc(i)) ++
      Seq("/docs/short/1" -> "too short", // fails the 5-token gate
        "/docs/en/dup" -> longDoc(3))     // exact dup of doc 3 inside batch 1
    e.produceStrings("docs", 1, batch1)

    val q = prep(e.consumeStream("docs"))
      .writeStream.format("memory").queryName("corpus_prep").start()
    try {
      q.processAllAvailable()
      val streamed1 = spark.table("corpus_prep").collect()
      val expected1 = prep(e.read("docs")).collect()
      assert(streamed1.map(_.getAs[String]("fp")).toSet ==
        expected1.map(_.getAs[String]("fp")).toSet,
        "streaming and batch runs of the same pipeline must keep the same fingerprints")
      assert(streamed1.length == expected1.length)

      // a second micro-batch: new docs plus a re-send of doc 5's text — the
      // stream's dedup state must suppress the re-send, the batch run agrees
      e.produceStrings("docs", 1,
        (30 to 35).map(i => s"/docs/en/$i" -> longDoc(i)) :+
          ("/docs/en/redup" -> longDoc(5)))
      q.processAllAvailable()
      val streamed2 = spark.table("corpus_prep").collect()
      val expected2 = prep(e.read("docs")).collect()
      assert(streamed2.map(_.getAs[String]("fp")).toSet ==
        expected2.map(_.getAs[String]("fp")).toSet)
      assert(streamed2.map(_.getAs[String]("fp")).distinct.length == streamed2.length,
        "no fingerprint may be emitted twice across micro-batches")
    } finally q.stop()
  }
}
