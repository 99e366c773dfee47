package graft.operators

import graft.SparkSuite

/** JSONL corpus interchange: round-trip, drift tolerance, corruption audit. */
class CorpusIOSpec extends SparkSuite {

  test("write -> read round-trips a documents frame exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world", "en", "web"),
      (2L, "hola", "es", "books"),
      (3L, null.asInstanceOf[String], "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = tempDir("jsonl-rt")
    CorpusIO.writeJsonl(docs, dir, numFiles = 2)
    val back = CorpusIO.readJsonl(spark, dir)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      docs.collect().map(_.toString).sorted.toSeq)
  }

  test("unknown fields are ignored, missing ones are null, corrupt lines audited") {
    val dir = tempDir("jsonl-drift")
    val lines = Seq(
      """{"doc_id": 1, "text": "a", "lang": "en", "source": "web", "extra": 9}""",
      """{"doc_id": 2, "text": "b"}""",
      """not json at all""",
      """{"doc_id": 3""", // truncated
      "")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val df = CorpusIO.readJsonl(spark, dir)
    val good = df.filter(df("doc_id").isNotNull).collect()
    assert(good.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(good.find(_.getLong(0) == 2L).get.isNullAt(2)) // lang null
    assert(CorpusIO.countCorrupt(spark, dir) == 2)
    // strict mode refuses the corrupt dump outright
    intercept[org.apache.spark.SparkException] {
      CorpusIO.readJsonl(spark, dir, strict = true).collect()
    }
  }
}
