package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * CDC chunker invariants. The downstream dedup math is hash-checked by
 * `pipe_cdc_dedup`'s fixture oracle; this spec pins the KERNEL — span
 * well-formedness, the re-synchronization property that justifies CDC
 * over fixed-size chunking, full-copy dedup, and determinism.
 */
class CdcChunkerSpec extends SparkSuite {

  import spark.implicits._

  /** Aperiodic word stream — chunk-length word sequences never repeat
    * within or across seeds, so intra-doc dups can't confound the
    * cross-doc assertions (the first-occurrence rule counts BOTH). */
  private def lorem(seed: Int, n: Int): String =
    (0 until n).map { i =>
      val v = i.toLong * 2654435761L + seed.toLong * 1013904223L
      "w" + java.lang.Long.toHexString((v ^ (v >>> 17)) & 0xffffffL)
    }.mkString(" ")

  test("spans are contiguous, cover the text, and respect min/max") {
    val t = lorem(1, 400)
    val spans = CdcChunker.chunkSpans(t, 32, 192, 31L)
    assert(spans.head._1 === 0)
    spans.sliding(2).foreach {
      case Seq((s1, l1), (s2, _)) => assert(s1 + l1 === s2, "gap or overlap")
      case _ =>
    }
    val (ls, ll) = spans.last
    assert(ls + ll === t.length, "spans must cover the text")
    spans.dropRight(1).foreach { case (_, l) =>
      assert(l >= 32 && l <= 192, s"interior chunk length $l out of bounds")
    }
    assert(spans.map { case (s, l) => t.substring(s, s + l) }.mkString === t,
      "reassembly must reproduce the text")
  }

  test("boundaries re-synchronize after a head insertion (the CDC property)") {
    val a = lorem(2, 600)
    val b = "zq inserted preamble " + a
    def hashes(t: String) =
      CdcChunker.chunkSpans(t, 32, 192, 31L)
        .map { case (s, l) => t.substring(s, s + l) }.toSet
    val ha = hashes(a)
    val shared = ha.intersect(hashes(b)).size.toDouble / ha.size
    // every byte of b is shifted relative to a — fixed-size chunking
    // would share ZERO chunks; the gear hash realigns within ~1 chunk
    assert(shared >= 0.6,
      f"expected the shifted copy to share most chunks, got $shared%.2f")
  }

  test("an exact duplicate document dedups fully; unique docs do not") {
    val docs = Seq(
      (1L, lorem(3, 300)), (2L, lorem(4, 300)), (3L, lorem(3, 300))
    ).toDF("doc_id", "text")
    val stats = CdcChunker.cdcDedup(docs).orderBy("doc_id").collect()
    val byId = stats.map(r => r.getLong(0) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 3 duplicates doc 1: every chunk already occurred
    assert(byId(3L)._2 === byId(3L)._3, s"full copy must be 100% dup: $byId")
    assert(byId(1L)._2 === 0L, s"first occurrence carries no dups: $byId")
    assert(byId(2L)._2 === 0L, s"unique doc carries no dups: $byId")
  }

  test("chunking is deterministic and partition-invariant") {
    val docs = (0L until 50L).map(i => (i, lorem(i.toInt, 200))).toDF("doc_id", "text")
    val a = CdcChunker.chunkTable(docs).orderBy("doc_id", "start").collect().toSeq
    val b = CdcChunker.chunkTable(docs.repartition(7)).orderBy("doc_id", "start").collect().toSeq
    assert(a === b)
  }

  test("rewrite drops duplicate chunks and reassembles survivors in order") {
    val a = lorem(7, 300)
    val docs = Seq((1L, a), (2L, lorem(8, 300)), (3L, a)).toDF("doc_id", "text")
    val out = CdcChunker.dedupRewrite(docs, CdcChunker.chunkTable(docs))
      .orderBy("doc_id").collect()
    // unique docs reassemble bit-exact; the full copy rewrites to empty
    assert(out(0).getAs[String]("clean_text") === a)
    assert(out(1).getAs[String]("clean_text") === lorem(8, 300))
    assert(out(2).getAs[String]("clean_text") === "")
    assert(out(2).getLong(2) === 0L, "no chunk of the copy survives")
    assert(out(0).getLong(1) === out(0).getLong(2), "first occurrence keeps all")
  }

  test("incremental replay in id order equals the batch operator exactly") {
    // 30 docs with planted duplication: 10 unique, 10 copies of earlier
    // docs, 10 unique — split into 3 ordered micro-batches
    val all = ((0L until 10L).map(i => (i, lorem(i.toInt, 120))) ++
      (10L until 20L).map(i => (i, lorem((i - 10).toInt, 120))) ++
      (20L until 30L).map(i => (i, lorem(i.toInt + 100, 120)))).toDF("doc_id", "text")
    val batch = CdcChunker.cdcDedup(all).orderBy("doc_id").collect().toSeq

    var index = spark.emptyDataFrame.sparkSession
      .createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h",
            org.apache.spark.sql.types.StringType))))
    val replayed = (0 until 3).flatMap { b =>
      val docs = all.filter(col("doc_id") >= b * 10 && col("doc_id") < (b + 1) * 10)
      val out = CdcChunker.incrementalStats(docs, index).collect().toSeq
      index = index.union(CdcChunker.cdcIndex(docs)).distinct()
        .localCheckpoint(true)
      out
    }.sortBy(_.getLong(0))
    assert(replayed === batch,
      "ordered micro-batch replay must reproduce the batch verdicts")
    // and the planted copies are fully dup under BOTH paths
    assert(batch.filter(r => r.getLong(0) >= 10 && r.getLong(0) < 20)
      .forall(r => r.getLong(3) === r.getLong(4)))
  }

  test("dedup stats plan: hash-keyed aggregate + join, no cartesian") {
    val docs = (0L until 20L).map(i => (i, lorem(i.toInt, 100))).toDF("doc_id", "text")
    val plan = CdcChunker.cdcDedup(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }
}
