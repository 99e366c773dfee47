package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * DSIR importance-resampling invariants. The cross-engine arithmetic
 * (md5 buckets, fixed-point log ratios, Gumbel keys) is hash-checked by
 * `pipe_dsir_sample`'s full DuckDB oracle; this spec pins the STATISTICAL
 * behavior — selection actually skews toward the target distribution —
 * plus determinism, the top-k contract, and the broadcast plan shape.
 */
class DsirSpec extends SparkSuite {

  import spark.implicits._

  /** Two disjoint-vocabulary registers: "science" docs vs "chat" docs. */
  private def corpus(nSci: Int, nChat: Int): DataFrame = {
    val sci = (0 until nSci).map { i =>
      (i.toLong, s"quantum flux lattice spectra entropy tensor field $i boson decay", "sci")
    }
    val chat = (0 until nChat).map { i =>
      ((1000 + i).toLong, s"lol okay haha whatever brb gonna wanna dunno $i yeah nope", "chat")
    }
    (sci ++ chat).toDF("doc_id", "text", "register")
  }

  test("selection skews toward the target register") {
    val raw = corpus(60, 60)
    val target = corpus(8, 0).select(col("doc_id") + 5000, col("text"), col("register"))
      .toDF("doc_id", "text", "register")
    val sel = Dsir.select(raw, target, k = 30, buckets = 512)
      .join(raw.select("doc_id", "register"), "doc_id")
    val kept = sel.filter(col("kept")).groupBy("register").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 30 slots over 60+60 docs: science docs dominate because their grams
    // match the target's buckets; the Gumbel noise (sigma ~1.3 on weights
    // separated by tens of log units) cannot flip the bulk
    assert(kept.getOrElse("sci", 0L) >= 25,
      s"expected the science register to dominate the sample, got $kept")
  }

  test("weights separate the registers with the right sign") {
    val raw = corpus(50, 50)
    val target = corpus(10, 0)
    val w = Dsir.importanceWeights(raw, target, buckets = 512)
      .join(raw.select("doc_id", "register"), "doc_id")
      .groupBy("register").agg(avg(col("weight_fp")).as("mean_w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // absolute sign is NOT asserted: with a small target, add-one
    // smoothing over `buckets` cells drags every estimated p_t down, so
    // even target-like docs can carry negative log ratios — only the
    // SEPARATION between registers is the operative property (and only
    // relative weights matter to a top-k resample)
    assert(w("sci") > w("chat"),
      s"target-like docs must outweigh off-target docs: $w")
    assert(w("sci") - w("chat") > 1e5,
      s"registers with disjoint vocabulary should separate by many log units: $w")
  }

  test("resample keeps exactly k docs and is deterministic under repartitioning") {
    val raw = corpus(40, 40)
    val target = corpus(6, 0)
    val a = Dsir.select(raw, target, k = 17, buckets = 256)
    val b = Dsir.select(raw.repartition(7), target.repartition(3), k = 17, buckets = 256)
    assert(a.filter(col("kept")).count() === 17L)
    val ra = a.orderBy("doc_id").collect().toSeq
    val rb = b.orderBy("doc_id").collect().toSeq
    assert(ra === rb, "weights/selection must not depend on input partitioning")
  }

  test("k >= corpus size keeps everything; weight table covers every doc") {
    val raw = corpus(10, 10)
    val target = corpus(3, 0)
    val sel = Dsir.select(raw, target, k = 100, buckets = 128)
    assert(sel.count() === 20L)
    assert(sel.filter(col("kept")).count() === 20L)
  }

  test("streaming: micro-batches against the frozen ratio table equal batch weights") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val raw = corpus(40, 40)
    val target = corpus(6, 0)
    val ratios = Dsir.ratioTable(raw, target, buckets = 256)
      .localCheckpoint(true) // freeze: the model artifact a pipeline persists
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= Dsir.scoreWithRatios(batch, ratios, buckets = 256).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }
    val rows = raw.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    in.addData(rows.take(40).toSeq)
    in.addData(rows.drop(40).toSeq)
    val query = q.start()
    query.awaitTermination(60000)
    val expected = Dsir.importanceWeights(raw, target, buckets = 256).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSet === expected,
      "stream-static scoring against frozen ratios must equal the batch weights")
  }

  test("plan: ratio lookup is a broadcast join, no cartesian on the gram stream") {
    val raw = corpus(20, 20)
    val target = corpus(4, 0)
    val plan = Dsir.importanceWeights(raw, target, buckets = 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected the <=buckets-row ratio table to broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"gram scoring must never cross-join:\n$plan")
  }
}
