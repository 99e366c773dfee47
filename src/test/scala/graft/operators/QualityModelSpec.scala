package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/**
 * Trained-quality-classifier invariants. The cross-engine scoring math is
 * hash-checked by `text_quality_model`'s DuckDB oracle; this spec pins
 * the LEARNING behavior — the regression actually distills the rule
 * battery — plus exact statistics merging (incremental training),
 * determinism, and the persistence round trip.
 */
class QualityModelSpec extends SparkSuite {

  private def docs(sf: String): DataFrame =
    Tables.load(spark, s"/root/testdata/$sf", "documents")

  test("classifier distills the rule battery: accuracy >= 0.8, scores separate labels") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val d = docs(sf)
      val scored = QualityModel.score(d, QualityModel.train(d).toSeq)
      val n = scored.count().toDouble
      val agree = scored.filter(col("predicted") === col("label")).count().toDouble
      assert(agree / n >= 0.8, s"$sf: accuracy ${agree / n} below the 0.8 bar")
      val means = scored.groupBy("label").agg(avg(col("score_fp")).as("m"))
        .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
      // graded separation is the real product (the filter is used as a
      // ranker); require a wide margin, not just ordering
      assert(means(true) - means(false) > 0.2e12,
        s"$sf: label means too close: $means")
    }
  }

  test("training is deterministic under repartitioning") {
    val d = docs("sf0.001")
    val a = QualityModel.train(d)
    val b = QualityModel.train(d.repartition(13))
    assert(a.toSeq === b.toSeq,
      "exact DECIMAL statistics must make training partition-invariant")
  }

  test("merged statistics train the identical model (incremental training)") {
    val d = docs("sf0.001")
    val partA = d.filter(col("doc_id") % 2 === 0)
    val partB = d.filter(col("doc_id") % 2 =!= 0)
    val merged = QualityModel.trainFromStats(
      QualityModel.mergeStats(
        QualityModel.stats(partA), QualityModel.stats(partB)))
    val whole = QualityModel.train(d)
    assert(merged.toSeq === whole.toSeq,
      "merge(stats(A), stats(B)) must equal stats(A ∪ B) bit-for-bit")
  }

  test("persisted model scores identically to the in-memory path") {
    val d = docs("sf0.001")
    val path = tempDir("qm")
    val w = QualityModel.writeModel(d, path)
    val direct = QualityModel.score(d, w.toSeq).orderBy("doc_id").collect().toSeq
    val persisted = QualityModel.scoreAgainst(d, path).orderBy("doc_id").collect().toSeq
    assert(direct === persisted)
  }

  test("ensureModel trains once per corpus identity and self-heals stale layouts") {
    import spark.implicits._
    val d = docs("sf0.001")
    val path = tempDir("qm-ensure")
    // cold: trains and commits
    assert(!QualityModel.modelCurrent(spark, path, "corpusA"))
    QualityModel.ensureModel(d, path, identity = "corpusA")
    assert(QualityModel.modelCurrent(spark, path, "corpusA"))
    val w1 = QualityModel.readWeights(d, path)
    // warm, same identity: must NOT retrain — prove it by planting a
    // sentinel weights row that training would overwrite
    val sentinel = Array.fill(QualityModel.D)(7L)
    Seq(Tuple6(7L, 7L, 7L, 7L, 7L, 7L))
      .toDF((0 until QualityModel.D).map(i => s"w_$i"): _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/weights")
    QualityModel.ensureModel(d, path, identity = "corpusA")
    assert(QualityModel.readWeights(d, path).toSeq === sentinel.toSeq,
      "warm ensure with a matching identity must skip training")
    // different identity: retrains (the sentinel is replaced by real weights)
    QualityModel.ensureModel(d, path, identity = "corpusB")
    assert(QualityModel.readWeights(d, path).toSeq === w1.toSeq,
      "identity drift must retrain on the new corpus")
    assert(!QualityModel.modelCurrent(spark, path, "corpusA"))
    // pre-identity meta layout (no identity column): reads as not-current,
    // ensure retrains instead of erroring
    spark.read.parquet(s"$path/meta").select("d", "lambda", "format_version")
      .write.mode("overwrite").parquet(s"$path/meta2")
    spark.read.parquet(s"$path/meta2")
      .write.mode("overwrite").parquet(s"$path/meta")
    assert(!QualityModel.modelCurrent(spark, path, "corpusB"))
    QualityModel.ensureModel(d, path, identity = "corpusB")
    assert(QualityModel.modelCurrent(spark, path, "corpusB"))
  }

  test("streaming scoring: micro-batches against the persisted model equal batch scores") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val path = tempDir("qm-stream") + "/model"
    val train = docs("sf0.001").select("doc_id", "text")
    QualityModel.writeModel(train, path)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= QualityModel.scoreAgainst(batch, path).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        }
        ()
      }
    val rows = train.limit(30).collect().map(r => (r.getLong(0), r.getString(1)))
    in.addData(rows.take(15).toSeq)
    in.addData(rows.drop(15).toSeq)
    val query = q.start()
    query.awaitTermination(60000)
    val expected = QualityModel.scoreAgainst(
        spark.createDataFrame(rows.toSeq).toDF("doc_id", "text"), path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got.toSet === expected,
      "per-batch scoring against the frozen weights must equal the batch path")
  }

  test("scoring plan has no shuffle at all, no join, no collect") {
    val d = docs("sf0.001")
    val w = QualityModel.train(d)
    val plan = QualityModel.score(d, w.toSeq).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"scoring must be a stateless projection over per-doc features:\n$plan")
    // the HOF feature extraction is a narrow map: scoring an entire
    // corpus must plan ZERO exchanges (the former explode + double
    // groupBy paid two corpus-sized shuffles for per-doc-local facts)
    assert(!plan.contains("Exchange"),
      s"per-doc feature scoring must be shuffle-free:\n$plan")
  }

  test("HOF features are bit-identical to the exploded groupBy formulation") {
    // the r13 rewrite derives every per-doc statistic from the token
    // array (no shuffle); this pins it against the original explode →
    // groupBy(doc_id, tok) → groupBy(doc_id) reference, column by column
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val d = docs(sf)
      val stop = Seq("the", "a", "of", "and", "to", "in")
      val wc = d.select(col("doc_id"),
          explode(split(trim(col("text")), " +")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val ref = wc.groupBy("doc_id").agg(
          sum("c").as("n_words"),
          sum(length(col("tok")) * col("c")).as("sum_len"),
          count(lit(1)).as("n_distinct"),
          max("c").as("top_c"),
          sum(when(col("tok").isin(stop: _*), col("c")).otherwise(0L)).as("n_stop"))
        .select(col("doc_id"),
          lit(10000L).as("f0"),
          (least(col("n_words"), lit(1000L)) * 10).as("f1"),
          expr("sum_len * 10000 div n_words").as("f2"),
          expr("top_c * 10000 div n_words").as("f3"),
          expr("(n_words - n_distinct) * 10000 div n_words").as("f4"),
          expr("n_stop * 10000 div n_words").as("f5"),
          (col("n_words").between(20L, 100000L) &&
            expr("sum_len * 10000 div n_words").between(30000L, 100000L) &&
            expr("top_c * 10000 div n_words") <= 2000L &&
            expr("(n_words - n_distinct) * 10000 div n_words") <= 5000L &&
            col("n_stop") >= 2L).as("label"))
        .orderBy("doc_id").collect().toSeq
      val got = QualityModel.features(d).orderBy("doc_id").collect().toSeq
      assert(got === ref, s"$sf: HOF features diverge from the exploded reference")
    }
  }
}
