package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/**
 * Bigram-LM scoring: the model math is pinned against a hand-computed
 * fixture, the fixed-point aggregation against partitioning (summation
 * order must not matter), and the score's discriminating power against a
 * corpus-distribution outlier (the CCNet use case).
 */
class LangModelSpec extends SparkSuite {

  import spark.implicits._

  test("hand-computed fixture: counts, smoothing, and the fixed-point mean") {
    // corpus: "a b a b" + "a c" →
    // bigrams: (a,b)x2 from doc1, (b,a)x1, (a,c)x1; c1(a)=3, c1(b)=1; V=3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = LangModel.bigramNll(docs).orderBy("doc_id").collect()
    val V = 3.0
    def nllFp(c12: Long, c1: Long): Long =
      math.round(-math.log((c12 + 1.0) / (c1 + V)) * 1e4)
    // doc1: bigrams (a,b),(b,a),(a,b) → c12: ab=2, ba=1
    val d1 = Seq(nllFp(2, 3), nllFp(1, 1), nllFp(2, 3))
    val exp1 = BigDecimal(d1.sum.toDouble / d1.size / 1e4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc2: one bigram (a,c), c12=1, c1(a)=3
    val exp2 = BigDecimal(nllFp(1, 3).toDouble / 1e4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getDouble(2) === exp1)
    assert(out(1).getLong(1) === 1L)
    assert(out(1).getDouble(2) === exp2)
  }

  test("stupid backoff: hand-computed three-tier ladder") {
    // model: "x y z x y z" -> trigrams (x,y,z)x2, (y,z,x)x1, (z,x,y)x1;
    // context counts c12t: (x,y)=2, (y,z)=1, (z,x)=1; bigrams (of the
    // model): (x,y)x2, (y,z)x2, (z,x)x1; unigrams: x=2,y=2,z=2 (N=6, V=3)
    val model = Seq((0L, "x y z x y z")).toDF("doc_id", "text")
    // probe doc "x y z q": trigrams (x,y,z) [tri hit], (y,z,q) [c23(z,q)
    // absent, c3(q) absent -> unigram floor]
    val probe = Seq((1L, "x y z q")).toDF("doc_id", "text")
    val out = LangModel.stupidBackoffNll(probe, model).collect()(0)
    assert(out.getLong(1) === 2L) // n_trigrams
    assert(out.getLong(2) === 1L) // tri_hits
    assert(out.getLong(3) === 0L) // bi_hits
    assert(out.getLong(4) === 1L) // uni_hits
    val fp1 = math.round(-math.log(2.0 / 2.0) * 1e4)            // c123=2 / c12t=2
    val fp2 = math.round(-math.log(0.4 * 0.4 * (1.0 / 9.0)) * 1e4) // (0+1)/(6+3)
    val exp = BigDecimal((fp1 + fp2).toDouble / 2 / 1e4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(5) === exp)

    // probe "y z x q": (y,z,x) tri hit; (z,x,q) -> backoff, c23(x,q)
    // absent -> unigram floor on q again; "z x y w": (z,x,y) tri hit,
    // (x,y,w) -> c23(y,w) absent -> floor. Bigram tier: probe (q, x, y):
    // trigram (q,x,y) absent, c23(x,y)=2, c2(x)=2 -> 0.4 * 2/2
    val probe2 = Seq((2L, "q x y")).toDF("doc_id", "text")
    val out2 = LangModel.stupidBackoffNll(probe2, model).collect()(0)
    assert(out2.getLong(3) === 1L, "expected the bigram tier to fire")
    val fpB = math.round(-math.log(0.4 * (2.0 / 2.0)) * 1e4)
    assert(out2.getDouble(5) ===
      BigDecimal(fpB.toDouble / 1e4).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("stupid backoff is partition-invariant and separates in-model from OOD docs") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val model = docs.filter(col("doc_id") % 2 === 0)
    val a = LangModel.stupidBackoffNll(docs, model).orderBy("doc_id").collect().toSeq
    val b = LangModel.stupidBackoffNll(docs.repartition(11), model.repartition(5))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    val (inM, ood) = a.partition(_.getLong(0) % 2 == 0)
    def meanNll(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(_.getDouble(5)).sum / rs.size
    assert(inM.forall(_.getLong(3) == 0L) && inM.forall(_.getLong(4) == 0L),
      "in-model docs must be pure trigram hits")
    assert(meanNll(ood) > meanNll(inM) + 0.5,
      "backoff must cost OOD docs visibly more than in-model docs")
  }

  test("scores are invariant to input partitioning (exact-integer aggregation)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = LangModel.bigramNll(docs).orderBy("doc_id").collect().toSeq
    val b = LangModel.bigramNll(docs.repartition(13)).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("an out-of-distribution document scores a higher NLL than in-distribution text") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // UNSEEN CONTINUATIONS of the corpus's most common heads — the bigrams
    // add-one smoothing punishes hardest (P = 2/(c1_head + V) with a huge
    // c1). A doc of purely fresh words would NOT work: singleton heads make
    // 1/(1+V) look deceptively probable under add-one.
    val weird = Seq((999999L,
      "scan qx1 column qx2 window qx3 order qx4 sort qx5 part qx6 agg qx7 value qx8"))
      .toDF("doc_id", "text")
    val scored = LangModel.bigramNll(real.unionByName(weird))
    val weirdNll = scored.filter(col("doc_id") === 999999L).head().getDouble(2)
    val meanReal = scored.filter(col("doc_id") =!= 999999L)
      .agg(avg("nll")).head().getDouble(0)
    assert(weirdNll > meanReal + 0.5,
      s"unseen-continuation nll $weirdNll should clear the corpus mean $meanReal")
  }

  test("frozen model: persistence round-trips bit-exactly and smooths unseen bigrams") {
    val path = tempDir("graft-lm") + "/model"
    val train = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    LangModel.writeModel(train, path)
    assert(LangModel.modelExists(spark, path))
    // self-scoring against the persisted model == the on-the-fly path
    val live = LangModel.bigramNll(train).orderBy("doc_id").collect().toSeq
    val frozen = LangModel.scoreAgainst(train, path).orderBy("doc_id").collect().toSeq
    assert(frozen === live)
    // a NEW doc with bigrams the model never saw still scores (worst-case
    // smoothing P = 1/V), and scores WORSE than one made of seen bigrams
    val fresh = Seq(
      (1L, "totally unseen wordage everywhere believe me"),
      (2L, "scan scan scan scan scan")).toDF("doc_id", "text")
    val scored = LangModel.scoreAgainst(fresh, path).orderBy("doc_id").collect()
    assert(scored.length === 2, "unseen bigrams must not drop rows")
    assert(scored(0).getLong(1) === 5L)
    assert(scored(0).getDouble(2) > scored(1).getDouble(2),
      "all-unseen text must score a higher NLL than common-bigram text")
  }

  test("mergeModels: merge(train(A), train(B)) scores bit-identically to train(A ∪ B)") {
    val root = tempDir("graft-lm-merge")
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    LangModel.writeModel(a, s"$root/a")
    LangModel.writeModel(b, s"$root/b")
    LangModel.mergeModels(spark, s"$root/a", s"$root/b", s"$root/ab")
    assert(LangModel.modelExists(spark, s"$root/ab"))
    // exact integers all the way down: counts sum, vocab unions, so the
    // merged model must reproduce the union-trained scores EXACTLY
    val merged = LangModel.scoreAgainst(docs, s"$root/ab")
      .orderBy("doc_id").collect().toSeq
    val direct = LangModel.bigramNll(docs).orderBy("doc_id").collect().toSeq
    assert(merged === direct)
    // V sanity: merged V is the distinct union, NOT the sum of parts
    val vA = spark.read.parquet(s"$root/a/meta").head().getLong(0)
    val vB = spark.read.parquet(s"$root/b/meta").head().getLong(0)
    val vAB = spark.read.parquet(s"$root/ab/meta").head().getLong(0)
    assert(vAB < vA + vB, "shared vocabulary must collapse in the merge")
    assert(vAB >= math.max(vA, vB))
  }

  test("hybrid head/tail count join: split changes no scores; head rides a broadcast") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val (c12, c1, vocab) = LangModel.trainCounts(docs)
    val pureShuffle = LangModel.scoreWith(docs, c12, c1, vocab, headK = 0)
      .orderBy("doc_id").collect().toSeq
    val hybrid = LangModel.scoreWith(docs, c12, c1, vocab, headK = 64)
      .orderBy("doc_id").collect().toSeq
    // which keys land in the head must never change a value — the
    // exact-integer NLL makes this assertable bit-for-bit
    assert(hybrid === pureShuffle)
    val plan = LangModel.scoreWith(docs, c12, c1, vocab, headK = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("streaming scoring: micro-batches against the frozen model equal the batch scores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val path = tempDir("graft-lm-stream") + "/model"
    val train = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    LangModel.writeModel(train, path)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= LangModel.scoreAgainst(batch, path).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }
        ()
      }
    val rows = train.limit(30).collect().map(r => (r.getLong(0), r.getString(1)))
    in.addData(rows.take(15).toSeq)
    in.addData(rows.drop(15).toSeq)
    val query = q.start()
    query.awaitTermination(60000)
    val expected = LangModel.scoreAgainst(
        spark.createDataFrame(rows.toSeq).toDF("doc_id", "text"), path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.toSet === expected)
  }

  test("hard negatives never share the query's label and rank densely from 1") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"), col("label"))
    val out = Ann.hardNegatives(emb, emb.filter(col("id") < 5), k = 3)
    val labels = emb.select(col("id"), col("label"))
    val joined = out
      .join(labels.select(col("id").as("query_id"), col("label").as("ql")), "query_id")
      .join(labels.select(col("id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
    assert(joined.filter(col("ql") === col("nl")).isEmpty,
      "a hard negative shared its query's label")
    val ranks = out.groupBy("query_id")
      .agg(sort_array(collect_list("rank")).as("rs"))
      .select("rs").collect().map(_.getSeq[Int](0))
    assert(ranks.nonEmpty && ranks.forall(_ == Seq(1, 2, 3)))
  }
}
