package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Scale techniques: salted skew joins, bucketed co-located joins, and the
  * as-of / range join library operators (exercised here on table pairs the
  * catalog queries never touch, the way the reference's embedded tests drive
  * the client API surface — flo-server/tests/embedded_tests.rs:168-200). */
class ScaleOpsSpec extends SparkSuite {

  test("asof join: at-or-before semantics, tie-breaks, and null on no-match") {
    import spark.implicits._
    // sensors (left) against calibrations (right) — a second table pair
    val readings = Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 15L),
      (4L, "b", 10L), (5L, "c", 3L)).toDF("reading_id", "sensor", "t")
    val cals = Seq(
      (100L, "a", 5L, 1.5), (101L, "a", 12L, 2.5),
      (102L, "a", 12L, 3.5), // same instant as 101: higher cal_id must win
      (103L, "b", 11L, 9.9)  // after b's only reading: no match
    ).toDF("cal_id", "sensor", "t", "gain")

    val got = AsofJoin.asof(readings, cals, "t", "t", by = Seq("sensor"),
        valueCols = Seq("cal_id", "gain"), rightOrder = Seq("cal_id"))
      .collect().map(r => r.getAs[Long]("reading_id") ->
        (Option(r.getAs[java.lang.Long]("asof_cal_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_gain")).map(_.toDouble))).toMap

    assert(got(1L) == ((Some(100L), Some(1.5)))) // exactly-at counts
    assert(got(2L) == ((Some(100L), Some(1.5)))) // most recent before
    assert(got(3L) == ((Some(102L), Some(3.5)))) // equal-time tie -> last by cal_id
    assert(got(4L) == ((None, None)))            // calibration only after
    assert(got(5L) == ((None, None)))            // sensor never calibrated
    // every left row survives, with all its columns intact
    assert(got.size == 5)
  }

  test("asof join: NULL right times match nothing (SQL comparison semantics)") {
    import spark.implicits._
    val readings = Seq((1L, "a", 5L)).toDF("reading_id", "sensor", "t")
    // one NULL-time calibration and one later real one: the reading must get
    // a null match, not the NULLS-FIRST row masquerading as "before everything"
    val cals = Seq(
      (100L, "a", Option.empty[Long], 9.9),
      (101L, "a", Option(7L), 1.0)).toDF("cal_id", "sensor", "t", "gain")
    val got = AsofJoin.asof(readings, cals, "t", "t", by = Seq("sensor"),
        valueCols = Seq("cal_id", "gain"), rightOrder = Seq("cal_id"))
      .collect()
    assert(got.length == 1)
    assert(got.head.isNullAt(got.head.fieldIndex("asof_cal_id")),
      s"NULL-time right row matched: ${got.head}")
  }

  test("asof join matches a brute-force reference on a generated pair") {
    import spark.implicits._
    // deterministic pseudo-random pair; brute-force the expected answer
    def h(i: Int, salt: Int) = math.abs((i * 2654435761L + salt) % 97)
    val lefts = (1 to 300).map(i => (i.toLong, (i % 7).toString, h(i, 13)))
    val rights = (1 to 120).map(i => (1000L + i, (i % 7).toString, h(i, 41), i * 0.5))
    val expected = lefts.map { case (id, k, t) =>
      val cands = rights.filter(r => r._2 == k && r._3 <= t)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._3, r._1))._1))
    }.toMap
    val got = AsofJoin.asof(
        lefts.toDF("id", "k", "t"), rights.toDF("rid", "k", "t", "v"),
        "t", "t", by = Seq("k"), valueCols = Seq("rid", "v"),
        rightOrder = Seq("rid"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
    assert(got == expected)
  }

  test("range join: boundary semantics, negatives, and shuffle fallback parity") {
    import spark.implicits._
    val points = Seq((1L, -30.0), (2L, 0.0), (3L, 9.99), (4L, 10.0), (5L, 25.0))
      .toDF("pid", "x")
    val intervals = Seq(
      (10L, -40.0, -20.0), // catches the negative point
      (11L, 0.0, 10.0),    // lo inclusive, hi exclusive
      (12L, 5.0, 30.0)     // overlaps 11
    ).toDF("iv_id", "lo", "hi")

    def pairs(broadcastIv: Boolean) = RangeJoin.pointInInterval(
        points, "x", intervals, "lo", "hi", bucketWidth = 10.0,
        broadcastIntervals = broadcastIv)
      .select("pid", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val expected = Set((1L, 10L), (2L, 11L), (3L, 11L), (3L, 12L), (4L, 12L), (5L, 12L))
    assert(pairs(broadcastIv = true) == expected)
    // the non-broadcast (shuffle) path returns the identical pair set
    assert(pairs(broadcastIv = false) == expected)
  }

  test("connectedComponents labels chains and singleton-free pairs correctly") {
    import spark.implicits._
    // two components: a 4-node chain (1-2-3-4) and a 2-node pair (10-11);
    // the chain forces multiple propagation rounds (diameter 3)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = CorpusOps.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[Long]("n_members"))).toMap
    assert(got == Map(
      1L -> (1L, 4L), 2L -> (1L, 4L), 3L -> (1L, 4L), 4L -> (1L, 4L),
      10L -> (10L, 2L), 11L -> (10L, 2L)))
  }

  test("dedupKeepSet keeps the cluster minimum and every unpaired doc") {
    import spark.implicits._
    val docs = (1L to 5L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = CorpusOps.dedupKeepSet(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true, 5L -> true))
  }

  test("dedupKeepBest keeps the highest score per cluster, ties to lowest id") {
    import spark.implicits._
    // cluster {1,2,3}: 2 has max n_chars -> kept; cluster {10,11}: tie on
    // n_chars -> lowest id 10 kept; 5 is a singleton -> kept, null component
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 20L), (10L, 7L), (11L, 7L),
      (5L, 1L)).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = CorpusOps.dedupKeepBest(docs, pairs, "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Long]("component")), r.getAs[Boolean]("kept")))
      .toMap
    assert(got == Map(
      1L -> (Some(1L), false), 2L -> (Some(1L), true), 3L -> (Some(1L), false),
      10L -> (Some(10L), true), 11L -> (Some(10L), false),
      5L -> (None, true)))
  }

  test("dedupKeepBest matches an independent union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40
      val docs = (1L to n).map(i => (i, rnd.nextInt(50).toLong))
      val edges = Seq.fill(25)((rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L))
        .filter(p => p._1 != p._2)
      // independent model: plain union-find
      val parent = Array.tabulate(n.toInt + 1)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val score = docs.toMap
      val expectKept = (1L to n).groupBy(i => find(i.toInt))
        .values.map(_.maxBy(i => (score(i), -i))).toSet
      val got = CorpusOps.dedupKeepBest(
          docs.toDF("doc_id", "n_chars"),
          edges.toDF("doc_a", "doc_b"), "n_chars")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept"))
      assert(got.length == n, s"trial $trial: row count")
      assert(got.filter(_._2).map(_._1).toSet == expectKept,
        s"trial $trial: kept set diverged from union-find model")
    }
  }

  test("shard-plan nibble assignment partitions the corpus completely") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"s${i % 7}", i % 91)).toDF(
      "doc_id", "source", "n_chars")
    val assigned = docs
      .select(col("doc_id"), graft.operators.CorpusOps.shardNibble(
          graft.operators.CorpusOps.shardHash(col("doc_id"))).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(assigned.length == 400)
    assert(assigned.forall { case (_, s) => s >= 0 && s <= 15 },
      "shard outside 0..15")
    // pure function of doc_id: recomputation agrees
    val again = docs.select(col("doc_id"),
        graft.operators.CorpusOps.shardNibble(
          graft.operators.CorpusOps.shardHash(col("doc_id"))).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(assigned.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("decontaminate flags overlap against a SEPARATE eval table") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares both eval 5-grams
      (2L, "one two three four five six"),         // clean
      (3L, "zz alpha beta gamma delta epsilon")    // shares one
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val hits = CorpusOps.decontaminate(train, eval)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 2L, 3L -> 1L), s"got $hits")
  }

  test("exactDedup and normalizedDedup group copies under the minimum id") {
    import spark.implicits._
    val docs = Seq(
      (5L, "Hello, World!"), (2L, "Hello, World!"), (9L, "hello world"),
      (7L, "unique text here")).toDF("doc_id", "text")
    val exact = CorpusOps.exactDedup(docs).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(exact == Map(2L -> 2L, 9L -> 1L, 7L -> 1L))
    // normalization folds punctuation/case: all three hellos collapse
    val norm = CorpusOps.normalizedDedup(docs).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(norm == Map(2L -> 3L, 7L -> 1L))
  }

  test("salted join produces identical results to a plain join") {
    import spark.implicits._
    // heavily skewed big side: 90% of rows share key 1
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i % 7 else 1, i))
      .toDF("k", "payload")
    val small = (0 until 7).map(k => (k, s"dim$k")).toDF("sk", "name")

    val plain = big.join(small, $"k" === $"sk").select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(big, small, $"k", $"sk",
      saltBy = Seq($"payload"), salt = 8).select("k", "payload", "name")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the salt spreads the hot key over multiple values
    val spread = big.withColumn("__salt", pmod(hash($"payload"), lit(8)))
      .filter($"k" === 1).select("__salt").distinct().count()
    assert(spread == 8, s"hot key only spread over $spread salts")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val s = spark
    import s.implicits._
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = graft.Tables.load(s, "/root/testdata/sf0.001", "orders")
      orders.write.mode("overwrite").bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      val li = graft.Tables.load(s, "/root/testdata/sf0.001", "lineitem")
      li.write.mode("overwrite").bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = s.table("lineitem_b")
        .join(s.table("orders_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed co-located join: no Exchange feeding the SortMergeJoin
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count())
    } finally {
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("nearDupPairsMinhash finds planted near-dups on a fresh table and honors the threshold") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base),                        // exact dup of 1
      (3L, base + " ok"),                // near dup of 1
      (4L, "completely different words about spark shuffles and parquet files")
    ).toDF("doc_id", "text")
    val pairs = CorpusOps.nearDupPairsMinhash(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup must surface: $pairs")
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"4 is no near-dup: $pairs")
    // a 1.0 threshold keeps only the exact dup
    val strict = CorpusOps.nearDupPairsMinhash(docs, threshold = 1.0).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(strict == Set((1L, 2L)), s"got $strict")
  }

  test("Ann operators on a fresh table: brute is exact, LSH finds planted twins, pairs verify") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 40 random vectors plus a planted twin of vector 0 (id 99)
    val vs = (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextGaussian())))
    val twin = (99L, vs.head._2.map(x => x * 1.0001))
    val emb = (vs :+ twin).toDF("id", "v")
    val brute = Ann.knnBrute(emb, emb.filter($"id" === 0), k = 3).collect()
    assert(brute.head.getAs[Long]("neighbor_id") == 99L, "the twin must rank first")
    assert(brute.map(_.getAs[Int]("rank")).toSeq.sorted == Seq(1, 2, 3))
    val lsh = Ann.knnLsh(emb, emb.filter($"id" === 0), k = 3, dim = 64).collect()
    assert(lsh.head.getAs[Long]("neighbor_id") == 99L,
      "a 1.0001-scaled twin shares every sign bit: LSH must find it at rank 1")
    val pairs = Ann.nearDupPairsCosine(emb, dim = 64, threshold = 0.99).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((0L, 99L)), s"got $pairs")
  }

  test("IVF Lloyd rounds are monotone: mean assigned cosine never decreases") {
    graft.expressions.GraftExtensions.register(spark)
    val u = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), expr("graft_unit(v)").as("uv"))
    def objective(iters: Int): Double =
      Ann.ivfAssign(u, Ann.ivfCentroids(u, cells = 16, iters = iters))
        .agg(avg("cs")).head.getDouble(0)
    val objs = (0 to 2).map(objective)
    // spherical k-means: both Lloyd half-steps improve the objective
    assert(objs(1) >= objs(0) - 1e-9, s"round 1 regressed: $objs")
    assert(objs(2) >= objs(1) - 1e-9, s"round 2 regressed: $objs")
    assert(objs(2) > objs(0), s"two rounds must actually move: $objs")
  }

  test("substringDedup measures planted overlaps exactly and honors cap/threshold") {
    import spark.implicits._
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val shared12 = words("s", 12)   // planted 12-token overlap
    val shared7 = words("x", 7)     // planted 7-token overlap (below minTokens=10)
    val docs = Seq(
      (1L, s"${words("a", 20)} $shared12 ${words("b", 9)}"),
      (2L, s"${words("c", 5)} $shared12 ${words("d", 30)}"),
      (3L, s"${words("e", 8)} $shared7 ${words("f", 11)}"),
      (4L, s"$shared7 ${words("g", 25)}"),
      (5L, words("h", 40))).toDF("doc_id", "text")
    val got = CorpusOps.substringDedup(docs, minTokens = 10).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("overlap_tokens")).toMap
    // the 12-token overlap is measured EXACTLY; the 7-token one is under bar
    assert(got == Map((1L, 2L) -> 12L), s"got $got")
    // lowering the bar surfaces the 7-token overlap, exactly measured
    val low = CorpusOps.substringDedup(docs, minTokens = 7).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("overlap_tokens")).toMap
    assert(low == Map((1L, 2L) -> 12L, (3L, 4L) -> 7L), s"got $low")
    // an overlap split by one divergent token reports the LONGER side only
    val split = Seq(
      (10L, s"${words("p", 6)} DIFF ${words("q", 11)}"),
      (11L, s"${words("p", 6)} OTHER ${words("q", 11)}")).toDF("doc_id", "text")
    val sp = CorpusOps.substringDedup(split, minTokens = 10).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("overlap_tokens")).toMap
    assert(sp == Map((10L, 11L) -> 11L), s"got $sp")
    // occurrence cap: a gram over the cap seeds nothing -> no pairs
    val capped = CorpusOps.substringDedup(docs, minTokens = 10, maxGramOcc = 1)
      .collect()
    assert(capped.isEmpty, s"cap must drop all seeds: ${capped.toSeq}")
  }

  test("decontaminateSpans measures verbatim leaks across tables, ignores sub-threshold echoes") {
    import spark.implicits._
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val leak = words("s", 11)
    val echo = words("x", 6) // shared, but under the 8-token bar
    val train = Seq(
      (1L, s"${words("a", 10)} $leak ${words("b", 5)}"),
      (2L, s"${words("c", 9)} $echo ${words("d", 14)}"),
      (3L, words("e", 30))).toDF("doc_id", "text")
    val eval = Seq(
      (100L, s"${words("f", 4)} $leak ${words("g", 7)}"),
      (101L, s"$echo ${words("h", 20)}")).toDF("doc_id", "text")
    val got = CorpusOps.decontaminateSpans(train, eval, minTokens = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id")) ->
        r.getAs[Long]("overlap_tokens")).toMap
    assert(got == Map((1L, 100L) -> 11L), s"got $got")
    // the 6-token echo surfaces once the bar drops to the gram size
    val low = CorpusOps.decontaminateSpans(train, eval, minTokens = 5).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id")) ->
        r.getAs[Long]("overlap_tokens")).toMap
    assert(low == Map((1L, 100L) -> 11L, (2L, 101L) -> 6L), s"got $low")
  }

  test("AnnIndex round-trip: persisted search matches the ephemeral operator exactly") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v"))
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 16, subs = 8,
      codes = 16, lloydIters = 1)
    assert(AnnIndex.exists(spark, dir))
    val m = AnnIndex.meta(spark, dir).head()
    assert(m.getAs[Long]("n_vectors") == e.count())
    assert(m.getAs[Int]("cells") == 16 && m.getAs[Int]("subs") == 8)

    val q = e.filter(col("id") < 10)
    def triples(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    // the persisted IVF search and the ephemeral operator share every
    // parameter and a deterministic build, so results must be IDENTICAL —
    // the guarantee that makes swapping in the cached index safe
    val persisted = triples(AnnIndex.searchIvf(spark, dir, q, k = 5, probe = 6))
    val ephemeral = triples(Ann.knnIvf(e, q, k = 5, cells = 16, probe = 6,
      lloydIters = 1))
    assert(persisted == ephemeral,
      s"diff: ${(persisted diff ephemeral) ++ (ephemeral diff persisted)}")

    // the PQ search path: full rank sets per query, self excluded
    val pq = AnnIndex.searchIvfPq(spark, dir, q, k = 5, rerank = 50).collect()
    val byQuery = pq.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      rows.foreach(r =>
        assert(r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    }
  }

  test("index append: new vectors search without a rebuild, recall bar holds on the grown index") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-app").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v"))
    val (seed, grown) = (e.filter(col("id") < 350), e.filter(col("id") >= 350))
    AnnIndex.buildIvfPq(seed, dim = 64, path = dir, cells = 16, subs = 8,
      codes = 16, lloydIters = 1)
    AnnIndex.append(spark, dir, grown)
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == e.count())

    val q = e.filter(col("id") < 10)
    val pq = AnnIndex.searchIvfPq(spark, dir, q, k = 5, rerank = 100).collect()
    // the grown index must surface APPENDED ids as neighbors where brute
    // force ranks them: compare against the exact baseline
    val brute = Ann.knnBrute(e, q, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = pq.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.8, s"appended-index recall too low: $recall")
    assert(brute.exists(_._2 >= 350),
      "test premise: brute top-5 must involve appended ids")
    assert(got.exists(_._2 >= 350),
      s"appended vectors never surface: ${got.toSeq.sortBy(_._1).take(10)}")
    // pure-IVF search over the same grown index sees appended vectors too
    val ivf = AnnIndex.searchIvf(spark, dir, q, k = 5, probe = 6).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(((brute & ivf).size.toDouble / brute.size) >= 0.8)
  }

  test("a crashed append (vectors written, codes/meta not) is invisible to PQ search and meta") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-crash").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v"))
    val (seed, grown) = (e.filter(col("id") < 350), e.filter(col("id") >= 350))
    AnnIndex.buildIvfPq(seed, dim = 64, path = dir, cells = 16, subs = 8,
      codes = 16, lloydIters = 1)
    val q = e.filter(col("id") < 10)
    def pqResults() = AnnIndex.searchIvfPq(spark, dir, q, k = 5, rerank = 100)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    val before = pqResults()
    val nBefore = AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors")

    // simulate append dying after its FIRST write (the vectors table) —
    // exactly what a mid-append crash leaves behind
    val cents = spark.read.parquet(s"$dir/centroids")
    Ann.ivfAssign(grown.select(col("id"), expr("graft_unit(v)").as("uv")), cents)
      .select(col("cell").cast("int").as("cell"), col("id"), col("uv"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/vectors")

    // ADC candidates come from `codes`, so a vector without codes cannot
    // surface; meta (the committed count) still reads the pre-append value
    assert(pqResults() === before,
      "a half-appended batch leaked into PQ search results")
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == nBefore)
  }

  test("index expire: dead ids vanish from both search paths, survivors' recall holds, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-exp").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v"))
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 16, subs = 8,
      codes = 16, lloydIters = 1)
    // retention drops every 7th vector (stand-in for S6 expiring their
    // source events); the index trim must make them unfindable
    val dead = e.filter(pmod(col("id"), lit(7)) === 0).select("id")
    val nDead = dead.count()
    val removed = AnnIndex.expire(spark, dir, dead)
    assert(removed == nDead, s"removed $removed of $nDead dead ids")
    val survivors = e.filter(pmod(col("id"), lit(7)) =!= 0)
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") ==
      survivors.count())

    val q = survivors.filter(col("id") < 20)
    val pq = AnnIndex.searchIvfPq(spark, dir, q, k = 5, rerank = 100).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = AnnIndex.searchIvf(spark, dir, q, k = 5, probe = 6).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(!(pq ++ ivf).exists(_._2 % 7 == 0),
      s"expired ids surfaced: ${(pq ++ ivf).filter(_._2 % 7 == 0).take(5)}")
    // recall vs brute force over the SURVIVING corpus — trimming must not
    // degrade the serving quality for what remains
    val brute = Ann.knnBrute(survivors, q, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.8, s"post-expiry recall too low: $recall")
    // idempotent: re-running the same trim is a no-op
    assert(AnnIndex.expire(spark, dir, dead) == 0L)
  }

  test("expire that kills EVERY vector leaves meta at 0 and stays idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-exp0").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v")).filter(col("id") < 40)
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 4, subs = 8,
      codes = 16, lloydIters = 1)
    // a full retention sweep: every cell empties — the survivors+untouched
    // accounting must not re-read the now-fileless vectors dir
    val removed = AnnIndex.expire(spark, dir, e.select("id"))
    assert(removed == 40L, s"removed $removed of 40")
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == 0L)
    // idempotent on the empty index: meta short-circuits before any read
    assert(AnnIndex.expire(spark, dir, e.select("id")) == 0L)
  }

  test("expire reconciles a stale meta count left by a crash before the meta rewrite") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annidx-repair").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v")).filter(col("id") < 40)
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 4, subs = 8,
      codes = 16, lloydIters = 1)
    // simulate the crash window: data trimmed (here: nothing), meta
    // inflated — as if a prior expire wrote vectors/codes then died
    val m = AnnIndex.meta(spark, dir).head()
    Seq((m.getAs[Int]("dim"), m.getAs[Int]("cells"), m.getAs[Int]("subs"),
        m.getAs[Int]("codes"), m.getAs[Int]("lloyd_iters"), 55L, "cell_mean"))
      .toDF("dim", "cells", "subs", "codes", "lloyd_iters", "n_vectors",
        "residual_coding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // re-running with ids that are all already gone (affected empty)
    // repairs the count instead of returning the stale arithmetic
    val reconciled = AnnIndex.expire(spark, dir,
      Seq(900L, 901L).toDF("id"))
    assert(reconciled == 15L, s"reconciled $reconciled, want 55 - 40 = 15")
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == 40L)
  }

  test("expire clamps a stale-LOW meta to a zero removal and repairs the count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annidx-lowmeta").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v")).filter(col("id") < 40)
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 4, subs = 8,
      codes = 16, lloydIters = 1)
    // the OTHER crash window: an append wrote its vectors/codes but died
    // before the meta rewrite — meta reads LOWER than the data. A naive
    // nBefore - n would go negative; the contract is a 0-removal
    // reconcile with the count repaired.
    val m = AnnIndex.meta(spark, dir).head()
    Seq((m.getAs[Int]("dim"), m.getAs[Int]("cells"), m.getAs[Int]("subs"),
        m.getAs[Int]("codes"), m.getAs[Int]("lloyd_iters"), 25L, "cell_mean"))
      .toDF("dim", "cells", "subs", "codes", "lloyd_iters", "n_vectors",
        "residual_coding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val removed = AnnIndex.expire(spark, dir, Seq(900L).toDF("id"))
    assert(removed == 0L, s"stale-low reconcile must report 0, got $removed")
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == 40L)
  }

  test("expire carries residual_coding through its meta rewrite") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annidx-coding").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v")).filter(col("id") < 40)
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 4, subs = 8,
      codes = 16, lloydIters = 1)
    // an index built under a DIFFERENT residual coding must not be
    // relabeled to the current default the first time expire touches it
    val m = AnnIndex.meta(spark, dir).head()
    Seq((m.getAs[Int]("dim"), m.getAs[Int]("cells"), m.getAs[Int]("subs"),
        m.getAs[Int]("codes"), m.getAs[Int]("lloyd_iters"), 40L, "unit_centroid"))
      .toDF("dim", "cells", "subs", "codes", "lloyd_iters", "n_vectors",
        "residual_coding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val removed = AnnIndex.expire(spark, dir, Seq(0L, 1L).toDF("id"))
    assert(removed == 2L)
    val after = AnnIndex.meta(spark, dir).head()
    assert(after.getAs[String]("residual_coding") == "unit_centroid",
      s"expire relabeled the coding to ${after.getAs[String]("residual_coding")}")
    assert(after.getAs[Long]("n_vectors") == 38L)
  }

  test("minhash/simhash band-bucket caps silence an identical-doc mass, keep clean pairs, report the drop") {
    import spark.implicits._
    // adversarial mass: 300 byte-identical docs — one bucket of 300 in
    // EVERY band of both sketches (C(300,2) = 44850 verified pairs
    // uncapped); plus 10 clean duplicate PAIRS on disjoint vocabularies
    val clusterText = "shared mass document body repeated verbatim all over the corpus today"
    val cluster = (0 until 300).map(i => (i.toLong, clusterText))
    val clean = (0 until 10).flatMap { p =>
      val t = (0 until 10).map(w => s"pair${p}tok$w").mkString(" ")
      Seq((1000L + 2 * p, t), (1001L + 2 * p, t))
    }
    val docs = (cluster ++ clean).map { case (i, t) => (i, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars").localCheckpoint(true)
    val planted = (0 until 10).map(p => (1000L + 2 * p, 1001L + 2 * p)).toSet

    // default cap: provably a no-op (max bucket ~300 << 8192); the
    // cluster contributes its full C(300,2) clique (char-shingle overlap
    // between clean docs may add a few more genuine near-dups — the cap
    // contract below is therefore phrased against the uncapped output,
    // not a hand-counted fixture)
    val full = CorpusOps.nearDupPairsMinhash(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(full.size >= 44850 && planted.subsetOf(full), s"premise: ${full.size}")
    // cap contract: exactly the pairs not touching the over-cap cluster
    val expectM = full.filter(p => p._1 >= 1000L && p._2 >= 1000L)

    // capped at 50: the cluster is silenced, every clean pair survives,
    // and the audit carries the cluster bucket in all 8 minhash bands
    val (mPairs, mAudit) = CorpusOps.nearDupPairsMinhashAudited(
      docs, threshold = 0.5, maxBucket = 50)
    val mGot = mPairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mGot == expectM, s"capped minhash diff: extra=${mGot -- expectM} missing=${expectM -- mGot}")
    assert(planted.subsetOf(mGot))
    val mRows = mAudit.collect()
    assert(mRows.length == 8 && mRows.forall(_.getAs[Long]("n") >= 300L),
      s"minhash audit: ${mRows.mkString(",")}")

    // same contract on the simhash path (4 x 16-bit bands)
    val fullS = CorpusOps.nearDupPairsSimhash(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expectS = fullS.filter(p => p._1 >= 1000L && p._2 >= 1000L)
    val (sPairs, sAudit) = CorpusOps.nearDupPairsSimhashAudited(
      docs, maxHamming = 3, maxBucket = 50)
    val sGot = sPairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(sGot == expectS, s"capped simhash diff: extra=${sGot -- expectS} missing=${expectS -- sGot}")
    assert(planted.subsetOf(sGot))
    val sRows = sAudit.collect()
    assert(sRows.length == 4 && sRows.forall(_.getAs[Long]("n") >= 300L),
      s"simhash audit: ${sRows.mkString(",")}")
  }

  test("embedding-LSH bucket cap bounds adversarial collisions and reports the dropped mass") {
    import spark.implicits._
    // adversarial mass: 500 positive multiples of ONE direction — every
    // sign-bit band code identical, so uncapped candidate generation
    // degrades to C(500,2) pairs per band (the BASELINE r2 ~all-pairs
    // observation, concentrated); plus 10 planted near-dup pairs on
    // DISTINCT one-hot directions (normal data the cap must not touch)
    val dim = 64
    def hot(d: Int, scale: Double): Array[Double] = {
      val v = Array.fill(dim)(0.0); v(d) = scale; v(63) = 0.01 * scale; v
    }
    val cluster = (0 until 500).map(i => (i.toLong, hot(0, 1.0 + i * 0.01)))
    val spread = (0 until 10).flatMap { p =>
      Seq((1000L + 2 * p, hot(p + 1, 1.0)), (1001L + 2 * p, hot(p + 1, 2.0)))
    }
    val e = (cluster ++ spread).toDF("id", "v")
    graft.expressions.GraftExtensions.register(spark)
    val coded = Ann.bandedCodes(
      e.select(col("id"), expr("graft_unit(v)").as("v")),
      seed = 7, planes = 128, bands = 32, dim = dim)
      .select("id", "band_idx", "code").localCheckpoint(true)

    // uncapped: the cluster alone yields C(500,2) = 124750 candidates
    val uncapped = Ann.cosineCandidatePairs(coded).count()
    assert(uncapped >= 124750L, s"premise: adversarial mass collides, got $uncapped")

    // capped at 50: cluster buckets (500 rows in every band) drop, the
    // candidate set is bounded by the small buckets only
    val (cand, audit) = Ann.cosineCandidatePairsCapped(coded, maxBucket = 50)
    val nCand = cand.count()
    assert(nCand < 2000L,
      s"cap must bound candidates (was $uncapped uncapped), got $nCand")
    // loud accounting: one over-cap bucket per band, each holding the mass
    val auditRows = audit.collect()
    assert(auditRows.length == 32,
      s"expected the cluster bucket flagged in all 32 bands, got ${auditRows.length}")
    assert(auditRows.forall(_.getAs[Long]("n") >= 500L))

    // honest recall readout through the full operator: the planted spread
    // pairs all survive (their buckets are tiny); the over-cap cluster's
    // pairs are silenced — exactly the documented conservative semantics
    val (pairs, _) = Ann.nearDupPairsCosineAudited(
      e, dim = dim, threshold = 0.4, maxBucket = 50)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 10).map(p => (1000L + 2 * p, 1001L + 2 * p)).toSet
    assert(got == planted,
      s"capped run must keep exactly the non-adversarial planted pairs: $got")
    // and the DEFAULT cap is a no-op at test scale: identical pairs to the
    // uncapped verify (the catalog query's oracle-stability guarantee)
    val (defPairs, defAudit) = Ann.nearDupPairsCosineAudited(
      e, dim = dim, threshold = 0.4)
    assert(defAudit.count() == 0L, "default cap must not bind at n=520")
    assert(defPairs.count() >= 124750L + 10L,
      "default-cap output must include the full adversarial cluster")
  }

  test("recoverInterruptedSwap restores a live index from either parked copy") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("annidx-recover").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v")).filter(col("id") < 60)
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 4, subs = 8,
      codes = 16, lloydIters = 1)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // live index: recovery is a no-op
    assert(AnnIndex.recoverInterruptedSwap(spark, dir).isEmpty)
    // crash AFTER "old aside" and BEFORE "staged in": only _rebuild_tmp
    // holds a complete index — recovery promotes it
    assert(fs.rename(new Path(dir), new Path(s"${dir}_rebuild_tmp")))
    assert(AnnIndex.recoverInterruptedSwap(spark, dir).contains("rebuild"))
    assert(AnnIndex.exists(spark, dir))
    assert(AnnIndex.searchIvfPq(spark, dir,
      e.filter(col("id") < 3), k = 3, rerank = 50).count() > 0)
    // crash where only the replaced ORIGINAL survived — recovery restores it
    assert(fs.rename(new Path(dir), new Path(s"${dir}_replaced_tmp")))
    assert(AnnIndex.recoverInterruptedSwap(spark, dir).contains("replaced"))
    assert(AnnIndex.exists(spark, dir))
    // and a live index sweeps stale parked copies
    val stale = new Path(s"${dir}_replaced_tmp")
    fs.mkdirs(stale)
    assert(AnnIndex.recoverInterruptedSwap(spark, dir).isEmpty)
    assert(!fs.exists(stale), "stale parked copy must be swept")
  }

  test("rebalance clears a stale _replaced_tmp from a prior interrupted swap") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-swap").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v")).filter(col("id") < 60)
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 4, subs = 8,
      codes = 16, lloydIters = 1)
    // leftover from a hypothetical crash between the two swap renames
    val stale = new java.io.File(s"${dir}_replaced_tmp")
    assert(stale.mkdir())
    java.nio.file.Files.writeString(stale.toPath.resolve("junk"), "stale")
    AnnIndex.rebalance(spark, dir)
    assert(AnnIndex.exists(spark, dir))
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == 60L)
    assert(!stale.exists(), "_replaced_tmp must be cleaned up after the swap")
    // the rebalanced index serves
    val q = e.filter(col("id") < 3)
    assert(AnnIndex.searchIvfPq(spark, dir, q, k = 3, rerank = 50).count() > 0)
  }

  test("rebalance pointer swap: search serves the old snapshot in-flight, the flip is atomic, generations sweep") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-ptr").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v")).filter(col("id") < 60)
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 4, subs = 8,
      codes = 16, lloydIters = 1)
    val q = e.filter(col("id") < 3)
    def serve(): Long = AnnIndex.searchIvfPq(spark, dir, q, k = 3, rerank = 50).count()
    val nBefore = serve()
    assert(nBefore > 0)

    // in-flight window (staged rebuild complete, pointer not yet flipped):
    // a concurrent search must return from the OLD snapshot — under the
    // legacy two-rename swap the live path was absent here and the search
    // errored
    var duringOk = false
    AnnIndex.rebalance(spark, dir, { () =>
      assert(AnnIndex.servingPath(spark, dir) == dir,
        "before the flip the original snapshot must still serve")
      assert(serve() == nBefore, "in-flight search must see the old snapshot")
      duringOk = true
    })
    assert(duringOk)
    assert(AnnIndex.servingPath(spark, dir).endsWith("_gen1"))
    assert(AnnIndex.exists(spark, dir) && serve() == nBefore)
    // the replaced original survives one cycle (an in-flight reader may
    // still hold it)
    assert(new java.io.File(dir).exists(), "previous generation must be retained")

    // crash BEFORE the flip: the old generation keeps serving, recovery is
    // simply re-running rebalance
    val boom = intercept[RuntimeException] {
      AnnIndex.rebalance(spark, dir,
        () => throw new RuntimeException("crash before pointer flip"))
    }
    assert(boom.getMessage.contains("crash before"), boom.getMessage)
    assert(AnnIndex.servingPath(spark, dir).endsWith("_gen1") && serve() == nBefore)
    AnnIndex.rebalance(spark, dir)
    assert(AnnIndex.servingPath(spark, dir).endsWith("_gen2") && serve() == nBefore)
    // generation retention: current + previous only — the original
    // un-suffixed dir is now two generations back and swept
    assert(!new java.io.File(dir).exists(), "gen-2-back original must be swept")
    assert(new java.io.File(s"${dir}_gen1").exists())
    AnnIndex.rebalance(spark, dir)
    assert(AnnIndex.servingPath(spark, dir).endsWith("_gen3") && serve() == nBefore)
    assert(!new java.io.File(s"${dir}_gen1").exists(), "old generations must sweep")
    assert(new java.io.File(s"${dir}_gen2").exists())
    // mutation entry points resolve the pointer too
    import spark.implicits._
    AnnIndex.append(spark, dir,
      e.filter(col("id") >= 60 || col("id") < 0).limit(0))
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == 60L)
  }

  test("index mutation guard: concurrent mutators fail loudly, stale markers are taken over, clean ops leave no marker") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annidx-guard").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v")).filter(col("id") < 60)
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 4, subs = 8,
      codes = 16, lloydIters = 1)
    val marker = java.nio.file.Paths.get(s"${dir}_mutating")

    // a live in-flight mutation (fresh marker): a second mutator must
    // fail descriptively instead of interleaving partial table writes
    java.nio.file.Files.write(marker, "rebalance".getBytes("UTF-8"))
    val err = intercept[IllegalStateException] {
      AnnIndex.expire(spark, dir, Seq(0L).toDF("id"))
    }
    assert(err.getMessage.contains("being mutated"), err.getMessage)
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == 60L,
      "the refused mutation must not have touched the index")

    // a STALE marker (crashed mutator): taken over with a warning, the
    // operation completes, and the marker is gone afterwards
    java.nio.file.Files.setLastModifiedTime(marker,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10 * AnnIndex.MutationGuardTtlMillis))
    val removed = AnnIndex.expire(spark, dir, Seq(0L).toDF("id"))
    assert(removed == 1L)
    assert(!java.nio.file.Files.exists(marker),
      "a completed mutation must release the marker")

    // normal append under the guard: completes, no marker left behind
    AnnIndex.append(spark, dir,
      graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
        .select(col("vec_id").as("id"), col("v"))
        .filter(col("id") === 60L))
    assert(!java.nio.file.Files.exists(marker))
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == 60L,
      "59 after expire + 1 appended")
  }

  test("cell-skew audit fires after drifted appends; rebalance retrains in place and restores balance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annidx-reb").toString
    // seed: 160 well-spread deterministic vectors (4 one-hot-ish families)
    def mk(hot: Int, i: Int): Array[Double] = {
      val v = Array.fill(64)(0.01 * ((i * 7 + hot) % 5))
      v(hot) = 1.0; v((hot + i) % 64) += 0.3; v
    }
    val seed = (0 until 160).map(i => (i.toLong, mk(i % 16 * 4, i))).toDF("id", "v")
    AnnIndex.buildIvfPq(seed, dim = 64, path = dir, cells = 16, subs = 8,
      codes = 16, lloydIters = 1)
    assert(!AnnIndex.needsRebalance(spark, dir, maxSkew = 4.0),
      "seed index must start balanced (test premise)")
    // drift: 300 appended vectors in one narrow cone (a new content family
    // the frozen centroids never saw) — they all route to the same cell(s)
    val cone = (1000 until 1300).map { i =>
      val v = Array.fill(64)(0.0); v(63) = 1.0; v(i % 32) = 0.05 + 0.001 * (i % 7)
      (i.toLong, v)
    }.toDF("id", "v")
    AnnIndex.append(spark, dir, cone)
    val sizesBefore = AnnIndex.cellSizes(spark, dir).collect()
      .map(_.getAs[Long]("n"))
    assert(AnnIndex.needsRebalance(spark, dir, maxSkew = 4.0),
      s"skew audit failed to fire: max=${sizesBefore.max} avg=${sizesBefore.sum / sizesBefore.length}")

    AnnIndex.rebalance(spark, dir)
    assert(AnnIndex.exists(spark, dir))
    assert(AnnIndex.meta(spark, dir).head().getAs[Long]("n_vectors") == 460L)
    val sizesAfter = AnnIndex.cellSizes(spark, dir).collect()
      .map(_.getAs[Long]("n"))
    // retraining gives the cone its own cells: the largest cell shrinks
    assert(sizesAfter.max < sizesBefore.max,
      s"rebalance did not split the hot cell: ${sizesBefore.max} -> ${sizesAfter.max}")
    // the rebalanced index still serves: cone queries find cone neighbors
    val q = cone.filter(col("id") < 1005)
    val got = AnnIndex.searchIvfPq(spark, dir, q, k = 5, rerank = 100).collect()
    assert(got.groupBy(_.getAs[Long]("query_id")).size == 5)
    assert(got.forall(_.getAs[Long]("neighbor_id") >= 1000),
      "a cone query's top-5 must be cone members")
  }

  test("a pre-cell-mean index fails searchIvfPq loudly with the rebuild remedy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annidx-v2").toString
    val e = graft.queries.SimilarityQueries.emb(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("v"))
    AnnIndex.buildIvfPq(e, dim = 64, path = dir, cells = 4, subs = 8,
      codes = 4, lloydIters = 0)
    // regress the meta to the v2 shape (boolean residual_coding, no mean
    // layout contract) — searchIvfPq must refuse with the remedy instead
    // of a raw path error or silently wrong ADC scores
    Seq((64, 4, 8, 4, 0, e.count(), true))
      .toDF("dim", "cells", "subs", "codes", "lloyd_iters", "n_vectors",
        "residual_coding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val err = intercept[IllegalStateException] {
      AnnIndex.searchIvfPq(spark, dir, e.filter(col("id") < 3), k = 2)
    }
    assert(err.getMessage.contains("rebuild") &&
      err.getMessage.contains("residual_coding=true"), err.getMessage)
  }

  test("streaming queries probe the persisted ANN index per micro-batch (continuous ingestion)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val idxPath = graft.queries.SimilarityQueries.ensureIndex(spark, dir)
    val e = graft.queries.SimilarityQueries.emb(spark, dir)
      .select(col("vec_id").as("id"), col("v"))
    val queries = e.filter(col("id") < 10).as[(Long, Seq[Double])].collect()
    val brute = Ann.knnBrute(e, e.filter(col("id") < 10), k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val input = MemoryStream[(Long, Seq[Double])]
    val q = input.toDF().toDF("id", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // search references the batch in three subtrees (probes, LUT,
        // rerank) — checkpoint before multi-pass use, as with any
        // foreachBatch DF
        val got = AnnIndex.searchIvfPq(spark, idxPath,
            batch.localCheckpoint(true), k = 5, rerank = 100)
          .collect().map(r => (r.getAs[Long]("query_id"),
            r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
        results.synchronized { results ++= got }
        ()
      }.start()
    try {
      input.addData(queries.take(5).toIndexedSeq)
      q.processAllAvailable()
      // second batch: the rest, plus a REPEAT of query 0 — the persisted
      // index must answer it identically across micro-batches
      input.addData((queries.drop(5) :+ queries.head).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val pairs = results.map(t => (t._1, t._2)).toSet
    val recall = (brute & pairs).size.toDouble / brute.size
    assert(recall >= 0.8, s"streaming probe recall too low: $recall")
    // the repeated query's two answers are identical (stable index)
    val q0 = results.filter(_._1 == queries.head._1)
    assert(q0.size == 10, s"query 0 must be answered twice: ${q0.size}")
    assert(q0.toSet.size == 5, s"re-answer differs: ${q0.sorted}")
  }

  test("index builds are bit-identical across runs at two SFs (no nondeterministic reduce order)") {
    graft.expressions.GraftExtensions.register(spark)
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val u = graft.queries.SimilarityQueries.emb(spark, dir)
        .select(col("vec_id").as("id"), expr("graft_unit(v)").as("uv"))
      // raw IEEE bits, not ==: a last-ulp drift between two builds would
      // route borderline vectors to different cells and silently poison a
      // persisted index reused across sessions
      def centBits(): Seq[(Long, Seq[Long])] =
        Ann.ivfCentroids(u, cells = 16, iters = 1).collect()
          .map(r => r.getAs[Long]("cent_id") ->
            r.getSeq[Double](r.fieldIndex("cv")).map(java.lang.Double.doubleToRawLongBits))
          .sortBy(_._1).toSeq
      assert(centBits() == centBits(), s"centroid bits differ across builds at $dir")
      val sub = Ann.pqSubvectors(u.select(col("id"), col("uv")), dim = 64,
        subs = 8, vecCol = "uv")
      def cbBits(): Seq[((Int, Int), Seq[Long])] =
        Ann.pqCodebooks(sub, codes = 16).collect()
          .map(r => (r.getAs[Int]("sub_idx"), r.getAs[Int]("code")) ->
            r.getSeq[Double](r.fieldIndex("cv")).map(java.lang.Double.doubleToRawLongBits))
          .sortBy(_._1).toSeq
      assert(cbBits() == cbBits(), s"codebook bits differ across builds at $dir")
    }
  }

  test("bm25 operator: rare terms outrank common ones, termless docs drop, tf columns surface") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta beta beta"), // common term only
      (2L, "alpha zebra"),          // one rare term
      (3L, "beta"),
      (4L, "nothing here"),         // no query terms -> excluded
      (5L, "zebra zebra beta")      // rare term twice + common
    ).toDF("doc_id", "text")
    val got = CorpusOps.bm25(docs, Seq("beta", "zebra"), k = 10).collect()
    val ids = got.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ids.contains(4L) && ids.length == 4)
    // zebra df=2/5 vs beta df=4/5: doc 5 (zebra x2 + beta) must rank first
    assert(ids.head == 5L)
    val scores = got.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(got.head.schema.fieldNames.toSet ==
      Set("doc_id", "tf_beta", "tf_zebra", "dl", "score"))
    // guard: non-word terms would silently break the \b regex — rejected
    assertThrows[IllegalArgumentException] {
      CorpusOps.bm25(docs, Seq("Beta"))
    }
  }
}
