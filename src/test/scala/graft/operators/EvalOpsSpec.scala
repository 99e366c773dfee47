package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Property bars for the EvalOps statistics on randomized instances —
  * each operator checked against an independent sequential reference or
  * a defining invariant, not its own arithmetic. */
class EvalOpsSpec extends SparkSuite {

  private val rnd = new scala.util.Random(42)

  test("rocAuc is invariant under monotone score transforms and matches brute force") {
    import spark.implicits._
    for (trial <- 0 until 5) {
      val n = 60 + trial * 30
      val scored = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextBoolean()))
      val df = scored.toDF("score", "label")
      val auc = EvalOps.rocAuc(df, "score", "label").collect()(0)
      // brute force over all pairs, doubled for tie halves
      val pos = scored.filter(_._2).map(_._1)
      val neg = scored.filterNot(_._2).map(_._1)
      var u2 = 0L
      for (p <- pos; q <- neg)
        u2 += (if (p > q) 2L else if (p == q) 1L else 0L)
      val expect = math.floor(
        u2.toDouble * 1000000.0 / (pos.length.toDouble * neg.length * 2.0)).toLong
      assert(auc.getAs[Long]("auc_ppm") == expect, s"trial $trial")
      // monotone transform: rank statistics see only the ORDER
      val t = df.withColumn("score", col("score") * 7 + 3)
      assert(EvalOps.rocAuc(t, "score", "label").collect()(0)
        .getAs[Long]("auc_ppm") == expect, s"transform trial $trial")
    }
  }

  test("ksDrift is zero on identical samples, maximal on disjoint ranges, symmetric in D") {
    import spark.implicits._
    val a = Seq.fill(50)(rnd.nextInt(20).toLong).toDF("v")
    val same = EvalOps.ksDrift(a, a, "v").collect()(0)
    assert(same.getAs[Long]("d_num") == 0L)
    assert(!same.getAs[Boolean]("reject_05"))
    val lo = Seq.fill(40)(rnd.nextInt(10).toLong).toDF("v")
    val hi = Seq.fill(30)(rnd.nextInt(10).toLong + 100L).toDF("v")
    val dis = EvalOps.ksDrift(lo, hi, "v").collect()(0)
    // disjoint supports: D = 1 exactly -> numerator = n_a * n_b
    assert(dis.getAs[Long]("d_num") ==
      dis.getAs[Long]("n_a") * dis.getAs[Long]("n_b"))
    assert(dis.getAs[Boolean]("reject_05"))
    // swapping the samples leaves |D| unchanged
    val swapped = EvalOps.ksDrift(hi, lo, "v").collect()(0)
    assert(swapped.getAs[Long]("d_num") == dis.getAs[Long]("d_num"))
  }

  test("waterfill matches a sequential reference on random instances") {
    import spark.implicits._
    for (trial <- 0 until 8) {
      val k = 3 + rnd.nextInt(8)
      val avails = (0 until k).map(i => s"s$i" -> (1L + rnd.nextInt(10000)))
      val out = EvalOps.waterfill(avails.toDF("source", "avail"))
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("alloc"), r.getAs[Boolean]("saturated"))).toMap

      // sequential reference: ascending avail/weight, saturate while the
      // remaining budget covers the ratio, floor-split the rest
      val w = avails.map { case (s, a) =>
        (s, a.toLong, math.floor(math.sqrt(a.toDouble)).toLong)
      }
      val b = w.map(_._2).sum / 2
      val sorted = w.sortBy { case (s, a, ww) => (a.toDouble / ww, s) }
      var bRem = b
      var wRem = w.map(_._3).sum
      val ref = scala.collection.mutable.Map.empty[String, (Long, Boolean)]
      var splitting = false
      sorted.foreach { case (s, a, ww) =>
        if (!splitting && a * wRem <= bRem * ww) {
          ref(s) = (a, true); bRem -= a; wRem -= ww
        } else {
          splitting = true
          ref(s) = (bRem * ww / math.max(w.map(_._3).sum - w.filter(t => ref.get(t._1).exists(_._2)).map(_._3).sum, 1L), false)
        }
      }
      // recompute unsat allocations against the FINAL residual (the
      // operator's closed form): floor(B_rem * w / W_unsat)
      val satAvail = ref.collect { case (s, (al, true)) => al }.sum
      val unsatW = w.filterNot(t => ref.get(t._1).exists(_._2)).map(_._3).sum
      w.foreach { case (s, a, ww) =>
        if (!ref(s)._2) ref(s) = ((b - satAvail) * ww / math.max(unsatW, 1L), false)
      }
      assert(out == ref.toMap, s"trial $trial: $out vs $ref (avails=$avails)")
    }
  }

  test("waterfill respects an arbitrary budget fraction") {
    import spark.implicits._
    val avails = Seq("a" -> 4000L, "b" -> 100L, "c" -> 9000L)
    for ((num, den) <- Seq((1L, 4L), (3L, 4L), (1L, 1L))) {
      val out = EvalOps.waterfill(avails.toDF("source", "avail"), num, den)
        .collect()
      val b = avails.map(_._2).sum * num / den
      val alloc = out.map(_.getAs[Long]("alloc")).sum
      assert(alloc <= b, s"$num/$den overspent: $alloc of $b")
      out.foreach(r => assert(r.getAs[Long]("alloc") <= r.getAs[Long]("avail")))
      // full budget = every source saturated at its cap
      if (num == den)
        out.foreach(r => assert(r.getAs[Boolean]("saturated"), r.toString))
    }
  }

  test("paddingWaste totals reconcile with a direct recomputation") {
    import spark.implicits._
    val docs = Seq.fill(200)(
      (rnd.nextInt(100000).toLong,
        Seq.fill(1 + rnd.nextInt(200))("w").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = EvalOps.paddingWaste(docs).collect()
    assert(rows.map(_.getAs[Long]("docs")).sum == 200L)
    val lens = docs.select(size(split(trim(col("text")), " +")).cast("long"))
      .collect().map(_.getLong(0))
    def ub(n: Long) = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L)
      .find(n <= _).getOrElse(2048L)
    val byB = lens.groupBy(ub)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket_ub")
      assert(r.getAs[Long]("docs") == byB(b).length.toLong)
      assert(r.getAs[Long]("tokens") == byB(b).sum)
      assert(r.getAs[Long]("bucket_pad") ==
        byB(b).map(n => math.max(b - n, 0L)).sum)
    }
  }
}
