package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The Morton-code expression and the file-pruning payoff of writing in
  * z order instead of a linear sort. */
class ZOrderSpec extends SparkSuite {

  private def naive(x: Long, y: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 32) {
      r |= ((x >> i) & 1L) << (2 * i)
      r |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  test("graft_zorder matches a bit-by-bit interleave, interpreted and codegen") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(5)
    val edge = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (0xffffffffL, 0L), (0L, 0xffffffffL), (0xffffffffL, 0xffffffffL))
    val cases = edge ++ Seq.fill(200)(
      (rnd.nextLong() & 0xffffffffL, rnd.nextLong() & 0xffffffffL))
    cases.foreach { case (x, y) =>
      assert(ZOrderCodes.interleave(x, y) == naive(x, y), s"($x, $y)")
    }
    val got = cases.toDF("x", "y").repartition(3)
      .selectExpr("x", "y", "graft_zorder(x, y) AS z")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == naive(x, y), s"($x, $y)") }
  }

  private def naive3(x: Long, y: Long, z: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 21) {
      r |= ((x >> i) & 1L) << (3 * i)
      r |= ((y >> i) & 1L) << (3 * i + 1)
      r |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    r
  }

  test("graft_zorder3 matches a bit-by-bit 3-way interleave, interpreted and codegen") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(9)
    val edge = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (0x1fffffL, 0x1fffffL, 0x1fffffL), (65535L, 0L, 65535L))
    val cases = edge ++ Seq.fill(200)((rnd.nextLong() & 0x1fffffL,
      rnd.nextLong() & 0x1fffffL, rnd.nextLong() & 0x1fffffL))
    cases.foreach { case (x, y, z) =>
      assert(ZOrderCodes.interleave3(x, y, z) == naive3(x, y, z), s"($x,$y,$z)")
    }
    val got = cases.toDF("x", "y", "z").repartition(3)
      .selectExpr("x", "y", "z", "graft_zorder3(x, y, z) AS m")
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, z, m) => assert(m == naive3(x, y, z), s"($x,$y,$z)") }
  }

  test("3-key clustered write tightens every axis's per-file envelope") {
    import spark.implicits._
    val pts = (for { x <- 0 until 16; y <- 0 until 16; z <- 0 until 16 }
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    val dir = tempDir("zorder3")
    graft.operators.ZOrderLayout.writeClustered3(pts, "x", "y", "z", 16, dir)
    val env = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(max("x") - min("x"), max("y") - min("y"), max("z") - min("z"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // every axis's average per-file span must be well under the global 15
    def avg(f: ((Long, Long, Long)) => Long) = env.map(f).sum.toDouble / env.length
    assert(avg(_._1) <= 9.0, s"x spans ${env.map(_._1).toSeq}")
    assert(avg(_._2) <= 9.0, s"y spans ${env.map(_._2).toSeq}")
    assert(avg(_._3) <= 9.0, s"z spans ${env.map(_._3).toSeq}")
    // and the rewrite lost nothing
    assert(spark.read.parquet(dir).count() == 4096)
  }

  test("z-order files carry tight min/max envelopes on BOTH axes; linear sort on one") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val pts = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")

    def fileEnvelopes(dir: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq

    // how many of the 16 files a width-8 strip predicate on each axis
    // would have to read, averaged over the 8 strips of that axis
    def avgFilesRead(env: Seq[(Long, Long, Long, Long)]): (Double, Double) = {
      val strips = (0 until 8).map(s => (s * 8L, s * 8L + 7L))
      val xReads = strips.map { case (lo, hi) =>
        env.count { case (mnx, mxx, _, _) => mnx <= hi && mxx >= lo } }
      val yReads = strips.map { case (lo, hi) =>
        env.count { case (_, _, mny, mxy) => mny <= hi && mxy >= lo } }
      (xReads.sum.toDouble / 8, yReads.sum.toDouble / 8)
    }

    val zDir = tempDir("zorder")
    graft.operators.ZOrderLayout.writeClustered(pts, "x", "y", 16, zDir)
    val linDir = tempDir("linear")
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    val (zx, zy) = avgFilesRead(fileEnvelopes(zDir))
    val (lx, ly) = avgFilesRead(fileEnvelopes(linDir))
    // linear layout: x-strips prune hard but y-strips read every file
    assert(lx <= 3.0, s"linear x reads $lx")
    assert(ly >= 15.0, s"linear y reads $ly")
    // z-order: BOTH axes prune to well under half the files
    assert(zx <= 8.0, s"zorder x reads $zx")
    assert(zy <= 8.0, s"zorder y reads $zy")
  }

  test("hilbert clustered write prunes BOTH axes at least as well as morton") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val pts = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def fileEnvelopes(dir: String): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    def avgFilesRead(env: Seq[(Long, Long, Long, Long)]): (Double, Double) = {
      val strips = (0 until 8).map(s => (s * 8L, s * 8L + 7L))
      val xReads = strips.map { case (lo, hi) =>
        env.count { case (mnx, mxx, _, _) => mnx <= hi && mxx >= lo } }
      val yReads = strips.map { case (lo, hi) =>
        env.count { case (_, _, mny, mxy) => mny <= hi && mxy >= lo } }
      (xReads.sum.toDouble / 8, yReads.sum.toDouble / 8)
    }
    val hDir = tempDir("hilbert")
    graft.operators.ZOrderLayout.writeClusteredHilbert(pts, "x", "y", 16, hDir)
    val (hx, hy) = avgFilesRead(fileEnvelopes(hDir))
    assert(hx <= 8.0, s"hilbert x reads $hx")
    assert(hy <= 8.0, s"hilbert y reads $hy")
    // and the summed envelope area beats morton's on the same write
    val zDir = tempDir("morton-cmp")
    graft.operators.ZOrderLayout.writeClustered(pts, "x", "y", 16, zDir)
    def area(env: Seq[(Long, Long, Long, Long)]): Long =
      env.map { case (a, b, c, d) => (b - a + 1) * (d - c + 1) }.sum
    assert(area(fileEnvelopes(hDir)) <= area(fileEnvelopes(zDir)),
      "hilbert files must cover no more envelope area than morton")
  }

  /** Independent d2xy reference (the INVERSE walk, standard Hilbert
    * construction) — the expression is checked against the curve's
    * defining property, not a re-transcription of its own loop. */
  private def d2xy(d: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var t = d; var s = 1L
    while (s < 65536L) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("graft_hilbert inverts the standard d2xy walk; consecutive codes are grid-adjacent") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // xy2d(d2xy(d)) == d over a contiguous code range + random codes
    val rnd = new scala.util.Random(7)
    val codes = (0L until 4096L) ++ Seq.fill(500)(
      math.abs(rnd.nextLong()) % (65536L * 65536L))
    codes.foreach { dd =>
      val (x, y) = d2xy(dd)
      assert(ZOrderCodes.hilbert(x, y) == dd, s"d=$dd -> ($x,$y)")
    }
    // the Hilbert property Morton lacks: consecutive codes differ by ONE
    // grid step (|dx| + |dy| == 1), never a diagonal jump
    var prev = d2xy(0L)
    (1L until 4096L).foreach { dd =>
      val cur = d2xy(dd)
      assert(math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2) == 1,
        s"jump at d=$dd: $prev -> $cur")
      prev = cur
    }
    // codegen path agrees with the JVM helper
    val cases = Seq.fill(200)((rnd.nextLong() & 0xffffL, rnd.nextLong() & 0xffffL))
    val got = cases.toDF("x", "y").repartition(3)
      .selectExpr("x", "y", "graft_hilbert(x, y) AS h")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) => assert(h == ZOrderCodes.hilbert(x, y)) }
  }

  test("hilbert range buckets cover tighter envelopes than morton on the same data") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // uniform grid sample; 32 equal-count buckets per curve; compare the
    // summed envelope areas — the quantitative form of "no diagonal jumps"
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(4096)(
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("x", "y")
      .selectExpr("x", "y", "graft_zorder(x, y) AS zm", "graft_hilbert(x, y) AS zh")
      .cache()
    def envelopeArea(code: String): Long = {
      import org.apache.spark.sql.expressions.Window
      pts.withColumn("b", ntile(32).over(Window.orderBy(col(code))))
        .groupBy("b")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .agg(sum("area")).collect()(0).getLong(0)
    }
    try {
      val morton = envelopeArea("zm")
      val hilbert = envelopeArea("zh")
      assert(hilbert < morton,
        s"hilbert envelope area $hilbert must beat morton $morton")
    } finally pts.unpersist()
  }
}
