package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.similarity.VectorKernels

class DotProductSpec extends SparkSuite {

  private def registered() = { GraftExtensions.register(spark); spark }

  test("graft_dot matches the JVM kernel exactly") {
    val s = registered()
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(50)((Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b").select(expr("graft_dot(a, b)").as("d"))
    val got = df.collect().map(_.getDouble(0))
    val want = rows.map { case (a, b) => VectorKernels.dot(a, b) }
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("graft_dot participates in whole-stage codegen") {
    val s = registered()
    val df = graft.Tables.load(s, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .selectExpr("graft_dot(v, v) AS d")
    // in the simple plan string a whole-stage-codegen'd operator is marked
    // with a "*(stageId)" prefix; the graft_dot projection must carry it
    val plan = df.queryExecution.executedPlan.toString
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).get
    assert(dotLine.trim.startsWith("*("), s"graft_dot not codegen'd:\n$plan")
    val norms = df.collect().map(_.getDouble(0))
    assert(norms.length == 500 && norms.forall(_ > 0.0))
  }

  test("graft_lsh_bands: codegen agrees with interpreted eval, codes are stable") {
    val s = registered()
    // parquet-backed (a local Seq relation gets constant-folded at plan
    // time, bypassing both codegen paths entirely)
    def base = graft.Tables.load(s, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("vec_id AS id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    def df = base.selectExpr("id", "graft_lsh_bands(v, 7, 128, 16, 64) AS codes")

    // compiled vs interpreted expression evaluation must agree bit-for-bit.
    // BOTH knobs matter: wholeStage=false alone still uses generated
    // (non-whole-stage) projections, and factoryMode alone doesn't disable
    // whole-stage codegen; the DataFrame is REBUILT per run because
    // executedPlan caches on first collect.
    def run(wholeStage: Boolean, mode: String): Map[Long, Seq[Long]] = {
      s.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
      s.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      finally {
        s.conf.set("spark.sql.codegen.wholeStage", "true")
        s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    val compiled = run(wholeStage = true, "CODEGEN_ONLY")
    val interpreted = run(wholeStage = false, "NO_CODEGEN")
    assert(compiled == interpreted)

    // structural invariants: 16 bands of 8-bit codes
    compiled.values.foreach { codes =>
      assert(codes.length == 16)
      assert(codes.forall(c => c >= 0 && c < 256))
    }
    // scale invariance: positive scaling (incl. graft_unit) preserves every
    // sign bit, so unit-normalized vectors bucket identically to raw ones
    val scaled = base.selectExpr("id",
        "graft_lsh_bands(graft_unit(v), 7, 128, 16, 64) AS codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(scaled == compiled)
    // the projection sits inside whole-stage codegen
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_lsh_bands")).get
    assert(line.trim.startsWith("*("), s"graft_lsh_bands not codegen'd:\n$plan")
  }

  test("graft_int8_stats: codegen agrees with interpreted eval, stats are sane") {
    val s = registered()
    def base = graft.Tables.load(s, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("vec_id AS id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    def df = base.selectExpr("id", "graft_int8_stats(v) AS st")

    def run(wholeStage: Boolean, mode: String): Map[Long, Seq[Double]] = {
      s.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
      s.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
      finally {
        s.conf.set("spark.sql.codegen.wholeStage", "true")
        s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    val compiled = run(wholeStage = true, "CODEGEN_ONLY")
    val interpreted = run(wholeStage = false, "NO_CODEGEN")
    assert(compiled == interpreted)
    compiled.values.foreach { st =>
      val Seq(mx, sumQ, sumAbsQ, nz, maxErr) = st
      assert(mx > 0.0)
      assert(sumQ == sumQ.floor && sumAbsQ == sumAbsQ.floor) // integer-valued
      assert(math.abs(sumQ) <= sumAbsQ && sumAbsQ <= 127.0 * 64)
      assert(nz >= 0.0 && nz <= 64.0)
      assert(maxErr >= 0.0 && maxErr < mx / 127 + 1e-12)
    }
    // the projection sits inside whole-stage codegen
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_int8_stats")).get
    assert(line.trim.startsWith("*("), s"graft_int8_stats not codegen'd:\n$plan")
  }

  test("graft_int8_stats degenerate inputs: zero vector, empty array, null") {
    val s = registered()
    val zero = s.sql("SELECT graft_int8_stats(array(0.0D, 0.0D)) AS st")
      .collect().head.getSeq[Double](0)
    assert(zero == Seq(0.0, 0.0, 0.0, 0.0, 0.0))
    val empty = s.sql("SELECT graft_int8_stats(CAST(array() AS ARRAY<DOUBLE>)) AS st")
      .collect().head.getSeq[Double](0)
    assert(empty == Seq(0.0, 0.0, 0.0, 0.0, 0.0))
    assert(s.sql("SELECT graft_int8_stats(CAST(NULL AS ARRAY<DOUBLE>)) AS st")
      .collect().head.isNullAt(0))
  }

  test("graft_unit keeps the lambda form's degenerate semantics (NaN, null elements)") {
    val s = registered()
    // zero vector -> 0/0 = NaN elements, exactly like x / sqrt(0) did;
    // NaN compares largest in Spark AND DuckDB, so thresholds/orderings
    // over the cosine stay oracle-identical on degenerate inputs
    val zero = s.sql("SELECT graft_unit(array(0.0D, 0.0D)) AS u").collect().head
      .getSeq[Double](0)
    assert(zero.forall(_.isNaN))
    // null elements stay null; non-null elements normalize over the
    // null-as-zero norm (matching graft_dot's treatment of the self-product)
    val withNull = s.sql(
      "SELECT graft_unit(array(3.0D, CAST(NULL AS DOUBLE), 4.0D)) AS u")
      .collect().head.getSeq[java.lang.Double](0)
    assert(withNull(1) == null)
    assert(withNull(0) == 3.0 / 5.0 && withNull(2) == 4.0 / 5.0)
    // null input -> null output
    assert(s.sql("SELECT graft_unit(CAST(NULL AS ARRAY<DOUBLE>)) AS u")
      .collect().head.isNullAt(0))
  }

  test("graft_dot handles nulls and length mismatch") {
    val s = registered()
    val df = s.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS n, " +
        "graft_dot(array(1.0D, 2.0D, 99.0D), array(3.0D, 4.0D)) AS m")
    val r = df.collect().head
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 11.0) // min-length semantics
  }

  test("SQL ns_glob agrees with the Column-level ns_glob") {
    val s = registered()
    val docs = graft.Tables.floEvents(s, "/root/testdata/sf0.001")
    docs.createOrReplaceTempView("flo_sql_test")
    for (pattern <- Seq("/events/p*", "/events/error", "/**/*", "/ev[ae]nts/*")) {
      val viaSql = s.sql(
        s"SELECT count(*) FROM flo_sql_test WHERE ns_glob(namespace, '$pattern')")
        .collect().head.getLong(0)
      val viaColumn = docs.filter(
        graft.functions.ns_glob(org.apache.spark.sql.functions.col("namespace"), pattern)).count()
      assert(viaSql == viaColumn, s"pattern $pattern: sql=$viaSql column=$viaColumn")
    }
    // invalid patterns error at analysis time through SQL too
    intercept[Exception](s.sql(
      "SELECT ns_glob(namespace, '/foo**') FROM flo_sql_test").collect())
  }

  test("registration is idempotent and works via spark.sql.extensions") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(2.0D), array(3.0D))").collect().head.getDouble(0) == 6.0)
  }
  test("graft_sub: codegen agrees with interpreted eval and with plain arithmetic") {
    val s = registered()
    // parquet-backed (a local Seq relation constant-folds at plan time)
    def base = graft.Tables.load(s, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("vec_id AS id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    def df = base.selectExpr("id", "graft_sub(v, graft_unit(v)) AS d")

    def run(wholeStage: Boolean, mode: String): Map[Long, Seq[Double]] = {
      s.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
      s.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
      finally {
        s.conf.set("spark.sql.codegen.wholeStage", "true")
        s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    val compiled = run(wholeStage = true, "CODEGEN_ONLY")
    val interpreted = run(wholeStage = false, "NO_CODEGEN")
    assert(compiled == interpreted)

    // element-wise semantics vs independently computed values
    val expect = base.collect().map { r =>
      val v = r.getSeq[Double](1)
      val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      r.getLong(0) -> v.map(x => x - x / norm).toSeq
    }.toMap
    assert(compiled == expect)

    // stays inside whole-stage codegen
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_sub")).get
    assert(line.trim.startsWith("*("), s"graft_sub not codegen'd:\n$plan")

    // residual identity the index build relies on: sub then dot reconstructs
    // <q, uv> = <q, cv> + <q, uv - cv> up to IEEE reassociation
    val recon = base.limit(50).selectExpr("id",
        "graft_dot(v, v) AS full",
        "graft_dot(v, graft_unit(v)) + graft_dot(v, graft_sub(v, graft_unit(v))) AS sum2")
      .collect()
    recon.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9 * math.abs(r.getDouble(1)),
        s"reconstruction drifted: $r")
    }
  }
}
