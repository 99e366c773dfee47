package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The sketch-guided exact quantile against the percentile() ground truth. */
class QuantilesSpec extends SparkSuite {

  private val ps = Seq(0.25, 0.5, 0.75)

  private def viaOperator(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
    Quantiles.exactQuantiles(df, Seq("l_returnflag"), "l_extendedprice", ps)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        ps.indices.map(i => r.getAs[Double](s"q_$i"))).toMap

  private def viaPercentile(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
    df.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("p"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getSeq[Double](1).toIndexedSeq).toMap

  test("matches percentile() bit-for-bit on real data at two SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val li = graft.Tables.load(spark, d, "lineitem")
      val got = viaOperator(li)
      val expect = viaPercentile(li)
      assert(got.keySet == expect.keySet)
      got.foreach { case (flag, qs) =>
        // identical interpolation arithmetic -> exact double equality
        assert(qs == expect(flag), s"$d $flag: $qs vs ${expect(flag)}")
      }
    }
  }

  test("edge cases: single-row group, heavy duplicates, p = 0 and 1") {
    import spark.implicits._
    val df = (Seq(("a", 42.0)) ++
      (1 to 500).map(i => ("b", if (i <= 400) 7.0 else i.toDouble)) ++
      (1 to 9).map(i => ("c", i.toDouble)))
      .toDF("l_returnflag", "l_extendedprice")
    val full = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val got = Quantiles.exactQuantiles(
        df, Seq("l_returnflag"), "l_extendedprice", full)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        full.indices.map(i => r.getAs[Double](s"q_$i"))).toMap
    val expect = df.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.0D, 0.25D, 0.5D, 0.75D, 1.0D))").as("p"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getSeq[Double](1).toIndexedSeq).toMap
    assert(got == expect, s"got $got expected $expect")
  }

  test("plan shape: no exact Percentile aggregate, brackets broadcast, window bounded per target") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val q = Quantiles.exactQuantiles(li, Seq("l_returnflag"), "l_extendedprice", ps)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!"(?<!approx_)percentile\\(".r.findFirstIn(opt).isDefined,
      "the exact Percentile aggregate (O(group rows) buffer) must not appear")
    assert(opt.contains("percentile_approx") || opt.contains("approx_percentile"),
      "the sketch stage must exist")
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), phys.take(800))
    q.collect()
  }
}
