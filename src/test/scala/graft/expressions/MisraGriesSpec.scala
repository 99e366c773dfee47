package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The Misra–Gries frequent-items aggregate (`graft_heavy_hitters`) and the
  * two-pass exact heavy-hitters plan built on it. */
class MisraGriesSpec extends SparkSuite {

  private def sketch(items: Seq[String], k: Int, parts: Int): Seq[(String, Long)] = {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = items.toDF("item").repartition(parts)
    df.agg(call_function("graft_heavy_hitters", col("item"), lit(k)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count_lb"))
      .as[(String, Long)].collect().toSeq
  }

  test("guarantee: every item with freq > n/(k+1) survives, across partitionings") {
    val rnd = new scala.util.Random(11)
    // adversarial mix: two genuinely heavy items drowned in a long tail of
    // near-unique noise, so the counter budget is under constant pressure
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta")
    val tail = (1 to 2000).map(i => "noise" + rnd.nextInt(1500))
    val items = rnd.shuffle(heavy ++ tail)
    val n = items.size
    for (parts <- Seq(1, 4, 13); k <- Seq(8, 32)) {
      val got = sketch(items, k, parts)
      assert(got.size <= k)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
      val mustSurvive = exact.filter(_._2 > n.toLong / (k + 1)).keySet
      val surviving = got.map(_._1).toSet
      assert(mustSurvive.subsetOf(surviving),
        s"k=$k parts=$parts missing ${mustSurvive -- surviving}")
      // count_lb is a LOWER bound within n/(k+1) of the truth
      got.foreach { case (item, lb) =>
        val truth = exact.getOrElse(item, 0L)
        assert(lb <= truth, s"$item: lb $lb above truth $truth")
        assert(truth - lb <= n.toLong / (k + 1) + 1,
          s"$item: error ${truth - lb} exceeds bound")
      }
    }
  }

  test("no decrements when distinct items fit the budget: counts are exact") {
    val items = Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c")
    val got = sketch(scala.util.Random.shuffle(items), k = 10, parts = 3).toMap
    assert(got == Map("a" -> 7L, "b" -> 5L, "c" -> 2L))
  }

  test("eval order is count-desc with item tiebreak; nulls are ignored") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq(Some("b"), Some("a"), Some("a"), Some("b"), None, Some("c"))
      .toDF("item")
    val arr = df.agg(call_function("graft_heavy_hitters", col("item"), lit(10)))
      .collect()(0).getSeq[Row](0)
    assert(arr.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("two-pass heavy hitters equals the full-vocabulary GROUP BY plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val words = Seq("the", "of", "and") ++ (1 to 300).map("w" + _)
    // zipf-ish draw: heavy head + long tail, 80 docs
    val docs = (1 to 80).map { id =>
      val body = (1 to 60).map { _ =>
        val r = rnd.nextInt(10)
        if (r < 3) words(r) else words(3 + rnd.nextInt(300))
      }.mkString(" ")
      (id.toLong, body)
    }.toDF("doc_id", "text").repartition(5)
    val got = graft.operators.CorpusOps.heavyHitters(docs, k = 120, denom = 100)
    val tokens = docs.select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(length(col("tok")) >= 2)
    val n = tokens.count()
    val exact = tokens.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100 >= n)
      .orderBy(col("cnt").desc, col("tok"))
    assert(got.collect().toSeq == exact.collect().toSeq)
    assert(got.count() > 0) // the test corpus really has heavy tokens
  }
}
