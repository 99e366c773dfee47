package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * ANN index lifecycle scale drive: amplify the embeddings table ×N with
 * deterministically perturbed copies and measure the PERSISTED index's
 * full maintenance cycle — build, search, append, expire, rebalance — at
 * increasing corpus sizes, plus recall@5 against the exact brute-force
 * answer at each size. The point is the SCALING RATIO (like
 * [[CorpusScaleDrive]]): build is one k-means pass + one coding pass
 * (~linear), search reads only probed cell partitions (sublinear in the
 * corpus, linear in cell size at a fixed cell count), append codes only
 * the new batch against frozen artifacts, expire rewrites only affected
 * cells, rebalance is a staged full retrain (~build). A super-linear leg
 * would expose an accidental corpus-wide pass in the maintenance path
 * long before a production index hits it.
 *
 * Drive: `SPARK_GRAFT_SCALES=4,16 java ... graft.tools.AnnScaleDrive`
 * (one line per (op, factor) plus the ratio table — recorded in
 * BASELINE.md).
 */
object AnnScaleDrive {

  /** Copy k of vector id: id offset; elementwise deterministic ±3%
    * perturbation keyed on (id, k, i) so copies are near but not
    * identical (realistic near-duplicate vector growth). k=0 keeps the
    * original bits. */
  def amplify(emb: DataFrame, factor: Int): DataFrame =
    emb.crossJoin(
        emb.sparkSession.range(factor.toLong).select(col("id").as("k")))
      .select((col("vec_id") + col("k") * 10000000L).as("id"),
        when(col("k") === 0, col("v")).otherwise(
          expr("transform(v, (x, i) -> x * (1.0 + " +
            "(CAST(pmod(id * 131 + k * 31 + i, 7) AS DOUBLE) - 3.0) / 100.0))"))
          .as("v"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "4,16")
      .split(",").map(_.trim.toInt).toSeq
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftExtensions.register(s)
    import graft.operators.AnnIndex

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val base = graft.Tables.load(s, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double)]
    for (factor <- scales) {
      val dir = java.nio.file.Files.createTempDirectory(s"ann-x$factor").toString
      // 90% initial build, 10% held back for the append leg
      amplify(base, factor).write.mode("overwrite").parquet(s"$dir/emb")
      val all = s.read.parquet(s"$dir/emb").localCheckpoint(true)
      val n = all.count()
      val initial = all.filter(pmod(col("id"), lit(10)) =!= 9)
      val appendBatch = all.filter(pmod(col("id"), lit(10)) === 9)
      System.err.println(s"[ann-scale] factor $factor: $n vectors")

      def run(name: String)(f: => Unit): Unit = {
        val (sec, _) = time(f)
        results += ((name, factor, sec))
        System.err.println(f"[ann-scale] x$factor $name%-10s $sec%8.2f s")
      }

      val idx = s"$dir/index"
      run("build") {
        AnnIndex.buildIvfPq(initial, dim = 64, path = idx, cells = 16,
          subs = 8, codes = 64, lloydIters = 1)
      }
      val queries = all.filter(col("id") < 10).localCheckpoint(true)
      run("search") {
        AnnIndex.searchIvfPq(s, idx, queries, k = 5, rerank = 100).count()
      }
      run("append") {
        AnnIndex.append(s, idx, appendBatch)
      }
      run("expire") {
        AnnIndex.expire(s, idx, all.filter(pmod(col("id"), lit(20)) === 7)
          .select("id"))
      }
      run("rebalance") {
        AnnIndex.rebalance(s, idx)
      }
      // recall@5 vs exact brute on the surviving corpus (post-expire) —
      // the maintenance cycle must not cost correctness
      val survivors = all.filter(pmod(col("id"), lit(20)) =!= 7)
        .select(col("id"), expr("graft_unit(v)").as("u")).localCheckpoint(true)
      val qs = survivors.filter(col("id") < 10)
        .select(col("id").as("query_id"), col("u").as("qu"))
      val brute = qs.join(survivors, col("id") =!= col("query_id"))
        .select(col("query_id"), col("id"),
          expr("graft_dot(qu, u)").as("cs"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("cs").desc, col("id"))))
        .filter(col("rk") <= 5)
        .select(col("query_id"), col("id"))
      val got = AnnIndex.searchIvfPq(s, idx,
          survivors.filter(col("id") < 10).select(col("id"), col("u").as("v")),
          k = 5, rerank = 100)
        .select(col("query_id"), col("neighbor_id").as("id"))
      val hit = got.join(brute, Seq("query_id", "id")).count().toDouble
      val recall = hit / brute.count()
      System.err.println(f"[ann-scale] x$factor recall@5 = $recall%.3f")
      results += (("recall_milli", factor, math.floor(recall * 1000)))
    }
    results.foreach { case (op, f, v) => println(f"$op,$f,$v%.2f") }
    for (op <- results.map(_._1).distinct if op != "recall_milli") {
      val by = results.filter(_._1 == op).map(r => r._2 -> r._3).toMap
      if (by.size == 2) {
        val fs = by.keys.toSeq.sorted
        val ratio = (by(fs(1)) / by(fs(0))) / (fs(1).toDouble / fs(0))
        println(f"ratio,$op,$ratio%.2f")
      }
    }
    s.stop()
  }
}
