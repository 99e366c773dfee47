package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Real-vocab BPE training drive: prove the in-process merge loop
 * ([[graft.operators.CorpusOps.bpeMergeLoop]]) sustains production merge
 * counts (32k, the GPT-2/sentencepiece ballpark) in seconds, where the
 * distributed per-round formulation would schedule one Spark job + one
 * driver collect per merge (fine at the catalog's 12, hours of scheduler
 * overhead at 32k).
 *
 * Two legs, both ONE Spark job for the corpus pass then in-process:
 *  - word-level (the [[graft.operators.CorpusOps.bpeTrainFast]] path):
 *    the testdata vocabulary is tiny (31 words), so this leg measures the
 *    full pipeline shape but dries up after a few dozen merges — recorded
 *    for completeness.
 *  - doc-level character units: each distinct document text is one
 *    pre-token (the sentencepiece-without-whitespace shape), giving
 *    ~1.5M symbols at sf0.1 — enough pair structure to sustain tens of
 *    thousands of merges. This is the real-vocab measurement.
 *
 * Drive: `sbt "runMain graft.tools.BpeScaleDrive"` (env:
 * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_BPE_MERGES). Results → BASELINE.md.
 */
object BpeScaleDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "32768").toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = graft.Tables.load(s, sfDir, "documents")

    // leg 1: the production word-level path end to end
    val (wordMerges, tWord) = time {
      graft.operators.CorpusOps.bpeTrainFast(docs, numMerges).count()
    }
    println(f"[bpe-drive] word-level: requested $numMerges%d, learned " +
      f"$wordMerges%d merges in $tWord%.2f s (corpus pass + loop)")

    // leg 2: doc-level character units — the real-vocab scale measurement.
    // One corpus-sized aggregation (distinct text + weight), one collect
    // of the unit table, then the loop alone is timed separately so the
    // scheduler-free claim is explicit.
    val (units, tAgg) = time {
      docs.select(lower(trim(col("text"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect()
        .map { case (t, n) => ((t.map(_.toString) :+ "</w>").toArray, n) }
    }
    val totalSyms = units.map(_._1.length.toLong).sum
    println(f"[bpe-drive] doc-char units: ${units.length}%d units, " +
      f"$totalSyms%d symbols, corpus pass + collect $tAgg%.2f s")
    val (docMergeRules, tLoop) = time {
      graft.operators.CorpusOps.bpeMergeLoop(units, numMerges)
    }
    println(f"[bpe-drive] doc-char loop: requested $numMerges%d, learned " +
      f"${docMergeRules.length}%d merges in $tLoop%.2f s " +
      f"(${docMergeRules.length / math.max(tLoop, 1e-9)}%.0f merges/s, zero Spark jobs)")

    // encode leg: every distinct doc unit through the FULL learned rule
    // table via the rank-priority encoder — the path a 32k-rule
    // deployment tokenizes with (the sequential walk would do
    // |rules| passes per unit)
    val rankOf: Map[(String, String), Int] = docMergeRules
      .map { case (r, a, b, _) => (a, b) -> r }.toMap
    val (totalTokens, tEnc) = time {
      units.iterator.map { case (arr, n) =>
        graft.operators.CorpusOps
          .encodeWordFast(arr.dropRight(1).mkString, rankOf).length * n
      }.sum
    }
    println(f"[bpe-drive] encode: ${units.length}%d units -> $totalTokens%d " +
      f"weighted tokens in $tEnc%.2f s under ${rankOf.size}%d rules " +
      f"(${totalSyms / math.max(tEnc, 1e-9)}%.0f symbols/s)")
    s.stop()
  }
}
