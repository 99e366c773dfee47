package graft.tools

import graft.SparkSuite

/**
 * Smoke for the persisted-dedup-index CLI verbs: `init-dedup-index`,
 * `ingest-dedup-batch` (which must surface the [[graft.operators.CorpusOps.
 * ppjoinPrefixAudit]] pre-join readout per batch — the run-exact-dedup-
 * first discipline has to reach the operator driving ingestion), and
 * `compact-dedup-index`.
 */
class CliDedupSpec extends SparkSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val p = tempDir("cli-docs")
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(p)
    p
  }

  private def runCli(args: String*): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.main(args.toArray)
    }
    new String(out.toByteArray, "UTF-8")
  }

  test("init + ingest (with prefix-audit readout) + compact round-trip") {
    val root = tempDir("cli-root")
    val idx = s"${tempDir("cli-idx")}/index"
    val seed = writeDocs(Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      11L -> "one two three four five six seven eight nine ten"))
    val b1 = writeDocs(Seq(
      30L -> "alpha beta gamma delta epsilon zeta eta theta iota",
      31L -> "fresh independent content entirely new tokens appearing once"))

    assert(runCli(root, "init-dedup-index", idx, seed)
      .contains("initialized dedup index"))

    val ingest1 = runCli(root, "ingest-dedup-batch", idx, seed)
    assert(ingest1.contains("prefix-audit decade="),
      s"ingest must print the per-decade prefix audit:\n$ingest1")
    assert(ingest1.contains("implied_pairs="), ingest1)
    assert(ingest1.contains("kept 2"), ingest1)

    // 30 dups accepted 10; the audit line appears for every batch
    val ingest2 = runCli(root, "ingest-dedup-batch", idx, b1)
    assert(ingest2.contains("prefix-audit decade="), ingest2)
    assert(ingest2.contains("kept 1: 31"), ingest2)

    val compacted = runCli(root, "compact-dedup-index", idx)
    assert(compacted.contains("folded 3 batches"), compacted)
    // the folded index still serves: re-ingesting the dup batch keeps
    // only the fresh doc again (31 now dups its accepted self)
    val ingest3 = runCli(root, "ingest-dedup-batch", idx, b1)
    assert(ingest3.contains("kept 0"), ingest3)
  }
}
