package graft

/**
 * Root directory for the parquet fixtures that `_verified` twin queries
 * and learned-model oracles export (candidate windows, codebooks,
 * fixed-point log tables, …). Both engines consume the same bits: the
 * Spark query writes here, and the generated DuckDB oracle SQL
 * interpolates the same path — so the pair can only be moved TOGETHER,
 * which `GRAFT_FIXTURE_DIR` does for the whole JVM.
 *
 * Why it exists: the path is shared per machine, so two concurrent
 * fixture-writing runs (a Verify sweep and an `sbt test`, or two
 * Verifies at different SFs) clobber each other mid-read. Point each
 * concurrent run at its own `GRAFT_FIXTURE_DIR` to isolate them. The
 * driver's sequential Verify→DuckDB pipeline needs no override — the
 * default keeps its round-7-compatible location.
 */
object Fixtures {
  val root: String = sys.env.getOrElse("GRAFT_FIXTURE_DIR", "/tmp/graft_fixtures")

  def path(name: String): String = s"$root/$name"
}
