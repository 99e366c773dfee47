package graft.queries

import scala.sys.process._

import graft.{SparkEntry, SparkSuite}

/** Checker-parity bar (round-8): every oracle-checked query's DuckDB
  * result type must survive the driver's Arrow fetch with value identity
  * intact. DuckDB `SUM(BIGINT)` returns HUGEINT (int128); Arrow has no
  * int128, so that column lands as float64 and `49` hashes != `49.0` —
  * exactly how four round-7 oracles shipped "green" against the local
  * `fetchall()` checker and failed the driver. This bar DESCRIBEs every
  * `SparkEntry.oracleSql` entry through DuckDB and fails on any result
  * column whose type is outside the Arrow-faithful allowlist
  * (BIGINT/INTEGER/DOUBLE/VARCHAR/BOOLEAN/DATE/TIMESTAMP — no HUGEINT,
  * no DECIMAL), so the hazard can never ship again. Mirrors the same
  * allowlist enforced at compare time by `tools/oracle_check.py`.
  *
  * DuckDB is driver-side tooling (not a library dependency), so the bar
  * shells out to the container's python3 + duckdb and cancels cleanly
  * where that tooling is absent — the library itself stays Spark-only.
  */
class OracleTypeGuardSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  // JSON escape shared with Verify's oracle_sql.json dump
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("every oracle's DuckDB result type is Arrow-faithful (no HUGEINT/DECIMAL)") {
    val duckOk = scala.util.Try(
      Seq("python3", "-c", "import duckdb").! == 0).getOrElse(false)
    assume(duckOk, "python3+duckdb unavailable (driver-side tooling)")

    // fixture-reading oracles (read_parquet over Fixtures.root exports)
    // need their fixture files on disk before DESCRIBE can bind the scan:
    // run the exporting Spark queries first — the driver's own order (all
    // queries, then all oracles)
    val fixtureReaders = SparkEntry.oracleSql
      .filter(_._2.contains(graft.Fixtures.root)).keys.toSeq.sorted
    // .get instead of apply: an orphan oracle (SQL left behind after its
    // query was removed — the set `Cli catalog` tracks) should fail the
    // DESCRIBE sweep descriptively, not die here on NoSuchElementException
    fixtureReaders.foreach { n =>
      SparkEntry.queries.get(n).foreach(
        _(spark, sf).write.format("noop").mode("overwrite").save())
    }

    val dir = java.nio.file.Files.createTempDirectory("oracle_types")
    val sqlJson = dir.resolve("oracle_sql.json")
    java.nio.file.Files.writeString(sqlJson,
      SparkEntry.oracleSql.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }
        .mkString("{", ",", "}"))
    val script = dir.resolve("describe_sweep.py")
    java.nio.file.Files.writeString(script,
      """import json, sys
        |import duckdb
        |ALLOW = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
        |         "DATE", "TIMESTAMP"}
        |sf, path = sys.argv[1], sys.argv[2]
        |con = duckdb.connect()
        |for t in ["region", "nation", "customer", "supplier", "part",
        |          "orders", "lineitem", "events", "documents", "embeddings"]:
        |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        |bad = []
        |for name, sql in sorted(json.load(open(path)).items()):
        |    try:
        |        for cn, ct, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
        |            if ct not in ALLOW:
        |                bad.append(f"{name}.{cn}: {ct}")
        |    except Exception as e:
        |        bad.append(f"{name}: DESCRIBE failed: {str(e)[:200]}")
        |for b in bad:
        |    print("BAD " + b)
        |print(f"SWEPT {len(json.load(open(path)))}")
        |""".stripMargin)
    val out = Seq("python3", script.toString, sf, sqlJson.toString).!!
    val bad = out.linesIterator.filter(_.startsWith("BAD")).toSeq
    assert(bad.isEmpty,
      s"oracle result types the driver's Arrow fetch would mangle:\n${bad.mkString("\n")}")
    val swept = out.linesIterator.find(_.startsWith("SWEPT"))
      .map(_.stripPrefix("SWEPT ").trim.toInt).getOrElse(0)
    assert(swept == SparkEntry.oracleSql.size, s"sweep covered $swept oracles")
  }

  test("fixture-reading oracles all resolve their path through Fixtures.root") {
    // a fixture path hardcoded in oracle SQL (instead of interpolating the
    // shared Fixtures val) would silently split from the Spark-side export
    // the moment GRAFT_FIXTURE_DIR moves the root — both sides must point
    // at the same bits or the _verified protocol proves nothing
    val rogue = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.contains("graft_fixtures") && !sql.contains(graft.Fixtures.root)
    }.keys.toSeq.sorted
    assert(rogue.isEmpty,
      s"oracles with a fixture path outside Fixtures.root: ${rogue.mkString(", ")}")
  }
}
