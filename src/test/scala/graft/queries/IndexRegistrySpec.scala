package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/**
 * [[SimilarityQueries.indexServingQueries]] must stay exactly the set of
 * catalog queries whose bodies call ensureIndex/ensureAppendedIndex: Bench
 * keys its outside-the-timing index pre-build on the registry, so a
 * serving query missing from it silently re-absorbs the k-means build
 * into its first timed serve (the r7 budget breach), and a stale entry
 * pre-builds for runs that never read the index. The check scrapes the
 * query source the same way a reviewer would: map each ensure* call site
 * to the innermost enclosing `"name" -> ((s, d) =>` catalog entry.
 */
class IndexRegistrySpec extends AnyFunSuite {

  private val queryFiles = Seq(
    "src/main/scala/graft/queries/SimilarityQueries.scala",
    "src/main/scala/graft/queries/DedupQueries.scala",
    "src/main/scala/graft/queries/PipelineQueries.scala",
    "src/main/scala/graft/queries/TextQueries.scala",
    "src/main/scala/graft/queries/AnalyticsQueries.scala",
    "src/main/scala/graft/queries/MultimodalQueries.scala",
    "src/main/scala/graft/queries/DedupVerifiedQueries.scala",
    "src/main/scala/graft/queries/FloQueries.scala",
    "src/main/scala/graft/queries/ScalarQueries.scala",
    "src/main/scala/graft/queries/TpchQueries.scala")

  test("registry equals the ensureIndex call sites in the catalog source") {
    val entry = """"([a-z0-9_]+)" -> \(\(""".r
    val fromSource = queryFiles
      .map(java.nio.file.Paths.get(_))
      .filter(java.nio.file.Files.exists(_))
      .flatMap { p =>
        val lines = java.nio.file.Files.readAllLines(p)
        var current: Option[String] = None
        val hits = Seq.newBuilder[String]
        lines.forEach { l =>
          entry.findFirstMatchIn(l).foreach(m => current = Some(m.group(1)))
          val call = (l.contains("ensureIndex(") ||
            l.contains("ensureAppendedIndex(")) &&
            !l.trim.startsWith("//") && !l.contains("def ensure")
          if (call) current.foreach(hits += _)
        }
        hits.result()
      }
      .toSet
    assert(fromSource.nonEmpty, "scrape found no call sites — pattern drift")
    assert(fromSource == SimilarityQueries.indexServingQueries,
      s"registry drift: source-only=${fromSource -- SimilarityQueries.indexServingQueries}, " +
        s"registry-only=${SimilarityQueries.indexServingQueries -- fromSource}")
  }

  test("every registry entry is a real catalog query") {
    val catalog = graft.SparkEntry.queries.keySet
    val ghosts = SimilarityQueries.indexServingQueries -- catalog
    assert(ghosts.isEmpty, s"registry names unknown queries: $ghosts")
  }

  // the quality-model registry: same protocol, same failure mode (a new
  // consumer calling ensureModel without a registry entry would pay model
  // training inside its first timed pass on a cold suite — the r9
  // pipe_curriculum budget breach)
  test("quality registry equals the ensureModel call sites in the catalog source") {
    val entry = """"([a-z0-9_]+)" -> \(\(""".r
    val fromSource = queryFiles
      .map(java.nio.file.Paths.get(_))
      .filter(java.nio.file.Files.exists(_))
      .flatMap { p =>
        val lines = java.nio.file.Files.readAllLines(p)
        var current: Option[String] = None
        val hits = Seq.newBuilder[String]
        lines.forEach { l =>
          entry.findFirstMatchIn(l).foreach(m => current = Some(m.group(1)))
          val call = l.contains("ensureModel(") &&
            !l.trim.startsWith("//") && !l.contains("def ensure")
          if (call) current.foreach(hits += _)
        }
        hits.result()
      }
      .toSet
    assert(fromSource.nonEmpty, "scrape found no call sites — pattern drift")
    assert(fromSource == TextQueries.qualityModelServingQueries,
      s"registry drift: source-only=${fromSource -- TextQueries.qualityModelServingQueries}, " +
        s"registry-only=${TextQueries.qualityModelServingQueries -- fromSource}")
  }

  test("every quality registry entry is a real catalog query") {
    val catalog = graft.SparkEntry.queries.keySet
    val ghosts = TextQueries.qualityModelServingQueries -- catalog
    assert(ghosts.isEmpty, s"registry names unknown queries: $ghosts")
  }
}
