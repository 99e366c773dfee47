package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Fixed-point PageRank against a driver-side reference of the same
  * integer recurrence. */
class PageRankSpec extends SparkSuite {

  private val Scale = 1000000000L
  private val Base = 150000000L

  /** Reference: same edge derivation (shared chunk, df-capped) and the
    * same integer recurrence, computed naively on the driver. */
  private def reference(
      docs: Seq[(Long, Seq[String])], iterations: Int): Map[Long, Long] = {
    val byChunk = docs.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      .filter { case (_, ds) => ds.size >= 2 && ds.size <= 50 }
    val edges = byChunk.values.flatMap { ds =>
      for (a <- ds; b <- ds if a != b) yield (a, b)
    }.toSet
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = docs.map { case (id, _) => id -> Scale }.toMap
    for (_ <- 1 to iterations) {
      val sums = edges.toSeq
        .map { case (s, d) => d -> pr(s) / outdeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = docs.map { case (id, _) =>
        id -> (Base + 85L * sums.getOrElse(id, 0L) / 100L)
      }.toMap
    }
    pr
  }

  test("ranks match the reference recurrence; isolated docs hold the base rank") {
    import spark.implicits._
    def chunk(tag: String): String = (1 to 10).map(i => s"$tag$i").mkString(" ")
    val (ca, cb, cc) = (chunk("a"), chunk("b"), chunk("c"))
    // star-ish: 1-2 share ca; 2-3-4 share cb (2 is the hub); 4-5 share cc;
    // 6 isolated
    val docs = Seq(
      1L -> Seq(ca), 2L -> Seq(ca, cb), 3L -> Seq(cb),
      4L -> Seq(cb, cc), 5L -> Seq(cc), 6L -> Seq(chunk("z")))
    val df = docs.map { case (id, cs) => (id, cs.mkString(" ")) }
      .toDF("doc_id", "text").repartition(3)
    val got = CorpusOps.docGraphPageRank(df, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference(docs, 5)
    assert(got == want)
    assert(got(6L) == Base, "isolated doc must hold the base rank")
    // the hub (degree 3) outranks the leaves; 2 and 4 mirror each other
    // (degree 3 vs 2 — not symmetric), 1 and 5 do (leaf of hub/semi-hub)
    assert(got(2L) > got(1L) && got(2L) > got(3L))
    assert(got(4L) > got(5L))
  }

  test("deterministic across partitionings and repeated runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = (1 to 40).map("w" + _)
    val docs = (1L to 30L).map { id =>
      (id, Seq.fill(20)(vocab(rnd.nextInt(40))).mkString(" "))
    }
    val a = CorpusOps.docGraphPageRank(docs.toDF("doc_id", "text").repartition(1))
      .collect().toSeq
    val b = CorpusOps.docGraphPageRank(docs.toDF("doc_id", "text").repartition(7))
      .collect().toSeq
    assert(a == b)
  }

  // ------------------------------------------------- docGraphCommunities

  test("LPA: a narrow bridge does NOT merge two dense groups (unlike components)") {
    import spark.implicits._
    def chunk(tag: String): String = (1 to 10).map(i => s"$tag$i").mkString(" ")
    // clique A = docs 1-4 (identical chunk X), clique B = docs 11-14
    // (chunk Y), doc 21 bridges both (text = X ++ Y), doc 99 isolated
    val docs = (Seq(1L, 2L, 3L, 4L).map(id => (id, chunk("x"))) ++
      Seq(11L, 12L, 13L, 14L).map(id => (id, chunk("y"))) ++
      Seq((21L, chunk("x") + " " + chunk("y")), (99L, chunk("z"))))
      .toDF("doc_id", "text")
    val com = CorpusOps.docGraphCommunities(docs, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique coheres internally...
    assert(Seq(1L, 2L, 3L, 4L).map(com).distinct.size === 1)
    assert(Seq(11L, 12L, 13L, 14L).map(com).distinct.size === 1)
    // ...but the bridge does not merge them — DENSITY matters to LPA
    assert(com(1L) !== com(11L))
    // the isolated doc keeps its own id
    assert(com(99L) === 99L)
    // contrast: min-id closure sees ONE component across the same bridge
    val c = CorpusOps.docChunks(docs).distinct()
    val edgePairs = c.as("a").join(c.as("b"), "chunk")
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b")).distinct()
    val labels = CorpusOps.connectedComponents(edgePairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) === labels(11L), "components DO merge across the bridge")
  }

  test("k-core: a 5-clique survives the k=3 peel, a star is fully peeled; fixpoint reached") {
    import spark.implicits._
    def chunk(tag: String): String = (1 to 10).map(i => s"$tag$i").mkString(" ")
    // clique: docs 1-5 share one chunk (complete K5, degree 4 each);
    // star: hub 20 shares a DISTINCT chunk with each of 21-24 (hub degree
    // 4, leaves degree 1 -> leaves peel, then the hub)
    val docs = (Seq(1L, 2L, 3L, 4L, 5L).map(id => (id, chunk("k"))) ++
      Seq((20L, (1 to 4).map(i => chunk(s"s$i")).mkString(" "))) ++
      (1 to 4).map(i => (20L + i, chunk(s"s$i"))))
      .toDF("doc_id", "text")
    val core = CorpusOps.docGraphKCore(docs, kCore = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet === Set(1L, 2L, 3L, 4L, 5L), core.toString)
    assert(core.values.forall(_ === 4L), core.toString)
    // fixpoint: one more round changes nothing
    val more = CorpusOps.docGraphKCore(docs, kCore = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more === core)
  }

  test("LPA: deterministic across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = (1 to 30).map("v" + _)
    val docs = (1L to 40L).map { id =>
      (id, Seq.fill(20)(vocab(rnd.nextInt(30))).mkString(" "))
    }
    val a = CorpusOps.docGraphCommunities(docs.toDF("doc_id", "text").repartition(1))
      .collect().sortBy(_.getLong(0)).toSeq
    val b = CorpusOps.docGraphCommunities(docs.toDF("doc_id", "text").repartition(7))
      .collect().sortBy(_.getLong(0)).toSeq
    assert(a == b)
  }
}
