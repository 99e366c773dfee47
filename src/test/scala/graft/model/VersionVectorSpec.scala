package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's version-vector algebra tests
  * (flo-event/src/version_vec.rs:101-235). */
class VersionVectorSpec extends AnyFunSuite {

  test("update requires strictly increasing counters (version_vec.rs:47-55)") {
    val vv = VersionVector.empty
    val v1 = vv.update(1, 5).toOption.get
    assert(v1.get(1) == 5L)
    assert(v1.update(1, 5).isLeft)
    assert(v1.update(1, 4).isLeft)
    assert(v1.update(1, 6).isRight)
    // 0 <= 0 is a regress too (covered by the reference's own tests);
    // read-from-start is expressed with set()/zero(), not update()
    assert(vv.update(2, 0).isLeft)
  }

  test("get returns 0 for absent partitions (version_vec.rs:76-78)") {
    assert(VersionVector.empty.get(7) == 0L)
    assert(VersionVector(1 -> 3L).get(1) == 3L)
  }

  test("set is unconditional (version_vec.rs:58-60)") {
    val vv = VersionVector(1 -> 9L).set(1, 2L)
    assert(vv.get(1) == 2L)
  }

  test("updateIfGreater keeps the max (version_vec.rs:70-73)") {
    val vv = VersionVector(1 -> 5L)
    assert(vv.updateIfGreater(1, 3).get(1) == 5L)
    assert(vv.updateIfGreater(1, 8).get(1) == 8L)
    assert(vv.updateIfGreater(2, 1).get(2) == 1L)
  }

  test("contains (version_vec.rs:64-66)") {
    assert(VersionVector(3 -> 1L).contains(3))
    assert(!VersionVector(3 -> 1L).contains(4))
  }

  test("snapshot is sorted by partition (version_vec.rs:81-87)") {
    assert(VersionVector(3 -> 30L, 1 -> 10L, 2 -> 20L).snapshot ==
      Seq(1 -> 10L, 2 -> 20L, 3 -> 30L))
  }

  test("min and max (version_vec.rs:90-97)") {
    val vv = VersionVector(1 -> 10L, 2 -> 3L, 3 -> 77L)
    assert(vv.min == 3L)
    assert(vv.max == 77L)
    assert(VersionVector.empty.min == 0L)
    assert(VersionVector.empty.max == 0L)
  }

  test("merge keeps per-partition maxima") {
    val a = VersionVector(1 -> 5L, 2 -> 9L)
    val b = VersionVector(1 -> 7L, 3 -> 1L)
    assert(a.merge(b).entries == Map(1 -> 7L, 2 -> 9L, 3 -> 1L))
  }

  test("zero vector reads from the beginning") {
    assert(VersionVector.zero(Seq(1, 2)).entries == Map(1 -> 0L, 2 -> 0L))
  }

  test("property: toPredicate equals the model rule on random vectors (SURVEY §7.3 #4)") {
    // model: read (p, c) iff p ∈ vv AND c > vv(p); absent partition unread
    val spark = graft.SparkSuite.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(77)
    val rows = Seq.fill(400)((rnd.nextInt(5), rnd.nextLong(20).abs))
    val df = rows.toDF("partition", "event_counter")
    (1 to 20).foreach { _ =>
      val vv = VersionVector(
        Seq.fill(rnd.nextInt(5))(rnd.nextInt(5) -> rnd.nextLong(20).abs).toMap)
      val got = df.filter(vv.toPredicate(col("partition"), col("event_counter")))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
      val want = rows.filter { case (p, c) =>
        vv.contains(p) && c > vv.entries(p)
      }.sorted
      assert(got == want, s"vv=${vv.entries}")
    }
  }

  test("property: merge is commutative and idempotent") {
    val rnd = new scala.util.Random(42)
    def gen(): VersionVector = VersionVector(
      Seq.fill(rnd.nextInt(6))(rnd.nextInt(4) -> rnd.nextLong(1000)).toMap)
    (1 to 200).foreach { _ =>
      val (va, vb) = (gen(), gen())
      assert(va.merge(vb).entries == vb.merge(va).entries)
      assert(va.merge(va).entries == va.entries)
    }
  }
}
