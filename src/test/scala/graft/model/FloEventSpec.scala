package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Event-id format/parse semantics (flo-event/src/lib.rs:73-132). */
class FloEventSpec extends AnyFunSuite {

  test("id displays as counter.partition (lib.rs:73-97)") {
    assert(FloEvent.formatId(8L, 1) == "8.1")
    assert(FloEvent.formatId(0L, 0) == "0.0")
  }

  test("id parses from counter.partition") {
    assert(FloEvent.parseId("8.1").contains((8L, 1)))
    assert(FloEvent.parseId("123456789.65535").contains((123456789L, 65535)))
    assert(FloEvent.parseId("garbage").isEmpty)
    assert(FloEvent.parseId("1.2.3").isEmpty)
    assert(FloEvent.parseId("x.1").isEmpty)
  }

  test("id ordering is (counter, partition) lexicographic (lib.rs:164-182)") {
    val ids = Seq((5L, 2), (1L, 9), (5L, 1), (2L, 1))
    assert(ids.sorted == Seq((1L, 9), (2L, 1), (5L, 1), (5L, 2)))
  }

  test("envelope schema matches the case-class encoder shape") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val enc = ExpressionEncoder[FloEvent]()
    assert(enc.schema.fieldNames.toSeq ==
      FloSchema.eventType.fieldNames.toSeq)
  }
}
