package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * graft_nfc + the text_unicode_clean pass. The real-corpus oracle runs on
 * (mostly ASCII) testdata, so the unicode behavior is pinned here on
 * planted fixtures: composed/decomposed equivalence, control stripping,
 * the mojibake flag, and interpreted-vs-codegen path equality.
 *
 * Fixtures are built from explicit code points ("e" + U+0301 etc.) so the
 * source file stays ASCII and no editor/toolchain can silently normalize
 * the very thing under test.
 */
class NfcNormalizeSpec extends SparkSuite {

  import spark.implicits._

  private val Acute = "\u0301"   // combining acute accent
  private val EAcute = "\u00e9"  // precomposed e-acute
  private val Repl = "\ufffd"    // replacement character

  private def nfc(df: org.apache.spark.sql.DataFrame) = {
    GraftExtensions.register(spark)
    df.withColumn("out", call_function("graft_nfc", col("s")))
  }

  test("NFD input composes to NFC; already-NFC input is unchanged") {
    val decomposed = s"cafe$Acute re${Acute}sume$Acute"
    val composed = s"caf$EAcute r${EAcute}sum$EAcute"
    val rows = nfc(Seq((1L, decomposed), (2L, composed)).toDF("id", "s"))
      .orderBy("id").select("out").collect().map(_.getString(0))
    assert(rows(0) === composed, "NFD must compose")
    assert(rows(1) === composed, "NFC input must pass through")
  }

  test("interpreted helper and codegen path agree, plan stays in whole-stage codegen") {
    val data = Seq((1L, s"cafe$Acute"), (2L, "ascii only"),
      (3L, "A\u030aA\u030a")).toDF("id", "s")
    val viaCodegen = nfc(data).orderBy("id").select("out").collect().map(_.getString(0))
    val direct = data.orderBy("id").collect().map { r =>
      NfcNormalize.nfc(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1))).toString
    }
    assert(viaCodegen.toSeq === direct.toSeq)
    assert(viaCodegen(2) === "\u00c5\u00c5", "A + ring must compose to Aring")
    // plan pin over a REAL scan: a local fixture folds through
    // ConvertToLocalRelation (the optimizer evaluates the projection at
    // plan time), so the codegen span only exists over a file source
    val scan = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = nfc(scan.select(col("doc_id"), col("text").as("s")))
      .queryExecution.executedPlan.toString
    // the *(n) prefix is the whole-stage-codegen marker in the compact
    // plan string; a CodegenFallback expression would strip it from the
    // projection that carries graft_nfc
    assert("""\*\(\d+\) Project .*graft_nfc""".r.findFirstIn(plan).isDefined,
      s"graft_nfc must not break the codegen span:\n$plan")
  }

  test("the unicode-clean pass strips controls, collapses whitespace, flags mojibake") {
    GraftExtensions.register(spark)
    val docs = Seq(
      (1L, "abc"), // controls stripped
      (2L, "  x \t\n y  "),          // trim + collapse
      (3L, s"bad $Repl byte"),       // replacement char flagged
      (4L, s"cafe$Acute")            // NFD -> NFC
    ).toDF("doc_id", "text")
    val stripped = regexp_replace(col("text"),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val collapsed = regexp_replace(trim(stripped), "[ \\t\\n\\r]+", " ")
    val out = docs
      .withColumn("clean", call_function("graft_nfc", collapsed))
      .withColumn("has_repl", instr(col("text"), Repl) > 0)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean") === "abc")
    assert(out(1).getAs[String]("clean") === "x y")
    assert(out(2).getBoolean(out(2).fieldIndex("has_repl")))
    assert(out(3).getAs[String]("clean") === s"caf$EAcute")
    assert(!out(0).getBoolean(out(0).fieldIndex("has_repl")))
  }

  test("null and empty inputs survive") {
    val rows = nfc(Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("id", "s"))
      .orderBy("id").select("out").collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getString(0) === "")
  }
}
