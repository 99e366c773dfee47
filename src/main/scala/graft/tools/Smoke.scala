package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Dev smoke-drive: exercises the public library surface end-to-end against
 * the driver-provided testdata (see FIXTURES.md §3 bridging fixture).
 * Run: `sbt "runMain graft.tools.Smoke [sfDir]"`.
 */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ev = graft.Tables.floEvents(spark, sfDir)
    println("TOTAL=" + ev.count())

    val filtered = ev.filter(ns_glob($"namespace", "/events/p*")).orderBy($"event_counter")
    println("GLOB_P=" + filtered.count())
    filtered.select($"namespace",
      event_id_str($"event_counter", $"partition").as("id"),
      payload_json($"data", "$.k").as("k")).show(5, false)
    println("DISTINCT_NS=" + ev.filter(ns_glob($"namespace", "/events/p*"))
      .select("namespace").distinct().collect().map(_.getString(0)).sorted.mkString(","))

    println("MATCHALL_PLAN=" + ev.filter(ns_glob($"namespace", "/**/*"))
      .queryExecution.optimizedPlan.toString.linesIterator.take(2).mkString(" | "))

    try { ev.filter(ns_glob($"namespace", "/foo**")); println("ERR=NONE (BUG)") }
    catch { case e: Exception => println("ERR=" + e.getMessage) }

    println("LITERAL=" + ev.filter(ns_glob($"namespace", "/events/purchase")).count())
    println("LITERAL_PLAN=" + ev.filter(ns_glob($"namespace", "/events/purchase"))
      .queryExecution.optimizedPlan.toString.linesIterator.take(2).mkString(" | "))
    spark.stop()
  }
}
