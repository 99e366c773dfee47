package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.EvalOps

/**
 * Live distribution-drift monitoring: per micro-batch, the exact
 * two-sample Kolmogorov-Smirnov statistic of the STREAM-SO-FAR's value
 * distribution against a frozen reference histogram — the streaming twin
 * of `pipe_ks_drift` (the gate a pipeline alarms on when an ingest change
 * shifts document lengths, score distributions, token mixes).
 *
 * State shape (100 TB): the monitor never re-reads the stream — it folds
 * each micro-batch into an accumulated (value, count) histogram, which is
 * VALUE-GRID-sized (distinct token counts / score buckets — thousands of
 * entries), not corpus-sized; `localCheckpoint` truncates the plan lineage
 * so batch N's histogram doesn't recompute batches 1..N-1. The KS readout
 * per batch is [[EvalOps.ksDriftCounts]] on two tiny tables. The exact
 * integer statistic means the monitor's reading after batch N equals the
 * batch recomputation over all data seen so far, bit-for-bit — pinned by
 * StreamingCorpusSpec.
 *
 * Durability: WITHOUT `persistDir` the accumulated histogram lives only in
 * this monitor instance's driver memory — if the streaming query restarts
 * from its sink checkpoint, processed batches are NOT replayed but the
 * histogram resets, silently breaking the stream-so-far invariant; the
 * in-memory mode is SINGLE-RUN only. With `persistDir`, each batch's
 * merged histogram commits to `persistDir/batch=<id>` (it is value-grid-
 * sized, so the write is trivial), a fresh monitor restores the latest
 * committed histogram at attach time, and a REPLAYED batch (foreachBatch
 * is at-least-once across restarts) detects its already-committed dir and
 * restores instead of double-merging — the standard idempotent-by-batchId
 * foreachBatch discipline.
 *
 * Reference histograms are mergeable (sum on value), so a monitor can be
 * re-anchored to a new reference without touching stream state.
 *
 * Identity pairing: pass `checkpointLocation` (the SAME path the caller
 * gives the writer) and the monitor stamps persistDir with the streaming
 * query's id (the UUID Spark writes to `<checkpoint>/metadata` — stable
 * across restarts of one checkpoint, fresh on a reset) on first commit,
 * then requires it to match on every later commit/restore. This closes
 * the one reset case the batch-id fail-fast below cannot see: a previous
 * run that committed ONLY batch 0, replayed by a fresh checkpoint whose
 * first batch is also 0 — indistinguishable from a legit at-least-once
 * replay by ids alone, but a different query id.
 */
class DriftMonitor(reference: DataFrame, valueCol: String,
    persistDir: Option[String] = None,
    checkpointLocation: Option[String] = None) {

  private val spark = reference.sparkSession

  /** Frozen reference histogram (v, c) — computed once at attach time. */
  private val refHist = reference
    .select(col(valueCol).cast("long").as("v"))
    .groupBy("v").agg(count(lit(1)).as("c"))
    .localCheckpoint(true)

  private def fs(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def batchDir(id: Long) = s"${persistDir.get}/batch=$id"

  private def committed(dir: String): Boolean =
    fs(dir).exists(new Path(s"$dir/_SUCCESS"))

  /** The paired checkpoint's query id, read from its metadata file —
    * present once the query has started (so by the first foreachBatch). */
  private def queryId(): Option[String] = checkpointLocation.flatMap { cp =>
    val p = new Path(s"$cp/metadata")
    val f = fs(cp)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(text).map(_.group(1))
    }
  }

  private def stampPath = new Path(s"${persistDir.get}/_run_identity")

  /** Set once the pairing has validated for this monitor instance — the
    * query id is immutable for a running query, so later batches skip
    * the metadata re-read. */
  @volatile private var identityOk = false

  /** Enforce the persistDir <-> checkpoint pairing: stamp on first
    * commit, fail loudly on any later mismatch (a reset checkpoint over
    * an old persistDir would otherwise silently restore stale state). */
  private def checkIdentity(): Unit = if (!identityOk) (persistDir, queryId()) match {
    case (Some(_), Some(qid)) =>
      val f = fs(persistDir.get)
      // an EMPTY stamp is a crash artifact (create() succeeded, write
      // didn't), not a recorded identity — treat as absent and re-stamp,
      // instead of failing every later run with a misleading
      // "stamped with query id ''" message
      val stamped =
        if (!f.exists(stampPath)) None
        else {
          val in = f.open(stampPath)
          val s = try scala.io.Source.fromInputStream(in).mkString.trim
            finally in.close()
          if (s.isEmpty) None else Some(s)
        }
      stamped match {
        case Some(s) =>
          require(s == qid,
            s"persistDir ${persistDir.get} is stamped with query id $s " +
              s"but this stream's checkpoint carries $qid: the checkpoint was " +
              "reset (or a different query reuses the dir) while persistDir " +
              "holds the old run's histograms — give each (checkpoint, " +
              "persistDir) pairing a fresh dir")
        case None =>
          // write-then-rename so the committed stamp is never observable
          // half-written (create-then-write left an empty stamp on crash)
          val tmp = new Path(s"${persistDir.get}/_run_identity.tmp")
          val out = f.create(tmp, true)
          try out.write(qid.getBytes("UTF-8")) finally out.close()
          if (f.exists(stampPath)) f.delete(stampPath, false)
          require(f.rename(tmp, stampPath),
            s"could not commit identity stamp $stampPath")
      }
      identityOk = true
    case _ => () // no pairing requested: the batch-id fail-fast still applies
  }

  /** Latest committed batch id under `persistDir`, if any. */
  private def latestCommitted(): Option[Long] = persistDir.flatMap { p =>
    val f = fs(p)
    if (!f.exists(new Path(p))) None
    else f.listStatus(new Path(p)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
      .filter(id => committed(batchDir(id)))
      .sorted.lastOption
  }

  /** Accumulated stream histogram; value-grid-sized. Restored from the
    * latest committed batch when `persistDir` carries one. */
  @volatile private var hist: Option[DataFrame] =
    latestCommitted().map(id => spark.read.parquet(batchDir(id)))

  /** One reading per processed micro-batch, in order:
    * (batchId, n_stream, n_ref, ks_ppm, reject_05). foreachBatch invocations
    * are serialized per query, so plain appends are safe. */
  val readings =
    new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Boolean)]

  /** Current KS reading against the reference (None before any batch). */
  def current(): Option[Row] = hist.map { h =>
    EvalOps.ksDriftCounts(h, refHist).collect()(0)
  }

  /**
   * Wrap a streaming DataFrame (any schema containing `valueCol`) into a
   * foreachBatch writer that maintains the histogram and appends one
   * KS reading per batch. Caller starts/stops the returned writer.
   */
  def attach(stream: DataFrame): DataStreamWriter[Row] = {
    stream.select(col(valueCol).cast("long").as("v"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        checkIdentity()
        val pinned = persistDir match {
          case Some(_) if committed(batchDir(id)) =>
            // replayed batch after a restart: its merge already committed —
            // restore it rather than folding the same rows twice. A LEGIT
            // replay can only be the latest committed id (the histogram
            // commit precedes the checkpoint commit, so at-least-once
            // re-delivers at most that one batch); a committed id BELOW
            // the latest means the query restarted with a fresh/reset
            // checkpoint while persistDir kept the old run's state — fail
            // fast instead of silently dropping the new run's data and
            // regressing the histogram
            val latest = latestCommitted().get
            require(id == latest,
              s"batch $id is already committed under persistDir but the " +
                s"latest committed is $latest: the streaming checkpoint " +
                "was reset while persistDir carries older state — pair " +
                "each persistDir with exactly one checkpointLocation")
            spark.read.parquet(batchDir(id))
          case _ =>
            val h = batch.groupBy("v").agg(count(lit(1)).as("c"))
            val merged = hist match {
              case None => h
              case Some(prev) => prev.unionByName(h)
                .groupBy("v").agg(sum("c").as("c"))
            }
            persistDir match {
              case Some(_) =>
                // durable lineage: the read-back scan replaces checkpoint
                // pinning, and _SUCCESS is the idempotency marker
                merged.write.mode("overwrite").parquet(batchDir(id))
                spark.read.parquet(batchDir(id))
              case None =>
                // localCheckpoint pins batch N's histogram so N+1 doesn't
                // replay the whole lineage; the superseded checkpoint's
                // blocks are reclaimed by the ContextCleaner once
                // dereferenced here
                merged.localCheckpoint(true)
            }
        }
        hist = Some(pinned)
        val r = EvalOps.ksDriftCounts(pinned, refHist).collect()(0)
        readings += ((id, r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("ks_ppm"), r.getAs[Boolean]("reject_05")))
        ()
      }
  }
}
