package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Exclusive-mutation marker shared by the persisted index surfaces
 * ([[AnnIndex]]'s `<path>_mutating`, [[CorpusOps.ppjoinIndexIngest]]'s
 * `<path>/_mutating`): mutations that interleave partial multi-table
 * writes assume ONE mutator at a time, and this enforces it — the same
 * trusted→contract upgrade as the [[graft.engine.FloEngine]] writer
 * lease, with the same primitives:
 *
 *  - acquisition is an exclusive create (atomic on HDFS) whose CONTENT
 *    carries a per-attempt owner token, confirmed by a post-write
 *    re-read — RawLocalFileSystem implements exclusive create as
 *    exists-then-create, so two racers can both "create"; the re-read
 *    adjudicates (at most one token survives in the file);
 *  - the marker heartbeats via mtime at TTL/3 for the operation's
 *    duration, so only a crashed (or fully stalled) mutator goes stale;
 *  - a stale marker is a crashed mutator: taken over with a warning
 *    (callers' mutations are individually crash-safe — staged writes +
 *    commit-marker-last — so takeover is safe);
 *  - a live marker fails the second mutator descriptively.
 */
private[operators] object MutationGuard {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Run `op` while exclusively holding the marker at `g`. `subject` names
    * the guarded thing in error messages ("index at /x"). */
  def withExclusive[T](
      spark: SparkSession, g: Path, subject: String, what: String,
      ttlMillis: Long)(op: => T): T = {
    val f = FileSystem.get(g.toUri, spark.sparkContext.hadoopConfiguration)
    val ownerToken = java.util.UUID.randomUUID().toString
    def tryAcquire(): Boolean =
      try {
        val out = f.create(g, false)
        try out.write(s"$ownerToken $what".getBytes("UTF-8")) finally out.close()
        val in = f.open(g)
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        content.startsWith(ownerToken)
      } catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val st = try Some(f.getFileStatus(g)) catch { case _: Exception => None }
      val now = System.currentTimeMillis()
      st match {
        case Some(s) if now - s.getModificationTime < ttlMillis =>
          throw new IllegalStateException(
            s"$subject is being mutated by another operation " +
              s"(marker heartbeat ${now - s.getModificationTime} ms ago, " +
              s"TTL $ttlMillis ms): one mutator at a time — " +
              "wait for it to finish, or for a crashed one's marker to go " +
              "stale (taken over automatically)")
        case _ =>
          log.warn(s"taking over stale mutation marker for $subject " +
            "(crashed mutator; every mutation commits crash-safe)")
          f.delete(g, false)
          if (!tryAcquire()) throw new IllegalStateException(
            s"$subject: another mutator acquired the marker concurrently")
      }
    }
    val hb = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-mutation-guard-heartbeat")
        t.setDaemon(true); t
      })
    val period = math.max(1L, ttlMillis / 3)
    hb.scheduleWithFixedDelay(
      () => try f.setTimes(g, System.currentTimeMillis(), -1)
            catch { case scala.util.control.NonFatal(_) => () },
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    try op
    finally {
      hb.shutdownNow()
      try f.delete(g, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
