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
 *  - a stale marker is a crashed mutator: taken over with a warning by
 *    renaming it ASIDE — atomic with exactly one winner (the loser's
 *    rename fails on the vanished source), never delete-then-create,
 *    which would let a second takeover delete the first winner's FRESH
 *    marker and run two mutators concurrently (the
 *    [[graft.engine.FloEngine]] lease takeover discipline);
 *  - a live marker fails the second mutator descriptively;
 *  - the op receives a [[MutationGuard.Handle]] whose `verifyOwnership()`
 *    re-reads the marker — callers invoke it immediately before their
 *    commit-edge write (the `FloEngine.verifyLeaseOwnership` backstop),
 *    so a mutator stalled past the TTL and usurped fails loudly BEFORE
 *    its commit lands instead of clobbering the usurper's work.
 */
private[operators] object MutationGuard {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Same-JVM acquisition serialization, one lock per marker path — the
    * [[graft.engine.FloEngine]] `leaseLock` discipline. The filesystem
    * protocol alone cannot give one-winner takeover on RawLocalFileSystem
    * (a loser whose rename lands AFTER the winner's fresh re-create
    * renames the WINNER's marker aside), and same-process threads are the
    * common racers (CLI verbs, test harnesses, a driver running parallel
    * jobs). Cross-process, the residual window is narrowed by the
    * re-stat immediately before the rename and closed at the commit edge
    * by [[Handle.verifyOwnership]]. */
  private val acquireLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def acquireLock(g: Path): Object =
    acquireLocks.computeIfAbsent(g.toString, _ => new Object)

  /** The guarded op's view of its own marker: the commit-edge re-verify. */
  final class Handle private[MutationGuard] (
      f: FileSystem, g: Path, ownerToken: String, subject: String) {

    /** Re-read the marker and confirm this mutator still owns it. Call
      * immediately before the mutation's commit-making write (commit
      * marker, meta rewrite, pointer flip): a JVM that stalled past the
      * TTL and was taken over must abort with its commit NOT visible —
      * the usurper's state stays intact. */
    def verifyOwnership(): Unit = {
      val owned =
        try {
          val in = f.open(g)
          val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          content.startsWith(ownerToken)
        } catch { case _: java.io.IOException => false }
      if (!owned) throw new IllegalStateException(
        s"$subject: mutation marker is no longer owned by this operation " +
          "(stalled past the TTL and taken over, or the marker vanished) — " +
          "aborting BEFORE the commit; the takeover's state is untouched " +
          "and this mutation left only invisible staged writes")
    }
  }

  /** Run `op` while exclusively holding the marker at `g`. `subject` names
    * the guarded thing in error messages ("index at /x"). */
  def withExclusive[T](
      spark: SparkSession, g: Path, subject: String, what: String,
      ttlMillis: Long)(op: => T): T =
    withExclusiveHandle(spark, g, subject, what, ttlMillis)(_ => op)

  /** [[withExclusive]] with the [[Handle]] exposed for commit-edge
    * ownership re-verification. */
  def withExclusiveHandle[T](
      spark: SparkSession, g: Path, subject: String, what: String,
      ttlMillis: Long)(op: Handle => T): T = {
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
    acquireLock(g).synchronized {
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
            // rename ASIDE, not delete: exactly one of N concurrent
            // takeovers wins the rename (the losers' renames fail on the
            // vanished source and their exclusive creates below lose to
            // the winner's fresh marker); delete-then-create would let a
            // second takeover delete the first winner's FRESH marker.
            // Re-stat at the rename edge: a cross-process winner that
            // already renamed + re-created leaves a FRESH marker here,
            // and renaming that would usurp it — abort instead (the
            // same-JVM case is fully serialized by acquireLock).
            val fresh = try {
              System.currentTimeMillis() -
                f.getFileStatus(g).getModificationTime < ttlMillis
            } catch { case _: java.io.FileNotFoundException => false }
            if (fresh) throw new IllegalStateException(
              s"$subject: another mutator took the stale marker over " +
                "concurrently (its heartbeat is fresh) — one mutator at a time")
            val aside = new Path(g.getParent,
              s".${g.getName}.stale.$ownerToken")
            // RawLocalFileSystem.rename's copy fallback throws a raw FNFE
            // when a cross-process racer renamed the source away first —
            // that's the lost-the-race shape; tryAcquire below adjudicates
            val renamed =
              try f.rename(g, aside)
              catch { case _: java.io.FileNotFoundException => false }
            if (renamed) f.delete(aside, false)
            if (!tryAcquire()) throw new IllegalStateException(
              s"$subject: another mutator acquired the marker concurrently")
        }
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
    try op(new Handle(f, g, ownerToken, subject))
    finally {
      hb.shutdownNow()
      // delete only if still ours: a usurper's marker must survive this
      // loser's cleanup (the same one-winner discipline as the takeover)
      try {
        val in = f.open(g)
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        if (content.startsWith(ownerToken)) f.delete(g, false)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
