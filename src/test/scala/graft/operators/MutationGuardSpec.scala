package graft.operators

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/**
 * [[MutationGuard]] semantics: exclusive acquisition, one-winner stale
 * takeover (rename-aside — delete-then-create let two takeovers both
 * win), the commit-edge ownership re-verify, and usurper-safe cleanup.
 */
class MutationGuardSpec extends SparkSuite {

  private val ttl = 60000L

  private def marker(dir: String) = new Path(s"$dir/_mutating")

  test("a live marker refuses a second mutator; a stale one is taken over") {
    val dir = tempDir("guard-live")
    val g = marker(dir)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_mutating"),
      "other-owner op".getBytes("UTF-8"))
    val err = intercept[IllegalStateException] {
      MutationGuard.withExclusive(spark, g, "thing", "op", ttl)(())
    }
    assert(err.getMessage.contains("being mutated"), err.getMessage)
    // stale (mtime past the TTL): taken over, op runs, marker released
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/_mutating"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10 * ttl))
    var ran = false
    MutationGuard.withExclusive(spark, g, "thing", "op", ttl) { ran = true }
    assert(ran)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_mutating")),
      "completed op must release the marker")
  }

  test("verifyOwnership aborts a usurped mutator and leaves the usurper's marker intact") {
    val dir = tempDir("guard-usurp")
    val g = marker(dir)
    val p = java.nio.file.Paths.get(s"$dir/_mutating")
    val err = intercept[IllegalStateException] {
      MutationGuard.withExclusiveHandle(spark, g, "thing", "op", ttl) { h =>
        h.verifyOwnership() // still ours: must pass
        // simulate a takeover while this mutator was stalled: another
        // attempt's token replaces ours
        java.nio.file.Files.write(p, "usurper op".getBytes("UTF-8"))
        h.verifyOwnership() // must throw BEFORE any commit write
        fail("verifyOwnership must have thrown")
      }
    }
    assert(err.getMessage.contains("no longer owned"), err.getMessage)
    // the loser's cleanup must NOT delete the usurper's marker (the old
    // unconditional delete would have — letting a third mutator in while
    // the usurper still runs)
    assert(java.nio.file.Files.exists(p), "usurper's marker must survive")
    assert(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .startsWith("usurper"))
  }

  test("N racers over one stale marker: never two mutators inside at once") {
    val dir = tempDir("guard-race")
    val g = marker(dir)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_mutating"),
      "crashed op".getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/_mutating"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10 * ttl))
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlap = new java.util.concurrent.atomic.AtomicBoolean(false)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        try {
          MutationGuard.withExclusive(spark, g, "thing", "op", ttl) {
            if (inside.incrementAndGet() > 1) overlap.set(true)
            Thread.sleep(50)
            inside.decrementAndGet()
            wins.incrementAndGet()
          }
        } catch { case _: IllegalStateException => () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(!overlap.get(),
      "two mutators held the marker concurrently (takeover is not one-winner)")
    assert(wins.get() >= 1, "at least one racer must take the stale marker over")
  }
}
