package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/**
 * Bloom-prefiltered join: probe the fact side against a compact Bloom
 * filter of the dimension's join keys BEFORE the fact shuffles, then run
 * the real join for exactness (false positives — fpp of the fact rows —
 * fall out of the hash join; no true match can be lost, Bloom filters
 * have no false negatives, so the result is bit-identical to the plain
 * join).
 *
 * The 100 TB gap this fills: when the dim fits the broadcast threshold,
 * Catalyst already broadcasts the join; when it does not, both sides pay
 * a full shuffle even if the dim matches only 1% of fact rows. At ~10
 * bits/key the Bloom filter of a 100M-key dim is ~170 MB where its hash
 * relation is tens of GB — the filter can still ship to every task, and
 * the fact-side exchange shrinks by ~the join selectivity. This is the
 * explicit, composable form of Spark's own injected runtime bloom
 * filters (SPARK-32268), usable when the optimizer's heuristics (creation
 * side size caps, single-column equi-keys only) decline to fire.
 *
 * The probe itself is [[graft.expressions.BloomMightContain]] — native
 * codegen, evaluated inside the fact scan's WholeStageCodegen span — no
 * UDF boundary, and rejected rows drop before the join ever sees them.
 *
 * Flo context: the reference's consumers filter events server-side by
 * namespace before anything crosses the wire (reference
 * flo/src/server/consumer/mod.rs) — same shape: cut the stream at the
 * source with a cheap predicate, pay the expensive operator only for
 * plausible rows.
 */
object BloomJoin {

  /**
   * Inner-join `fact` to `dim` on `factKey == dimKey`, pre-filtering the
   * fact side with a Bloom filter built over the dim's keys in one
   * distributed aggregate (`stat.bloomFilter`). `expectedItems <= 0`
   * sizes the filter from a count of the dim (one extra cheap job over
   * the — by assumption smaller — dimension side).
   */
  def prefilteredJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    GraftExtensions.register(fact.sparkSession)
    val n = if (expectedItems > 0) expectedItems else math.max(dim.count(), 1L)
    val bloom = dim.stat.bloomFilter(dimKey, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // the filter ships inside the plan; past ~256 MB that dominates task
    // deserialization — raise fpp (bits/key shrinks log-linearly) or
    // pre-aggregate the dim's key set before asking for a prefilter
    require(bos.size() <= (256 << 20),
      f"BloomJoin: serialized filter is ${bos.size() / 1048576}%d MB " +
        f"(n=$n%d, fpp=$fpp%.3f) — raise fpp or reduce expectedItems")
    fact
      .filter(call_function("graft_bloom_contains", col(factKey), lit(bos.toByteArray)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
