package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for large joins: salt the skewed (big) side into `salt`
 * sub-keys and replicate the small side across all salt values, so one hot
 * key fans out over `salt` tasks instead of one straggler.
 *
 * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
 * default) covers sort-merge joins after the fact; explicit salting is for
 * the cases AQE can't rescue — e.g. a hot key inside a single shuffle
 * partition of a hash aggregation, or joins under a broadcast threshold
 * boundary. Deterministic: the salt is a hash of stable columns, not rand().
 */
object SkewJoin {

  /**
   * Equi-join `big` with `small` on `bigKey === smallKey`, salting the big
   * side. `saltBy` picks the salt deterministically from big-side columns
   * (default: a hash of the key itself spread via a second column-free
   * derivation would collapse — pass row-distinguishing columns for real
   * spread, e.g. the big table's primary key).
   */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      saltBy: Seq[Column],
      salt: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    val salted = big.withColumn("__salt", pmod(hash(saltBy: _*), lit(salt)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated,
        bigKey === smallKey && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }
}
