package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.GraftExtensions

/**
 * Z-order write layout over any two integral columns — the library surface
 * behind `pipe_zorder` / the `zorder-write` CLI verb.
 *
 * Both keys are min-max-scaled to 16 bits (one tiny aggregate, broadcast
 * back), Morton-coded with the native [[graft.expressions.ZOrderCode]]
 * expression, then range-partitioned and sorted by the code so every
 * output file carries a tight min/max envelope on BOTH columns — parquet
 * predicate pushdown then prunes files for range filters on either one.
 * ZOrderSpec measures the effect vs a linear sort.
 *
 * 16-bit resolution is deliberate: file-level pruning can't use more than
 * ~log2(numFiles) leading bits per axis anyway, and staying under 32
 * total bits keeps the code exactly representable everywhere (including
 * the engines the oracle runs on).
 */
object ZOrderLayout {

  private def checkCols(df: DataFrame, keys: Seq[String]): Unit = {
    val reserved = Seq("zval", "mina", "maxa", "minb", "maxb", "minc", "maxc")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"ZOrderLayout: input columns ${clash.mkString(", ")} collide with " +
        "the layout's working columns — rename them first")
    keys.foreach(k => require(df.columns.contains(k),
      s"ZOrderLayout: no column '$k' in ${df.columns.mkString(", ")}"))
  }

  /** The input extended with a `zval` Morton code of (keyA, keyB). */
  def coded(df: DataFrame, keyA: String, keyB: String): DataFrame = {
    checkCols(df, Seq(keyA, keyB))
    GraftExtensions.register(df.sparkSession)
    val b = df.agg(
      min(keyA).as("mina"), max(keyA).as("maxa"),
      min(keyB).as("minb"), max(keyB).as("maxb"))
    df.crossJoin(broadcast(b))
      .withColumn("zval", call_function("graft_zorder",
        expr(s"($keyA - mina) * 65535 div greatest(maxa - mina, 1)"),
        expr(s"($keyB - minb) * 65535 div greatest(maxb - minb, 1)")))
      .drop("mina", "maxa", "minb", "maxb")
  }

  /** Write `df` into `numFiles` z-clustered parquet files at `path`. */
  def writeClustered(
      df: DataFrame, keyA: String, keyB: String,
      numFiles: Int, path: String): Unit =
    coded(df, keyA, keyB)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)

  /** The input extended with an order-16 Hilbert distance of (keyA, keyB)
    * — same contract as [[coded]], tighter average envelopes: the Hilbert
    * curve never takes Morton's power-of-two diagonal jumps, so
    * consecutive codes are always grid-adjacent and range-partitioned
    * files cover more compact rectangles (ZOrderSpec measures the
    * envelope-area win on the same data). */
  def codedHilbert(df: DataFrame, keyA: String, keyB: String): DataFrame = {
    checkCols(df, Seq(keyA, keyB))
    GraftExtensions.register(df.sparkSession)
    val b = df.agg(
      min(keyA).as("mina"), max(keyA).as("maxa"),
      min(keyB).as("minb"), max(keyB).as("maxb"))
    df.crossJoin(broadcast(b))
      .withColumn("zval", call_function("graft_hilbert",
        expr(s"($keyA - mina) * 65535 div greatest(maxa - mina, 1)"),
        expr(s"($keyB - minb) * 65535 div greatest(maxb - minb, 1)")))
      .drop("mina", "maxa", "minb", "maxb")
  }

  /** Write `df` into `numFiles` Hilbert-clustered parquet files. */
  def writeClusteredHilbert(
      df: DataFrame, keyA: String, keyB: String,
      numFiles: Int, path: String): Unit =
    codedHilbert(df, keyA, keyB)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)

  /** Three-key variant ([[graft.expressions.ZOrderCode3]]): tight file
    * envelopes on ALL THREE columns. */
  def coded3(df: DataFrame, keyA: String, keyB: String, keyC: String): DataFrame = {
    checkCols(df, Seq(keyA, keyB, keyC))
    GraftExtensions.register(df.sparkSession)
    val b = df.agg(
      min(keyA).as("mina"), max(keyA).as("maxa"),
      min(keyB).as("minb"), max(keyB).as("maxb"),
      min(keyC).as("minc"), max(keyC).as("maxc"))
    df.crossJoin(broadcast(b))
      .withColumn("zval", call_function("graft_zorder3",
        expr(s"($keyA - mina) * 65535 div greatest(maxa - mina, 1)"),
        expr(s"($keyB - minb) * 65535 div greatest(maxb - minb, 1)"),
        expr(s"($keyC - minc) * 65535 div greatest(maxc - minc, 1)")))
      .drop("mina", "maxa", "minb", "maxb", "minc", "maxc")
  }

  /** Write `df` into `numFiles` files z-clustered on three keys. */
  def writeClustered3(
      df: DataFrame, keyA: String, keyB: String, keyC: String,
      numFiles: Int, path: String): Unit =
    coded3(df, keyA, keyB, keyC)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)
}
