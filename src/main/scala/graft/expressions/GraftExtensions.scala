package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Engine extensions: registers the custom expressions with Catalyst.
 *
 * Two entry points:
 *  - `spark.sql.extensions=graft.expressions.GraftExtensions` at session
 *    build time (the standard plugin path), or
 *  - `GraftExtensions.register(spark)` at runtime (idempotent) for sessions
 *    the caller didn't build — used by the query catalog.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.dotlFunction)
    ext.injectFunction(GraftExtensions.nsGlobFunction)
    ext.injectFunction(GraftExtensions.lshBandsFunction)
    ext.injectFunction(GraftExtensions.unitFunction)
    ext.injectFunction(GraftExtensions.nfcFunction)
    ext.injectFunction(GraftExtensions.subFunction)
    ext.injectFunction(GraftExtensions.int8StatsFunction)
    ext.injectFunction(GraftExtensions.topKFunction)
    ext.injectFunction(GraftExtensions.heavyHittersFunction)
    ext.injectFunction(GraftExtensions.bloomContainsFunction)
    ext.injectFunction(GraftExtensions.zorderFunction)
    ext.injectFunction(GraftExtensions.zorder3Function)
    ext.injectFunction(GraftExtensions.hilbertFunction)
    ext.injectTableFunction(GraftExtensions.consumeTableFunction)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsofMergeJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneIntervalMergeJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneIntervalOverlapJoin)
  }
}

object GraftExtensions {

  private val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    { (children: Seq[Expression]) =>
      require(children.size == 2, "graft_dot expects exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  private val dotlFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dotl"),
    new ExpressionInfo(classOf[DotProductLong].getName, "graft_dotl"),
    { (children: Seq[Expression]) =>
      require(children.size == 2, "graft_dotl expects exactly 2 arguments")
      DotProductLong(children.head, children(1))
    })

  /** `ns_glob(namespace, 'pattern')` in SQL: the pattern must be a string
    * literal (it compiles at plan time, like the Column API); expands to the
    * same literal-equality / startsWith+RLIKE expression tree that
    * [[graft.functions.ns_glob]] builds at the Column level (kept in sync —
    * DotProductSpec asserts the two paths agree). */
  private val nsGlobFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ns_glob"),
    new ExpressionInfo("graft.functions", "ns_glob"),
    { (children: Seq[Expression]) =>
      import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Literal => Lit, RLike, StartsWith}
      import graft.model.{EventFilter, NamespaceGlob}
      children match {
        case Seq(ns, Literal(p: UTF8String, org.apache.spark.sql.types.StringType)) =>
          val pattern = p.toString
          EventFilter.parseOrThrow(pattern) match {
            case EventFilter.All => Lit.TrueLiteral
            case EventFilter.Glob(g) =>
              if (NamespaceGlob.isLiteral(pattern)) EqualTo(ns, Lit(pattern))
              else {
                val prefix = pattern.takeWhile(c => c != '*' && c != '?' && c != '[')
                val rx = RLike(ns, Lit(g.regex))
                if (prefix.nonEmpty) And(StartsWith(ns, Lit(prefix)), rx) else rx
              }
          }
        case _ =>
          throw new IllegalArgumentException(
            "ns_glob expects (column, string-literal pattern)")
      }
    })

  /** `graft_lsh_bands(v, seed, numPlanes, bands, dim)`: banded sign-bit LSH
    * codes; the four parameters must be integer literals (the hyperplanes
    * expand deterministically from the seed at plan time). */
  private val lshBandsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_lsh_bands"),
    new ExpressionInfo(classOf[HyperplaneBands].getName, "graft_lsh_bands"),
    { (children: Seq[Expression]) =>
      def intLit(e: Expression, name: String): Long = e match {
        case Literal(v: Int, _) => v.toLong
        case Literal(v: Long, _) => v
        case _ => throw new IllegalArgumentException(
          s"graft_lsh_bands: $name must be an integer literal, got $e")
      }
      children match {
        case Seq(v, seed, planes, bands, dim) =>
          HyperplaneBands(v, intLit(seed, "seed"), intLit(planes, "numPlanes").toInt,
            intLit(bands, "bands").toInt, intLit(dim, "dim").toInt)
        case _ => throw new IllegalArgumentException(
          "graft_lsh_bands expects (vector, seed, numPlanes, bands, dim)")
      }
    })

  private val nfcFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    { (children: Seq[Expression]) =>
      require(children.size == 1, "graft_nfc expects exactly 1 argument")
      NfcNormalize(children.head)
    })

  private val unitFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_unit"),
    new ExpressionInfo(classOf[UnitVector].getName, "graft_unit"),
    { (children: Seq[Expression]) =>
      require(children.size == 1, "graft_unit expects exactly 1 argument")
      UnitVector(children.head)
    })

  private val subFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sub"),
    new ExpressionInfo(classOf[VectorSubtract].getName, "graft_sub"),
    { (children: Seq[Expression]) =>
      require(children.size == 2, "graft_sub expects exactly 2 arguments")
      VectorSubtract(children.head, children(1))
    })

  private val int8StatsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_int8_stats"),
    new ExpressionInfo(classOf[Int8Stats].getName, "graft_int8_stats"),
    { (children: Seq[Expression]) =>
      require(children.size == 1, "graft_int8_stats expects exactly 1 argument")
      Int8Stats(children.head)
    })

  /** `graft_topk(sort, value, k)`: bounded top-k aggregate — k must be an
    * integer literal (it sizes the heap at plan time). */
  private val topKFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[TopKRows].getName, "graft_topk"),
    { (children: Seq[Expression]) =>
      children match {
        case Seq(sort, value, Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
          TopKRows(sort, value, k)
        case _ => throw new IllegalArgumentException(
          "graft_topk expects (sort, value, integer-literal k)")
      }
    })

  /** `graft_heavy_hitters(item, k)`: Misra–Gries frequent-items sketch —
    * k (the counter budget) must be an integer literal. */
  private val heavyHittersFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_heavy_hitters"),
    new ExpressionInfo(classOf[MisraGries].getName, "graft_heavy_hitters"),
    { (children: Seq[Expression]) =>
      children match {
        case Seq(item, Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
          MisraGries(item, k)
        case _ => throw new IllegalArgumentException(
          "graft_heavy_hitters expects (item, integer-literal k)")
      }
    })

  /** `graft_bloom_contains(key, bloomBytes)`: Bloom membership probe — the
    * serialized filter must be a binary literal (it decodes once per plan). */
  private val bloomContainsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
    { (children: Seq[Expression]) =>
      children match {
        case Seq(key, Literal(bytes: Array[Byte], org.apache.spark.sql.types.BinaryType)) =>
          BloomMightContain(key, bytes)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_contains expects (key, binary-literal bloom)")
      }
    })

  /** `graft_zorder(x, y)`: 64-bit Morton code of two integral keys. */
  private val zorderFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_zorder"),
    new ExpressionInfo(classOf[ZOrderCode].getName, "graft_zorder"),
    { (children: Seq[Expression]) =>
      require(children.size == 2, "graft_zorder expects exactly 2 arguments")
      ZOrderCode(children.head, children(1))
    })

  /** `graft_hilbert(x, y)`: order-16 Hilbert curve distance of two keys. */
  private val hilbertFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hilbert"),
    new ExpressionInfo(classOf[HilbertCode].getName, "graft_hilbert"),
    { (children: Seq[Expression]) =>
      require(children.size == 2, "graft_hilbert expects exactly 2 arguments")
      HilbertCode(children.head, children(1))
    })

  /** `graft_zorder3(x, y, z)`: 63-bit Morton code of three integral keys. */
  private val zorder3Function: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_zorder3"),
    new ExpressionInfo(classOf[ZOrderCode3].getName, "graft_zorder3"),
    { (children: Seq[Expression]) =>
      require(children.size == 3, "graft_zorder3 expects exactly 3 arguments")
      ZOrderCode3(children.head, children(1), children(2))
    })

  /**
   * `graft_consume('root', 'stream'[, 'glob'[, maxEvents]])` as a TABLE
   * function — the consume lifecycle surfaced to the SQL front end
   * directly in FROM position:
   * {{{ SELECT namespace FROM graft_consume('/data/flo', 'default', '/events/&#42;') }}}
   * (where [[graft.engine.FloEngine.registerView]] names ONE stream as a
   * view, the TVF reaches any stream of any root per query). Arguments
   * must be literals: the engine path and glob compile into the scan at
   * plan time — same pushdown as the programmatic consume.
   */
  private val consumeTableFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = (
    FunctionIdentifier("graft_consume"),
    new ExpressionInfo(classOf[graft.engine.FloEngine].getName, "graft_consume"),
    { (children: Seq[Expression]) =>
      def str(e: Expression, name: String): String = e match {
        case Literal(s: UTF8String, org.apache.spark.sql.types.StringType) => s.toString
        case _ => throw new IllegalArgumentException(
          s"graft_consume: $name must be a string literal, got $e")
      }
      def num(e: Expression): Long = e match {
        case Literal(v: Int, _) => v.toLong
        case Literal(v: Long, _) => v
        case _ => throw new IllegalArgumentException(
          s"graft_consume: maxEvents must be an integer literal, got $e")
      }
      val (root, stream, glob, limit) = children match {
        case Seq(r, s) => (str(r, "root"), str(s, "stream"), "/**/*", None)
        case Seq(r, s, g) => (str(r, "root"), str(s, "stream"), str(g, "glob"), None)
        case Seq(r, s, g, n) =>
          (str(r, "root"), str(s, "stream"), str(g, "glob"), Some(num(n)))
        case _ => throw new IllegalArgumentException(
          "graft_consume expects (root, stream[, glob[, maxEvents]])")
      }
      new graft.engine.FloEngine(SparkSession.active, root)
        .consumeAll(stream, glob, limit)
        .queryExecution.logical
    })

  /** Runtime registration into an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    Seq(dotFunction, dotlFunction, nsGlobFunction, lshBandsFunction, unitFunction,
        nfcFunction, subFunction, int8StatsFunction, topKFunction,
        heavyHittersFunction, bloomContainsFunction, zorderFunction,
        zorder3Function, hilbertFunction).foreach { fn =>
      if (!registry.functionExists(fn._1)) {
        registry.registerFunction(fn._1, fn._2, fn._3)
      }
    }
    val tvfRegistry = spark.sessionState.tableFunctionRegistry
    if (!tvfRegistry.functionExists(consumeTableFunction._1)) {
      tvfRegistry.registerFunction(
        consumeTableFunction._1, consumeTableFunction._2, consumeTableFunction._3)
    }
  }
}
