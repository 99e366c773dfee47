package graft.similarity

/**
 * Dense-vector kernels for the similarity operators. Tight JVM loops —
 * Catalyst higher-order functions (`aggregate(zip_with(...))`) are
 * interpreted per element, which is ~100x slower on O(n²) pair workloads;
 * these run inside `mapPartitions` against a broadcast matrix instead.
 */
object VectorKernels {

  def norm(v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** Unit-normalize (zero vectors stay zero). */
  def unit(v: Array[Double]): Array[Double] = {
    val n = norm(v)
    if (n == 0.0) v
    else {
      val out = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { out(i) = v(i) / n; i += 1 }
      out
    }
  }

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** cosine(a, b) — for unit vectors use [[dot]] directly. */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }
}
