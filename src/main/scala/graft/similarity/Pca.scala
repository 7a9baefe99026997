package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over int8-quantized embeddings — the "small driver math, distributed
  * accumulation" pattern: the corpus contributes an EXACT integer Gram
  * matrix (long sums of int8 products commute — order/retry-independent and
  * bit-reproducible, the same discipline as the fixed-point aggregates),
  * and the dim×dim eigenproblem (64×64 = 32 KiB) is solved on the driver
  * with deterministic cyclic Jacobi. Projection onto the top components is
  * then a map-only column expression.
  *
  * At 100 TB the corpus pass is one scan with a 32 KiB partial per
  * partition and no shuffle of vectors; nothing about the eigen step grows
  * with the data.
  */
object Pca {

  /** (gram, n): exact integer Gram matrix Σ q·qᵀ over the quantized corpus
    * and the contributing row count. One `mapPartitions` accumulation per
    * partition, partials reduced on the driver (p × dim² longs).
    */
  def int8Gram(corpus: DataFrame): (Array[Array[Long]], Long) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = corpus.select(Similarity.quantizeInt8(col("embedding")).as("q"))
      .as[Array[Int]]
    val partials = q.mapPartitions { it =>
      var dim = -1
      var g: Array[Long] = null
      var n = 0L
      it.foreach { v =>
        if (dim < 0) { dim = v.length; g = new Array[Long](dim * dim) }
        n += 1
        var d = 0
        while (d < dim) {
          val vd = v(d).toLong
          var e = 0
          while (e < dim) { g(d * dim + e) += vd * v(e); e += 1 }
          d += 1
        }
      }
      if (dim < 0) Iterator.empty else Iterator((dim, n, g))
    }.collect()
    require(partials.nonEmpty, "empty corpus")
    val dim = partials.head._1
    val g = new Array[Long](dim * dim)
    var n = 0L
    partials.foreach { case (_, pn, pg) =>
      n += pn
      var i = 0
      while (i < g.length) { g(i) += pg(i); i += 1 }
    }
    (Array.tabulate(dim, dim)((d, e) => g(d * dim + e)), n)
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric matrix:
    * fixed sweep order, no pivot search randomness. Returns (eigenvalues,
    * eigenvectors as rows), sorted by descending eigenvalue with index
    * tie-break.
    */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 30)
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    while (s < sweeps) {
      var off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > 1e-12) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // theta == 0 (equal diagonals) needs the full 45° rotation;
            // signum(0) = 0 would silently skip it and never converge
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      if (off < 1e-18) s = sweeps
      s += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until n).map(k => v(k)(i)).toArray).toArray)
  }
}
