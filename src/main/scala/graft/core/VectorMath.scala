package graft.core

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense-vector kernels used by the similarity operators. Static-forwarder
  * friendly (callable from generated Java in Catalyst codegen).
  *
  * All accumulation is in Double, in ascending element order, so results are
  * bit-deterministic and match an oracle computing the same fold.
  */
object VectorMath {

  /** cosine(a, b) = dot / (sqrt(||a||^2) * sqrt(||b||^2)); 0 when a norm is 0. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Loud density guard, hoisted OUT of the math loops: verify the first
    * `n` elements are non-null ONCE, then the FP loop runs unguarded.
    * For UnsafeArrayData the check is a word-wise scan of the null
    * bitset (~n/64 loads, no per-element branch); other ArrayData
    * implementations take one cheap per-element pass — still far
    * better than interleaving a null branch with every FMA (and 64x
    * better for srpSignature, which used to re-check per plane).
    * The rejection stays loud: silent null-as-zero returned confidently
    * wrong similarities.
    */
  private def requireDense(a: ArrayData, n: Int): Unit = {
    a match {
      case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
        // layout: [numElements: 8B][null bitset words][values]; a clear
        // bitset over ALL elements certainly covers the first n
        val words = (u.numElements().toLong + 63L) >> 6
        if (!org.apache.spark.unsafe.bitset.BitSetMethods.anySet(
            u.getBaseObject, u.getBaseOffset + 8L, words))
          return
      case _ => ()
    }
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"null element at index $i in a float vector — embeddings must be dense " +
            "(a silent null-as-zero would return a confidently wrong similarity)")
      i += 1
    }
  }

  /** Catalyst-codegen entry point over ArrayData (ArrayType(FloatType)). */
  def cosineArrayData(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    requireDense(a, n)
    requireDense(b, n)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dotArrayData(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    requireDense(a, n)
    requireDense(b, n)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  /** Random-hyperplane (SimHash/SRP) signature of a float vector: bit i is
    * sign(v . h_i) where hyperplane h_i is a deterministic pseudo-random
    * Gaussian-ish vector derived from murmur3(seed, i, j) — no RNG state, so
    * executors regenerate identical planes (cluster-safe, nothing shipped).
    */
  /** Left fold `start + Σ w(j)` over an int-bucket array in element order —
    * the hashed-linear-model margin kernel (q105): identical association to
    * `aggregate(transform(bs, j -> element_at(w, j+1)), start, (a,x) -> a+x)`,
    * which is interpreted (higher-order functions have no codegen) and
    * re-materialized a boxed array per row per training iteration.
    */
  def bucketWeightSum(bs: ArrayData, w: Array[Double], start: Double): Double = {
    val n = bs.numElements()
    requireDense(bs, n)
    var acc = start
    var i = 0
    while (i < n) {
      acc += w(bs.getInt(i))
      i += 1
    }
    acc
  }

  def srpSignature(v: ArrayData, bits: Int, seed: Long): Long = {
    var sig = 0L
    val n = v.numElements()
    requireDense(v, n)
    var i = 0
    while (i < bits) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += v.getFloat(j).toDouble * planeComponent(seed, i, j)
        j += 1
      }
      if (dot >= 0.0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Driver-side spherical k-means (Lloyd's) over unit-normalized vectors —
    * the IVF coarse-quantizer fit. The input is a model-fit-sized sample
    * (~100·k rows), so this is driver math like any model metadata; nothing
    * here scales with corpus size. Deterministic: init picks k evenly
    * spaced vectors from the sample ordered by fmix64 of the row index
    * (stable for a fixed seeded sample), assignment ties break on the
    * lower centroid index, and empty clusters keep their previous center.
    */
  def sphericalKMeans(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"sample ${sample.length} < k $k")
    val dim = sample(0).length
    def normalize(v: Array[Double]): Array[Double] = {
      var n2 = 0.0; var i = 0
      while (i < v.length) { n2 += v(i) * v(i); i += 1 }
      val n = math.sqrt(n2)
      if (n == 0.0) v else v.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val xs = sample.map(normalize)
    val order = xs.indices.sortBy(i => Murmur3x64.fmix64(i.toLong))
    var cents = Array.tabulate(k)(i => xs(order(i * xs.length / k)))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      xs.foreach { x =>
        var best = 0; var bestDot = dot(x, cents(0)); var c = 1
        while (c < k) {
          val dc = dot(x, cents(c))
          if (dc > bestDot) { best = c; bestDot = dc }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += x(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) else normalize(sums(c))
      }
      it += 1
    }
    cents
  }

  /** Squared L2 distance of two float vectors, double accumulation in
    * ascending element order (deterministic; matches a left-to-right
    * `list_sum` fold in the DuckDB oracle over the same floats).
    */
  def l2SqArrayData(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    requireDense(a, n)
    requireDense(b, n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Plain (Euclidean) Lloyd k-means for the PQ sub-quantizer fit — the
    * L2 twin of [[sphericalKMeans]]: same deterministic init (fmix64 order
    * over the sample), lowest-index tie-break, empty clusters keep their
    * center. Input is a model-fit-sized sample; driver math.
    */
  def kMeansL2(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"sample ${sample.length} < k $k")
    val dim = sample(0).length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val order = sample.indices.sortBy(i => Murmur3x64.fmix64(i.toLong))
    var cents = Array.tabulate(k)(i => sample(order(i * sample.length / k)))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { x =>
        var best = 0; var bestD = d2(x, cents(0)); var c = 1
        while (c < k) {
          val dc = d2(x, cents(c))
          if (dc < bestD) { best = c; bestD = dc }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += x(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else { val n = counts(c).toDouble; sums(c).map(_ / n) }
      }
      it += 1
    }
    cents
  }

  /** Deterministic ~N(0,1) component via fmix64 bit-mixing of (seed,i,j):
    * take 2 uniform(0,1] doubles and Box-Muller-free sum-of-12 approximation
    * is avoided — instead use the irwin-hall-2 (triangular) shifted, which is
    * sign-symmetric; for SRP only the sign of the projection matters, so any
    * zero-mean symmetric component distribution is valid.
    */
  def planeComponent(seed: Long, plane: Int, dim: Int): Double = {
    val h = Murmur3x64.fmix64(seed ^ (plane.toLong * 0x9e3779b97f4a7c15L) ^ (dim.toLong * 0xc2b2ae3d27d4eb4fL))
    // map to uniform(-1, 1); zero-mean symmetric
    (h >> 11).toDouble / (1L << 52).toDouble
  }
}
