package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

import graft.core.Murmur3x64

/** MinHash signature aggregator: folds a stream of shingle hashes into a
  * `numPerms`-wide signature (elementwise min of permuted hashes).
  *
  * Permutation i is `fmix64(h ^ seed_i)` — a full-avalanche remix per perm,
  * cheaper than the classical (a*h+b) mod p and equally uniform. Partial
  * aggregation (map-side combine) applies: merge is elementwise min, so the
  * shuffle carries one signature per (doc, partition), not one row per
  * shingle — the property that makes this work at 100 TB.
  */
class MinHashAgg(numPerms: Int, seed: Long)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  private val seeds: Array[Long] =
    Array.tabulate(numPerms)(i => Murmur3x64.fmix64(seed + i * 0x9e3779b97f4a7c15L))

  override def zero: Array[Long] = Array.fill(numPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numPerms) {
      val v = Murmur3x64.fmix64(h ^ seeds(i))
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** SimHash aggregator: 64-bit fingerprint from a stream of token hashes.
  * Bit j of the result is the sign of sum over tokens of (+1 if token's
  * bit j set else -1). Same partial-aggregation property as MinHashAgg.
  */
class SimHashAgg extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var j = 0
    while (j < 64) {
      buf(j) += (((h >>> j) & 1L).toInt << 1) - 1
      j += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
}

/** Misra-Gries heavy-hitters summary (capacity k counters): any item with
  * true frequency > n/k is GUARANTEED to appear in the summary, using
  * O(k) space however large the stream. `merge` sums the two summaries
  * and, when more than k items survive, subtracts the (k+1)-th largest
  * count from all (the standard merged-MG step) — the combined error
  * stays <= n/k under ANY merge tree, so partial aggregation (map-side
  * combine) is sound: the shuffle carries one k-entry map per partition.
  * Summary CONTENTS beyond the guarantee (which borderline items survive,
  * the residual counts) are merge-order-dependent; consumers must rely
  * only on the containment guarantee and the +/- n/k count bound, which
  * is exactly what q78's oracle gate and spec check.
  */
class MisraGriesAgg(capacity: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None =>
        // decrement all; drop zeros (the classic MG step)
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
}
