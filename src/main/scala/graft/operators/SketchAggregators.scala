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
