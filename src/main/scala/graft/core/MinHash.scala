package graft.core

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** MinHash signature math shared by the batch Aggregator
  * (`operators.MinHashAgg` — streaming reduce over exploded shingle
  * hashes) and the codegen'd `minhash_sig` expression (one shot over a
  * per-row hash array). Both produce bit-identical signatures for the
  * same element set: sig(i) = min over hashes h of fmix64(h ^ seed_i),
  * with seed_i = fmix64(seed + i * GOLDEN).
  *
  * The expression path is the 100 TB shape: the signature is computed
  * from the document's own shingle array inside whole-stage codegen —
  * zero shuffle, zero state — where the aggregator path pays one shuffle
  * of (doc, partial signature) pairs.
  */
object MinHash {

  private val Golden = 0x9e3779b97f4a7c15L

  def seeds(numPerms: Int, seed: Long): Array[Long] =
    Array.tabulate(numPerms)(i => Murmur3x64.fmix64(seed + i * Golden))

  /** Signature of a set of element hashes. Empty input yields the
    * identity signature (all Long.MaxValue) — same as the aggregator's
    * zero buffer.
    */
  def signature(hashes: Array[Long], numPerms: Int, seed: Long): Array[Long] = {
    val ss = seeds(numPerms, seed)
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      var i = 0
      while (i < numPerms) {
        val v = Murmur3x64.fmix64(h ^ ss(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Catalyst-codegen entry point over ArrayData (ArrayType(LongType)). */
  def signatureArrayData(hashes: ArrayData, numPerms: Int, seed: Long): ArrayData = {
    // explicit null-element check: UnsafeArrayData.toLongArray reads a
    // null slot's raw bytes as 0L, which would poison every permutation's
    // minimum with fmix64(0 ^ seed) — silent false near-dup matches
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      if (hashes.isNullAt(i))
        throw new IllegalArgumentException(
          s"null element at index $i in a shingle-hash array — minhash input must be dense")
      i += 1
    }
    new GenericArrayData(signature(hashes.toLongArray(), numPerms, seed))
  }
}
