package graft.core

/** MurmurHash3 x64-128 (h1 half), the 64-bit token hash the reference uses
  * for partition-key routing (`internal/types/murmur.go:37`,
  * `internal/types/token.go:44-46` — the Cassandra-compatible variant).
  *
  * Implemented from Austin Appleby's public-domain MurmurHash3 spec
  * (MurmurHash3_x64_128); only `h1` is returned, matching the reference
  * and the Cassandra partitioner. Verified against the reference's
  * published test vectors (`internal/types/murmur_test.go`).
  *
  * All arithmetic is on `Long` with wrapping overflow — identical to the
  * unsigned 64-bit math of the spec.
  */
object Murmur3x64 {
  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  /** h1 of MurmurHash3 x64-128 with seed 0. */
  def hash(data: Array[Byte]): Long = hash(data, 0, data.length)

  def hash(data: Array[Byte], offset: Int, length: Int): Long = {
    var h1 = 0L
    var h2 = 0L
    val nblocks = length >>> 4
    var i = 0
    while (i < nblocks) {
      val base = offset + (i << 4)
      var k1 = getLongLE(data, base)
      var k2 = getLongLE(data, base + 8)

      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    val tail = offset + (nblocks << 4)
    val rem = length & 15
    var k1 = 0L
    var k2 = 0L
    // Tail bytes are SIGN-EXTENDED: the Cassandra/DataStax-Java variant
    // (and the reference, murmur.go:29 `int64(int8(p))`) differs here from
    // Appleby's canonical C++ which zero-extends.
    if (rem >= 15) k2 ^= data(tail + 14).toLong << 48
    if (rem >= 14) k2 ^= data(tail + 13).toLong << 40
    if (rem >= 13) k2 ^= data(tail + 12).toLong << 32
    if (rem >= 12) k2 ^= data(tail + 11).toLong << 24
    if (rem >= 11) k2 ^= data(tail + 10).toLong << 16
    if (rem >= 10) k2 ^= data(tail + 9).toLong << 8
    if (rem >= 9) {
      k2 ^= data(tail + 8).toLong
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem >= 8) k1 ^= data(tail + 7).toLong << 56
    if (rem >= 7) k1 ^= data(tail + 6).toLong << 48
    if (rem >= 6) k1 ^= data(tail + 5).toLong << 40
    if (rem >= 5) k1 ^= data(tail + 4).toLong << 32
    if (rem >= 4) k1 ^= data(tail + 3).toLong << 24
    if (rem >= 3) k1 ^= data(tail + 2).toLong << 16
    if (rem >= 2) k1 ^= data(tail + 1).toLong << 8
    if (rem >= 1) {
      k1 ^= data(tail).toLong
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
    }

    h1 ^= length.toLong
    h2 ^= length.toLong
    h1 += h2
    h2 += h1
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 += h2
    h1
  }

  /** Hash of a string's UTF-8 bytes — `HashToken` semantics. */
  def hashString(s: String): Long =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** 64-bit finalization mix. */
  def fmix64(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  private def getLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)
}
