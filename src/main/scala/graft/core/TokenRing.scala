package graft.core

/** Token-ring partition math, re-expressing the reference's consistent-hash
  * placement (`/root/reference/internal/types/token.go:14-179`).
  *
  * The key space is the full signed-64-bit token line starting at
  * `Long.MinValue`; a cluster of C brokers owns C evenly spaced tokens, and
  * each broker's slice is subdivided into `rangesPerToken` consumer ranges.
  * A record's partition is `(token(brokerIdx), rangeIndex)` — the unit that
  * maps onto a Spark partition directory (`topic=/token=/range=`).
  */
object TokenRing {
  /** First token of the ring (token.go:11 `StartToken`). */
  final val StartToken: Long = Long.MinValue

  /** Ring sizes are 3*2^n up to 12288 (token.go:32). */
  final val MaxRingSize: Int = 12288

  /** floor(2^64-1 / 12288), as unsigned — token.go:33 `chunkSizeUnit`. */
  final val ChunkSizeUnit: Long = java.lang.Long.divideUnsigned(-1L, MaxRingSize.toLong)

  /** Murmur3-x64 token of a partition key (token.go:44-46 `HashToken`). */
  def hashToken(key: String): Long = Murmur3x64.hashString(key)

  /** Normalize a desired broker count to a valid ring size — 1, or 3·2ⁿ
    * (`internal/utils/utils.go:198-208` `ValidRingLength`): the ring must
    * stay power-of-two-divisible so every rescale is a clean split/join.
    */
  def validRingLength(length: Int): Int = {
    require(length >= 1, s"ring length must be positive, got $length")
    if (length == 1) 1
    else if (length == 2) 3
    else {
      val exponent = math.floor(math.log(length / 3.0) / math.log(2.0)).toInt
      math.min(3 * (1 << exponent), MaxRingSize)
    }
  }

  // guard at the single chokepoint: past MaxRingSize the factor truncates
  // to 0 and every downstream divideUnsigned throws '/ by zero' per row
  // inside codegen — fail with the actual constraint instead. Sizes that
  // are not 1 or 3·2ⁿ are accepted (the remainder of the 12288-slot ring
  // folds into the last broker's slice, consistently on every path);
  // deployment-facing feeds normalize through validRingLength first.
  private def ringFactor(clusterSize: Int): Long = {
    require(clusterSize >= 1 && clusterSize <= MaxRingSize,
      s"cluster size must be in [1, $MaxRingSize], got $clusterSize " +
        "(normalize with TokenRing.validRingLength)")
    (MaxRingSize / clusterSize).toLong
  }

  /** Start token owned by broker `index` in a ring of `clusterSize`
    * (token.go:68-72 `GetTokenAtIndex`; wraps around).
    */
  def tokenAtIndex(clusterSize: Int, index: Int): Long = {
    val i = index % clusterSize
    StartToken + ChunkSizeUnit * ringFactor(clusterSize) * i.toLong
  }

  /** Map a token to its owning (brokerIndex, rangeIndex)
    * (token.go:49-66 `GetPrimaryTokenIndex`). Range width math is done in
    * unsigned 64-bit so it is well-defined for every cluster size (the
    * reference's signed math overflows for clusterSize=1, which it
    * special-cases as "dev mode"; results agree for all real sizes >= 3).
    */
  def primaryTokenIndex(token: Long, clusterSize: Int, rangesPerToken: Int): (Int, Int) = {
    // binary search: first broker index whose start token is > token
    var lo = 0
    var hi = clusterSize
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (tokenAtIndex(clusterSize, mid) > token) hi = mid else lo = mid + 1
    }
    val index = lo - 1
    // broker slice width as unsigned bits (wraps past 2^63 for size 1)
    val slice = ChunkSizeUnit * ringFactor(clusterSize)
    val rangeSize = java.lang.Long.divideUnsigned(slice, rangesPerToken.toLong)
    val diff = token - tokenAtIndex(clusterSize, index) // unsigned distance
    var rangeIndex = java.lang.Long.divideUnsigned(diff, rangeSize).toInt
    if (rangeIndex >= rangesPerToken) rangeIndex = 0 // tail of the last range
    (index, rangeIndex)
  }

  /** [start, end) bounds of one consumer range
    * (token.go:87-116 `RangeByTokenAndClusterSize`); the ring's last range
    * ends at `Long.MaxValue`.
    */
  def rangeBounds(token: Long, rangeIndex: Int, rangesPerToken: Int, clusterSize: Int): (Long, Long) = {
    if (clusterSize == 1) return rangeBoundsSingleBroker(rangeIndex, rangesPerToken)
    val rangeSize = ChunkSizeUnit * (ringFactor(clusterSize) / rangesPerToken.toLong)
    val start = token + rangeSize * rangeIndex.toLong
    val end =
      if (rangeIndex < rangesPerToken - 1) token + rangeSize * (rangeIndex + 1).toLong
      else {
        // end = the next broker's start token (covers the mod remainder)
        var i = 0
        while (i < clusterSize && tokenAtIndex(clusterSize, i) < token) i += 1
        val next = tokenAtIndex(clusterSize, i + 1)
        if (next == StartToken) Long.MaxValue else next
      }
    (start, end)
  }

  private def rangeBoundsSingleBroker(rangeIndex: Int, rangesPerToken: Int): (Long, Long) = {
    // token.go:120-131 dev-mode math: avoid overflow by halving per range
    if (rangesPerToken == 1) return (StartToken, Long.MaxValue)
    val rangeSize = java.lang.Long.divideUnsigned(-1L, rangesPerToken.toLong)
    val start = StartToken + rangeSize * rangeIndex.toLong
    val end =
      if (rangeIndex == rangesPerToken - 1) Long.MaxValue
      else StartToken + rangeSize * (rangeIndex + 1).toLong
    (start, end)
  }

  /** Ranges under a `newClusterSize` ring intersecting one range of the
    * current ring — the elastic-rescale projection
    * (token.go:133-163 `ProjectRangeByClusterSize`): scale-up splits a
    * range over the new brokers, scale-down folds ranges together.
    * Returns (newBrokerToken, rangeIndices) groups in ring order.
    */
  def projectRange(
      token: Long,
      index: Int,
      rangesPerToken: Int,
      clusterSize: Int,
      newClusterSize: Int): Seq[(Long, Seq[Int])] = {
    val (start, end) = rangeBounds(token, index, rangesPerToken, clusterSize)
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Seq[Int])]
    for (i <- 0 until newClusterSize) {
      val newToken = tokenAtIndex(newClusterSize, i)
      val idxs = (0 until rangesPerToken).filter { newIndex =>
        val (ns, ne) = rangeBounds(newToken, newIndex, rangesPerToken, newClusterSize)
        intersects(start, end, ns, ne)
      }
      if (idxs.nonEmpty) out += ((newToken, idxs))
    }
    out.toSeq
  }

  /** Open-interval intersection with the MaxValue tail special case
    * (token.go:165-179).
    */
  def intersects(startA: Long, endA: Long, startB: Long, endB: Long): Boolean = {
    val (mn, mx) =
      if (startA >= startB) (endB, startA) else (endA, startB)
    if (mn == Long.MaxValue) mn >= mx else mn > mx
  }

  /** Flat partition ordinal `brokerIdx * rangesPerToken + rangeIdx` — the
    * value the RingPartition expression emits (codegen entry point).
    */
  def partitionOrdinal(token: Long, clusterSize: Int, rangesPerToken: Int): Int = {
    val (b, r) = primaryTokenIndex(token, clusterSize, rangesPerToken)
    b * rangesPerToken + r
  }

  /** All (token, rangeIndex) partitions of a ring — the full partition set a
    * consumer group divides among its members.
    */
  def allPartitions(clusterSize: Int, rangesPerToken: Int): Seq[(Long, Int)] =
    for {
      b <- 0 until clusterSize
      r <- 0 until rangesPerToken
    } yield (tokenAtIndex(clusterSize, b), r)

  /** Deterministic round-robin assignment of (token, range) partitions over
    * sorted consumer ids — the reference's rebalance algorithm
    * (`internal/consuming/consumer_state.go:308-350`,
    * `docs/developer/CONSUMER_ASSIGNMENT.md`).
    */
  def assignPartitions(
      consumerIds: Seq[String],
      clusterSize: Int,
      rangesPerToken: Int): Map[String, Seq[(Long, Int)]] = {
    val sorted = consumerIds.distinct.sorted
    if (sorted.isEmpty) return Map.empty
    val parts = allPartitions(clusterSize, rangesPerToken)
    parts.zipWithIndex
      .groupBy { case (_, i) => sorted(i % sorted.size) }
      .map { case (c, ps) => c -> ps.map(_._1) }
      .withDefaultValue(Seq.empty)
  }
}
