package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.core.{Murmur3x64, TokenRing}

/** Property tests for the pure core (SURVEY §5 carry-over: ordering/offset
  * invariants under arbitrary inputs). Mirrors the invariant style of the
  * reference's token/consumer-state unit suites
  * (`internal/types/token_test.go`, `internal/consuming/
  * consumer_state_test.go`) but generative instead of hand-cased.
  */
object CoreProperties extends Properties("graft.core") {

  private val ringSizes = Gen.oneOf(1, 3, 6, 12, 24, 48)
  private val rangeCounts = Gen.oneOf(1, 2, 4, 8)
  private val tokens = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  property("partitionOrdinal is always a valid slot") =
    forAll(tokens, ringSizes, rangeCounts) { (t, c, r) =>
      val p = TokenRing.partitionOrdinal(t, c, r)
      p >= 0 && p < c * r
    }

  property("every token lies inside its assigned range bounds (or the ring tail quirk)") =
    forAll(tokens, ringSizes, rangeCounts) { (t, c, r) =>
      (c <= 1) || { // guards shrunk args too; dev-mode bounds are separate math
        val (b, ri) = TokenRing.primaryTokenIndex(t, c, r)
        val (start, end) = TokenRing.rangeBounds(TokenRing.tokenAtIndex(c, b), ri, r, c)
        val inLower = t >= start
        // the ring's final range closes at MaxValue inclusive
        val inUpper = t < end || (end == Long.MaxValue && t == Long.MaxValue)
        // reference parity quirk (token.go:60-63): tokens in the ring's
        // mod-remainder tail (beyond rangesPerToken * rangeSize from their
        // broker's start) clamp to rangeIndex 0, while rangeBounds assigns
        // the tail to the LAST range — we reproduce placement exactly
        val slice = TokenRing.ChunkSizeUnit * (TokenRing.MaxRingSize / c).toLong
        val rangeSize = java.lang.Long.divideUnsigned(slice, r.toLong)
        val diff = t - TokenRing.tokenAtIndex(c, b)
        val isTail = java.lang.Long.compareUnsigned(
          java.lang.Long.divideUnsigned(diff, rangeSize), r.toLong) >= 0
        Prop((inLower && inUpper) || (ri == 0 && isTail)) :|
          s"token $t not in [$start, $end) for broker $b range $ri (tail=$isTail)"
      }
    }

  property("broker tokens are strictly increasing along the ring") =
    forAll(ringSizes) { c =>
      val ts = (0 until c).map(TokenRing.tokenAtIndex(c, _))
      ts == ts.sorted && ts.distinct.size == ts.size
    }

  property("projectRange covers the original range under any new ring size") =
    forAll(ringSizes.suchThat(_ > 1), ringSizes.suchThat(_ > 1), rangeCounts) { (c, nc, r) =>
      val projections = for {
        b <- 0 until c
        ri <- 0 until r
      } yield TokenRing.projectRange(TokenRing.tokenAtIndex(c, b), ri, r, c, nc)
      // every source range maps to at least one target range, and scale-up
      // by k multiplies targets while scale-down folds them
      projections.forall(_.nonEmpty)
    }

  property("assignPartitions is disjoint and covering for any consumer set") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), ringSizes, rangeCounts) {
      (ids, c, r) =>
        val assign = TokenRing.assignPartitions(ids, c, r)
        val all = assign.values.flatten.toSeq
        val everyPartitionOnce = all.sorted == TokenRing.allPartitions(c, r).sorted
        val balanced = {
          val sizes = assign.values.map(_.size)
          sizes.isEmpty || (sizes.max - sizes.min) <= 1 ||
            ids.distinct.size > c * r // more consumers than partitions: zeros allowed
        }
        Prop(everyPartitionOnce && balanced) :| s"assign=$assign"
    }

  property("assignment is deterministic under permutation of consumer ids") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), ringSizes, rangeCounts) {
      (ids, c, r) =>
        TokenRing.assignPartitions(ids, c, r) ==
          TokenRing.assignPartitions(scala.util.Random.shuffle(ids), c, r)
    }

  property("murmur3 slicing equals standalone hash of the slice") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { list =>
      val bytes = list.map(_.toByte).toArray
      forAll(Gen.chooseNum(0, bytes.length - 1)) { off =>
        forAll(Gen.chooseNum(0, bytes.length - off)) { len =>
          Murmur3x64.hash(bytes, off, len) ==
            Murmur3x64.hash(java.util.Arrays.copyOfRange(bytes, off, off + len))
        }
      }
    }

  property("hashToken spreads arbitrary keys over every partition of a 3x4 ring") =
    forAll(Gen.listOfN(500, Gen.alphaNumStr.suchThat(_.nonEmpty))) { keys =>
      // distribution sanity, not uniformity: with hundreds of distinct keys
      // no partition of a 12-slot ring stays empty
      val distinct = keys.distinct
      (distinct.size < 100) || {
        val parts = distinct.map(k =>
          TokenRing.partitionOrdinal(TokenRing.hashToken(k), 3, 4)).toSet
        parts.size == 12
      }
    }

  // Misra-Gries: for ANY stream and ANY partitioning into batches (any
  // merge tree Spark's partial aggregation might pick), every item with
  // frequency > n/k appears in the merged summary, and estimates never
  // exceed true counts nor undercount by more than n/k.
  private val mgStreams =
    Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h", "hot"))
  private val mgCaps = Gen.oneOf(2, 3, 4, 6)

  property("misra-gries guarantee holds under arbitrary batch splits") =
    forAll(mgStreams, mgCaps, Gen.chooseNum(1, 7)) { (stream, cap, pieces) =>
      val agg = new operators.MisraGriesAgg(cap)
      // split the stream into `pieces` batches, reduce each, merge left-fold
      val batches = stream.grouped(math.max(1, (stream.size + pieces - 1) / pieces))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toList
      val summary = batches match {
        case Nil => agg.zero
        case h :: t => t.foldLeft(h)(agg.merge)
      }
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.size.toLong
      val contained = exact.forall { case (k, c) =>
        c * cap <= n || summary.contains(k)
      }
      val bounded = summary.forall { case (k, est) =>
        val ex = exact.getOrElse(k, 0L)
        est <= ex && (ex - est) * cap <= n + cap // <= n/k, integer-safe slack
      }
      summary.size <= cap && contained && bounded
    }

  // ---- DSv2 source offset serde: the checkpoint round-trips exactly ----
  private val offsetMaps: Gen[Map[Int, Long]] =
    Gen.mapOf(Gen.zip(Gen.choose(0, 12287), Gen.choose(0L, Long.MaxValue / 2)))

  property("GraftOffset json round-trips (gen + per-partition watermarks)") =
    forAll(Gen.choose(1, 1000), offsetMaps) { (gen, parts) =>
      val o = graft.sources.GraftOffset(gen, parts)
      graft.sources.GraftOffset.fromJson(o.json()) == o
    }

  // ---- ring normalization (`utils.go:198-208`, vectors utils_test.go:29-45) ----
  property("validRingLength matches the reference vectors") = {
    val vectors = Seq(1 -> 1, 2 -> 3, 4 -> 3, 6 -> 6, 7 -> 6, 11 -> 6, 12 -> 12)
    vectors.forall { case (in, want) => TokenRing.validRingLength(in) == want }
  }

  property("validRingLength is a valid ring size and <= input (except 2)") =
    forAll(Gen.choose(1, 20000)) { n =>
      val v = TokenRing.validRingLength(n)
      val isValid = v == 1 || (v % 3 == 0 && Integer.bitCount(v / 3) == 1)
      isValid && v <= TokenRing.MaxRingSize && (n == 2 || v <= n)
    }

  // ---- partition-claim spec codec (lease lane names + session conf) ----
  // specOf canonicalizes any set; parsePartitionSpec must invert it
  // exactly — a drifting codec would silently point a writer's lane (or
  // its claim) at someone else's partitions
  property("partition spec canonical roundtrip") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 128))) { ps =>
      val set = scala.collection.immutable.SortedSet(ps: _*)
      val spec = graft.engine.PlaneLease.specOf(set)
      graft.engine.TopicStore.parsePartitionSpec(spec) == set &&
        graft.engine.PlaneLease.specOf(
          graft.engine.TopicStore.parsePartitionSpec(spec)) == spec
    }
}
