package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.TopicStore

/** Randomized (seeded, sequential) model test of LINEAGE SERVING — the
  * metadata-only rescale's delivery contract under arbitrary
  * interleavings of produce batches, ring flips, GDPR key purges,
  * content-invariant compactions (the driver-side k-way merge), and
  * bounded polls whose pages land at random positions relative to
  * generation boundaries and purge gaps:
  *
  *  1. an Earliest group that polls throughout delivers, per key, its
  *     deliveries-before-each-purge plus every post-purge produce,
  *     exactly once, pages concatenating in produce order — generation
  *     v+1 records never jump ahead of generation v's (the chain
  *     barrier), and purged-but-undelivered records vanish without
  *     stalling the pager (the gap skip);
  *  2. a Latest group registered mid-sequence obeys the same rule over
  *     the post-registration suffix (pre-snapshot generations are
  *     history, the snapshot generation starts at its watermarks, later
  *     generations read in full);
  *  3. a fresh Earliest group at quiescence sees exactly the records
  *     produced since each key's last purge, once each, in order.
  *
  * ChaosSpec stresses the same machinery CONCURRENTLY; this spec pins
  * the sequential semantics tightly enough to catch off-by-one paging
  * at a generation boundary, a wrong Latest baseline after a flip, a
  * chain-hygiene drop of a generation that still owed records, or a
  * commit advancing over a purge gap that still held data.
  */
class LineageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("lineage-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  for (seed <- Seq(11, 23, 47)) test(s"random produce/rescale/purge/paged-poll interleave, seed $seed") {
    val rnd = new scala.util.Random(seed)
    val store = new TopicStore(spark, Files.createTempDirectory("graft-lineage").toString)
    val topic = "t"
    val keys = (0 until 6).map(i => s"k$i")
    val ringSizes = Seq(1, 3, 6, 12)

    var clock = 0
    val counter = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    def emptyVecMap() = scala.collection.mutable.Map.empty[String, Vector[String]]
      .withDefaultValue(Vector.empty)

    // expected final deliveries per group (the model): produce appends;
    // a purge of key k resets the expectation to what that group has
    // ALREADY been delivered (sunk records survive in the consumer; the
    // undelivered remainder is erased and must never arrive)
    val expEarly = emptyVecMap()
    val expLate = emptyVecMap()
    val expAudit = emptyVecMap()
    var lateRegistered = false

    store.registry.register("gEarly", "c", Seq(topic), store.StartFrom.Earliest)
    val deliveredEarly = emptyVecMap()
    val deliveredLate = emptyVecMap()

    def pollInto(
        group: String,
        consumer: String,
        sink: scala.collection.mutable.Map[String, Vector[String]],
        maxRecords: Long): Int = {
      val rows = store.poll(group, topic, consumer, maxRecords = maxRecords).collect()
      // a consumer processes a response in (version, part, offset) order —
      // the documented lineage delivery order
      rows.sortBy(r => (r.getAs[Int]("version"), r.getAs[Int]("part"),
          r.getAs[Long]("offset")))
        .foreach { r =>
          val k = r.getAs[String]("key")
          sink(k) = sink(k) :+ new String(r.getAs[Array[Byte]]("value"), "UTF-8")
        }
      rows.length
    }

    val steps = 30
    for (step <- 0 until steps) {
      rnd.nextInt(11) match {
        case 0 | 1 | 2 | 3 => // produce a small batch
          val rows = (0 until 1 + rnd.nextInt(8)).map { _ =>
            val k = keys(rnd.nextInt(keys.size))
            clock += 1
            val v = s"$k#${counter(k)}"
            counter(k) += 1
            expEarly(k) = expEarly(k) :+ v
            if (lateRegistered) expLate(k) = expLate(k) :+ v
            expAudit(k) = expAudit(k) :+ v
            (k, v, ts(clock))
          }
          store.produceStrings(topic, rows)
          ()
        case 4 | 5 => // flip the ring
          store.rescale(topic, ringSizes(rnd.nextInt(ringSizes.size)))
          ()
        case 6 | 7 | 8 => // bounded polls of the live groups
          pollInto("gEarly", "c", deliveredEarly, 1L + rnd.nextInt(5))
          if (lateRegistered) pollInto("gLate", "c", deliveredLate, 1L + rnd.nextInt(5))
          ()
        case 9 => // GDPR purge of one key across the whole live lineage
          val k = keys(rnd.nextInt(keys.size))
          store.purgeKeys(topic, Seq(k))
          expEarly(k) = deliveredEarly(k)
          if (lateRegistered) expLate(k) = deliveredLate(k)
          expAudit(k) = Vector.empty
          ()
        case 10 => // compaction: content-invariant by contract — the
          // driver-side k-way merge must change NO expectation
          store.compact(topic, smallFileBytes = 1L << 20)
          ()
      }
      // register the Latest group roughly mid-sequence
      if (step == steps / 2) {
        store.registry.register("gLate", "c", Seq(topic))
        lateRegistered = true
      }
    }

    // drain both groups to quiescence. A poll returning 0 rows may STILL
    // have advanced state (the gap skip commits past purged windows
    // without delivering), so "empty" must repeat for more rounds than
    // the longest possible purged stretch divided by the page size
    // before it means drained.
    def drain(group: String, consumer: String,
        sink: scala.collection.mutable.Map[String, Vector[String]]): Unit = {
      var spins = 0
      var idle = 0
      while (idle < 60 && spins < 600) {
        if (pollInto(group, consumer, sink, 7L) == 0) idle += 1 else idle = 0
        spins += 1
      }
    }
    drain("gEarly", "c", deliveredEarly)
    drain("gLate", "c", deliveredLate)

    // 1. the Earliest group: pre-purge deliveries + post-purge produces,
    //    exactly once, per-key produce order
    keys.foreach { k =>
      assert(deliveredEarly(k) == expEarly(k),
        s"seed $seed key $k: early group diverged\n got ${deliveredEarly(k)}\nwant ${expEarly(k)}")
    }
    // 2. the Latest group: the same over the post-registration suffix
    keys.foreach { k =>
      assert(deliveredLate(k) == expLate(k),
        s"seed $seed key $k: late group diverged\n got ${deliveredLate(k)}\nwant ${expLate(k)}")
    }
    // 3. a fresh Earliest group re-reads what still exists, exactly once
    store.registry.register("gAudit", "a", Seq(topic), store.StartFrom.Earliest)
    val audit = emptyVecMap()
    pollInto("gAudit", "a", audit, Long.MaxValue)
    keys.foreach { k =>
      assert(audit(k) == expAudit(k),
        s"seed $seed key $k: audit group diverged\n got ${audit(k)}\nwant ${expAudit(k)}")
    }
  }

  /** The two-member twin: the GROUP-WIDE chain gate's contract is that
    * per-key produce order survives arbitrary produce/rescale/purge/
    * compact/paged-poll interleavings even when the key's partition
    * moves between MEMBERS at a ring flip — a v+1 record must never be
    * delivered (to either member) while its key's v record is still
    * undelivered at the OTHER member. Deliveries here are a single
    * wall-clock sequence (the test is sequential), so the per-key
    * concatenation across both members in poll order must equal the
    * surviving produce order — any gate leak shows up as a v+1 value
    * arriving ahead of a v value of the same key. The drain loop
    * round-robins both members because the gate legitimately serves
    * EMPTY pages to a drained member while its sibling lags.
    */
  for (seed <- Seq(5, 19, 31)) test(
      s"two-member group lineage: per-key order across members, seed $seed") {
    val rnd = new scala.util.Random(seed)
    val store = new TopicStore(spark, Files.createTempDirectory("graft-lineage2").toString)
    val topic = "t"
    val keys = (0 until 6).map(i => s"k$i")
    val ringSizes = Seq(3, 6, 12)

    var clock = 0
    val counter = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val exp = scala.collection.mutable.Map.empty[String, Vector[String]]
      .withDefaultValue(Vector.empty)
    val delivered = scala.collection.mutable.Map.empty[String, Vector[String]]
      .withDefaultValue(Vector.empty)

    store.registry.register("g", "cA", Seq(topic), store.StartFrom.Earliest)
    store.registry.register("g", "cB", Seq(topic), store.StartFrom.Earliest)

    def pollOne(consumer: String, maxRecords: Long): Int = {
      val rows = store.poll("g", topic, consumer, maxRecords = maxRecords).collect()
      rows.sortBy(r => (r.getAs[Int]("version"), r.getAs[Int]("part"),
          r.getAs[Long]("offset")))
        .foreach { r =>
          val k = r.getAs[String]("key")
          delivered(k) = delivered(k) :+ new String(r.getAs[Array[Byte]]("value"), "UTF-8")
        }
      rows.length
    }

    val steps = 30
    for (_ <- 0 until steps) {
      rnd.nextInt(11) match {
        case 0 | 1 | 2 | 3 => // produce a small batch
          val rows = (0 until 1 + rnd.nextInt(8)).map { _ =>
            val k = keys(rnd.nextInt(keys.size))
            clock += 1
            val v = s"$k#${counter(k)}"
            counter(k) += 1
            exp(k) = exp(k) :+ v
            (k, v, ts(clock))
          }
          store.produceStrings(topic, rows)
          ()
        case 4 | 5 => // flip the ring: keys re-home across MEMBERS too
          store.rescale(topic, ringSizes(rnd.nextInt(ringSizes.size)))
          ()
        case 6 | 7 | 8 => // bounded polls, members in random order
          val order = if (rnd.nextBoolean()) Seq("cA", "cB") else Seq("cB", "cA")
          order.foreach(c => pollOne(c, 1L + rnd.nextInt(5)))
          ()
        case 9 => // GDPR purge: sunk records survive, the rest vanish
          val k = keys(rnd.nextInt(keys.size))
          store.purgeKeys(topic, Seq(k))
          exp(k) = delivered(k)
          ()
        case 10 => // compaction: content-invariant by contract
          store.compact(topic, smallFileBytes = 1L << 20)
          ()
      }
    }

    // drain to quiescence round-robining BOTH members: one member alone
    // can stall behind the group-wide gate by design
    var spins = 0
    var idle = 0
    while (idle < 60 && spins < 600) {
      val n = pollOne("cA", 7L) + pollOne("cB", 7L)
      if (n == 0) idle += 1 else idle = 0
      spins += 1
    }

    keys.foreach { k =>
      assert(delivered(k) == exp(k),
        s"seed $seed key $k: pair group diverged\n got ${delivered(k)}\nwant ${exp(k)}")
    }
  }
}
