package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.TopicStore

/** Randomized (seeded, sequential) model test of LINEAGE SERVING — the
  * metadata-only rescale's delivery contract under arbitrary
  * interleavings of produce batches, ring flips, and bounded polls whose
  * pages land at random positions relative to generation boundaries:
  *
  *  1. an Earliest group that polls throughout delivers EVERY produced
  *     record EXACTLY ONCE, and per key the concatenation of its pages
  *     (in poll order) equals produce order — generation v+1 records
  *     never jump ahead of generation v's (the chain barrier);
  *  2. a Latest group registered mid-sequence delivers exactly the
  *     records produced AFTER its registration, in the same per-key
  *     order (pre-snapshot generations are history, the snapshot
  *     generation starts at its watermarks, later generations read in
  *     full);
  *  3. a fresh Earliest group at quiescence re-reads everything exactly
  *     once (the chain still addresses every record).
  *
  * ChaosSpec stresses the same machinery CONCURRENTLY; this spec pins
  * the sequential semantics tightly enough to catch off-by-one paging
  * at a generation boundary, a wrong Latest baseline after a flip, or a
  * chain-hygiene drop of a generation that still owed records.
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

  for (seed <- Seq(11, 23, 47)) test(s"random produce/rescale/paged-poll interleave, seed $seed") {
    val rnd = new scala.util.Random(seed)
    val store = new TopicStore(spark, Files.createTempDirectory("graft-lineage").toString)
    val topic = "t"
    val keys = (0 until 6).map(i => s"k$i")
    val ringSizes = Seq(1, 3, 6, 12)

    var clock = 0
    val produced = scala.collection.mutable.Map.empty[String, Vector[String]]
      .withDefaultValue(Vector.empty)
    // per-key produce position at the moment the Latest group registers
    var latestBaseline: Map[String, Int] = null

    store.registry.register("gEarly", "c", Seq(topic), store.StartFrom.Earliest)
    val deliveredEarly = scala.collection.mutable.Map.empty[String, Vector[String]]
      .withDefaultValue(Vector.empty)
    val deliveredLate = scala.collection.mutable.Map.empty[String, Vector[String]]
      .withDefaultValue(Vector.empty)

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

    val steps = 28
    for (step <- 0 until steps) {
      rnd.nextInt(4) match {
        case 0 | 1 => // produce a small batch
          val rows = (0 until 1 + rnd.nextInt(8)).map { _ =>
            val k = keys(rnd.nextInt(keys.size))
            clock += 1
            val v = s"$k#${produced(k).size}"
            produced(k) = produced(k) :+ v
            (k, v, ts(clock))
          }
          store.produceStrings(topic, rows)
          ()
        case 2 => // flip the ring
          store.rescale(topic, ringSizes(rnd.nextInt(ringSizes.size)))
          ()
        case 3 => // bounded poll of the long-lived group
          pollInto("gEarly", "c", deliveredEarly, 1L + rnd.nextInt(5))
          ()
      }
      // register the Latest group roughly mid-sequence
      if (step == steps / 2) {
        store.registry.register("gLate", "c", Seq(topic))
        latestBaseline = keys.map(k => k -> produced(k).size).toMap
      }
    }

    // drain both groups to quiescence (bounded loop: paged polls make
    // progress every round while lag remains)
    var spins = 0
    while (pollInto("gEarly", "c", deliveredEarly, 7L) > 0 && spins < 200) spins += 1
    spins = 0
    while (pollInto("gLate", "c", deliveredLate, 7L) > 0 && spins < 200) spins += 1

    // 1. the Earliest group: everything, exactly once, per-key produce order
    keys.foreach { k =>
      assert(deliveredEarly(k) == produced(k),
        s"seed $seed key $k: early group diverged\n got ${deliveredEarly(k)}\nwant ${produced(k)}")
    }
    // 2. the Latest group: exactly the post-registration suffix, in order
    keys.foreach { k =>
      val want = produced(k).drop(latestBaseline(k))
      assert(deliveredLate(k) == want,
        s"seed $seed key $k: late group diverged\n got ${deliveredLate(k)}\nwant $want " +
          s"(baseline ${latestBaseline(k)} of ${produced(k).size})")
    }
    // 3. a fresh Earliest group re-reads the whole lineage exactly once
    store.registry.register("gAudit", "a", Seq(topic), store.StartFrom.Earliest)
    val audit = scala.collection.mutable.Map.empty[String, Vector[String]]
      .withDefaultValue(Vector.empty)
    pollInto("gAudit", "a", audit, Long.MaxValue)
    keys.foreach { k =>
      assert(audit(k) == produced(k), s"seed $seed key $k: audit group diverged")
    }
  }
}
