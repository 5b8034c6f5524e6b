package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.TopicStore

/** DSv2 connector specs: `format("graft")` batch and micro-batch reads
  * against a real topic store — record parity with the engine's own
  * poll-side view, offset-exact streaming batches, exactly-once across
  * incremental produces.
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("sources-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  private def produceN(store: TopicStore, topic: String, n: Int, keyMod: Int, tag: String): Unit = {
    val rows = (0 until n).map(i => (s"k${i % keyMod}", s"$tag-$i", ts(i)))
    store.produceStrings(topic, rows)
    ()
  }

  test("batch read equals the engine's own current-generation view") {
    val root = Files.createTempDirectory("graft-src").toString
    val store = new TopicStore(spark, root)
    produceN(store, "t", 600, 37, "a")
    val viaSource = spark.read.format("graft")
      .option("root", root).option("topic", "t").load()
    val viaEngine = Graft.topic(spark, root, "t")
    assert(viaSource.count() == 600)
    val a = viaSource
      .select(col("key"), decode(col("value"), "UTF-8").as("v"), col("part"), col("offset"),
        col("token"), col("range"), col("version"), col("timestamp"))
      .collect().map(_.toSeq).toSet
    val b = viaEngine
      .select(col("key"), decode(col("value"), "UTF-8").as("v"), col("part"), col("offset"),
        col("token"), col("range"), col("version"), col("timestamp"))
      .collect().map(_.toSeq).toSet
    assert(a == b, "source rows must equal the partition-pruned parquet view")
  }

  test("DSv2 planning serializes against maintenance swaps (global per-root lock)") {
    // the maintenance lock must be JVM-global per (root, topic): the DSv2
    // scan builds its OWN TopicStore over the root, and with per-instance
    // locks its listing could catch a purge mid-swap (rename-in done,
    // delete pending) and double-deliver survivors at identical offsets
    val root = Files.createTempDirectory("graft-src").toString
    assert(TopicStore.lockFor(root, "t") eq TopicStore.lockFor(root + "/", "t"),
      "lock registry must normalize the root path")
    assert(TopicStore.lockFor(root, "t") eq TopicStore.lockFor(s"file://$root", "t"),
      "scheme-variant spellings of one root must share the lock")
    val serving = new TopicStore(spark, root)
    produceN(serving, "t", 400, 40, "a")
    val evens = spark.read.format("graft")
      .option("root", root).option("topic", "t").load()
      .filter(expr("cast(substring(key, 2, 10) as int) % 2 = 0"))
      .select(col("key"), decode(col("value"), "UTF-8").as("v"))
      .collect().map(_.toSeq).toSet
    assert(evens.nonEmpty)
    @volatile var purgeErr: Option[Throwable] = None
    val purger = new Thread(() => {
      try {
        (0 until 10).foreach { i => serving.purgeKeys("t", Seq(s"k${2 * i + 1}")); () }
      } catch { case t: Throwable => purgeErr = Some(t) }
    })
    purger.start()
    var reads = 0
    var failures = 0
    // keep reading until at least ONE snapshot succeeds: on a loaded host
    // the 10-purge loop can finish before the first collect() does, which
    // made `reads > 0` a wall-clock race (lost twice under full-suite
    // load this round, green in isolation every time). Reads that land
    // after the last purge still validate planning coherence against the
    // swapped metadata; the failures bound keeps real breakage loud.
    while ((purger.isAlive || reads == 0) && failures < 10) {
      try {
        val rows = spark.read.format("graft")
          .option("root", root).option("topic", "t").load()
          .select(col("key"), decode(col("value"), "UTF-8").as("v"),
            col("part"), col("offset"))
          .collect()
        // (a) no double delivery: offsets unique within a coherent snapshot
        val po = rows.map(r => (r.getInt(2), r.getLong(3)))
        assert(po.length == po.distinct.length,
          s"duplicate (part, offset) rows in a planned snapshot (read $reads)")
        // (b) never-purged keys are always complete
        val got = rows.filter(_.getString(0).drop(1).toInt % 2 == 0)
          .map(r => Seq(r.get(0), r.get(1))).toSet
        assert(got == evens, s"even-key rows lost or duplicated (read $reads)")
        reads += 1
      } catch {
        // a file deleted AFTER a coherent planning is a loud, retryable
        // failure (the batch analog of paging into retention) — never
        // silent duplication
        case _: org.apache.spark.SparkException => failures += 1
      }
    }
    purger.join()
    assert(purgeErr.isEmpty, s"purge loop failed: $purgeErr")
    assert(reads > 0, "no successful concurrent read completed")
  }

  test("micro-batch stream delivers offset-exact batches exactly once") {
    val root = Files.createTempDirectory("graft-src").toString
    val chk = Files.createTempDirectory("graft-src-chk").toString
    val store = new TopicStore(spark, root)
    produceN(store, "s", 500, 23, "first")

    val q = spark.readStream.format("graft")
      .option("root", root).option("topic", "s").load()
      .writeStream.format("memory").queryName("graft_src_sink")
      .option("checkpointLocation", chk)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_src_sink").count() == 500)

      // incremental produce: ONLY the new offsets arrive (no replay)
      produceN(store, "s", 300, 23, "second")
      q.processAllAvailable()
      val all = spark.table("graft_src_sink")
        .select(col("part"), col("offset"), decode(col("value"), "UTF-8").as("v"))
        .collect()
      assert(all.length == 800, "second batch must append exactly the new records")
      assert(all.map(r => (r.getInt(0), r.getLong(1))).distinct.length == 800,
        "(part, offset) pairs must be unique — exactly-once")
      // per-partition offsets are contiguous from 0 (the engine contract,
      // observed through the connector)
      all.groupBy(_.getInt(0)).foreach { case (_, rows) =>
        val offs = rows.map(_.getLong(1)).sorted
        assert(offs.head == 0L && offs.last == offs.length - 1L)
      }
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_src_sink")
      ()
    }
  }

  test("maxRecordsPerTrigger bounds every micro-batch (admission control)") {
    val root = Files.createTempDirectory("graft-src").toString
    val chk = Files.createTempDirectory("graft-src-chk").toString
    val store = new TopicStore(spark, root)
    produceN(store, "r", 500, 13, "rate")
    val q = spark.readStream.format("graft")
      .option("root", root).option("topic", "r")
      .option("maxRecordsPerTrigger", "120")
      .load()
      .writeStream.format("memory").queryName("graft_src_rate")
      .option("checkpointLocation", chk)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_src_rate").count() == 500)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 5, "500 rows at <=120/batch needs >= 5 batches")
      batches.foreach(p => assert(p.numInputRows <= 120,
        s"batch exceeded the record budget: ${p.numInputRows}"))
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_src_rate")
      ()
    }
  }

  test("partitions first touched AFTER the stream started deliver from offset zero") {
    // regression: with from = {p1: n} and a later produce landing in
    // OTHER partitions at offsets 0..k, a min-over-from pushdown bound
    // would drop those first records at parquet record level
    val root = Files.createTempDirectory("graft-src").toString
    val chk = Files.createTempDirectory("graft-src-chk").toString
    val store = new TopicStore(spark, root)
    // one single key -> every record lands in ONE ring partition
    store.produceStrings("n", (0 until 40).map(i => ("onlykey", s"a-$i", ts(i))))
    val q = spark.readStream.format("graft")
      .option("root", root).option("topic", "n").load()
      .writeStream.format("memory").queryName("graft_src_newpart")
      .option("checkpointLocation", chk)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_src_newpart").count() == 40)
      // diverse keys -> new partitions whose offsets start at 0
      produceN(store, "n", 200, 97, "b")
      q.processAllAvailable()
      val n = spark.table("graft_src_newpart").count()
      // recorded flake (~1 in 6 full-suite runs as of r5): on recurrence
      // the per-partition delivered/produced breakdown below is the
      // diagnostic — it distinguishes a dropped-first-record pushdown bug
      // from a racing micro-batch that hasn't committed the tail
      if (n != 240) {
        val got = spark.table("graft_src_newpart")
          .groupBy("part").agg(
            org.apache.spark.sql.functions.count("*").as("n"),
            org.apache.spark.sql.functions.min("offset").as("min_off"),
            org.apache.spark.sql.functions.max("offset").as("max_off"))
          .orderBy("part").collect().mkString(", ")
        val produced = store.producerOffsets("n").toSeq.sorted.mkString(", ")
        fail(s"expected all 240 records, got $n — first records of newly-" +
          s"touched partitions were dropped?\n  delivered: $got\n  produced next-offsets: $produced")
      }
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_src_newpart")
      ()
    }
  }

  test("sweeping a stream's positioned generation mid-stream fails loudly") {
    // sweepStaleGenerations only sees consumer GROUPS with committed
    // state; a streaming checkpoint is invisible to it. If an admin
    // sweeps the generation a stream is positioned in, the frozen
    // watermarks that would prove the stream drained it are gone too —
    // the stream must fail loudly (its at-least-once claim can no longer
    // be verified), not silently re-anchor
    // the stream must be STOPPED while the sweep runs: a live stream's
    // continuous triggers would legitimately advance its checkpoint to
    // generation 2 the moment the rescale lands (the ride-through
    // feature), and the sweep would then be harmless
    val root = Files.createTempDirectory("graft-src").toString
    val chk = Files.createTempDirectory("graft-src-chk").toString
    val store = new TopicStore(spark, root)
    produceN(store, "g", 30, 5, "pre")
    def startQ() = spark.readStream.format("graft")
      .option("root", root).option("topic", "g").load()
      .writeStream.format("memory").queryName("graft_src_swept")
      .option("checkpointLocation", chk)
      .start()
    val q = startQ()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_src_swept").count() == 30)
    } finally q.stop()
    // checkpoint rests at (gen 1, its watermarks); flip + sweep while down
    store.rescale("g", 6)
    // no consumer group has state -> the sweep reclaims generation 1
    // (streams are invisible to the drain check)
    assert(store.sweepStaleGenerations("g") > 0)
    produceN(store, "g", 10, 5, "post")
    // the memory sink cannot recover a checkpoint; the restart uses
    // foreachBatch over the SAME offset log — the failure lives in the
    // source's latestOffset, not the sink
    val q2 = spark.readStream.format("graft")
      .option("root", root).option("topic", "g").load()
      .writeStream.foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
      .option("checkpointLocation", chk)
      .start()
    try {
      val ex = intercept[Exception] { q2.processAllAvailable() }
      def swept(m: String) = m != null && m.contains("no longer live")
      assert(swept(ex.getMessage) ||
        Option(q2.exception.orNull).exists(e => swept(e.getMessage)),
        s"expected the swept-generation error, got: ${ex.getMessage}")
    } finally {
      try q2.stop() catch { case _: Exception => () }
      spark.sql("DROP VIEW IF EXISTS graft_src_swept")
      ()
    }
  }

  test("a parked NOTHING-CONSUMED checkpoint fails loudly when its generation is swept with data") {
    // the dangerous twin of the swept-mid-stream case: the stream's
    // checkpoint holds (gen 1, EMPTY positions) because the topic was
    // empty when it first triggered. Records are then produced into
    // generation 1, a rescale flips to 2, and a sweep reclaims 1 (groups
    // drained it; streams are invisible to the drain check). Generation
    // 1's records existed and this stream never delivered them — the
    // restart must fail loudly, not silently re-anchor past them.
    val root = Files.createTempDirectory("graft-src").toString
    val chk = Files.createTempDirectory("graft-src-chk").toString
    val store = new TopicStore(spark, root)
    store.produceStrings("el", Seq(("seed", "x", ts(0)))) // create the store root
    val q = spark.readStream.format("graft")
      .option("root", root).option("topic", "e1").load()
      .writeStream.foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
      .option("checkpointLocation", chk)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    // checkpoint now rests at (gen 1, {}); produce + flip + sweep while down
    produceN(store, "e1", 30, 5, "missed")
    store.rescale("e1", 6)
    assert(store.sweepStaleGenerations("e1") > 0)
    assert(store.droppedEmptyVersions("e1").isEmpty,
      "a data-bearing sweep must not leave an empty tombstone")
    val q2 = spark.readStream.format("graft")
      .option("root", root).option("topic", "e1").load()
      .writeStream.foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
      .option("checkpointLocation", chk)
      .start()
    try {
      val ex = intercept[Exception] { q2.processAllAvailable() }
      def swept(m: String) = m != null && m.contains("no longer live")
      assert(swept(ex.getMessage) ||
        Option(q2.exception.orNull).exists(e => swept(e.getMessage)),
        s"expected the swept-generation error, got: ${ex.getMessage}")
    } finally {
      try q2.stop() catch { case _: Exception => () }
    }
  }

  test("a parked checkpoint in a DROPPED-EMPTY generation re-anchors via its tombstone") {
    // the safe twin: the positioned generation was dropped by rescale's
    // chain hygiene as record-free and state-free. The tombstone proves
    // nothing existed there, so the restart re-anchors forward and
    // delivers the new generation's records
    val root = Files.createTempDirectory("graft-src").toString
    val chk = Files.createTempDirectory("graft-src-chk").toString
    val store = new TopicStore(spark, root)
    store.produceStrings("el2", Seq(("seed", "x", ts(0)))) // create the store root
    val q = spark.readStream.format("graft")
      .option("root", root).option("topic", "e2").load()
      .writeStream.foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
      .option("checkpointLocation", chk)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    // gen 1 never held a record: the rescale drops it with a tombstone
    store.rescale("e2", 6)
    assert(store.droppedEmptyVersions("e2") == Set(1))
    produceN(store, "e2", 20, 5, "post")
    val got = new java.util.concurrent.atomic.AtomicLong
    val q2 = spark.readStream.format("graft")
      .option("root", root).option("topic", "e2").load()
      .writeStream.foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
        got.addAndGet(df.count()); ()
      })
      .option("checkpointLocation", chk)
      .start()
    try {
      q2.processAllAvailable()
      assert(got.get() == 20, s"expected the 20 post-flip records, got ${got.get()}")
    } finally q2.stop()
  }

  test("a stream rides through a mid-stream rescale: exactly once across the flip") {
    // the reference consumer's R6 split/join continuity
    // (`offset_state.go:492-611`): a running stream drains its
    // generation to the frozen watermarks, then continues at the next
    // generation's offset 0 — every record exactly once, no restart
    val root = Files.createTempDirectory("graft-src").toString
    val chk = Files.createTempDirectory("graft-src-chk").toString
    val store = new TopicStore(spark, root)
    produceN(store, "g", 100, 11, "pre")
    val q = spark.readStream.format("graft")
      .option("root", root).option("topic", "g")
      // small trigger budget so the drain + flip spans several
      // micro-batches — the boundary is crossed mid-stream, not in one
      // catch-all batch
      .option("maxRecordsPerTrigger", "40").load()
      .writeStream.format("memory").queryName("graft_src_gen")
      .option("checkpointLocation", chk)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_src_gen").count() == 100)
      store.rescale("g", 6) // generation v2 opens empty; v1 stays live
      produceN(store, "g", 50, 11, "post")
      store.rescale("g", 3) // a second flip mid-stream: v3, chain 1,2,3
      produceN(store, "g", 30, 11, "post2")
      q.processAllAvailable()
      val rows = spark.table("graft_src_gen")
        .select(col("version"), decode(col("value"), "UTF-8").as("v")).collect()
      assert(rows.length == 180, s"expected 180 rows across 3 generations, got ${rows.length}")
      // exactly once: no body delivered twice, and each generation
      // carries exactly its own produces
      assert(rows.map(r => (r.getInt(0), r.getString(1))).distinct.length == 180)
      val byGen = rows.groupBy(_.getInt(0)).view.mapValues(_.length).toMap
      assert(byGen == Map(1 -> 100, 2 -> 50, 3 -> 30),
        s"per-generation delivery mismatch: $byGen")
    } finally {
      try q.stop() catch { case _: Exception => () }
      spark.sql("DROP VIEW IF EXISTS graft_src_gen")
      ()
    }
  }

  test("stream started mid-topic still begins at offset zero (earliest)") {
    val root = Files.createTempDirectory("graft-src").toString
    val chk = Files.createTempDirectory("graft-src-chk").toString
    val store = new TopicStore(spark, root)
    produceN(store, "m", 100, 7, "pre")
    produceN(store, "m", 100, 7, "pre2")
    val q = spark.readStream.format("graft")
      .option("root", root).option("topic", "m").load()
      .writeStream.format("memory").queryName("graft_src_mid")
      .option("checkpointLocation", chk)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("graft_src_mid").count() == 200)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_src_mid")
      ()
    }
  }

  test("DSv2 write path: df.write.format(\"graft\") routes through produce") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-src").toString
    // string values + explicit timestamps through the writer surface
    (0 until 300).map(i => (s"k${i % 11}", s"w-$i", ts(i)))
      .toDF("key", "value", "timestamp")
      .write.format("graft")
      .option("root", root).option("topic", "w")
      .mode("append").save()
    // second append continues offsets (watermark survives across writes)
    (300 until 400).map(i => (s"k${i % 11}", s"w-$i", ts(i)))
      .toDF("key", "value", "timestamp")
      .write.format("graft")
      .option("root", root).option("topic", "w")
      .mode("append").save()

    val back = spark.read.format("graft")
      .option("root", root).option("topic", "w").load()
    assert(back.count() == 400)
    // offsets are contiguous from 0 per ring partition (§2.6.3)
    val perPart = back.groupBy(col("part"))
      .agg(min(col("offset")).as("lo"), max(col("offset")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
    perPart.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
    // routing matches the engine's own produce for the same keys
    val store = new TopicStore(spark, root)
    store.produceStrings("w2", Seq(("k3", "x", ts(1))))
    val viaWriter = back.filter(col("key") === "k3").select("part").head().getInt(0)
    val viaEngine = Graft.topic(spark, root, "w2").select("part").head().getInt(0)
    assert(viaWriter == viaEngine, "writer surface must use the same ring routing")
  }

  test("DSv2 write path rejects overwrite and malformed producer schemas") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-src").toString
    val df = Seq(("k", "v")).toDF("key", "value")
    // Spark itself rejects overwrite at plan time: the table declares no
    // TRUNCATE/OVERWRITE_BY_FILTER capability (topics are append-only logs)
    val e1 = intercept[Exception] {
      df.write.format("graft").option("root", root).option("topic", "x")
        .mode("overwrite").save()
    }
    assert(e1.getMessage.toLowerCase.contains("truncate"))
    val e2 = intercept[Exception] {
      Seq(("k", "v", 1)).toDF("key", "value", "part")
        .write.format("graft").option("root", root).option("topic", "x")
        .mode("append").save()
    }
    assert(e2.getMessage.contains("part"))
    // missing timestamp is fine: server ingest time (§2.6.5)
    df.write.format("graft").option("root", root).option("topic", "x")
      .mode("append").save()
    val back = spark.read.format("graft")
      .option("root", root).option("topic", "x").load()
    assert(back.count() == 1 && !back.head().isNullAt(2))
  }

  test("DSv2 write path treats integral timestamps as epoch MICROS") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-src").toString
    // the producer protocol's unit everywhere else in the engine is epoch
    // micros; a blanket cast(TimestampType) would read a LONG as SECONDS
    // (~50,000 years off) and silently corrupt offsetsForTime cuts
    val micros = 1700000000000000L
    Seq(("k", "v", micros)).toDF("key", "value", "timestamp")
      .write.format("graft").option("root", root).option("topic", "m")
      .mode("append").save()
    val got = spark.read.format("graft")
      .option("root", root).option("topic", "m").load()
      .select(unix_micros(col("timestamp"))).head().getLong(0)
    assert(got == micros, s"expected micros round-trip, got $got")
    // non-integral, non-timestamp columns are rejected loudly
    val e = intercept[Exception] {
      Seq(("k", "v", "2024-01-01")).toDF("key", "value", "timestamp")
        .write.format("graft").option("root", root).option("topic", "m")
        .mode("append").save()
    }
    assert(e.getMessage.contains("timestamp must be"))
    // IntegerType too: it can hold ±35 MINUTES of epoch micros, so an int
    // column is certainly the wrong unit — accepting it would land every
    // record in Jan 1970
    val eInt = intercept[Exception] {
      Seq(("k", "v", 1700000000)).toDF("key", "value", "timestamp")
        .write.format("graft").option("root", root).option("topic", "m")
        .mode("append").save()
    }
    assert(eInt.getMessage.contains("timestamp must be"))
  }

  test("DSv2 options resolve case-insensitively") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-src").toString
    Seq(("k", "v")).toDF("key", "value")
      .write.format("graft").option("Root", root).option("TOPIC", "ci")
      .mode("append").save()
    val got = spark.read.format("graft")
      .option("ROOT", root).option("Topic", "ci").load()
    assert(got.count() == 1)
  }
}
