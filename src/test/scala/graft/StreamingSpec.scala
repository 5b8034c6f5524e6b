package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.TopicStore
import graft.streaming.{StreamOps, StreamingTopic}

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("streaming-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("streaming ingest keeps offsets contiguous across micro-batches") {
    import spark.implicits._
    val store = new TopicStore(spark, Files.createTempDirectory("graft-stream").toString)
    val streaming = new StreamingTopic(store)
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(String, String, Timestamp)]
    val input = mem.toDF().toDF("key", "svalue", "timestamp")
      .withColumn("value", encode(col("svalue"), "UTF-8"))
      .select("key", "value", "timestamp")

    val q = streaming.ingest("t", input,
      Files.createTempDirectory("graft-ckpt").toString)
    mem.addData(("a", "m0", ts(0)), ("b", "m1", ts(1)))
    q.processAllAvailable()
    mem.addData(("a", "m2", ts(2)))
    q.processAllAvailable()
    q.stop()

    store.registry.register("g", "c", Seq("t"), store.StartFrom.Earliest)
    val out = store.poll("g", "t", "c").collect()
      .map(r => (r.getAs[String]("key"), new String(r.getAs[Array[Byte]]("value")),
        r.getAs[Long]("offset")))
    assert(out.length == 3)
    val aMsgs = out.filter(_._1 == "a").sortBy(_._3).map(_._2)
    assert(aMsgs.toSeq == Seq("m0", "m2")) // per-key order across batches
    // contiguous offsets within a's partition
    val aOffs = out.filter(_._1 == "a").map(_._3).sorted
    assert(aOffs.last - aOffs.head == aOffs.length - 1L)
  }

  test("a checkpoint recreated at the same path gets a fresh batch ledger") {
    // the ledger is keyed on (path, query id), not path alone: a deleted
    // and recreated checkpoint restarts batch ids at 0, and a path-keyed
    // ledger would silently skip the new stream's first batches as
    // "replays" of the old one — loss, not dedup
    import spark.implicits._
    val store = new TopicStore(spark, Files.createTempDirectory("graft-stream").toString)
    val streaming = new StreamingTopic(store)
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    def run(msgs: (String, String, Timestamp)*): Unit = {
      val mem = MemoryStream[(String, String, Timestamp)]
      val input = mem.toDF().toDF("key", "svalue", "timestamp")
        .withColumn("value", encode(col("svalue"), "UTF-8"))
        .select("key", "value", "timestamp")
      val q = streaming.ingest("relg", input, ckpt)
      mem.addData(msgs: _*)
      q.processAllAvailable()
      q.stop()
    }
    run(("a", "first-0", ts(0)), ("a", "first-1", ts(1)))
    // wipe the checkpoint: the next query restarts batch ids at 0
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(ckpt), true))
    run(("a", "second-0", ts(10)))

    store.registry.register("g", "c", Seq("relg"), store.StartFrom.Earliest)
    val vals = store.poll("g", "relg", "c").collect()
      .map(r => new String(r.getAs[Array[Byte]]("value"))).toSet
    assert(vals == Set("first-0", "first-1", "second-0"),
      s"the recreated checkpoint's batch was ledger-skipped: $vals")
  }

  test("produceOnce skips a replayed micro-batch, even across store restarts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-once").toString
    val store = new TopicStore(spark, root)
    val batch = Seq(("a", "m0", ts(0)), ("b", "m1", ts(1)))
      .toDF("key", "svalue", "timestamp")
      .withColumn("value", encode(col("svalue"), "UTF-8"))
      .select("key", "value", "timestamp")

    // produce returns the topic's cumulative high-watermark sum; a
    // skipped replay returns 0 without running any job
    assert(store.produceOnce("t", batch, "stream-1", 0L) == 2L)
    // foreachBatch redelivers batch 0 after a crash-restart: skipped
    assert(store.produceOnce("t", batch, "stream-1", 0L) == 0L)
    // the ledger is durable — a NEW store over the same root still skips
    val store2 = new TopicStore(spark, root)
    assert(store2.produceOnce("t", batch, "stream-1", 0L) == 0L)
    // the next batch id goes through; an unrelated stream id is unaffected
    assert(store2.produceOnce("t", batch, "stream-1", 1L) == 4L)
    assert(store2.produceOnce("t", batch, "stream-2", 0L) == 6L)

    store2.registry.register("g", "c", Seq("t"), store2.StartFrom.Earliest)
    assert(store2.poll("g", "t", "c").count() == 6L)
  }

  test("topic readStream delivers produced records") {
    import spark.implicits._
    val store = new TopicStore(spark, Files.createTempDirectory("graft-stream2").toString)
    store.produceStrings("t", Seq(("k1", "v1", ts(0)), ("k2", "v2", ts(1))))

    val streaming = new StreamingTopic(store)
    val q = streaming.stream("t")
      .writeStream.format("memory").queryName("topic_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT key FROM topic_out").as[String].collect().sorted
    assert(got.toSeq == Seq("k1", "k2"))
  }

  test("topic readStream spans the live lineage after a rescale, exactly once") {
    val store = new TopicStore(spark, Files.createTempDirectory("graft-stream3").toString)
    store.produceStrings("t", (0 until 6).map(i => (s"k$i", s"m$i", ts(i))))
    store.rescale("t", 6) // metadata-only: the 6 records stay in v1, which stays live

    val streaming = new StreamingTopic(store)
    val q = streaming.stream("t")
      .writeStream.format("memory").queryName("topic_gen_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    // all 6 records exactly once, served from their birth generation —
    // the stream anchors at the earliest live generation and walks the
    // chain; nothing is delivered twice
    val got = spark.sql("SELECT version, key FROM topic_gen_out").collect()
    assert(got.length == 6, s"lineage mis-served: ${got.length} rows")
    assert(got.map(_.getInt(0)).distinct.toSeq == Seq(1))
    assert(got.map(_.getString(1)).sorted.toSeq == (0 until 6).map(i => s"k$i"))
  }

  test("topic-to-topic mirror: stream() composed into ingest()") {
    val store = new TopicStore(spark, Files.createTempDirectory("graft-mirror").toString)
    store.produceStrings("src", (0 until 9).map(i => (s"k${i % 3}", s"m$i", ts(i))))

    val streaming = new StreamingTopic(store)
    val mirrored = streaming.stream("src")
      .select(col("key"), col("value"), col("timestamp"))
    val q = streaming.ingest("dst", mirrored,
      Files.createTempDirectory("graft-mirror-ckpt").toString)
    q.processAllAvailable()
    q.stop()

    store.registry.register("g", "c", Seq("dst"), store.StartFrom.Earliest)
    val out = store.poll("g", "dst", "c").collect()
    assert(out.length == 9)
    // per-key produce order survives the mirror (same keys -> same ring
    // placement; offsets re-sequence on timestamp within the partition)
    out.groupBy(_.getAs[String]("key")).foreach { case (key, msgs) =>
      val got = msgs.sortBy(_.getAs[Long]("offset"))
        .map(r => new String(r.getAs[Array[Byte]]("value"))).toSeq
      val want = (0 until 9).filter(i => s"k${i % 3}" == key).map(i => s"m$i")
      assert(got == want, s"mirror broke per-key order for $key")
    }
  }

  test("watermarked windowed aggregation over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val events = mem.toDF().toDF("key", "ts")

    val agg = StreamOps.windowedAgg(events, "ts", "10 seconds", "30 seconds")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    mem.addData(("a", ts(1)), ("a", ts(2)), ("b", ts(11)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT key, n FROM win_out").as[(String, Long)].collect().toMap
    assert(rows == Map("a" -> 2L, "b" -> 1L))
  }

  test("sliding windows count each event in every overlapping window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val events = mem.toDF().toDF("key", "ts")
    val agg = StreamOps.slidingAgg(events, "ts", "10 seconds", "5 seconds", "30 seconds")
    val q = agg.writeStream.format("memory").queryName("slide_out")
      .outputMode("update").start()
    mem.addData(("a", ts(7)))
    q.processAllAvailable()
    q.stop()
    // one event at t=7s falls in windows [0,10) and [5,15)
    val rows = spark.sql("SELECT win_start, n FROM slide_out")
      .as[(Timestamp, Long)].collect().toMap
    assert(rows.size == 2 && rows.values.forall(_ == 1L))
  }

  test("session windows split on gaps and close via watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val events = mem.toDF().toDF("key", "ts")
    val agg = StreamOps.sessionAgg(events, "ts", "10 seconds", "5 seconds")
    val q = agg.writeStream.format("memory").queryName("sess_win_out")
      .outputMode("complete").start()
    // two bursts 30s apart: two sessions for key a
    mem.addData(("a", ts(0)), ("a", ts(3)), ("a", ts(40)), ("b", ts(41)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT key, n FROM sess_win_out ORDER BY key, n")
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq(("a", 1L), ("a", 2L), ("b", 1L)))
  }

  test("dropDuplicatesWithinWatermark removes streaming dupes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val events = mem.toDF().toDF("key", "ts")
    val dedup = StreamOps.dedupWithinWatermark(events, "ts", "1 minute", Seq("key"))
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData(("x", ts(0)), ("x", ts(5)), ("y", ts(6)))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT key FROM dedup_out").as[String].collect().sorted
    assert(got.toSeq == Seq("x", "y"))
  }

  test("topic DSv2 stream composes into a watermarked session_window aggregation") {
    // end-to-end §2.7 composition: the graft micro-batch source feeding a
    // stateful session-window agg — k1's two produces land 10 s apart
    // (one session), k2's second lands 120 s later (two sessions) under a
    // 60 s gap; the late z-record advances the watermark so sessions close
    import spark.implicits._
    val store = new TopicStore(spark, Files.createTempDirectory("graft-sessw").toString)
    val streaming = new StreamingTopic(store)
    store.produceStrings("t",
      Seq(("k1", "a", ts(0)), ("k1", "b", ts(10)), ("k2", "c", ts(0)), ("k2", "d", ts(130))))
    store.produceStrings("t", Seq(("z", "w", ts(600))))
    val q = StreamOps.sessionAgg(
        streaming.stream("t").select(col("key"), col("timestamp")),
        "timestamp", "60 seconds", "10 seconds")
      .writeStream.format("memory").queryName("sessw_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT key, n FROM sessw_out WHERE key IN ('k1','k2')")
      .as[(String, Long)].collect().sorted.toSeq
    assert(got == Seq(("k1", 2L), ("k2", 1L), ("k2", 1L)),
      s"session composition over the topic source diverged: $got")
    spark.sql("DROP VIEW IF EXISTS sessw_out")
    ()
  }

  test("transformWithState tracks per-key high watermark and duplicate count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.OffsetSeen]
      val q = StreamOps.offsetWatermarks(mem.toDS())
        .writeStream.format("memory").queryName("hw_out")
        .outputMode("update").start()
      mem.addData(
        StreamOps.OffsetSeen("a", 0), StreamOps.OffsetSeen("a", 1),
        StreamOps.OffsetSeen("b", 7))
      q.processAllAvailable()
      // batch 2 redelivers a@1 (at-least-once replay) and advances b
      mem.addData(StreamOps.OffsetSeen("a", 1), StreamOps.OffsetSeen("b", 8))
      q.processAllAvailable()
      q.stop()
      // update mode appends one row per (key, batch) to the memory sink in
      // no guaranteed order; state is monotone, so the final state is the max
      val last = spark.sql("SELECT key, max(high), max(dupes) FROM hw_out GROUP BY key")
        .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(last("a") == ((1L, 1L)))
      assert(last("b") == ((8L, 0L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming overlap matcher equals the batch hour-blocked pair set on real sessions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the REAL 6 h-gap session table, streamed in three arbitrary
      // micro-batches (the matcher's emission is arrival-order
      // independent: a pair fires when the later of its two intervals
      // lands in the overlap-start bucket)
      val d = "/root/testdata/sf0.001"
      val sess = graft.operators.SessionOps.sessionTable(spark, d)
        .select(col("user_id").as("user"), col("sid"),
          col("start_us").as("startUs"), col("end_us").as("endUs"))
        .as[StreamOps.ClosedInterval].collect().toSeq
        .sortBy(ci => (ci.endUs, ci.user, ci.sid))
      assert(sess.nonEmpty)
      val mem = MemoryStream[StreamOps.ClosedInterval]
      // endUs-sorted batches keep every close on-time under the 1 h
      // default lateness; the duration contract is pinned wide so no
      // fixture session can outlive its buckets' reclaim timers
      val q = StreamOps.overlapStream(mem.toDS(),
          maxSessionUs = 3650L * 24L * 3600000000L)
        .writeStream.format("memory").queryName("ovl_out")
        .outputMode("update").start()
      val third = math.max(1, sess.size / 3)
      sess.grouped(third).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.sql("SELECT ua, sa, ub, sb, ovlUs, hod FROM ovl_out")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      // exactly once: no pair emitted twice across batch boundaries
      assert(got.distinct.length == got.length, "a pair was emitted twice")
      val want = graft.operators.OverlapOps.meetingPairs(spark, d)
        .select(col("ua"), col("sa"), col("ub"), col("sb"), col("ovl_us"), col("hod"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(want.nonEmpty, "degenerate fixture: no overlapping sessions at sf0.001")
      assert(got.toSet == want,
        s"stream pairs (${got.length}) diverge from the batch join (${want.size})")
      spark.sql("DROP VIEW IF EXISTS ovl_out")
      ()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("overlap matcher reclaims past hour buckets via event-time timers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val H = 3600000000L // micros per hour
      val mem = MemoryStream[StreamOps.ClosedInterval]
      // 2 h duration contract: bucket h reclaims once the close-time
      // watermark passes h_end + 2 h
      val q = StreamOps.overlapStream(mem.toDS(),
          lateness = "1 second", maxSessionUs = 2L * H)
        .writeStream.format("memory").queryName("ovl_ttl_out")
        .outputMode("update").start()
      // A: resident in bucket 0
      mem.addData(StreamOps.ClosedInterval(1L, 1L, 0L, H / 2))
      q.processAllAvailable()
      // F: far future — advances the close-time watermark way past
      // bucket 0's reclaim point (1 h bucket end + 2 h contract)
      mem.addData(StreamOps.ClosedInterval(9L, 1L, 10L * H, 10L * H + H / 2))
      q.processAllAvailable()
      // F2 (same user as F: pairs with nothing) runs one more batch
      // under the advanced watermark, so bucket 0's timer has fired
      // (state-row counts below prove it) even if the no-data batch
      // didn't run it
      val rowsBeforeReclaim = q.lastProgress.stateOperators(0).numRowsTotal
      mem.addData(StreamOps.ClosedInterval(9L, 2L, 10L * H, 10L * H + 60000000L))
      q.processAllAvailable()
      // reclaim is observable in the state store: F2 ADDS one bucket-10
      // row, the fired bucket-0 timer REMOVES A's row — net zero (or
      // fewer, if the provider also counts timer rows it released)
      val rowsAfterReclaim = q.lastProgress.stateOperators(0).numRowsTotal
      assert(rowsAfterReclaim <= rowsBeforeReclaim,
        s"bucket 0 was not reclaimed: state grew $rowsBeforeReclaim -> " +
          s"$rowsAfterReclaim after the timer should have cleared it")
      // L: a CONTRACT-VIOLATING 11 h interval covering buckets 0..10 —
      // it could pair against already-reclaimed buckets, so the duration
      // contract must fail the query LOUDLY instead of silently dropping
      // those pairs
      mem.addData(StreamOps.ClosedInterval(2L, 1L, H / 6, 11L * H))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(30000L)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
          c.getMessage != null && c.getMessage.contains("duration contract")),
        s"expected the duration-contract require to fail the query, got $ex")
      val got = spark.sql("SELECT ua, ub FROM ovl_ttl_out").as[(Long, Long)].collect().toSet
      assert(!got.contains((1L, 2L)),
        "the contract-violating interval paired in bucket 0 before failing")
      spark.sql("DROP VIEW IF EXISTS ovl_ttl_out")
      ()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("overlap dead-letter branch counts + skips a violating interval; the stream lives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val H = 3600000000L
      val mem = MemoryStream[StreamOps.ClosedInterval]
      val (ds, obsName) = StreamOps.overlapStreamDeadLetter(mem.toDS(),
        lateness = "1 second", maxSessionUs = 2L * H)
      val q = ds.writeStream.format("memory").queryName("ovl_dl_out")
        .outputMode("update").start()
      // one contract-violating 11 h interval beside two healthy
      // overlapping ones: the violator is quarantined (counted, emits no
      // pairs), the healthy pair still fires, and the query keeps running
      mem.addData(
        StreamOps.ClosedInterval(2L, 1L, H / 6, 11L * H),
        StreamOps.ClosedInterval(1L, 1L, 0L, H / 2),
        StreamOps.ClosedInterval(3L, 1L, H / 4, H / 3))
      q.processAllAvailable()
      assert(q.isActive, "the dead-letter branch must not fail the query")
      // the count is an OBSERVED metric (exactly-once per epoch, survives
      // task retries), summed across the query's progress events
      val violations = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get(obsName)))
        .map(r => if (r.isNullAt(r.fieldIndex("violations"))) 0L
          else r.getAs[Long]("violations"))
        .sum
      assert(violations == 1L, s"expected 1 dead-lettered interval, got $violations")
      val got = spark.sql("SELECT ua, ub FROM ovl_dl_out").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 3L)),
        s"healthy pair must fire, violator must pair with nothing: $got")
      q.stop()
      spark.sql("DROP VIEW IF EXISTS ovl_dl_out")
      ()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState sessionizer emits closed sessions equal to the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.Evt]
      // 30 s inactivity gap; values are exact binary fractions so sums are
      // order-proof and the equality below is EXACT
      val q = StreamOps.sessionizeStream(mem.toDS(), 30000000L)
        .writeStream.format("memory").queryName("sclose_out")
        .outputMode("update").start()
      // per-key event order across batches (the engine's §2.6.1 guarantee)
      mem.addData(StreamOps.Evt("u1", ts(0), 1.0), StreamOps.Evt("u1", ts(10), 2.0),
        StreamOps.Evt("u2", ts(0), 3.0))
      q.processAllAvailable()
      // u1's first session closes ACROSS a batch boundary (state carried);
      // u2's closes from a single later event
      mem.addData(StreamOps.Evt("u1", ts(20), 4.0), StreamOps.Evt("u1", ts(100), 0.5),
        StreamOps.Evt("u2", ts(50), 1.5))
      q.processAllAvailable()
      // u1's second session closes WITHIN this batch (two state transitions
      // in one handleInputRows call); the third stays open in state
      mem.addData(StreamOps.Evt("u1", ts(105), 0.25), StreamOps.Evt("u1", ts(200), 8.0))
      q.processAllAvailable()
      q.stop()
      val got = spark.sql("SELECT key, sid, nEvents, durationUs, sumValue FROM sclose_out")
        .as[(String, Long, Long, Long, Double)].collect().toSet
      // the batch gaps-and-islands fold over the same events, minus each
      // key's still-open tail session (u1 sid 3, u2 sid 2)
      val expected = Set(
        ("u1", 1L, 3L, 20000000L, 7.0),
        ("u1", 2L, 2L, 5000000L, 0.75),
        ("u2", 1L, 1L, 0L, 3.0))
      assert(got == expected, s"closed sessions diverged from the batch fold: $got")
      spark.sql("DROP VIEW IF EXISTS sclose_out")
      ()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState funnel advances stages exactly like the batch chained-min fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.FunnelEvt]
      val q = StreamOps.funnelStream(mem.toDS())
        .writeStream.format("memory").queryName("funnel_out")
        .outputMode("update").start()
      // u1 converts across batches; u2's click arrives at the SAME micro
      // as its view, so the strictly-after rule must hold it at stage 1;
      // u3's purchase precedes any click — never past stage 1
      mem.addData(
        StreamOps.FunnelEvt("u1", ts(0), "view", 1L),
        StreamOps.FunnelEvt("u2", ts(0), "view", 2L),
        StreamOps.FunnelEvt("u2", ts(0), "click", 3L),
        StreamOps.FunnelEvt("u3", ts(0), "view", 4L))
      q.processAllAvailable()
      mem.addData(
        StreamOps.FunnelEvt("u1", ts(5), "click", 5L),
        StreamOps.FunnelEvt("u3", ts(5), "purchase", 6L))
      q.processAllAvailable()
      mem.addData(StreamOps.FunnelEvt("u1", ts(9), "purchase", 7L))
      q.processAllAvailable()
      q.stop()
      val got = spark.sql("SELECT key, stage, stageUs FROM funnel_out")
        .as[(String, Int, Long)].collect().toSet
      // the batch q72 fold on the same events: u1 1-2-3, u2 1 only
      // (click not strictly after view), u3 1 only (no click ever)
      val base = 1700000000000000L
      val expected = Set(
        ("u1", 1, base), ("u1", 2, base + 5000000L), ("u1", 3, base + 9000000L),
        ("u2", 1, base), ("u3", 1, base))
      assert(got == expected, s"funnel transitions diverged from the batch fold: $got")
      spark.sql("DROP VIEW IF EXISTS funnel_out")
      ()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState transition emitter matches the batch lag-window bigrams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.FunnelEvt]
      val q = StreamOps.transitionStream(mem.toDS())
        .writeStream.format("memory").queryName("trans_out")
        .outputMode("update").start()
      mem.addData(
        StreamOps.FunnelEvt("u1", ts(0), "view", 1L),
        StreamOps.FunnelEvt("u1", ts(1), "click", 2L),
        StreamOps.FunnelEvt("u2", ts(0), "view", 3L))
      q.processAllAvailable()
      // the u1 view→purchase pair spans the batch boundary (state carries
      // the last type); u2's second event arrives a batch late
      mem.addData(
        StreamOps.FunnelEvt("u1", ts(2), "purchase", 4L),
        StreamOps.FunnelEvt("u2", ts(3), "view", 5L))
      q.processAllAvailable()
      q.stop()
      val got = spark.sql("SELECT key, prev, cur FROM trans_out")
        .as[(String, String, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      // the batch q163 lag-window pairs over the same per-key streams
      val expected = Map(
        ("u1", "view", "click") -> 1, ("u1", "click", "purchase") -> 1,
        ("u2", "view", "view") -> 1)
      assert(got == expected, s"transition multiset diverged from the batch bigrams: $got")
      spark.sql("DROP VIEW IF EXISTS trans_out")
      ()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-stream interval join pairs events within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[(String, Timestamp)]
    val rm = MemoryStream[(String, Timestamp)]
    val joined = StreamOps.intervalJoin(
      lm.toDF().toDF("key", "lts"), rm.toDF().toDF("key", "rts"),
      "10 seconds", "30 seconds")
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    // a@0 pairs with a@5 (in [0, 10]) but not a@20; b@0 has no right side
    lm.addData(("a", ts(0)), ("b", ts(0)))
    rm.addData(("a", ts(5)), ("a", ts(20)))
    q.processAllAvailable()
    // advance both watermarks past the join window so state can emit/expire
    lm.addData(("z", ts(100))); rm.addData(("z", ts(200)))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT key, lts, rts FROM ij_out")
      .as[(String, Timestamp, Timestamp)].collect().toSet
    assert(got == Set(("a", ts(0), ts(5))))
  }

  test("flatMapGroupsWithState keeps running per-key session state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Evt]
    val q = StreamOps.runningSessions(mem.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    mem.addData(StreamOps.Evt("u1", ts(0), 1.0), StreamOps.Evt("u1", ts(1), 2.0))
    q.processAllAvailable()
    mem.addData(StreamOps.Evt("u1", ts(2), 3.0))
    q.processAllAvailable()
    q.stop()
    val finalRow = spark.sql("SELECT n, sumValue FROM sess_out ORDER BY n DESC LIMIT 1")
      .as[(Long, Double)].head()
    assert(finalRow == ((3L, 6.0))) // state carried across micro-batches
  }

  test("streaming EWMA spike monitor matches the sequential fold across batches") {
    // the O(1)-state production path for q128's audit: same α = 0.5
    // recurrence, state = (ewma, spikes, n) only. Sequence 4, 2, 8, 1, 9:
    // spikes at 8 (> 2·3.0) and 9 (> 2·3.25); final ewma 6.125 — every
    // step a power-of-two multiply + one add, so equality is EXACT.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Evt]
    val q = StreamOps.ewmaSpikes(mem.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("update").start()
    mem.addData(StreamOps.Evt("u1", ts(0), 4.0), StreamOps.Evt("u1", ts(1), 2.0))
    q.processAllAvailable()
    mem.addData(StreamOps.Evt("u1", ts(2), 8.0), StreamOps.Evt("u1", ts(3), 1.0),
      StreamOps.Evt("u1", ts(4), 9.0))
    q.processAllAvailable()
    q.stop()
    val fin = spark.sql("SELECT n, ewma, spikes FROM ewma_out ORDER BY n DESC LIMIT 1")
      .as[(Long, Double, Long)].head()
    assert(fin == ((5L, 6.125, 2L)),
      s"streaming fold diverged from the sequential recurrence: $fin")
    spark.sql("DROP VIEW IF EXISTS ewma_out")
    ()
  }

  test("ewmaSpikes folds same-millisecond events in (micros, eventId) order") {
    // two events in ONE millisecond, micros order (8.0 then 1.0) opposite
    // to value order (1.0 then 8.0): folding 8-then-1 yields ewma 4.5 and
    // ZERO spikes, while the old (getTime, value) sort folded 1-then-8 and
    // counted a spurious spike (8 > 2·1). The sort key now mirrors q128's
    // sort_array(struct(us, event_id, value)).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Evt]
    val q = StreamOps.ewmaSpikes(mem.toDS())
      .writeStream.format("memory").queryName("ewma_us_out")
      .outputMode("update").start()
    val a = new Timestamp(1700000000000L); a.setNanos(1000) // +1 µs
    val b = new Timestamp(1700000000000L); b.setNanos(2000) // +2 µs
    mem.addData(StreamOps.Evt("u1", b, 1.0, 2L), StreamOps.Evt("u1", a, 8.0, 1L))
    q.processAllAvailable()
    q.stop()
    val fin = spark.sql("SELECT n, ewma, spikes FROM ewma_us_out ORDER BY n DESC LIMIT 1")
      .as[(Long, Double, Long)].head()
    assert(fin == ((2L, 4.5, 0L)),
      s"same-millisecond events must fold in micros order: $fin")
    spark.sql("DROP VIEW IF EXISTS ewma_us_out")
    ()
  }

  // ---- near-dup gate: dedup-on-ingest against a static corpus index ----

  private val gateSf = "/root/testdata/sf0.01" // sf0.001 has no near-dup pairs

  /** Even doc_ids form the existing corpus; odd ones arrive as the stream.
    * Expected drops: odd docs with a verified >= 0.6 Jaccard pair to an
    * even doc (q19's exhaustive pair set is the ground truth — q20's
    * oracle already proves LSH+verify equals it on this corpus).
    */
  private lazy val gateFixture = {
    val docsDf = Graft.table(spark, gateSf, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docsDf.filter(col("doc_id") % 2 === 0)
    val incoming = docsDf.filter(col("doc_id") % 2 =!= 0)
    val pairs = operators.DocOps.q19(spark, gateSf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val dropExpected = pairs.flatMap { case (a, b) =>
      Seq(a, b).filter(x => x % 2 == 1 && (a + b - x) % 2 == 0)
    }.toSet
    (corpus, incoming, dropExpected)
  }

  test("near-dup gate drops exactly the stream docs with a corpus twin") {
    val (corpus, incoming, dropExpected) = gateFixture
    assert(dropExpected.nonEmpty, "fixture must contain cross-split near-dup pairs")
    val index = operators.DocOps.buildNearDupIndex(corpus)
    val kept = operators.DocOps.nearDupGate(incoming, index)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val streamed = incoming.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == streamed -- dropExpected)
  }

  test("gateIngest produces only gate survivors into the topic") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (corpus, incoming, dropExpected) = gateFixture
    val index = operators.DocOps.buildNearDupIndex(corpus)

    val store = new TopicStore(spark, Files.createTempDirectory("graft-gate").toString)
    val streaming = new StreamingTopic(store)
    val mem = MemoryStream[(Long, String, String, Timestamp)]
    val input = mem.toDF().toDF("doc_id", "text", "key", "timestamp")
      .withColumn("value", encode(col("text"), "UTF-8"))

    val rows = incoming.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(0).toString, ts(0)))
    val q = streaming.gateIngest("gated", input, index,
      Files.createTempDirectory("graft-gate-ckpt").toString)
    val (first, rest) = rows.splitAt(rows.length / 2)
    mem.addData(first.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(rest.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    store.registry.register("g", "c", Seq("gated"), store.StartFrom.Earliest)
    val landed = store.poll("g", "gated", "c").collect()
      .map(_.getAs[String]("key").toLong).toSet
    val streamed = rows.map(_._1).toSet
    assert(landed == streamed -- dropExpected)
  }

  test("misra-gries heavy hitters aggregate incrementally over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the same k-counter summary q78 runs in batch, as a streaming
    // aggregation: state is ONE k-entry map however long the stream runs,
    // and the containment guarantee must hold over the union of all
    // micro-batches (merge-tree independence of MG merge)
    val mem = MemoryStream[String]
    val agg = new operators.MisraGriesAgg(3).toColumn.name("summary")
    val q = mem.toDS().select(agg)
      .writeStream.format("memory").queryName("mg_out")
      .outputMode("complete").start()
    // heavy key "hot" (12 of 20 > 20/3), spread across micro-batches
    mem.addData(Seq.fill(5)("hot") ++ Seq("a", "b", "c"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(7)("hot") ++ Seq("d", "e", "b", "a", "f"): _*)
    q.processAllAvailable()
    q.stop()
    val summary = spark.sql("SELECT summary FROM mg_out")
      .as[Map[String, Long]].head()
    assert(summary.size <= 3)
    assert(summary.contains("hot"), s"guaranteed key missing from $summary")
    // estimate bounded: undercount by at most n/k = 20/3
    assert(summary("hot") <= 12 && 12 - summary("hot") <= 20 / 3)
  }
}
