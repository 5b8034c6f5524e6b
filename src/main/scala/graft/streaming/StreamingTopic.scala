package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.engine.TopicStore

/** Structured Streaming faces of the topic store.
  *
  * Ingest (S1/W1): every micro-batch runs the batch produce() path inside
  * `foreachBatch`, so offset assignment stays contiguous across batches and
  * the trigger interval plays the coalescer's group-window role
  * (`internal/producing/coalescer.go:81-172`); the checkpoint is the
  * durability ledger the reference builds from replica acks + SQLite.
  *
  * Consume (S5/R3): the DSv2 `format("graft")` source — micro-batches
  * are exact per-partition offset ranges from the producer watermark;
  * `maxRecordsPerTrigger` on the source is the poll-threshold rate
  * control (`ConsumerReadThreshold`, `internal/conf/config.go:278-280`).
  */
class StreamingTopic(store: TopicStore) {

  private val spark = store.spark

  /** Start ingesting a streaming DataFrame (key, value, timestamp) into a
    * topic; one produce() per micro-batch. Safe to run concurrently with
    * the REST/binary produce channels of the same store —
    * `TopicStore.produce` serializes the watermark read-modify-write
    * internally, so cross-channel batches interleave without offset
    * collisions. Micro-batch REPLAYS (foreachBatch is at-least-once after
    * a crash) are deduplicated by `produceOnce`'s durable batch ledger
    * keyed on the checkpoint identity — a restarted query skips batches
    * it already produced instead of appending them twice.
    */
  def ingest(topic: String, stream: DataFrame, checkpoint: String): StreamingQuery = {
    var streamId: String = null // resolved at first batch (see ledgerId)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (streamId == null) streamId = ledgerId(checkpoint)
        // no isEmpty pre-check: produce() counts before writing, so an
        // empty batch costs one map-side count job and skips the shuffle,
        // write, and offsets rewrite — while the pre-check cost a job
        // round-trip on EVERY micro-batch of the hot path
        store.produceOnce(topic, batch, streamId, batchId); ()
      }
      .start()
  }

  /** Batch-ledger identity for a stream: batch ids are scoped to a
    * checkpoint INSTANCE, so the ledger key is the checkpoint path PLUS
    * the query id Structured Streaming wrote into its `metadata` file —
    * not the path alone. A checkpoint deleted and recreated at the same
    * path restarts batch ids at 0 under a FRESH query id; a path-keyed
    * ledger would read its old high batch mark and silently SKIP the new
    * stream's first batches as "replays" (loss, the opposite of the
    * at-least-once contract the ledger protects). Resolved lazily at
    * first batch — the metadata file exists once the query has started —
    * and cached in the query's foreachBatch closure (a checkpoint cannot
    * be recreated under a running query). Two streams into one topic
    * from different checkpoints never share a ledger (64-bit content
    * hash keeps the scope dir short and collision-safe). An unreadable
    * metadata file FAILS the batch after bounded retries: the query has
    * started, so the file exists — degrading to a path-only identity
    * would let two recreate-at-same-path incarnations that both hit the
    * degraded read share one ledger key, silently skipping the new
    * stream's first batches as "replays" (exactly the loss the query-id
    * scoping prevents). Failing the micro-batch is safe: foreachBatch
    * retries it, and produceOnce never ran.
    */
  private def ledgerId(checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
    var attempt = 0
    var qid: String = null
    var last: Exception = null
    while (qid == null && attempt < 5) {
      try {
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val in = fs.open(p)
        val txt =
          try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        qid = "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
          .getOrElse(throw new IllegalStateException(
            s"checkpoint metadata at $p has no query id field"))
      } catch {
        case e: Exception =>
          last = e
          attempt += 1
          if (attempt < 5) Thread.sleep(100L * attempt)
      }
    }
    if (qid == null)
      throw new IllegalStateException(
        s"cannot read the streaming query id from $p after $attempt attempts — " +
          "refusing to fall back to a path-only ledger identity (it can alias a " +
          "prior incarnation's ledger and silently skip this stream's batches)", last)
    f"ingest-${graft.core.Murmur3x64.hashString(checkpoint + "#" + qid)}%016x"
  }

  /** Near-dup-gated streaming ingest — dedup-on-ingest for a training-data
    * pipeline: every micro-batch of documents is checked against a static
    * corpus LSH index (signatures via the codegen'd `minhash_sig`
    * expression — stateless, no shuffle on the stream side; exact Jaccard
    * verification on band-key candidates only), and only survivors
    * produce() into the topic. foreachBatch is the documented Structured
    * Streaming shape for stream-static dedup: it gives each micro-batch
    * full batch join/agg semantics, and `produceOnce`'s batch ledger
    * skips crash replays (see `ingest`). The stream must carry (key,
    * value, timestamp) for produce plus (doc_id, text) for the gate.
    */
  def gateIngest(
      topic: String,
      stream: DataFrame,
      index: graft.operators.DocOps.NearDupIndex,
      checkpoint: String): StreamingQuery = {
    var streamId: String = null // resolved at first batch (see ledgerId)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (streamId == null) streamId = ledgerId(checkpoint)
        // persist: produce() runs a count job + a write job over its
        // input; without pinning, each would re-run the gate's joins.
        // (persist, not localCheckpoint: unpersist() releases the blocks
        // deterministically at batch end — checkpointed RDDs wait for a
        // driver GC, accumulating executor storage on a hot stream)
        val kept = graft.operators.DocOps.nearDupGate(batch, index).persist()
        try { if (!kept.isEmpty) { store.produceOnce(topic, kept, streamId, batchId); () } }
        finally { kept.unpersist(); () }
      }
      .start()
  }

  /** The topic as an unbounded stream of records (envelope schema),
    * through the DSv2 `format("graft")` source: micro-batches are exact
    * per-partition offset ranges from the producer watermark (never file
    * arrival), so in-flight produces are invisible until their watermark
    * commits and the checkpoint offset log replays exactly.
    */
  def stream(topic: String): DataFrame =
    spark.readStream.format("graft")
      .option("root", store.root)
      .option("topic", topic)
      .load()
}

/** Streaming operators beyond the reference's surface (SURVEY §2.7 —
  * "beyond parity": the reference has no event-time/watermark/stateful
  * semantics at all; these are the Spark-native extensions a user gets).
  */
object StreamOps {

  /** Distinguishes observed-metric names across [[overlapStreamDeadLetter]]
    * calls within one JVM (Spark rejects duplicate observation names in a
    * single query).
    */
  private[streaming] val deadLetterSeq = new java.util.concurrent.atomic.AtomicLong

  /** Tumbling event-time window counts with a watermark for late data. */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      windowLen: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("key"), col("n"))

  /** Sliding event-time window counts (window length + slide interval). */
  def slidingAgg(
      events: DataFrame,
      tsCol: String,
      windowLen: String,
      slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("key"), col("n"))

  /** Session windows: gap-based grouping via the native session_window
    * operator (state closes once the watermark passes the gap).
    */
  def sessionAgg(
      events: DataFrame,
      tsCol: String,
      gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("key"), col("n"))

  /** Exactly-once-flavored streaming dedup by key within the watermark. */
  def dedupWithinWatermark(
      events: DataFrame,
      tsCol: String,
      watermark: String,
      keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: each left event pairs with right
    * events of the same key whose timestamp falls in
    * [left.ts, left.ts + interval]. Both sides carry watermarks and the
    * join condition bounds event time in both directions, so Spark can
    * expire join state — without the time bound the state store would
    * grow forever (the canonical stream-stream join trap). The column
    * names must differ per side (`lts`/`rts`) because the joined schema
    * flattens both inputs.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      interval: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark("lts", watermark)
    val r = right.withWatermark("rts", watermark)
    l.join(r,
      l("key") === r("key") &&
        r("rts") >= l("lts") &&
        r("rts") <= l("lts") + expr(s"INTERVAL $interval"))
      .select(l("key").as("key"), col("lts"), col("rts"))
  }

  // eventId defaults to 0 for sources without a record id; ewmaSpikes
  // uses it as the tie-break mirroring q128's (us, event_id, value) sort
  case class Evt(key: String, ts: java.sql.Timestamp, value: Double,
      eventId: Long = 0L)
  case class SessionState(n: Long, sumValue: Double, lastUs: Long)
  case class SessionUpdate(key: String, n: Long, sumValue: Double)

  /** Per-key offset tracking via Spark 4's transformWithState (the
    * successor to flatMapGroupsWithState: typed ValueState on the RocksDB
    * store, TTL-able, timer-capable). State is the per-key high watermark;
    * each batch emits (key, highest offset seen, duplicates dropped so
    * far) — the consumer-side twin of the engine's producer watermark,
    * usable as an idempotence monitor on an at-least-once topic feed.
    * Requires the RocksDB state store provider (the test sets
    * `spark.sql.streaming.stateStore.providerClass`).
    */
  case class OffsetSeen(key: String, offset: Long)
  case class OffsetWatermark(key: String, high: Long, dupes: Long)

  class HighWatermarkProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, OffsetSeen, OffsetWatermark] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)](
        "hw",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[OffsetSeen],
        timers: TimerValues): Iterator[OffsetWatermark] = {
      var (high, dupes) = if (state.exists()) state.get() else (Long.MinValue, 0L)
      rows.foreach { r =>
        if (r.offset <= high) dupes += 1 else high = r.offset
      }
      state.update((high, dupes))
      Iterator.single(OffsetWatermark(key, high, dupes))
    }
  }

  /** The per-key watermark stream (see `HighWatermarkProcessor`). */
  def offsetWatermarks(seen: Dataset[OffsetSeen]): Dataset[OffsetWatermark] = {
    val spark = seen.sparkSession
    import spark.implicits._
    seen
      .groupByKey(_.key)
      .transformWithState(
        new HighWatermarkProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  /** Epoch MICROS — the codebase-wide timestamp unit (getTime is millis). */
  private def microsOf(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  case class EwmaState(ewma: Double, spikes: Long, n: Long)
  case class EwmaUpdate(key: String, n: Long, ewma: Double, spikes: Long)

  /** Streaming EWMA spike monitor — the O(1)-state PRODUCTION path for
    * q128's audit. The batch fold is irreducibly sequential per key and
    * must hold the key's whole history in one aggregation buffer
    * (`AuditOps.q128`'s proof note + enforced MaxKeyHistory guard); the
    * streaming form applies the identical α = 0.5 recurrence as events
    * arrive, keeping exactly (ewma, spikes, n) per key — a firehose key
    * costs three state fields, not its history. Bit-equality with the
    * batch fold holds when events arrive in per-key event order, which
    * the engine's per-key total order (§2.6.1) provides across batches;
    * within a micro-batch rows are sorted by (epoch MICROS, eventId,
    * value) before folding — the same sort key as q128's
    * sort_array(struct(us, event_id, value)), so same-millisecond events
    * and same-timestamp events with eventId order ≠ value order fold in
    * the identical sequence.
    */
  def ewmaSpikes(events: Dataset[Evt]): Dataset[EwmaUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Evt], state: GroupState[EwmaState]) => {
          var s = state.getOption.getOrElse(EwmaState(0.0, 0L, 0L))
          rows.toSeq.sortBy(e => (microsOf(e.ts), e.eventId, e.value)).foreach { e =>
            s =
              if (s.n == 0L) EwmaState(e.value, 0L, 1L)
              else EwmaState(
                0.5d * e.value + 0.5d * s.ewma,
                s.spikes + (if (e.value > 2.0d * s.ewma) 1L else 0L),
                s.n + 1L)
          }
          state.update(s)
          Iterator.single(EwmaUpdate(key, s.n, s.ewma, s.spikes))
        })
  }

  case class OpenSession(sid: Long, startUs: Long, lastUs: Long, n: Long,
      sumValue: Double)
  case class SessionClosed(key: String, sid: Long, nEvents: Long,
      durationUs: Long, sumValue: Double)

  /** Streaming sessionizer — the O(1)-state production path for
    * `SessionOps`' 6 h gaps-and-islands (q253–q258 consume its output
    * shape). State per key is ONLY the open session (sid, startUs,
    * lastUs, n, sumValue); a closed session is emitted the moment a row
    * arrives more than `gapUs` after the previous one, so a firehose key
    * costs five state fields, never its history. With the engine's
    * per-key total order (§2.6.1) across batches and the q128 intra-batch
    * sort key (epoch MICROS, eventId, value), the emitted closed sessions
    * equal the batch gaps-and-islands fold over the same prefix — proven
    * in StreamingSpec against a sequential fold with the per-key tail
    * session still open in state.
    */
  class SessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Evt, SessionClosed] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[OpenSession](
        "open", org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Evt],
        timers: TimerValues): Iterator[SessionClosed] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionClosed]
      var open: OpenSession = if (state.exists()) state.get() else null
      rows.toSeq.sortBy(e => (microsOf(e.ts), e.eventId, e.value)).foreach { e =>
        val us = microsOf(e.ts)
        if (open == null) open = OpenSession(1L, us, us, 1L, e.value)
        else if (us - open.lastUs > gapUs) {
          out += SessionClosed(key, open.sid, open.n,
            open.lastUs - open.startUs, open.sumValue)
          open = OpenSession(open.sid + 1L, us, us, 1L, e.value)
        } else open = OpenSession(open.sid, open.startUs, us, open.n + 1L,
          open.sumValue + e.value)
      }
      if (open != null) state.update(open)
      out.iterator
    }
  }

  /** Closed-session stream (see `SessionProcessor`). Requires the RocksDB
    * state store provider, like `offsetWatermarks`.
    */
  def sessionizeStream(events: Dataset[Evt], gapUs: Long): Dataset[SessionClosed] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(
        new SessionProcessor(gapUs),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  case class FunnelEvt(key: String, ts: java.sql.Timestamp, etype: String,
      eventId: Long = 0L)
  case class FunnelUpdate(key: String, stage: Int, stageUs: Long)
  case class Transition(key: String, prev: String, cur: String)

  /** Streaming bigram emitter — the q163 transition matrix's streaming
    * front: per-key state is ONLY the last event type; each arriving
    * event emits its (prev, cur) adjacent pair, which a downstream
    * windowed count aggregates into the matrix. Per-key ordered
    * delivery (§2.6.1) + the q128 intra-batch sort make the emitted
    * pair multiset equal the batch lag-window derivation — proven in
    * StreamingSpec.
    */
  class TransitionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, FunnelEvt, Transition] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[String](
        "last", org.apache.spark.sql.Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[FunnelEvt],
        timers: TimerValues): Iterator[Transition] = {
      var last: String = if (state.exists()) state.get() else null
      val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
      rows.toSeq.sortBy(e => (microsOf(e.ts), e.eventId)).foreach { e =>
        if (last != null) out += Transition(key, last, e.etype)
        last = e.etype
      }
      if (last != null) state.update(last)
      out.iterator
    }
  }

  /** The per-key adjacent-pair stream (see `TransitionProcessor`). */
  def transitionStream(events: Dataset[FunnelEvt]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(
        new TransitionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  /** Streaming funnel — the per-key stage state machine twin of the
    * batch q72/q254 chained-min funnel. State is (stage, t1, t2, t3):
    * a view opens stage 1, a click STRICTLY after t1 advances to 2, a
    * purchase strictly after t2 to 3 — the same strict event-time
    * progression the batch joins enforce, O(1) per key. Emits one
    * update per stage transition; rows fold in the q128 intra-batch
    * order (micros, eventId), so with per-key ordered delivery
    * (§2.6.1) the reached stages equal the batch fold — proven in
    * StreamingSpec against the sequential recurrence.
    */
  class FunnelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, FunnelEvt, FunnelUpdate] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[(Int, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Int, Long, Long, Long)](
        "funnel",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaInt, org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[FunnelEvt],
        timers: TimerValues): Iterator[FunnelUpdate] = {
      var (stage, t1, t2, t3) =
        if (state.exists()) state.get() else (0, 0L, 0L, 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[FunnelUpdate]
      rows.toSeq.sortBy(e => (microsOf(e.ts), e.eventId)).foreach { e =>
        val us = microsOf(e.ts)
        if (stage == 0 && e.etype == "view") {
          stage = 1; t1 = us; out += FunnelUpdate(key, 1, us)
        } else if (stage == 1 && e.etype == "click" && us > t1) {
          stage = 2; t2 = us; out += FunnelUpdate(key, 2, us)
        } else if (stage == 2 && e.etype == "purchase" && us > t2) {
          stage = 3; t3 = us; out += FunnelUpdate(key, 3, us)
        }
      }
      state.update((stage, t1, t2, t3))
      out.iterator
    }
  }

  /** The stage-transition stream (see `FunnelProcessor`). Requires the
    * RocksDB state store provider.
    */
  def funnelStream(events: Dataset[FunnelEvt]): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(
        new FunnelProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  // ------------------------------------------------- overlap matcher

  case class ClosedInterval(user: Long, sid: Long, startUs: Long, endUs: Long)
  case class BucketInterval(h: Long, user: Long, sid: Long, startUs: Long, endUs: Long,
      ts: java.sql.Timestamp)
  case class MeetingPair(ua: Long, sa: Long, ub: Long, sb: Long, ovlUs: Long, hod: Long)

  private val HourUs = 3600000000L

  /** Streaming interval self-overlap matcher — the stateful twin of
    * `OverlapOps.meetingPairs` (q259–q262's hour-blocked co-presence
    * join): closed sessions arrive as a stream (`sessionizeStream`'s
    * output plus absolute bounds), each explodes to the epoch hours it
    * covers, and per hour-bucket state holds the intervals seen so far.
    * An arriving interval emits one pair per strictly-overlapping
    * stored interval of ANOTHER user whose overlap STARTS in this
    * bucket — the batch join's count-once discipline: both sides of an
    * overlap cover its start hour, so the pair is found exactly once,
    * when the later of the two arrives, in whichever order they arrive.
    * State per bucket is that hour's live-interval set — the identical
    * bound the batch blocking gives each join task; at 100 TB the
    * bucket key shards state across executors, and RECLAMATION is an
    * event-time timer per bucket: the watermark rides the interval
    * CLOSE time, and once it passes `bucket end + maxSessionUs` no
    * on-time arrival can still cover the bucket (an interval covering
    * hour h closes by `h_end + maxSessionUs` under the duration
    * contract), so the timer clears the bucket's list state. The two
    * explicit contract bounds: an interval LONGER than `maxSessionUs`
    * fails the query LOUDLY (a `require` in `overlapStream`'s flatMap —
    * processing it would silently pair with nothing in already-reclaimed
    * buckets), while an interval closing more than the watermark delay
    * behind the max seen close is LATE and is dropped SILENTLY by the
    * standard Structured Streaming watermark filter (late rows never
    * reach the processor, so the engine cannot make that loud). Both are
    * caller-tunable; the defaults (1 h lateness, 30 d duration) bound
    * state at ~`maxSessionUs/1h` live buckets per active stream key
    * set, independent of stream length. With an exactly-once in-contract
    * feed (the engine's DSv2 source / `produceOnce` ledger) the emitted
    * pairs equal the batch join's set — proven in StreamingSpec against
    * `meetingPairs` over the real events table, split across arbitrary
    * micro-batches; the reclaim timer is proven there too (a
    * contract-violating long interval finds the bucket already empty).
    */
  class OverlapProcessor(maxSessionUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, BucketInterval, MeetingPair] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TimeMode, TimerValues, TTLConfig}
    @transient private var seen: ListState[BucketInterval] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[BucketInterval](
        "seen", org.apache.spark.sql.Encoders.product[BucketInterval], TTLConfig.NONE)

    override def handleInputRows(
        h: Long,
        rows: Iterator[BucketInterval],
        timers: TimerValues): Iterator[MeetingPair] = {
      // one reclaim timer per bucket, at the last event-time instant an
      // in-contract interval covering hour h can still close (re-registering
      // the same (key, expiry) across batches is idempotent in the timer
      // state store)
      getHandle.registerTimer(((h + 1L) * HourUs + maxSessionUs) / 1000L)
      val out = scala.collection.mutable.ArrayBuffer.empty[MeetingPair]
      val live = scala.collection.mutable.ArrayBuffer.empty[BucketInterval]
      val it = seen.get()
      while (it.hasNext) live += it.next()
      rows.foreach { r =>
        live.foreach { o =>
          if (o.user != r.user) {
            val s = math.max(o.startUs, r.startUs)
            val e = math.min(o.endUs, r.endUs)
            if (e - s > 0L && s / HourUs == h) {
              val (x, y) = if (o.user < r.user) (o, r) else (r, o)
              out += MeetingPair(x.user, x.sid, y.user, y.sid, e - s, (s / HourUs) % 24L)
            }
          }
        }
        live += r
        seen.appendValue(r)
      }
      out.iterator
    }

    override def handleExpiredTimer(
        h: Long,
        timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[MeetingPair] = {
      seen.clear()
      Iterator.empty
    }
  }

  /** Co-presence pair stream (see `OverlapProcessor`). Requires the
    * RocksDB state store provider, like the other transformWithState
    * operators. `lateness` is the watermark delay on interval close
    * times; `maxSessionUs` is the duration contract that bounds how
    * long an hour bucket's state must stay live.
    */
  def overlapStream(
      sessions: Dataset[ClosedInterval],
      lateness: String = "1 hour",
      maxSessionUs: Long = 30L * 24L * HourUs): Dataset[MeetingPair] =
    overlapStreamImpl(sessions, lateness, maxSessionUs)

  /** [[overlapStream]] with a DEAD-LETTER branch instead of the poison
    * pill: a contract-violating interval is quarantined BEFORE the
    * bucket explode and counted on an OBSERVED METRIC (exactly-once per
    * streaming epoch — an accumulator here would double-count task
    * retries/speculation and reset on query restart, i.e. lie in exactly
    * the failure scenarios the counter exists for). Read the count from
    * `StreamingQueryProgress.observedMetrics(<returned name>)`, column
    * `violations`. The default loud contract remains the right call when
    * losing pairs at random is worse than stopping; this variant is for
    * operators who prefer to quarantine a bad record and keep the stream
    * moving — the metric is the alert to then go look at the source.
    */
  def overlapStreamDeadLetter(
      sessions: Dataset[ClosedInterval],
      lateness: String = "1 hour",
      maxSessionUs: Long = 30L * 24L * HourUs)
      : (Dataset[MeetingPair], String) = {
    val spark = sessions.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, sum, when}
    // unique per call: two dead-letter streams combined in ONE query would
    // otherwise collide on Spark's duplicate-observed-metrics check
    val name = s"graft_overlap_dead_letter_${StreamOps.deadLetterSeq.incrementAndGet()}"
    val healthy = sessions.toDF()
      .withColumn("__viol", col("endUs") - col("startUs") > lit(maxSessionUs))
      .observe(name, sum(when(col("__viol"), 1L).otherwise(0L)).as("violations"))
      .where(!col("__viol")).drop("__viol")
      .as[ClosedInterval]
    (overlapStreamImpl(healthy, lateness, maxSessionUs), name)
  }

  private def overlapStreamImpl(
      sessions: Dataset[ClosedInterval],
      lateness: String,
      maxSessionUs: Long): Dataset[MeetingPair] = {
    val spark = sessions.sparkSession
    import spark.implicits._
    sessions
      .flatMap { ci =>
        // the duration contract defaults to LOUD: an interval longer than
        // maxSessionUs can cover hour buckets whose reclaim timers have
        // already fired, silently pairing with nothing there — fail the
        // query instead of losing pairs at random (overlapStreamDeadLetter
        // filters + counts violators before this point instead)
        if (ci.endUs - ci.startUs > maxSessionUs)
          throw new IllegalArgumentException(
            s"interval (user=${ci.user}, sid=${ci.sid}) duration " +
              s"${ci.endUs - ci.startUs}us exceeds the maxSessionUs duration " +
              s"contract (${maxSessionUs}us) — raise maxSessionUs or close " +
              "sessions sooner; processing it would silently drop pairs in " +
              "already-reclaimed hour buckets (overlapStreamDeadLetter " +
              "counts + skips instead)")
        else (ci.startUs / HourUs to ci.endUs / HourUs)
          .map(h => BucketInterval(h, ci.user, ci.sid, ci.startUs, ci.endUs,
            new java.sql.Timestamp(ci.endUs / 1000L)))
      }
      .withWatermark("ts", lateness)
      .groupByKey(_.h)
      .transformWithState(
        new OverlapProcessor(maxSessionUs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Update)
  }

  /** Custom per-key streaming state via flatMapGroupsWithState: running
    * session accumulator emitting an update per batch (the §2.4 offset
    * state-machine's Spark-native analog for user state).
    */
  def runningSessions(events: Dataset[Evt]): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Evt], state: GroupState[SessionState]) => {
          var s = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          rows.foreach { e =>
            s = SessionState(s.n + 1, s.sumValue + e.value, math.max(s.lastUs, microsOf(e.ts)))
          }
          state.update(s)
          Iterator.single(SessionUpdate(key, s.n, s.sumValue))
        })
  }
}
