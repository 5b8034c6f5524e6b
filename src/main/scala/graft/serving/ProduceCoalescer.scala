package graft.serving

import java.util.concurrent.{CompletableFuture, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.engine.TopicStore

/** A produce submission front: the REST and binary servers hand requests
  * to whatever channel they were built over — a [[ProduceCoalescer]]
  * directly (single-broker), or a [[ShardRouter]] that fans requests out
  * over a [[BrokerGroup]]'s per-broker coalescers by ring partition.
  */
trait ProduceChannel {
  /** Enqueue one request (N records sharing key+timestamp); the future
    * completes after the durable write (ack-after-durable).
    */
  def submit(
      topic: String,
      key: String,
      tsMicros: Long,
      lines: Seq[Array[Byte]]): CompletableFuture[java.lang.Boolean]
}

/** W1-analog micro-batcher shared by the HTTP and binary produce fronts
  * (`internal/producing/coalescer.go:81-172`): callers enqueue and block
  * on an ack future; one drain loop groups up to `maxGroupBytes` or one
  * `coalesceMs` window into a single broker-local segment write per
  * topic (`TopicStore.produceLocal` — the reference coalescer's own
  * shape, `segment_writer.go:243-266`: no distributed job between
  * socket and durable file) and acks only after the durable write
  * returns. Request order is threaded through as the seq tiebreak, so
  * same-key records keep arrival order. The bounded queue is the
  * producer buffer-pool backpressure analog (W7). produceLocal runs on
  * the store's shared produce plane, so a BrokerGroup's coalescers
  * flush concurrently over disjoint ring partitions.
  */
class ProduceCoalescer(
    store: TopicStore,
    coalesceMs: Long = 50L,
    maxGroupBytes: Long = 2L * 1024 * 1024,
    queueCapacity: Int = 8192,
    metrics: EngineMetrics = new EngineMetrics) extends ProduceChannel {

  private case class Pending(
      topic: String,
      key: String, // null => keyless (round-robin analog)
      tsMicros: Long,
      lines: Seq[Array[Byte]],
      ack: CompletableFuture[java.lang.Boolean])

  private val queue = new LinkedBlockingQueue[Pending](queueCapacity)
  private val running = new AtomicBoolean(true)

  private val flusher = new Thread(() => {
    while (running.get()) {
      val first = queue.poll(coalesceMs, TimeUnit.MILLISECONDS)
      if (first != null) flush(first)
    }
  }, "graft-produce-coalescer")
  flusher.setDaemon(true)

  def start(): ProduceCoalescer = { flusher.start(); this }

  def stop(): Unit = {
    running.set(false)
    flusher.join(1000)
    // fail the acks of anything still queued — abandoning them would leave
    // submitters blocked on futures nobody will ever complete
    var p = queue.poll()
    while (p != null) {
      p.ack.completeExceptionally(new IllegalStateException("coalescer stopped"))
      p = queue.poll()
    }
  }

  /** Enqueue one request (N records sharing key+timestamp); blocks when
    * the queue is full; the future completes after the durable write.
    */
  override def submit(
      topic: String,
      key: String,
      tsMicros: Long,
      lines: Seq[Array[Byte]]): CompletableFuture[java.lang.Boolean] = {
    val ack = new CompletableFuture[java.lang.Boolean]()
    if (!running.get()) { // reject fast instead of a 120 s handler timeout
      ack.completeExceptionally(new IllegalStateException("coalescer stopped"))
      return ack
    }
    queue.put(Pending(topic, key, tsMicros, lines, ack))
    // close the submit/stop race: a put that slipped in AFTER stop()'s
    // drain would otherwise hang its submitter on a future nobody
    // completes — re-check and self-drain
    if (!running.get()) {
      var p = queue.poll()
      while (p != null) {
        p.ack.completeExceptionally(new IllegalStateException("coalescer stopped"))
        p = queue.poll()
      }
    }
    ack
  }

  private def flush(first: Pending): Unit = {
    val batch = mutable.ArrayBuffer(first)
    var bytes = first.lines.iterator.map(_.length.toLong).sum
    // group everything arriving within ONE coalesceMs window of the first
    // record (or until maxGroupBytes): each flush costs a full Spark
    // produce job, so a real linger amortizes it across concurrent
    // requesters; the hard deadline keeps first-record latency bounded at
    // coalesceMs even under a steady trickle of arrivals
    val deadline = System.nanoTime() + coalesceMs * 1000000L
    var remainingNs = coalesceMs * 1000000L
    while (remainingNs > 0 && bytes < maxGroupBytes) {
      val nxt = queue.poll(remainingNs, TimeUnit.NANOSECONDS)
      if (nxt == null) remainingNs = 0
      else {
        batch += nxt
        bytes += nxt.lines.iterator.map(_.length.toLong).sum
        remainingNs = deadline - System.nanoTime()
      }
    }
    batch.groupBy(_.topic).foreach { case (topic, reqs) =>
      try {
        var seq = 0L
        val rows = reqs.iterator.flatMap { r =>
          r.lines.iterator.map { line =>
            seq += 1
            TopicStore.LocalRecord(r.key, line, r.tsMicros, seq)
          }
        }.toVector
        store.produceLocal(topic, rows)
        metrics.messagesReceived.addAndGet(rows.size.toLong)
        metrics.groupsFlushed.incrementAndGet()
        // the two reference histograms (`metrics.go:28,54`): distribution
        // of group sizes (1 everywhere = the linger is not amortizing)
        // and of durable flush bytes (vs the maxGroupBytes cap)
        metrics.coalescerMessagesPerGroup.observe(rows.size.toLong)
        metrics.produceFlushBytes.observe(
          reqs.iterator.flatMap(_.lines).map(_.length.toLong).sum)
        reqs.foreach(_.ack.complete(java.lang.Boolean.TRUE))
      } catch {
        case e: Throwable => reqs.foreach(_.ack.completeExceptionally(e))
      }
    }
  }
}
