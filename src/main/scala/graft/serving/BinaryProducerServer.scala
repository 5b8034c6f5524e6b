package graft.serving

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicBoolean
import java.util.zip.CRC32

import scala.collection.mutable

/** The reference's length-prefixed binary producer protocol (S3,
  * `internal/producing/binary_server.go:21-257`, frame spec
  * `docs/developer/NETWORK_FORMATS.md:34-59`) over the shared coalescer.
  *
  * Frame header (big-endian, 13 bytes): version u8, flags u8 (bit 0 =
  * withTimestamp), streamId u16, opcode u8 (startup=1 ready=2 error=3
  * produce=4 produceResponse=5 heartbeat=6), bodyLength u32, crc u32
  * (crc32-IEEE of the preceding 9 header bytes). Produce body:
  * [timestamp μs i64 when flagged] keyLen u8 + key, topicLen u8 + topic,
  * then repeated (msgLen u32 + msg) until the body ends — one request,
  * one partition key, N records.
  *
  * Semantics mirrored from the reference server loop
  * (`binary_server.go:76-118`): first frame must be startup (else error +
  * close), startup/heartbeat answer ready, produce acks with
  * produceResponse only after the durable write, streams are pipelined so
  * responses may interleave across streamIds (each response carries its
  * request's streamId). Incoming header CRC is carried but not verified —
  * the reference reads and discards it too.
  */
class BinaryProducerServer(
    coalescer: ProduceChannel,
    port: Int = 0,
    maxBodyBytes: Int = 16 * 1024 * 1024) {

  private val OpStartup = 1
  private val OpReady = 2
  private val OpError = 3
  private val OpProduce = 4
  private val OpProduceResponse = 5
  private val OpHeartbeat = 6
  private val FlagWithTimestamp = 0x01

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(port))
  private val running = new AtomicBoolean(true)
  private val conns = mutable.Set.empty[Socket]

  // ack responses are written OFF the coalescer's flusher thread: the ack
  // future completes on that single engine-wide thread, and a client that
  // stops reading (full TCP send buffer) would otherwise block it — and
  // with it every produce channel of the store. A cached pool grows one
  // thread per concurrently-stalled connection and reaps idle ones.
  private val ackWriters = java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-binary-ack"); t.setDaemon(true); t
  })

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        sock.setTcpNoDelay(true)
        conns.synchronized { conns += sock }
        val t = new Thread(() => serve(sock), s"graft-binary-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch { case _: IOException => () /* closed */ }
    }
  }, "graft-binary-acceptor")
  acceptor.setDaemon(true)

  def boundPort: Int = server.getLocalPort

  def start(): BinaryProducerServer = { acceptor.start(); this }

  def stop(): Unit = {
    running.set(false)
    server.close()
    conns.synchronized { conns.foreach(s => try s.close() catch { case _: IOException => () }) }
    ackWriters.shutdownNow()
    ()
  }

  // ------------------------------------------------------- connection loop

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val rawOut = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    val writeLock = new Object
    var initialized = false

    def respond(streamId: Int, op: Int, body: Array[Byte] = Array.emptyByteArray): Unit =
      writeLock.synchronized {
        rawOut.write(frame(streamId, op, body))
        rawOut.flush()
      }

    try {
      var open = true
      while (open && running.get()) {
        val header = new Array[Byte](13)
        try in.readFully(header)
        catch { case _: EOFException | _: IOException => open = false }
        if (open) {
          val flags = header(1) & 0xff
          val streamId = ((header(2) & 0xff) << 8) | (header(3) & 0xff)
          val op = header(4) & 0xff
          val bodyLen = ((header(5) & 0xff) << 24) | ((header(6) & 0xff) << 16) |
            ((header(7) & 0xff) << 8) | (header(8) & 0xff)
          if (bodyLen < 0 || bodyLen > maxBodyBytes) {
            // a corrupt/hostile length would otherwise allocate unbounded
            respond(streamId, OpError, errorBody(0, s"body length $bodyLen out of range"))
            open = false
          } else {
            val body = new Array[Byte](bodyLen)
            in.readFully(body)

            if (!initialized) {
              initialized = true
              if (op != OpStartup) {
                respond(streamId, OpError, errorBody(0, "Invalid first message"))
                open = false
              } else respond(streamId, OpReady)
            } else op match {
              case OpProduce =>
                handleProduce(streamId, flags, body, respond)
              case OpHeartbeat =>
                respond(streamId, OpReady)
              case _ =>
                respond(streamId, OpError, errorBody(0, "Only producer operations are supported"))
            }
          }
        }
      }
    } finally {
      try sock.close() catch { case _: IOException => () }
      conns.synchronized { conns -= sock }
    }
  }

  /** Parse a produce body and submit to the coalescer; the ack future
    * (not this reader thread) writes the response, keeping streams
    * pipelined like the reference's response channel.
    */
  private def handleProduce(
      streamId: Int,
      flags: Int,
      body: Array[Byte],
      respond: (Int, Int, Array[Byte]) => Unit): Unit = {
    var pos = 0
    def u8(): Int = { val v = body(pos) & 0xff; pos += 1; v }
    def i64(): Long = {
      var v = 0L
      (0 until 8).foreach { _ => v = (v << 8) | (body(pos) & 0xffL); pos += 1 }
      v
    }
    // STRICT bounds: Array.slice silently clamps, which would turn an
    // oversized length into a durably-produced TRUNCATED record, and a
    // negative length into a zero-progress infinite parse loop
    def bytes(n: Int): Array[Byte] = {
      // overflow-safe form: `pos + n > body.length` wraps negative for n
      // near Int.MaxValue and would pass the guard, then copyOfRange
      // throws IllegalArgumentException (not IndexOutOfBounds) and the
      // connection dies with no error frame
      if (n < 0 || n > body.length - pos)
        throw new IndexOutOfBoundsException(
          s"field length $n exceeds body (${body.length - pos} bytes left)")
      val b = java.util.Arrays.copyOfRange(body, pos, pos + n); pos += n; b
    }
    try {
      val tsMicros =
        if ((flags & FlagWithTimestamp) != 0) i64()
        else System.currentTimeMillis() * 1000L
      val key = new String(bytes(u8()), UTF_8)
      val topic = new String(bytes(u8()), UTF_8)
      // the REST route regex makes an empty topic unroutable; the binary
      // frame must reject it too — partitionBy would write "" as the
      // __HIVE_DEFAULT_PARTITION__ dir, which reads back as null and can
      // never match a poll's topic predicate: an acked black hole
      if (topic.isEmpty)
        throw new IndexOutOfBoundsException("empty topic name")
      val msgs = mutable.ArrayBuffer.empty[Array[Byte]]
      while (pos < body.length) {
        if (pos + 4 > body.length)
          throw new IndexOutOfBoundsException("truncated record length prefix")
        val len = ((body(pos) & 0xff) << 24) | ((body(pos + 1) & 0xff) << 16) |
          ((body(pos + 2) & 0xff) << 8) | (body(pos + 3) & 0xff)
        pos += 4
        msgs += bytes(len)
      }
      val effectiveKey = if (key.isEmpty) null else key
      coalescer.submit(topic, effectiveKey, tsMicros, msgs.toSeq)
        .whenCompleteAsync((_, err) => {
          if (err == null) respond(streamId, OpProduceResponse, Array.emptyByteArray)
          else {
            // unwrap the future's CompletionException to classify the cause
            val cause = err match {
              case c: java.util.concurrent.CompletionException
                  if c.getCause != null => c.getCause
              case c => c
            }
            val code = cause match {
              // RETRYABLE (code 1): a coordinated drain window, or no
              // live advertised owner for the record's ring partition —
              // the binary twin of the HTTP 503 Retry-After contract
              case _: graft.engine.PlaneDrainingException => 1
              case _: NoLiveOwnerException => 1
              case _ => 0
            }
            respond(streamId, OpError, errorBody(code, String.valueOf(cause.getMessage)))
          }
        }, ackWriters)
      ()
    } catch {
      case e: IndexOutOfBoundsException =>
        respond(streamId, OpError, errorBody(0, s"malformed produce body: ${e.getMessage}"))
    }
  }

  // ---------------------------------------------------------- frame codec

  private def errorBody(code: Int, message: String): Array[Byte] =
    code.toByte +: message.getBytes(UTF_8)

  private def frame(streamId: Int, op: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](13 + body.length)
    out(0) = 1 // messageVersion
    out(1) = 0 // flags
    out(2) = ((streamId >> 8) & 0xff).toByte
    out(3) = (streamId & 0xff).toByte
    out(4) = op.toByte
    out(5) = ((body.length >> 24) & 0xff).toByte
    out(6) = ((body.length >> 16) & 0xff).toByte
    out(7) = ((body.length >> 8) & 0xff).toByte
    out(8) = (body.length & 0xff).toByte
    val crc = new CRC32
    crc.update(out, 0, 9)
    val c = crc.getValue
    out(9) = ((c >> 24) & 0xff).toByte
    out(10) = ((c >> 16) & 0xff).toByte
    out(11) = ((c >> 8) & 0xff).toByte
    out(12) = (c & 0xff).toByte
    System.arraycopy(body, 0, out, 13, body.length)
    out
  }
}
