package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.TopicStore
import graft.serving.{BinaryProducerServer, ProduceCoalescer}

/** Drives the binary producer protocol over a real TCP socket with the
  * reference's frame layout (`docs/developer/NETWORK_FORMATS.md:34-59`):
  * startup handshake, pipelined produce with withTimestamp, heartbeat,
  * and the invalid-first-message error path.
  */
class BinaryProtocolSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("binary-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def frame(streamId: Int, op: Int, flags: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](13 + body.length)
    out(0) = 1; out(1) = flags.toByte
    out(2) = ((streamId >> 8) & 0xff).toByte; out(3) = (streamId & 0xff).toByte
    out(4) = op.toByte
    out(5) = ((body.length >> 24) & 0xff).toByte; out(6) = ((body.length >> 16) & 0xff).toByte
    out(7) = ((body.length >> 8) & 0xff).toByte; out(8) = (body.length & 0xff).toByte
    val crc = new java.util.zip.CRC32
    crc.update(out, 0, 9)
    val c = crc.getValue
    out(9) = ((c >> 24) & 0xff).toByte; out(10) = ((c >> 16) & 0xff).toByte
    out(11) = ((c >> 8) & 0xff).toByte; out(12) = (c & 0xff).toByte
    System.arraycopy(body, 0, out, 13, body.length)
    out
  }

  private def produceBody(tsMicros: Long, key: String, topic: String,
      msgs: Seq[String]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(buf)
    d.writeLong(tsMicros)
    val k = key.getBytes(UTF_8); d.writeByte(k.length); d.write(k)
    val t = topic.getBytes(UTF_8); d.writeByte(t.length); d.write(t)
    msgs.foreach { m => val b = m.getBytes(UTF_8); d.writeInt(b.length); d.write(b) }
    buf.toByteArray
  }

  private def readFrame(in: DataInputStream): (Int, Int, Array[Byte]) = {
    val h = new Array[Byte](13)
    in.readFully(h)
    val streamId = ((h(2) & 0xff) << 8) | (h(3) & 0xff)
    val op = h(4) & 0xff
    val len = ((h(5) & 0xff) << 24) | ((h(6) & 0xff) << 16) | ((h(7) & 0xff) << 8) | (h(8) & 0xff)
    val body = new Array[Byte](len)
    in.readFully(body)
    (streamId, op, body)
  }

  test("startup/produce/heartbeat flow with pipelined streams") {
    val store = new TopicStore(spark, Files.createTempDirectory("graft-bin").toString)
    val coalescer = new ProduceCoalescer(store, coalesceMs = 20L).start()
    val server = new BinaryProducerServer(coalescer).start()
    try {
      val sock = new Socket("localhost", server.boundPort)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)

      out.write(frame(7, 1, 0, Array.emptyByteArray)); out.flush() // startup
      val (sid0, op0, _) = readFrame(in)
      assert((sid0, op0) == (7, 2)) // ready

      // two pipelined produces on different streams, same key
      out.write(frame(20, 4, 1, produceBody(1700000000000000L, "k1", "bin", Seq("a", "b"))))
      out.write(frame(21, 4, 1, produceBody(1700000000000001L, "k1", "bin", Seq("c"))))
      out.flush()
      val r1 = readFrame(in); val r2 = readFrame(in)
      assert(Set(r1, r2).map(r => (r._1, r._2)) == Set((20, 5), (21, 5))) // produceResponse

      out.write(frame(9, 6, 0, Array.emptyByteArray)); out.flush() // heartbeat
      val (sidH, opH, _) = readFrame(in)
      assert((sidH, opH) == (9, 2))
      sock.close()

      // records landed per-key ordered with the client timestamps
      store.registry.register("g", "c", Seq("bin"), store.StartFrom.Earliest)
      val rows = store.poll("g", "bin", "c").collect()
        .sortBy(_.getAs[Long]("offset"))
        .map(r => new String(r.getAs[Array[Byte]]("value"), UTF_8))
      assert(rows.toSeq == Seq("a", "b", "c"))
    } finally { server.stop(); coalescer.stop() }
  }

  test("malformed produce bodies answer error, never hang or truncate") {
    val store = new TopicStore(spark, Files.createTempDirectory("graft-bin3").toString)
    val coalescer = new ProduceCoalescer(store, coalesceMs = 20L).start()
    val server = new BinaryProducerServer(coalescer).start()
    try {
      val sock = new Socket("localhost", server.boundPort)
      sock.setSoTimeout(10000)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      out.write(frame(1, 1, 0, Array.emptyByteArray)); out.flush()
      assert(readFrame(in)._2 == 2) // ready

      // record length -4: a clamping parser would spin forever at pos
      def withMsgLen(len: Int): Array[Byte] = {
        val buf = new java.io.ByteArrayOutputStream()
        val d = new DataOutputStream(buf)
        d.writeLong(1700000000000000L)
        d.writeByte(1); d.write("k".getBytes(UTF_8))
        d.writeByte(3); d.write("bad".getBytes(UTF_8))
        d.writeInt(len); d.write("xy".getBytes(UTF_8))
        buf.toByteArray
      }
      out.write(frame(30, 4, 1, withMsgLen(-4))); out.flush()
      val (sid1, op1, b1) = readFrame(in)
      assert((sid1, op1) == (30, 3) && new String(b1.drop(1), UTF_8).contains("malformed"))

      // record length far beyond the body: must ERROR, not durably produce
      // a silently truncated record
      out.write(frame(31, 4, 1, withMsgLen(500))); out.flush()
      val (sid2, op2, _) = readFrame(in)
      assert((sid2, op2) == (31, 3))

      // the connection survives malformed bodies: a good produce still works
      out.write(frame(32, 4, 1, produceBody(1700000000000000L, "k", "ok", Seq("fine"))))
      out.flush()
      val (sid3, op3, _) = readFrame(in)
      assert((sid3, op3) == (32, 5)) // produceResponse
      sock.close()

      store.registry.register("g", "c", Seq("bad"), store.StartFrom.Earliest)
      assert(store.poll("g", "bad", "c").collect().isEmpty,
        "malformed produce must not write records")
    } finally { server.stop(); coalescer.stop() }
  }

  test("empty topic and overflow-length fields error; connection survives") {
    val store = new TopicStore(spark, Files.createTempDirectory("graft-bin4").toString)
    val coalescer = new ProduceCoalescer(store, coalesceMs = 20L).start()
    val server = new BinaryProducerServer(coalescer).start()
    try {
      val sock = new Socket("localhost", server.boundPort)
      sock.setSoTimeout(10000)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      out.write(frame(1, 1, 0, Array.emptyByteArray)); out.flush()
      assert(readFrame(in)._2 == 2) // ready

      // empty topic: partitionBy would write it as the default-partition
      // dir, which reads back null and never matches a poll — must reject
      out.write(frame(40, 4, 1, produceBody(1700000000000000L, "k", "", Seq("x"))))
      out.flush()
      val (sid1, op1, b1) = readFrame(in)
      assert((sid1, op1) == (40, 3) && new String(b1.drop(1), UTF_8).contains("malformed"))

      // field length near Int.MaxValue: `pos + n` wraps negative — a
      // non-overflow-safe guard passes it through to copyOfRange, which
      // throws the WRONG exception type and kills the connection
      def withKeyLen(len: Int): Array[Byte] = {
        val buf = new java.io.ByteArrayOutputStream()
        val d = new DataOutputStream(buf)
        d.writeLong(1700000000000000L)
        d.writeByte(1); d.write("k".getBytes(UTF_8))
        d.writeByte(2); d.write("tt".getBytes(UTF_8))
        d.writeInt(len); d.write("xy".getBytes(UTF_8))
        buf.toByteArray
      }
      out.write(frame(41, 4, 1, withKeyLen(Int.MaxValue - 2))); out.flush()
      val (sid2, op2, _) = readFrame(in)
      assert((sid2, op2) == (41, 3))

      // both errors answered in-band; the stream is still usable
      out.write(frame(42, 4, 1, produceBody(1700000000000000L, "k", "ok4", Seq("fine"))))
      out.flush()
      assert(readFrame(in)._2 == 5)
      sock.close()
    } finally { server.stop(); coalescer.stop() }
  }

  test("first frame must be startup; anything else errors and closes") {
    val store = new TopicStore(spark, Files.createTempDirectory("graft-bin2").toString)
    val coalescer = new ProduceCoalescer(store, coalesceMs = 20L).start()
    val server = new BinaryProducerServer(coalescer).start()
    try {
      val sock = new Socket("localhost", server.boundPort)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      out.write(frame(3, 6, 0, Array.emptyByteArray)); out.flush() // heartbeat first
      val (sid, op, body) = readFrame(in)
      assert((sid, op) == (3, 3)) // error
      assert(new String(body.drop(1), UTF_8).contains("Invalid first message"))
      assert(in.read() == -1) // server closed the connection
      sock.close()
    } finally { server.stop(); coalescer.stop() }
  }
}
