package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Shared bench/profiler fixtures: the ONE message-corpus builder and the
  * ONE client-side binary frame codec. Bench and the three ingest
  * profilers previously each carried a copy of the corpus pipeline (and
  * Bench + Serve a copy of the frame layout); a shape change applied to
  * one and not the others would silently make the profilers measure a
  * different workload than the bench they exist to explain.
  */
object BenchData {

  /** The canonical ~`target`-message bench corpus: events replicated up,
    * 1 KiB padded values, unique keys per replica — the reference
    * benchmark's client-generated message shape.
    */
  def messages(spark: SparkSession, sfDir: String, target: Long = 2000000L): DataFrame = {
    val base = Graft.events(spark, sfDir)
    val mult = math.max(1L, target / math.max(1L, base.count()))
    base
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        concat(col("user_id").cast("string"), lit("-"), col("rep")).as("key"),
        encode(rpad(col("props"), 1024, "x"), "UTF-8").as("value"),
        col("ts").as("timestamp"))
  }

  /** The binary producer protocol's 13-byte frame header (version 1,
    * flags, u16 streamId, op, u32 bodyLen, CRC32 over the first 9 bytes)
    * — the client-side twin of `BinaryProducerServer`'s parser.
    */
  def frameHeader(streamId: Int, op: Int, flags: Int, bodyLen: Int): Array[Byte] = {
    val h = new Array[Byte](13)
    h(0) = 1; h(1) = flags.toByte
    h(2) = ((streamId >> 8) & 0xff).toByte; h(3) = (streamId & 0xff).toByte
    h(4) = op.toByte
    h(5) = ((bodyLen >> 24) & 0xff).toByte; h(6) = ((bodyLen >> 16) & 0xff).toByte
    h(7) = ((bodyLen >> 8) & 0xff).toByte; h(8) = (bodyLen & 0xff).toByte
    val crc = new java.util.zip.CRC32
    crc.update(h, 0, 9)
    val c = crc.getValue
    h(9) = ((c >> 24) & 0xff).toByte; h(10) = ((c >> 16) & 0xff).toByte
    h(11) = ((c >> 8) & 0xff).toByte; h(12) = (c & 0xff).toByte
    h
  }

  /** Read one response frame header; returns (op, bodyLen). The caller
    * skips or reads the body.
    */
  def readFrameHeader(in: java.io.DataInputStream): (Int, Int) = {
    val h = new Array[Byte](13)
    in.readFully(h)
    val len = ((h(5) & 0xff) << 24) | ((h(6) & 0xff) << 16) |
      ((h(7) & 0xff) << 8) | (h(8) & 0xff)
    (h(4) & 0xff, len)
  }
}
