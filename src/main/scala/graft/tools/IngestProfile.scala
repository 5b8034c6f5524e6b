package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.Graft

/** Ingest-path profiler: isolates the cost of each produce stage so tuning
  * targets the real bottleneck (run: sbt "runMain graft.tools.IngestProfile").
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("ingest-profile")
    import graft.functions.{murmur3_token, ring_partition}
    import org.apache.spark.sql.expressions.Window

    val msgs = BenchData.messages(spark, sfDir)

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val tmp = java.nio.file.Files.createTempDirectory("ingest-profile").toString

    t("source gen only (count of value bytes)") {
      msgs.select(sum(length(col("value")))).head()
    }

    val keyed = msgs
      .withColumn("part", ring_partition(murmur3_token(col("key")), 12, 4))

    t("source + hash + shuffle (48 parts)") {
      keyed.repartition(48, col("part"))
        .select(sum(length(col("value")))).head()
    }

    t("+ window row_number") {
      val w = Window.partitionBy(col("part")).orderBy(col("timestamp"), col("key"))
      keyed.repartition(48, col("part"))
        .withColumn("o", row_number().over(w))
        .select(sum(length(col("value")) + col("o"))).head()
    }

    t("flat parquet write (no partitionBy, no window)") {
      keyed.repartition(48, col("part"))
        .write.mode(SaveMode.Overwrite).parquet(s"$tmp/flat")
    }

    t("partitionBy(part) write (no window)") {
      keyed.repartition(48, col("part"))
        .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(s"$tmp/bypart")
    }

    t("full produce-shaped write") {
      val w = Window.partitionBy(col("part")).orderBy(col("timestamp"), col("key"))
      keyed.repartition(48, col("part"))
        .withColumn("offset", row_number().over(w).cast("long") - 1L)
        .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(s"$tmp/full")
    }

    // SPARK_GRAFT_SMALL_BATCHES=N: produce N tiny batches to one store and
    // compare the first vs last quartile's mean produce time — the cost
    // must stay FLAT as the topic's file count grows (watermarks derive
    // from the batch, never from a listing of the topic dir; a linear
    // growth here is the O(files) regression this guards against).
    sys.env.get("SPARK_GRAFT_SMALL_BATCHES").map(_.toInt).foreach { n =>
      require(n >= 4, s"SPARK_GRAFT_SMALL_BATCHES must be >= 4 (got $n): quartiles need data")
      import spark.implicits._
      val store = new graft.engine.TopicStore(spark,
        java.nio.file.Files.createTempDirectory("ingest-small").toString)
      val times = (0 until n).map { b =>
        val batch = (0 until 8).map(i =>
          (s"k${i % 4}", s"b$b-m$i", new java.sql.Timestamp(1700000000000L + b * 1000L + i)))
          .toDF("key", "svalue", "timestamp")
          .withColumn("value", encode(col("svalue"), "UTF-8"))
          .select("key", "value", "timestamp")
        val t0 = System.nanoTime()
        store.produce("small", batch)
        (System.nanoTime() - t0) / 1e9
      }
      val q = n / 4
      val head = times.take(q).sum / q
      val tail = times.takeRight(q).sum / q
      println(f"[profile] small-batch produce: first-quartile mean ${head}%.3f s, " +
        f"last-quartile mean ${tail}%.3f s, ratio ${tail / head}%.2f")
    }

    spark.stop()
  }
}
