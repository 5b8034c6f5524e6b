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

    val base = Graft.events(spark, sfDir)
    val mult = math.max(1L, 2000000L / math.max(1L, base.count()))
    val msgs = base
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        concat(col("user_id").cast("string"), lit("-"), col("rep")).as("key"),
        encode(rpad(col("props"), 1024, "x"), "UTF-8").as("value"),
        col("ts").as("timestamp"))

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

    spark.stop()
  }
}
