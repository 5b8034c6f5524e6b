package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Graft
import graft.engine.TopicStore

/** End-to-end engine drive with real data: publish the sf0.001 events
  * table into a topic (user_id as partition key), consume it back with two
  * consumers, and verify the reference's delivery guarantees hold at table
  * scale. Exits nonzero on violation.
  */
object EngineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Graft.session("graft-engine-demo")

    val root = Files.createTempDirectory("graft-demo").toString
    val store = new TopicStore(spark, root)
    println(s"store root: $root")

    val events = Graft.events(spark, sfDir)
      .select(
        col("user_id").cast("string").as("key"),
        encode(to_json(struct(col("event_id"), col("event_type"), col("value"))), "UTF-8").as("value"),
        col("ts").as("timestamp"))
    val n = events.count()
    store.produce("events", events)
    println(s"produced $n records")

    store.registry.register("g", "c-a", Seq("events"), store.StartFrom.Earliest)
    store.registry.register("g", "c-b", Seq("events"), store.StartFrom.Earliest)
    val pa = store.poll("g", "events", "c-a").cache()
    val pb = store.poll("g", "events", "c-b").cache()
    val total = pa.count() + pb.count()
    println(s"polled ${pa.count()} + ${pb.count()} = $total")
    assert(total == n, s"delivery loss: $total != $n")

    // disjoint coverage
    val partsA = pa.select("part").distinct().collect().map(_.getInt(0)).toSet
    val partsB = pb.select("part").distinct().collect().map(_.getInt(0)).toSet
    assert(partsA.intersect(partsB).isEmpty, "overlapping assignments")
    println(s"consumer parts: a=$partsA b=$partsB")

    // per-key order: within every key, offset order == timestamp order
    val violations = pa.unionAll(pb)
      .withColumn("ts_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy("timestamp", "offset")))
      .withColumn("off_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy("offset")))
      .filter(col("ts_rank") =!= col("off_rank"))
      .count()
    assert(violations == 0, s"$violations per-key order violations")
    println("per-key order: OK")

    // second poll returns nothing (offsets committed); lag is drained
    assert(store.poll("g", "events", "c-a").isEmpty, "recommitted records re-delivered")
    assert(store.lag("g", "events").values.sum == 0L, "lag after full drain")
    println("commit semantics + lag: OK")

    // streaming face: the topic consumed as a stream, session-windowed
    val streaming = new graft.streaming.StreamingTopic(store)
    val sess = graft.streaming.StreamOps.sessionAgg(
      streaming.stream("events").select(col("key"), col("timestamp").as("ts")),
      "ts", "30 minutes", "0 seconds")
    val q = sess.writeStream.format("memory").queryName("demo_sessions")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val sessions = spark.sql("SELECT count(*) FROM demo_sessions").head().getLong(0)
    assert(sessions > 0, "no session windows emitted")
    println(s"session windows: $sessions")

    // maintenance: a second small batch on an EXISTING key (so its
    // partition dir gains a second file), then compaction merges them
    val existingKey = pa.select("key").head().getString(0)
    store.produceStrings("events",
      Seq((existingKey, "tail-record", new java.sql.Timestamp(1700000000000L))))
    val replaced = store.compact("events")
    assert(replaced >= 2, s"expected a merge, replaced=$replaced")
    println(s"compaction replaced $replaced files")

    // elasticity: open generation v2 on a 6-broker ring — metadata-only
    // (no data moves; ancestors serve through the lineage)
    val gen2 = store.rescale("events", 6)
    assert(gen2.version == 2 && gen2.clusterSize == 6, s"unexpected generation $gen2")
    store.registry.register("g2", "c", Seq("events"), store.StartFrom.Earliest)
    val rescaled = store.poll("g2", "events", "c").count()
    assert(rescaled == n + 1, s"rescale lost records: $rescaled != ${n + 1}")
    println(s"rescaled (zero-copy) to 6 brokers (gen ${gen2.version}): $rescaled records")

    println("ENGINE DEMO OK")
    spark.stop()
  }
}
