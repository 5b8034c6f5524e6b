package graft

import org.apache.spark.sql.SparkSession

import graft.core.{Murmur3x64, TokenRing}
import graft.engine.TopicStore

/** Forked-JVM writer for the horizontal-produce test: claims a
  * PARTITION-scoped plane lease for the given ring ordinals and produces
  * `count` keyed records — every key chosen to hash INTO the claim — via
  * the driver-side produce path (no Spark jobs: the child pays only
  * session startup). Prints `WROTE <n>`, then HOLDS the lease until a
  * stdin line arrives, then exits cleanly (the shutdown hook releases the
  * partition leases).
  *
  * args: root partsSpec topic count keyPrefix
  */
object PartitionProduceChild {
  def main(args: Array[String]): Unit = {
    val Array(root, spec, topic, countStr, keyPrefix) = args
    val count = countStr.toInt
    try {
      val spark = Graft.configure(
        SparkSession.builder().appName("partition-produce-child").master("local[2]")
          .config("spark.sql.shuffle.partitions", "2")
          .config("spark.ui.enabled", "false")
          .config("spark.graft.planeLeasePartitions", spec)
      ).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val store = new TopicStore(spark, root)
      val owned = TopicStore.parsePartitionSpec(spec)
      val g = store.generation(topic)
      // keys that hash into the claim, derived with the SAME ring math
      // the produce plane applies (BrokerGroup's ShardRouter routing)
      val keys = Iterator.from(0).map(i => s"$keyPrefix$i")
        .filter { k =>
          owned.contains(TokenRing.partitionOrdinal(
            Murmur3x64.hashString(k), g.clusterSize, store.rangesPerToken))
        }
        .take(count).toSeq
      def rowsFor(ks: Seq[String]): Seq[TopicStore.LocalRecord] =
        ks.zipWithIndex.map { case (k, i) =>
          TopicStore.LocalRecord(k, s"v-$k".getBytes("UTF-8"),
            1700000000000000L + i * 1000L, i.toLong)
        }
      val n = store.produceLocal(topic, rowsFor(keys))
      println(s"WROTE $n")
      Console.flush()
      // hold until the parent says go; each "MORE" line produces another
      // round of `count` fresh keys (multi-phase tests); anything else
      // exits cleanly (the shutdown hook releases the leases)
      var round = 0
      var line = scala.io.StdIn.readLine()
      while (line != null && (line.startsWith("MORE") || line.startsWith("TICK"))) {
        if (line.startsWith("TICK")) {
          // drive a heartbeat pass deterministically (the scheduled beat
          // runs at TTL/4 = 15 s — too slow for a test): an idle claimant
          // notices a pending drain here and releases
          graft.engine.PlaneLease.heartbeatTick()
          println("TICKED")
          Console.flush()
          line = scala.io.StdIn.readLine()
        } else {
        round += 1
        // DRAIN-AWARE round: a coordinated rescale may fire mid-round —
        // the produce aborts retryably (PlaneDrainingException), the
        // claim is released, and the retry re-acquires once the
        // coordinator clears the drain. Keys are recomputed per attempt
        // against the CURRENT generation: after the flip the ring is
        // bigger, and keys chosen under the old ring may hash outside
        // the claim (that attempt fails the authority check and the next
        // one re-derives). A live coordinator root lease between drain
        // clear and release also just retries.
        var n2 = -1L
        var attempts = 0
        while (n2 < 0 && attempts < 300) {
          attempts += 1
          try {
            val gNow = store.generation(topic)
            val more = Iterator.from(0).map(i => s"$keyPrefix-r$round-$i")
              .filter { k =>
                owned.contains(TokenRing.partitionOrdinal(
                  Murmur3x64.hashString(k), gNow.clusterSize, store.rangesPerToken))
              }
              .take(count).toSeq
            n2 = store.produceLocal(topic, rowsFor(more))
          } catch {
            case _: graft.engine.PlaneDrainingException =>
              println("DRAINING"); Console.flush(); Thread.sleep(100)
            case _: graft.engine.PlaneLeaseHeldException =>
              println("WAITING"); Console.flush(); Thread.sleep(100)
          }
        }
        require(n2 >= 0, s"round $round never completed after $attempts attempts")
        println(s"WROTE $n2")
        Console.flush()
        line = scala.io.StdIn.readLine()
        }
      }
      spark.stop()
      System.exit(0)
    } catch {
      case e: graft.engine.PlaneLeaseHeldException =>
        println("HELD " + e.getMessage)
        System.exit(7)
      case e: Throwable =>
        e.printStackTrace()
        System.exit(1)
    }
  }
}
