package graft

import org.apache.spark.sql.SparkSession

import graft.engine.TopicStore

/** Forked-JVM consumer for the three-process plane test: claims the
  * CONSUMER-PLANE lease (`spark.graft.planeLeaseRole=consumer`) over a
  * root whose ring is concurrently owned by partition-scoped producer
  * JVMs, registers a group, and on each stdin line drains the topic
  * (repeated auto-committing polls until an empty page), printing
  * `POLLED <n>`. Exits cleanly on EOF/empty line.
  *
  * args: root topic
  */
object ConsumerPlaneChild {
  def main(args: Array[String]): Unit = {
    val Array(root, topic) = args
    try {
      val spark = Graft.configure(
        SparkSession.builder().appName("consumer-plane-child").master("local[2]")
          .config("spark.sql.shuffle.partitions", "2")
          .config("spark.ui.enabled", "false")
          .config("spark.graft.planeLeaseRole", "consumer")
      ).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val store = new TopicStore(spark, root)
      store.registry.register("g", "c", Seq(topic), store.StartFrom.Earliest)
      println("REGISTERED")
      Console.flush()
      var line = scala.io.StdIn.readLine()
      while (line != null && line.startsWith("POLL")) {
        var total = 0L
        var page = store.poll("g", topic, "c").count()
        while (page > 0) {
          total += page
          page = store.poll("g", topic, "c").count()
        }
        println(s"POLLED $total")
        Console.flush()
        line = scala.io.StdIn.readLine()
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
