package graft

import org.apache.spark.sql.SparkSession

import graft.engine.TopicStore

/** Forked-JVM consumer for the multi-process plane tests: claims the
  * CONSUMER-PLANE lease (`spark.graft.planeLeaseRole=consumer`, or a
  * RANGE-SCOPED `consumer:<spec>` claim when args carry one) over a
  * root whose ring may concurrently be owned by partition-scoped
  * producer JVMs, registers a group, and on each stdin line drains the
  * topic (repeated auto-committing polls until an empty page), printing
  * `POLLED <n>` then `PARTS <csv>` (the distinct ring partitions the
  * drain served). Exits cleanly on EOF/empty line.
  *
  * args: root topic [role] [group] [consumerId]
  */
object ConsumerPlaneChild {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val topic = args(1)
    val role = args.lift(2).getOrElse("consumer")
    val group = args.lift(3).getOrElse("g")
    val cid = args.lift(4).getOrElse("c")
    try {
      val spark = Graft.configure(
        SparkSession.builder().appName("consumer-plane-child").master("local[2]")
          .config("spark.sql.shuffle.partitions", "2")
          .config("spark.ui.enabled", "false")
          .config("spark.graft.planeLeaseRole", role)
      ).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val store = new TopicStore(spark, root)
      store.registry.register(group, cid, Seq(topic), store.StartFrom.Earliest)
      println("REGISTERED")
      Console.flush()
      var line = scala.io.StdIn.readLine()
      while (line != null && line.startsWith("POLL")) {
        var total = 0L
        val parts = scala.collection.mutable.SortedSet.empty[Int]
        var page = store.poll(group, topic, cid).collect()
        while (page.nonEmpty) {
          total += page.length
          page.foreach(r => parts += r.getAs[Int]("part"))
          page = store.poll(group, topic, cid).collect()
        }
        println(s"POLLED $total")
        println(s"PARTS ${parts.mkString(",")}")
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
