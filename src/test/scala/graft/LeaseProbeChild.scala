package graft

/** Forked-JVM probe for the two-process plane-lease tests: tries to open
  * the produce/maintenance plane on the given root exactly as a second
  * store process would (no SparkSession needed — the lease is pure
  * Hadoop FS). An optional third arg claims a PARTITION-scoped lease
  * ("0-5" ring ordinals) instead of the root plane.
  * Exit 0 = acquired, 7 = rejected loudly, 1 = unexpected.
  */
object LeaseProbeChild {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    // optional ms to stay alive holding the lease (clean exits RELEASE
    // it via the shutdown hook, so "a live second process" needs a live
    // process)
    val holdMs = if (args.length > 1) args(1).toLong else 0L
    // "-" = no partition claim; an optional 4th arg records a short TTL
    // in the lease content (object-store takeover tests wait it out)
    val parts = if (args.length > 2 && args(2) != "-") Some(args(2)) else None
    val ttlMs =
      if (args.length > 3) args(3).toLong
      else graft.engine.PlaneLease.DefaultTtlMs
    val conf = new org.apache.hadoop.conf.Configuration()
    val rootKey = graft.engine.TopicStore.normalizeRoot(root, conf)
    try {
      parts match {
        case Some(spec) =>
          graft.engine.PlaneLease.ensureOwnedPartitions(rootKey, root, conf,
            graft.engine.TopicStore.parsePartitionSpec(spec), ttlMs)
        case None =>
          graft.engine.PlaneLease.ensureOwned(rootKey, root, conf, ttlMs)
      }
      println("ACQUIRED")
      Console.flush()
      // optional 5th arg: beat every N ms while holding (drives
      // heartbeatTick directly — the scheduled beater's DefaultTtl/4
      // cadence is too slow for short-TTL takeover-repel tests)
      val beatEveryMs = if (args.length > 4) args(4).toLong else 0L
      if (holdMs > 0L) {
        if (beatEveryMs > 0L) {
          val until = System.currentTimeMillis() + holdMs
          while (System.currentTimeMillis() < until) {
            Thread.sleep(beatEveryMs)
            graft.engine.PlaneLease.heartbeatTick()
          }
        } else Thread.sleep(holdMs)
      }
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
