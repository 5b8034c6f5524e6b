package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.core.{Murmur3x64, TokenRing}
import graft.engine.TopicStore

/** Horizontal-write-plane profiler: fork N writer JVMs, each holding a
  * PARTITION-SCOPED plane lease over a disjoint slice of ONE root's ring
  * (`spark.graft.planeLeasePartitions`), all producing simultaneously via
  * the broker-local path, and report aggregate msgs/s — the measured
  * counterpart of the reference's "produce scales with brokers" claim
  * (`docs/benchmarks/README.md`: N single-vCPU brokers each own disjoint
  * token ranges), taken across PROCESSES rather than threads.
  *
  * The children synchronize on stdin: each prepares its batches (session
  * up, lease claimed, rows routed), prints READY, and starts producing
  * only on the parent's GO line — so the measured window is produce work,
  * not JVM/session startup. Aggregate rate = total msgs / (latest child
  * end − earliest child start).
  *
  * Usage: runMain graft.tools.MultiWriterProfile [writers] [msgsPerWriter]
  *   [flushSize]  (defaults 2, 400000, 4000; also runs the 1-writer
  *   baseline first for the scaling ratio)
  */
object MultiWriterProfile {
  def main(args: Array[String]): Unit = {
    val writers = args.headOption.map(_.toInt).getOrElse(2)
    val msgs = args.lift(1).map(_.toInt).getOrElse(400000)
    val flush = args.lift(2).map(_.toInt).getOrElse(4000)
    val loadStart =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val one = run(1, msgs, flush)
    val n = run(writers, msgs, flush)
    val ratio = n / one
    val loadEnd =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    // load averages in the record itself so a loaded-host reading is
    // adjudicable without a forensic same-tree rerun
    println(f"aggregate: 1 writer $one%,.0f msgs/s; $writers writers $n%,.0f msgs/s " +
      f"(${ratio}%.2fx; per-writer input held constant at $msgs%,d msgs; " +
      f"load_avg $loadStart%.2f -> $loadEnd%.2f / ${Runtime.getRuntime.availableProcessors} cpus)")
  }

  /** Fork `n` writer children over a fresh root; return aggregate msgs/s. */
  private def run(n: Int, msgsPerWriter: Int, flush: Int): Double = {
    val root = java.nio.file.Files.createTempDirectory("graft-mwp").toString
    // the default ring: 3 tokens x 4 ranges = 12 partitions, split evenly
    val parts = 12
    val per = parts / n
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val procs = (0 until n).map { i =>
      val spec = s"${i * per}-${i * per + per - 1}"
      val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx4g", "-XX:+UseParallelGC",
        s"-Djava.io.tmpdir=${sys.props("java.io.tmpdir")}", "-cp", cp,
        "graft.tools.MultiWriterChild", root, spec, "t",
        msgsPerWriter.toString, flush.toString, s"w$i-")
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.start()
    }
    try {
      val rds = procs.map(p => new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream, "UTF-8")))
      rds.zipWithIndex.foreach { case (rd, i) =>
        var l = rd.readLine()
        while (l != null && l != "READY") l = rd.readLine()
        require(l == "READY", s"writer $i never became READY")
      }
      procs.foreach { p => p.getOutputStream.write('\n'); p.getOutputStream.flush() }
      val spans = rds.zipWithIndex.map { case (rd, i) =>
        var l = rd.readLine()
        while (l != null && !l.startsWith("DONE ")) l = rd.readLine()
        require(l != null, s"writer $i died before DONE")
        val Array(_, wrote, t0, t1) = l.split(' ')
        (wrote.toLong, t0.toLong, t1.toLong)
      }
      procs.foreach(_.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
      val total = spans.map(_._1).sum
      val wallMs = spans.map(_._3).max - spans.map(_._2).min
      require(total == n.toLong * msgsPerWriter, s"lost records: $total")
      val rate = total * 1000.0 / wallMs
      println(f"$n writer(s): $total%,d msgs in $wallMs ms = $rate%,.0f msgs/s")
      rate
    } finally {
      procs.foreach { p => p.destroyForcibly(); () }
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(Path.of(root)).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { Files.deleteIfExists(p); () })
      } catch { case _: Exception => () }
    }
  }
}

/** One forked writer: claims its partition slice, pre-routes its keys,
  * then on GO produces `msgs` records through the broker-local path in
  * `flush`-sized batches (the coalescer's shape). Prints
  * `DONE <wrote> <startMs> <endMs>`.
  */
object MultiWriterChild {
  def main(args: Array[String]): Unit = {
    val Array(root, spec, topic, msgsStr, flushStr, prefix) = args
    val msgs = msgsStr.toInt
    val flush = flushStr.toInt
    val spark = Graft.configure(
      SparkSession.builder().appName("mwp-child").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.graft.planeLeasePartitions", spec)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = new TopicStore(spark, root)
    val owned = TopicStore.parsePartitionSpec(spec)
    val g = store.generation(topic)
    val value = new Array[Byte](1024) // the bench's 1 KiB message body
    java.util.Arrays.fill(value, 'x'.toByte)
    val keys = Iterator.from(0).map(i => s"$prefix$i")
      .filter(k => owned.contains(TokenRing.partitionOrdinal(
        Murmur3x64.hashString(k), g.clusterSize, store.rangesPerToken)))
      .take(msgs).toArray
    val batches = keys.grouped(flush).map { ks =>
      ks.zipWithIndex.map { case (k, i) =>
        TopicStore.LocalRecord(k, value, 1700000000000000L + i * 1000L, i.toLong)
      }.toSeq
    }.toArray
    // claim the lease OUTSIDE the measured window (first produce acquires)
    store.produceLocal(topic, Seq(TopicStore.LocalRecord(
      keys(0), value, 1700000000000000L, 0L)))
    println("READY")
    Console.flush()
    scala.io.StdIn.readLine() // GO
    val t0 = System.currentTimeMillis()
    var wrote = 0L
    batches.foreach(b => wrote += store.produceLocal(topic, b))
    val t1 = System.currentTimeMillis()
    println(s"DONE $wrote $t0 $t1")
    Console.flush()
    spark.stop()
    System.exit(0)
  }
}
