package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{Graft, SparkEntry}

/** Perf triage: times the named SparkEntry queries (all when no args) in
  * one warm JVM and prints per-stage task/CPU totals, so a slow query can
  * be attributed to a stage instead of guessed at. Complements Explain
  * (plan shape) with where-the-time-went.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("graft-profile")
    @volatile var log = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val cpuMs = i.taskMetrics.executorCpuTime / 1000000
        val runMs = i.taskMetrics.executorRunTime
        if (runMs > 500)
          log ::= f"  stage ${i.stageId}%4d ${i.name.take(60)}%-60s tasks=${i.numTasks}%4d run=${runMs}%7dms cpu=${cpuMs}%7dms"
      }
    })

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // warmup: absorb JVM/codegen startup outside the timers
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }

    names.foreach { name =>
      // stage-completed events arrive on the ASYNC listener bus (the
      // drain API is private[spark]); a short settle keeps a fast query's
      // trailing events from being dropped by the reset or printed under
      // the next query's header — triage-grade attribution, not exact
      Thread.sleep(300)
      log = Nil
      val t0 = System.nanoTime()
      val n =
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$name%-28s $sec%8.2fs  rows=$n")
      log.reverse.foreach(println)
    }
    spark.stop()
  }
}
