package graft.tools

import graft.{Graft, SparkEntry}

/** Dump the FINAL adaptive plan (post-execution) for the named queries.
  * `Explain` shows the initial plan (`isFinalPlan=false`); with AQE the
  * join strategies and partition counts that actually ran are only
  * visible after an action, which is what regression triage needs.
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("graft-finalplan")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      // collect(), not count(): count() builds a SEPARATE QueryExecution,
      // leaving this dataset's own adaptive plan unexecuted
      // (isFinalPlan=false forever); collect() runs the plan explain()
      // will describe. Declared queries end in top-k/small aggregates, so
      // the driver-side result is small.
      val n = df.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"\n===================== $name ($sec%.2f s, rows=$n) =====================")
      df.explain("formatted")
    }
    spark.stop()
  }
}
