package graft.tools

import org.apache.spark.sql.execution.FormattedMode

import graft.{Graft, SparkEntry}

/** One-line plan-quality summary per query: shuffle count, join
  * strategies, parquet scans with pushed-filter/column-pruning status,
  * and whole-stage-codegen span count. The scan column reads
  * `cols=<read>/<file> pf=<pushed filter count>` — a scan reading all
  * columns for a narrow projection, or pf=0 under a selective filter,
  * is a plan bug to chase with `Explain <name>`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Graft.session("graft-plan-audit")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted

    println(f"${"query"}%-26s ${"xchg"}%4s ${"bhj"}%3s ${"smj"}%3s ${"bnlj"}%4s ${"wsc"}%3s  scans")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THIS queryExecution's physical plan (count()/write would
      // each build their own), so AQE settles on the final plan with
      // codegen ids before we explain it
      df.queryExecution.executedPlan.execute().count()
      val plan = df.queryExecution.explainString(FormattedMode)
      // count numbered detail nodes only — the tree outline repeats them
      def nodes(p: String) = s"(?m)^\\(\\d+\\) $p".r.findAllIn(plan).length
      val xchg = nodes("\\w*Exchange")
      val bhj = nodes("BroadcastHashJoin")
      val smj = nodes("SortMergeJoin")
      val bnlj = nodes("BroadcastNestedLoopJoin")
      // formatted mode marks codegen as per-node `[codegen id : N]`
      val wsc = "\\[codegen id : (\\d+)\\]".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      // per-scan: ReadSchema column count + PushedFilters count
      val scans = "(?s)Scan parquet.*?(?=\\n\\()".r.findAllIn(plan).map { s =>
        val readCols = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(s)
          .map(m => if (m.group(1).trim.isEmpty) 0 else m.group(1).split(",").length)
          .getOrElse(-1)
        val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(s)
          .map(m => if (m.group(1).trim.isEmpty) 0 else m.group(1).split(",").length)
          .getOrElse(-1)
        s"cols=$readCols,pf=$pushed"
      }.mkString(" ")
      println(f"$name%-26s $xchg%4d $bhj%3d $smj%3d $bnlj%4d $wsc%3d  $scans")
    }
    spark.stop()
  }
}
