package graft.tools
import graft.Graft
/** Dev aid: dump one SparkEntry query to parquet for oracle iteration. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val s = Graft.session("onequery")
    names.split(',').foreach { name =>
      graft.SparkEntry.queries(name)(s, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    s.stop()
  }
}
