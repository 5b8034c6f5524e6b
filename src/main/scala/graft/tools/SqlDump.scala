package graft.tools
/** Dev aid: print one oracle SQL to stdout for DuckDB iteration. */
object SqlDump {
  def main(args: Array[String]): Unit =
    println(graft.SparkEntry.oracleSql(args(0)))
}
