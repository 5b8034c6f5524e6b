package graft.tools
/** Dev aid: print one oracle SQL to stdout for DuckDB iteration, or
  * `--json <path>` to dump the whole oracle map as oracle_sql.json
  * without running any query (pairs with OneQuery + verify_local.py for
  * single-query gate iteration).
  */
object SqlDump {
  def main(args: Array[String]): Unit = args match {
    case Array("--json", path) =>
      java.nio.file.Files.writeString(java.nio.file.Path.of(path), graft.Verify.oracleJson)
      ()
    case _ => println(graft.SparkEntry.oracleSql(args(0)))
  }
}
