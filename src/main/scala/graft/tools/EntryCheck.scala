package graft.tools
import org.apache.spark.sql.SparkSession
object EntryCheck {
  def main(args: Array[String]): Unit = {
    // a BARE session, as the round driver might create one — no graft
    // configs, default shuffle partitions, no registered functions
    val spark = SparkSession.builder().appName("entry-check")
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    val n = graft.SparkEntry.entry(spark).count()
    require(n > 0, "entry returned no rows")
    println(s"ENTRY OK ($n rows)")
    spark.stop()
  }
}
