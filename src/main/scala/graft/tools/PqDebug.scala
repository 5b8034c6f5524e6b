package graft.tools

import org.apache.spark.sql.functions._
import graft.Graft
import graft.functions.l2_sq

/** Dev aid: compare q74's ADC distances against exact L2 for the probed
  * candidate set — prints the exact top-10 with their ADC ranks.
  */
object PqDebug {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Graft.session("pq-debug")
    val assigned = graft.operators.EmbeddingOps.ivfAssigned(spark, sf)
    val q = assigned.filter(col("vec_id") === 0L).select(col("embedding").as("q_vec"))
    val exact = assigned.filter(col("vec_id") =!= 0L && col("probed"))
      .crossJoin(broadcast(q))
      .withColumn("d2", l2_sq(col("embedding"), col("q_vec")))
      .select(col("vec_id"), col("d2"))
      .orderBy(col("d2").asc, col("vec_id"))
    println("exact top-10 (within probed):")
    exact.show(10, false)
    val adc = graft.operators.EmbeddingOps.pqAdcAll(spark, sf)
      .withColumn("adc_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("adist").asc, col("vec_id"))))
    println("ADC ranks of the exact top-10:")
    exact.limit(10).join(adc, "vec_id").orderBy(col("d2")).show(10, false)
    println(s"probed count: ${assigned.filter(col("probed")).count()}")
    spark.stop()
  }
}
