package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity proof for the codegen'd `bucket_weight_sum` expression (r12,
  * q105's margin kernel): the fold must be BIT-identical to the
  * higher-order composition it replaced —
  * `aggregate(transform(bs, j -> element_at(w, j+1)), start, (a,x) -> a+x)`
  * — same element order, same start term, same double association.
  */
class BucketWeightSumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("bws-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("expression equals the aggregate/transform fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val b = 64
    val w = Array.fill(b)(rnd.nextGaussian())
    val start = -0.8315002
    val rows = (1L to 50L).map { id =>
      id -> Seq.fill(rnd.nextInt(20))(rnd.nextInt(b))
    } :+ (51L -> Seq.empty[Int])
    val df = rows.toDF("id", "bs")
      .withColumn("bs", col("bs").cast("array<int>"))

    val viaExpr = df.select(col("id"),
        org.apache.spark.sql.graft.GraftColumns.bucketWeightSum(col("bs"), w, start).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaBuiltin = df.select(col("id"),
        aggregate(
          transform(col("bs"), j => element_at(typedlit(w.toSeq), j + 1)),
          lit(start), (acc, x) => acc + x).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(viaExpr.keySet == viaBuiltin.keySet)
    viaExpr.foreach { case (id, m) =>
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToRawLongBits(m) ==
        java.lang.Double.doubleToRawLongBits(viaBuiltin(id)), s"id $id: $m vs ${viaBuiltin(id)}")
    }
  }
}
