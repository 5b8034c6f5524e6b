package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scale

/** Scale-path proofs: salted joins preserve results while splitting hot
  * keys, and bucketed tables join with ZERO shuffle exchanges — the
  * co-location strategy for repeated fact-fact joins at 100 TB.
  */
class ScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("scale-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val sf = "/root/testdata/sf0.001"

  test("salted join equals unsalted join on a hot-keyed input") {
    import spark.implicits._
    // 5000 rows of one hot key + a spread tail
    val skewed = (0 until 5000).map(i => (1L, s"v$i")) ++ (0 until 100).map(i => (i.toLong % 7 + 2, s"t$i"))
    val large = skewed.toDF("k", "payload")
    val dim = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = large.join(dim, "k").select("k", "payload", "attr")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(large, dim, "k", salts = 8)
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("bucketed co-located join runs with zero shuffle exchanges") {
    val warehouse = Files.createTempDirectory("graft-buckets").toString
    val orders = Graft.table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val lineitem = Graft.table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")

    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$warehouse/orders_b").mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$warehouse/lineitem_b").mode("overwrite").saveAsTable("lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      joined.queryExecution.executedPlan.execute().count()
      val plan = joined.queryExecution.executedPlan.toString
      // bucket co-location: join needs no Exchange; only the final
      // aggregation on the same key is exchange-free too
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("topKPerGroup returns exactly k rows per group in order") {
    val li = Graft.table(spark, sf, "lineitem")
    val top = Scale.topKPerGroup(li, Seq("l_returnflag"), col("l_extendedprice").desc, 3)
      .groupBy("l_returnflag").count().collect()
    assert(top.nonEmpty && top.forall(_.getAs[Long]("count") == 3L))
  }
}
