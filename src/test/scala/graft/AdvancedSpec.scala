package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics specs for the Advanced pack on hand-built inputs — the cases
  * the DuckDB oracle can't pin down (tie-breaks, sketch accuracy) or where
  * a tiny deterministic input makes the expected value readable.
  */
class AdvancedSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("advanced-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("asof join picks latest order at-or-before, ties to max orderkey") {
    import spark.implicits._
    // user 1: orders at t=10 (k=100), t=20 (k=200, k=201 tie) — events at
    // t=5 (no match), t=10 (exact tie -> 100), t=25 (-> 201)
    val orders = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 20L, 201L))
      .toDF("uid", "t", "o_orderkey")
    val events = Seq((1L, 5L, 1L), (1L, 10L, 2L), (1L, 25L, 3L))
      .toDF("uid", "t", "event_id")

    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("uid"))
      .orderBy(col("t").asc, col("is_order").desc, col("o_orderkey").asc_nulls_last,
        col("event_id").asc_nulls_last)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out = orders.withColumn("is_order", lit(1))
      .withColumn("event_id", lit(null).cast("long"))
      .unionByName(events.withColumn("is_order", lit(0))
        .withColumn("o_orderkey", lit(null).cast("long")))
      .withColumn("asof", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .where(col("is_order") === 0)
      .select("event_id", "asof")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(1L -> -1L, 2L -> 100L, 3L -> 201L))
  }

  test("approx sketches land within stated error of exact values") {
    val li = Graft.table(spark, sf, "lineitem")
    val row = li.agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val (approx, ex) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - ex) / ex < 0.05, s"approx=$approx exact=$ex")

    val pr = li.agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("approx"),
      expr("percentile(l_quantity, 0.5)").as("exact")).head()
    assert(math.abs(pr.getDouble(0) - pr.getDouble(1)) <= 1.0)
  }

  test("stratified hash-sample is deterministic and ~10%") {
    val li = Graft.table(spark, sf, "lineitem")
    val total = li.count().toDouble
    val n1 = SparkEntry.queries("q44_stratified_sample")(spark, sf)
      .agg(sum(col("n_sampled"))).head().getLong(0)
    val n2 = SparkEntry.queries("q44_stratified_sample")(spark, sf)
      .agg(sum(col("n_sampled"))).head().getLong(0)
    assert(n1 == n2) // deterministic
    assert(math.abs(n1 / total - 0.1) < 0.03, s"rate=${n1 / total}")
  }

  test("misra-gries: capacity bound, count bounds, guaranteed containment") {
    val summary = operators.Advanced.hhSummary(spark, sf)
    assert(summary.size <= operators.Advanced.hhCapacity)
    val exact = Graft.events(spark, sf)
      .selectExpr(s"${operators.Advanced.hhKeyCase} AS hh_key")
      .groupBy("hh_key").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val eps = total / operators.Advanced.hhCapacity
    // MG estimate is an undercount by at most n/k
    summary.foreach { case (k, est) =>
      val ex = exact.getOrElse(k, 0L)
      assert(est <= ex, s"$k overestimated: $est > $ex")
      assert(ex - est <= eps, s"$k undercounted beyond n/k: $est vs $ex")
    }
    // every key above the n/k threshold is present
    exact.filter(_._2 > eps).keys
      .foreach(k => assert(summary.contains(k), s"guaranteed key $k missing"))
  }
}
