package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Relational operator surface over the TPC-H-ish tables: scan, filter,
  * project, hash/broadcast/shuffle joins, semi/anti joins, aggregation,
  * windows, top-k, set ops, rollup, scalar functions.
  *
  * Determinism contract with the DuckDB oracle: every aggregated double is
  * cast to DECIMAL before SUM (exact, order-independent addition), converted
  * back to double only at the end; row-level double arithmetic is identical
  * IEEE ops in both engines; every query ends in a total ORDER BY.
  */
object Relational {

  /** Row-level term -> exact decimal so the (partial-agg, any-order) sum is
    * bit-reproducible and engine-independent.
    */
  private def dec(c: Column, scale: Int = 4): Column = c.cast(s"decimal(18,$scale)")

  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, d: String) = Graft.table(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Graft.table(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Graft.table(s, d, "customer")

  // ---------------------------------------------------------------- q01
  val q01: Q = (s, d) =>
    li(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  val q02: Q = (s, d) =>
    li(s, d)
      .filter(
        col("l_shipdate").between(lit("1996-01-01"), lit("1996-12-31")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * col("l_discount")).as("disc_revenue"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice * l_discount AS disc_revenue,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  val q03: Q = (s, d) => {
    val o = ord(s, d)
    val c = cust(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_revenue"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  val q03Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
      |  COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q04
  val q04: Q = (s, d) => {
    val l = li(s, d)
    val o = ord(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(DISTINCT l_orderkey) AS n_orders,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q05
  val q05: Q = (s, d) => {
    val r = Graft.table(s, d, "region").filter(col("r_name") === "ASIA")
    val n = Graft.table(s, d, "nation")
    val sup = Graft.table(s, d, "supplier")
    val c = cust(s, d)
    val o = ord(s, d)
    val l = li(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup),
        l("l_suppkey") === sup("s_suppkey") && sup("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  val q06: Q = (s, d) =>
    li(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  val q06Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q07
  val q07: Q = (s, d) => {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    li(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("run_qty",
        sum(dec(col("l_quantity"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("run_qty"))
      .orderBy("l_suppkey", "rn")
  }

  val q07Sql: String =
    """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice, run_qty FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    CAST(row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
      |  FROM lineitem)
      |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin

  // ---------------------------------------------------------------- q08
  val q08: Q = (s, d) => {
    val c = cust(s, d)
    val big = ord(s, d).filter(col("o_totalprice") > 450000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  val q08Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q09
  val q09: Q = (s, d) => {
    val c = cust(s, d)
    val o = ord(s, d).filter(col("o_totalprice") > 450000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  val q09Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q10
  val q10: Q = (s, d) => {
    val o = ord(s, d)
    def buyers(prio: String) =
      o.filter(col("o_orderpriority") === prio).select(col("o_custkey").as("custkey"))
    buyers("1-URGENT").intersect(buyers("2-HIGH"))
      .union(buyers("5-LOW").except(buyers("1-URGENT")))
      .distinct()
      .orderBy("custkey")
  }

  val q10Sql: String =
    """SELECT custkey FROM (
      |  (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |   INTERSECT
      |   SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '2-HIGH')
      |  UNION
      |  (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
      |   EXCEPT
      |   SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |) ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- q11
  val q11: Q = (s, d) =>
    li(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_partkey")).as("n_parts"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("n_parts"), col("sum_qty"))
      .orderBy("flag", "status")

  val q11Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
      |  COUNT(*) AS n, COUNT(DISTINCT l_partkey) AS n_parts,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin

  // ---------------------------------------------------------------- q12
  val q12: Q = (s, d) =>
    ord(s, d)
      .select(
        year(col("o_orderdate")).cast("long").as("yr"),
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 250000, "mid")
          .otherwise("big").as("bucket"),
        concat_ws("-", col("o_orderstatus"), substring(col("o_orderpriority"), 1, 1)).as("code"),
        col("o_totalprice"))
      .groupBy("yr", "bucket", "code")
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy("yr", "bucket", "code")

  val q12Sql: String =
    """SELECT year(o_orderdate) AS yr,
      |  CASE WHEN o_totalprice < 100000 THEN 'small'
      |       WHEN o_totalprice < 250000 THEN 'mid' ELSE 'big' END AS bucket,
      |  o_orderstatus || '-' || substring(o_orderpriority, 1, 1) AS code,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, bucket, code""".stripMargin

  /** name -> (query, oracle) */
  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q01_pricing_summary", q01, Some(q01Sql)),
    ("q02_filter_project", q02, Some(q02Sql)),
    ("q03_broadcast_join", q03, Some(q03Sql)),
    ("q04_shuffle_join_agg", q04, Some(q04Sql)),
    ("q05_multi_join_revenue", q05, Some(q05Sql)),
    ("q06_topk_orders", q06, Some(q06Sql)),
    ("q07_window_rank", q07, Some(q07Sql)),
    ("q08_semi_join", q08, Some(q08Sql)),
    ("q09_anti_join", q09, Some(q09Sql)),
    ("q10_set_ops", q10, Some(q10Sql)),
    ("q11_rollup", q11, Some(q11Sql)),
    ("q12_scalar_case", q12, Some(q12Sql))
  )
}
