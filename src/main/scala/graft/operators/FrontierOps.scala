package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Pareto-frontier (skyline) operators (round 7, thirtieth pack): the
  * multi-objective dominance family nothing else covers — the part
  * catalog skyline (q263: cheapest-for-their-size parts), the order
  * record frontier (q264: biggest-order-since record dates), and each
  * skyline part's dominance score (q265).
  *
  * The 2-D skyline never runs the quadratic dominance anti-join on the
  * Spark side: one objective always lives on a BOUNDED domain (p_size
  * ∈ 1..50; order dates span-bounded), so dominance collapses to a
  * per-domain-value extremum table plus a strict prefix extremum over
  * it — `p` is dominated iff a strictly-better domain value beats its
  * price (`rm_strict`) or its own domain value's extremum strictly
  * beats it. That is one map-side-combined aggregation, one window
  * over the bounded table, and one broadcast join back: linear at any
  * scale, and the same two-level discipline as the q175 ECDF. The
  * DuckDB oracles run the textbook `NOT EXISTS` dominance anti-join
  * instead — an independent formulation, so the prefix-extremum
  * rewrite is itself verified. q265 broadcast-joins the (small)
  * skyline against the full table with the dominance predicate —
  * skyline-sized × one linear pass.
  *
  * Exactness: dominance is pure comparisons on parquet-born doubles
  * and integers (no arithmetic), so both engines see identical
  * orderings; outputs are keys, raw column values, and counts.
  */
object FrontierOps {
  import Relational.Q

  // ---------------------------------------------------------------- q263
  /** Part-catalog skyline: minimize p_retailprice, maximize p_size —
    * parts no other part beats on both (one strictly).
    */
  /** The (min price, max size) skyline of any part-shaped frame via the
    * bounded size-domain extremum table.
    */
  private def skylineOf(parts: DataFrame): DataFrame = {
    val st = parts.groupBy(col("p_size")).agg(min(col("p_retailprice")).as("mp"))
    // un-partitioned window, but over the ≤50-row size-domain table
    val w = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val st2 = st.withColumn("rm_strict", min(col("mp")).over(w))
    parts.join(broadcast(st2), Seq("p_size"))
      .filter(!(coalesce(col("rm_strict") <= col("p_retailprice"), lit(false))
        || col("mp") < col("p_retailprice")))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
        col("p_retailprice"))
  }

  private def partSkyline(s: SparkSession, d: String): DataFrame =
    skylineOf(Graft.table(s, d, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
        col("p_retailprice")))

  val q263: Q = (s, d) =>
    partSkyline(s, d).orderBy(col("p_size").desc, col("p_retailprice"), col("p_partkey"))

  val q263Sql: String =
    """SELECT p.p_partkey, p.p_name, p.p_brand, p.p_size, p.p_retailprice
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p.p_size DESC, p.p_retailprice, p.p_partkey""".stripMargin

  // ---------------------------------------------------------------- q264
  /** Order record frontier: maximize o_totalprice AND o_orderdate —
    * the orders never exceeded on or after their date (the
    * "biggest order since" records). Domain table = per-day max price
    * (span-bounded), strict prefix max from the latest day backward.
    */
  val q264: Q = (s, d) => {
    val o = Graft.table(s, d, "orders")
    val dt = o.groupBy(col("o_orderdate")).agg(max(col("o_totalprice")).as("mp"))
    val w = Window.orderBy(col("o_orderdate").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val dt2 = dt.withColumn("rm_strict", max(col("mp")).over(w))
    o.join(broadcast(dt2), Seq("o_orderdate"))
      .filter(!(coalesce(col("rm_strict") >= col("o_totalprice"), lit(false))
        || col("mp") > col("o_totalprice")))
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"))
      .orderBy(col("order_date").desc, col("o_orderkey"))
  }

  val q264Sql: String =
    """SELECT p.o_orderkey, p.o_custkey,
      |  strftime(p.o_orderdate, '%Y-%m-%d') AS order_date, p.o_totalprice
      |FROM orders p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders q
      |  WHERE q.o_totalprice >= p.o_totalprice AND q.o_orderdate >= p.o_orderdate
      |    AND (q.o_totalprice > p.o_totalprice OR q.o_orderdate > p.o_orderdate))
      |ORDER BY order_date DESC, p.o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q265
  /** Dominance score: for every q263 skyline part, how many catalog
    * parts it strictly dominates. The skyline (small) broadcasts
    * against one linear pass over part.
    */
  val q265: Q = (s, d) => {
    val parts = Graft.table(s, d, "part")
    val sky = partSkyline(s, d).select(
      col("p_partkey").as("sk_key"), col("p_size").as("sk_size"),
      col("p_retailprice").as("sk_price"))
    broadcast(sky).join(parts,
        col("sk_price") <= col("p_retailprice") && col("sk_size") >= col("p_size") &&
          (col("sk_price") < col("p_retailprice") || col("sk_size") > col("p_size")),
        "left_outer")
      .groupBy(col("sk_key"), col("sk_size"), col("sk_price"))
      .agg(count(col("p_partkey")).as("n_dominated"))
      .orderBy(col("n_dominated").desc, col("sk_key"))
  }

  val q265Sql: String =
    """WITH sky AS (
      |  SELECT p.p_partkey AS sk_key, p.p_size AS sk_size, p.p_retailprice AS sk_price
      |  FROM part p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM part q
      |    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)))
      |SELECT s.sk_key, s.sk_size, s.sk_price,
      |  CAST(count(t.p_partkey) AS BIGINT) AS n_dominated
      |FROM sky s LEFT JOIN part t
      |  ON s.sk_price <= t.p_retailprice AND s.sk_size >= t.p_size
      |    AND (s.sk_price < t.p_retailprice OR s.sk_size > t.p_size)
      |GROUP BY 1, 2, 3
      |ORDER BY n_dominated DESC, s.sk_key""".stripMargin

  // ---------------------------------------------------------------- q272
  /** Frontier layers (onion peeling): the first three skylines — peel
    * layer 1, re-run the same bounded-domain kernel on the remainder,
    * repeat. Three unrolled iterations (the q235 LPA discipline: fixed
    * synchronous rounds), each one extremum aggregation + one anti
    * join; per-layer summary rows only. Each layer is SKYLINE-SIZED,
    * so pinning it truncates the peel's lineage — without the pins the
    * plan re-derives every earlier layer per reference (2^k scans);
    * with them each layer costs a constant number of base scans.
    */
  val q272: Q = (s, d) => {
    val p0 = Graft.table(s, d, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
        col("p_retailprice"))
    def summary(layer: Int, l: DataFrame) =
      l.agg(count(lit(1)).as("n_parts"),
          min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"),
          min(col("p_size")).as("min_size"),
          max(col("p_size")).as("max_size"))
        .select(lit(layer).as("layer"), col("n_parts"), col("min_price"),
          col("max_price"), col("min_size"), col("max_size"))
    val l1 = skylineOf(p0).localCheckpoint(true)
    val r1 = p0.join(l1.select("p_partkey"), Seq("p_partkey"), "left_anti")
    val l2 = skylineOf(r1).localCheckpoint(true)
    val r2 = r1.join(l2.select("p_partkey"), Seq("p_partkey"), "left_anti")
    val l3 = skylineOf(r2).localCheckpoint(true)
    summary(1, l1).unionAll(summary(2, l2)).unionAll(summary(3, l3))
      .orderBy("layer")
  }

  val q272Sql: String =
    """WITH l1 AS MATERIALIZED (
      |  SELECT * FROM part p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM part q
      |    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))),
      |r1 AS MATERIALIZED (
      |  SELECT * FROM part WHERE p_partkey NOT IN (SELECT p_partkey FROM l1)),
      |l2 AS MATERIALIZED (
      |  SELECT * FROM r1 p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM r1 q
      |    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))),
      |r2 AS MATERIALIZED (
      |  SELECT * FROM r1 WHERE p_partkey NOT IN (SELECT p_partkey FROM l2)),
      |l3 AS MATERIALIZED (
      |  SELECT * FROM r2 p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM r2 q
      |    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)))
      |SELECT 1 AS layer, count(*) AS n_parts, min(p_retailprice) AS min_price,
      |  max(p_retailprice) AS max_price, min(p_size) AS min_size, max(p_size) AS max_size
      |FROM l1
      |UNION ALL
      |SELECT 2, count(*), min(p_retailprice), max(p_retailprice), min(p_size), max(p_size) FROM l2
      |UNION ALL
      |SELECT 3, count(*), min(p_retailprice), max(p_retailprice), min(p_size), max(p_size) FROM l3
      |ORDER BY layer""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q263_part_skyline", q263, Some(q263Sql)),
    ("q264_order_frontier", q264, Some(q264Sql)),
    ("q265_dominance_score", q265, Some(q265Sql)),
    ("q272_frontier_layers", q272, Some(q272Sql)))
}
