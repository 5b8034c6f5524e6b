package graft.operators

import org.apache.spark.sql.functions._

import graft.Graft

/** Trade-flow analytics (round 6, sixteenth pack): the cross-dimension
  * readouts the TPC-H-ish star schema supports — the nation x nation
  * trade-flow matrix (q205), discount elasticity of demand per brand
  * (q206), the order-size profile (q207), and per-brand return rates
  * with exact Wilson confidence intervals (q208).
  *
  * Scale notes (the 100 TB story): q205 is two fact-dim equi-joins
  * (orders on orderkey, customer on custkey, supplier on suppkey —
  * AQE picks broadcast vs shuffle by dim size) with the 25-row nation
  * table broadcast twice; output is <= 25 x 25 rows. q206/q208 join
  * the part dimension once and aggregate to brand-sized tables
  * (map-side combine does the heavy lifting; the regression slope is
  * a closed-form polynomial of per-brand integer power sums — no
  * per-point second pass). q207 is one orderkey shuffle then a
  * metadata-sized histogram. Nothing here materializes anything
  * larger than the fact scan's combine output.
  *
  * Exactness: money as integer cents, quantities as integer
  * centi-units, discounts as integer percent (all `round(x*K)` ->
  * BIGINT micro-unit rule); the elasticity slope's cross products
  * n*Sxy - Sx*Sy overflow BIGINT at 100 TB row counts, so they
  * accumulate as DECIMAL(38,0) / HUGEINT; sqrt is IEEE-exact so the
  * Wilson interval is reproducible across engines given the identical
  * expression tree (shared literally via [[WilsonExprs]]); every
  * double is rounded on output only.
  */
object TradeOps {
  import Relational.Q

  private val RevCents =
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"

  // ---------------------------------------------------------------- q205
  /** Nation x nation trade flow: revenue and item count per (supplier
    * nation, customer nation) pair.
    */
  val q205: Q = (s, d) => {
    val li = Graft.table(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), expr(RevCents).as("cents"))
    val o = Graft.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = Graft.table(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = Graft.table(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val nat = Graft.table(s, d, "nation").select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .join(broadcast(nat.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .groupBy(col("supp_nation"), col("cust_nation"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation")
  }

  val q205Sql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  count(*) AS n_items,
       |  CAST(sum($RevCents) AS BIGINT) AS revenue_cents
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |GROUP BY 1, 2 ORDER BY supp_nation, cust_nation""".stripMargin

  // ---------------------------------------------------------------- q206
  /** Discount elasticity per brand: the least-squares slope of quantity
    * (integer centi-units) against discount (integer percent), closed
    * form over exact per-brand power sums; slope NULL when a brand saw
    * only one discount level (zero variance).
    */
  val q206: Q = (s, d) => {
    val li = Graft.table(s, d, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("x"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("y"))
    val part = Graft.table(s, d, "part").select(col("p_partkey"), col("p_brand"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .select(col("p_brand"), col("n"),
        round(col("sy").cast("double") / col("n") / lit(100.0), 6).as("mean_qty"),
        round(col("sx").cast("double") / col("n"), 6).as("mean_disc_pct"),
        expr("""round(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 END, 6)""")
          .as("slope_qty_per_pct"))
      .orderBy("p_brand")
  }

  val q206Sql: String =
    """WITH b AS (
      |  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(round(l.l_discount * 100) AS BIGINT)::HUGEINT) AS sx,
      |    sum(CAST(round(l.l_quantity * 100) AS BIGINT)::HUGEINT) AS sy,
      |    sum((CAST(round(l.l_discount * 100) AS BIGINT)
      |       * CAST(round(l.l_discount * 100) AS BIGINT))::HUGEINT) AS sxx,
      |    sum((CAST(round(l.l_discount * 100) AS BIGINT)
      |       * CAST(round(l.l_quantity * 100) AS BIGINT))::HUGEINT) AS sxy
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1)
      |SELECT p_brand, n,
      |  round(CAST(sy AS DOUBLE) / n / 100.0, 6) AS mean_qty,
      |  round(CAST(sx AS DOUBLE) / n, 6) AS mean_disc_pct,
      |  round(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
      |      / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 END, 6)
      |    AS slope_qty_per_pct
      |FROM b ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q207
  /** Order-size profile: group lineitem by order, then histogram orders
    * by item count — orders, revenue stats, and share per size.
    */
  val q207: Q = (s, d) => {
    val per = Graft.table(s, d, "lineitem")
      .select(col("l_orderkey"), expr(RevCents).as("cents"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("sz"), sum(col("cents")).as("ocents"))
    per.groupBy(col("sz"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("ocents")).as("revenue_cents"),
        min(col("ocents")).as("min_cents"), max(col("ocents")).as("max_cents"),
        round(sum(col("ocents")).cast("double") / count(lit(1)), 6)
          .as("mean_cents"))
      .orderBy("sz")
  }

  val q207Sql: String =
    s"""WITH per AS (
       |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS sz,
       |    CAST(sum($RevCents) AS BIGINT) AS ocents
       |  FROM lineitem GROUP BY 1)
       |SELECT sz, count(*) AS n_orders,
       |  CAST(sum(ocents) AS BIGINT) AS revenue_cents,
       |  CAST(min(ocents) AS BIGINT) AS min_cents,
       |  CAST(max(ocents) AS BIGINT) AS max_cents,
       |  round(CAST(sum(ocents) AS DOUBLE) / count(*), 6) AS mean_cents
       |FROM per GROUP BY 1 ORDER BY sz""".stripMargin

  // ---------------------------------------------------------------- q208
  /** Per-brand return rate with the Wilson 95% interval. The interval
    * expression is shared LITERALLY between the Spark plan and the
    * DuckDB oracle (same parse -> same double tree; sqrt is IEEE-exact),
    * so the rounded bounds are reproducible.
    */
  private val PHat = "(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
  private val WilsonCenter = s"($PHat + 3.8416 / (2.0 * n))"
  private val WilsonHalf =
    s"(1.96 * sqrt(($PHat * (1.0 - $PHat) + 3.8416 / (4.0 * n)) / n))"
  private val WilsonDen = "(1.0 + 3.8416 / n)"
  private val WilsonLow = s"round(($WilsonCenter - $WilsonHalf) / $WilsonDen, 6)"
  private val WilsonHigh = s"round(($WilsonCenter + $WilsonHalf) / $WilsonDen, 6)"

  val q208: Q = (s, d) => {
    val li = Graft.table(s, d, "lineitem")
      .select(col("l_partkey"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
    val part = Graft.table(s, d, "part").select(col("p_partkey"), col("p_brand"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("ret")).as("r"))
      .select(col("p_brand"), col("n"), col("r"),
        expr(s"round($PHat, 6)").as("return_rate"),
        expr(WilsonLow).as("wilson_low"),
        expr(WilsonHigh).as("wilson_high"))
      .orderBy("p_brand")
  }

  val q208Sql: String =
    s"""WITH b AS (
       |  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS r
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |  GROUP BY 1)
       |SELECT p_brand, n, r,
       |  round($PHat, 6) AS return_rate,
       |  $WilsonLow AS wilson_low,
       |  $WilsonHigh AS wilson_high
       |FROM b ORDER BY p_brand""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q205_trade_flow", q205, Some(q205Sql)),
    ("q206_discount_elasticity", q206, Some(q206Sql)),
    ("q207_order_size_profile", q207, Some(q207Sql)),
    ("q208_brand_return_ci", q208, Some(q208Sql)))
}
