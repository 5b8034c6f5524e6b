package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Business analytics depth (round 6, fifteenth pack): the order-book
  * readouts layered on the TPC-H-ish tables — monthly return rates and
  * revenue (q201), customer-LTV deciles (q202), supplier revenue
  * concentration (q203), and per-priority shipping-delay SLAs (q204).
  *
  * Scale notes (the 100 TB story): q201 is one map-side-combined
  * month rollup; q202's decile assignment uses the count-table
  * closed-form rank (cprev + within-tie rank, tie groups are tiny
  * partitions — q122's no-global-sort discipline); q203 ranks the
  * supplier-sized dimension table and derives HHI from exact decimal
  * squares; q204's percentiles are closed-form rank selections over
  * per-priority DELAY-VALUE count tables (delays span a bounded range
  * of days, so the count table is metadata regardless of row count).
  *
  * Exactness: money flows as exact integer cents
  * (round(x·100) → BIGINT, the micro-unit rule; all amounts positive);
  * delays are integer epoch-day differences (timestamps → us DIV
  * 86400000000, identical on both engines, negatives never divided);
  * ranks, deciles, and percentile selections are integer decisions;
  * means/shares are single divisions rounded on output.
  */
object BizOps {
  import Relational.Q

  private val RevCentsExpr =
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"

  // ---------------------------------------------------------------- q201
  /** Monthly return rate and net revenue: per ship-month, item count,
    * returned count ('R'), the return share, and exact revenue cents.
    */
  val q201: Q = (s, d) =>
    Graft.table(s, d, "lineitem")
      .select(year(col("l_shipdate")).as("yr"), month(col("l_shipdate")).as("mo"),
        col("l_returnflag"), expr(RevCentsExpr).as("cents"))
      .groupBy(col("yr"), col("mo"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(col("cents")).as("revenue_cents"))
      .select(col("yr").cast("long").as("yr"), col("mo").cast("long").as("mo"),
        col("n_items"), col("n_returned"),
        round(col("n_returned").cast("double") / col("n_items"), 6)
          .as("return_share"),
        col("revenue_cents"))
      .orderBy("yr", "mo")

  val q201Sql: String =
    s"""SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
       |  CAST(month(l_shipdate) AS BIGINT) AS mo,
       |  count(*) AS n_items,
       |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_returned,
       |  round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS return_share,
       |  CAST(sum($RevCentsExpr) AS BIGINT) AS revenue_cents
       |FROM lineitem GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin

  // ---------------------------------------------------------------- q202
  /** Customer-LTV deciles: per customer exact total order cents, rank
    * via the count-table closed form (cprev + within-tie rank by
    * custkey — no global sort), decile = ((rank−1)·10) DIV n; per
    * decile count, total, min/max, and mean.
    */
  val q202: Q = (s, d) => {
    // customer-sized (one row per customer) and feeds three consumers
    // (value counts, the total, the rank join): pin it so orders is
    // scanned once
    val cust = Graft.table(s, d, "orders")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("ltv"))
      .localCheckpoint(true)
    // two-level closed-form rank (q122's discipline): prefix counts
    // within ~1M-cent value superbuckets + a metadata-sized bucket-carry
    // table — no single task ever sorts the full customer value list
    val vc = cust.groupBy(expr("ltv DIV 1048576").as("vb"), col("ltv"))
      .agg(count(lit(1)).as("c"))
    val wInB = Window.partitionBy(col("vb")).orderBy(col("ltv"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bSums = vc.groupBy(col("vb")).agg(sum(col("c")).as("bc"))
    val wB = Window.orderBy(col("vb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bCarry = bSums
      .withColumn("carry", coalesce(sum(col("bc")).over(wB), lit(0L)))
      .select(col("vb"), col("carry"))
    val cprev = vc
      .withColumn("inprev", coalesce(sum(col("c")).over(wInB), lit(0L)))
      .join(broadcast(bCarry), Seq("vb"))
      .select(col("ltv"), (col("carry") + col("inprev")).as("cprev"))
    val tot = cust.agg(count(lit(1)).as("n"))
    val wTie = Window.partitionBy(col("ltv")).orderBy(col("o_custkey"))
    cust.join(cprev, Seq("ltv")).crossJoin(broadcast(tot))
      .withColumn("rk", col("cprev") + row_number().over(wTie))
      .withColumn("decile", expr("((rk - 1) * 10) DIV n"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("ltv")).as("total_cents"),
        min(col("ltv")).as("min_cents"), max(col("ltv")).as("max_cents"),
        round(sum(col("ltv")).cast("double") / count(lit(1)), 6).as("mean_cents"))
      .orderBy("decile")
  }

  val q202Sql: String =
    """WITH cust AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS ltv
      |  FROM orders GROUP BY 1),
      |vc AS (
      |  SELECT ltv, CAST(count(*) AS BIGINT) AS c,
      |    CAST(coalesce(sum(count(*)) OVER (ORDER BY ltv
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cprev
      |  FROM cust GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cust),
      |rk AS (
      |  SELECT c2.o_custkey, c2.ltv,
      |    v.cprev + row_number() OVER (PARTITION BY c2.ltv ORDER BY c2.o_custkey)
      |      AS rk, t.n
      |  FROM cust c2 JOIN vc v USING (ltv) CROSS JOIN t)
      |SELECT CAST(((rk - 1) * 10) // n AS BIGINT) AS decile,
      |  count(*) AS n_customers,
      |  CAST(sum(ltv) AS BIGINT) AS total_cents,
      |  CAST(min(ltv) AS BIGINT) AS min_cents, CAST(max(ltv) AS BIGINT) AS max_cents,
      |  round(CAST(sum(ltv) AS DOUBLE) / count(*), 6) AS mean_cents
      |FROM rk GROUP BY 1 ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- q203
  /** Supplier revenue concentration: the top-20 suppliers by exact
    * revenue cents with their shares, plus the supplier HHI (decimal
    * squares over the supplier-sized dimension table).
    */
  val q203: Q = (s, d) => {
    // supplier-sized and feeds both the totals fold and the rank window:
    // pin it so lineitem is scanned once
    val rev = Graft.table(s, d, "lineitem")
      .select(col("l_suppkey"), expr(RevCentsExpr).as("cents"))
      .groupBy(col("l_suppkey")).agg(sum(col("cents")).as("rev"))
      .localCheckpoint(true)
    val tot = rev.agg(
      sum(col("rev").cast("decimal(38,0)")).as("s_tot"),
      sum(col("rev").cast("decimal(38,0)") * col("rev").cast("decimal(38,0)"))
        .as("s_sq"))
    // top-20 via TakeOrderedAndProject (parallel per-partition top-K +
    // driver merge), then rank the 20-row result — no full-supplier
    // single-task sort window
    val w = Window.orderBy(col("rev").desc, col("l_suppkey"))
    rev.orderBy(col("rev").desc, col("l_suppkey")).limit(20)
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(tot))
      .select(col("rk"), col("l_suppkey"), col("rev").as("revenue_cents"),
        round(col("rev").cast("double") / col("s_tot").cast("double"), 6)
          .as("share"),
        round(col("s_sq").cast("double")
          / (col("s_tot") * col("s_tot")).cast("double"), 6).as("hhi"))
      .orderBy("rk")
  }

  val q203Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, CAST(sum($RevCentsExpr) AS BIGINT) AS rev
       |  FROM lineitem GROUP BY 1),
       |t AS (
       |  SELECT sum(rev::HUGEINT) AS s_tot, sum(rev::HUGEINT * rev::HUGEINT) AS s_sq
       |  FROM rev),
       |rk AS (
       |  SELECT l_suppkey, rev, row_number() OVER (
       |    ORDER BY rev DESC, l_suppkey) AS rk
       |  FROM rev)
       |SELECT CAST(r.rk AS INT) AS rk, r.l_suppkey, r.rev AS revenue_cents,
       |  round(CAST(r.rev AS DOUBLE) / CAST(t.s_tot AS DOUBLE), 6) AS share,
       |  round(CAST(t.s_sq AS DOUBLE) / CAST(t.s_tot * t.s_tot AS DOUBLE), 6) AS hhi
       |FROM rk r CROSS JOIN t WHERE r.rk <= 20 ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------- q204
  /** Per-priority shipping-delay SLA: delay = ship epoch-day − order
    * epoch-day (integer, possibly negative — the testdata's dates are
    * not causal); per order priority the exact mean, closed-form p50
    * and p90 over the delay-value count table, and min/max.
    */
  val q204: Q = (s, d) => {
    val li = Graft.table(s, d, "lineitem")
      .select(col("l_orderkey"), expr("unix_micros(l_shipdate) DIV 86400000000").as("sd"))
    val o = Graft.table(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(o_orderdate) DIV 86400000000").as("od"))
    val delays = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"), (col("sd") - col("od")).as("delay"))
    val cnt = delays.groupBy(col("priority"), col("delay"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("priority")).orderBy(col("delay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("priority"))
    cnt
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("priority"))
      .agg(max(col("n")).as("n"),
        round(sum(col("delay") * col("c")).cast("double") / max(col("n")), 6)
          .as("mean_delay"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("delay"))).as("p50"),
        min(when(col("cum") >= least(col("n"), expr("(9 * (n + 1)) DIV 10")),
          col("delay"))).as("p90"),
        min(col("delay")).as("min_delay"), max(col("delay")).as("max_delay"))
      .orderBy("priority")
  }

  val q204Sql: String =
    """WITH delays AS (
      |  SELECT o.o_orderpriority AS priority,
      |    epoch_us(l.l_shipdate) // 86400000000
      |      - epoch_us(o.o_orderdate) // 86400000000 AS delay
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |cnt AS (
      |  SELECT priority, delay, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(count(*)) OVER (PARTITION BY priority ORDER BY delay
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(count(*)) OVER (PARTITION BY priority) AS BIGINT) AS n
      |  FROM delays GROUP BY 1, 2)
      |SELECT priority, CAST(max(n) AS BIGINT) AS n,
      |  round(CAST(sum(delay * c) AS DOUBLE) / max(n), 6) AS mean_delay,
      |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN delay END) AS BIGINT) AS p50,
      |  CAST(min(CASE WHEN cum >= least(n, (9 * (n + 1)) // 10) THEN delay END)
      |    AS BIGINT) AS p90,
      |  CAST(min(delay) AS BIGINT) AS min_delay,
      |  CAST(max(delay) AS BIGINT) AS max_delay
      |FROM cnt GROUP BY 1 ORDER BY priority""".stripMargin

  // ---------------------------------------------------------------- q273
  /** Customer quadrant analysis (round 7): customers split by
    * above/below-MEAN account balance × above/below-mean total spend —
    * the classic value-vs-liquidity 2×2. Mean splits keep every
    * decision integer: "above mean" is the cross-multiplication
    * bal_cents·n ≥ Σbal_cents (no division, no double); spend is the
    * exact-cents order rollup with no-order customers at 0. One
    * customer-key join, one 1-row totals broadcast, 4-row output.
    */
  val q273: Q = (s, d) => {
    val c = Graft.table(s, d, "customer")
      .select(col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))
    val o = Graft.table(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sp"))
    val j = c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("bal_c"), coalesce(col("sp"), lit(0L)).as("sp_c"))
    val tot = j.agg(count(lit(1)).as("n"), sum(col("bal_c")).as("tb"),
      sum(col("sp_c")).as("ts"))
    j.crossJoin(broadcast(tot))
      .withColumn("hi_bal", when(col("bal_c") * col("n") >= col("tb"), 1).otherwise(0))
      .withColumn("hi_spend", when(col("sp_c") * col("n") >= col("ts"), 1).otherwise(0))
      .groupBy(col("hi_bal"), col("hi_spend"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("bal_c")).as("sum_bal_cents"),
        sum(col("sp_c")).as("sum_spend_cents"))
      .orderBy(col("hi_bal").desc, col("hi_spend").desc)
  }

  val q273Sql: String =
    """WITH c AS (
      |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      |  FROM customer),
      |o AS (
      |  SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sp
      |  FROM orders GROUP BY 1),
      |j AS (
      |  SELECT c.c_custkey, c.bal_c, COALESCE(o.sp, 0) AS sp_c
      |  FROM c LEFT JOIN o ON c.c_custkey = o.o_custkey),
      |tot AS (
      |  SELECT count(*) AS n, CAST(sum(bal_c) AS BIGINT) AS tb,
      |    CAST(sum(sp_c) AS BIGINT) AS ts
      |  FROM j),
      |q AS (
      |  SELECT j.*, CASE WHEN j.bal_c * tot.n >= tot.tb THEN 1 ELSE 0 END AS hi_bal,
      |    CASE WHEN j.sp_c * tot.n >= tot.ts THEN 1 ELSE 0 END AS hi_spend
      |  FROM j, tot)
      |SELECT hi_bal, hi_spend, count(*) AS n_customers,
      |  CAST(sum(bal_c) AS BIGINT) AS sum_bal_cents,
      |  CAST(sum(sp_c) AS BIGINT) AS sum_spend_cents
      |FROM q GROUP BY 1, 2 ORDER BY hi_bal DESC, hi_spend DESC""".stripMargin

  // ---------------------------------------------------------------- q276
  /** Share-of-parent hierarchy report (round 7): order revenue rolled
    * region → nation with each nation's share of its region and of the
    * world — the percent-of-parent drill-down q11's rollup counts
    * don't carry. One fact aggregation to the customer key, dimension
    * joins broadcast, then every rollup/join runs on the ≤25-row
    * nation table. Exact cents; shares are single divisions rounded on
    * output.
    */
  val q276: Q = (s, d) => {
    val cust = Graft.table(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val nat = Graft.table(s, d, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = Graft.table(s, d, "region").select(col("r_regionkey"), col("r_name"))
    val natRev = Graft.table(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey")).agg(sum(col("cents")).as("nation_cents"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("nation_cents"))
    val regRev = natRev.groupBy(col("region")).agg(sum(col("nation_cents")).as("region_cents"))
    val tot = natRev.agg(sum(col("nation_cents")).as("global_cents"))
    natRev.join(broadcast(regRev), Seq("region")).crossJoin(broadcast(tot))
      .select(col("region"), col("nation"), col("nation_cents"),
        col("region_cents"), col("global_cents"),
        round(col("nation_cents").cast("double") / col("region_cents"), 6)
          .as("share_of_region"),
        round(col("nation_cents").cast("double") / col("global_cents"), 6)
          .as("share_of_global"))
      .orderBy("region", "nation")
  }

  val q276Sql: String =
    """WITH cr AS (
      |  SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |nr AS (
      |  SELECT r.r_name AS region, n.n_name AS nation,
      |    CAST(sum(cr.cents) AS BIGINT) AS nation_cents
      |  FROM cr JOIN customer c ON cr.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2),
      |rr AS (
      |  SELECT region, CAST(sum(nation_cents) AS BIGINT) AS region_cents
      |  FROM nr GROUP BY 1),
      |t AS (SELECT CAST(sum(nation_cents) AS BIGINT) AS global_cents FROM nr)
      |SELECT nr.region, nr.nation, nr.nation_cents, rr.region_cents, t.global_cents,
      |  round(CAST(nr.nation_cents AS DOUBLE) / rr.region_cents, 6) AS share_of_region,
      |  round(CAST(nr.nation_cents AS DOUBLE) / t.global_cents, 6) AS share_of_global
      |FROM nr JOIN rr USING (region) CROSS JOIN t
      |ORDER BY region, nation""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q201_monthly_returns", q201, Some(q201Sql)),
    ("q202_ltv_deciles", q202, Some(q202Sql)),
    ("q203_supplier_concentration", q203, Some(q203Sql)),
    ("q204_priority_sla", q204, Some(q204Sql)),
    ("q273_customer_quadrants", q273, Some(q273Sql)),
    ("q276_share_of_parent", q276, Some(q276Sql)))
}
