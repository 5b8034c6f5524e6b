package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Advanced relational pack: pivot, grouping sets, full-outer join, as-of
  * join, range-band join, correlated subqueries, array/lambda functions,
  * exact percentiles, approximate sketches, stratified sampling.
  *
  * The as-of join is the union-plus-window formulation (one shuffle on the
  * key, no join explosion): tag both sides, sort by time within key, carry
  * the last order forward with last(ignoreNulls) — the shape that survives
  * 100 TB because the state per key is one row, never a cross product.
  */
object Advanced {
  import Relational.Q

  private def dec(c: Column, scale: Int = 4): Column = c.cast(s"decimal(18,$scale)")

  // ---------------------------------------------------------------- q35
  /** Pivot: order count + revenue per year, one column set per status. */
  val q35: Q = (s, d) =>
    Graft.table(s, d, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(dec(col("o_totalprice"))).cast("double"))
      .select(
        col("yr"),
        coalesce(col("F"), lit(0.0)).as("f_price"),
        coalesce(col("O"), lit(0.0)).as("o_price"),
        coalesce(col("P"), lit(0.0)).as("p_price"))
      .orderBy("yr")

  val q35Sql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  COALESCE(CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS f_price,
      |  COALESCE(CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS o_price,
      |  COALESCE(CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS p_price
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Grouping sets (beyond rollup/cube): independent status and priority
    * margins in one pass.
    */
  val q36: Q = (s, d) =>
    // Dataset groupingSets (Spark 4): no temp view, so no session-global
    // name for two concurrent callers with different data dirs to race on
    Graft.table(s, d, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        col("n"), col("sum_price"))
      .orderBy("status", "prio")

  val q36Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS prio,
      |  count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, prio""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Full outer join: every customer and every order-cohort, matched or
    * not. The orders side is pre-aggregated so the join carries one row
    * per key (and AQE can pick a broadcast at small SF).
    */
  val q37: Q = (s, d) => {
    val spend = Graft.table(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(dec(col("o_totalprice"))).cast("double").as("spend"))
    Graft.table(s, d, "customer")
      .join(spend, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
      .orderBy("custkey")
  }

  val q37Sql: String =
    """SELECT COALESCE(c_custkey, o_custkey) AS custkey,
      |  COALESCE(n_orders, 0) AS n_orders, COALESCE(spend, 0.0) AS spend
      |FROM customer
      |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
      |                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
      |                 FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- q38
  /** As-of join: each event matched to the latest order (by order date,
    * ties to the highest orderkey) of the same user at or before the
    * event. Union + window: one shuffle, O(1) state per key.
    */
  val q38: Q = (s, d) => {
    val ord = Graft.table(s, d, "orders").select(
      col("o_custkey").as("uid"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
      lit(1).as("is_order"),
      col("o_orderkey"),
      lit(null).cast("long").as("event_id"))
    val evs = Graft.events(s, d).select(
      col("user_id").as("uid"),
      unix_micros(col("ts")).as("t"),
      lit(0).as("is_order"),
      lit(null).cast("long").as("o_orderkey"),
      col("event_id"))
    val w = Window.partitionBy(col("uid"))
      .orderBy(col("t").asc, col("is_order").desc, col("o_orderkey").asc_nulls_last,
        col("event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(evs)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .where(col("is_order") === 0)
      .select(col("event_id"), col("uid").as("user_id"), col("asof_orderkey"))
      .orderBy("event_id")
  }

  val q38Sql: String =
    """WITH u AS (
      |  SELECT o_custkey AS uid, epoch_us(o_orderdate) AS t, 1 AS is_order,
      |         o_orderkey, CAST(NULL AS BIGINT) AS event_id FROM orders
      |  UNION ALL
      |  SELECT user_id, epoch_us(ts), 0, CAST(NULL AS BIGINT), event_id FROM events
      |), w AS (
      |  SELECT *, last_value(o_orderkey IGNORE NULLS) OVER (
      |      PARTITION BY uid
      |      ORDER BY t ASC, is_order DESC, o_orderkey ASC NULLS LAST, event_id ASC NULLS LAST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey
      |  FROM u
      |)
      |SELECT event_id, uid AS user_id, asof_orderkey FROM w
      |WHERE is_order = 0 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Range-band join: line items shipped within 60 days of their order's
    * date. The equi key (orderkey) carries the join; the band is a
    * post-join filter, so this stays a plain shuffled/broadcast hash join
    * rather than an O(n*m) interval product.
    */
  val q39: Q = (s, d) => {
    val o = Graft.table(s, d, "orders")
    val l = Graft.table(s, d, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= date_add(col("o_orderdate"), 60))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val q39Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Correlated subquery semantics: customers richer than their nation's
    * average balance. Decorrelated by hand into an aggregate + broadcast
    * join (what Catalyst does to the SQL form anyway).
    */
  val q40: Q = (s, d) => {
    val c = Graft.table(s, d, "customer")
    val natAvg = c.groupBy(col("c_nationkey").as("nk"))
      .agg(avg(col("c_acctbal")).as("nat_avg"))
    c.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
      .where(col("c_acctbal") > col("nat_avg"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("nat_avg"))
      .orderBy("c_custkey")
  }

  val q40Sql: String =
    """SELECT c_custkey, c_name, c_acctbal,
      |  (SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) AS nat_avg
      |FROM customer c
      |WHERE c_acctbal > (SELECT AVG(c3.c_acctbal) FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q41
  /** Array construction + lambda functions over part names. */
  val q41: Q = (s, d) =>
    Graft.table(s, d, "part")
      .withColumn("toks", split(col("p_name"), " "))
      .select(
        col("p_partkey"),
        size(col("toks")).cast("long").as("n_toks"),
        element_at(col("toks"), 1).as("first_tok"),
        array_join(array_sort(col("toks")), ",").as("sorted_toks"),
        size(expr("filter(toks, x -> x LIKE '%a%')")).cast("long").as("n_with_a"),
        array_contains(col("toks"), "green").as("has_green"))
      .orderBy("p_partkey")

  val q41Sql: String =
    """SELECT p_partkey,
      |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_toks,
      |  string_split(p_name, ' ')[1] AS first_tok,
      |  array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_toks,
      |  CAST(len(list_filter(string_split(p_name, ' '), x -> x LIKE '%a%')) AS BIGINT) AS n_with_a,
      |  list_contains(string_split(p_name, ' '), 'green') AS has_green
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q42
  /** Exact interpolated percentiles (median / p90) — Spark `percentile`
    * and DuckDB `quantile_cont` share the linear-interpolation formula.
    */
  val q42: Q = (s, d) =>
    Graft.table(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.5)").as("median_price"))
      .orderBy("l_returnflag")

  val q42Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  quantile_cont(l_extendedprice, 0.5) AS median_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Approximate sketches: HLL distinct + t-digest-style percentile,
    * emitted NEXT TO the exact values and accuracy flags. The sketch
    * estimates are algorithm-specific (no SQL engine reproduces them), so
    * Verify dumps them as a fixture parquet; the DuckDB oracle computes
    * the EXACT values itself and re-derives the accuracy flags — an
    * independent engine asserting that the sketches landed within their
    * error budgets (HLL rsd 0.02 checked at 5x slack; the 1000-bucket
    * percentile sketch within two quantity units of the true median).
    */
  /** The sketch aggregation, alone — shared verbatim by q43 and the Verify
    * fixture dump. percentile_approx's result depends on partial-merge
    * order, i.e. on the physical plan shape: folding it into one Aggregate
    * with countDistinct (which plans an expand + two-phase distinct) gave
    * the fixture a DIFFERENT estimate than the query at sf0.1. Keeping the
    * sketch in its own aggregation makes both executions plan-identical.
    */
  private[graft] def sketchVals(s: SparkSession, d: String): DataFrame =
    Graft.table(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("approx_median"))

  val q43: Q = (s, d) => {
    val exact = Graft.table(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        expr("percentile(l_quantity, 0.5)").as("exact_median"))
    exact.join(sketchVals(s, d), "l_returnflag")
      .select(
        col("l_returnflag"),
        col("exact_parts"),
        col("approx_parts"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= col("exact_parts") * 0.1).as("hll_ok"),
        col("approx_median"),
        (abs(col("approx_median") - col("exact_median")) <= 2.0).as("median_ok"))
      .orderBy("l_returnflag")
  }

  val q43Sql: String =
    """WITH f AS (
      |  SELECT l_returnflag, approx_parts, approx_median
      |  FROM read_parquet('/tmp/graft_fixtures/sketch_vals/*.parquet')),
      |e AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |    quantile_cont(l_quantity, 0.5) AS exact_median
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT e.l_returnflag, e.exact_parts, f.approx_parts,
      |  abs(f.approx_parts - e.exact_parts) <= e.exact_parts * 0.1 AS hll_ok,
      |  f.approx_median,
      |  abs(f.approx_median - e.exact_median) <= 2.0 AS median_ok
      |FROM e JOIN f USING (l_returnflag) ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Deterministic stratified sample: ~10% of each return flag via a hash
    * gate on the row key — reproducible across runs and cluster sizes
    * (unlike `sample()`, whose output depends on partitioning). The gate
    * hash is the engine's own murmur3 token, which also makes the query
    * oracle-checkable: Verify dumps the per-row-key hash as a fixture
    * parquet and the DuckDB oracle re-applies the gate + stratified
    * aggregation itself.
    */
  val q44: Q = (s, d) =>
    Graft.table(s, d, "lineitem")
      // null keys are excluded from the sample, matching the oracle's
      // inner join (concat_ws would silently skip a null component and
      // alias differently-shaped keys onto one token)
      .where(col("l_orderkey").isNotNull && col("l_linenumber").isNotNull &&
        pmod(graft.functions.murmur3_token(
          concat_ws("-", col("l_orderkey"), col("l_linenumber"))), lit(10)) === 0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("l_returnflag")

  val q44Sql: String =
    """WITH h AS (
      |  SELECT l_orderkey, l_linenumber, token
      |  FROM read_parquet('/tmp/graft_fixtures/lineitem_tokens/*.parquet'))
      |SELECT l_returnflag, COUNT(*) AS n_sampled
      |FROM lineitem JOIN h USING (l_orderkey, l_linenumber)
      |WHERE ((token % 10) + 10) % 10 = 0
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q78
  /** Misra-Gries heavy hitters under the oracle gate — the hot-key
    * detector that feeds q69's salting decision: k counters over a
    * power-law key stream, any key with frequency > n/k GUARANTEED in
    * the summary at O(k) space (`MisraGriesAgg`; map-side combined, the
    * shuffle carries one k-entry map per partition — this is the shape
    * that finds skew in a 100 TB key column without a full groupBy).
    *
    * The key stream is a deterministic power law both engines derive
    * with the SAME CASE expression (key kj selects event_ids whose
    * lowest set bit is bit j — mass halves per level, so decrements
    * actually occur: 13 distinct keys vs 6 counters). The output is the
    * guaranteed set (exact count · k > n) with its exact counts and the
    * sketch-containment flag; the oracle recomputes the exact side and
    * emits TRUE — if MG ever dropped a guaranteed key, the flag goes
    * false and the hash comparison fails. Estimated counts stay
    * internal: they are merge-order-dependent, only the ±n/k bound is
    * contractual (AdvancedSpec asserts it).
    */
  private[graft] val hhCapacity = 6

  private[graft] val hhKeyCase: String = {
    val whens = (0 until 12)
      .map(j => s"WHEN event_id % ${1L << (j + 1)} = ${1L << j} THEN 'k$j'")
      .mkString(" ")
    s"CASE $whens ELSE 'k12' END"
  }

  /** The MG summary alone (shared by q78 and AdvancedSpec). */
  private[graft] def hhSummary(s: SparkSession, d: String): Map[String, Long] = {
    import s.implicits._
    Graft.events(s, d).selectExpr(s"$hhKeyCase AS hh_key")
      .as[String]
      .select(new MisraGriesAgg(hhCapacity).toColumn)
      .head()
  }

  val q78: Q = (s, d) => {
    val keys = Graft.events(s, d).selectExpr(s"$hhKeyCase AS hh_key")
    // total derives from the (13-row) aggregated counts — no third pass
    // over the event table (summary + counts = the only corpus scans)
    val counts = keys.groupBy(col("hh_key")).agg(count(lit(1)).as("n")).cache()
    val total = counts.agg(sum(col("n"))).head().getLong(0)
    val summary = hhSummary(s, d)
    counts
      .where(col("n") * hhCapacity > total)
      .withColumn("in_sketch", col("hh_key").isin(summary.keys.toSeq: _*))
      .orderBy("hh_key")
  }

  val q78Sql: String =
    s"""WITH k AS (SELECT $hhKeyCase AS hh_key FROM events),
       |c AS (SELECT hh_key, count(*) AS n FROM k GROUP BY 1),
       |t AS (SELECT count(*) AS total FROM events)
       |SELECT hh_key, n, TRUE AS in_sketch
       |FROM c CROSS JOIN t WHERE n * $hhCapacity > total
       |ORDER BY hh_key""".stripMargin

  // ---------------------------------------------------------------- q81
  /** Robust outlier detection per group — median/MAD, the data-QA gate
    * feature pipelines run before training (robust to the outliers it
    * hunts, unlike z-scores): a value is an outlier when its absolute
    * deviation from the group median exceeds 3 × the median absolute
    * deviation. Exact percentiles only (the q42 precedent: Spark
    * `percentile` ≡ DuckDB `quantile_cont` interpolation), deviations
    * and comparisons are deterministic double arithmetic — so counts,
    * median and MAD are all hash-exact with NO rounding. Two grouped
    * exact-percentile passes + one broadcast-size join back; at 100 TB
    * exact percentile is the only sort-heavy step, and it shuffles once
    * per group key (the approx path is q43's sketch).
    */
  val q81: Q = (s, d) => {
    val e = Graft.events(s, d).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(first(col("med")).as("med"), expr("percentile(adev, 0.5)").as("mad"))
    dev.drop("med").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L)).as("n_outliers"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"))
      .orderBy("event_type")
  }

  val q81Sql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, e.value, med.med, abs(e.value - med.med) AS adev
      |  FROM events e JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type, any_value(med) AS med,
      |    quantile_cont(adev, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers,
      |  any_value(m.med) AS med, any_value(m.mad) AS mad
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q35_pivot", q35, Some(q35Sql)),
    ("q36_grouping_sets", q36, Some(q36Sql)),
    ("q37_full_outer", q37, Some(q37Sql)),
    ("q38_asof_join", q38, Some(q38Sql)),
    ("q39_range_band_join", q39, Some(q39Sql)),
    ("q40_correlated_sub", q40, Some(q40Sql)),
    ("q41_array_funcs", q41, Some(q41Sql)),
    ("q42_percentiles", q42, Some(q42Sql)),
    ("q43_approx_sketches", q43, Some(q43Sql)),
    ("q44_stratified_sample", q44, Some(q44Sql)),
    ("q78_heavy_hitters", q78, Some(q78Sql)),
    ("q81_outlier_mad", q81, Some(q81Sql))
  )
}
