package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Customer-lifecycle analytics (round 6, eighteenth pack): survival
  * and attribution — the Kaplan–Meier curve over inter-purchase gaps
  * with right-censoring (q213), the Nelson–Aalen discrete hazard
  * (q214), linear multi-touch attribution with exact integer credit
  * splitting (q215), and the first-vs-last-touch model comparison
  * (q216).
  *
  * Scale notes (the 100 TB story): q213/q214 reduce the event stream
  * to a GAP-DAY count table (bounded by the observation span in days,
  * metadata regardless of row count) in one per-user pass; the
  * survival product and cumulative hazard are in-order array folds
  * over that metadata table collected to a single row (the bounded-
  * collect pattern, q99's rule). q215/q216 join purchases to touches
  * as a per-user equi-join with a two-sided 7-day range bound — state
  * is bounded by per-user 7-day activity (the q128/q132 firehose
  * caveat applies to a single pathological user and is documented, not
  * materialized per-key history). The per-purchase windows order at
  * most one purchase's touch set.
  *
  * Exactness: gaps and censor times are integer epoch-day differences;
  * risk sets and death/censor counts are integers (n_t = total − cprev
  * closed form); the KM product and NA sum are left folds in gap order
  * over doubles derived from exact integer ratios — Spark's
  * `aggregate(slice(...))` ≙ DuckDB's `list_reduce(l[1:i])` multiply/add
  * in the identical order (1.0·x ≡ x, 0.0+x ≡ x in IEEE), rounded on
  * output. q215 splits purchase micro-value exactly: each touch gets
  * vm DIV k and the remainder vm % k goes to the EARLIEST touch
  * (ties by event id) — an integer decision, no double credit sums.
  * Hours-of-day come from epoch micros (us DIV 3.6e9 % 24), identical
  * on both engines; all inputs are non-negative so DIV ≡ // here.
  */
object LifecycleOps {
  import Relational.Q

  private val DayUs = 86400000000L
  private val WeekUs = 7L * DayUs

  // ------------------------------------------------------- gap table
  /** Per-gap rows: t = days to next purchase (observed, dth=1) or days
    * from the last purchase to the corpus horizon (censored, dth=0).
    * Memoized — feeds q213 and q214.
    */
  private val gapsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def gapTable(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(gapsMemo, s, d) {
      val ev = Graft.events(s, d)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
      val horizon = ev.agg(expr(s"max(us DIV $DayUs)").as("maxday"))
      val w = Window.partitionBy(col("u")).orderBy(col("us"), col("event_id"))
      val gaps = ev.where(col("event_type") === "purchase")
        .withColumn("day", expr(s"us DIV $DayUs"))
        .withColumn("nd", lead(col("day"), 1).over(w))
        .crossJoin(broadcast(horizon))
        .select(
          when(col("nd").isNull, col("maxday") - col("day"))
            .otherwise(col("nd") - col("day")).as("t"),
          when(col("nd").isNull, 0L).otherwise(1L).as("dth"))
      // gap-day count table with the closed-form risk set
      // n_t = total − (# gaps with s < t); span-bounded => metadata,
      // so the un-partitioned prefix window is a bounded single task
      val cnt = gaps.groupBy(col("t"))
        .agg(sum(col("dth")).as("d"), sum(lit(1L) - col("dth")).as("c"))
      val tot = gaps.agg(count(lit(1)).as("ntot"))
      val wPrev = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      cnt.crossJoin(broadcast(tot))
        .withColumn("cprev",
          coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
        .withColumn("n", col("ntot") - col("cprev"))
        .select(col("t"), col("d"), col("c"), col("n"))
        .localCheckpoint(true)
    }

  private val GapSqlCte: String =
    s"""ev AS (
       |  SELECT user_id AS u, epoch_us(ts) AS us, event_id, event_type
       |  FROM events),
       |mx AS (SELECT max(us // $DayUs) AS maxday FROM ev),
       |pur AS (
       |  SELECT u, us // $DayUs AS day,
       |    lead(us // $DayUs) OVER (PARTITION BY u ORDER BY us, event_id) AS nd
       |  FROM ev WHERE event_type = 'purchase'),
       |gaps AS (
       |  SELECT CASE WHEN nd IS NULL THEN mx.maxday - day ELSE nd - day END AS t,
       |    CASE WHEN nd IS NULL THEN 0 ELSE 1 END AS dth
       |  FROM pur CROSS JOIN mx),
       |cnt AS (
       |  SELECT t, CAST(sum(dth) AS BIGINT) AS d,
       |    CAST(sum(1 - dth) AS BIGINT) AS c
       |  FROM gaps GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM gaps),
       |tbl AS MATERIALIZED (
       |  SELECT t, d, c,
       |    ntot - CAST(coalesce(sum(d + c) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS n
       |  FROM cnt CROSS JOIN tot)""".stripMargin

  // ---------------------------------------------------------------- q213
  /** Kaplan–Meier survival over inter-purchase gaps: for each gap
    * length with observed deaths, the risk set, deaths, censored
    * count, and KM = the in-order product of (1 − d/n).
    */
  val q213: Q = (s, d) => {
    val deaths = gapTable(s, d).where(col("d") > 0)
      .select(struct(col("t"), col("d"), col("c"), col("n")).as("s"))
    deaths.agg(sort_array(collect_list(col("s"))).as("a"))
      .select(col("a"), posexplode(col("a")).as(Seq("i", "s")))
      .select(col("s.t").as("gap_days"), col("s.n").as("n_at_risk"),
        col("s.d").as("deaths"), col("s.c").as("censored_here"),
        expr("""round(aggregate(
                  transform(slice(a, 1, i + 1),
                    x -> 1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)),
                  CAST(1.0 AS DOUBLE), (acc, f) -> acc * f), 6)""").as("km"))
      .orderBy("gap_days")
  }

  val q213Sql: String =
    s"""WITH $GapSqlCte,
       |deaths AS (SELECT t, d, c, n FROM tbl WHERE d > 0),
       |arr AS (
       |  SELECT list(struct_pack(t := t, d := d, c := c, n := n) ORDER BY t)
       |    AS a
       |  FROM deaths),
       |ex AS (
       |  SELECT unnest(a) AS s, generate_subscripts(a, 1) AS i, a FROM arr)
       |SELECT s.t AS gap_days, s.n AS n_at_risk, s.d AS deaths,
       |  s.c AS censored_here,
       |  round(list_reduce(
       |    list_transform(a[1:i],
       |      x -> 1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)),
       |    (acc, f) -> acc * f), 6) AS km
       |FROM ex ORDER BY gap_days""".stripMargin

  // ---------------------------------------------------------------- q214
  /** Nelson–Aalen: discrete hazard d/n per death gap and the in-order
    * cumulative hazard sum.
    */
  val q214: Q = (s, d) => {
    val deaths = gapTable(s, d).where(col("d") > 0)
      .select(struct(col("t"), col("d"), col("n")).as("s"))
    deaths.agg(sort_array(collect_list(col("s"))).as("a"))
      .select(col("a"), posexplode(col("a")).as(Seq("i", "s")))
      .select(col("s.t").as("gap_days"), col("s.n").as("n_at_risk"),
        col("s.d").as("deaths"),
        expr("round(CAST(s.d AS DOUBLE) / CAST(s.n AS DOUBLE), 6)")
          .as("hazard"),
        expr("""round(aggregate(
                  transform(slice(a, 1, i + 1),
                    x -> CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)),
                  CAST(0.0 AS DOUBLE), (acc, h) -> acc + h), 6)""")
          .as("cum_hazard"))
      .orderBy("gap_days")
  }

  val q214Sql: String =
    s"""WITH $GapSqlCte,
       |deaths AS (SELECT t, d, n FROM tbl WHERE d > 0),
       |arr AS (
       |  SELECT list(struct_pack(t := t, d := d, n := n) ORDER BY t) AS a
       |  FROM deaths),
       |ex AS (
       |  SELECT unnest(a) AS s, generate_subscripts(a, 1) AS i, a FROM arr)
       |SELECT s.t AS gap_days, s.n AS n_at_risk, s.d AS deaths,
       |  round(CAST(s.d AS DOUBLE) / CAST(s.n AS DOUBLE), 6) AS hazard,
       |  round(list_reduce(
       |    list_transform(a[1:i], x -> CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)),
       |    (acc, h) -> acc + h), 6) AS cum_hazard
       |FROM ex ORDER BY gap_days""".stripMargin

  // ------------------------------------------------ touch pair table
  /** Purchase → prior-7-day touch pairs (view/click), with the touch's
    * within-purchase position and the touch count k. Memoized — feeds
    * q215 and q216. Per-user equi-join with a two-sided range bound;
    * the per-purchase window orders one purchase's 7-day touch set.
    */
  private val touchMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def touchPairs(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(touchMemo, s, d) {
      val ev = Graft.events(s, d)
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      val pur = ev.where(col("event_type") === "purchase")
        .select(col("u"), col("us").as("pus"), col("event_id").as("pid"),
          col("vm"))
      val tch = ev.where(col("event_type").isin("view", "click"))
        .select(col("u").as("tu"), col("us").as("tus"),
          col("event_id").as("tid"), col("event_type").as("touch_type"))
      val wPos = Window.partitionBy(col("pid")).orderBy(col("tus"), col("tid"))
      pur.join(tch,
          col("u") === col("tu") &&
            col("tus") >= col("pus") - lit(WeekUs) && col("tus") < col("pus"))
        .withColumn("rn", row_number().over(wPos))
        .withColumn("k", count(lit(1)).over(Window.partitionBy(col("pid"))))
        .localCheckpoint(true)
    }

  private val TouchSqlCte: String =
    s"""ev AS (
       |  SELECT user_id AS u, epoch_us(ts) AS us, event_id, event_type,
       |    CAST(round(value * 1000000) AS BIGINT) AS vm
       |  FROM events),
       |pur AS (
       |  SELECT u, us AS pus, event_id AS pid, vm FROM ev
       |  WHERE event_type = 'purchase'),
       |tch AS (
       |  SELECT u AS tu, us AS tus, event_id AS tid, event_type AS touch_type
       |  FROM ev WHERE event_type IN ('view', 'click')),
       |pairs AS MATERIALIZED (
       |  SELECT p.pid, p.vm, t.touch_type, t.tus, t.tid,
       |    row_number() OVER (PARTITION BY p.pid ORDER BY t.tus, t.tid) AS rn,
       |    count(*) OVER (PARTITION BY p.pid) AS k
       |  FROM pur p JOIN tch t ON t.tu = p.u
       |    AND t.tus >= p.pus - $WeekUs AND t.tus < p.pus)""".stripMargin

  // ---------------------------------------------------------------- q215
  /** Linear multi-touch attribution: each purchase's micro-value is
    * split exactly across its prior-week touches — vm DIV k each, the
    * remainder vm % k to the earliest touch — and credited micro-value
    * is rolled up by touch type and hour-of-day.
    */
  val q215: Q = (s, d) =>
    touchPairs(s, d)
      .withColumn("credit",
        expr("vm DIV k") + when(col("rn") === 1, expr("vm % k")).otherwise(0L))
      .groupBy(col("touch_type"),
        expr("(tus DIV 3600000000) % 24").as("hour"))
      .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("credited_micro"))
      .orderBy("touch_type", "hour")

  val q215Sql: String =
    s"""WITH $TouchSqlCte
       |SELECT touch_type, (tus // 3600000000) % 24 AS hour,
       |  count(*) AS n_touches,
       |  CAST(sum(vm // k + CASE WHEN rn = 1 THEN vm % k ELSE 0 END) AS BIGINT)
       |    AS credited_micro
       |FROM pairs GROUP BY 1, 2 ORDER BY touch_type, hour""".stripMargin

  // ---------------------------------------------------------------- q216
  /** First-touch vs last-touch model comparison: per touch type, how
    * many purchases (and how much micro-value) each model attributes
    * to it.
    */
  val q216: Q = (s, d) => {
    val p = touchPairs(s, d)
    val first = p.where(col("rn") === 1)
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("first_touch_purchases"),
        sum(col("vm")).as("first_touch_micro"))
    val last = p.where(col("rn") === col("k"))
      .groupBy(col("touch_type").as("lt"))
      .agg(count(lit(1)).as("last_touch_purchases"),
        sum(col("vm")).as("last_touch_micro"))
    first.join(last, col("touch_type") === col("lt"), "full_outer")
      .select(coalesce(col("touch_type"), col("lt")).as("touch_type"),
        coalesce(col("first_touch_purchases"), lit(0L))
          .as("first_touch_purchases"),
        coalesce(col("first_touch_micro"), lit(0L)).as("first_touch_micro"),
        coalesce(col("last_touch_purchases"), lit(0L))
          .as("last_touch_purchases"),
        coalesce(col("last_touch_micro"), lit(0L)).as("last_touch_micro"))
      .orderBy("touch_type")
  }

  val q216Sql: String =
    s"""WITH $TouchSqlCte,
       |f AS (
       |  SELECT touch_type, count(*) AS fp, CAST(sum(vm) AS BIGINT) AS fv
       |  FROM pairs WHERE rn = 1 GROUP BY 1),
       |l AS (
       |  SELECT touch_type AS lt, count(*) AS lp, CAST(sum(vm) AS BIGINT) AS lv
       |  FROM pairs WHERE rn = k GROUP BY 1)
       |SELECT coalesce(f.touch_type, l.lt) AS touch_type,
       |  CAST(coalesce(f.fp, 0) AS BIGINT) AS first_touch_purchases,
       |  CAST(coalesce(f.fv, 0) AS BIGINT) AS first_touch_micro,
       |  CAST(coalesce(l.lp, 0) AS BIGINT) AS last_touch_purchases,
       |  CAST(coalesce(l.lv, 0) AS BIGINT) AS last_touch_micro
       |FROM f FULL OUTER JOIN l ON f.touch_type = l.lt
       |ORDER BY touch_type""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q213_kaplan_meier", q213, Some(q213Sql)),
    ("q214_nelson_aalen", q214, Some(q214Sql)),
    ("q215_linear_attribution", q215, Some(q215Sql)),
    ("q216_first_last_touch", q216, Some(q216Sql)))
}
