package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Forecasting (round 6, nineteenth pack): classical per-series
  * smoothing and honesty checks over the per-(event type, day) count
  * series — Holt linear smoothing with a 1/7-day-ahead forecast
  * (q217), the simple-exponential-smoothing one-step backtest vs the
  * naive predictor (q218), seasonal-naive scoring (q219), and an
  * empirical forecast interval from weekly-residual quantiles (q220).
  *
  * Scale notes (the 100 TB story): everything runs on the DAILY count
  * table — one map-side-combined pass over events, then types × span
  * rows, metadata regardless of corpus size. The smoothing recurrences
  * are irreducibly sequential in time, so they run as in-order array
  * folds over one series' span-bounded array (q99's bounded-collect
  * rule) — never over raw events. q219/q220 are purely relational
  * (calendar self-joins + closed-form rank selection).
  *
  * Exactness: daily counts are integers; Holt/SES states are doubles
  * produced by the IDENTICAL expression tree on both engines — the
  * Spark `aggregate` lambda and the DuckDB recursive-CTE step are
  * textually parallel (DuckDB's `list_reduce` mis-binds struct
  * accumulators, so the oracle folds via WITH RECURSIVE — the
  * documented alternative), and l_t is recomputed textually inside
  * b_t on both sides so the operation order coincides; α=0.5, β=0.25
  * are exactly representable. Absolute one-step errors accumulate in
  * series order. Seasonal-naive errors and residual quantiles are
  * pure integer decisions (ceil via (n+9) DIV 10). Doubles are
  * rounded on output only.
  */
object ForecastOps {
  import Relational.Q

  private val DayUs = 86400000000L

  /** Per-(event type, day) counts — memoized, feeds the whole pack. */
  private val dailyMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[operators] def daily(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(dailyMemo, s, d) {
      Graft.events(s, d)
        .select(col("event_type").as("t"),
          expr(s"unix_micros(ts) DIV $DayUs").as("day"))
        .groupBy(col("t"), col("day")).agg(count(lit(1)).as("y"))
        .localCheckpoint(true)
    }

  private val DailySqlCte: String =
    s"""daily AS (
       |  SELECT event_type AS t, epoch_us(ts) // $DayUs AS day,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2)""".stripMargin

  /** One sorted (day, y) array per type. */
  private def seriesArr(s: SparkSession, d: String): DataFrame =
    daily(s, d)
      .groupBy(col("t"))
      .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("a"))

  private val IdxSqlCte: String =
    """idx AS MATERIALIZED (
      |  SELECT t, day, y,
      |    row_number() OVER (PARTITION BY t ORDER BY day) AS i,
      |    CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS tn
      |  FROM daily)""".stripMargin

  // ---------------------------------------------------------------- q217
  /** Holt linear smoothing (α=0.5, β=0.25; l₁=y₁, b₁=y₂−y₁): final
    * level/trend and the 1- and 7-step-ahead forecasts per type.
    */
  val q217: Q = (s, d) =>
    seriesArr(s, d)
      .withColumn("st", expr(
        """aggregate(
          |  slice(a, 2, size(a) - 1),
          |  named_struct(
          |    'l', CAST(a[0].y AS DOUBLE),
          |    'b', CAST(a[1].y AS DOUBLE) - CAST(a[0].y AS DOUBLE)),
          |  (acc, x) -> named_struct(
          |    'l', 0.5 * CAST(x.y AS DOUBLE) + 0.5 * (acc.l + acc.b),
          |    'b', 0.25 * ((0.5 * CAST(x.y AS DOUBLE) + 0.5 * (acc.l + acc.b))
          |           - acc.l) + 0.75 * acc.b))""".stripMargin))
      .select(col("t").as("event_type"), size(col("a")).cast("long").as("n_days"),
        round(col("st.l"), 6).as("level"), round(col("st.b"), 6).as("trend"),
        round(col("st.l") + col("st.b"), 6).as("forecast_1d"),
        round(col("st.l") + lit(7.0) * col("st.b"), 6).as("forecast_7d"))
      .orderBy("event_type")

  val q217Sql: String =
    s"""WITH RECURSIVE $DailySqlCte,
       |$IdxSqlCte,
       |holt AS (
       |  SELECT i1.t, 1 AS i, i1.tn,
       |    CAST(i1.y AS DOUBLE) AS l,
       |    CAST(i2.y AS DOUBLE) - CAST(i1.y AS DOUBLE) AS b
       |  FROM idx i1 JOIN idx i2 ON i2.t = i1.t AND i2.i = 2
       |  WHERE i1.i = 1
       |  UNION ALL
       |  SELECT h.t, h.i + 1, h.tn,
       |    0.5 * CAST(x.y AS DOUBLE) + 0.5 * (h.l + h.b),
       |    0.25 * ((0.5 * CAST(x.y AS DOUBLE) + 0.5 * (h.l + h.b)) - h.l)
       |      + 0.75 * h.b
       |  FROM holt h JOIN idx x ON x.t = h.t AND x.i = h.i + 1)
       |SELECT t AS event_type, tn AS n_days,
       |  round(l, 6) AS level, round(b, 6) AS trend,
       |  round(l + b, 6) AS forecast_1d,
       |  round(l + 7.0 * b, 6) AS forecast_7d
       |FROM holt WHERE i = tn ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q218
  /** SES (α=0.5) one-step backtest: accumulated |y_t − s_{t−1}| in
    * series order vs the naive |y_t − y_{t−1}| baseline; MASE = the
    * error ratio.
    */
  val q218: Q = (s, d) => {
    val folded = seriesArr(s, d)
      .withColumn("st", expr(
        """aggregate(
          |  slice(a, 2, size(a) - 1),
          |  named_struct('s', CAST(a[0].y AS DOUBLE), 'e', CAST(0.0 AS DOUBLE)),
          |  (acc, x) -> named_struct(
          |    's', 0.5 * CAST(x.y AS DOUBLE) + 0.5 * acc.s,
          |    'e', acc.e + abs(CAST(x.y AS DOUBLE) - acc.s)))""".stripMargin))
      .select(col("t"), size(col("a")).cast("long").as("n_days"),
        col("st.e").as("serr"))
    val wLag = Window.partitionBy(col("t")).orderBy(col("day"))
    val naive = daily(s, d)
      .withColumn("py", lag(col("y"), 1).over(wLag))
      .where(col("py").isNotNull)
      .groupBy(col("t").as("tn"))
      .agg(sum(abs(col("y") - col("py"))).as("nerr"))
    folded.join(naive, col("t") === col("tn"))
      .select(col("t").as("event_type"), col("n_days"),
        round(col("serr") / (col("n_days") - 1).cast("double"), 6).as("mae_ses"),
        round(col("nerr").cast("double") / (col("n_days") - 1).cast("double"), 6)
          .as("mae_naive"),
        expr("""round(CASE WHEN nerr = 0 THEN NULL
                ELSE serr / CAST(nerr AS DOUBLE) END, 6)""").as("mase"))
      .orderBy("event_type")
  }

  val q218Sql: String =
    s"""WITH RECURSIVE $DailySqlCte,
       |$IdxSqlCte,
       |ses AS (
       |  SELECT t, 1 AS i, tn, CAST(y AS DOUBLE) AS s, CAST(0.0 AS DOUBLE) AS e
       |  FROM idx WHERE i = 1
       |  UNION ALL
       |  SELECT h.t, h.i + 1, h.tn,
       |    0.5 * CAST(x.y AS DOUBLE) + 0.5 * h.s,
       |    h.e + abs(CAST(x.y AS DOUBLE) - h.s)
       |  FROM ses h JOIN idx x ON x.t = h.t AND x.i = h.i + 1),
       |fin AS (SELECT t, tn AS n_days, e AS serr FROM ses WHERE i = tn),
       |nv AS (
       |  SELECT t, CAST(sum(abs(y - py)) AS BIGINT) AS nerr FROM (
       |    SELECT t, y, lag(y) OVER (PARTITION BY t ORDER BY day) AS py
       |    FROM daily)
       |  WHERE py IS NOT NULL GROUP BY 1)
       |SELECT f.t AS event_type, f.n_days,
       |  round(f.serr / CAST(f.n_days - 1 AS DOUBLE), 6) AS mae_ses,
       |  round(CAST(n.nerr AS DOUBLE) / CAST(f.n_days - 1 AS DOUBLE), 6)
       |    AS mae_naive,
       |  round(CASE WHEN n.nerr = 0 THEN NULL
       |    ELSE f.serr / CAST(n.nerr AS DOUBLE) END, 6) AS mase
       |FROM fin f JOIN nv n ON n.t = f.t ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q219
  /** Seasonal-naive scoring: |y_d − y_{d−7}| vs |y_d − y_{d−1}| by
    * calendar join — pure integer error sums.
    */
  val q219: Q = (s, d) => {
    val base = daily(s, d)
    def lagged(off: Int, n: String, m: String): DataFrame =
      base.join(base.select(col("t").as("t2"), (col("day") + off).as("d2"),
          col("y").as("py")),
        col("t") === col("t2") && col("day") === col("d2"))
        .groupBy(col("t").as(s"t_$n"))
        .agg(count(lit(1)).as(n), sum(abs(col("y") - col("py"))).as(m))
    lagged(7, "n_scored7", "err7").join(lagged(1, "n_scored1", "err1"),
        col("t_n_scored7") === col("t_n_scored1"))
      .select(col("t_n_scored7").as("event_type"),
        col("n_scored7"),
        round(col("err7").cast("double") / col("n_scored7"), 6).as("mae_snaive"),
        col("n_scored1"),
        round(col("err1").cast("double") / col("n_scored1"), 6).as("mae_naive"),
        expr("""round(CASE WHEN err1 = 0 THEN NULL
                ELSE (CAST(err7 AS DOUBLE) / n_scored7)
                   / (CAST(err1 AS DOUBLE) / n_scored1) END, 6)""")
          .as("seasonal_ratio"))
      .orderBy("event_type")
  }

  val q219Sql: String =
    s"""WITH $DailySqlCte,
       |l7 AS (
       |  SELECT a.t, count(*) AS n_scored7,
       |    CAST(sum(abs(a.y - b.y)) AS BIGINT) AS err7
       |  FROM daily a JOIN daily b ON b.t = a.t AND b.day = a.day - 7
       |  GROUP BY 1),
       |l1 AS (
       |  SELECT a.t, count(*) AS n_scored1,
       |    CAST(sum(abs(a.y - b.y)) AS BIGINT) AS err1
       |  FROM daily a JOIN daily b ON b.t = a.t AND b.day = a.day - 1
       |  GROUP BY 1)
       |SELECT l7.t AS event_type, l7.n_scored7,
       |  round(CAST(l7.err7 AS DOUBLE) / l7.n_scored7, 6) AS mae_snaive,
       |  l1.n_scored1,
       |  round(CAST(l1.err1 AS DOUBLE) / l1.n_scored1, 6) AS mae_naive,
       |  round(CASE WHEN l1.err1 = 0 THEN NULL
       |    ELSE (CAST(l7.err7 AS DOUBLE) / l7.n_scored7)
       |       / (CAST(l1.err1 AS DOUBLE) / l1.n_scored1) END, 6)
       |    AS seasonal_ratio
       |FROM l7 JOIN l1 ON l1.t = l7.t ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q220
  /** Empirical forecast interval: per type, the 10th/90th percentile
    * of weekly residuals y_d − y_{d−7} (closed-form rank selection over
    * the residual count table) anchored at the latest observed day.
    */
  val q220: Q = (s, d) => {
    val base = daily(s, d)
    val resid = base.join(base.select(col("t").as("t2"), (col("day") + 7).as("d2"),
        col("y").as("py")),
      col("t") === col("t2") && col("day") === col("d2"))
      .select(col("t"), (col("y") - col("py")).as("r"))
    val cnt = resid.groupBy(col("t"), col("r")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("t")).orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("t"))
    val qs = cnt
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("t"))
      .agg(max(col("n")).as("n_resid"),
        min(when(col("cum") >= expr("(n + 9) DIV 10"), col("r"))).as("q10"),
        min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("r"))).as("q90"))
    val last = base.groupBy(col("t").as("tl"))
      .agg(max(struct(col("day"), col("y"))).as("m"))
      .select(col("tl"), col("m.y").as("y_last"))
    qs.join(last, col("t") === col("tl"))
      .select(col("t").as("event_type"), col("n_resid"), col("y_last"),
        col("q10"), col("q90"),
        (col("y_last") + col("q10")).as("forecast_lo"),
        (col("y_last") + col("q90")).as("forecast_hi"))
      .orderBy("event_type")
  }

  val q220Sql: String =
    s"""WITH $DailySqlCte,
       |resid AS (
       |  SELECT a.t, a.y - b.y AS r
       |  FROM daily a JOIN daily b ON b.t = a.t AND b.day = a.day - 7),
       |cnt AS (
       |  SELECT t, r, CAST(count(*) AS BIGINT) AS c,
       |    CAST(sum(count(*)) OVER (PARTITION BY t ORDER BY r
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(count(*)) OVER (PARTITION BY t) AS BIGINT) AS n
       |  FROM resid GROUP BY 1, 2),
       |qs AS (
       |  SELECT t, max(n) AS n_resid,
       |    CAST(min(CASE WHEN cum >= (n + 9) // 10 THEN r END) AS BIGINT) AS q10,
       |    CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN r END) AS BIGINT)
       |      AS q90
       |  FROM cnt GROUP BY 1),
       |lst AS (
       |  SELECT t AS tl, arg_max(y, day) AS y_last FROM daily GROUP BY 1)
       |SELECT q.t AS event_type, q.n_resid, l.y_last, q.q10, q.q90,
       |  l.y_last + q.q10 AS forecast_lo,
       |  l.y_last + q.q90 AS forecast_hi
       |FROM qs q JOIN lst l ON l.tl = q.t ORDER BY event_type""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q217_holt_forecast", q217, Some(q217Sql)),
    ("q218_ses_backtest", q218, Some(q218Sql)),
    ("q219_seasonal_naive", q219, Some(q219Sql)),
    ("q220_forecast_interval", q220, Some(q220Sql)))
}
