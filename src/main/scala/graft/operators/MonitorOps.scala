package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Feed-monitoring / forecasting audits (round 6): the time-series
  * health checks a data platform runs on its ingest feeds before
  * trusting them in a training mixture — hourly load shape and
  * overdispersion (Fano factor), daily volume trend, lag-1
  * autocorrelation (is tomorrow predictable from today), CUSUM
  * change-point (when did the feed change character), burst days, and
  * day-of-week seasonality strength. These are the classical
  * statistical-process-control diagnostics (Page 1954's CUSUM, the
  * Poisson Fano factor, variance-decomposition eta²) applied to feed
  * volumes.
  *
  * Scale notes (the 100 TB story): every query collapses the corpus to
  * a (type × day) or (day × hour) COUNT table with ONE map-side-combined
  * aggregation — at any corpus size the downstream work is
  * days×types rows (metadata). The per-type windows (running CUSUM
  * prefix, median rank, argmax rank) partition by event_type over
  * day-count rows: bounded by the calendar, not the data. Nothing else
  * shuffles.
  *
  * Exactness: counts are integers; every discrete decision (change-point
  * argmax, burst threshold, median rank) is made on integers or exact
  * cross-multiplied rationals (|n·P_k − k·T|, 10·c > 11·med); OLS /
  * correlation / Fano numerators and denominators are BIGINT sums with
  * one final division (identical expression trees both sides); sqrt is
  * IEEE-exact; the only float SUMMATION (q152's between-group term,
  * 7 values) folds in explicit dow order on both engines (q144's
  * sorted-fold precedent). round(…, 6) on output columns only.
  */
object MonitorOps {
  import Relational.Q

  /** Per-(event_type, day) count table with a 0-based day index from the
    * corpus' first day — the shared input of q148–q152. One
    * map-side-combined aggregation; the min-date is a single-row
    * broadcast derived from the same aggregate (ReuseExchange scans
    * once).
    */
  private def daily(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint pins the (types × days)-row count table: the
    // min-date broadcast, the self-joins (q149), and the median/stat
    // joins (q151/q152) each consume it, and without the pin every
    // consumer re-runs the corpus scan (the audit showed 2-4 scans per
    // query; with it each query reads the corpus exactly once)
    val cnt = Graft.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("dt"))
      .groupBy(col("event_type"), col("dt"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val d0 = cnt.agg(min(col("dt")).as("d0"))
    cnt.crossJoin(broadcast(d0))
      .withColumn("idx", datediff(col("dt"), col("d0")).cast("long"))
      .select(col("event_type"), col("dt"), col("idx"), col("c"))
  }

  private val dailySqlCte: String =
    """dc AS MATERIALIZED (
      |  SELECT event_type, CAST(ts AS DATE) AS dt, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |dc2 AS MATERIALIZED (
      |  SELECT event_type, dt, c,
      |    CAST(date_diff('day', (SELECT min(dt) FROM dc), dt) AS BIGINT) AS idx
      |  FROM dc)""".stripMargin

  // ---------------------------------------------------------------- q147
  /** Hourly load profile with Fano factor: per hour-of-day, total events,
    * observed (date, hour) cells, mean events per cell, and the Fano
    * factor var/mean of the cell counts — the overdispersion readout that
    * separates Poisson-like organic traffic (Fano ≈ 1) from bursty or
    * batched ingestion (Fano >> 1). Variance is the explicit
    * E[x²] − E[x]² tree (q138's precedent), built from exact BIGINT
    * sum/sum-of-squares.
    */
  val q147: Q = (s, d) => {
    val cells = Graft.events(s, d)
      .select(to_date(col("ts")).as("dt"), hour(col("ts")).as("hr"))
      .groupBy(col("dt"), col("hr"))
      .agg(count(lit(1)).as("c"))
    cells.groupBy(col("hr"))
      .agg(
        sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"),
        count(lit(1)).as("n"))
      .select(col("hr").as("hour"), col("s").as("n_events"), col("n").as("n_cells"),
        round(col("s").cast("double") / col("n"), 6).as("mean_per_cell"),
        round((col("q").cast("double") / col("n")
            - (col("s").cast("double") / col("n")) * (col("s").cast("double") / col("n")))
          / (col("s").cast("double") / col("n")), 6).as("fano"))
      .orderBy("hour")
  }

  val q147Sql: String =
    """WITH cells AS (
      |  SELECT CAST(ts AS DATE) AS dt, EXTRACT(hour FROM ts) AS hr,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |ag AS (
      |  SELECT hr, CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q,
      |    count(*) AS n
      |  FROM cells GROUP BY hr)
      |SELECT CAST(hr AS INT) AS hour, s AS n_events, n AS n_cells,
      |  round(CAST(s AS DOUBLE) / n, 6) AS mean_per_cell,
      |  round((CAST(q AS DOUBLE) / n
      |      - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
      |    / (CAST(s AS DOUBLE) / n), 6) AS fano
      |FROM ag ORDER BY hour""".stripMargin

  // ---------------------------------------------------------------- q148
  /** Daily volume trend per event type: OLS slope/intercept of the daily
    * count on the day index — "is this feed growing, stable, or dying".
    * All four OLS sums are exact BIGINT (day indexes × counts); the slope
    * is one division of exact integers, so the fit is bit-identical
    * across engines with no ln/float accumulation at all (stricter than
    * q136, whose y-axis is logarithmic).
    */
  val q148: Q = (s, d) => {
    daily(s, d).groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("idx")).as("sx"),
        sum(col("c")).as("sy"),
        sum(col("idx") * col("c")).as("sxy"),
        sum(col("idx") * col("idx")).as("sxx"))
      .select(col("event_type"), col("n").as("n_days"), col("sy").as("total"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope_per_day"),
        round((col("sy").cast("double")
            - (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
              * col("sx").cast("double")) / col("n"), 6).as("intercept"))
      .orderBy("event_type")
  }

  val q148Sql: String =
    s"""WITH $dailySqlCte,
       |ag AS (
       |  SELECT event_type, count(*) AS n,
       |    CAST(sum(idx) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
       |    CAST(sum(idx * c) AS BIGINT) AS sxy,
       |    CAST(sum(idx * idx) AS BIGINT) AS sxx
       |  FROM dc2 GROUP BY 1)
       |SELECT event_type, n AS n_days, sy AS total,
       |  round(CAST(n * sxy - sx * sy AS DOUBLE)
       |    / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_per_day,
       |  round((CAST(sy AS DOUBLE)
       |      - CAST(n * sxy - sx * sy AS DOUBLE)
       |        / CAST(n * sxx - sx * sx AS DOUBLE)
       |        * CAST(sx AS DOUBLE)) / n, 6) AS intercept
       |FROM ag ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q149
  /** Lag-1 autocorrelation of the daily series per type: Pearson r over
    * the (c_d, c_{d+1}) consecutive-day pairs — the one-number
    * "is tomorrow's volume predictable from today's" forecastability
    * check (the AR(1) coefficient a seasonal-naive forecaster needs).
    * All five moment sums are exact BIGINT over integer counts; r is one
    * division with an IEEE-exact sqrt. Degenerate (constant) series are
    * excluded by an exact integer variance test on both sides.
    */
  val q149: Q = (s, d) => {
    val dd = daily(s, d)
    val a = dd.select(col("event_type"), col("idx"), col("c").as("x"))
    val b = dd.select(col("event_type").as("et2"), (col("idx") - 1L).as("idx2"),
      col("c").as("y"))
    a.join(b, col("event_type") === col("et2") && col("idx") === col("idx2"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .where((col("n") * col("sxx") - col("sx") * col("sx")) > 0L &&
        (col("n") * col("syy") - col("sy") * col("sy")) > 0L)
      .select(col("event_type"), col("n").as("n_pairs"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            * (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
          .as("lag1_r"))
      .orderBy("event_type")
  }

  val q149Sql: String =
    s"""WITH $dailySqlCte,
       |pr AS (
       |  SELECT a.event_type, a.c AS x, b.c AS y
       |  FROM dc2 a JOIN dc2 b
       |    ON b.event_type = a.event_type AND b.idx = a.idx + 1),
       |ag AS (
       |  SELECT event_type, count(*) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM pr GROUP BY 1)
       |SELECT event_type, n AS n_pairs,
       |  round(CAST(n * sxy - sx * sy AS DOUBLE)
       |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
       |      * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS lag1_r
       |FROM ag
       |WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q150
  /** CUSUM change-point per type (Page 1954 / the standard mean-shift
    * scan): over the observed daily series, the split position k that
    * maximizes |n·P_k − k·T| (P_k = running count prefix, T = total) —
    * the exact integer form of "where does the series' mean change",
    * cross-multiplied so the argmax is an INTEGER decision (no float
    * ever enters a comparison). Tie → earliest day; the trivial k = n
    * split is excluded. The windows run over day-count rows per type.
    */
  val q150: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type")).orderBy(col("idx"))
    val scored = daily(s, d)
      .withColumn("p", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("k") < col("n"))
      .withColumn("stat", col("n") * col("p") - col("k") * col("t"))
      .withColumn("astat", abs(col("stat")))
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(col("astat").desc, col("k"))
    scored.withColumn("rk", row_number().over(wPick)).where(col("rk") === 1)
      .select(col("event_type"), col("n").as("n_days"), col("k").as("split_pos"),
        col("dt").as("change_date"), col("stat").as("cusum_stat"))
      .orderBy("event_type")
  }

  val q150Sql: String =
    s"""WITH $dailySqlCte,
       |sc AS (
       |  SELECT event_type, dt,
       |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY idx
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
       |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS t,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY idx) AS BIGINT) AS k,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM dc2),
       |st AS (
       |  SELECT event_type, dt, n, k, n * p - k * t AS stat,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY abs(n * p - k * t) DESC, k) AS rk
       |  FROM sc WHERE k < n)
       |SELECT event_type, n AS n_days, k AS split_pos, dt AS change_date,
       |  stat AS cusum_stat
       |FROM st WHERE rk = 1 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q151
  /** Burst summary per type: discrete median daily count (the exact
    * rank-(n+1) DIV 2 element, q132's convention), peak day, days more
    * than 10% above the median (exact 10·c > 11·med cross-multiplication
    * — no float threshold), and the peak-to-median ratio. The rank pick
    * is a row_number over day-count rows per type.
    */
  val q151: Q = (s, d) => {
    val dd = daily(s, d)
    val wRank = Window.partitionBy(col("event_type")).orderBy(col("c"), col("dt"))
    val med = dd
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("event_type"))
        .orderBy(col("c"), col("dt"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .where(col("rn") === expr("(nn + 1) DIV 2"))
      .select(col("event_type").as("et2"), col("c").as("med"))
    dd.join(med, col("event_type") === col("et2"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        max(col("med")).as("med_daily"),
        max(col("c")).as("peak_daily"),
        sum(when(col("c") * 10L > col("med") * 11L, 1L).otherwise(0L))
          .as("n_burst_days"))
      .select(col("event_type"), col("n_days"), col("med_daily"), col("peak_daily"),
        col("n_burst_days"),
        round(col("peak_daily").cast("double") / col("med_daily"), 6)
          .as("peak_to_median"))
      .orderBy("event_type")
  }

  val q151Sql: String =
    s"""WITH $dailySqlCte,
       |md AS (
       |  SELECT event_type, CAST(quantile_disc(c, 0.5) AS BIGINT) AS med
       |  FROM dc2 GROUP BY 1)
       |SELECT d.event_type, count(*) AS n_days, max(m.med) AS med_daily,
       |  max(d.c) AS peak_daily,
       |  CAST(sum(CASE WHEN d.c * 10 > m.med * 11 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_burst_days,
       |  round(CAST(max(d.c) AS DOUBLE) / max(m.med), 6) AS peak_to_median
       |FROM dc2 d JOIN md m ON m.event_type = d.event_type
       |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  // ---------------------------------------------------------------- q152
  /** Day-of-week seasonality strength per type: eta² — the share of daily
    * volume variance explained by the phase-aligned day-of-week (day 0 =
    * the corpus' first day, dow = idx mod 7, engine-independent by
    * construction) — plus the peak dow and its mean. eta² =
    * (Σ_g s_g²/n_g − S²/N) / (Q − S²/N): every s_g/n_g/S/Q is an exact
    * BIGINT, the 7-term between-group sum folds in explicit dow order on
    * both engines (q144's sorted-fold precedent), and the peak pick
    * orders by the exactly-computed mean double (one division — the q58
    * computed-double ordering precedent).
    */
  val q152: Q = (s, d) => {
    val dowed = daily(s, d).withColumn("dow", pmod(col("idx"), lit(7L)))
    val g = dowed.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("c")).as("sg"), count(lit(1)).as("ng"),
        sum(col("c") * col("c")).as("qg"))
    val wPeak = Window.partitionBy(col("event_type"))
      .orderBy((col("sg").cast("double") / col("ng")).desc, col("dow"))
    val peak = g.withColumn("rk", row_number().over(wPeak)).where(col("rk") === 1)
      .select(col("event_type").as("et2"), col("dow").as("peak_dow"),
        round(col("sg").cast("double") / col("ng"), 6).as("peak_mean"))
    val tot = g.groupBy(col("event_type"))
      .agg(
        sum(col("sg")).as("ss"), sum(col("ng")).as("nn"), sum(col("qg")).as("qq"),
        expr("""aggregate(
          |  transform(sort_array(collect_list(named_struct('dow', dow,
          |    'v', CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng))), x -> x.v),
          |  0.0D, (a, x) -> a + x)""".stripMargin).as("between"))
      .withColumn("gm", col("ss").cast("double") * col("ss").cast("double") / col("nn"))
      .select(col("event_type"), col("nn").as("n_days"),
        round((col("between") - col("gm"))
          / (col("qq").cast("double") - col("gm")), 6).as("eta2"))
    tot.join(peak, col("event_type") === col("et2"))
      .select(col("event_type"), col("n_days"), col("eta2"),
        col("peak_dow").cast("int").as("peak_dow"), col("peak_mean"))
      .orderBy("event_type")
  }

  val q152Sql: String =
    s"""WITH $dailySqlCte,
       |g AS (
       |  SELECT event_type, idx % 7 AS dow, CAST(sum(c) AS BIGINT) AS sg,
       |    count(*) AS ng, CAST(sum(c * c) AS BIGINT) AS qg
       |  FROM dc2 GROUP BY 1, 2),
       |pk AS (
       |  SELECT event_type, dow AS peak_dow,
       |    round(CAST(sg AS DOUBLE) / ng, 6) AS peak_mean
       |  FROM (
       |    SELECT event_type, dow, sg, ng, row_number() OVER (
       |      PARTITION BY event_type
       |      ORDER BY CAST(sg AS DOUBLE) / ng DESC, dow) AS rk
       |    FROM g) WHERE rk = 1),
       |tt AS (
       |  SELECT event_type, CAST(sum(sg) AS BIGINT) AS ss,
       |    CAST(sum(ng) AS BIGINT) AS nn, CAST(sum(qg) AS BIGINT) AS qq,
       |    list_sum(list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng
       |      ORDER BY dow)) AS between_g
       |  FROM g GROUP BY 1)
       |SELECT t.event_type, t.nn AS n_days,
       |  round((t.between_g - CAST(t.ss AS DOUBLE) * CAST(t.ss AS DOUBLE) / t.nn)
       |    / (CAST(t.qq AS DOUBLE)
       |      - CAST(t.ss AS DOUBLE) * CAST(t.ss AS DOUBLE) / t.nn), 6) AS eta2,
       |  CAST(p.peak_dow AS INT) AS peak_dow, p.peak_mean
       |FROM tt t JOIN pk p ON p.event_type = t.event_type
       |ORDER BY t.event_type""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q147_hourly_profile", q147, Some(q147Sql)),
    ("q148_daily_trend", q148, Some(q148Sql)),
    ("q149_autocorrelation", q149, Some(q149Sql)),
    ("q150_changepoint", q150, Some(q150Sql)),
    ("q151_burst_summary", q151, Some(q151Sql)),
    ("q152_dow_seasonality", q152, Some(q152Sql)))
}
