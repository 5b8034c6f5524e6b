package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Robust trend estimation (round 6, twentieth pack): the
  * outlier-resistant fits a monitoring team runs on daily series —
  * the Theil–Sen median-of-slopes estimator (q221), Siegel's repeated
  * median (q222), a trimmed two-stage refit (q223), and the
  * Mann–Kendall trend test (q224).
  *
  * Scale notes (the 100 TB story): everything derives from the
  * memoized per-(type, day) count table (one map-side-combined pass
  * over events; types × span rows — metadata regardless of corpus
  * size). The O(span²) pairwise-slope table is span-bounded metadata
  * too (≈ 5·10⁵ rows per type at a 1000-day span), partitioned by
  * type, and shared across q221/q222 via a second memo; every median
  * is a closed-form rank selection (lower median, k = (n+1) DIV 2)
  * over a partitioned window — no driver-side loops, no collects.
  *
  * Exactness: days and counts are integers, so pairwise slopes
  * (yb−ya)/(db−da) are identically-computed doubles on both engines —
  * ordering and rank-selecting them is exact (q58's rule), with
  * (da, db) integer tie-breaks. q223's trim keeps the k = (8n) DIV 10
  * smallest |residual| rows (double ordering, integer k) and refits
  * by the exact closed form over integer sums (DECIMAL/HUGEINT cross
  * products). q224's S statistic and tie-corrected 18·Var(S) are pure
  * integers; z touches doubles only through one sqrt (IEEE-exact) and
  * divisions, rounded on output.
  */
object TrendOps {
  import Relational.Q

  /** Pairwise day-slope table per type: all i<j pairs of the daily
    * series with the slope (yb−ya)/(db−da). Memoized — feeds q221/q222.
    */
  private val pairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def slopePairs(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(pairsMemo, s, d) {
      val base = ForecastOps.daily(s, d)
      val a = base.select(col("t"), col("day").as("da"), col("y").as("ya"))
      val b = base.select(col("t").as("tb"), col("day").as("db"), col("y").as("yb"))
      a.join(b, col("t") === col("tb") && col("da") < col("db"))
        .select(col("t"), col("da"), col("ya"), col("db"), col("yb"),
          ((col("yb") - col("ya")).cast("double")
            / (col("db") - col("da")).cast("double")).as("m"))
        .localCheckpoint(true)
    }

  private val PairsSqlCte: String =
    s"""daily AS (
       |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |pairs AS MATERIALIZED (
       |  SELECT a.t, a.day AS da, a.y AS ya, b.day AS db, b.y AS yb,
       |    CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS m
       |  FROM daily a JOIN daily b ON b.t = a.t AND a.day < b.day)""".stripMargin

  // ---------------------------------------------------------------- q221
  /** Theil–Sen: per type, the lower-median pairwise slope and the
    * lower-median intercept y − m·day.
    */
  val q221: Q = (s, d) => {
    val pr = slopePairs(s, d)
    val wM = Window.partitionBy(col("t")).orderBy(col("m"), col("da"), col("db"))
    val med = pr
      .withColumn("rn", row_number().over(wM))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(col("t"))))
      .where(col("rn") === expr("(np + 1) DIV 2"))
      .select(col("t"), col("np").as("n_pairs"), col("m"))
    val base = ForecastOps.daily(s, d)
    val wI = Window.partitionBy(col("t")).orderBy(col("ic"), col("day"))
    med.join(base.select(col("t").as("tb"), col("day"), col("y")),
        col("t") === col("tb"))
      .withColumn("ic", col("y").cast("double") - col("m") * col("day").cast("double"))
      .withColumn("ri", row_number().over(wI))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("t"))))
      .where(col("ri") === expr("(nn + 1) DIV 2"))
      .select(col("t").as("event_type"), col("nn").as("n_points"),
        col("n_pairs"), round(col("m"), 6).as("ts_slope"),
        round(col("ic"), 6).as("ts_intercept"))
      .orderBy("event_type")
  }

  val q221Sql: String =
    s"""WITH $PairsSqlCte,
       |med AS (
       |  SELECT t, np AS n_pairs, m FROM (
       |    SELECT t, m,
       |      row_number() OVER (PARTITION BY t ORDER BY m, da, db) AS rn,
       |      CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS np
       |    FROM pairs)
       |  WHERE rn = (np + 1) // 2),
       |ic AS (
       |  SELECT med.t, med.n_pairs, med.m,
       |    CAST(d.y AS DOUBLE) - med.m * CAST(d.day AS DOUBLE) AS ic, d.day
       |  FROM med JOIN daily d ON d.t = med.t)
       |SELECT t AS event_type, nn AS n_points, n_pairs,
       |  round(m, 6) AS ts_slope, round(ic, 6) AS ts_intercept
       |FROM (
       |  SELECT t, n_pairs, m, ic,
       |    row_number() OVER (PARTITION BY t ORDER BY ic, day) AS ri,
       |    CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS nn
       |  FROM ic)
       |WHERE ri = (nn + 1) // 2 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q222
  /** Siegel's repeated median: per point, the lower-median slope to
    * every other point; per type, the lower median of those point
    * medians — breakdown point 50%.
    */
  val q222: Q = (s, d) => {
    val pr = slopePairs(s, d)
    val dir = pr.select(col("t"), col("da").as("i"), col("db").as("j"), col("m"))
      .union(pr.select(col("t"), col("db").as("i"), col("da").as("j"), col("m")))
    val wPt = Window.partitionBy(col("t"), col("i")).orderBy(col("m"), col("j"))
    val ptMed = dir
      .withColumn("rn", row_number().over(wPt))
      .withColumn("k", count(lit(1)).over(Window.partitionBy(col("t"), col("i"))))
      .where(col("rn") === expr("(k + 1) DIV 2"))
      .select(col("t"), col("i"), col("m").as("pm"))
    val wG = Window.partitionBy(col("t")).orderBy(col("pm"), col("i"))
    ptMed
      .withColumn("rg", row_number().over(wG))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("t"))))
      .where(col("rg") === expr("(nn + 1) DIV 2"))
      .select(col("t").as("event_type"), col("nn").as("n_points"),
        round(col("pm"), 6).as("repeated_median_slope"))
      .orderBy("event_type")
  }

  val q222Sql: String =
    s"""WITH $PairsSqlCte,
       |dir AS (
       |  SELECT t, da AS i, db AS j, m FROM pairs
       |  UNION ALL
       |  SELECT t, db AS i, da AS j, m FROM pairs),
       |ptmed AS (
       |  SELECT t, i, m AS pm FROM (
       |    SELECT t, i, m,
       |      row_number() OVER (PARTITION BY t, i ORDER BY m, j) AS rn,
       |      CAST(count(*) OVER (PARTITION BY t, i) AS BIGINT) AS k
       |    FROM dir)
       |  WHERE rn = (k + 1) // 2)
       |SELECT t AS event_type, nn AS n_points,
       |  round(pm, 6) AS repeated_median_slope
       |FROM (
       |  SELECT t, pm,
       |    row_number() OVER (PARTITION BY t ORDER BY pm, i) AS rg,
       |    CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS nn
       |  FROM ptmed)
       |WHERE rg = (nn + 1) // 2 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q223
  /** Trimmed two-stage refit: residuals from the Theil–Sen line, keep
    * the k = (8n) DIV 10 smallest |residual| days, then the exact
    * closed-form OLS over the kept integer (day, y) points.
    */
  val q223: Q = (s, d) => {
    // re-derive the UNROUNDED Theil–Sen line via q221's rank selections
    // (rounding happens only on q221's output) so residual ordering is
    // exact on both engines
    val pr = slopePairs(s, d)
    val wM = Window.partitionBy(col("t")).orderBy(col("m"), col("da"), col("db"))
    val med = pr
      .withColumn("rn", row_number().over(wM))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(col("t"))))
      .where(col("rn") === expr("(np + 1) DIV 2"))
      .select(col("t"), col("m"))
    val base = ForecastOps.daily(s, d)
    val wI = Window.partitionBy(col("t")).orderBy(col("ic"), col("day"))
    val line = med.join(base.select(col("t").as("tb"), col("day"), col("y")),
        col("t") === col("tb"))
      .withColumn("ic", col("y").cast("double") - col("m") * col("day").cast("double"))
      .withColumn("ri", row_number().over(wI))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("t"))))
      .where(col("ri") === expr("(nn + 1) DIV 2"))
      .select(col("t").as("tl"), col("m").as("m0"), col("ic").as("b0"))
    val wR = Window.partitionBy(col("t"))
      .orderBy(col("ar"), col("day"))
    base.join(line, col("t") === col("tl"))
      .withColumn("ar", abs(col("y").cast("double")
        - (col("m0") * col("day").cast("double") + col("b0"))))
      .withColumn("rr", row_number().over(wR))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("t"))))
      .where(col("rr") <= expr("(8 * nn) DIV 10"))
      .groupBy(col("t"))
      .agg(max(col("nn")).as("n_points"), count(lit(1)).as("n_kept"),
        sum(col("day").cast("decimal(38,0)")).as("sd"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("day") * col("day")).cast("decimal(38,0)")).as("sdd"),
        sum((col("day") * col("y")).cast("decimal(38,0)")).as("sdy"))
      .select(col("t").as("event_type"), col("n_points"), col("n_kept"),
        expr("""round(CASE WHEN n_kept * sdd - sd * sd = 0 THEN NULL
                ELSE CAST(n_kept * sdy - sd * sy AS DOUBLE)
                  / CAST(n_kept * sdd - sd * sd AS DOUBLE) END, 6)""")
          .as("refit_slope"),
        expr("""round(CASE WHEN n_kept * sdd - sd * sd = 0 THEN NULL
                ELSE (CAST(sy AS DOUBLE)
                  - (CAST(n_kept * sdy - sd * sy AS DOUBLE)
                     / CAST(n_kept * sdd - sd * sd AS DOUBLE))
                    * CAST(sd AS DOUBLE)) / CAST(n_kept AS DOUBLE) END, 6)""")
          .as("refit_intercept"))
      .orderBy("event_type")
  }

  val q223Sql: String =
    s"""WITH $PairsSqlCte,
       |med AS (
       |  SELECT t, m FROM (
       |    SELECT t, m,
       |      row_number() OVER (PARTITION BY t ORDER BY m, da, db) AS rn,
       |      CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS np
       |    FROM pairs)
       |  WHERE rn = (np + 1) // 2),
       |line AS (
       |  SELECT t, m AS m0, ic AS b0 FROM (
       |    SELECT med.t, med.m,
       |      CAST(d.y AS DOUBLE) - med.m * CAST(d.day AS DOUBLE) AS ic,
       |      row_number() OVER (PARTITION BY med.t
       |        ORDER BY CAST(d.y AS DOUBLE) - med.m * CAST(d.day AS DOUBLE),
       |        d.day) AS ri,
       |      CAST(count(*) OVER (PARTITION BY med.t) AS BIGINT) AS nn
       |    FROM med JOIN daily d ON d.t = med.t)
       |  WHERE ri = (nn + 1) // 2),
       |kept AS (
       |  SELECT t, nn, day, y FROM (
       |    SELECT d.t, d.day, d.y,
       |      row_number() OVER (PARTITION BY d.t
       |        ORDER BY abs(CAST(d.y AS DOUBLE)
       |          - (l.m0 * CAST(d.day AS DOUBLE) + l.b0)), d.day) AS rr,
       |      CAST(count(*) OVER (PARTITION BY d.t) AS BIGINT) AS nn
       |    FROM daily d JOIN line l ON l.t = d.t)
       |  WHERE rr <= (8 * nn) // 10),
       |agg AS (
       |  SELECT t, CAST(max(nn) AS BIGINT) AS n_points,
       |    CAST(count(*) AS BIGINT) AS n_kept,
       |    sum(day::HUGEINT) AS sd, sum(y::HUGEINT) AS sy,
       |    sum((day * day)::HUGEINT) AS sdd, sum((day * y)::HUGEINT) AS sdy
       |  FROM kept GROUP BY 1)
       |SELECT t AS event_type, n_points, n_kept,
       |  round(CASE WHEN n_kept * sdd - sd * sd = 0 THEN NULL
       |    ELSE CAST(n_kept * sdy - sd * sy AS DOUBLE)
       |      / CAST(n_kept * sdd - sd * sd AS DOUBLE) END, 6) AS refit_slope,
       |  round(CASE WHEN n_kept * sdd - sd * sd = 0 THEN NULL
       |    ELSE (CAST(sy AS DOUBLE)
       |      - (CAST(n_kept * sdy - sd * sy AS DOUBLE)
       |         / CAST(n_kept * sdd - sd * sd AS DOUBLE))
       |        * CAST(sd AS DOUBLE)) / CAST(n_kept AS DOUBLE) END, 6)
       |    AS refit_intercept
       |FROM agg ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q224
  /** Mann–Kendall trend test: S = Σ_{i<j} sign(y_j − y_i), the
    * tie-corrected 18·Var(S), and the continuity-corrected z — all
    * integers until the final sqrt/division.
    */
  val q224: Q = (s, d) => {
    val pr = slopePairs(s, d)
    val sS = pr.groupBy(col("t"))
      .agg(sum(signum(col("yb") - col("ya")).cast("long")).as("s_stat"),
        count(lit(1)).as("n_pairs"))
    val base = ForecastOps.daily(s, d)
    val nPt = base.groupBy(col("t").as("tn")).agg(count(lit(1)).as("n"))
    val ties = base.groupBy(col("t").as("tt"), col("y")).agg(count(lit(1)).as("c"))
      .groupBy(col("tt"))
      .agg(sum(col("c") * (col("c") - 1L) * (lit(2L) * col("c") + 5L)).as("tie18"))
    sS.join(nPt, col("t") === col("tn")).join(ties, col("t") === col("tt"))
      .withColumn("var18",
        col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) - col("tie18"))
      .select(col("t").as("event_type"), col("n").as("n_points"),
        col("s_stat"), col("var18"),
        expr("""round(CASE WHEN var18 = 0 THEN NULL
                WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                  / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                  / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                ELSE 0.0 END, 6)""").as("z"),
        expr("CAST(CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END AS BIGINT)")
          .as("trend"))
      .orderBy("event_type")
  }

  val q224Sql: String =
    s"""WITH $PairsSqlCte,
       |ss AS (
       |  SELECT t,
       |    CAST(sum(CASE WHEN yb > ya THEN 1 WHEN yb < ya THEN -1 ELSE 0 END)
       |      AS BIGINT) AS s_stat
       |  FROM pairs GROUP BY 1),
       |np AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
       |ties AS (
       |  SELECT t, CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie18
       |  FROM (SELECT t, y, CAST(count(*) AS BIGINT) AS c
       |        FROM daily GROUP BY 1, 2)
       |  GROUP BY 1)
       |SELECT ss.t AS event_type, np.n AS n_points, ss.s_stat,
       |  CAST(np.n * (np.n - 1) * (2 * np.n + 5) - ties.tie18 AS BIGINT)
       |    AS var18,
       |  round(CASE WHEN np.n * (np.n - 1) * (2 * np.n + 5) - ties.tie18 = 0
       |      THEN NULL
       |    WHEN ss.s_stat > 0 THEN CAST(ss.s_stat - 1 AS DOUBLE)
       |      / sqrt(CAST(np.n * (np.n - 1) * (2 * np.n + 5) - ties.tie18
       |          AS DOUBLE) / 18.0)
       |    WHEN ss.s_stat < 0 THEN CAST(ss.s_stat + 1 AS DOUBLE)
       |      / sqrt(CAST(np.n * (np.n - 1) * (2 * np.n + 5) - ties.tie18
       |          AS DOUBLE) / 18.0)
       |    ELSE 0.0 END, 6) AS z,
       |  CAST(CASE WHEN ss.s_stat > 0 THEN 1 WHEN ss.s_stat < 0 THEN -1
       |    ELSE 0 END AS BIGINT) AS trend
       |FROM ss JOIN np ON np.t = ss.t JOIN ties ON ties.t = ss.t
       |ORDER BY event_type""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q221_theil_sen", q221, Some(q221Sql)),
    ("q222_repeated_median", q222, Some(q222Sql)),
    ("q223_trimmed_refit", q223, Some(q223Sql)),
    ("q224_mann_kendall", q224, Some(q224Sql)))
}
