package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Causal inference (round 6, twenty-sixth pack): the experiment
  * readouts beyond q189–q192's A/B suite — difference-in-differences
  * (q245), the placebo-cut falsification of the same estimator (q246),
  * the post-stratified lift estimator (q247), and the sample-size /
  * power calculation from observed moments (q248).
  *
  * Conventions shared with `ExperimentOps`: arm = user_id % 2
  * (deterministic, identical across engines), period cut at absolute
  * epoch day 19738; the placebo run cuts the PRE period at day 19731
  * and must read ≈ 0 — the standard falsification.
  *
  * Scale notes (the 100 TB story): every query is one map-side-
  * combined per-user aggregation (the naturally pre-shuffled key)
  * followed by a ≤ 4-cell / ≤ 10-stratum rollup; no windows over
  * events, no joins except the broadcast of those metadata cells.
  *
  * Exactness: per-user period sums are exact micro-units; cell
  * means/variances are single expressions over DECIMAL(38,0)/HUGEINT
  * polynomials; the DiD point estimate, SE, t, the stratified lift,
  * and the power n are identically-computed double trees (sqrt
  * IEEE-exact, z constants shared literals), rounded on output;
  * degenerate denominators NULL-guarded identically.
  */
object CausalOps {
  import Relational.Q

  private val CutDay = 19738L
  private val PlaceboDay = 19731L

  /** Per-(arm, period) user-level cells over a day range: n users,
    * Σy, Σy² (y = per-user micro sum in the period; users with no
    * events in a period count as y = 0 via the full user universe).
    */
  private def cells(s: SparkSession, d: String, lastDay: Long, cut: Long): DataFrame = {
    val perUser = Graft.events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      .where(col("day") <= lastDay)
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < cut, col("vm")).otherwise(0L)).as("y0"),
        sum(when(col("day") >= cut, col("vm")).otherwise(0L)).as("y1"))
      .withColumn("arm", expr("user_id % 2"))
    perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("y0").cast("decimal(38,0)")).as("s0"),
        sum((col("y0").cast("decimal(38,0)") * col("y0").cast("decimal(38,0)")))
          .as("s00"),
        sum(col("y1").cast("decimal(38,0)")).as("s1"),
        sum((col("y1").cast("decimal(38,0)") * col("y1").cast("decimal(38,0)")))
          .as("s11"))
  }

  private def cellsSqlCte(lastDay: Long, cut: Long): String =
    s"""pu AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 < $cut
       |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT)
       |      AS y0,
       |    CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 >= $cut
       |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT)
       |      AS y1
       |  FROM events WHERE epoch_us(ts) // 86400000000 <= $lastDay
       |  GROUP BY 1),
       |cells AS (
       |  SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
       |    sum(y0::HUGEINT) AS s0, sum(y0::HUGEINT * y0) AS s00,
       |    sum(y1::HUGEINT) AS s1, sum(y1::HUGEINT * y1) AS s11
       |  FROM pu GROUP BY 1)""".stripMargin

  /** Shared DiD output shape from a cells frame (Spark side). */
  private def didFrom(c: DataFrame): DataFrame = {
    val t = c.where(col("arm") === 1).select(col("n").as("nt"),
      col("s0").as("t0"), col("s00").as("t00"),
      col("s1").as("t1"), col("s11").as("t11"))
    val ctl = c.where(col("arm") === 0).select(col("n").as("nc"),
      col("s0").as("c0"), col("s00").as("c00"),
      col("s1").as("c1"), col("s11").as("c11"))
    t.crossJoin(ctl)
      .select(col("nt"), col("nc"),
        expr("round(CAST(t0 AS DOUBLE) / 1000000.0 / nt, 6)").as("treat_pre"),
        expr("round(CAST(t1 AS DOUBLE) / 1000000.0 / nt, 6)").as("treat_post"),
        expr("round(CAST(c0 AS DOUBLE) / 1000000.0 / nc, 6)").as("ctl_pre"),
        expr("round(CAST(c1 AS DOUBLE) / 1000000.0 / nc, 6)").as("ctl_post"),
        expr("""round((CAST(t1 AS DOUBLE) / nt - CAST(t0 AS DOUBLE) / nt
                - (CAST(c1 AS DOUBLE) / nc - CAST(c0 AS DOUBLE) / nc))
                / 1000000.0, 6)""").as("did"),
        expr(
          """round(CASE WHEN nt <= 1 OR nc <= 1 THEN NULL ELSE
            |  sqrt(((CAST(nt * t11 - t1 * t1 AS DOUBLE)
            |          + CAST(nt * t00 - t0 * t0 AS DOUBLE))
            |           / (CAST(nt AS DOUBLE) * nt * (nt - 1))
            |        + (CAST(nc * c11 - c1 * c1 AS DOUBLE)
            |          + CAST(nc * c00 - c0 * c0 AS DOUBLE))
            |           / (CAST(nc AS DOUBLE) * nc * (nc - 1))))
            |  / 1000000.0 END, 6)""".stripMargin).as("se"))
      .withColumn("t_stat", expr(
        """round(CASE WHEN se IS NULL OR se = 0 THEN NULL
          |ELSE did / se END, 6)""".stripMargin))
  }

  // t_stat divides the ROUNDED did by the ROUNDED se (mirroring the
  // Spark side, which derives t_stat from its rounded output columns)
  private def didSelectSql: String =
    """SELECT nt, nc, treat_pre, treat_post, ctl_pre, ctl_post, did, se,
      |  round(CASE WHEN se IS NULL OR se = 0 THEN NULL
      |    ELSE did / se END, 6) AS t_stat
      |FROM (
      |  SELECT t.n AS nt, c.n AS nc,
      |    round(CAST(t.s0 AS DOUBLE) / 1000000.0 / t.n, 6) AS treat_pre,
      |    round(CAST(t.s1 AS DOUBLE) / 1000000.0 / t.n, 6) AS treat_post,
      |    round(CAST(c.s0 AS DOUBLE) / 1000000.0 / c.n, 6) AS ctl_pre,
      |    round(CAST(c.s1 AS DOUBLE) / 1000000.0 / c.n, 6) AS ctl_post,
      |    round((CAST(t.s1 AS DOUBLE) / t.n - CAST(t.s0 AS DOUBLE) / t.n
      |      - (CAST(c.s1 AS DOUBLE) / c.n - CAST(c.s0 AS DOUBLE) / c.n))
      |      / 1000000.0, 6) AS did,
      |    round(CASE WHEN t.n <= 1 OR c.n <= 1 THEN NULL ELSE
      |      sqrt(((CAST(t.n * t.s11 - t.s1 * t.s1 AS DOUBLE)
      |              + CAST(t.n * t.s00 - t.s0 * t.s0 AS DOUBLE))
      |               / (CAST(t.n AS DOUBLE) * t.n * (t.n - 1))
      |            + (CAST(c.n * c.s11 - c.s1 * c.s1 AS DOUBLE)
      |              + CAST(c.n * c.s00 - c.s0 * c.s0 AS DOUBLE))
      |               / (CAST(c.n AS DOUBLE) * c.n * (c.n - 1))))
      |      / 1000000.0 END, 6) AS se
      |  FROM (SELECT * FROM cells WHERE arm = 1) t
      |  CROSS JOIN (SELECT * FROM cells WHERE arm = 0) c)""".stripMargin

  // ---------------------------------------------------------------- q245
  /** Difference-in-differences at the real cut day. */
  val q245: Q = (s, d) => didFrom(cells(s, d, Long.MaxValue, CutDay))

  val q245Sql: String =
    s"""WITH ${cellsSqlCte(Long.MaxValue, CutDay)}
       |$didSelectSql""".stripMargin

  // ---------------------------------------------------------------- q246
  /** Placebo DiD: pre-period data only, cut at day 19731 — a healthy
    * experiment reads ≈ 0 here.
    */
  val q246: Q = (s, d) => didFrom(cells(s, d, CutDay - 1, PlaceboDay))

  val q246Sql: String =
    s"""WITH ${cellsSqlCte(CutDay - 1, PlaceboDay)}
       |$didSelectSql""".stripMargin

  // ---------------------------------------------------------------- q247
  /** Post-stratified lift: strata = capped pre-period event count
    * (least(pre_events, 4)); lift = Σ_s (n_s/N)·(m_{t,s} − m_{c,s}),
    * reported next to the naive unstratified lift.
    */
  val q247: Q = (s, d) => {
    val pu = Graft.events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < CutDay, 1L).otherwise(0L)).as("preN"),
        sum(when(col("day") >= CutDay, col("vm")).otherwise(0L)).as("y1"))
      .withColumn("arm", expr("user_id % 2"))
      .withColumn("stratum", least(col("preN"), lit(4L)))
    val g = pu.groupBy(col("stratum"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("y1").cast("decimal(38,0)")).as("sy"))
      .localCheckpoint(true)
    val st = g.groupBy(col("stratum")).agg(sum(col("n")).as("ns"))
    val wide = g.where(col("arm") === 1)
      .select(col("stratum").as("s1"), col("n").as("ntr"), col("sy").as("syt"))
      .join(g.where(col("arm") === 0)
        .select(col("stratum").as("s0"), col("n").as("ncl"), col("sy").as("syc")),
        col("s1") === col("s0"))
      .join(st, col("s1") === col("stratum"))
    val tot = g.agg(sum(col("n")).as("nAll"),
      sum(when(col("arm") === 1, col("n")).otherwise(0L)).as("ntAll"),
      sum(when(col("arm") === 1, col("sy")).otherwise(lit(0).cast("decimal(38,0)")))
        .as("stAll"),
      sum(when(col("arm") === 0, col("n")).otherwise(0L)).as("ncAll"),
      sum(when(col("arm") === 0, col("sy")).otherwise(lit(0).cast("decimal(38,0)")))
        .as("scAll"))
    wide
      .agg(sum(expr(
        """CAST(ns AS DOUBLE) * (CAST(syt AS DOUBLE) / ntr
          |  - CAST(syc AS DOUBLE) / ncl)""".stripMargin)).as("wsum"),
        sum(col("ns")).as("nTot"), count(lit(1)).as("n_strata"))
      .crossJoin(broadcast(tot))
      .select(col("n_strata"), col("nTot").as("n_users"),
        expr("round(wsum / nTot / 1000000.0, 6)").as("stratified_lift"),
        expr("""round((CAST(stAll AS DOUBLE) / ntAll
                - CAST(scAll AS DOUBLE) / ncAll) / 1000000.0, 6)""")
          .as("naive_lift"))
  }

  val q247Sql: String =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 < $CutDay
       |      THEN 1 ELSE 0 END) AS BIGINT) AS pren,
       |    CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 >= $CutDay
       |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT)
       |      AS y1
       |  FROM events GROUP BY 1),
       |g AS MATERIALIZED (
       |  SELECT least(pren, 4) AS stratum, user_id % 2 AS arm,
       |    CAST(count(*) AS BIGINT) AS n, sum(y1::HUGEINT) AS sy
       |  FROM pu GROUP BY 1, 2),
       |st AS (SELECT stratum, CAST(sum(n) AS BIGINT) AS ns FROM g GROUP BY 1),
       |wide AS (
       |  SELECT t.stratum, t.n AS ntr, t.sy AS syt, c.n AS ncl, c.sy AS syc,
       |    st.ns
       |  FROM (SELECT * FROM g WHERE arm = 1) t
       |  JOIN (SELECT * FROM g WHERE arm = 0) c ON c.stratum = t.stratum
       |  JOIN st ON st.stratum = t.stratum),
       |tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS nall,
       |    CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS ntall,
       |    sum(CASE WHEN arm = 1 THEN sy ELSE 0 END) AS stall,
       |    CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS ncall,
       |    sum(CASE WHEN arm = 0 THEN sy ELSE 0 END) AS scall
       |  FROM g),
       |w AS (
       |  SELECT count(*) AS n_strata, CAST(sum(ns) AS BIGINT) AS ntot,
       |    sum(CAST(ns AS DOUBLE) * (CAST(syt AS DOUBLE) / ntr
       |      - CAST(syc AS DOUBLE) / ncl)) AS wsum
       |  FROM wide)
       |SELECT w.n_strata, w.ntot AS n_users,
       |  round(w.wsum / w.ntot / 1000000.0, 6) AS stratified_lift,
       |  round((CAST(tot.stall AS DOUBLE) / tot.ntall
       |    - CAST(tot.scall AS DOUBLE) / tot.ncall) / 1000000.0, 6)
       |    AS naive_lift
       |FROM w CROSS JOIN tot""".stripMargin

  // ---------------------------------------------------------------- q248
  /** Power analysis from observed post-period moments: users per arm
    * for 80% power at α = 0.05 two-sided to detect the observed lift —
    * n = 2·(1.96 + 0.8416)²·s²_pooled/δ², ceil on the identically-
    * computed double.
    */
  val q248: Q = (s, d) => {
    val c = cells(s, d, Long.MaxValue, CutDay)
    val t = c.where(col("arm") === 1).select(col("n").as("nt"),
      col("s1").as("t1"), col("s11").as("t11"))
    val ctl = c.where(col("arm") === 0).select(col("n").as("nc"),
      col("s1").as("c1"), col("s11").as("c11"))
    t.crossJoin(ctl)
      .select(col("nt"), col("nc"),
        expr("""round((CAST(t1 AS DOUBLE) / nt - CAST(c1 AS DOUBLE) / nc)
                / 1000000.0, 6)""").as("observed_lift"),
        expr(
          """CASE WHEN nt <= 1 OR nc <= 1
            |  OR CAST(t1 AS DOUBLE) / nt - CAST(c1 AS DOUBLE) / nc = 0
            |THEN NULL ELSE CAST(ceil(
            |  2.0 * (1.96 + 0.8416) * (1.96 + 0.8416)
            |    * ((CAST(nt * t11 - t1 * t1 AS DOUBLE)
            |         / (CAST(nt AS DOUBLE) * (nt - 1))
            |       + CAST(nc * c11 - c1 * c1 AS DOUBLE)
            |         / (CAST(nc AS DOUBLE) * (nc - 1))) / 2.0)
            |    / ((CAST(t1 AS DOUBLE) / nt - CAST(c1 AS DOUBLE) / nc)
            |       * (CAST(t1 AS DOUBLE) / nt - CAST(c1 AS DOUBLE) / nc)))
            |  AS BIGINT) END""".stripMargin).as("n_per_arm_80pct"))
  }

  val q248Sql: String =
    s"""WITH ${cellsSqlCte(Long.MaxValue, CutDay)}
       |SELECT t.n AS nt, c.n AS nc,
       |  round((CAST(t.s1 AS DOUBLE) / t.n - CAST(c.s1 AS DOUBLE) / c.n)
       |    / 1000000.0, 6) AS observed_lift,
       |  CASE WHEN t.n <= 1 OR c.n <= 1
       |    OR CAST(t.s1 AS DOUBLE) / t.n - CAST(c.s1 AS DOUBLE) / c.n = 0
       |  THEN NULL ELSE CAST(ceil(
       |    2.0 * (1.96 + 0.8416) * (1.96 + 0.8416)
       |      * ((CAST(t.n * t.s11 - t.s1 * t.s1 AS DOUBLE)
       |           / (CAST(t.n AS DOUBLE) * (t.n - 1))
       |         + CAST(c.n * c.s11 - c.s1 * c.s1 AS DOUBLE)
       |           / (CAST(c.n AS DOUBLE) * (c.n - 1))) / 2.0)
       |      / ((CAST(t.s1 AS DOUBLE) / t.n - CAST(c.s1 AS DOUBLE) / c.n)
       |         * (CAST(t.s1 AS DOUBLE) / t.n - CAST(c.s1 AS DOUBLE) / c.n)))
       |    AS BIGINT) END AS n_per_arm_80pct
       |FROM (SELECT * FROM cells WHERE arm = 1) t
       |CROSS JOIN (SELECT * FROM cells WHERE arm = 0) c""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q245_diff_in_diff", q245, Some(q245Sql)),
    ("q246_placebo_did", q246, Some(q246Sql)),
    ("q247_stratified_lift", q247, Some(q247Sql)),
    ("q248_power_analysis", q248, Some(q248Sql)))
}
