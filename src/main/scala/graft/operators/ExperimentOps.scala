package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Experiment analysis (round 6, twelfth pack): the A/B readout a
  * product team runs against the event stream — a two-proportion
  * z-test on conversion under a deterministic 50/50 user split (q189),
  * CUPED variance reduction from the pre-period covariate (q190), the
  * daily sample-ratio-mismatch guardrail (q191), and the conversion
  * lift with its Wald confidence interval (q192).
  *
  * The split is arm = user_id % 2 — deterministic, reproducible, and
  * identical across engines (non-negative ids). Pre/post periods cut
  * at the absolute epoch day 19738 (2024-01-16), computed as
  * us DIV 86400000000 on both sides.
  *
  * Scale notes (the 100 TB story): every query is one map-side-
  * combined per-user aggregation (the natural pre-shuffled key)
  * followed by a two-row (or per-day) arm rollup; no windows over
  * events, no joins. Covariance sums that grow with data volume are
  * carried in DECIMAL(38,0) / HUGEINT.
  *
  * Exactness: user/conversion/event counts are integers; per-user
  * value sums use exact micro-units (round(x·1e6) → BIGINT, the
  * q145/q157 rule); z, θ, ρ², and the CI bounds are single expressions
  * over identically-computed doubles (sqrt is IEEE-exact), rounded on
  * output; the significance flag is a comparison of identically-
  * computed doubles (q58's precedent); SRM χ² keeps an integer
  * numerator (n0−n1)².
  */
object ExperimentOps {
  import Relational.Q

  private val CutDay = 19738L // 2024-01-16

  /** Per-user rollup: arm, converted flag, pre/post micro-unit value
    * sums, event count.
    */
  private def users(s: SparkSession, d: String): DataFrame =
    Graft.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .withColumn("day", expr("us DIV 86400000000"))
      .withColumn("v_micro", expr("CAST(round(value * 1000000) AS BIGINT)"))
      .groupBy(col("user_id"))
      .agg(
        // any-purchase saturates at this event density (every user buys);
        // the discriminating conversion is >= 7 post-period purchases
        // (the per-user expectation over the 15-day post window)
        when(sum(when(col("event_type") === "purchase" && col("day") >= CutDay, 1L)
          .otherwise(0L)) >= 7L, 1L).otherwise(0L).as("converted"),
        sum(when(col("day") < CutDay, col("v_micro")).otherwise(0L)).as("x_pre"),
        sum(when(col("day") >= CutDay, col("v_micro")).otherwise(0L)).as("y_post"),
        count(lit(1)).as("n_events"))
      .withColumn("arm", expr("user_id % 2"))

  private val usersSqlCte: String =
    """u AS MATERIALIZED (
      |  SELECT user_id, user_id % 2 AS arm,
      |    CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase'
      |      AND epoch_us(ts) // 86400000000 >= 19738 THEN 1 ELSE 0 END) >= 7
      |      THEN 1 ELSE 0 END AS BIGINT) AS converted,
      |    CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 < 19738
      |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT) AS x_pre,
      |    CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 >= 19738
      |      THEN CAST(round(value * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT) AS y_post,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1)""".stripMargin

  /** Two-row arm table folded to one row of integer counts. */
  private def arms(s: SparkSession, d: String): DataFrame =
    users(s, d).agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 0L, col("converted")).otherwise(0L)).as("x0"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 1L, col("converted")).otherwise(0L)).as("x1"))

  private val armsSqlCte: String =
    """a AS (
      |  SELECT
      |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS x0,
      |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS x1
      |  FROM u)""".stripMargin

  // ---------------------------------------------------------------- q189
  /** Two-proportion z-test on user conversion between the arms (pooled
    * variance). One row: counts, rates, and z.
    */
  val q189: Q = (s, d) =>
    arms(s, d).select(col("n0"), col("x0"), col("n1"), col("x1"),
      round(col("x0").cast("double") / col("n0"), 6).as("p0"),
      round(col("x1").cast("double") / col("n1"), 6).as("p1"),
      // degeneracy guard (all or none converted → zero pooled variance):
      // an integer decision, identical both sides
      when(col("x0") + col("x1") > 0L && col("x0") + col("x1") < col("n0") + col("n1"),
        round((col("x1").cast("double") / col("n1") - col("x0").cast("double") / col("n0")) /
          sqrt(((col("x0") + col("x1")).cast("double") / (col("n0") + col("n1"))) *
            (lit(1.0) - (col("x0") + col("x1")).cast("double") / (col("n0") + col("n1"))) *
            (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 6)).as("z"))

  val q189Sql: String =
    s"""WITH $usersSqlCte,
       |$armsSqlCte
       |SELECT n0, x0, n1, x1,
       |  round(CAST(x0 AS DOUBLE) / n0, 6) AS p0,
       |  round(CAST(x1 AS DOUBLE) / n1, 6) AS p1,
       |  CASE WHEN x0 + x1 > 0 AND x0 + x1 < n0 + n1 THEN
       |    round((CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0) /
       |      sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1)) *
       |        (1.0 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1)) *
       |        (1.0 / n0 + 1.0 / n1)), 6) END AS z
       |FROM a""".stripMargin

  // ---------------------------------------------------------------- q190
  /** CUPED (controlled-experiment using pre-experiment data): θ =
    * cov(X,Y)/var(X) from the pre-period covariate, the X–Y correlation
    * ρ², and the adjusted-metric variance var(Y)·(1−ρ²) — how much
    * variance the covariate removes. Decimal-exact sums, single
    * divisions rounded on output.
    */
  val q190: Q = (s, d) => {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val sums = users(s, d).agg(
      count(lit(1)).as("n"),
      sum(dec(col("x_pre"))).as("sx"), sum(dec(col("y_post"))).as("sy"),
      sum(dec(col("x_pre")) * dec(col("x_pre"))).as("sxx"),
      sum(dec(col("y_post")) * dec(col("y_post"))).as("syy"),
      sum(dec(col("x_pre")) * dec(col("y_post"))).as("sxy"))
    val nD = col("n").cast("decimal(38,0)")
    val covN = nD * col("sxy") - col("sx") * col("sy")
    val varXN = nD * col("sxx") - col("sx") * col("sx")
    val varYN = nD * col("syy") - col("sy") * col("sy")
    sums.select(col("n"),
        round(covN.cast("double") / varXN.cast("double"), 6).as("theta"),
        round((covN.cast("double") * covN.cast("double")) /
          (varXN.cast("double") * varYN.cast("double")), 6).as("rho2"),
        // variances in (whole-unit)² — micro² / 1e12 / n²
        round(varYN.cast("double") / (nD * nD).cast("double") / lit(1.0e12), 6)
          .as("var_y"),
        round(varYN.cast("double") / (nD * nD).cast("double") / lit(1.0e12) *
          (lit(1.0) - (covN.cast("double") * covN.cast("double")) /
            (varXN.cast("double") * varYN.cast("double"))), 6).as("var_y_adj"))
  }

  val q190Sql: String =
    s"""WITH $usersSqlCte,
       |s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    sum(x_pre::HUGEINT) AS sx, sum(y_post::HUGEINT) AS sy,
       |    sum(x_pre::HUGEINT * x_pre::HUGEINT) AS sxx,
       |    sum(y_post::HUGEINT * y_post::HUGEINT) AS syy,
       |    sum(x_pre::HUGEINT * y_post::HUGEINT) AS sxy
       |  FROM u)
       |SELECT n,
       |  round(CAST(n::HUGEINT * sxy - sx * sy AS DOUBLE)
       |    / CAST(n::HUGEINT * sxx - sx * sx AS DOUBLE), 6) AS theta,
       |  round((CAST(n::HUGEINT * sxy - sx * sy AS DOUBLE) *
       |      CAST(n::HUGEINT * sxy - sx * sy AS DOUBLE)) /
       |    (CAST(n::HUGEINT * sxx - sx * sx AS DOUBLE) *
       |      CAST(n::HUGEINT * syy - sy * sy AS DOUBLE)), 6) AS rho2,
       |  round(CAST(n::HUGEINT * syy - sy * sy AS DOUBLE)
       |    / CAST(n::HUGEINT * n::HUGEINT AS DOUBLE) / 1.0e12, 6) AS var_y,
       |  round(CAST(n::HUGEINT * syy - sy * sy AS DOUBLE)
       |    / CAST(n::HUGEINT * n::HUGEINT AS DOUBLE) / 1.0e12 *
       |    (1.0 - (CAST(n::HUGEINT * sxy - sx * sy AS DOUBLE) *
       |        CAST(n::HUGEINT * sxy - sx * sy AS DOUBLE)) /
       |      (CAST(n::HUGEINT * sxx - sx * sx AS DOUBLE) *
       |        CAST(n::HUGEINT * syy - sy * sy AS DOUBLE))), 6) AS var_y_adj
       |FROM s""".stripMargin

  // ---------------------------------------------------------------- q191
  /** Daily sample-ratio-mismatch guardrail: per day, event traffic per
    * arm and the χ² statistic against the designed 50/50 split —
    * integer numerator (e0−e1)², one division, flag at the 3.841
    * (α=0.05, df=1) bar on the identically-computed double.
    */
  val q191: Q = (s, d) =>
    Graft.events(s, d)
      .select(unix_micros(col("ts")).as("us"), col("user_id"))
      .withColumn("day", expr("us DIV 86400000000"))
      .withColumn("arm", expr("user_id % 2"))
      .groupBy(col("day"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("e0"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("e1"))
      .select(col("day"), col("e0"), col("e1"),
        round(((col("e0") - col("e1")) * (col("e0") - col("e1"))).cast("double")
          / (col("e0") + col("e1")), 6).as("chi2"),
        (((col("e0") - col("e1")) * (col("e0") - col("e1"))).cast("double")
          / (col("e0") + col("e1")) > 3.841).as("srm_flag"))
      .orderBy("day")

  val q191Sql: String =
    """WITH dd AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS e0,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS e1
      |  FROM events GROUP BY 1)
      |SELECT CAST(day AS BIGINT) AS day, e0, e1,
      |  round(CAST((e0 - e1) * (e0 - e1) AS DOUBLE) / (e0 + e1), 6) AS chi2,
      |  CAST((e0 - e1) * (e0 - e1) AS DOUBLE) / (e0 + e1) > 3.841 AS srm_flag
      |FROM dd ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q192
  /** Conversion lift with the 95% Wald interval: absolute and relative
    * lift, unpooled standard error, CI bounds, and the significance
    * flag — all single expressions over identically-computed doubles.
    */
  val q192: Q = (s, d) => {
    val p0 = col("x0").cast("double") / col("n0")
    val p1 = col("x1").cast("double") / col("n1")
    val se = sqrt(p1 * (lit(1.0) - p1) / col("n1") + p0 * (lit(1.0) - p0) / col("n0"))
    arms(s, d).select(
      round(p0, 6).as("p0"), round(p1, 6).as("p1"),
      round(p1 - p0, 6).as("lift_abs"),
      when(col("x0") > 0L, round((p1 - p0) / p0, 6)).as("lift_rel"),
      round(se, 6).as("se"),
      round(p1 - p0 - lit(1.96) * se, 6).as("ci_lo"),
      round(p1 - p0 + lit(1.96) * se, 6).as("ci_hi"),
      (abs(p1 - p0) > lit(1.96) * se).as("significant"))
  }

  val q192Sql: String =
    s"""WITH $usersSqlCte,
       |$armsSqlCte
       |SELECT
       |  round(CAST(x0 AS DOUBLE) / n0, 6) AS p0,
       |  round(CAST(x1 AS DOUBLE) / n1, 6) AS p1,
       |  round(CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0, 6) AS lift_abs,
       |  CASE WHEN x0 > 0 THEN
       |    round((CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
       |      / (CAST(x0 AS DOUBLE) / n0), 6) END AS lift_rel,
       |  round(sqrt((CAST(x1 AS DOUBLE) / n1) * (1.0 - CAST(x1 AS DOUBLE) / n1) / n1
       |    + (CAST(x0 AS DOUBLE) / n0) * (1.0 - CAST(x0 AS DOUBLE) / n0) / n0), 6) AS se,
       |  round(CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0
       |    - 1.96 * sqrt((CAST(x1 AS DOUBLE) / n1) * (1.0 - CAST(x1 AS DOUBLE) / n1) / n1
       |      + (CAST(x0 AS DOUBLE) / n0) * (1.0 - CAST(x0 AS DOUBLE) / n0) / n0), 6) AS ci_lo,
       |  round(CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0
       |    + 1.96 * sqrt((CAST(x1 AS DOUBLE) / n1) * (1.0 - CAST(x1 AS DOUBLE) / n1) / n1
       |      + (CAST(x0 AS DOUBLE) / n0) * (1.0 - CAST(x0 AS DOUBLE) / n0) / n0), 6) AS ci_hi,
       |  abs(CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
       |    > 1.96 * sqrt((CAST(x1 AS DOUBLE) / n1) * (1.0 - CAST(x1 AS DOUBLE) / n1) / n1
       |      + (CAST(x0 AS DOUBLE) / n0) * (1.0 - CAST(x0 AS DOUBLE) / n0) / n0)
       |    AS significant
       |FROM a""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q189_ab_ztest", q189, Some(q189Sql)),
    ("q190_cuped", q190, Some(q190Sql)),
    ("q191_srm_daily", q191, Some(q191Sql)),
    ("q192_lift_ci", q192, Some(q192Sql)))
}
