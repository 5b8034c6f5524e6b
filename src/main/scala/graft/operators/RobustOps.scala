package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Robust statistics (round 6, tenth pack): the outlier-resistant
  * per-source profile of document length a curation team reads before
  * setting length filters — the five-number summary (q181), MAD and
  * Tukey-fence outlier counts (q182), trimmed and winsorized means
  * (q183), and exact moment-based skewness/kurtosis (q184).
  *
  * Scale notes (the 100 TB story): every query runs on the shared
  * per-(source, length) COUNT table — bounded by #distinct lengths per
  * source, never by documents (memoized + localCheckpoint'd; one
  * map-side-combined pass builds it). Order statistics are closed-form
  * rank selections over the count table's cumulative column (q122's
  * no-global-sort discipline); nothing sorts documents. Power sums
  * that grow with corpus size are carried in DECIMAL(38,0) (HUGEINT
  * oracle-side).
  *
  * Exactness: lengths, counts, ranks, order statistics, IQR, fences
  * (doubled to stay integer: 2v < 2q1 − 3·iqr), and outlier counts are
  * integers end-to-end; trimmed/winsorized sums use the exact
  * clamp-overlap formula v·max(0, min(c, k − cumPrev)); the moment
  * numerators are exact decimal polynomials in the raw power sums,
  * divided once (sqrt is IEEE-exact) and rounded on output.
  */
object RobustOps {
  import Relational.Q

  /** Shared per-(source, length) count table with cumulative counts and
    * the per-source total: (source, v, c, cprev, cum, n).
    */
  private val lenCountsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def lenCounts(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(lenCountsMemo, s, d) {
      val cnt = Graft.table(s, d, "documents")
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("source")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.partitionBy(col("source")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy(col("source"))
      cnt
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("cprev", coalesce(sum(col("c")).over(wPrev), lit(0L)))
        .withColumn("n", sum(col("c")).over(wAll))
        .localCheckpoint(true)
    }

  private val lenCountsSqlCte: String =
    """lc AS MATERIALIZED (
      |  SELECT source, v, c,
      |    CAST(sum(c) OVER w AS BIGINT) AS cum,
      |    CAST(coalesce(sum(c) OVER (PARTITION BY source ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cprev,
      |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
      |  FROM (
      |    SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      |    FROM documents GROUP BY 1, 2)
      |  WINDOW w AS (PARTITION BY source ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""".stripMargin

  /** Lower-median / type-1 quantile ranks: q1 at max(1, (n+1) DIV 4),
    * med at (n+1) DIV 2, q3 at min(n, (3*(n+1)) DIV 4); the k-th order
    * statistic is min v with cum >= k.
    */
  private val quartilesSqlCte: String =
    """qs AS (
      |  SELECT source, CAST(max(n) AS BIGINT) AS n,
      |    CAST(min(v) AS BIGINT) AS v_min, CAST(max(v) AS BIGINT) AS v_max,
      |    CAST(min(CASE WHEN cum >= greatest(1, (n + 1) // 4) THEN v END) AS BIGINT) AS q1,
      |    CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS BIGINT) AS med,
      |    CAST(min(CASE WHEN cum >= least(n, (3 * (n + 1)) // 4) THEN v END) AS BIGINT) AS q3
      |  FROM lc GROUP BY source)""".stripMargin

  private val quartilesMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def quartiles(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(quartilesMemo, s, d)(quartilesUncached(s, d).localCheckpoint(true))

  private def quartilesUncached(s: SparkSession, d: String): DataFrame =
    lenCounts(s, d).groupBy(col("source"))
      .agg(max(col("n")).as("n"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"),
        min(when(col("cum") >= greatest(lit(1L), expr("(n + 1) DIV 4")), col("v")))
          .as("q1"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v"))).as("med"),
        min(when(col("cum") >= least(col("n"), expr("(3 * (n + 1)) DIV 4")), col("v")))
          .as("q3"))

  // ---------------------------------------------------------------- q181
  /** Five-number summary of document length per source (type-1 / lower
    * quantiles via closed-form rank selection) plus the IQR — all
    * integers, no sort of documents anywhere.
    */
  val q181: Q = (s, d) =>
    quartiles(s, d)
      .select(col("source"), col("n"), col("v_min"), col("q1"), col("med"),
        col("q3"), col("v_max"), (col("q3") - col("q1")).as("iqr"))
      .orderBy("source")

  val q181Sql: String =
    s"""WITH $lenCountsSqlCte,
       |$quartilesSqlCte
       |SELECT source, n, v_min, q1, med, q3, v_max,
       |  CAST(q3 - q1 AS BIGINT) AS iqr
       |FROM qs ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q182
  /** MAD (median absolute deviation from the lower median, itself a
    * lower median) and Tukey-fence outlier counts per source. Fences
    * stay integer by doubling: v is an outlier low iff
    * 2v < 2·q1 − 3·iqr, high iff 2v > 2·q3 + 3·iqr.
    */
  val q182: Q = (s, d) => {
    val lc = lenCounts(s, d)
    val qs = quartiles(s, d)
    val dev = lc.join(qs.select(col("source").as("qsrc"), col("med"),
        col("q1"), col("q3"), col("n").as("nn")), col("source") === col("qsrc"))
      .withColumn("dv", abs(col("v") - col("med")))
      .groupBy(col("source"), col("dv"))
      .agg(sum(col("c")).as("c"), max(col("nn")).as("nn"))
    val wD = Window.partitionBy(col("source")).orderBy(col("dv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = dev.withColumn("dcum", sum(col("c")).over(wD))
      .groupBy(col("source"))
      .agg(min(when(col("dcum") >= expr("(nn + 1) DIV 2"), col("dv"))).as("mad"))
    val fences = lc.join(qs.select(col("source").as("qsrc"), col("q1"), col("q3")),
        col("source") === col("qsrc"))
      .withColumn("iqr", col("q3") - col("q1"))
      .groupBy(col("source"))
      .agg(
        sum(when(lit(2L) * col("v") < lit(2L) * col("q1") - lit(3L) * col("iqr"),
          col("c")).otherwise(0L)).as("n_low"),
        sum(when(lit(2L) * col("v") > lit(2L) * col("q3") + lit(3L) * col("iqr"),
          col("c")).otherwise(0L)).as("n_high"))
    mad.join(fences, Seq("source"))
      .select(col("source"), col("mad"), col("n_low"), col("n_high"))
      .orderBy("source")
  }

  val q182Sql: String =
    s"""WITH $lenCountsSqlCte,
       |$quartilesSqlCte,
       |dev AS (
       |  SELECT l.source, abs(l.v - q.med) AS dv,
       |    CAST(sum(l.c) AS BIGINT) AS c, max(q.n) AS nn
       |  FROM lc l JOIN qs q ON q.source = l.source
       |  GROUP BY 1, 2),
       |dcm AS (
       |  SELECT *, CAST(sum(c) OVER (PARTITION BY source ORDER BY dv
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS dcum
       |  FROM dev),
       |mad AS (
       |  SELECT source,
       |    CAST(min(CASE WHEN dcum >= (nn + 1) // 2 THEN dv END) AS BIGINT) AS mad
       |  FROM dcm GROUP BY 1),
       |fen AS (
       |  SELECT l.source,
       |    CAST(sum(CASE WHEN 2 * l.v < 2 * q.q1 - 3 * (q.q3 - q.q1)
       |      THEN l.c ELSE 0 END) AS BIGINT) AS n_low,
       |    CAST(sum(CASE WHEN 2 * l.v > 2 * q.q3 + 3 * (q.q3 - q.q1)
       |      THEN l.c ELSE 0 END) AS BIGINT) AS n_high
       |  FROM lc l JOIN qs q ON q.source = l.source GROUP BY 1)
       |SELECT m.source, m.mad, f.n_low, f.n_high
       |FROM mad m JOIN fen f USING (source) ORDER BY m.source""".stripMargin

  // ---------------------------------------------------------------- q183
  /** 10%-trimmed and 10%-winsorized mean length per source via the
    * exact clamp-overlap decomposition over the count table: the
    * bottom-k mass of a tie run is max(0, min(c, k − cprev)); the
    * winsorized tails clamp to the (k+1)-th and (n−k)-th order
    * statistics. Integer sums, one division each, rounded on output.
    */
  val q183: Q = (s, d) => {
    val lc = lenCounts(s, d).withColumn("k", expr("n DIV 10"))
    val base = lc.groupBy(col("source"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        sum(col("v") * col("c")).as("s_all"),
        // bottom-k and top-k exact masses
        sum(col("v") * greatest(lit(0L), least(col("c"), col("k") - col("cprev"))))
          .as("s_bot"),
        sum(col("v") * greatest(lit(0L), least(col("c"), col("cum") - (col("n") - col("k")))))
          .as("s_top"),
        // clamp values: (k+1)-th and (n-k)-th order statistics
        min(when(col("cum") >= col("k") + 1L, col("v"))).as("v_lo"),
        min(when(col("cum") >= col("n") - col("k"), col("v"))).as("v_hi"))
    base.select(col("source"), col("n"), col("k"),
        round((col("s_all") - col("s_bot") - col("s_top")).cast("double")
          / (col("n") - lit(2L) * col("k")).cast("double"), 6).as("trimmed_mean"),
        round((col("s_all") - col("s_bot") - col("s_top") +
            col("k") * (col("v_lo") + col("v_hi"))).cast("double")
          / col("n").cast("double"), 6).as("winsorized_mean"))
      .orderBy("source")
  }

  val q183Sql: String =
    s"""WITH $lenCountsSqlCte,
       |kk AS (SELECT *, n // 10 AS k FROM lc),
       |base AS (
       |  SELECT source, CAST(max(n) AS BIGINT) AS n, CAST(max(k) AS BIGINT) AS k,
       |    CAST(sum(v * c) AS BIGINT) AS s_all,
       |    CAST(sum(v * greatest(0, least(c, k - cprev))) AS BIGINT) AS s_bot,
       |    CAST(sum(v * greatest(0, least(c, cum - (n - k)))) AS BIGINT) AS s_top,
       |    CAST(min(CASE WHEN cum >= k + 1 THEN v END) AS BIGINT) AS v_lo,
       |    CAST(min(CASE WHEN cum >= n - k THEN v END) AS BIGINT) AS v_hi
       |  FROM kk GROUP BY 1)
       |SELECT source, n, k,
       |  round(CAST(s_all - s_bot - s_top AS DOUBLE)
       |    / CAST(n - 2 * k AS DOUBLE), 6) AS trimmed_mean,
       |  round(CAST(s_all - s_bot - s_top + k * (v_lo + v_hi) AS DOUBLE)
       |    / CAST(n AS DOUBLE), 6) AS winsorized_mean
       |FROM base ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q184
  /** Exact moment-based shape per source: population variance, skewness
    * g1, and excess kurtosis g2 from raw power sums S1..S4 carried in
    * DECIMAL — the central-moment numerators are exact integer
    * polynomials; each statistic is one division over identically-
    * computed doubles (sqrt exact), rounded on output.
    */
  val q184: Q = (s, d) => {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val sums = lenCounts(s, d).groupBy(col("source"))
      .agg(max(col("n")).as("n"),
        sum(dec(col("v")) * dec(col("c"))).as("s1"),
        sum(dec(col("v")) * dec(col("v")) * dec(col("c"))).as("s2"),
        sum(dec(col("v")) * dec(col("v")) * dec(col("v")) * dec(col("c"))).as("s3"),
        sum(dec(col("v")) * dec(col("v")) * dec(col("v")) * dec(col("v")) * dec(col("c")))
          .as("s4"))
    val nD = dec(col("n"))
    val m2num = nD * col("s2") - col("s1") * col("s1") // n²·m2
    val m3num = nD * nD * col("s3") - lit(3L).cast("decimal(38,0)") * nD * col("s2") * col("s1") +
      lit(2L).cast("decimal(38,0)") * col("s1") * col("s1") * col("s1") // n³·m3
    val m4num = nD * nD * nD * col("s4") -
      lit(4L).cast("decimal(38,0)") * nD * nD * col("s3") * col("s1") +
      lit(6L).cast("decimal(38,0)") * nD * col("s2") * col("s1") * col("s1") -
      lit(3L).cast("decimal(38,0)") * col("s1") * col("s1") * col("s1") * col("s1") // n⁴·m4
    sums.select(col("source"), col("n"),
        round(col("s1").cast("double") / col("n").cast("double"), 6).as("mean"),
        round(m2num.cast("double") / (nD * nD).cast("double"), 6).as("var_pop"),
        // g1 = (n³·m3) / (n³ · m2^1.5); m2 as the identically-computed double
        round(m3num.cast("double") / ((nD * nD * nD).cast("double") *
          (m2num.cast("double") / (nD * nD).cast("double")) *
          sqrt(m2num.cast("double") / (nD * nD).cast("double"))), 6).as("skew"),
        round(m4num.cast("double") / ((nD * nD * nD * nD).cast("double") *
          (m2num.cast("double") / (nD * nD).cast("double")) *
          (m2num.cast("double") / (nD * nD).cast("double"))) - lit(3.0), 6)
          .as("kurt_excess"))
      .orderBy("source")
  }

  val q184Sql: String =
    s"""WITH $lenCountsSqlCte,
       |sums AS (
       |  SELECT source, CAST(max(n) AS BIGINT) AS n,
       |    sum(v::HUGEINT * c::HUGEINT) AS s1,
       |    sum(v::HUGEINT * v::HUGEINT * c::HUGEINT) AS s2,
       |    sum(v::HUGEINT * v::HUGEINT * v::HUGEINT * c::HUGEINT) AS s3,
       |    sum(v::HUGEINT * v::HUGEINT * v::HUGEINT * v::HUGEINT * c::HUGEINT) AS s4
       |  FROM lc GROUP BY 1)
       |SELECT source, n,
       |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
       |  round(CAST(n::HUGEINT * s2 - s1 * s1 AS DOUBLE)
       |    / CAST(n::HUGEINT * n::HUGEINT AS DOUBLE), 6) AS var_pop,
       |  round(CAST(n::HUGEINT * n::HUGEINT * s3 - 3::HUGEINT * n::HUGEINT * s2 * s1
       |      + 2::HUGEINT * s1 * s1 * s1 AS DOUBLE)
       |    / (CAST(n::HUGEINT * n::HUGEINT * n::HUGEINT AS DOUBLE) *
       |      (CAST(n::HUGEINT * s2 - s1 * s1 AS DOUBLE)
       |        / CAST(n::HUGEINT * n::HUGEINT AS DOUBLE)) *
       |      sqrt(CAST(n::HUGEINT * s2 - s1 * s1 AS DOUBLE)
       |        / CAST(n::HUGEINT * n::HUGEINT AS DOUBLE))), 6) AS skew,
       |  round(CAST(n::HUGEINT * n::HUGEINT * n::HUGEINT * s4
       |      - 4::HUGEINT * n::HUGEINT * n::HUGEINT * s3 * s1
       |      + 6::HUGEINT * n::HUGEINT * s2 * s1 * s1
       |      - 3::HUGEINT * s1 * s1 * s1 * s1 AS DOUBLE)
       |    / (CAST(n::HUGEINT * n::HUGEINT * n::HUGEINT * n::HUGEINT AS DOUBLE) *
       |      (CAST(n::HUGEINT * s2 - s1 * s1 AS DOUBLE)
       |        / CAST(n::HUGEINT * n::HUGEINT AS DOUBLE)) *
       |      (CAST(n::HUGEINT * s2 - s1 * s1 AS DOUBLE)
       |        / CAST(n::HUGEINT * n::HUGEINT AS DOUBLE))) - 3.0, 6) AS kurt_excess
       |FROM sums ORDER BY source""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q181_five_number", q181, Some(q181Sql)),
    ("q182_mad_fences", q182, Some(q182Sql)),
    ("q183_trimmed_means", q183, Some(q183Sql)),
    ("q184_moment_shape", q184, Some(q184Sql)))
}
