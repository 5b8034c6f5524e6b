package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier calibration (round 6, twenty-first pack): is the q105
  * quality classifier's probability trustworthy as a curation
  * threshold? — the reliability diagram (q225), ECE/MCE/Brier (q226),
  * ROC-AUC with exact midrank ties (q227), and the
  * precision/recall/F1 threshold sweep (q228).
  *
  * Input: `ClassifierOps.scoredMicro` — per-doc label y ∈ {0,1} and
  * the model probability as exact micro-units pm = round(σ(m)·1e6)
  * (one memoized training run feeds the whole pack). The oracle reads
  * the same integers from the `clf_scores` fixture: σ involves exp,
  * which can't be replayed bit-exactly across engines, so the
  * fixture-dump pattern (q131's rule) applies and everything
  * DOWNSTREAM of pm is re-derived independently.
  *
  * Scale notes (the 100 TB story): one corpus-sized pass feeds
  * 10-row bin tables (bins are pm DIV 1e5 — integer, threshold-
  * aligned, so q228's sweep is a reversed cumulative over the SAME
  * 10 rows, not a per-threshold corpus scan); q227's rank machinery
  * runs on the pm COUNT table (≤ 1e6+1 distinct values — bounded by
  * the micro grid, not by documents). Corpus-scale sums are carried
  * in DECIMAL(38,0)/HUGEINT (Σpm ≈ 10¹⁸ at 10¹² docs).
  *
  * Exactness: bins, thresholds, and tie ranks are integer decisions;
  * calibration gaps keep integer numerators (pos·1e6 − Σpm); Brier's
  * Σ(pm − y·1e6)² is an exact decimal; AUC uses the doubled-numerator
  * integer form Σ cb·(2·cumA_prev + ca) (q175's midrank discipline);
  * every double is a single division (or max of identically-computed
  * per-bin doubles), rounded on output.
  */
object CalibrationOps {
  import Relational.Q

  private val ScFixture =
    "read_parquet('/tmp/graft_fixtures/clf_scores/*.parquet')"

  private val BinsSqlCte: String =
    s"""sc AS (SELECT doc_id, y, pm FROM $ScFixture),
       |bins AS MATERIALIZED (
       |  SELECT least(pm // 100000, 9) AS bin,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS pos,
       |    sum(pm::HUGEINT) AS spm
       |  FROM sc GROUP BY 1)""".stripMargin

  private def bins(s: org.apache.spark.sql.SparkSession, d: String) =
    ClassifierOps.scoredMicro(s, d)
      .groupBy(expr("least(pm DIV 100000, 9)").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("pm").cast("decimal(38,0)")).as("spm"))

  // ---------------------------------------------------------------- q225
  /** Reliability diagram: per confidence bin, the count, observed
    * positive fraction, mean confidence, and the calibration gap
    * (integer numerator pos·1e6 − Σpm).
    */
  val q225: Q = (s, d) =>
    bins(s, d)
      .select(col("bin"), col("n").as("n_docs"), col("pos").as("n_pos"),
        round(col("pos").cast("double") / col("n"), 6).as("frac_pos"),
        round(col("spm").cast("double") / lit(1000000.0) / col("n"), 6)
          .as("avg_conf"),
        expr("""round(CAST(CAST(pos AS DECIMAL(38,0)) * 1000000 - spm
                  AS DOUBLE) / 1000000.0 / n, 6)""").as("gap"))
      .orderBy("bin")

  val q225Sql: String =
    s"""WITH $BinsSqlCte
       |SELECT bin, n AS n_docs, pos AS n_pos,
       |  round(CAST(pos AS DOUBLE) / n, 6) AS frac_pos,
       |  round(CAST(spm AS DOUBLE) / 1000000.0 / n, 6) AS avg_conf,
       |  round(CAST(pos::HUGEINT * 1000000 - spm AS DOUBLE)
       |    / 1000000.0 / n, 6) AS gap
       |FROM bins ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q226
  /** Scalar calibration summary: ECE (integer numerator
    * Σ_b |pos_b·1e6 − Σpm_b|), MCE (max per-bin gap), and the Brier
    * score (exact decimal Σ(pm − y·1e6)²).
    */
  val q226: Q = (s, d) => {
    val b = bins(s, d)
      .select(col("n"), col("pos"), col("spm"),
        expr("abs(CAST(pos AS DECIMAL(38,0)) * 1000000 - spm)").as("adev"))
      .agg(sum(col("n")).as("nn"), sum(col("adev")).as("eceNum"),
        max(expr("CAST(adev AS DOUBLE) / 1000000.0 / n")).as("mce"))
    val brier = ClassifierOps.scoredMicro(s, d)
      .agg(sum(expr(
        "CAST((pm - y * 1000000) * (pm - y * 1000000) AS DECIMAL(38,0))"))
        .as("bNum"))
    b.crossJoin(brier)
      .select(col("nn").as("n_docs"),
        round(col("eceNum").cast("double") / lit(1000000.0) / col("nn"), 6)
          .as("ece"),
        round(col("mce"), 6).as("mce"),
        round(col("bNum").cast("double") / lit(1.0e12) / col("nn"), 6)
          .as("brier"))
  }

  val q226Sql: String =
    s"""WITH $BinsSqlCte,
       |e AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS nn,
       |    sum(abs(pos::HUGEINT * 1000000 - spm)) AS ecenum,
       |    max(CAST(abs(pos::HUGEINT * 1000000 - spm) AS DOUBLE)
       |      / 1000000.0 / n) AS mce
       |  FROM bins),
       |b AS (
       |  SELECT sum(((pm - y * 1000000) * (pm - y * 1000000))::HUGEINT)
       |    AS bnum
       |  FROM sc)
       |SELECT e.nn AS n_docs,
       |  round(CAST(e.ecenum AS DOUBLE) / 1000000.0 / e.nn, 6) AS ece,
       |  round(e.mce, 6) AS mce,
       |  round(CAST(b.bnum AS DOUBLE) / 1e12 / e.nn, 6) AS brier
       |FROM e CROSS JOIN b""".stripMargin

  // ---------------------------------------------------------------- q227
  /** ROC-AUC over the pm count table with exact midrank tie handling:
    * 2·numerator = Σ_v cb(v)·(2·cumA(v−) + ca(v)); Gini = 2·AUC − 1.
    */
  val q227: Q = (s, d) => {
    val sc = ClassifierOps.scoredMicro(s, d)
    val cnt = sc.groupBy(col("pm"))
      .agg(sum(lit(1L) - col("y")).as("ca"), sum(col("y")).as("cb"))
    val wPrev = Window.orderBy(col("pm"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cnt
      .withColumn("cumaPrev", coalesce(sum(col("ca")).over(wPrev), lit(0L)))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        sum((col("cb") * (lit(2L) * col("cumaPrev") + col("ca")))
          .cast("decimal(38,0)")).as("num2"))
      .select(col("nb").as("n_pos"), col("na").as("n_neg"),
        expr("""round(CASE WHEN na = 0 OR nb = 0 THEN NULL
                ELSE CAST(num2 AS DOUBLE)
                  / (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) END, 6)""")
          .as("auc"),
        expr("""round(CASE WHEN na = 0 OR nb = 0 THEN NULL
                ELSE CAST(num2 AS DOUBLE)
                  / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) - 1.0 END, 6)""")
          .as("gini"))
  }

  val q227Sql: String =
    s"""WITH sc AS (SELECT y, pm FROM $ScFixture),
       |cnt AS (
       |  SELECT pm, CAST(sum(1 - y) AS BIGINT) AS ca,
       |    CAST(sum(y) AS BIGINT) AS cb,
       |    CAST(coalesce(sum(sum(1 - y)) OVER (ORDER BY pm
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cumaprev
       |  FROM sc GROUP BY 1),
       |a AS (
       |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
       |    sum((cb * (2 * cumaprev + ca))::HUGEINT) AS num2
       |  FROM cnt)
       |SELECT nb AS n_pos, na AS n_neg,
       |  round(CASE WHEN na = 0 OR nb = 0 THEN NULL
       |    ELSE CAST(num2 AS DOUBLE)
       |      / (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) END, 6) AS auc,
       |  round(CASE WHEN na = 0 OR nb = 0 THEN NULL
       |    ELSE CAST(num2 AS DOUBLE)
       |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) - 1.0 END, 6) AS gini
       |FROM a""".stripMargin

  // ---------------------------------------------------------------- q228
  /** Threshold sweep: precision/recall/F1 at t = 0.1 … 0.9. The
    * thresholds are bin-aligned (t·1e5 = bin boundary), so the sweep
    * is a reversed cumulative over the 10-row bin table.
    */
  val q228: Q = (s, d) => {
    val b = bins(s, d).localCheckpoint(true)
    val tot = b.agg(sum(col("n")).as("nall"), sum(col("pos")).as("pall"))
    val th = b.sparkSession.range(1, 10).select(col("id").as("t"))
    th.join(b, col("bin") >= col("t"))
      .groupBy(col("t"))
      .agg(sum(col("n")).as("predPos"), sum(col("pos")).as("tp"))
      .crossJoin(broadcast(tot))
      .select(round(col("t").cast("double") / 10.0, 6).as("threshold"),
        col("predPos").as("n_flagged"), col("tp").as("true_pos"),
        expr("""round(CASE WHEN predpos = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / predpos END, 6)""").as("precision"),
        expr("""round(CASE WHEN pall = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / pall END, 6)""").as("recall"),
        expr("""round(CASE WHEN 2 * tp + (predpos - tp) + (pall - tp) = 0
                THEN NULL
                ELSE 2.0 * CAST(tp AS DOUBLE)
                  / CAST(2 * tp + (predpos - tp) + (pall - tp) AS DOUBLE)
                END, 6)""").as("f1"))
      .orderBy("threshold")
  }

  val q228Sql: String =
    s"""WITH $BinsSqlCte,
       |tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS nall, CAST(sum(pos) AS BIGINT)
       |    AS pall
       |  FROM bins),
       |sw AS (
       |  SELECT t.t, CAST(sum(b.n) AS BIGINT) AS predpos,
       |    CAST(sum(b.pos) AS BIGINT) AS tp
       |  FROM generate_series(1, 9) AS t(t) JOIN bins b ON b.bin >= t.t
       |  GROUP BY 1)
       |SELECT round(CAST(s.t AS DOUBLE) / 10.0, 6) AS threshold,
       |  s.predpos AS n_flagged, s.tp AS true_pos,
       |  round(CASE WHEN s.predpos = 0 THEN NULL
       |    ELSE CAST(s.tp AS DOUBLE) / s.predpos END, 6) AS precision,
       |  round(CASE WHEN tot.pall = 0 THEN NULL
       |    ELSE CAST(s.tp AS DOUBLE) / tot.pall END, 6) AS recall,
       |  round(CASE WHEN 2 * s.tp + (s.predpos - s.tp) + (tot.pall - s.tp) = 0
       |    THEN NULL
       |    ELSE 2.0 * CAST(s.tp AS DOUBLE)
       |      / CAST(2 * s.tp + (s.predpos - s.tp) + (tot.pall - s.tp)
       |          AS DOUBLE) END, 6) AS f1
       |FROM sw s CROSS JOIN tot ORDER BY threshold""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q225_reliability_bins", q225, Some(q225Sql)),
    ("q226_calibration_summary", q226, Some(q226Sql)),
    ("q227_clf_auc", q227, Some(q227Sql)),
    ("q228_threshold_metrics", q228, Some(q228Sql)))
}
