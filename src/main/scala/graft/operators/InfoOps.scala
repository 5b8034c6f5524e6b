package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Supervised-signal diagnostics (round 6, twenty-seventh pack): how
  * much label signal a metadata column carries — source × language
  * mutual information (q249), the exact-Gini decision stump on
  * document length (q250), that stump's confusion matrix (q251), and
  * the Gini-gain curve at the length deciles (q252).
  *
  * Scale notes (the 100 TB story): q249 runs on the sources × langs
  * cell table (metadata); q250–q252 run on the length COUNT table —
  * bounded by the distinct-length domain, not by documents — with one
  * un-partitioned prefix window over that bounded table (the q175
  * ECDF discipline).
  *
  * Exactness: Gini impurities are RATIONAL — unlike entropy gain
  * there is no transcendental anywhere in q250–q252, so the gain is
  * an identically-computed double tree over exact integer prefix
  * counts and ranking on it is exact (q58's rule, v tiebreak); the
  * positive-side choice and decile thresholds are integer
  * cross-multiplications (pl·nr vs pr·nl; cum·10 vs k·N). q249 is the
  * pack's one ln query: MI/H/NMI sums of ~|sources|·|langs| ln terms
  * appear in OUTPUT columns only, rounded at 6 (q133's rule — no
  * comparison ever reads them).
  */
object InfoOps {
  import Relational.Q

  // ---------------------------------------------------------------- q249
  /** Source × language mutual information: MI, the two marginal
    * entropies, and NMI = MI/√(H_s·H_l) — all in nats, output-rounded.
    */
  val q249: Q = (s, d) => {
    val docs = Graft.table(s, d, "documents")
    val cells = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val ms = cells.groupBy(col("source")).agg(sum(col("c")).as("cs"))
    val ml = cells.groupBy(col("lang").as("lg")).agg(sum(col("c")).as("cl"))
    val n = cells.agg(sum(col("c")).as("nn"))
    val mi = cells.join(ms, Seq("source")).join(ml, col("lang") === col("lg"))
      .crossJoin(broadcast(n))
      .agg(sum(expr(
        """CAST(c AS DOUBLE) / nn
          |  * ln(CAST(c AS DOUBLE) * nn / (CAST(cs AS DOUBLE) * cl))"""
          .stripMargin)).as("mi"))
    val hs = ms.crossJoin(broadcast(n))
      .agg(sum(expr(
        "-(CAST(cs AS DOUBLE) / nn) * ln(CAST(cs AS DOUBLE) / nn)")).as("hs"))
    val hl = ml.crossJoin(broadcast(n))
      .agg(sum(expr(
        "-(CAST(cl AS DOUBLE) / nn) * ln(CAST(cl AS DOUBLE) / nn)")).as("hl"))
    mi.crossJoin(hs).crossJoin(hl).crossJoin(broadcast(n))
      .select(col("nn").as("n_docs"), round(col("mi"), 6).as("mi_nats"),
        round(col("hs"), 6).as("h_source"), round(col("hl"), 6).as("h_lang"),
        expr("""round(CASE WHEN hs * hl <= 0 THEN NULL
                ELSE mi / sqrt(hs * hl) END, 6)""").as("nmi"))
  }

  val q249Sql: String =
    """WITH cells AS MATERIALIZED (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |ms AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM cells GROUP BY 1),
      |ml AS (SELECT lang AS lg, CAST(sum(c) AS BIGINT) AS cl FROM cells GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells),
      |mi AS (
      |  SELECT sum(CAST(ce.c AS DOUBLE) / n.nn
      |    * ln(CAST(ce.c AS DOUBLE) * n.nn / (CAST(ms.cs AS DOUBLE) * ml.cl)))
      |    AS mi
      |  FROM cells ce JOIN ms ON ms.source = ce.source
      |  JOIN ml ON ml.lg = ce.lang CROSS JOIN n),
      |hs AS (
      |  SELECT sum(-(CAST(cs AS DOUBLE) / n.nn) * ln(CAST(cs AS DOUBLE) / n.nn))
      |    AS hs
      |  FROM ms CROSS JOIN n),
      |hl AS (
      |  SELECT sum(-(CAST(cl AS DOUBLE) / n.nn) * ln(CAST(cl AS DOUBLE) / n.nn))
      |    AS hl
      |  FROM ml CROSS JOIN n)
      |SELECT n.nn AS n_docs, round(mi.mi, 6) AS mi_nats,
      |  round(hs.hs, 6) AS h_source, round(hl.hl, 6) AS h_lang,
      |  round(CASE WHEN hs.hs * hl.hl <= 0 THEN NULL
      |    ELSE mi.mi / sqrt(hs.hs * hl.hl) END, 6) AS nmi
      |FROM mi CROSS JOIN hs CROSS JOIN hl CROSS JOIN n""".stripMargin

  // ------------------------------------------------- length count table
  /** Length count table with prefix sums: v, c, cpos, cum, cumpos, n, p
    * — bounded by the distinct-length domain.
    */
  private def lenTable(s: SparkSession, d: String): DataFrame = {
    val cnt = Graft.table(s, d, "documents")
      .groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cpos"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    cnt
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("cumpos", sum(col("cpos")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("p", sum(col("cpos")).over(wAll))
  }

  private val LenSqlCte: String =
    """lt AS MATERIALIZED (
      |  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cpos,
      |    CAST(sum(count(*)) OVER (ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(sum(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END))
      |      OVER (ORDER BY n_chars
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cumpos,
      |    CAST(sum(count(*)) OVER () AS BIGINT) AS n,
      |    CAST(sum(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)) OVER ()
      |      AS BIGINT) AS p
      |  FROM documents GROUP BY 1)""".stripMargin

  /** Per-threshold Gini gain expression (shared literally): parent
    * impurity minus the weighted child impurities, all from integer
    * prefix counts.
    */
  private val GainExpr: String =
    """(1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
      |     - (CAST(n - p AS DOUBLE) / n) * (CAST(n - p AS DOUBLE) / n))
      |  - (CAST(cum AS DOUBLE) / n)
      |    * (1.0 - (CAST(cumpos AS DOUBLE) / cum) * (CAST(cumpos AS DOUBLE) / cum)
      |           - (CAST(cum - cumpos AS DOUBLE) / cum)
      |             * (CAST(cum - cumpos AS DOUBLE) / cum))
      |  - (CAST(n - cum AS DOUBLE) / n)
      |    * (1.0 - (CAST(p - cumpos AS DOUBLE) / (n - cum))
      |             * (CAST(p - cumpos AS DOUBLE) / (n - cum))
      |           - (CAST((n - cum) - (p - cumpos) AS DOUBLE) / (n - cum))
      |             * (CAST((n - cum) - (p - cumpos) AS DOUBLE) / (n - cum)))"""
      .stripMargin

  // ---------------------------------------------------------------- q250
  /** Decision stump: the n_chars threshold (left = ≤ v) with the
    * maximum Gini gain for predicting lang = 'en' — ranked on the
    * identically-computed rational gain with the v tiebreak.
    */
  val q250: Q = (s, d) =>
    lenTable(s, d)
      .where(col("cum") < col("n")) // both sides non-empty
      .withColumn("gain", expr(GainExpr))
      .orderBy(col("gain").desc, col("v"))
      .limit(1)
      .select(col("v").as("threshold"), col("cum").as("n_left"),
        (col("n") - col("cum")).as("n_right"), col("cumpos").as("pos_left"),
        (col("p") - col("cumpos")).as("pos_right"),
        round(expr(
          """1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
            |    - (CAST(n - p AS DOUBLE) / n) * (CAST(n - p AS DOUBLE) / n)"""
            .stripMargin), 6).as("parent_gini"),
        round(col("gain"), 6).as("gini_gain"))

  val q250Sql: String =
    s"""WITH $LenSqlCte
       |SELECT v AS threshold, cum AS n_left,
       |  CAST(n - cum AS BIGINT) AS n_right, cumpos AS pos_left,
       |  CAST(p - cumpos AS BIGINT) AS pos_right,
       |  round(1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
       |      - (CAST(n - p AS DOUBLE) / n) * (CAST(n - p AS DOUBLE) / n), 6)
       |    AS parent_gini,
       |  round($GainExpr, 6) AS gini_gain
       |FROM lt WHERE cum < n
       |ORDER BY $GainExpr DESC, v LIMIT 1""".stripMargin

  // ---------------------------------------------------------------- q251
  /** The chosen stump's confusion matrix: the positive side is picked
    * by the integer cross-multiplication pl·nr ≥ pr·nl; counts are
    * integers, metrics single divisions.
    */
  val q251: Q = (s, d) => {
    val best = lenTable(s, d)
      .where(col("cum") < col("n"))
      .withColumn("gain", expr(GainExpr))
      .orderBy(col("gain").desc, col("v"))
      .limit(1)
      .select(col("v"), col("cum").as("nl"), col("cumpos").as("pl"),
        (col("n") - col("cum")).as("nr"), (col("p") - col("cumpos")).as("pr"),
        col("n"), col("p"))
    best
      .withColumn("leftPos",
        expr("CAST(pl AS DECIMAL(38,0)) * nr >= CAST(pr AS DECIMAL(38,0)) * nl"))
      .select(col("v").as("threshold"),
        when(col("leftPos"), lit("len_le_threshold"))
          .otherwise(lit("len_gt_threshold")).as("positive_side"),
        when(col("leftPos"), col("pl")).otherwise(col("pr")).as("tp"),
        when(col("leftPos"), col("nl") - col("pl"))
          .otherwise(col("nr") - col("pr")).as("fp"),
        when(col("leftPos"), col("pr")).otherwise(col("pl")).as("fn"),
        when(col("leftPos"), col("nr") - col("pr"))
          .otherwise(col("nl") - col("pl")).as("tn"))
      .withColumn("accuracy", expr("round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6)"))
      .withColumn("precision", expr(
        "round(CASE WHEN tp + fp = 0 THEN NULL ELSE CAST(tp AS DOUBLE) / (tp + fp) END, 6)"))
      .withColumn("recall", expr(
        "round(CASE WHEN tp + fn = 0 THEN NULL ELSE CAST(tp AS DOUBLE) / (tp + fn) END, 6)"))
  }

  val q251Sql: String =
    s"""WITH $LenSqlCte,
       |best AS (
       |  SELECT v, cum AS nl, cumpos AS pl,
       |    CAST(n - cum AS BIGINT) AS nr, CAST(p - cumpos AS BIGINT) AS pr
       |  FROM lt WHERE cum < n
       |  ORDER BY $GainExpr DESC, v LIMIT 1),
       |cm AS (
       |  SELECT v AS threshold,
       |    CASE WHEN pl::HUGEINT * nr >= pr::HUGEINT * nl THEN 'len_le_threshold'
       |         ELSE 'len_gt_threshold' END AS positive_side,
       |    CASE WHEN pl::HUGEINT * nr >= pr::HUGEINT * nl THEN pl ELSE pr END AS tp,
       |    CASE WHEN pl::HUGEINT * nr >= pr::HUGEINT * nl THEN nl - pl ELSE nr - pr END AS fp,
       |    CASE WHEN pl::HUGEINT * nr >= pr::HUGEINT * nl THEN pr ELSE pl END AS fn,
       |    CASE WHEN pl::HUGEINT * nr >= pr::HUGEINT * nl THEN nr - pr ELSE nl - pl END AS tn
       |  FROM best)
       |SELECT threshold, positive_side, CAST(tp AS BIGINT) AS tp,
       |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       |  CAST(tn AS BIGINT) AS tn,
       |  round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy,
       |  round(CASE WHEN tp + fp = 0 THEN NULL
       |    ELSE CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS precision,
       |  round(CASE WHEN tp + fn = 0 THEN NULL
       |    ELSE CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall
       |FROM cm""".stripMargin

  // ---------------------------------------------------------------- q252
  /** The gain curve at the length deciles: thresholds where
    * cum·10 ≥ k·N (integer cross-multiplication), k = 1…9, with the
    * exact rational gain at each.
    */
  val q252: Q = (s, d) => {
    val lt = lenTable(s, d).localCheckpoint(true)
    val ks = lt.sparkSession.range(1, 10).select(col("id").as("k"))
    val th = ks.join(lt, col("cum") * 10 >= col("k") * col("n"))
      .groupBy(col("k")).agg(min(col("v")).as("threshold"))
    th.join(lt.select(col("v"), col("cum"), col("cumpos"), col("n"), col("p")),
        col("threshold") === col("v"))
      .where(col("cum") < col("n"))
      .select(col("k").as("decile"), col("threshold"),
        col("cum").as("n_left"), round(expr(GainExpr), 6).as("gini_gain"))
      .orderBy("decile")
  }

  val q252Sql: String =
    s"""WITH $LenSqlCte,
       |th AS (
       |  SELECT k.k, min(lt.v) AS threshold
       |  FROM generate_series(1, 9) AS k(k)
       |  JOIN lt ON lt.cum * 10 >= k.k * lt.n
       |  GROUP BY 1)
       |SELECT th.k AS decile, th.threshold, lt.cum AS n_left,
       |  round($GainExpr, 6) AS gini_gain
       |FROM th JOIN lt ON lt.v = th.threshold
       |WHERE lt.cum < lt.n ORDER BY decile""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q249_source_lang_mi", q249, Some(q249Sql)),
    ("q250_length_stump", q250, Some(q250Sql)),
    ("q251_stump_confusion", q251, Some(q251Sql)),
    ("q252_gain_curve", q252, Some(q252Sql)))
}
