package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Order statistics & coverage (round 6, twenty-fifth pack): the
  * distribution-free median confidence interval per source (q241),
  * TF/DF keyword extraction (q242), record-high day census (q243),
  * and activity-gap profiling (q244).
  *
  * Scale notes (the 100 TB story): q241 runs entirely on per-source
  * length COUNT tables (distinct lengths, not documents) with rank
  * selections — the q175/q181 discipline; q242's per-doc term table
  * is bounded by the deterministic 50-doc sample × its tokens, and
  * document frequencies come from one vocabulary-sized aggregation;
  * q243/q244 run on the types × span daily table (metadata) with
  * type-partitioned windows.
  *
  * Exactness: the CI ranks l = floor((n − 1.96·√n)/2) and
  * u = ceil((n + 1.96·√n)/2 + 1) floor/ceil identically-computed
  * doubles (sqrt is IEEE-exact, one multiply, one add — same tree
  * both sides) and everything after is an integer rank selection;
  * q242's keyword score tf/df is a single division of small integers
  * (identical double), ranked with a word tiebreak; q243/q244 are
  * pure integer window logic (strict record = y > running max of the
  * prefix; gap = lead(day) − day − 1).
  */
object OrderStatOps {
  import Relational.Q

  // ---------------------------------------------------------------- q241
  /** Per-source document-length median with the distribution-free 95%
    * CI (order-statistic ranks around n/2 ± 1.96·√n/2).
    */
  val q241: Q = (s, d) => {
    val cnt = Graft.table(s, d, "documents")
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
    cnt
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("lrk", expr(
        "greatest(CAST(floor((n - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT), 1)"))
      .withColumn("urk", expr(
        "least(CAST(ceil((n + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0 + 1.0) AS BIGINT), n)"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v"))).as("median"),
        min(when(col("cum") >= col("lrk"), col("v"))).as("ci_low"),
        min(when(col("cum") >= col("urk"), col("v"))).as("ci_high"))
      .orderBy("source")
  }

  val q241Sql: String =
    """WITH cnt AS (
      |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(count(*)) OVER (PARTITION BY source ORDER BY n_chars
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(sum(count(*)) OVER (PARTITION BY source) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2),
      |rk AS (
      |  SELECT *,
      |    greatest(CAST(floor((n - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0)
      |      AS BIGINT), 1) AS lrk,
      |    least(CAST(ceil((n + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0 + 1.0)
      |      AS BIGINT), n) AS urk
      |  FROM cnt)
      |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
      |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS BIGINT) AS median,
      |  CAST(min(CASE WHEN cum >= lrk THEN v END) AS BIGINT) AS ci_low,
      |  CAST(min(CASE WHEN cum >= urk THEN v END) AS BIGINT) AS ci_high
      |FROM rk GROUP BY 1 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q242
  /** Keyword extraction: for the 50 longest documents (deterministic
    * sample), the top-3 terms by tf/df — term frequency over corpus
    * document frequency, a single small-integer division ranked with a
    * word tiebreak.
    */
  val q242: Q = (s, d) => {
    val docs = Graft.table(s, d, "documents")
    val sample = docs
      .orderBy(col("n_chars").desc, col("doc_id")).limit(50)
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val words = docs
      .select(col("doc_id").as("df_doc"), explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
    val df = words.select(col("df_doc"), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val tf = sample
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tw"))
      .where(col("tw").rlike("^[a-z]+$"))
      .groupBy(col("doc_id"), col("tw")).agg(count(lit(1)).as("tf"))
    val wR = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tw"))
    tf.join(broadcast(df), col("tw") === col("w"))
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rk", row_number().over(wR))
      .where(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("tw").as("term"), col("tf"), col("df"),
        round(col("score"), 6).as("tf_df"))
      .orderBy("doc_id", "rk")
  }

  val q242Sql: String =
    """WITH sample AS MATERIALIZED (
      |  SELECT doc_id, text FROM documents
      |  ORDER BY n_chars DESC, doc_id LIMIT 50),
      |words AS (
      |  SELECT doc_id, lower(unnest(string_split(text, ' '))) AS w
      |  FROM documents),
      |df AS (
      |  SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM words
      |  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY 1),
      |tf AS (
      |  SELECT doc_id, w AS tw, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, lower(unnest(string_split(text, ' '))) AS w
      |    FROM sample)
      |  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY 1, 2),
      |ranked AS (
      |  SELECT tf.doc_id, tf.tw, tf.tf, df.df,
      |    CAST(tf.tf AS DOUBLE) / df.df AS score,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.tw) AS rk
      |  FROM tf JOIN df ON df.w = tf.tw)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tw AS term, tf, df,
      |  round(score, 6) AS tf_df
      |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // ---------------------------------------------------------------- q243
  /** Record-high census on the daily series: per type, how many days
    * set a new strict record, the latest record day, and the record
    * value (pure integer prefix-max logic).
    */
  val q243: Q = (s, d) => {
    val wPrev = Window.partitionBy(col("t")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ForecastOps.daily(s, d)
      .withColumn("pmax", max(col("y")).over(wPrev))
      .withColumn("isRec",
        when(col("pmax").isNull || col("y") > col("pmax"), 1L).otherwise(0L))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_days"), sum(col("isRec")).as("record_days"),
        max(when(col("isRec") === 1L, col("day"))).as("last_record_day"),
        max(col("y")).as("peak"))
      .select(col("t").as("event_type"), col("n_days"), col("record_days"),
        col("last_record_day"), col("peak"))
      .orderBy("event_type")
  }

  val q243Sql: String =
    """WITH daily AS (
      |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT t, day, y,
      |    max(y) OVER (PARTITION BY t ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM daily)
      |SELECT t AS event_type, count(*) AS n_days,
      |  CAST(sum(CASE WHEN pmax IS NULL OR y > pmax THEN 1 ELSE 0 END)
      |    AS BIGINT) AS record_days,
      |  CAST(max(CASE WHEN pmax IS NULL OR y > pmax THEN day END) AS BIGINT)
      |    AS last_record_day,
      |  CAST(max(y) AS BIGINT) AS peak
      |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q244
  /** Activity-gap profile: per type, present days vs calendar span,
    * missing days, and the longest zero-activity run (integer
    * lead-day arithmetic).
    */
  val q244: Q = (s, d) => {
    val w = Window.partitionBy(col("t")).orderBy(col("day"))
    ForecastOps.daily(s, d)
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("days_present"),
        (max(col("day")) - min(col("day")) + 1L).as("span_days"),
        coalesce(max(when(col("nxt").isNotNull, col("nxt") - col("day") - 1L)),
          lit(0L)).as("longest_gap"))
      .select(col("t").as("event_type"), col("days_present"), col("span_days"),
        (col("span_days") - col("days_present")).as("missing_days"),
        col("longest_gap"))
      .orderBy("event_type")
  }

  val q244Sql: String =
    """WITH daily AS (
      |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT t, day,
      |    lead(day) OVER (PARTITION BY t ORDER BY day) AS nxt
      |  FROM daily)
      |SELECT t AS event_type, count(*) AS days_present,
      |  CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
      |  CAST(max(day) - min(day) + 1 - count(*) AS BIGINT) AS missing_days,
      |  CAST(coalesce(max(CASE WHEN nxt IS NOT NULL THEN nxt - day - 1 END), 0)
      |    AS BIGINT) AS longest_gap
      |FROM g GROUP BY 1 ORDER BY event_type""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q241_median_ci", q241, Some(q241Sql)),
    ("q242_keyword_tfdf", q242, Some(q242Sql)),
    ("q243_record_days", q243, Some(q243Sql)),
    ("q244_activity_gaps", q244, Some(q244Sql)))
}
