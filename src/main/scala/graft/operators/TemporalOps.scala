package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Temporal joins (round 6, seventh pack): the as-of / interval family
  * Spark has no native operator for — last-view click attribution
  * (backward as-of), view→purchase conversion lag under a horizon
  * (forward as-of), hourly session concurrency (interval→bucket
  * overlap join), and per-day peak concurrency (sweep line). These are
  * the time-alignment primitives behind attribution, funnel latency,
  * and capacity readouts; the reference's offset-by-timestamp seek
  * (`offsetsForTime`) is the engine-side cousin of the same cut.
  *
  * Scale notes (the 100 TB story): no as-of join is executed as a
  * range join. Both directions decompose into the two-level
  * bucket-stitch shape (q132/SequenceOps precedent): a running
  * struct-max (resp. struct-min) inside (user, hour-bucket) windows,
  * recombined with a per-user cumulative max (resp. min) over the
  * metadata-sized bucket table — "latest at-or-before" is a prefix
  * MAX and max is associative, so the decomposition is exact and no
  * task ever sorts one user's full history. The interval→bucket join
  * explodes each session into the hours it covers (fan-out bounded by
  * session length / hour, never by data volume); the sweep line's
  * global running sum uses the within-hour prefix + hour-table carry
  * decomposition, the hour table being ~#hours rows of metadata.
  *
  * Exactness: timestamps are integer microseconds end-to-end; gaps,
  * counts, concurrency and peaks are integers; the only doubles are
  * single divisions rounded on output. The DuckDB oracles run REAL
  * `ASOF LEFT JOIN`s (both directions) against pre-deduplicated build
  * sides — an independent derivation of the same semantics, with ties
  * pinned by (us → max event_id) backward and (us → min event_id)
  * forward on both engines.
  */
object TemporalOps {
  import Relational.Q

  private val HourUs = 3600000000L
  private val DayUs = 86400000000L
  private val SessionGapUs = 1800000000L // 30 min, q15's rule
  private val HorizonUs = 604800000000L // 7 days

  private def ev(s: SparkSession, d: String): DataFrame =
    Graft.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))

  // ---------------------------------------------------------------- q169
  /** Backward as-of join: for every click, the user's latest view with
    * view.us <= click.us (ties at equal us: the view counts, and the
    * max event_id among simultaneous views wins). One row per click
    * with the matched view id and the attribution gap in integer
    * microseconds; unmatched clicks keep nulls.
    */
  val q169: Q = (s, d) => {
    val e = ev(s, d).where(col("event_type").isin("view", "click"))
      // equal-us views sort BEFORE clicks so the running max includes them
      .withColumn("tag", when(col("event_type") === "view", 0).otherwise(1))
      .withColumn("tb", expr("us DIV 3600000000"))
    val wIn = Window.partitionBy(col("user_id"), col("tb"))
      .orderBy(col("us"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = e.withColumn("run",
      max(when(col("tag") === 0, struct(col("us"), col("event_id")))).over(wIn))
    // bucket table over ALL buckets (view-less ones carry a null bmax and
    // still receive the cumulative max from earlier buckets)
    val bmeta = e.groupBy(col("user_id"), col("tb"))
      .agg(max(when(col("tag") === 0,
        struct(col("us"), col("event_id")))).as("bmax"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bmeta
      .withColumn("cmax", max(col("bmax")).over(wPrev))
      .select(col("user_id"), col("tb"), col("cmax"))
    local.join(carry, Seq("user_id", "tb"))
      .where(col("tag") === 1)
      .withColumn("best", greatest(col("run"), col("cmax")))
      .select(col("event_id"), col("user_id"),
        col("best.event_id").as("view_id"),
        (col("us") - col("best.us")).as("gap_us"))
      .orderBy("event_id")
  }

  val q169Sql: String =
    """WITH v AS (
      |  SELECT user_id, epoch_us(ts) AS us, CAST(max(event_id) AS BIGINT) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |c AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us
      |  FROM events WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id, v.view_id,
      |  CAST(c.us - v.us AS BIGINT) AS gap_us
      |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.us >= v.us
      |ORDER BY c.event_id""".stripMargin

  // ---------------------------------------------------------------- q170
  /** Forward as-of join under a horizon: for every view, the user's
    * FIRST purchase strictly after it (equal-us purchases do not
    * count; ties among simultaneous purchases: min event_id), kept
    * only when the conversion happens within 7 days. One row per view;
    * non-converting views keep nulls.
    */
  val q170: Q = (s, d) => {
    val e = ev(s, d).where(col("event_type").isin("view", "purchase"))
      // equal-us purchases sort BEFORE views so "rows after me" is strict
      .withColumn("tag", when(col("event_type") === "purchase", 0).otherwise(1))
      .withColumn("tb", expr("us DIV 3600000000"))
    val wIn = Window.partitionBy(col("user_id"), col("tb"))
      .orderBy(col("us"), col("tag"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val local = e.withColumn("run",
      min(when(col("tag") === 0, struct(col("us"), col("event_id")))).over(wIn))
    // bucket table over ALL buckets (purchase-less ones carry a null bmin
    // and still receive the cumulative min from later buckets)
    val bmeta = e.groupBy(col("user_id"), col("tb"))
      .agg(min(when(col("tag") === 0,
        struct(col("us"), col("event_id")))).as("bmin"))
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("tb"))
      .rowsBetween(1, Window.unboundedFollowing)
    val carry = bmeta
      .withColumn("nmin", min(col("bmin")).over(wNext))
      .select(col("user_id"), col("tb"), col("nmin"))
    local.join(carry, Seq("user_id", "tb"))
      .where(col("tag") === 1)
      .withColumn("best", least(col("run"), col("nmin")))
      .withColumn("gap", col("best.us") - col("us"))
      .select(col("event_id"), col("user_id"),
        when(col("gap") <= HorizonUs, col("best.event_id")).as("purchase_id"),
        when(col("gap") <= HorizonUs, col("gap")).as("gap_us"))
      .orderBy("event_id")
  }

  val q170Sql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) AS us, CAST(min(event_id) AS BIGINT) AS purchase_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |v AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us
      |  FROM events WHERE event_type = 'view'),
      |j AS (
      |  SELECT v.event_id, v.user_id, p.purchase_id,
      |    CAST(p.us - v.us AS BIGINT) AS gap
      |  FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.us < p.us)
      |SELECT event_id, user_id,
      |  CASE WHEN gap <= 604800000000 THEN purchase_id END AS purchase_id,
      |  CASE WHEN gap <= 604800000000 THEN gap END AS gap_us
      |FROM j ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- sessions
  /** Per-user sessions under q15's 30-minute-gap rule, derived with the
    * two-level prefix decomposition (no task sorts a user's full
    * history): is_new flags come from the SequenceOps-style bucketed
    * lag; the session index is the within-bucket prefix count of flags
    * plus a per-user carry from the metadata-sized bucket table.
    * Returns (user_id, session_id, start_us, end_us).
    */
  private val sessionsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[operators] def sessions(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(sessionsMemo, s, d)(sessionsUncached(s, d).localCheckpoint(true))

  private def sessionsUncached(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).withColumn("tb", expr("us DIV 3600000000"))
    val wIn = Window.partitionBy(col("user_id"), col("tb"))
      .orderBy(col("us"), col("event_id"))
    val local = e.withColumn("prev_in", lag(col("us"), 1).over(wIn))
    val bmeta = local.groupBy(col("user_id"), col("tb"))
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("n"))
    val wB = Window.partitionBy(col("user_id")).orderBy(col("tb"))
    val bstats = bmeta
      .withColumn("prev_last", lag(col("last_us"), 1).over(wB))
      .select(col("user_id"), col("tb"), col("prev_last"))
    val flagged = local.join(bstats, Seq("user_id", "tb"))
      .withColumn("prev_us", coalesce(col("prev_in"), col("prev_last")))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
    val wPre = Window.partitionBy(col("user_id"), col("tb"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inPrefix = flagged.withColumn("sp", sum(col("is_new")).over(wPre))
    val bSums = flagged.groupBy(col("user_id"), col("tb"))
      .agg(sum(col("is_new")).as("bsum"))
    val wCarry = Window.partitionBy(col("user_id")).orderBy(col("tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bSums
      .withColumn("carry", coalesce(sum(col("bsum")).over(wCarry), lit(0L)))
      .select(col("user_id"), col("tb"), col("carry"))
    inPrefix.join(carry, Seq("user_id", "tb"))
      .withColumn("session_id", col("carry") + col("sp"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
  }

  private val sessionsSqlCte: String =
    """sess AS MATERIALIZED (
      |  SELECT user_id, session_id,
      |    CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us
      |  FROM (
      |    SELECT user_id, us,
      |      SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |    FROM (
      |      SELECT user_id, event_id, epoch_us(ts) AS us,
      |        CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |            PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |          > 1800000000 OR lag(epoch_us(ts)) OVER (
      |            PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
      |        THEN 1 ELSE 0 END AS is_new
      |      FROM events))
      |  GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q171
  /** Hourly session concurrency (interval→bucket overlap join): each
    * session covers the hour buckets [start DIV 1h .. end DIV 1h];
    * per hour, how many sessions were live and how many distinct users
    * — the capacity/engagement readout. Fan-out per session is bounded
    * by its duration, never by data volume.
    */
  val q171: Q = (s, d) => {
    sessions(s, d)
      .select(col("user_id"),
        explode(sequence(expr("start_us DIV 3600000000"),
          expr("end_us DIV 3600000000"))).as("hour"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour")
  }

  val q171Sql: String =
    s"""WITH $sessionsSqlCte,
       |hours AS (
       |  SELECT user_id, unnest(generate_series(start_us // 3600000000,
       |    end_us // 3600000000)) AS hour
       |  FROM sess)
       |SELECT CAST(hour AS BIGINT) AS hour, count(*) AS n_sessions,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       |FROM hours GROUP BY 1 ORDER BY hour""".stripMargin

  // ---------------------------------------------------------------- q172
  /** Per-day peak concurrency (sweep line): +1 at session start, -1 at
    * session end (inclusive ends — at equal timestamps starts order
    * before ends, so touching sessions count as concurrent), global
    * running sum, max per day. The running sum uses the within-hour
    * prefix + hour-table carry decomposition; integers end-to-end.
    */
  val q172: Q = (s, d) => {
    val deltas = sessions(s, d).select(
        col("user_id"), col("session_id"),
        explode(array(
          struct(col("start_us").as("us"), lit(1L).as("delta")),
          struct(col("end_us").as("us"), lit(-1L).as("delta")))).as("x"))
      .select(col("x.us").as("us"), col("x.delta").as("delta"),
        col("user_id"), col("session_id"))
      .withColumn("hb", expr("us DIV 3600000000"))
    val wIn = Window.partitionBy(col("hb"))
      .orderBy(col("us"), col("delta").desc, col("user_id"), col("session_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = deltas.withColumn("sp", sum(col("delta")).over(wIn))
    val hSums = deltas.groupBy(col("hb")).agg(sum(col("delta")).as("hsum"))
    val wCarry = Window.orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = hSums
      .withColumn("carry", coalesce(sum(col("hsum")).over(wCarry), lit(0L)))
      .select(col("hb"), col("carry"))
    local.join(broadcast(carry), Seq("hb"))
      .withColumn("run", col("carry") + col("sp"))
      .withColumn("day", expr("us DIV 86400000000"))
      .groupBy(col("day"))
      .agg(max(col("run")).as("peak_concurrency"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"))
      .orderBy("day")
  }

  val q172Sql: String =
    s"""WITH $sessionsSqlCte,
       |deltas AS (
       |  SELECT us, delta, user_id, session_id FROM (
       |    SELECT start_us AS us, 1 AS delta, user_id, session_id FROM sess
       |    UNION ALL
       |    SELECT end_us, -1, user_id, session_id FROM sess)),
       |run AS (
       |  SELECT us, delta,
       |    SUM(delta) OVER (ORDER BY us, delta DESC, user_id, session_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       |  FROM deltas)
       |SELECT CAST(us // 86400000000 AS BIGINT) AS day,
       |  CAST(max(run) AS BIGINT) AS peak_concurrency,
       |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
       |FROM run GROUP BY 1 ORDER BY day""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q169_asof_attribution", q169, Some(q169Sql)),
    ("q170_conversion_lag", q170, Some(q170Sql)),
    ("q171_hourly_concurrency", q171, Some(q171Sql)),
    ("q172_daily_peak", q172, Some(q172Sql)))
}
