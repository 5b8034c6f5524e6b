package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Session analytics over `events` (round 7, twenty-eighth pack): the
  * product-analytics layer a topic consumer feeds — session shape
  * histogram (q253), the within-session ordered funnel (q254), the
  * entry/exit event matrix (q255), inter-session return gaps (q256),
  * the session-maturity conversion curve (q257), within-session
  * time-to-convert (q258), top session journeys (q269), and
  * cart-abandonment aging (q271). Sessions close after a 6-HOUR inactivity gap (q15 keeps the
  * reference 30-minute gap; this pack's wider window is the
  * daily-visit-level cut product analytics runs next to it — at this
  * event density a 30-minute cut degenerates to one-event sessions).
  *
  * Scale notes (the 100 TB story): sessionization is the q15
  * gaps-and-islands — every window partitions by user_id (or by the
  * (user_id, sid) refinement, which hash(user_id) already satisfies, so
  * ONE exchange feeds all per-session windows); there is no
  * un-partitioned window anywhere in the pack. The funnel (q254/q258) is
  * q72's chained filter → min-aggregate → equi-join discipline on the
  * (user_id, sid) key with monotonically shrinking stage tables. Final
  * aggregations land on bounded domains: 4–5 label buckets or |types|²
  * cells. Per-session event counts are gap-bounded in practice; no
  * per-key history list is ever collected.
  *
  * Exactness: all time arithmetic on epoch MICROS (integer); bucket
  * edges are integer literals; session value sums stay DECIMAL(18,4)
  * through BOTH aggregation levels and cast to double only on output;
  * the single division (q255 share) divides exact BIGINTs identically on
  * both engines, rounded at 6 on output only.
  */
object SessionOps {
  import Relational.Q

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** 6 h of silence closes a session. */
  private val GapUs = 21600000000L

  /** The q15 gaps-and-islands at the 6 h gap: events + `us` + `sid`. */
  private def sessionized(s: SparkSession, d: String): DataFrame = {
    // explicit-count repartition on the window key (r13): the implicit
    // ENSURE_REQUIREMENTS exchange is AQE-coalescible on its POST-SHUFFLE
    // bytes (a few MB here), and the whole lag+sum window plus each
    // consumer's pipelined filters/joins/partial aggregates then ran as
    // 1-task serial stages (profiled on q271: three ~0.7 s single-task
    // stages) — the same fan-out-invisible-to-AQE class as the r12
    // q259/q268 spreads (guide §2.5). A user-count repartition is exempt
    // from coalescing, and the count derives from the runtime, so on a
    // real cluster it is the same width AQE would pick for big inputs.
    val e = Graft.events(s, d).withColumn("us", unix_micros(col("ts")))
      .repartition(s.sparkContext.defaultParallelism, col("user_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    e.withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > GapUs, 1L)
          .otherwise(0L))
      .withColumn("sid",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev_us", "is_new")
  }

  /** (user_id, sid, start_us, end_us) at the 6 h gap — one row per
    * session; the gap rule makes one user's sessions disjoint with
    * ≥ 6 h between them. Shared with `OverlapOps`.
    */
  private[graft] def sessionTable(s: SparkSession, d: String): DataFrame =
    sessionized(s, d)
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))

  private[operators] val sessionCte: String =
    """t AS (
      |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
      |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events),
      |t2 AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 21600000000 THEN 1 ELSE 0 END AS is_new
      |  FROM t),
      |se AS (
      |  SELECT user_id, event_id, event_type, value, us,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM t2)""".stripMargin

  // ---------------------------------------------------------------- q253
  /** Session shape histogram: sessions bucketed by event count (bounce /
    * 2–4 / 5–9 / 10+) with users, events, total duration, and total
    * value per bucket. Two hash aggregations (per-session, then 4-row
    * bucket table); value sums stay DECIMAL through both levels.
    */
  val q253: Q = (s, d) => {
    val g = sessionized(s, d)
      .groupBy(col("user_id"), col("sid"))
      .agg(
        count(lit(1)).as("ne"),
        (max(col("us")) - min(col("us"))).as("dur_us"),
        sum(dec(col("value"))).as("sv"))
    g.withColumn("bidx",
        when(col("ne") === 1, 0).when(col("ne") <= 4, 1)
          .when(col("ne") <= 9, 2).otherwise(3))
      .withColumn("bucket",
        when(col("ne") === 1, "bounce").when(col("ne") <= 4, "2-4")
          .when(col("ne") <= 9, "5-9").otherwise("10+"))
      .groupBy(col("bidx"), col("bucket"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("ne")).as("n_events"),
        sum(col("dur_us")).as("sum_dur_us"),
        sum(col("sv")).cast("double").as("sum_value"))
      .orderBy("bidx")
  }

  val q253Sql: String =
    s"""WITH $sessionCte,
       |g AS (
       |  SELECT user_id, sid, count(*) AS ne, max(us) - min(us) AS dur_us,
       |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
       |  FROM se GROUP BY 1, 2),
       |b AS (
       |  SELECT *,
       |    CASE WHEN ne = 1 THEN 0 WHEN ne <= 4 THEN 1
       |         WHEN ne <= 9 THEN 2 ELSE 3 END AS bidx,
       |    CASE WHEN ne = 1 THEN 'bounce' WHEN ne <= 4 THEN '2-4'
       |         WHEN ne <= 9 THEN '5-9' ELSE '10+' END AS bucket
       |  FROM g)
       |SELECT bidx, bucket, count(*) AS n_sessions,
       |  count(DISTINCT user_id) AS n_users,
       |  CAST(sum(ne) AS BIGINT) AS n_events,
       |  CAST(sum(dur_us) AS BIGINT) AS sum_dur_us,
       |  CAST(sum(sv) AS DOUBLE) AS sum_value
       |FROM b GROUP BY 1, 2 ORDER BY bidx""".stripMargin

  // ---------------------------------------------------------------- q254
  /** Within-session ordered funnel: sessions whose OWN event stream
    * progresses view → click → purchase, each stage strictly after the
    * previous stage's first qualifying event (q72 is the cross-session
    * per-user funnel; this is the per-visit conversion product teams
    * read next to it). Chained (user_id, sid)-key joins, stage tables
    * shrink monotonically.
    */
  val q254: Q = (s, d) => {
    val se = sessionized(s, d).select("user_id", "sid", "event_type", "us")
    val s1 = se.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("sid")).agg(min(col("us")).as("t1"))
    val s2 = se.filter(col("event_type") === "click")
      .join(s1, Seq("user_id", "sid")).filter(col("us") > col("t1"))
      .groupBy(col("user_id"), col("sid")).agg(min(col("us")).as("t2"))
    val s3 = se.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id", "sid")).filter(col("us") > col("t2"))
      .groupBy(col("user_id"), col("sid")).agg(min(col("us")).as("t3"))
    def st(df: DataFrame, stage: Int, typ: String) =
      df.agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
        .select(lit(stage).as("stage"), lit(typ).as("event_type"),
          col("n_sessions"), col("n_users"))
    st(s1, 1, "view").unionAll(st(s2, 2, "click")).unionAll(st(s3, 3, "purchase"))
      .orderBy("stage")
  }

  private val funnelCte: String =
    """s1 AS (
      |  SELECT user_id, sid, min(us) AS t1 FROM se
      |  WHERE event_type = 'view' GROUP BY 1, 2),
      |s2 AS (
      |  SELECT se.user_id, se.sid, min(se.us) AS t2
      |  FROM se JOIN s1 ON se.user_id = s1.user_id AND se.sid = s1.sid
      |  WHERE se.event_type = 'click' AND se.us > s1.t1 GROUP BY 1, 2),
      |s3 AS (
      |  SELECT se.user_id, se.sid, min(se.us) AS t3
      |  FROM se JOIN s2 ON se.user_id = s2.user_id AND se.sid = s2.sid
      |  WHERE se.event_type = 'purchase' AND se.us > s2.t2 GROUP BY 1, 2)""".stripMargin

  val q254Sql: String =
    s"""WITH $sessionCte,
       |$funnelCte
       |SELECT 1 AS stage, 'view' AS event_type, count(*) AS n_sessions,
       |  count(DISTINCT user_id) AS n_users FROM s1
       |UNION ALL
       |SELECT 2, 'click', count(*), count(DISTINCT user_id) FROM s2
       |UNION ALL
       |SELECT 3, 'purchase', count(*), count(DISTINCT user_id) FROM s3
       |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- q255
  /** Entry/exit matrix: counts of (first event type, last event type)
    * per session with each cell's share of all sessions. First/last
    * resolve by the codebase total order (us, event_id) via two
    * row_numbers over the SAME (user_id, sid) partitioning — one
    * exchange, two sorts; |types|² output.
    */
  val q255: Q = (s, d) => {
    val se = sessionized(s, d)
    val wA = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us"), col("event_id"))
    val wD = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us").desc, col("event_id").desc)
    val ee = se
      .withColumn("ra", row_number().over(wA))
      .withColumn("rd", row_number().over(wD))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        max(when(col("ra") === 1, col("event_type"))).as("entry_type"),
        max(when(col("rd") === 1, col("event_type"))).as("exit_type"))
    val tot = ee.agg(count(lit(1)).as("total"))
    ee.groupBy(col("entry_type"), col("exit_type"))
      .agg(count(lit(1)).as("n_sessions"))
      .crossJoin(broadcast(tot))
      .select(col("entry_type"), col("exit_type"), col("n_sessions"),
        round(col("n_sessions").cast("double") / col("total"), 6).as("share"))
      .orderBy("entry_type", "exit_type")
  }

  val q255Sql: String =
    s"""WITH $sessionCte,
       |r AS (
       |  SELECT user_id, sid, event_type,
       |    row_number() OVER (PARTITION BY user_id, sid ORDER BY us, event_id) AS ra,
       |    row_number() OVER (PARTITION BY user_id, sid ORDER BY us DESC, event_id DESC) AS rd
       |  FROM se),
       |ee AS (
       |  SELECT user_id, sid,
       |    max(CASE WHEN ra = 1 THEN event_type END) AS entry_type,
       |    max(CASE WHEN rd = 1 THEN event_type END) AS exit_type
       |  FROM r GROUP BY 1, 2),
       |tot AS (SELECT count(*) AS total FROM ee),
       |m AS (
       |  SELECT entry_type, exit_type, count(*) AS n_sessions
       |  FROM ee GROUP BY 1, 2)
       |SELECT entry_type, exit_type, n_sessions,
       |  round(CAST(n_sessions AS DOUBLE) / total, 6) AS share
       |FROM m, tot ORDER BY entry_type, exit_type""".stripMargin

  // ---------------------------------------------------------------- q256
  /** Inter-session return gaps: silence between a session's end and the
    * user's next session start, bucketed (6–12 h / 12–24 h / 1–3 d /
    * 3–7 d / >7 d — the 6 h floor is the gap rule itself). Per-user lag
    * over the sessions table; 5-row output, all integers.
    */
  val q256: Q = (s, d) => {
    val g = sessionized(s, d)
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("sid"))
    g.withColumn("prev_end", lag(col("end_us"), 1).over(wu))
      .filter(col("prev_end").isNotNull)
      .withColumn("gap_us", col("start_us") - col("prev_end"))
      .withColumn("bidx",
        when(col("gap_us") <= 43200000000L, 0)
          .when(col("gap_us") <= 86400000000L, 1)
          .when(col("gap_us") <= 259200000000L, 2)
          .when(col("gap_us") <= 604800000000L, 3).otherwise(4))
      .withColumn("bucket",
        when(col("gap_us") <= 43200000000L, "6-12h")
          .when(col("gap_us") <= 86400000000L, "12-24h")
          .when(col("gap_us") <= 259200000000L, "1-3d")
          .when(col("gap_us") <= 604800000000L, "3-7d").otherwise(">7d"))
      .groupBy(col("bidx"), col("bucket"))
      .agg(
        count(lit(1)).as("n_gaps"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("gap_us")).as("sum_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy("bidx")
  }

  val q256Sql: String =
    s"""WITH $sessionCte,
       |g AS (
       |  SELECT user_id, sid, min(us) AS start_us, max(us) AS end_us
       |  FROM se GROUP BY 1, 2),
       |r AS (
       |  SELECT user_id, start_us,
       |    lag(end_us, 1) OVER (PARTITION BY user_id ORDER BY sid) AS prev_end
       |  FROM g),
       |c AS (
       |  SELECT user_id, start_us - prev_end AS gap_us
       |  FROM r WHERE prev_end IS NOT NULL),
       |b AS (
       |  SELECT user_id, gap_us,
       |    CASE WHEN gap_us <= 43200000000 THEN 0 WHEN gap_us <= 86400000000 THEN 1
       |         WHEN gap_us <= 259200000000 THEN 2 WHEN gap_us <= 604800000000 THEN 3
       |         ELSE 4 END AS bidx,
       |    CASE WHEN gap_us <= 43200000000 THEN '6-12h' WHEN gap_us <= 86400000000 THEN '12-24h'
       |         WHEN gap_us <= 259200000000 THEN '1-3d' WHEN gap_us <= 604800000000 THEN '3-7d'
       |         ELSE '>7d' END AS bucket
       |  FROM c)
       |SELECT bidx, bucket, count(*) AS n_gaps, count(DISTINCT user_id) AS n_users,
       |  CAST(sum(gap_us) AS BIGINT) AS sum_gap_us, max(gap_us) AS max_gap_us
       |FROM b GROUP BY 1, 2 ORDER BY bidx""".stripMargin

  // ---------------------------------------------------------------- q257
  /** Session-maturity curve: behavior by session ORDINAL in the user's
    * lifetime (1st / 2nd–3rd / 4th–9th / 10th+) — does a returning
    * visit convert more than a first visit? Per bucket: sessions,
    * users, purchase-containing sessions, conversion share, events,
    * value. The ordinal IS the gaps-and-islands sid, so no extra
    * window; 4-row output, conversion = one BIGINT division rounded on
    * output. (Hourly session concurrency is q171/q172's ground.)
    */
  val q257: Q = (s, d) => {
    val g = sessionized(s, d)
      .groupBy(col("user_id"), col("sid"))
      .agg(
        count(lit(1)).as("ne"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"),
        sum(dec(col("value"))).as("sv"))
    g.withColumn("bidx",
        when(col("sid") === 1, 0).when(col("sid") <= 3, 1)
          .when(col("sid") <= 9, 2).otherwise(3))
      .withColumn("bucket",
        when(col("sid") === 1, "first").when(col("sid") <= 3, "2-3")
          .when(col("sid") <= 9, "4-9").otherwise("10+"))
      .groupBy(col("bidx"), col("bucket"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("np") > 0, 1L).otherwise(0L)).as("purchase_sessions"),
        round(sum(when(col("np") > 0, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("conversion"),
        sum(col("ne")).as("n_events"),
        sum(col("sv")).cast("double").as("sum_value"))
      .orderBy("bidx")
  }

  val q257Sql: String =
    s"""WITH $sessionCte,
       |g AS (
       |  SELECT user_id, sid, count(*) AS ne,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
       |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
       |  FROM se GROUP BY 1, 2),
       |b AS (
       |  SELECT *,
       |    CASE WHEN sid = 1 THEN 0 WHEN sid <= 3 THEN 1
       |         WHEN sid <= 9 THEN 2 ELSE 3 END AS bidx,
       |    CASE WHEN sid = 1 THEN 'first' WHEN sid <= 3 THEN '2-3'
       |         WHEN sid <= 9 THEN '4-9' ELSE '10+' END AS bucket
       |  FROM g)
       |SELECT bidx, bucket, count(*) AS n_sessions,
       |  count(DISTINCT user_id) AS n_users,
       |  CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS purchase_sessions,
       |  round(CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS conversion,
       |  CAST(sum(ne) AS BIGINT) AS n_events,
       |  CAST(sum(sv) AS DOUBLE) AS sum_value
       |FROM b GROUP BY 1, 2 ORDER BY bidx""".stripMargin

  // ---------------------------------------------------------------- q258
  /** Within-session time-to-convert: for q254's fully-converting
    * sessions, the view→purchase delay distribution (≤30 m / 30 m–2 h /
    * 2–6 h / >6 h). Stage tables from the same chained-join funnel;
    * 4-row integer output.
    */
  val q258: Q = (s, d) => {
    val se = sessionized(s, d).select("user_id", "sid", "event_type", "us")
    val s1 = se.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("sid")).agg(min(col("us")).as("t1"))
    val s2 = se.filter(col("event_type") === "click")
      .join(s1, Seq("user_id", "sid")).filter(col("us") > col("t1"))
      .groupBy(col("user_id"), col("sid")).agg(min(col("us")).as("t2"))
    val s3 = se.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id", "sid")).filter(col("us") > col("t2"))
      .groupBy(col("user_id"), col("sid")).agg(min(col("us")).as("t3"))
    s3.join(s1, Seq("user_id", "sid"))
      .withColumn("delay_us", col("t3") - col("t1"))
      .withColumn("bidx",
        when(col("delay_us") <= 1800000000L, 0)
          .when(col("delay_us") <= 7200000000L, 1)
          .when(col("delay_us") <= 21600000000L, 2).otherwise(3))
      .withColumn("bucket",
        when(col("delay_us") <= 1800000000L, "<=30m")
          .when(col("delay_us") <= 7200000000L, "30m-2h")
          .when(col("delay_us") <= 21600000000L, "2-6h").otherwise(">6h"))
      .groupBy(col("bidx"), col("bucket"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("delay_us")).as("sum_delay_us"),
        min(col("delay_us")).as("min_delay_us"),
        max(col("delay_us")).as("max_delay_us"))
      .orderBy("bidx")
  }

  val q258Sql: String =
    s"""WITH $sessionCte,
       |$funnelCte,
       |dly AS (
       |  SELECT s3.user_id, s3.t3 - s1.t1 AS delay_us
       |  FROM s3 JOIN s1 ON s3.user_id = s1.user_id AND s3.sid = s1.sid),
       |c AS (
       |  SELECT user_id, delay_us,
       |    CASE WHEN delay_us <= 1800000000 THEN 0 WHEN delay_us <= 7200000000 THEN 1
       |         WHEN delay_us <= 21600000000 THEN 2 ELSE 3 END AS bidx,
       |    CASE WHEN delay_us <= 1800000000 THEN '<=30m' WHEN delay_us <= 7200000000 THEN '30m-2h'
       |         WHEN delay_us <= 21600000000 THEN '2-6h' ELSE '>6h' END AS bucket
       |  FROM dly)
       |SELECT bidx, bucket, count(*) AS n_sessions, count(DISTINCT user_id) AS n_users,
       |  CAST(sum(delay_us) AS BIGINT) AS sum_delay_us,
       |  min(delay_us) AS min_delay_us, max(delay_us) AS max_delay_us
       |FROM c GROUP BY 1, 2 ORDER BY bidx""".stripMargin

  // ---------------------------------------------------------------- q269
  /** Top session journeys: the 10 most common session paths — the
    * '>'-joined event-type sequence of each session's first 8 events
    * (the explicit cap keeps per-session state bounded, q128's rule;
    * sessions here never exceed it anyway). One (user, sid) window for
    * the ordinal, one ordered string_agg per session, then a count on
    * the path-string domain and a top-10 TakeOrderedAndProject.
    */
  private val PathCap = 8

  val q269: Q = (s, d) => {
    val se = sessionized(s, d)
    val wA = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us"), col("event_id"))
    val paths = se.withColumn("ra", row_number().over(wA))
      .filter(col("ra") <= PathCap)
      .groupBy(col("user_id"), col("sid"))
      .agg(concat_ws(">",
        transform(
          sort_array(collect_list(struct(col("ra"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(10)
  }

  val q269Sql: String =
    s"""WITH $sessionCte,
       |r AS (
       |  SELECT user_id, sid, event_type,
       |    row_number() OVER (PARTITION BY user_id, sid ORDER BY us, event_id) AS ra
       |  FROM se),
       |paths AS (
       |  SELECT user_id, sid, string_agg(event_type, '>' ORDER BY ra) AS path
       |  FROM r WHERE ra <= $PathCap GROUP BY 1, 2)
       |SELECT path, count(*) AS n_sessions
       |FROM paths GROUP BY 1
       |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q271
  /** Cart abandonment aging: sessions that clicked after a view but
    * never purchased (reached funnel stage 2, not 3), bucketed by how
    * long the session stayed active after the click — the negative
    * space of q254, with the value at stake. Stage tables as in
    * q254/q258; the not-converted cut is one left-anti join on the
    * (user, sid) key.
    */
  val q271: Q = (s, d) => {
    val se = sessionized(s, d)
    val g = se.groupBy(col("user_id"), col("sid"))
      .agg(max(col("us")).as("end_us"), sum(dec(col("value"))).as("sv"))
    val sev = se.select("user_id", "sid", "event_type", "us")
    val s1 = sev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("sid")).agg(min(col("us")).as("t1"))
    val s2 = sev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id", "sid")).filter(col("us") > col("t1"))
      .groupBy(col("user_id"), col("sid")).agg(min(col("us")).as("t2"))
    val s3 = sev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id", "sid")).filter(col("us") > col("t2"))
      .groupBy(col("user_id"), col("sid")).agg(min(col("us")).as("t3"))
    s2.join(s3.select("user_id", "sid"), Seq("user_id", "sid"), "left_anti")
      .join(g, Seq("user_id", "sid"))
      .withColumn("age_us", col("end_us") - col("t2"))
      .withColumn("bidx",
        when(col("age_us") === 0L, 0).when(col("age_us") <= 1800000000L, 1)
          .when(col("age_us") <= 7200000000L, 2).otherwise(3))
      .withColumn("bucket",
        when(col("age_us") === 0L, "click-was-last").when(col("age_us") <= 1800000000L, "<=30m")
          .when(col("age_us") <= 7200000000L, "30m-2h").otherwise(">2h"))
      .groupBy(col("bidx"), col("bucket"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("age_us")).as("sum_age_us"),
        sum(col("sv")).cast("double").as("value_at_stake"))
      .orderBy("bidx")
  }

  val q271Sql: String =
    s"""WITH $sessionCte,
       |g AS (
       |  SELECT user_id, sid, max(us) AS end_us,
       |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
       |  FROM se GROUP BY 1, 2),
       |$funnelCte,
       |ab AS (
       |  SELECT s2.user_id, s2.sid, s2.t2, g.end_us, g.sv
       |  FROM s2 LEFT JOIN s3 ON s2.user_id = s3.user_id AND s2.sid = s3.sid
       |  JOIN g ON s2.user_id = g.user_id AND s2.sid = g.sid
       |  WHERE s3.user_id IS NULL),
       |c AS (
       |  SELECT user_id, end_us - t2 AS age_us, sv,
       |    CASE WHEN end_us - t2 = 0 THEN 0 WHEN end_us - t2 <= 1800000000 THEN 1
       |         WHEN end_us - t2 <= 7200000000 THEN 2 ELSE 3 END AS bidx,
       |    CASE WHEN end_us - t2 = 0 THEN 'click-was-last' WHEN end_us - t2 <= 1800000000 THEN '<=30m'
       |         WHEN end_us - t2 <= 7200000000 THEN '30m-2h' ELSE '>2h' END AS bucket
       |  FROM ab)
       |SELECT bidx, bucket, count(*) AS n_sessions, count(DISTINCT user_id) AS n_users,
       |  CAST(sum(age_us) AS BIGINT) AS sum_age_us,
       |  CAST(sum(sv) AS DOUBLE) AS value_at_stake
       |FROM c GROUP BY 1, 2 ORDER BY bidx""".stripMargin

  // ---------------------------------------------------------------- q277
  /** Session-duration SLO by maturity: per q257 lifetime bucket, the
    * P50/P90/max session duration in SECONDS — exact closed-form rank
    * selection (q204's discipline) over the per-bucket duration count
    * table. Quantizing to seconds bounds the count-table domain by the
    * session span, so the per-bucket prefix window runs over a
    * span-bounded table at any corpus size; percentile picks are
    * integer cross-multiplications (b·cum ≥ a ⟺ cum ≥ ⌈a/b⌉).
    */
  val q277: Q = (s, d) => {
    val g = sessionized(s, d)
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .withColumn("dur_s", expr("(end_us - start_us) DIV 1000000"))
      .withColumn("bidx",
        when(col("sid") === 1, 0).when(col("sid") <= 3, 1)
          .when(col("sid") <= 9, 2).otherwise(3))
      .withColumn("bucket",
        when(col("sid") === 1, "first").when(col("sid") <= 3, "2-3")
          .when(col("sid") <= 9, "4-9").otherwise("10+"))
    val ct = g.groupBy(col("bidx"), col("bucket"), col("dur_s"))
      .agg(count(lit(1)).as("c"))
    val wb = Window.partitionBy(col("bidx")).orderBy(col("dur_s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = ct.withColumn("cum", sum(col("c")).over(wb))
    val n = g.groupBy(col("bidx")).agg(count(lit(1)).as("n"),
      max(col("dur_s")).as("max_s"))
    val j = cum.join(n, Seq("bidx"))
    val p50 = j.filter(col("cum") * 2 >= col("n"))
      .groupBy(col("bidx"), col("bucket")).agg(min(col("dur_s")).as("p50_s"))
    val p90 = j.filter(col("cum") * 10 >= col("n") * 9)
      .groupBy(col("bidx")).agg(min(col("dur_s")).as("p90_s"))
    p50.join(p90, Seq("bidx")).join(n, Seq("bidx"))
      .select(col("bidx"), col("bucket"), col("n").as("n_sessions"),
        col("p50_s"), col("p90_s"), col("max_s"))
      .orderBy("bidx")
  }

  val q277Sql: String =
    s"""WITH $sessionCte,
       |g AS (
       |  SELECT user_id, sid, (max(us) - min(us)) // 1000000 AS dur_s,
       |    CASE WHEN sid = 1 THEN 0 WHEN sid <= 3 THEN 1
       |         WHEN sid <= 9 THEN 2 ELSE 3 END AS bidx,
       |    CASE WHEN sid = 1 THEN 'first' WHEN sid <= 3 THEN '2-3'
       |         WHEN sid <= 9 THEN '4-9' ELSE '10+' END AS bucket
       |  FROM se GROUP BY user_id, sid),
       |ct AS (
       |  SELECT bidx, bucket, dur_s, CAST(count(*) AS BIGINT) AS c
       |  FROM g GROUP BY 1, 2, 3),
       |cm AS (
       |  SELECT *, CAST(SUM(c) OVER (PARTITION BY bidx ORDER BY dur_s
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM ct),
       |nn AS (
       |  SELECT bidx, CAST(count(*) AS BIGINT) AS n, max(dur_s) AS max_s
       |  FROM g GROUP BY 1),
       |p50 AS (
       |  SELECT cm.bidx, cm.bucket, min(cm.dur_s) AS p50_s
       |  FROM cm JOIN nn ON cm.bidx = nn.bidx WHERE cm.cum * 2 >= nn.n
       |  GROUP BY 1, 2),
       |p90 AS (
       |  SELECT cm.bidx, min(cm.dur_s) AS p90_s
       |  FROM cm JOIN nn ON cm.bidx = nn.bidx WHERE cm.cum * 10 >= nn.n * 9
       |  GROUP BY 1)
       |SELECT p50.bidx, p50.bucket, nn.n AS n_sessions, p50.p50_s, p90.p90_s, nn.max_s
       |FROM p50 JOIN p90 ON p50.bidx = p90.bidx JOIN nn ON p50.bidx = nn.bidx
       |ORDER BY p50.bidx""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q253_session_shape", q253, Some(q253Sql)),
    ("q254_session_funnel", q254, Some(q254Sql)),
    ("q255_entry_exit", q255, Some(q255Sql)),
    ("q256_return_gaps", q256, Some(q256Sql)),
    ("q257_session_maturity", q257, Some(q257Sql)),
    ("q258_time_to_convert", q258, Some(q258Sql)),
    ("q269_session_paths", q269, Some(q269Sql)),
    ("q271_cart_abandonment", q271, Some(q271Sql)),
    ("q277_session_sla", q277, Some(q277Sql)))
}
