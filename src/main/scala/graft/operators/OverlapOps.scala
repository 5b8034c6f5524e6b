package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval-overlap self-join analytics (round 7, twenty-ninth pack):
  * user co-presence from `SessionOps`' 6 h-gap sessions — which users'
  * sessions overlap in time, for how long, and when. Top co-present
  * pairs (q259), the meeting-duration histogram (q260), the most
  * co-present users (q261), the meeting hour-of-day profile (q262),
  * and the event-time band self-join trigger matrix (q270).
  *
  * The operator family this adds is the INTERVAL SELF-OVERLAP JOIN
  * (q38/q39/q93 are as-of / value-band / point-in-time joins; nothing
  * else joins intervals to intervals). The Spark plan blocks sessions
  * by covered epoch hour (`sequence` explode, fan-out bounded by
  * session duration), equi-joins on the hour bucket with ua < ub, and
  * keeps a surviving pair only in the bucket containing the overlap's
  * START (`greatest(start) DIV 1h = h`) — each overlapping session pair
  * is counted EXACTLY once, no post-hoc distinct. The DuckDB oracle
  * runs the UNBLOCKED inequality join (`a.s <= b.e AND b.s <= a.e`)
  * instead, so the blocking + dedup discipline is itself independently
  * verified. At 100 TB the hour bucket bounds every join task to
  * (sessions live that hour)²; a hot hour is further sharded by a
  * SECOND blocking key — `pmod(hash(ua), SaltShards)` on the a side,
  * the b side replicated per shard (q136's two-level discipline), so
  * a flash-event hour spreads across `SaltShards` tasks instead of
  * one — and the
  * per-pair output is aggregated before anything global (top-20s via
  * orderBy+limit = TakeOrderedAndProject, never a global window).
  *
  * Exactness: overlap = least(end) − greatest(start) on epoch MICROS,
  * strictly positive (touching endpoints are not co-presence); every
  * output is integer counts/sums; top-20 ties break on user ids.
  */
object OverlapOps {
  import Relational.Q

  /** One row per strictly-overlapping session pair (ua < ub):
    * (ua, sa, ub, sb, ovl_us, hod). Memoized per (session, sfDir) and
    * pinned — four consumers, one derivation (the q19 pair-set
    * discipline).
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  private[graft] def meetingPairs(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(memo, s, d) {
      pairsFromSessions(SessionOps.sessionTable(s, d)).localCheckpoint(true)
    }

  /** How many user-id shards the hour bucket is salted into: the second
    * blocking key that keeps a hot hour (flash event) from landing its
    * sessions-squared probe in ONE join task. The a side carries
    * `pmod(hash(ua), SaltShards)`, the b side is replicated once per
    * shard value (the q136 two-level discipline), so every pair still
    * meets EXACTLY once — in the a-user's shard — and each task's probe
    * work drops to (n_hour / S) x n_hour. Total comparisons are
    * unchanged (the output is quadratic in concurrent users by
    * definition); only the per-task bound shrinks S-fold. The b-side
    * replication adds S x |sessions x covered-hours| shuffle rows —
    * session envelopes, not payloads, so bytes stay trivial next to the
    * probe work it redistributes.
    */
  private[graft] val SaltShards = 8

  /** The salted hour-blocked overlap self-join over an explicit session
    * table (user_id, sid, start_us, end_us) — extracted so the skewed-
    * hour fixture test drives the EXACT production plan.
    */
  private[graft] def pairsFromSessions(g: DataFrame): DataFrame = {
    def side(p: String) = g.select(
      col("user_id").as(s"u$p"), col("sid").as(s"s$p"),
      col("start_us").as(s"${p}s_us"), col("end_us").as(s"${p}e_us"),
      explode(sequence(
        expr("start_us DIV 3600000000"),
        expr("end_us DIV 3600000000"))).as("h"))
    // r12: spread the probe side across (h, salt) explicitly — the
    // session table is aggregate-sized, so AQE coalesced it to ONE
    // partition and the broadcast hour-join ran the entire quadratic
    // pair fan-out on a single task (measured 12.2 s of single-core CPU
    // at sf0.1 — the salt's per-task bound never engaged). The
    // partition count derives from the runtime; the exchange moves
    // session envelopes, and the blocking keys are exactly the join
    // keys, so a shuffle join reuses it outright (guide §2.5).
    val a = side("a").withColumn("salt", pmod(hash(col("ua")), lit(SaltShards)))
      .repartition(g.sparkSession.sparkContext.defaultParallelism,
        col("h"), col("salt"))
    val b = side("b").withColumn("salt",
      explode(sequence(lit(0), lit(SaltShards - 1))))
    a.join(b, Seq("h", "salt"))
      .filter(col("ua") < col("ub"))
      .withColumn("ovl_us",
        least(col("ae_us"), col("be_us")) - greatest(col("as_us"), col("bs_us")))
      .filter(col("ovl_us") > 0L)
      // count the pair only in its overlap-start bucket
      .filter(expr("greatest(as_us, bs_us) DIV 3600000000") === col("h"))
      .select(col("ua"), col("sa"), col("ub"), col("sb"), col("ovl_us"),
        (expr("greatest(as_us, bs_us) DIV 3600000000") % 24L).as("hod"))
  }

  /** Unblocked inequality-join twin of `meetingPairs` for the oracle —
    * shares `SessionOps.sessionCte`.
    */
  private val pairsCte: String =
    s"""${SessionOps.sessionCte},
       |g AS (
       |  SELECT user_id, sid, min(us) AS start_us, max(us) AS end_us
       |  FROM se GROUP BY 1, 2),
       |p AS (
       |  SELECT a.user_id AS ua, a.sid AS sa, b.user_id AS ub, b.sid AS sb,
       |    least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us) AS ovl_us,
       |    (greatest(a.start_us, b.start_us) // 3600000000) % 24 AS hod
       |  FROM g a JOIN g b
       |    ON a.user_id < b.user_id AND a.start_us <= b.end_us AND b.start_us <= a.end_us
       |  WHERE least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us) > 0)""".stripMargin

  // ---------------------------------------------------------------- q259
  /** Top-20 co-present user pairs by total overlap time. */
  val q259: Q = (s, d) =>
    meetingPairs(s, d)
      .groupBy(col("ua"), col("ub"))
      .agg(sum(col("ovl_us")).as("total_ovl_us"), count(lit(1)).as("n_meetings"))
      .orderBy(col("total_ovl_us").desc, col("ua"), col("ub"))
      .limit(20)

  val q259Sql: String =
    s"""WITH $pairsCte
       |SELECT ua, ub, CAST(sum(ovl_us) AS BIGINT) AS total_ovl_us,
       |  count(*) AS n_meetings
       |FROM p GROUP BY 1, 2
       |ORDER BY total_ovl_us DESC, ua, ub LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q260
  /** Meeting-duration histogram: overlapping session pairs bucketed by
    * overlap length (≤5 m / 5–30 m / 30 m–2 h / 2–6 h / >6 h).
    */
  val q260: Q = (s, d) =>
    meetingPairs(s, d)
      .withColumn("bidx",
        when(col("ovl_us") <= 300000000L, 0)
          .when(col("ovl_us") <= 1800000000L, 1)
          .when(col("ovl_us") <= 7200000000L, 2)
          .when(col("ovl_us") <= 21600000000L, 3).otherwise(4))
      .withColumn("bucket",
        when(col("ovl_us") <= 300000000L, "<=5m")
          .when(col("ovl_us") <= 1800000000L, "5-30m")
          .when(col("ovl_us") <= 7200000000L, "30m-2h")
          .when(col("ovl_us") <= 21600000000L, "2-6h").otherwise(">6h"))
      .groupBy(col("bidx"), col("bucket"))
      .agg(
        count(lit(1)).as("n_meetings"),
        sum(col("ovl_us")).as("sum_ovl_us"),
        max(col("ovl_us")).as("max_ovl_us"))
      .orderBy("bidx")

  val q260Sql: String =
    s"""WITH $pairsCte,
       |b AS (
       |  SELECT ovl_us,
       |    CASE WHEN ovl_us <= 300000000 THEN 0 WHEN ovl_us <= 1800000000 THEN 1
       |         WHEN ovl_us <= 7200000000 THEN 2 WHEN ovl_us <= 21600000000 THEN 3
       |         ELSE 4 END AS bidx,
       |    CASE WHEN ovl_us <= 300000000 THEN '<=5m' WHEN ovl_us <= 1800000000 THEN '5-30m'
       |         WHEN ovl_us <= 7200000000 THEN '30m-2h' WHEN ovl_us <= 21600000000 THEN '2-6h'
       |         ELSE '>6h' END AS bucket
       |  FROM p)
       |SELECT bidx, bucket, count(*) AS n_meetings,
       |  CAST(sum(ovl_us) AS BIGINT) AS sum_ovl_us, max(ovl_us) AS max_ovl_us
       |FROM b GROUP BY 1, 2 ORDER BY bidx""".stripMargin

  // ---------------------------------------------------------------- q261
  /** Most co-present users: top-20 by total overlap time across all
    * partners, with meeting and distinct-partner counts. Both pair
    * directions unioned so each user accumulates every meeting once.
    */
  val q261: Q = (s, d) => {
    val p = meetingPairs(s, d)
    val both = p.select(col("ua").as("user_id"), col("ub").as("partner"), col("ovl_us"))
      .unionAll(p.select(col("ub").as("user_id"), col("ua").as("partner"), col("ovl_us")))
    both.groupBy(col("user_id"))
      .agg(
        sum(col("ovl_us")).as("total_ovl_us"),
        count(lit(1)).as("n_meetings"),
        countDistinct(col("partner")).as("n_partners"))
      .orderBy(col("total_ovl_us").desc, col("user_id"))
      .limit(20)
  }

  val q261Sql: String =
    s"""WITH $pairsCte,
       |both_dirs AS (
       |  SELECT ua AS user_id, ub AS partner, ovl_us FROM p
       |  UNION ALL
       |  SELECT ub AS user_id, ua AS partner, ovl_us FROM p)
       |SELECT user_id, CAST(sum(ovl_us) AS BIGINT) AS total_ovl_us,
       |  count(*) AS n_meetings, count(DISTINCT partner) AS n_partners
       |FROM both_dirs GROUP BY 1
       |ORDER BY total_ovl_us DESC, user_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q262
  /** Meeting hour-of-day profile: meetings attributed to the UTC hour
    * their overlap starts — 24-row co-presence rhythm.
    */
  val q262: Q = (s, d) =>
    meetingPairs(s, d)
      .groupBy(col("hod"))
      .agg(count(lit(1)).as("n_meetings"), sum(col("ovl_us")).as("sum_ovl_us"))
      .orderBy("hod")

  val q262Sql: String =
    s"""WITH $pairsCte
       |SELECT hod, count(*) AS n_meetings,
       |  CAST(sum(ovl_us) AS BIGINT) AS sum_ovl_us
       |FROM p GROUP BY 1 ORDER BY hod""".stripMargin

  // ---------------------------------------------------------------- q270
  /** Trigger matrix: for every ordered event-type pair (a, b), how many
    * times a user's b event lands STRICTLY after an a event within one
    * hour, and how many users exhibit it — the batch analog of the
    * stream-stream interval join (`StreamOps.intervalJoin`), on the
    * event-TIME band where q39 bands values. One (user, hour-bucket) equi-join
    * with the band predicate, the a side replicated to its two candidate
    * buckets (band ≤ 1 h ⇒ b is in a's bucket or the next, r9): each
    * join task is bounded by a user's events-per-hour squared —
    * rate-bounded even for a firehose user, the q259 second-blocking-key
    * discipline. |types|² output, pure integer counts.
    */
  val q270: Q = (s, d) => {
    val e = graft.Graft.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    // hour-bucket SECOND blocking key (r9, the q259 discipline): the
    // band is <= 1 h, so a qualifying b lands in a's hour bucket or the
    // next one — replicate the a side to both, equi-join on
    // (user, bucket), and the strict band predicate keeps exactness.
    // Each pair matches EXACTLY once (b's bucket picks one replica), and
    // a firehose user's task bound drops from (events)^2 to
    // 2 x (events-per-hour)^2 per (user, hour) key.
    val a = e.select(col("user_id"), col("event_type").as("a_type"), col("us").as("a_us"))
      .withColumn("hb", explode(array(
        expr("a_us DIV 3600000000"), expr("a_us DIV 3600000000 + 1"))))
    val b = e.select(col("user_id"), col("event_type").as("b_type"), col("us").as("b_us"))
      .withColumn("hb", expr("b_us DIV 3600000000"))
    a.join(b, Seq("user_id", "hb"))
      .filter(col("b_us") > col("a_us") && col("b_us") - col("a_us") <= 3600000000L)
      .groupBy(col("a_type"), col("b_type"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("a_type", "b_type")
  }

  val q270Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events)
      |SELECT a.event_type AS a_type, b.event_type AS b_type,
      |  count(*) AS n_pairs, count(DISTINCT a.user_id) AS n_users
      |FROM e a JOIN e b
      |  ON a.user_id = b.user_id AND b.us > a.us AND b.us - a.us <= 3600000000
      |GROUP BY 1, 2 ORDER BY a_type, b_type""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q259_copresence_pairs", q259, Some(q259Sql)),
    ("q260_overlap_profile", q260, Some(q260Sql)),
    ("q261_social_time", q261, Some(q261Sql)),
    ("q262_meeting_hours", q262, Some(q262Sql)),
    ("q270_trigger_matrix", q270, Some(q270Sql)))
}
