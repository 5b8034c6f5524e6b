package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.murmur3_token

/** Stream-semantics operators over the `events` table, expressed as batch
  * queries: JSON payload lifting, event-time windowed aggregation,
  * sessionization (gaps-and-islands), and the reference's delivery
  * guarantees — per-key total order with monotonic contiguous offsets
  * (SURVEY.md §2.6) — plus murmur3 token routing stats.
  *
  * Time arithmetic happens on epoch MICROseconds (the reference's timestamp
  * unit, `internal/producing/models.go:146`), truncated per-timestamp so the
  * DuckDB oracle (epoch_us) agrees bit-for-bit.
  */
object EventOps {
  import Relational.Q

  private def dec(c: org.apache.spark.sql.Column, scale: Int = 4) =
    c.cast(s"decimal(18,$scale)")

  // ---------------------------------------------------------------- q13
  val q13: Q = (s, d) =>
    Graft.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_k"))
      .orderBy("event_type")

  val q13Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT)) AS min_k,
      |  MAX(CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT)) AS max_k,
      |  COUNT(DISTINCT CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT)) AS n_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q14
  val q14: Q = (s, d) =>
    Graft.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy("hour", "event_type")

  val q14Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Sessionize: a new session starts after a >30 min silence per user.
    * Pure integer (micros) gaps-and-islands, exact parity with the oracle.
    */
  val q15: Q = (s, d) => {
    val e = Graft.events(s, d).withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    e.withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  val q15Sql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
      |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events
      |), t2 AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM t
      |), t3 AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM t2
      |)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
      |  MAX(us) - MIN(us) AS duration_us,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM t3 GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Per-key ordered delivery with monotonic contiguous offsets — the
    * reference's core guarantee (coalescer offset assignment,
    * `internal/producing/coalescer.go:164-170`), re-expressed as
    * repartition-by-key + in-partition ordering.
    */
  val q16: Q = (s, d) => {
    val e = Graft.events(s, d).withColumn("us", unix_micros(col("ts")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    e.withColumn("msg_offset", row_number().over(w).cast("long") - 1L)
      .select(col("event_id"), col("user_id"), col("msg_offset"))
      .orderBy("user_id", "msg_offset")
  }

  val q16Sql: String =
    """SELECT event_id, user_id,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS BIGINT) - 1 AS msg_offset
      |FROM events ORDER BY user_id, msg_offset""".stripMargin

  // ---------------------------------------------------------------- q17
  /** Token routing stats: murmur3 partition token per key + ring placement
    * over a 3-broker × 4-range ring. The 64-bit murmur3 itself is not
    * SQL-expressible, so Verify dumps the (user_id, token) map as a
    * fixture parquet (the hash is deterministic and checked against the
    * reference's published vectors in Murmur3Spec); the DuckDB oracle then
    * recomputes the RING PLACEMENT from the token with its own integer
    * arithmetic — broker index, range index, ordinal — so everything
    * downstream of the hash is independently verified.
    */
  val q17: Q = (s, d) => {
    val e = Graft.events(s, d).withColumn("key", col("user_id").cast("string"))
    e.withColumn("token", murmur3_token(col("key")))
      .withColumn("part", graft.functions.ring_partition(col("token"), 3, 4))
      .groupBy(col("user_id"), col("token"), col("part"))
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  val q17Sql: String = {
    import graft.core.TokenRing
    // ring constants for clusterSize=3, rangesPerToken=4 (token.go:49-72
    // math, interpolated so the SQL always matches TokenRing)
    val t1 = TokenRing.tokenAtIndex(3, 1)
    val t2 = TokenRing.tokenAtIndex(3, 2)
    val slice = TokenRing.ChunkSizeUnit * (TokenRing.MaxRingSize / 3).toLong
    val rangeSize = java.lang.Long.divideUnsigned(slice, 4L)
    s"""WITH tm AS (
       |  SELECT user_id, token
       |  FROM read_parquet('/tmp/graft_fixtures/token_map/*.parquet')),
       |placed AS (
       |  SELECT user_id, token,
       |    CASE WHEN token >= $t2 THEN 2 WHEN token >= $t1 THEN 1 ELSE 0 END AS bidx,
       |    CASE WHEN token >= $t2 THEN CAST($t2 AS HUGEINT)
       |         WHEN token >= $t1 THEN CAST($t1 AS HUGEINT)
       |         ELSE CAST(${Long.MinValue} AS HUGEINT) END AS tstart
       |  FROM tm),
       |parts AS (
       |  SELECT user_id, token,
       |    CAST(bidx * 4 + (CASE WHEN r >= 4 THEN 0 ELSE r END) AS INT) AS part
       |  FROM (SELECT user_id, token, bidx,
       |          CAST((CAST(token AS HUGEINT) - tstart) // $rangeSize AS INT) AS r
       |        FROM placed))
       |SELECT e.user_id, p.token, p.part, COUNT(*) AS n
       |FROM events e JOIN parts p USING (user_id)
       |GROUP BY 1, 2, 3 ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q64
  /** Log-compaction materialization: the LATEST record per key — the
    * compacted-topic view every keyed log system serves next to its
    * time-retention sweep (`TopicStore.retentionSweep` is the reference's
    * time-based cleaner; keep-latest-per-key is the standard companion
    * semantic). One shuffle on the key, one window, no second pass; at
    * 100 TB this is the same per-key grouping the per-key-order guarantee
    * already imposes, so a compacted read co-partitions with the log.
    * Ties on the micro timestamp break by event_id (the same total order
    * q15/q16 use, micros on both engines).
    */
  val q64: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("event_id").desc)
    Graft.events(s, d).withColumn("us", unix_micros(col("ts")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("us").as("last_us"),
        col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  val q64Sql: String =
    """WITH r AS (
      |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  us AS last_us, value AS last_value
      |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q72
  /** Ordered event funnel: how many users progress view → click →
    * purchase, each stage's event strictly AFTER the previous stage's
    * first qualifying event — the product-analytics query every event
    * warehouse serves. Three stage aggregations chained by per-user joins:
    * each stage is one filter + min-aggregate + equi-join on user_id, so
    * every step shuffles on the same key (co-partitioned under AQE) and
    * nothing is ever quadratic; stage tables shrink monotonically.
    * Integer-only output, hash-exact.
    */
  val q72: Q = (s, d) => {
    val e = Graft.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.agg(count(lit(1)).as("users")).select(lit(1).as("stage"), lit("view").as("event_type"), col("users"))
      .unionAll(s2.agg(count(lit(1)).as("users")).select(lit(2).as("stage"), lit("click").as("event_type"), col("users")))
      .unionAll(s3.agg(count(lit(1)).as("users")).select(lit(3).as("stage"), lit("purchase").as("event_type"), col("users")))
      .orderBy("stage")
  }

  val q72Sql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT 1 AS stage, 'view' AS event_type, count(*) AS users FROM s1
      |UNION ALL
      |SELECT 2, 'click', count(*) FROM s2
      |UNION ALL
      |SELECT 3, 'purchase', count(*) FROM s3
      |ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Time-decay engagement score: per user, events weighted by a dyadic
    * half-life-per-day decay toward a fixed anchor date — the recency
    * feature online systems keep next to raw counts. Weights are EXACT
    * powers of two (2^-age_days, age clamped to 40), so every partial sum
    * is a multiple of 2^-40 well inside double's 53-bit mantissa: the sum
    * is exact regardless of aggregation order on both engines, and the
    * output is hash-comparable with NO rounding. One hash aggregation,
    * whole-stage codegen'd weights, linear at any scale.
    */
  val q73: Q = (s, d) =>
    Graft.events(s, d)
      // clamp BOTH ends: past the anchor would otherwise go negative and
      // pow(2, -age) would grow, not decay
      .withColumn("age",
        greatest(least(datediff(lit("2024-01-31").cast("date"), to_date(col("ts"))), lit(40)), lit(0)))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(pow(lit(2.0), -col("age"))).as("decay_score"))
      .orderBy("user_id")

  val q73Sql: String =
    """SELECT user_id, count(*) AS n_events,
      |  sum(pow(2.0, -greatest(least(date_diff('day', CAST(ts AS DATE), DATE '2024-01-31'), 40), 0)))
      |    AS decay_score
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q76
  /** Weekly cohort retention: users grouped by first-activity week, then
    * for each cohort the distinct users active k weeks later — the
    * retention triangle every analytics warehouse serves. Week
    * arithmetic stays on DATE (both engines truncate to Monday), and the
    * week offset is an exact integer because both dates are
    * week-truncated. Two shuffles on user_id (first-week agg + join
    * back), one distinct-count — co-partitioned, linear, integer-exact.
    */
  val q76: Q = (s, d) => {
    val e = Graft.events(s, d)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
    val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    e.join(first, "user_id")
      .withColumn("week_k", (datediff(col("wk"), col("cohort")) / 7).cast("int"))
      .groupBy(col("cohort"), col("week_k"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("cohort", "week_k")
  }

  val q76Sql: String =
    """WITH e AS (
      |  SELECT user_id, date_trunc('week', CAST(ts AS DATE)) AS wk
      |  FROM events),
      |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1)
      |SELECT f.cohort, CAST(date_diff('day', f.cohort, e.wk) // 7 AS INT) AS week_k,
      |  count(DISTINCT e.user_id) AS users
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q102
  /** Engine differential test under the oracle gate: events produced
    * through the REAL write path (murmur3 ring routing, one shuffle,
    * contiguous offset assignment, partitioned zstd parquet) and read
    * back through the DSv2 `format("graft")` connector — while the
    * DuckDB oracle re-derives every offset RELATIONALLY from the
    * `event_parts` fixture (ring placement of each key, q17's pattern)
    * and a per-partition (timestamp, key) window. A routing, offset
    * assignment, write, or connector bug anywhere in the path
    * hash-fails the gate. Keys are unique (event_id), so the produce
    * order tiebreak never reaches the non-SQL-expressible value hash.
    * The scratch store is memoized per (session, scale) and rebuilt
    * fresh per JVM under java.io.tmpdir.
    */
  private val rtMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]

  /** Scratch root unique per (session, scale): the memo is per-session,
    * so the PATH must be too — a fixed path would let a second session's
    * memo miss delete the store out from under the first session's live
    * scan (appId separates JVMs, identityHashCode separates newSession()s
    * within one).
    */
  private[operators] def sessionScopedRoot(s: SparkSession, prefix: String, d: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val sid = s"${s.sparkContext.applicationId}-${System.identityHashCode(s)}"
      .replaceAll("[^A-Za-z0-9-]", "_")
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/$prefix-$sid-$tag"
  }

  private def roundtripRoot(s: SparkSession, d: String): String =
    DocOps.Memo.get(rtMemo, s, d) {
      val root = sessionScopedRoot(s, "graft-rt", d)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val store = new graft.engine.TopicStore(s, root)
      store.produce("events", Graft.events(s, d).select(
        col("event_id").cast("string").as("key"),
        encode(col("event_id").cast("string"), "UTF-8").as("value"),
        col("ts").as("timestamp")))
      root
    }

  val q102: Q = (s, d) => {
    val root = roundtripRoot(s, d)
    s.read.format("graft")
      .option("root", root).option("topic", "events").load()
      .select(col("key").cast("long").as("event_id"), col("part"), col("offset"))
      .orderBy("part", "offset")
  }

  val q102Sql: String =
    """WITH p AS (
      |  SELECT event_id, part
      |  FROM read_parquet('/tmp/graft_fixtures/event_parts/*.parquet')),
      |j AS (
      |  SELECT e.event_id, CAST(p.part AS INT) AS part, e.ts
      |  FROM events e JOIN p USING (event_id))
      |SELECT event_id, part,
      |  CAST(row_number() OVER (
      |    PARTITION BY part
      |    ORDER BY epoch_us(ts), CAST(event_id AS VARCHAR)) AS BIGINT) - 1 AS "offset"
      |FROM j ORDER BY part, "offset"""".stripMargin

  // ---------------------------------------------------------------- q107
  /** The DSv2 WRITE path under the same relational spec as q102: the
    * identical event batch goes in through `df.write.format("graft")`
    * (V1Write fallback → the engine produce plan — see
    * `sources/GraftSource.scala`) instead of a direct `store.produce`
    * call, and comes back through the connector read. The oracle is
    * q102's: re-derive every (part, offset) relationally from the
    * `event_parts` ring-placement fixture. A schema-adaption, routing,
    * or offset bug anywhere in the writer surface hash-fails the gate;
    * agreement with q102 is a differential check that both produce
    * surfaces compile to the same plan.
    */
  private val cwMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]

  private def connectorWriteRoot(s: SparkSession, d: String): String =
    DocOps.Memo.get(cwMemo, s, d) {
      val root = sessionScopedRoot(s, "graft-cw", d)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      Graft.events(s, d).select(
        col("event_id").cast("string").as("key"),
        encode(col("event_id").cast("string"), "UTF-8").as("value"),
        col("ts").as("timestamp"))
        .write.format("graft")
        .option("root", root).option("topic", "events")
        .mode("append").save()
      root
    }

  val q107: Q = (s, d) => {
    val root = connectorWriteRoot(s, d)
    s.read.format("graft")
      .option("root", root).option("topic", "events").load()
      .select(col("key").cast("long").as("event_id"), col("part"), col("offset"))
      .orderBy("part", "offset")
  }

  // ---------------------------------------------------------------- q121
  /** Join-key skew audit — the diagnosis read before reaching for q69's
    * salted join or AQE skew hints: the 10 heaviest keys of the
    * events.user_id distribution with, per key, its row count, its share
    * of the table in integer basis points, and its multiple of the
    * average key load. A key at 100× the average is the one that turns a
    * co-partitioned join into a straggler task; the fix (salting factor,
    * AQE skew threshold) is sized directly from this table.
    *
    * Shape: one map-side-combined GROUP BY to distinct-key rows, a
    * key-count-sized summary aggregation, and an exact top-10
    * (per-partition heaps). Exactness: shares are integer
    * cross-multiplication (cnt·10000 DIV n); the multiple is the same
    * two-int division on both engines, rounded at 6.
    */
  val q121: Q = (s, d) => {
    val counts = Graft.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      sum(col("cnt")).as("n"), count(lit(1)).as("k")).select(
      col("n"), col("k"))
    counts.crossJoin(broadcast(stats))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(10)
      .select(
        col("user_id"), col("cnt"),
        expr("cnt * 10000L DIV n").as("share_bp"), // integer division — Column./ is double
        round(col("cnt").cast("double") * col("k") / col("n"), 6).as("x_avg"))
  }

  val q121Sql: String =
    """WITH c AS (
      |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
      |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS k FROM c)
      |SELECT user_id, cnt,
      |  CAST(cnt * 10000 // s.n AS BIGINT) AS share_bp,
      |  round(CAST(cnt AS DOUBLE) * s.k / s.n, 6) AS x_avg
      |FROM c CROSS JOIN s
      |ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q13_json_extract", q13, Some(q13Sql)),
    ("q14_time_window_agg", q14, Some(q14Sql)),
    ("q15_sessionize", q15, Some(q15Sql)),
    ("q16_per_key_order", q16, Some(q16Sql)),
    ("q17_token_routing", q17, Some(q17Sql)),
    ("q64_log_compaction", q64, Some(q64Sql)),
    ("q72_event_funnel", q72, Some(q72Sql)),
    ("q73_decay_engagement", q73, Some(q73Sql)),
    ("q76_cohort_retention", q76, Some(q76Sql)),
    ("q102_engine_roundtrip", q102, Some(q102Sql)),
    ("q107_connector_write", q107, Some(q102Sql)),
    ("q121_skew_audit", q121, Some(q121Sql))
  )
}
