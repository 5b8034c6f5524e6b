package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.murmur3_token

/** Source-distribution drift (round 6, ninth pack): does a source's
  * token distribution look like the corpus it feeds? The monitoring
  * quartet over hashed-unigram bucket distributions (B = 1024, the
  * DSIR/q62 featurization): total variation distance with the worst
  * bucket (q177), KL and Jensen–Shannon divergence (q178),
  * Bhattacharyya/Hellinger affinity and the χ² statistic (q179), and
  * the top drift-contributing buckets per source (q180) — the
  * per-source "did the crawl change under us?" readout.
  *
  * Scale notes (the 100 TB story): one map-side-combined count pass
  * over token occurrences produces the (source × 1024)-row bucket
  * grid — metadata from there on (memoized + localCheckpoint'd, every
  * downstream query is windows/folds over ≤1024 rows per source).
  * Corpus totals derive from the grid, not a second scan. Counts that
  * grow with corpus size cross-multiply in DECIMAL (HUGEINT oracle-
  * side) before any decision.
  *
  * Exactness: TV and the drift ranking use the integer cross-
  * multiplication |ns·N − nb·Ns| — no division before a decision;
  * divergence/affinity sums fold their ≤1024 terms in explicit bucket
  * order (`sort_array`+`aggregate` ≙ `list(... ORDER BY)`+`list_sum`,
  * the q166 idiom) with ln/sqrt only inside output-rounded values.
  */
object DriftOps {
  import Relational.Q

  /** (source, bucket) grid over corpus buckets: ns (source count, ≥0),
    * nb (corpus count, >0), tns (source total), tn (corpus total).
    */
  private val gridMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def grid(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(gridMemo, s, d) {
      val occ = Graft.table(s, d, "documents")
        .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
        .where(col("w").rlike("^[a-z]+$"))
        .withColumn("bucket", murmur3_token(col("w")).bitwiseAND(lit(1023L)))
      val sb = occ.groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("ns"))
        .localCheckpoint(true) // sources×1024 rows; everything below derives
      val cb = sb.groupBy(col("bucket")).agg(sum(col("ns")).as("nb"))
      val tot = sb.groupBy(col("source")).agg(sum(col("ns")).as("tns"))
      val tn = cb.agg(sum(col("nb")).as("tn"))
      tot.crossJoin(broadcast(tn)).crossJoin(broadcast(cb))
        .join(sb, Seq("source", "bucket"), "left")
        .select(col("source"), col("bucket"),
          coalesce(col("ns"), lit(0L)).as("ns"), col("nb"),
          col("tns"), col("tn"))
        .localCheckpoint(true)
    }

  private val gridSqlCte: String =
    """wt AS (
      |  SELECT w, token
      |  FROM read_parquet('/tmp/graft_fixtures/vocab_tokens/*.parquet')),
      |occ AS (
      |  SELECT d.source, t.token & 1023 AS bucket FROM (
      |    SELECT source, unnest(string_split(lower(text), ' ')) AS w
      |    FROM documents) d JOIN wt t USING (w)
      |  WHERE regexp_matches(d.w, '^[a-z]+$$')),
      |sb AS MATERIALIZED (
      |  SELECT source, bucket, CAST(count(*) AS BIGINT) AS ns
      |  FROM occ GROUP BY 1, 2),
      |cb AS (SELECT bucket, CAST(sum(ns) AS BIGINT) AS nb FROM sb GROUP BY 1),
      |tot AS (SELECT source, CAST(sum(ns) AS BIGINT) AS tns FROM sb GROUP BY 1),
      |tnq AS (SELECT CAST(sum(nb) AS BIGINT) AS tn FROM cb),
      |grid AS MATERIALIZED (
      |  SELECT t.source, c.bucket, coalesce(s.ns, 0) AS ns, c.nb, t.tns, q.tn
      |  FROM tot t CROSS JOIN tnq q CROSS JOIN cb c
      |  LEFT JOIN sb s ON s.source = t.source AND s.bucket = c.bucket)""".stripMargin

  // ---------------------------------------------------------------- q177
  /** Total variation distance per source vs the corpus, with the worst
    * bucket: TV = Σ|ns·N − nb·Ns| / (2·Ns·N); the deviation and its
    * argmax are integer decisions (decimal cross-products), the
    * division happens once on output.
    */
  val q177: Q = (s, d) => {
    val g = grid(s, d).withColumn("dev",
      abs(col("ns").cast("decimal(38,0)") * col("tn").cast("decimal(38,0)") -
        col("nb").cast("decimal(38,0)") * col("tns").cast("decimal(38,0)")))
    val wMax = Window.partitionBy(col("source"))
    g.withColumn("dm", max(col("dev")).over(wMax))
      .groupBy(col("source"), col("tns"), col("tn"))
      .agg(sum(col("dev")).as("s_num"),
        min(when(col("dev") === col("dm"), col("bucket"))).as("worst_bucket"),
        max(col("dev")).as("worst_dev"))
      .select(col("source"), col("tns").as("n_tokens"),
        round(col("s_num").cast("double") /
          (lit(2L).cast("decimal(38,0)") * col("tns").cast("decimal(38,0)") *
            col("tn").cast("decimal(38,0)")).cast("double"), 6).as("tv"),
        col("worst_bucket"), col("worst_dev").cast("long").as("worst_dev"))
      .orderBy("source")
  }

  val q177Sql: String =
    s"""WITH $gridSqlCte,
       |dv AS (
       |  SELECT *, abs(ns::HUGEINT * tn::HUGEINT - nb::HUGEINT * tns::HUGEINT) AS dev,
       |    max(abs(ns::HUGEINT * tn::HUGEINT - nb::HUGEINT * tns::HUGEINT))
       |      OVER (PARTITION BY source) AS dm
       |  FROM grid)
       |SELECT source, tns AS n_tokens,
       |  round(CAST(sum(dev) AS DOUBLE)
       |    / CAST(2::HUGEINT * tns::HUGEINT * tn::HUGEINT AS DOUBLE), 6) AS tv,
       |  CAST(min(CASE WHEN dev = dm THEN bucket END) AS BIGINT) AS worst_bucket,
       |  CAST(max(dev) AS BIGINT) AS worst_dev
       |FROM dv GROUP BY source, tns, tn ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q178
  /** KL(source‖corpus) and Jensen–Shannon divergence per source (nats).
    * Each sum folds its ≤1024 bucket terms in explicit bucket order;
    * ln appears only inside the output-rounded folds.
    */
  val q178: Q = (s, d) => {
    grid(s, d).groupBy(col("source"))
      .agg(
        expr("aggregate(transform(sort_array(collect_list(named_struct(" +
          "'b', bucket, 'v', CASE WHEN ns > 0 THEN (CAST(ns AS DOUBLE) / tns) * " +
          "ln((CAST(ns AS DOUBLE) * tn) / (CAST(nb AS DOUBLE) * tns)) " +
          "ELSE 0.0D END))), x -> x.v), 0.0D, (a, x) -> a + x)").as("kl"),
        expr("aggregate(transform(sort_array(collect_list(named_struct(" +
          "'b', bucket, 'v', " +
          "(CASE WHEN ns > 0 THEN (CAST(ns AS DOUBLE) / tns) * " +
          "ln((CAST(ns AS DOUBLE) / tns) / ((CAST(ns AS DOUBLE) / tns + CAST(nb AS DOUBLE) / tn) / 2.0D)) " +
          "ELSE 0.0D END) + (CAST(nb AS DOUBLE) / tn) * " +
          "ln((CAST(nb AS DOUBLE) / tn) / ((CAST(ns AS DOUBLE) / tns + CAST(nb AS DOUBLE) / tn) / 2.0D))" +
          "))), x -> x.v), 0.0D, (a, x) -> a + x)").as("js2"))
      .select(col("source"), round(col("kl"), 6).as("kl"),
        round(col("js2") * 0.5, 6).as("js"))
      .orderBy("source")
  }

  val q178Sql: String =
    s"""WITH $gridSqlCte,
       |dv AS (
       |  SELECT source,
       |    list_sum(list(CASE WHEN ns > 0 THEN (CAST(ns AS DOUBLE) / tns) *
       |      ln((CAST(ns AS DOUBLE) * tn) / (CAST(nb AS DOUBLE) * tns))
       |      ELSE 0.0 END ORDER BY bucket)) AS kl,
       |    list_sum(list(
       |      (CASE WHEN ns > 0 THEN (CAST(ns AS DOUBLE) / tns) *
       |        ln((CAST(ns AS DOUBLE) / tns) / ((CAST(ns AS DOUBLE) / tns + CAST(nb AS DOUBLE) / tn) / 2.0))
       |       ELSE 0.0 END) + (CAST(nb AS DOUBLE) / tn) *
       |        ln((CAST(nb AS DOUBLE) / tn) / ((CAST(ns AS DOUBLE) / tns + CAST(nb AS DOUBLE) / tn) / 2.0))
       |      ORDER BY bucket)) AS js2
       |  FROM grid GROUP BY 1)
       |SELECT source, round(kl, 6) AS kl, round(js2 * 0.5, 6) AS js
       |FROM dv ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q179
  /** Bhattacharyya coefficient, Hellinger distance, and the χ²
    * statistic per source vs the corpus. sqrt is IEEE-exact per term;
    * every sum folds in bucket order; H = sqrt(1 − BC) uses the
    * identity ½Σ(√p−√q)² = 1 − Σ√(pq).
    */
  val q179: Q = (s, d) => {
    grid(s, d).groupBy(col("source"))
      .agg(
        expr("aggregate(transform(sort_array(collect_list(named_struct(" +
          "'b', bucket, 'v', sqrt((CAST(ns AS DOUBLE) / tns) * (CAST(nb AS DOUBLE) / tn))" +
          "))), x -> x.v), 0.0D, (a, x) -> a + x)").as("bc"),
        expr("aggregate(transform(sort_array(collect_list(named_struct(" +
          "'b', bucket, 'v', " +
          "(CAST(ns AS DOUBLE) / tns - CAST(nb AS DOUBLE) / tn) * " +
          "(CAST(ns AS DOUBLE) / tns - CAST(nb AS DOUBLE) / tn) / (CAST(nb AS DOUBLE) / tn)" +
          "))), x -> x.v), 0.0D, (a, x) -> a + x)").as("x2"))
      .select(col("source"), round(col("bc"), 6).as("bc"),
        round(sqrt(lit(1.0) - col("bc")), 6).as("hellinger"),
        round(col("x2"), 6).as("chi2"))
      .orderBy("source")
  }

  val q179Sql: String =
    s"""WITH $gridSqlCte,
       |dv AS (
       |  SELECT source,
       |    list_sum(list(sqrt((CAST(ns AS DOUBLE) / tns) * (CAST(nb AS DOUBLE) / tn))
       |      ORDER BY bucket)) AS bc,
       |    list_sum(list(
       |      (CAST(ns AS DOUBLE) / tns - CAST(nb AS DOUBLE) / tn) *
       |      (CAST(ns AS DOUBLE) / tns - CAST(nb AS DOUBLE) / tn) / (CAST(nb AS DOUBLE) / tn)
       |      ORDER BY bucket)) AS x2
       |  FROM grid GROUP BY 1)
       |SELECT source, round(bc, 6) AS bc,
       |  round(sqrt(1.0 - bc), 6) AS hellinger, round(x2, 6) AS chi2
       |FROM dv ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q180
  /** The top-8 drift-contributing buckets per source, ranked by the
    * integer cross-multiplied deviation (ties → lower bucket):
    * which hashed-vocabulary regions moved, and in which direction.
    */
  val q180: Q = (s, d) => {
    val g = grid(s, d).withColumn("dev",
      abs(col("ns").cast("decimal(38,0)") * col("tn").cast("decimal(38,0)") -
        col("nb").cast("decimal(38,0)") * col("tns").cast("decimal(38,0)")))
    val wR = Window.partitionBy(col("source"))
      .orderBy(col("dev").desc, col("bucket"))
    g.withColumn("rk", row_number().over(wR)).where(col("rk") <= 8)
      .select(col("source"), col("rk"), col("bucket"), col("ns"), col("nb"),
        col("dev").cast("long").as("dev"),
        when(col("ns").cast("decimal(38,0)") * col("tn").cast("decimal(38,0)") >
            col("nb").cast("decimal(38,0)") * col("tns").cast("decimal(38,0)"), 1)
          .otherwise(-1).as("direction"),
        round(col("ns").cast("double") / col("tns").cast("double") -
          col("nb").cast("double") / col("tn").cast("double"), 6).as("delta_p"))
      .orderBy("source", "rk")
  }

  val q180Sql: String =
    s"""WITH $gridSqlCte,
       |dv AS (
       |  SELECT *, abs(ns::HUGEINT * tn::HUGEINT - nb::HUGEINT * tns::HUGEINT) AS dev,
       |    row_number() OVER (PARTITION BY source ORDER BY
       |      abs(ns::HUGEINT * tn::HUGEINT - nb::HUGEINT * tns::HUGEINT) DESC, bucket) AS rk
       |  FROM grid)
       |SELECT source, CAST(rk AS INT) AS rk, CAST(bucket AS BIGINT) AS bucket,
       |  ns, nb, CAST(dev AS BIGINT) AS dev,
       |  CASE WHEN ns::HUGEINT * tn::HUGEINT > nb::HUGEINT * tns::HUGEINT
       |    THEN 1 ELSE -1 END AS direction,
       |  round(CAST(ns AS DOUBLE) / CAST(tns AS DOUBLE)
       |    - CAST(nb AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS delta_p
       |FROM dv WHERE rk <= 8 ORDER BY source, rk""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q177_source_drift", q177, Some(q177Sql)),
    ("q178_source_divergence", q178, Some(q178Sql)),
    ("q179_source_affinity", q179, Some(q179Sql)),
    ("q180_drift_buckets", q180, Some(q180Sql)))
}
