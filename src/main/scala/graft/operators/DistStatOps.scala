package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.murmur3_token

/** Distributional statistics (round 6, eighth pack): the sketch-honesty
  * and two-sample readouts a data team runs before trusting per-source
  * corpus slices — a HyperLogLog distinct-vocabulary estimate audited
  * against the exact count (q173), the two-sample Kolmogorov–Smirnov
  * distance between every pair of sources' document-length
  * distributions (q174), the Mann–Whitney U / AUC for the same pairs
  * (q175), and per-source Gini concentration of character mass plus the
  * corpus Herfindahl index (q176).
  *
  * Scale notes (the 100 TB story): q173's register table is 256 rows
  * per source (metadata) built by one map-side-combined max over the
  * distinct-token stream; the KS/MWU machinery runs entirely on
  * per-(source, length) COUNT tables — bounded by #distinct lengths,
  * not documents — with per-pair windows over those counts; q176's
  * rank·value sum uses the closed-form run formula over the same count
  * table (Σ i over a tie run = c·C + c(c+1)/2), so no per-document
  * rank window exists anywhere. Products that grow with corpus size
  * are carried in DECIMAL(38,0) (HUGEINT in the oracle).
  *
  * Exactness: HLL registers are integers (rho via length(bin(v)) — an
  * integer bit-length, no log); 2^-M sums are carried in units of
  * 2^-56 as exact decimals and cast to double once; KS statistics use
  * the integer cross-multiplication |nb·cumA − na·cumB|; MWU midranks
  * use the doubled-rank integer form; Gini/HHI are decimal-exact until
  * one final division. ln appears only in q173's linear-counting
  * output column, rounded at 6 (q133's rule).
  */
object DistStatOps {
  import Relational.Q

  // ---------------------------------------------------------------- q173
  /** HLL honesty: per source, the 256-register HyperLogLog estimate of
    * the distinct alphabetic vocabulary vs the exact distinct count.
    * bucket = low 8 hash bits, rho = leading zeros of the remaining 55
    * bits + 1; the raw estimate alpha·m²/Σ2^-M is computed from an
    * exact integer sum in units of 2^-56. Also reports the empty-bucket
    * count and the linear-counting estimate m·ln(m/V).
    */
  val q173: Q = (s, d) => {
    val st = Graft.table(s, d, "documents")
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w").rlike("^[a-z]+$")).distinct()
      .withColumn("h", murmur3_token(col("w")).bitwiseAND(lit(9223372036854775807L)))
      .withColumn("bucket", col("h").bitwiseAND(lit(255L)))
      .withColumn("v", expr("shiftright(h, 8)"))
      .withColumn("rho",
        when(col("v") === 0L, 56).otherwise(lit(56) - length(bin(col("v")))))
    val reg = st.groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("m"))
    val exact = st.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    reg.groupBy(col("source"))
      .agg(count(lit(1)).as("np"),
        sum(expr("CAST(shiftleft(1L, 56 - m) AS DECIMAL(38,0))")).as("sp"))
      .join(exact, Seq("source"))
      .withColumn("n_empty", lit(256L) - col("np"))
      .withColumn("sumd",
        (col("sp") + col("n_empty").cast("decimal(38,0)") *
          lit(72057594037927936L).cast("decimal(38,0)")).cast("double"))
      .select(col("source"), col("n_exact"), col("n_empty"),
        round(lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0) *
          lit(72057594037927936.0) / col("sumd"), 6).as("est_hll"),
        when(col("n_empty") > 0L,
          round(lit(256.0) * log(lit(256.0) / col("n_empty").cast("double")), 6))
          .as("est_lc"))
      .orderBy("source")
  }

  val q173Sql: String =
    """WITH wt AS (
      |  SELECT w, token
      |  FROM read_parquet('/tmp/graft_fixtures/vocab_tokens/*.parquet')),
      |sw AS (
      |  SELECT DISTINCT source, w FROM (
      |    SELECT source, unnest(string_split(lower(text), ' ')) AS w
      |    FROM documents)
      |  WHERE regexp_matches(w, '^[a-z]+$$')),
      |st AS MATERIALIZED (
      |  SELECT s.source, t.token & 9223372036854775807 AS h
      |  FROM sw s JOIN wt t USING (w)),
      |rr AS (
      |  SELECT source, h & 255 AS bucket, h >> 8 AS v,
      |    CASE WHEN h >> 8 = 0 THEN 56
      |         ELSE 56 - length(bin(h >> 8)) END AS rho
      |  FROM st),
      |reg AS (
      |  SELECT source, bucket, max(rho) AS m FROM rr GROUP BY 1, 2),
      |ex AS (SELECT source, count(*) AS n_exact FROM st GROUP BY 1),
      |agg AS (
      |  SELECT source, count(*) AS np,
      |    sum((1::BIGINT << (56 - m))::HUGEINT) AS sp
      |  FROM reg GROUP BY 1)
      |SELECT a.source, CAST(e.n_exact AS BIGINT) AS n_exact,
      |  CAST(256 - a.np AS BIGINT) AS n_empty,
      |  round((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 72057594037927936.0
      |    / CAST(a.sp + (256 - a.np)::HUGEINT * (1::BIGINT << 56)::HUGEINT
      |      AS DOUBLE), 6) AS est_hll,
      |  CASE WHEN 256 - a.np > 0 THEN
      |    round(256.0 * ln(256.0 / CAST(256 - a.np AS DOUBLE)), 6) END AS est_lc
      |FROM agg a JOIN ex e USING (source) ORDER BY a.source""".stripMargin

  // ---------------------------------------------------------------- pair points
  /** Per-(source pair, length value) merged count table with cumulative
    * counts from both sides — the shared ECDF input for q174/q175.
    * Bounded by #pairs × #distinct lengths, never by documents.
    * Columns: sa, sb, na, nb, value, ca, cb, cuma, cumb, call, cprev.
    */
  private val pairPointsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def pairPoints(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(pairPointsMemo, s, d) {
      val docs = Graft.table(s, d, "documents")
      val cnt = docs.groupBy(col("source"), col("n_chars").as("value"))
        .agg(count(lit(1)).as("c"))
      val tot = docs.groupBy(col("source")).agg(count(lit(1)).as("nt"))
      val pairs = tot.select(col("source").as("sa"), col("nt").as("na"))
        .crossJoin(tot.select(col("source").as("sb"), col("nt").as("nb")))
        .where(col("sa") < col("sb"))
      val ptsA = pairs.join(cnt.withColumnRenamed("source", "psa"),
          col("psa") === col("sa"))
        .select(col("sa"), col("sb"), col("na"), col("nb"), col("value"),
          col("c").as("ca"), lit(0L).as("cb"))
      val ptsB = pairs.join(cnt.withColumnRenamed("source", "psb"),
          col("psb") === col("sb"))
        .select(col("sa"), col("sb"), col("na"), col("nb"), col("value"),
          lit(0L).as("ca"), col("c").as("cb"))
      val pts = ptsA.union(ptsB)
        .groupBy(col("sa"), col("sb"), col("na"), col("nb"), col("value"))
        .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
      val w = Window.partitionBy(col("sa"), col("sb")).orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.partitionBy(col("sa"), col("sb")).orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, -1)
      pts
        .withColumn("cuma", sum(col("ca")).over(w))
        .withColumn("cumb", sum(col("cb")).over(w))
        .withColumn("call", col("ca") + col("cb"))
        .withColumn("cprev", coalesce(sum(col("ca") + col("cb")).over(wPrev), lit(0L)))
        .localCheckpoint(true)
    }

  private val pairPointsSqlCte: String =
    """cnt AS (
      |  SELECT source, n_chars AS value, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS nt FROM documents GROUP BY 1),
      |pairs AS (
      |  SELECT a.source AS sa, a.nt AS na, b.source AS sb, b.nt AS nb
      |  FROM tot a, tot b WHERE a.source < b.source),
      |pts0 AS (
      |  SELECT p.sa, p.sb, p.na, p.nb, c.value, c.c AS ca, 0::BIGINT AS cb
      |  FROM pairs p JOIN cnt c ON c.source = p.sa
      |  UNION ALL
      |  SELECT p.sa, p.sb, p.na, p.nb, c.value, 0::BIGINT, c.c
      |  FROM pairs p JOIN cnt c ON c.source = p.sb),
      |pts AS (
      |  SELECT sa, sb, na, nb, value,
      |    CAST(sum(ca) AS BIGINT) AS ca, CAST(sum(cb) AS BIGINT) AS cb
      |  FROM pts0 GROUP BY 1, 2, 3, 4, 5),
      |pp AS MATERIALIZED (
      |  SELECT *,
      |    CAST(sum(ca) OVER w AS BIGINT) AS cuma,
      |    CAST(sum(cb) OVER w AS BIGINT) AS cumb,
      |    ca + cb AS call,
      |    CAST(coalesce(sum(ca + cb) OVER (PARTITION BY sa, sb ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cprev
      |  FROM pts
      |  WINDOW w AS (PARTITION BY sa, sb ORDER BY value
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""".stripMargin

  // ---------------------------------------------------------------- q174
  /** Two-sample Kolmogorov–Smirnov distance between every source pair's
    * document-length distributions: D = max_x |F_a(x) − F_b(x)|,
    * carried as the integer numerator |nb·cumA − na·cumB| (argmax and
    * max are integer decisions; the division happens once on output).
    * Reports the distance, its integer numerator, and the smallest
    * length at which it is attained.
    */
  val q174: Q = (s, d) => {
    val pp = pairPoints(s, d)
      .withColumn("diff", abs(col("nb") * col("cuma") - col("na") * col("cumb")))
    val wMax = Window.partitionBy(col("sa"), col("sb"))
    pp.withColumn("dm", max(col("diff")).over(wMax))
      .groupBy(col("sa"), col("sb"), col("na"), col("nb"))
      .agg(max(col("diff")).as("d_num"),
        min(when(col("diff") === col("dm"), col("value"))).as("d_at"))
      .select(col("sa"), col("sb"), col("na"), col("nb"), col("d_num"),
        round(col("d_num").cast("double") / (col("na") * col("nb")).cast("double"), 6)
          .as("d"),
        col("d_at"))
      .orderBy("sa", "sb")
  }

  val q174Sql: String =
    s"""WITH $pairPointsSqlCte,
       |df AS (
       |  SELECT sa, sb, na, nb, value,
       |    abs(nb * cuma - na * cumb) AS diff,
       |    max(abs(nb * cuma - na * cumb)) OVER (PARTITION BY sa, sb) AS dm
       |  FROM pp)
       |SELECT sa, sb, na, nb, CAST(max(diff) AS BIGINT) AS d_num,
       |  round(CAST(max(diff) AS DOUBLE) / CAST(na * nb AS DOUBLE), 6) AS d,
       |  CAST(min(CASE WHEN diff = dm THEN value END) AS BIGINT) AS d_at
       |FROM df GROUP BY 1, 2, 3, 4 ORDER BY sa, sb""".stripMargin

  // ---------------------------------------------------------------- q175
  /** Mann–Whitney U / AUC between every source pair (tie-midrank form,
    * doubled to stay integer): 2·R_a = Σ_v ca·(2·cprev + call + 1),
    * u2 = 2·R_a − na(na+1), AUC = u2 / (2·na·nb) — the probability a
    * random a-document is longer than a random b-document (+ half
    * ties). Integer until the one output division.
    */
  val q175: Q = (s, d) => {
    pairPoints(s, d)
      .groupBy(col("sa"), col("sb"), col("na"), col("nb"))
      .agg(sum(col("ca") * (lit(2L) * col("cprev") + col("call") + lit(1L)))
        .as("r2"))
      .select(col("sa"), col("sb"), col("na"), col("nb"),
        (col("r2") - col("na") * (col("na") + lit(1L))).as("u2"),
        round((col("r2") - col("na") * (col("na") + lit(1L))).cast("double")
          / (lit(2L) * col("na") * col("nb")).cast("double"), 6).as("auc"))
      .orderBy("sa", "sb")
  }

  val q175Sql: String =
    s"""WITH $pairPointsSqlCte,
       |r AS (
       |  SELECT sa, sb, na, nb,
       |    CAST(sum(ca * (2 * cprev + call + 1)) AS BIGINT) AS r2
       |  FROM pp GROUP BY 1, 2, 3, 4)
       |SELECT sa, sb, na, nb,
       |  CAST(r2 - na * (na + 1) AS BIGINT) AS u2,
       |  round(CAST(r2 - na * (na + 1) AS DOUBLE)
       |    / CAST(2 * na * nb AS DOUBLE), 6) AS auc
       |FROM r ORDER BY sa, sb""".stripMargin

  // ---------------------------------------------------------------- q176
  /** Per-source Gini concentration of character mass across documents
    * (are a few giant documents most of a source's bytes?) plus each
    * source's share of total corpus characters and the corpus
    * Herfindahl index. Gini via the closed-form tie-run decomposition
    * of 2·Σ i·x_i over the (source, length) count table; decimals
    * until the final divisions.
    */
  val q176: Q = (s, d) => {
    val cnt = Graft.table(s, d, "documents")
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val wPrev = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val runs = cnt.withColumn("cp", coalesce(sum(col("c")).over(wPrev), lit(0L)))
    val per = runs.groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_docs"),
        sum(col("v") * col("c")).as("s_chars"),
        sum(col("v").cast("decimal(38,0)") *
          (lit(2L) * col("c") * col("cp") + col("c") * col("c") + col("c"))
            .cast("decimal(38,0)")).as("t2"))
      .localCheckpoint(true) // source-sized; feeds the output AND the totals
    val tot = per.agg(
      sum(col("s_chars").cast("decimal(38,0)")).as("s_tot"),
      sum(col("s_chars").cast("decimal(38,0)") * col("s_chars").cast("decimal(38,0)"))
        .as("s_sq"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("s_chars"),
        round((col("t2") - (col("n_docs") + lit(1L)).cast("decimal(38,0)") *
            col("s_chars").cast("decimal(38,0)")).cast("double")
          / (col("n_docs").cast("decimal(38,0)") *
            col("s_chars").cast("decimal(38,0)")).cast("double"), 6).as("gini"),
        round(col("s_chars").cast("double") / col("s_tot").cast("double"), 6)
          .as("share"),
        round(col("s_sq").cast("double")
          / (col("s_tot") * col("s_tot")).cast("double"), 6).as("hhi"))
      .orderBy("source")
  }

  val q176Sql: String =
    """WITH cnt AS (
      |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |runs AS (
      |  SELECT *, CAST(coalesce(sum(c) OVER (PARTITION BY source ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cp
      |  FROM cnt),
      |per AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
      |    CAST(sum(v * c) AS BIGINT) AS s_chars,
      |    sum(v::HUGEINT * (2 * c * cp + c * c + c)::HUGEINT) AS t2
      |  FROM runs GROUP BY 1),
      |tot AS (
      |  SELECT sum(s_chars::HUGEINT) AS s_tot,
      |    sum(s_chars::HUGEINT * s_chars::HUGEINT) AS s_sq
      |  FROM per)
      |SELECT p.source, p.n_docs, p.s_chars,
      |  round(CAST(p.t2 - (p.n_docs + 1)::HUGEINT * p.s_chars::HUGEINT AS DOUBLE)
      |    / CAST(p.n_docs::HUGEINT * p.s_chars::HUGEINT AS DOUBLE), 6) AS gini,
      |  round(CAST(p.s_chars AS DOUBLE) / CAST(t.s_tot AS DOUBLE), 6) AS share,
      |  round(CAST(t.s_sq AS DOUBLE) / CAST(t.s_tot * t.s_tot AS DOUBLE), 6) AS hhi
      |FROM per p CROSS JOIN tot t ORDER BY p.source""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q173_hll_honesty", q173, Some(q173Sql)),
    ("q174_ks_test", q174, Some(q174Sql)),
    ("q175_mann_whitney", q175, Some(q175Sql)),
    ("q176_gini", q176, Some(q176Sql)))
}
