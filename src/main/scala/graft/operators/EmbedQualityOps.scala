package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Embedding-space quality (round 6, thirteenth pack): the geometry
  * readouts run before trusting an embedding table — per-label centroid
  * shift against the corpus centroid (q193), diagonal-Mahalanobis
  * outliers per label (q194), the vector-norm profile (q195), and the
  * per-dimension variance spectrum with the participation-ratio
  * effective dimensionality (q196). Complements q138's cohort Fréchet
  * distance with within-cohort structure.
  *
  * Scale notes (the 100 TB story): q193/q196 collapse the corpus to
  * |labels|×64 / 64 moment rows in one map-side-combined pass (the
  * q138 discipline) — all joins are broadcast metadata. q194 joins the
  * exploded corpus against the broadcast |labels|×64 stats table and
  * folds per vector (one shuffle on vec_id); its per-label top-5 is a
  * window over label partitions. q195 is row-local (in-order array
  * folds) plus one per-label aggregation.
  *
  * Exactness: per-vector norms and fold terms are identical on both
  * engines (index-ordered array folds over identically-cast doubles),
  * so min/max/argmax decisions on them are safe (q58's rule);
  * variances use the explicit clamped E[x²]−E[x]² tree (q138);
  * float-derived SUMS (means, Mahalanobis totals, variance shares)
  * appear only in output columns rounded at 6 or in rankings made on
  * the ROUNDED value with an integer tiebreak.
  */
object EmbedQualityOps {
  import Relational.Q

  /** (label, dim [1-based], x) exploded view — DuckDB's
    * generate_subscripts is 1-based, so Spark's pos is shifted to match.
    */
  private def exploded(s: org.apache.spark.sql.SparkSession, d: String) =
    EmbeddingOps.emb(s, d)
      .select(col("label"), col("vec_id"), posexplode(col("embedding")))
      .select(col("label"), col("vec_id"), (col("pos") + 1).as("dim"),
        col("col").cast("double").as("x"))

  private val explodedSqlCte: String =
    """e AS (
      |  SELECT label, vec_id, generate_subscripts(embedding, 1) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings)""".stripMargin

  /** |labels|×64 moment table: n, mu, clamped variance v (q138's tree). */
  private def labelStats(s: org.apache.spark.sql.SparkSession, d: String) =
    exploded(s, d).groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("label"), col("dim"), col("n"),
        (col("sx") / col("n")).as("mu"),
        greatest(col("sxx") / col("n") -
          (col("sx") / col("n")) * (col("sx") / col("n")), lit(0.0)).as("v"))

  private val labelStatsSqlCte: String =
    """m AS MATERIALIZED (
      |  SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
      |    sum(x) / count(*) AS mu,
      |    greatest(sum(x * x) / count(*)
      |      - (sum(x) / count(*)) * (sum(x) / count(*)), 0.0) AS v
      |  FROM e GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q193
  /** Per-label centroid shift: Euclidean distance and cosine between
    * each label's centroid and the corpus centroid (derived from the
    * label moments — no second pass). |labels|×64 metadata throughout.
    */
  val q193: Q = (s, d) => {
    val m = exploded(s, d).groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .withColumn("mu", col("sx") / col("n"))
    val g = m.groupBy(col("dim"))
      .agg((sum(col("sx")) / sum(col("n"))).as("gmu"))
    m.join(broadcast(g), Seq("dim"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n"),
        sum((col("mu") - col("gmu")) * (col("mu") - col("gmu"))).as("d2"),
        sum(col("mu") * col("gmu")).as("dot"),
        sum(col("mu") * col("mu")).as("na"),
        sum(col("gmu") * col("gmu")).as("nb"))
      .select(col("label"), col("n"),
        round(sqrt(col("d2")), 6).as("centroid_dist"),
        when(col("na") > 0.0 && col("nb") > 0.0,
          round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6))
          .as("centroid_cos"))
      .orderBy("label")
  }

  val q193Sql: String =
    s"""WITH $explodedSqlCte,
       |m AS (
       |  SELECT label, dim, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
       |    sum(x) / count(*) AS mu
       |  FROM e GROUP BY 1, 2),
       |g AS (SELECT dim, sum(sx) / sum(n) AS gmu FROM m GROUP BY 1)
       |SELECT m.label, CAST(max(m.n) AS BIGINT) AS n,
       |  round(sqrt(sum((m.mu - g.gmu) * (m.mu - g.gmu))), 6) AS centroid_dist,
       |  CASE WHEN sum(m.mu * m.mu) > 0.0 AND sum(g.gmu * g.gmu) > 0.0 THEN
       |    round(sum(m.mu * g.gmu)
       |      / (sqrt(sum(m.mu * m.mu)) * sqrt(sum(g.gmu * g.gmu))), 6) END
       |    AS centroid_cos
       |FROM m JOIN g USING (dim)
       |GROUP BY m.label ORDER BY m.label""".stripMargin

  // ---------------------------------------------------------------- q194
  /** Diagonal-Mahalanobis outliers: each vector's D² = Σ_d (x−μ)²/σ²
    * against its own label's moments; the top-5 per label ranked on the
    * ROUNDED distance with vec_id as the integer tiebreak.
    */
  val q194: Q = (s, d) => {
    val d2 = exploded(s, d)
      .join(broadcast(labelStats(s, d)), Seq("label", "dim"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(when(col("v") > 0.0,
        (col("x") - col("mu")) * (col("x") - col("mu")) / col("v"))
        .otherwise(lit(0.0))).as("d2"))
      .withColumn("d2r", round(col("d2"), 6))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("d2r").desc, col("vec_id"))
    d2.withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("label"), col("rk"), col("vec_id"), col("d2r").as("d2"))
      .orderBy("label", "rk")
  }

  val q194Sql: String =
    s"""WITH $explodedSqlCte,
       |$labelStatsSqlCte,
       |d2 AS (
       |  SELECT e.label, e.vec_id,
       |    round(sum(CASE WHEN m.v > 0.0
       |      THEN (e.x - m.mu) * (e.x - m.mu) / m.v ELSE 0.0 END), 6) AS d2r
       |  FROM e JOIN m ON m.label = e.label AND m.dim = e.dim
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT label, vec_id, d2r, row_number() OVER (
       |    PARTITION BY label ORDER BY d2r DESC, vec_id) AS rk
       |  FROM d2)
       |SELECT label, CAST(rk AS INT) AS rk, vec_id, d2r AS d2
       |FROM rk WHERE rk <= 5 ORDER BY label, rk""".stripMargin

  // ---------------------------------------------------------------- q195
  /** Vector-norm profile per label: mean/min/max L2 norm and the vector
    * attaining the max. Norms are row-local index-ordered folds —
    * bit-identical across engines, so min/max/argmax are exact
    * decisions; only the mean is a float sum (output-rounded).
    */
  val q195: Q = (s, d) =>
    EmbeddingOps.emb(s, d)
      .withColumn("norm", sqrt(expr(
        "aggregate(embedding, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("norm")) / count(lit(1)), 6).as("mean_norm"),
        round(min(col("norm")), 6).as("min_norm"),
        round(max(col("norm")), 6).as("max_norm"),
        max(struct(col("norm"), col("vec_id"))).getField("vec_id").as("max_vec"))
      .orderBy("label")

  val q195Sql: String =
    """WITH nv AS (
      |  SELECT label, vec_id,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      |  FROM embeddings),
      |mx AS (SELECT label, max(norm) AS mnorm FROM nv GROUP BY 1)
      |SELECT nv.label, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(nv.norm) / count(*), 6) AS mean_norm,
      |  round(min(nv.norm), 6) AS min_norm,
      |  round(max(nv.norm), 6) AS max_norm,
      |  CAST(max(CASE WHEN nv.norm = mx.mnorm THEN nv.vec_id END) AS BIGINT) AS max_vec
      |FROM nv JOIN mx ON mx.label = nv.label
      |GROUP BY nv.label ORDER BY nv.label""".stripMargin

  // ---------------------------------------------------------------- q196
  /** The per-dimension variance spectrum (corpus-wide, clamped tree)
    * with each dimension's share and the participation ratio
    * PR = (Σv)²/Σv² — the effective dimensionality (64 = isotropic,
    * 1 = collapsed). Ranked on the rounded variance, dim tiebreak.
    */
  val q196: Q = (s, d) => {
    val v = exploded(s, d).groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("dim"),
        greatest(col("sxx") / col("n") -
          (col("sx") / col("n")) * (col("sx") / col("n")), lit(0.0)).as("v"))
    val tot = v.agg(sum(col("v")).as("sv"),
      sum(col("v") * col("v")).as("sv2"))
    val w = Window.orderBy(round(col("v"), 6).desc, col("dim"))
    v.crossJoin(broadcast(tot))
      .withColumn("rk", row_number().over(w))
      .select(col("dim"), col("rk"),
        round(col("v"), 6).as("variance"),
        round(col("v") / col("sv"), 6).as("var_share"),
        round((col("sv") * col("sv")) / col("sv2"), 6).as("participation_ratio"))
      .orderBy("dim")
  }

  val q196Sql: String =
    s"""WITH $explodedSqlCte,
       |v AS (
       |  SELECT dim,
       |    greatest(sum(x * x) / count(*)
       |      - (sum(x) / count(*)) * (sum(x) / count(*)), 0.0) AS v
       |  FROM e GROUP BY 1),
       |t AS (SELECT sum(v) AS sv, sum(v * v) AS sv2 FROM v),
       |r AS (
       |  SELECT dim, v, row_number() OVER (
       |    ORDER BY round(v, 6) DESC, dim) AS rk
       |  FROM v)
       |SELECT CAST(r.dim AS INT) AS dim, CAST(r.rk AS INT) AS rk,
       |  round(r.v, 6) AS variance,
       |  round(r.v / t.sv, 6) AS var_share,
       |  round((t.sv * t.sv) / t.sv2, 6) AS participation_ratio
       |FROM r CROSS JOIN t ORDER BY r.dim""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q193_centroid_shift", q193, Some(q193Sql)),
    ("q194_mahalanobis_outliers", q194, Some(q194Sql)),
    ("q195_norm_profile", q195, Some(q195Sql)),
    ("q196_dim_spectrum", q196, Some(q196Sql)))
}
