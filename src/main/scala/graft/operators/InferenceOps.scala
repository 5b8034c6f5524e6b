package graft.operators

import org.apache.spark.sql.functions._

/** Statistical-inference audits (round 6, fourth pack): error bars and
  * ablation influence for corpus metrics — the two questions a mixture
  * owner asks after every aggregate readout: "how certain is this
  * number" (q161: half-sample bootstrap standard error of each source's
  * mean quality score) and "which source moves the global number"
  * (q162: jackknife leave-one-source-out influence). Both are the
  * classical resampling estimators made deterministic: the 64 bootstrap
  * replicates are the bits of each document's murmur3 token (one hash =
  * 64 independent half-samples — no RNG, bit-identical everywhere), and
  * the jackknife is exact arithmetic on per-source sums.
  *
  * Scale notes (the 100 TB story): q161's only corpus-scale work is one
  * map-side-combined (source, replicate-bit) aggregation — the 64×
  * explode combines before shuffling, so the shuffled table is
  * |sources| × 64 rows; q162 is a single per-source aggregation plus a
  * broadcast one-row total. No per-doc state survives either query.
  *
  * Exactness: scores enter as exact integer micro-units (q145's trick);
  * inclusion is an integer bit test; the 64 replicate means fold in
  * explicit bit order on both engines (q152's precedent); variances are
  * explicit E[x²]−E[x]² trees clamped at 0; sqrt is IEEE-exact; every
  * output is rounded at 6.
  */
object InferenceOps {
  import Relational.Q
  import DocOps.docs

  private val MicroUnit = 1000000.0

  // ---------------------------------------------------------------- q161
  /** Half-sample bootstrap SE per source: replicate b (0..63) includes a
    * document iff bit b of its murmur3 token is set — 64 deterministic
    * half-samples; per source the spread of the 64 replicate means
    * estimates the sampling error of the mean quality score (half-
    * sampling doubles the variance of a full-sample mean, hence the
    * √2 deflation on the reported SE).
    */
  val q161: Q = (s, d) => {
    val base = docs(s, d).select(col("doc_id"), col("source"))
      .join(DocOps.qualityScores(s, d), "doc_id")
      .join(StatsOps.docTokens(s, d), "doc_id")
      .select(col("source"),
        round(col("score") * lit(MicroUnit), 0).cast("long").as("m"), col("tok"))
    // replicate b = -1 is the sentinel "all documents" pass, so the full
    // per-source mean and the 64 half-samples come out of ONE corpus scan
    // and one |sources| × 65-row map-side-combined aggregation (without
    // it the full-mean branch re-derived the 3-table base join)
    val cells = base
      .select(col("source"), col("m"), col("tok"),
        explode(sequence(lit(-1), lit(63))).as("b"))
      // arithmetic shift on both engines (verified: DuckDB's >> on BIGINT
      // sign-extends exactly like the JVM's), so bit 63 behaves too
      .where(col("b") === -1 || expr("(shiftright(tok, CAST(b AS INT)) & 1) = 1"))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("nb"), sum(col("m")).as("sm"))
      .localCheckpoint(true)
    val hb = cells.where(col("b") >= 0)
      .withColumn("mb", col("sm").cast("double") / lit(MicroUnit) / col("nb"))
    val ag = hb.groupBy(col("source"))
      .agg(count(lit(1)).as("n_half"),
        expr("aggregate(transform(sort_array(collect_list(named_struct(" +
          "'b', b, 'v', mb))), x -> x.v), 0.0D, (a, x) -> a + x)").as("s1"),
        expr("aggregate(transform(sort_array(collect_list(named_struct(" +
          "'b', b, 'v', mb * mb))), x -> x.v), 0.0D, (a, x) -> a + x)").as("s2"))
    val fu = cells.where(col("b") === -1)
      .select(col("source"), col("nb").as("n_docs"), col("sm").as("smt"))
    val sd = sqrt(greatest(
      col("s2") / col("n_half") - (col("s1") / col("n_half")) * (col("s1") / col("n_half")),
      lit(0.0)))
    fu.join(ag, "source")
      .select(col("source"), col("n_docs"),
        round(col("smt").cast("double") / lit(MicroUnit) / col("n_docs"), 6)
          .as("mean_score"),
        col("n_half"),
        round(sd, 6).as("sd_halves"),
        round(sd / lit(math.sqrt(2.0)), 6).as("se_est"))
      .orderBy("source")
  }

  val q161Sql: String =
    s"""WITH ${DocOps.qualityScoreSqlCte},
       |tk AS (
       |  SELECT doc_id, tok
       |  FROM read_parquet('/tmp/graft_fixtures/doc_tokens/*.parquet')),
       |base AS MATERIALIZED (
       |  SELECT d.source, CAST(round(q.score * $MicroUnit) AS BIGINT) AS m, tk.tok
       |  FROM documents d JOIN qscore q USING (doc_id) JOIN tk USING (doc_id)),
       |cells AS MATERIALIZED (
       |  SELECT source, bs.b, count(*) AS nb, CAST(sum(m) AS BIGINT) AS sm
       |  FROM base, (SELECT unnest(range(-1, 64)) AS b) bs
       |  WHERE bs.b = -1 OR ((tok >> bs.b) & 1) = 1
       |  GROUP BY 1, 2),
       |hm AS (
       |  SELECT source, b, CAST(sm AS DOUBLE) / $MicroUnit / nb AS mb
       |  FROM cells WHERE b >= 0),
       |ag AS (
       |  SELECT source, count(*) AS n_half,
       |    list_sum(list(mb ORDER BY b)) AS s1,
       |    list_sum(list(mb * mb ORDER BY b)) AS s2
       |  FROM hm GROUP BY 1),
       |fu AS (
       |  SELECT source, nb AS n_docs, sm AS smt FROM cells WHERE b = -1)
       |SELECT f.source, f.n_docs,
       |  round(CAST(f.smt AS DOUBLE) / $MicroUnit / f.n_docs, 6) AS mean_score,
       |  a.n_half,
       |  round(sqrt(greatest(
       |    a.s2 / a.n_half - (a.s1 / a.n_half) * (a.s1 / a.n_half), 0.0)), 6)
       |    AS sd_halves,
       |  round(sqrt(greatest(
       |    a.s2 / a.n_half - (a.s1 / a.n_half) * (a.s1 / a.n_half), 0.0))
       |    / sqrt(2.0), 6) AS se_est
       |FROM fu f JOIN ag a USING (source) ORDER BY f.source""".stripMargin

  // ---------------------------------------------------------------- q162
  /** Jackknife source influence: how far the global mean quality score
    * moves when each source is left out — the exact mixture-ablation
    * readout (influence > 0 means the source drags the average down).
    * Pure integer micro-unit sums; the global and leave-one-out means
    * are each one division; sources that ARE the whole corpus are
    * excluded by an integer guard identically on both sides.
    */
  val q162: Q = (s, d) => {
    val g = docs(s, d).select(col("doc_id"), col("source"))
      .join(DocOps.qualityScores(s, d), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_g"),
        sum(round(col("score") * lit(MicroUnit), 0).cast("long")).as("s_g"))
      // pinned: the |sources|-row table feeds both the total and the
      // per-source output — one corpus scan, not two
      .localCheckpoint(true)
    val t = g.agg(sum(col("n_g")).as("nn"), sum(col("s_g")).as("ss"))
    val globalMean = col("ss").cast("double") / lit(MicroUnit) / col("nn")
    val looMean = (col("ss") - col("s_g")).cast("double") / lit(MicroUnit) /
      (col("nn") - col("n_g"))
    g.crossJoin(broadcast(t))
      .where(col("nn") > col("n_g"))
      .select(col("source"), col("n_g").as("n_docs"),
        round(globalMean, 6).as("global_mean"),
        round(looMean, 6).as("loo_mean"),
        round(globalMean - looMean, 6).as("influence"))
      .orderBy("source")
  }

  val q162Sql: String =
    s"""WITH ${DocOps.qualityScoreSqlCte},
       |g AS MATERIALIZED (
       |  SELECT d.source, count(*) AS n_g,
       |    CAST(sum(CAST(round(q.score * $MicroUnit) AS BIGINT)) AS BIGINT) AS s_g
       |  FROM documents d JOIN qscore q USING (doc_id) GROUP BY 1),
       |t AS (
       |  SELECT CAST(sum(n_g) AS BIGINT) AS nn, CAST(sum(s_g) AS BIGINT) AS ss
       |  FROM g)
       |SELECT g.source, g.n_g AS n_docs,
       |  round(CAST(t.ss AS DOUBLE) / $MicroUnit / t.nn, 6) AS global_mean,
       |  round(CAST(t.ss - g.s_g AS DOUBLE) / $MicroUnit / (t.nn - g.n_g), 6)
       |    AS loo_mean,
       |  round(CAST(t.ss AS DOUBLE) / $MicroUnit / t.nn
       |    - CAST(t.ss - g.s_g AS DOUBLE) / $MicroUnit / (t.nn - g.n_g), 6)
       |    AS influence
       |FROM g CROSS JOIN t WHERE t.nn > g.n_g ORDER BY g.source""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q161_bootstrap_se", q161, Some(q161Sql)),
    ("q162_jackknife_influence", q162, Some(q162Sql)))
}
