package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_sim

/** Modality agreement (round 6, fourteenth pack): do the TEXT near-dup
  * verdicts and the EMBEDDING geometry tell the same story? The
  * vec_id ≙ doc_id join makes the audit possible — the cosine profile
  * of verified text-dup pairs (q197), the disagreement outliers (text
  * says duplicate, embedding says distant — q198), embedding-label
  * purity of text-dup clusters (q199), and the source × label
  * contingency with exact χ² contributions (q200). Disagreement is the
  * signal that one of the two dedup stacks (q20's MinHash or q28/q61's
  * cosine) is mis-calibrated for a slice.
  *
  * Scale notes (the 100 TB story): everything joins off the MEMOIZED
  * candidate-sized pair set / cluster labels (never corpus²) against
  * the embedding table by id — key-shuffle joins, with per-pair cosine
  * a row-local index-ordered fold. q200 is one map-side-combined
  * contingency pass; its margins derive from the cell table.
  *
  * Exactness: per-pair cosines are bit-identical across engines (the
  * codegen'd `cosine_sim` folds in index order ≙ DuckDB's
  * list_zip/list_transform/list_sum), so decile bucketing, min/max,
  * and rankings on the ROUNDED cosine with integer tiebreaks are safe;
  * cluster purity and χ² numerators are integer cross-products; means
  * are float sums rounded on output only (q138's rule).
  */
object ModalityOps {
  import Relational.Q

  /** Verified text-dup pairs with both embeddings' cosine. */
  private def pairCos(s: org.apache.spark.sql.SparkSession, d: String) = {
    val e = EmbeddingOps.emb(s, d).select(col("vec_id"), col("embedding"))
    DocOps.verifiedPairs(s, d).select(col("doc_a"), col("doc_b"))
      .join(e.select(col("vec_id").as("doc_a"), col("embedding").as("ea")), Seq("doc_a"))
      .join(e.select(col("vec_id").as("doc_b"), col("embedding").as("eb")), Seq("doc_b"))
      .withColumn("cos", cosine_sim(col("ea"), col("eb")))
      .select(col("doc_a"), col("doc_b"), col("cos"))
  }

  private val pairCosSqlCte: String =
    s"""${DocOps.jaccardPairsCtes},
       |ev AS (
       |  SELECT vec_id, embedding AS emb,
       |    sqrt(list_sum(list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |pc AS MATERIALIZED (
       |  SELECT p.doc_a, p.doc_b,
       |    list_sum(list_transform(list_zip(a.emb, b.emb),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (a.nrm * b.nrm)
       |      AS cos
       |  FROM jpairs p
       |  JOIN ev a ON a.vec_id = p.doc_a
       |  JOIN ev b ON b.vec_id = p.doc_b)""".stripMargin

  // ---------------------------------------------------------------- q197
  /** Cosine profile of verified text-dup pairs: decile histogram
    * (bucket = floor(10·cos), an integer decision on the bit-identical
    * cosine) with pair counts and mean/min/max cosine per bucket.
    */
  val q197: Q = (s, d) =>
    pairCos(s, d)
      .withColumn("bucket", floor(col("cos") * 10.0))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("cos")) / count(lit(1)), 6).as("mean_cos"),
        round(min(col("cos")), 6).as("min_cos"),
        round(max(col("cos")), 6).as("max_cos"))
      .orderBy("bucket")

  val q197Sql: String =
    s"""WITH $pairCosSqlCte
       |SELECT CAST(floor(cos * 10.0) AS BIGINT) AS bucket,
       |  count(*) AS n_pairs,
       |  round(sum(cos) / count(*), 6) AS mean_cos,
       |  round(min(cos), 6) AS min_cos,
       |  round(max(cos), 6) AS max_cos
       |FROM pc GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q198
  /** Disagreement outliers: the 10 text-dup pairs with the LOWEST
    * embedding cosine — textually near-identical, semantically distant;
    * the mis-calibration worklist. Ranked on the rounded cosine with
    * the pair ids as integer tiebreaks.
    */
  val q198: Q = (s, d) => {
    // top-10 via orderBy+limit = TakeOrderedAndProject (parallel
    // per-partition top-K + driver merge), then rank the 10-row result —
    // the dup-pair set is corpus-order at scale (boilerplate clusters are
    // quadratic within cluster), so a global row_number window over it
    // would be a single-task sort of a huge table (q203/EvalOps
    // discipline; bit-identical ordering, oracle unchanged)
    val w = Window.orderBy(round(col("cos"), 6).asc, col("doc_a"), col("doc_b"))
    pairCos(s, d)
      .orderBy(round(col("cos"), 6).asc, col("doc_a"), col("doc_b")).limit(10)
      .withColumn("rk", row_number().over(w))
      .select(col("rk"), col("doc_a"), col("doc_b"),
        round(col("cos"), 6).as("cos"))
      .orderBy("rk")
  }

  val q198Sql: String =
    s"""WITH $pairCosSqlCte,
       |r AS (
       |  SELECT doc_a, doc_b, cos, row_number() OVER (
       |    ORDER BY round(cos, 6) ASC, doc_a, doc_b) AS rk
       |  FROM pc)
       |SELECT CAST(rk AS INT) AS rk, doc_a, doc_b, round(cos, 6) AS cos
       |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------- q199
  /** Embedding-label purity of text-dup clusters (size ≥ 2): member
    * count, distinct labels, the majority label's count, and purity —
    * all integers plus one division. A pure cluster means both
    * modalities agree the members are the same thing.
    */
  val q199: Q = (s, d) => {
    val lab = EmbeddingOps.emb(s, d).select(col("vec_id").as("doc_id"), col("label"))
    val m = Pipeline.dupLabels(s, d).join(lab, Seq("doc_id"))
    val lc = m.groupBy(col("cluster_id"), col("label")).agg(count(lit(1)).as("c"))
    lc.groupBy(col("cluster_id"))
      .agg(sum(col("c")).as("size"), count(lit(1)).as("n_labels"),
        max(col("c")).as("majority_n"))
      .where(col("size") >= 2L)
      .select(col("cluster_id"), col("size"), col("n_labels"), col("majority_n"),
        round(col("majority_n").cast("double") / col("size"), 6).as("purity"))
      .orderBy("cluster_id")
  }

  val q199Sql: String =
    s"""WITH RECURSIVE ${DocOps.jaccardPairsCtes},
       |edges AS (
       |  SELECT doc_a, doc_b FROM jpairs
       |  UNION ALL SELECT doc_b, doc_a FROM jpairs),
       |reach(doc_id, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.doc_b, r.label FROM reach r JOIN edges e ON e.doc_a = r.doc_id),
       |clusters AS (
       |  SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id),
       |lc AS (
       |  SELECT c.cluster_id, emb.label, CAST(count(*) AS BIGINT) AS c
       |  FROM clusters c JOIN embeddings emb ON emb.vec_id = c.doc_id
       |  GROUP BY 1, 2),
       |agg AS (
       |  SELECT cluster_id, CAST(sum(c) AS BIGINT) AS size,
       |    count(*) AS n_labels, CAST(max(c) AS BIGINT) AS majority_n
       |  FROM lc GROUP BY 1)
       |SELECT cluster_id, size, n_labels, majority_n,
       |  round(CAST(majority_n AS DOUBLE) / size, 6) AS purity
       |FROM agg WHERE size >= 2 ORDER BY cluster_id""".stripMargin

  // ---------------------------------------------------------------- q200
  /** Source × embedding-label contingency: observed count, expected
    * count under independence, and the exact χ² contribution per cell —
    * integer cross-products (n_sl·N − n_s·n_l)² over the cell table and
    * its derived margins (one contingency pass, no second scan).
    */
  val q200: Q = (s, d) => {
    val docs = graft.Graft.table(s, d, "documents").select(col("doc_id"), col("source"))
    val lab = EmbeddingOps.emb(s, d).select(col("vec_id").as("doc_id"), col("label"))
    val cell = docs.join(lab, Seq("doc_id"))
      .groupBy(col("source"), col("label")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // sources×labels cells; margins derive from it
    val ms = cell.groupBy(col("source")).agg(sum(col("n")).as("ns"))
    val ml = cell.groupBy(col("label")).agg(sum(col("n")).as("nl"))
    val tot = cell.agg(sum(col("n")).as("nt"))
    cell.join(broadcast(ms), Seq("source")).join(broadcast(ml), Seq("label"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("label"), col("n"),
        round(col("ns").cast("double") * col("nl") / col("nt"), 6).as("expected"),
        round(((col("n") * col("nt") - col("ns") * col("nl")) *
            (col("n") * col("nt") - col("ns") * col("nl"))).cast("double")
          / (col("nt").cast("double") * col("ns") * col("nl")), 6).as("chi2_term"))
      .orderBy("source", "label")
  }

  val q200Sql: String =
    """WITH cell AS (
      |  SELECT d.source, e.label, CAST(count(*) AS BIGINT) AS n
      |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
      |  GROUP BY 1, 2),
      |ms AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM cell GROUP BY 1),
      |ml AS (SELECT label, CAST(sum(n) AS BIGINT) AS nl FROM cell GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cell)
      |SELECT c.source, c.label, c.n,
      |  round(CAST(ms.ns AS DOUBLE) * ml.nl / t.nt, 6) AS expected,
      |  round(CAST((c.n * t.nt - ms.ns * ml.nl) * (c.n * t.nt - ms.ns * ml.nl)
      |      AS DOUBLE)
      |    / (CAST(t.nt AS DOUBLE) * ms.ns * ml.nl), 6) AS chi2_term
      |FROM cell c JOIN ms USING (source) JOIN ml USING (label) CROSS JOIN t
      |ORDER BY c.source, c.label""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q197_dup_cosine_profile", q197, Some(q197Sql)),
    ("q198_modality_disagreement", q198, Some(q198Sql)),
    ("q199_cluster_label_purity", q199, Some(q199Sql)),
    ("q200_source_label_chi2", q200, Some(q200Sql)))
}
