package graft.operators

import org.apache.spark.sql.functions._

/** Near-dup graph structure (round 6, sixth pack): the two structural
  * readouts q96's triangle census doesn't cover — degree assortativity
  * (Newman 2002: do heavily-duplicated documents duplicate each other,
  * or do hubs attach to leaves? template farms assort positively, spam
  * rings that mirror one canonical page negatively) and the connected-
  * component size distribution (how much of the corpus sits in dup
  * blobs of each size — the denominator behind every dedup-savings
  * estimate).
  *
  * Scale notes (the 100 TB story): both queries run on the MEMOIZED
  * near-dup artifacts (the verified pair set, the cluster labels) —
  * candidate-sized, never corpus²; q167's moment sums are one
  * aggregation over the pair set joined twice against the (node,
  * degree) table; q168 is two aggregations over the labels.
  *
  * Exactness: degrees, moment sums, component sizes and counts are
  * integers; assortativity is one division with an IEEE-exact sqrt and
  * an integer degeneracy guard (q149's shape); shares are single
  * divisions rounded on output.
  */
object GraphOps {
  import Relational.Q

  // ---------------------------------------------------------------- q167
  /** Degree assortativity of the near-dup graph: Pearson correlation of
    * the endpoint degrees over every directed edge (both orientations —
    * the standard symmetric formulation), plus node/edge counts, mean
    * and max degree. One row.
    */
  val q167: Q = (s, d) => {
    val pairs = DocOps.verifiedPairs(s, d).select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val deg = edges.groupBy(col("doc_a").as("node")).agg(count(lit(1)).as("deg"))
    val scored = edges
      .join(deg.select(col("node").as("na"), col("deg").as("x")), col("doc_a") === col("na"))
      .join(deg.select(col("node").as("nb"), col("deg").as("y")), col("doc_b") === col("nb"))
    scored.agg(
        count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .crossJoin(broadcast(deg.agg(
        count(lit(1)).as("n_nodes"), sum(col("deg")).as("sd"), max(col("deg")).as("max_deg"))))
      .select(col("n_nodes"), expr("m DIV 2").as("n_edges"),
        round(col("sd").cast("double") / col("n_nodes"), 6).as("mean_deg"),
        col("max_deg"),
        when((col("m") * col("sxx") - col("sx") * col("sx")) > 0L &&
            (col("m") * col("syy") - col("sy") * col("sy")) > 0L,
          round((col("m") * col("sxy") - col("sx") * col("sy")).cast("double")
            / sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")
              * (col("m") * col("syy") - col("sy") * col("sy")).cast("double")), 6))
          .as("assortativity"))
  }

  val q167Sql: String =
    s"""WITH ${DocOps.jaccardPairsCtes},
       |p AS (SELECT doc_a, doc_b FROM jpairs),
       |edges AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
       |deg AS MATERIALIZED (
       |  SELECT doc_a AS node, CAST(count(*) AS BIGINT) AS deg
       |  FROM edges GROUP BY 1),
       |mo AS (
       |  SELECT count(*) AS m,
       |    CAST(sum(a.deg) AS BIGINT) AS sx, CAST(sum(b.deg) AS BIGINT) AS sy,
       |    CAST(sum(a.deg * b.deg) AS BIGINT) AS sxy,
       |    CAST(sum(a.deg * a.deg) AS BIGINT) AS sxx,
       |    CAST(sum(b.deg * b.deg) AS BIGINT) AS syy
       |  FROM edges e JOIN deg a ON a.node = e.doc_a JOIN deg b ON b.node = e.doc_b),
       |nd AS (
       |  SELECT count(*) AS n_nodes, CAST(sum(deg) AS BIGINT) AS sd,
       |    CAST(max(deg) AS BIGINT) AS max_deg
       |  FROM deg)
       |SELECT nd.n_nodes, CAST(mo.m // 2 AS BIGINT) AS n_edges,
       |  round(CAST(nd.sd AS DOUBLE) / nd.n_nodes, 6) AS mean_deg, nd.max_deg,
       |  CASE WHEN mo.m * mo.sxx - mo.sx * mo.sx > 0
       |        AND mo.m * mo.syy - mo.sy * mo.sy > 0
       |  THEN round(CAST(mo.m * mo.sxy - mo.sx * mo.sy AS DOUBLE)
       |    / sqrt(CAST(mo.m * mo.sxx - mo.sx * mo.sx AS DOUBLE)
       |      * CAST(mo.m * mo.syy - mo.sy * mo.sy AS DOUBLE)), 6)
       |  END AS assortativity
       |FROM mo CROSS JOIN nd""".stripMargin

  // ---------------------------------------------------------------- q168
  /** Component size distribution of the near-dup graph (singletons
    * included): per component size, how many components and how many
    * documents, with each size's share of the corpus — the dedup-savings
    * denominator. Runs on the memoized cluster labels; integers plus
    * one division per row.
    */
  val q168: Q = (s, d) => {
    val sizes = Pipeline.dupLabels(s, d)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("size"))
    val tot = sizes.agg(sum(col("size")).as("n_total"))
    sizes.groupBy(col("size")).agg(count(lit(1)).as("n_components"))
      .crossJoin(broadcast(tot))
      .select(col("size"), col("n_components"),
        (col("size") * col("n_components")).as("n_docs"),
        round((col("size") * col("n_components")).cast("double") / col("n_total"), 6)
          .as("doc_share"))
      .orderBy("size")
  }

  val q168Sql: String =
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
       |sz AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
       |  FROM clusters GROUP BY 1),
       |t AS (SELECT CAST(sum(size) AS BIGINT) AS n_total FROM sz)
       |SELECT sz.size, count(*) AS n_components,
       |  CAST(sz.size * count(*) AS BIGINT) AS n_docs,
       |  round(CAST(sz.size * count(*) AS DOUBLE) / max(t.n_total), 6) AS doc_share
       |FROM sz CROSS JOIN t
       |GROUP BY sz.size ORDER BY sz.size""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q167_assortativity", q167, Some(q167Sql)),
    ("q168_component_sizes", q168, Some(q168Sql)))
}
