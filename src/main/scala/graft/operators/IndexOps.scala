package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.{cosine_sim, murmur3_token}

/** Retrieval-index, diversity, and curriculum operators (round 5, third
  * pack): the index-construction and result-shaping layer a retrieval /
  * training-data platform runs on top of the scoring primitives the
  * earlier packs built —
  *
  *  - q141 positional inverted index (the Lucene/ES posting shape:
  *    df/cf/peak-doc/first-position statistics per term),
  *  - q142 KMV bottom-k vocabulary-overlap estimation across sources
  *    (Bar-Yossef et al. 2002; the theta-sketch set-operation shape),
  *    audited against the exact Jaccard like q131 audits minhash,
  *  - q143 MMR diversity re-ranking (Carbonell & Goldstein 1998),
  *  - q144 rank-weighted pseudo-relevance-feedback query expansion
  *    (Rocchio-style PRF with RRF-shaped doc weights, q111's constant),
  *  - q145 centroid silhouette of the q108 clustering (the simplified
  *    silhouette of Rousseeuw 1987 — the cluster-quality audit),
  *  - q146 curriculum ordering with round-robin source interleaving
  *    (Bengio et al. 2009's schedule, made deterministic).
  *
  * Scale notes (the 100 TB story):
  *  - q141 is two map-side-combined aggregations (corpus → (term, doc)
  *    → term) and a TakeOrderedAndProject top-50; the peak-doc argmax is
  *    a struct max inside the same agg, so no window ever partitions by
  *    a hot term.
  *  - q142's sketches are built with the two-level min-k decomposition
  *    (per-(source, token-bucket) window, then a ≤4096-row per-source
  *    window), so no single task ever sorts a whole source's vocabulary;
  *    everything after sketch construction is (sources² × k) metadata.
  *  - q143/q144 retrieve bounded candidate sets (top-20 / top-10) via
  *    per-partition heaps, then do driver-scale work on them — the same
  *    fit-on-bounded-data discipline as the ANN/k-means fits.
  *  - q145 is one scan with a broadcast K×64 centroid literal (q108's
  *    assignment plan) and a K-row output.
  *  - q146 reuses q122's two-level rank decomposition: per-n_chars
  *    windows in parallel plus start offsets from the grouped
  *    (metadata-sized) length table — no global sort at any width.
  *
  * Exactness: q141/q146 are pure integer pipelines; q142's estimates are
  * single divisions of exact integers; q143/q145 reuse the proven
  * in-order cosine / squared-L2 folds so every score is bit-identical
  * across engines before any argmax; q144 folds its per-term sums in
  * explicit rank order (sorted-array aggregate ≙ DuckDB's ordered
  * list_sum) so near-ties cannot flip cross-engine.
  */
object IndexOps {
  import Relational.Q
  import DocOps.docs

  private def emb(s: SparkSession, d: String) = Graft.table(s, d, "embeddings")

  // ---------------------------------------------------------------- q141
  /** Positional inverted index statistics: per alphabetic term, document
    * frequency, collection frequency, peak within-doc tf with its doc
    * (tie → lowest doc_id, folded into the aggregation as a struct max so
    * it map-side combines), and the sum of first-occurrence positions
    * (1-based). Top-50 terms by cf. All integers — exact by construction.
    */
  val q141: Q = (s, d) => {
    val tok = docs(s, d)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos0", "w")))
      .where(col("w").rlike("^[a-z]+$"))
      .select(col("w").as("term"), col("doc_id"), (col("pos0") + 1).as("pos"))
    val tf = tok.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), min(col("pos")).as("fp"))
    tf.groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        max(col("tf")).as("max_tf"),
        max(struct(col("tf").as("t"), (-col("doc_id")).as("nd"))).as("pk"),
        sum(col("fp").cast("long")).as("sum_first_pos"))
      .select(col("term"), col("df"), col("cf"), col("max_tf"),
        (-col("pk.nd")).as("peak_doc"), col("sum_first_pos"))
      .orderBy(col("cf").desc, col("term"))
      .limit(50)
  }

  val q141Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w,
      |    generate_subscripts(string_split(lower(text), ' '), 1) AS pos
      |  FROM documents),
      |tf AS (
      |  SELECT w AS term, doc_id, count(*) AS tf, min(pos) AS fp
      |  FROM tok WHERE regexp_matches(w, '^[a-z]+$') GROUP BY 1, 2),
      |ag AS (
      |  SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
      |    max(tf) AS max_tf, CAST(sum(fp) AS BIGINT) AS sum_first_pos
      |  FROM tf GROUP BY 1),
      |pk AS (
      |  SELECT term, doc_id, row_number() OVER (
      |    PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
      |  FROM tf)
      |SELECT a.term, a.df, a.cf, a.max_tf, p.doc_id AS peak_doc,
      |  a.sum_first_pos
      |FROM ag a JOIN pk p ON p.term = a.term AND p.rn = 1
      |ORDER BY a.cf DESC, a.term LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q142
  /** KMV (bottom-k) vocabulary-overlap estimation across sources: per
    * source, the k = 64 smallest murmur3 tokens of its distinct
    * alphabetic vocabulary form the sketch; per source pair, Jaccard is
    * estimated as |K(A ∪ B) ∩ A ∩ B| / k over the merged bottom-k
    * (Bar-Yossef et al. 2002), and audited against the exact Jaccard of
    * the hashed vocabularies (the q131 estimator-honesty contract).
    *
    * The min-k selection compares integers only (no float ordering), and
    * both estimates are single divisions of exact integers — exact.
    */
  private val KmvK = 64

  val q142: Q = (s, d) => {
    // localCheckpoint pins the per-source token vocabulary: it feeds FIVE
    // consumers (both sketch levels, the source list, the exact-Jaccard
    // self-join's two sides, the per-source counts) which would otherwise
    // each re-run the corpus scan + double distinct (the audit showed 12
    // parquet scans / 60 exchanges); the pinned table is vocabulary ×
    // sources sized — corpus metadata, not corpus data
    val st = docs(s, d)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .distinct()
      .withColumn("token", murmur3_token(col("w")))
      .select(col("source"), col("token"))
      .distinct()
      .localCheckpoint(true)
    // two-level exact min-k: per-(source, token-bucket) top-k bounds any
    // task at k rows per bucket; the per-source pass then sorts ≤ k·64
    // survivors — no task ever holds a full source vocabulary
    val wBucket = Window
      .partitionBy(col("source"), pmod(col("token"), lit(64L)))
      .orderBy(col("token"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("token"))
    val sk = st
      .withColumn("rb", row_number().over(wBucket)).where(col("rb") <= KmvK).drop("rb")
      .withColumn("rs", row_number().over(wSrc)).where(col("rs") <= KmvK).drop("rs")
    val srcs = st.select(col("source")).distinct()
    val pr = srcs.select(col("source").as("sa"))
      .crossJoin(srcs.select(col("source").as("sb")))
      .where(col("sa") < col("sb"))
    // merged bottom-k of each pair's two sketches (sources² × k rows —
    // metadata from here on)
    val u = broadcast(pr)
      .join(sk, col("source") === col("sa") || col("source") === col("sb"))
      .select(col("sa"), col("sb"), col("token")).distinct()
    val uk = u.withColumn("ru", row_number().over(
        Window.partitionBy(col("sa"), col("sb")).orderBy(col("token"))))
      .where(col("ru") <= KmvK).drop("ru")
    val mA = sk.select(col("source").as("ma"), col("token").as("ta"))
    val mB = sk.select(col("source").as("mb"), col("token").as("tb"))
    val km = uk
      .join(mA, col("sa") === col("ma") && col("token") === col("ta"), "left_semi")
      .join(mB, col("sb") === col("mb") && col("token") === col("tb"), "left_semi")
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("kint"))
      // renamed keys: km shares pr's lineage (u is built from pr), so a
      // join back on bare `sa`/`sb` is ambiguous-by-attribute-id
      .select(col("sa").as("ksa"), col("sb").as("ksb"), col("kint"))
    val cnt = st.groupBy(col("source")).agg(count(lit(1)).as("c"))
    val xA = st.select(col("source").as("xa"), col("token").as("xt"))
    val xB = st.select(col("source").as("xb"), col("token").as("yt"))
    val ix = xA.join(xB, col("xt") === col("yt") && col("xa") < col("xb"))
      .groupBy(col("xa"), col("xb")).agg(count(lit(1)).as("inter"))
      .select(col("xa").as("isa"), col("xb").as("isb"), col("inter"))
    pr
      .join(broadcast(cnt.select(col("source").as("sa2"), col("c").as("ca"))),
        col("sa") === col("sa2"))
      .join(broadcast(cnt.select(col("source").as("sb2"), col("c").as("cb"))),
        col("sb") === col("sb2"))
      .join(km, col("sa") === col("ksa") && col("sb") === col("ksb"), "left")
      .drop("ksa", "ksb")
      .join(ix, col("sa") === col("isa") && col("sb") === col("isb"), "left")
      .withColumn("kint0", coalesce(col("kint"), lit(0L)))
      .withColumn("i0", coalesce(col("inter"), lit(0L)))
      .withColumn("ej", col("kint0") / lit(KmvK.toDouble))
      .withColumn("xj", col("i0").cast("double") / (col("ca") + col("cb") - col("i0")))
      .select(col("sa"), col("sb"),
        round(col("ej"), 6).as("est_j"),
        round(col("xj"), 6).as("exact_j"),
        round(abs(col("ej") - col("xj")), 6).as("abs_err"))
      .orderBy(col("sa"), col("sb"))
  }

  val q142Sql: String =
    s"""WITH wt AS (
       |  SELECT w, token
       |  FROM read_parquet('/tmp/graft_fixtures/vocab_tokens/*.parquet')),
       |sw AS (
       |  SELECT DISTINCT source, w FROM (
       |    SELECT source, unnest(string_split(lower(text), ' ')) AS w
       |    FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$')),
       |st AS MATERIALIZED (
       |  SELECT DISTINCT s.source, t.token FROM sw s JOIN wt t USING (w)),
       |sk AS MATERIALIZED (
       |  SELECT source, token FROM (
       |    SELECT source, token,
       |      row_number() OVER (PARTITION BY source ORDER BY token) AS rn
       |    FROM st) WHERE rn <= $KmvK),
       |srcs AS (SELECT DISTINCT source FROM st),
       |pr AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |u AS MATERIALIZED (
       |  SELECT DISTINCT p.sa, p.sb, s.token
       |  FROM pr p JOIN sk s ON s.source IN (p.sa, p.sb)),
       |uk AS (
       |  SELECT sa, sb, token FROM (
       |    SELECT sa, sb, token,
       |      row_number() OVER (PARTITION BY sa, sb ORDER BY token) AS rn
       |    FROM u) WHERE rn <= $KmvK),
       |km AS (
       |  SELECT u.sa, u.sb, count(*) AS kint FROM uk u
       |  WHERE EXISTS (SELECT 1 FROM sk x
       |                WHERE x.source = u.sa AND x.token = u.token)
       |    AND EXISTS (SELECT 1 FROM sk y
       |                WHERE y.source = u.sb AND y.token = u.token)
       |  GROUP BY 1, 2),
       |cnt AS (SELECT source, count(*) AS c FROM st GROUP BY 1),
       |ix AS (
       |  SELECT a.source AS sa, b.source AS sb, count(*) AS inter
       |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT p.sa, p.sb,
       |    COALESCE(km.kint, 0) / ${KmvK.toDouble} AS ej,
       |    CAST(COALESCE(ix.inter, 0) AS DOUBLE) /
       |      (ca.c + cb.c - COALESCE(ix.inter, 0)) AS xj
       |  FROM pr p
       |  JOIN cnt ca ON ca.source = p.sa
       |  JOIN cnt cb ON cb.source = p.sb
       |  LEFT JOIN km ON km.sa = p.sa AND km.sb = p.sb
       |  LEFT JOIN ix ON ix.sa = p.sa AND ix.sb = p.sb)
       |SELECT sa, sb, round(ej, 6) AS est_j, round(xj, 6) AS exact_j,
       |  round(abs(ej - xj), 6) AS abs_err
       |FROM j ORDER BY sa, sb""".stripMargin

  // ---------------------------------------------------------------- q143
  /** MMR diversity re-ranking (Carbonell & Goldstein 1998): retrieve the
    * top-20 exact-cosine candidates for the fixed query vector (q27's
    * plan — per-partition heaps, one scan), then greedily select 10 by
    * mmr = λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s), λ = 0.7, tie → lowest
    * vec_id. The selection runs driver-side over the 20 collected
    * candidates (bounded, the fit discipline); every cosine on both
    * sides is the same in-order double fold (VectorMath.cosine ≙ the
    * oracle's list_sum expression), so the argmax sequence is
    * bit-identical and the oracle replays it as 10 unrolled CTE steps.
    */
  private val MmrLam = 0.7
  private val MmrRest = 0.3
  private val MmrCand = 20
  private val MmrK = 10

  val q143: Q = (s, d) => {
    val qdf = emb(s, d).filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_vec"))
    val cand = emb(s, d).filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(qdf))
      .withColumn("rel", cosine_sim(col("embedding"), col("q_vec")))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(MmrCand)
      .select(col("vec_id"), col("rel"), col("embedding"))
      .collect()
    val ids = cand.map(_.getLong(0))
    val rel = cand.map(_.getDouble(1))
    val vecs = cand.map(_.getSeq[Float](2).toArray)
    val n = ids.length
    val sim = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 1.0 else graft.core.VectorMath.cosine(vecs(i), vecs(j))
    }
    val selected = scala.collection.mutable.ArrayBuffer[Int]()
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Double)]()
    for (step <- 1 to math.min(MmrK, n)) {
      var best = -1
      var bestM = 0.0
      for (c <- 0 until n if !selected.contains(c)) {
        val pen = if (selected.isEmpty) 0.0 else selected.map(j => sim(c)(j)).max
        val m = MmrLam * rel(c) - MmrRest * pen
        if (best < 0 || m > bestM || (m == bestM && ids(c) < ids(best))) {
          best = c; bestM = m
        }
      }
      selected += best
      out += ((step, ids(best), rel(best), bestM))
    }
    import s.implicits._
    out.toSeq.toDF("step", "vec_id", "rel0", "mmr0")
      .select(col("step"), col("vec_id"),
        round(col("rel0"), 6).as("rel"), round(col("mmr0"), 6).as("mmr"))
      .orderBy(col("step"))
  }

  val q143Sql: String = {
    def stepCte(k: Int): String =
      if (k == 1)
        s"""s1 AS MATERIALIZED (
           |  SELECT 1 AS step, vec_id, rel, $MmrLam*rel - $MmrRest*0.0 AS mmr
           |  FROM c0 ORDER BY mmr DESC, vec_id LIMIT 1),
           |sel1 AS (SELECT vec_id FROM s1)""".stripMargin
      else
        s"""s$k AS MATERIALIZED (
           |  SELECT $k AS step, c.vec_id, c.rel,
           |    $MmrLam*c.rel - $MmrRest*(SELECT max(p.sim) FROM p
           |      WHERE p.ia = c.vec_id
           |        AND p.ib IN (SELECT vec_id FROM sel${k - 1})) AS mmr
           |  FROM c0 c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${k - 1})
           |  ORDER BY mmr DESC, c.vec_id LIMIT 1),
           |sel$k AS (SELECT vec_id FROM sel${k - 1}
           |          UNION ALL SELECT vec_id FROM s$k)""".stripMargin
    val steps = (1 to MmrK).map(stepCte).mkString(",\n")
    val unioned = (1 to MmrK).map(k => s"SELECT * FROM s$k").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
       |c0 AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    list_sum(list_transform(list_zip(embedding, (SELECT e FROM q)),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform(embedding,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       |     (SELECT sqrt(list_sum(list_transform(e,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) FROM q)) AS rel
       |  FROM embeddings WHERE vec_id <> 0
       |  ORDER BY rel DESC, vec_id LIMIT $MmrCand),
       |p AS MATERIALIZED (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform(a.embedding,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       |     sqrt(list_sum(list_transform(b.embedding,
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
       |  FROM c0 a JOIN c0 b ON a.vec_id <> b.vec_id),
       |$steps
       |SELECT step, vec_id, round(rel, 6) AS rel, round(mmr, 6) AS mmr
       |FROM ($unioned) ORDER BY step""".stripMargin
  }

  // ---------------------------------------------------------------- q144
  /** Rank-weighted pseudo-relevance-feedback expansion: run the fixed
    * BM25 query (q65's scoring, re-used verbatim), take the top-10 docs,
    * and score every non-query alphabetic term by
    * Σ_d tf(t,d)/dl_d/(rank_d + 60) — Rocchio-style feedback with the
    * RRF rank weight (q111's constant) instead of a score weight, which
    * keeps every factor a division of exact integers (no transcendental
    * enters any weight). Per-term sums fold in explicit rank order on
    * both sides, so scores are bit-identical before the top-15 cut.
    */
  private val PrfDocs = 10
  private val PrfTerms = 15
  private val PrfRankK = 60.0

  val q144: Q = (s, d) => {
    val top = RetrievalOps.bm25Scored(s, d)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(PrfDocs)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank"))
    val toks = docs(s, d)
      .join(broadcast(top), "doc_id")
      .select(col("doc_id"), col("rank"), split(lower(col("text")), " ").as("sarr"))
      .select(col("doc_id"), col("rank"),
        size(col("sarr")).cast("long").as("dl"), explode(col("sarr")).as("t"))
      .where(col("t").rlike("^[a-z]+$") &&
        !col("t").isInCollection(RetrievalOps.bmTerms))
    toks.groupBy(col("t"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"),
        first(col("rank")).as("rank"))
      .withColumn("contrib",
        col("tf") / col("dl") / (col("rank") + lit(PrfRankK)))
      .groupBy(col("t"))
      .agg(sort_array(collect_list(struct(col("rank"), col("contrib")))).as("cs"))
      .withColumn("score", expr(
        "aggregate(transform(cs, x -> x.contrib), 0.0D, (a, x) -> a + x)"))
      .orderBy(col("score").desc, col("t"))
      .limit(PrfTerms)
      .select(col("t").as("term"), round(col("score"), 6).as("score"))
  }

  val q144Sql: String = {
    val notIn = RetrievalOps.bmTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH ${RetrievalOps.bm25SqlCtes},
       |rk AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |  FROM scored),
       |t10 AS MATERIALIZED (SELECT doc_id, rank FROM rk WHERE rank <= $PrfDocs),
       |tok2 AS (
       |  SELECT d.doc_id, x.rank,
       |    len(string_split(lower(d.text), ' ')) AS dl,
       |    unnest(string_split(lower(d.text), ' ')) AS t
       |  FROM documents d JOIN t10 x USING (doc_id)),
       |tf2 AS (
       |  SELECT t, doc_id, count(*) AS tf, any_value(dl) AS dl,
       |    any_value(rank) AS rank
       |  FROM tok2
       |  WHERE regexp_matches(t, '^[a-z]+$$') AND t NOT IN ($notIn)
       |  GROUP BY 1, 2),
       |ex AS (
       |  SELECT t, list_sum(list(tf / dl / (rank + $PrfRankK) ORDER BY rank)) AS score
       |  FROM tf2 GROUP BY 1)
       |SELECT t AS term, round(score, 6) AS score
       |FROM ex ORDER BY ex.score DESC, t LIMIT $PrfTerms""".stripMargin
  }

  // ---------------------------------------------------------------- q145
  /** Centroid (simplified) silhouette of the q108 k-means clustering
    * (Rousseeuw 1987): per vector, a = distance to its own centroid,
    * b = distance to the nearest other centroid, s = (b − a)/max(a, b);
    * per-cluster count, mean, min, max. One scan against the broadcast
    * K×64 centroid literal (q108's exact assignment plan). The squared
    * distances are the proven in-order folds, sqrt is IEEE-exact, and
    * the mean is summed in exact integer micro-units so aggregation
    * order cannot drift the output.
    */
  val q145: Q = (s, d) => {
    val cents = EmbeddingOps.kmeansCentroids(s, d)
    emb(s, d)
      .withColumn("d2s", EmbeddingOps.kmDists(cents))
      .withColumn("own",
        (array_position(col("d2s"), array_min(col("d2s"))) - 1L).cast("int"))
      .withColumn("a", sqrt(array_min(col("d2s"))))
      .withColumn("b", sqrt(array_min(expr("filter(d2s, (x, i) -> i != own)"))))
      .withColumn("sil", (col("b") - col("a")) / greatest(col("a"), col("b")))
      .groupBy(col("own"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("sil") * lit(1000000.0), 0).cast("long")).as("sm"),
        min(col("sil")).as("mn"), max(col("sil")).as("mx"))
      .select(col("own").as("cell"), col("n"),
        round(col("sm") / lit(1000000.0) / col("n"), 6).as("mean_sil"),
        round(col("mn"), 6).as("min_sil"), round(col("mx"), 6).as("max_sil"))
      .orderBy(col("cell"))
  }

  val q145Sql: String =
    """WITH c AS (
      |  SELECT cell, dim, val
      |  FROM read_parquet('/tmp/graft_fixtures/km_cents/*.parquet')),
      |cl AS (SELECT cell, list(val ORDER BY dim) AS cvec FROM c GROUP BY cell),
      |dd AS MATERIALIZED (
      |  SELECT e.vec_id, l.cell,
      |    list_sum(list_transform(list_zip(e.embedding, l.cvec),
      |      p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))) AS d2
      |  FROM embeddings e CROSS JOIN cl l),
      |own AS (
      |  SELECT vec_id, cell, sqrt(d2) AS a FROM (
      |    SELECT vec_id, cell, d2,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
      |    FROM dd) WHERE rn = 1),
      |oth AS (
      |  SELECT d.vec_id, min(d.d2) AS m
      |  FROM dd d JOIN own o ON d.vec_id = o.vec_id AND d.cell <> o.cell
      |  GROUP BY 1),
      |sil AS (
      |  SELECT o.cell,
      |    (sqrt(t.m) - o.a) / greatest(o.a, sqrt(t.m)) AS sil
      |  FROM own o JOIN oth t USING (vec_id))
      |SELECT cell, count(*) AS n,
      |  round(CAST(sum(CAST(round(sil * 1000000.0) AS BIGINT)) AS BIGINT)
      |    / 1000000.0 / count(*), 6) AS mean_sil,
      |  round(min(sil), 6) AS min_sil, round(max(sil), 6) AS max_sil
      |FROM sil GROUP BY cell ORDER BY cell""".stripMargin

  // ---------------------------------------------------------------- q146
  /** Deterministic curriculum ordering with source interleaving: rank
    * the corpus easiest-first by (n_chars, doc_id), cut into 5 tiers
    * with the exact ntile closed form over q122's two-level rank
    * decomposition (no global sort), then interleave sources round-robin
    * within each tier (rn = within-(tier, source) rank; the curriculum
    * order is (tier, rn, source)). First 100 rows out. Pure integer
    * pipeline — exact.
    */
  val q146: Q = (s, d) => {
    val dd = docs(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    val perLen = dd.groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    val wBefore = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val starts = perLen
      .withColumn("start", coalesce(sum(col("cnt")).over(wBefore), lit(0L)))
      .select(col("n_chars"), col("start"))
    val total = dd.agg(count(lit(1)).as("nn"))
    val wInLen = Window.partitionBy(col("n_chars")).orderBy(col("doc_id"))
    val ranked = dd
      .withColumn("rn0", row_number().over(wInLen).cast("long"))
      .join(starts, "n_chars")
      .crossJoin(broadcast(total))
      .withColumn("r", col("start") + col("rn0"))
      // ntile(5) closed form: first (N % 5) tiers hold ceil(N/5) rows
      .withColumn("tier", expr(
        """CAST(CASE WHEN r <= (nn % 5) * (nn DIV 5 + 1)
          |     THEN (r - 1) DIV (nn DIV 5 + 1) + 1
          |     ELSE (nn % 5) + (r - (nn % 5) * (nn DIV 5 + 1) - 1) DIV (nn DIV 5) + 1
          |END AS INT)""".stripMargin))
    val wSrc = Window.partitionBy(col("tier"), col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    ranked.withColumn("rn", row_number().over(wSrc))
      .select(col("tier"), col("rn"), col("source"), col("doc_id"), col("n_chars"))
      .orderBy(col("tier"), col("rn"), col("source"))
      .limit(100)
  }

  val q146Sql: String =
    """WITH t AS (
      |  SELECT doc_id, source, n_chars,
      |    ntile(5) OVER (ORDER BY n_chars, doc_id) AS tier
      |  FROM documents),
      |r AS (
      |  SELECT tier, source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY tier, source
      |                       ORDER BY n_chars, doc_id) AS rn
      |  FROM t)
      |SELECT CAST(tier AS INT) AS tier, CAST(rn AS INT) AS rn, source,
      |  doc_id, n_chars
      |FROM r ORDER BY tier, rn, source LIMIT 100""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q141_inverted_index", q141, Some(q141Sql)),
    ("q142_kmv_overlap", q142, Some(q142Sql)),
    ("q143_mmr_rerank", q143, Some(q143Sql)),
    ("q144_prf_expansion", q144, Some(q144Sql)),
    ("q145_silhouette", q145, Some(q145Sql)),
    ("q146_curriculum_order", q146, Some(q146Sql)))
}
