package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval / corpus-assembly operators a training-data pipeline runs on
  * top of the dedup + quality stack: ranked term retrieval (BM25),
  * per-source token budgeting, incremental cross-corpus dedup (the batch
  * twin of the streaming near-dup gate), and tokenizer-prep vocabulary
  * statistics.
  *
  * Scale notes (the 100 TB story):
  *  - q65 BM25: corpus stats (N, avgdl) and the per-term df table are
  *    model-metadata-sized (|query| rows); the only corpus-sized shuffle
  *    is the (doc, term) tf aggregation, already filtered to query terms
  *    map-side. Document length rides along with the explode, so no
  *    doc-length join re-touches the corpus.
  *  - q66 budgeting: the per-source running sum is TWO-LEVEL — within-
  *    (source, length) prefixes in parallel plus start offsets from a
  *    metadata-sized window over the grouped table — so no task ever
  *    holds a whole source (round 5; previously a documented
  *    one-partition-per-source weakness).
  *  - q67 incremental dedup: candidates come from the banded LSH join
  *    (batch side × corpus side on band key) — never batch × corpus.
  *    Exact verification touches only candidate pairs. This is the shape
  *    a daily-crawl pipeline runs: yesterday's corpus is the static side,
  *    today's batch the probe side.
  *  - q68/q70 vocabulary: one map-side-combined count per token; the
  *    frequency rank + running coverage come from `rankedVocab`'s
  *    two-level decomposition (sub-shard by (frequency, first char)) —
  *    the equal-frequency hapax tail, the bulk of a web-scale
  *    vocabulary, never funnels through one task.
  */
object RetrievalOps {
  import Relational.Q
  import DocOps.docs

  // ---------------------------------------------------------------- q65
  /** BM25 ranked retrieval (Robertson/Sparck Jones; the Okapi BM25+idf
    * formulation Lucene uses): top-10 documents for a fixed conjunctive
    * term query. k1 = 1.2, b = 0.75; idf = ln((N - df + 0.5)/(df + 0.5)
    * + 1) (always positive, Lucene's variant).
    *
    * Exactness discipline (same as q62): every per-(doc, term) score is a
    * deterministic expression over integers and two exact scalar doubles
    * (avgdl is an exact int sum divided by an exact int count), the
    * per-doc sum over <= 4 terms may associate differently between
    * engines, so the output score is rounded to 6 dp while the ordering
    * uses each engine's unrounded value with doc_id as tiebreak.
    */
  private[operators] val bmTerms = Seq("hash", "join", "filter", "scan")
  private val bmK1 = 1.2
  private val bmB = 0.75

  /** Array-side term filter: keeps only query terms before the explode. */
  private def queryTermsOnly(s: org.apache.spark.sql.Column) =
    filter(s, t => t.isInCollection(bmTerms))

  /** Full (doc_id, score) BM25 table for the fixed query — q65 takes its
    * top-10, q111 fuses its top-100 with the dense ranking.
    */
  private[operators] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val dd = docs(s, d)
    val base = dd.select(col("doc_id"), split(lower(col("text")), " ").as("s"))
    // corpus stats: two exact ints -> exact doubles (model metadata, the
    // q62 centroid/ratio pattern — never a per-row recompute)
    val Array(nDocs, dlSum) = base
      .select(count(lit(1)), sum(size(col("s")).cast("long")))
      .collect().head.toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    val avgdl = dlSum / nDocs

    // filter to query terms ARRAY-SIDE (codegen lambda), then explode
    // only the survivors: exploding the full token stream first
    // materializes corpus-tokens rows to discard ~all of them — measured
    // 4x on this query at sf0.1
    val toks = base.select(
        col("doc_id"),
        size(col("s")).cast("long").as("dl"),
        explode(queryTermsOnly(col("s"))).as("t"))
    val tf = toks.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "t")
      .withColumn("idf",
        log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("score",
        col("idf") * (col("tf") * (bmK1 + 1.0)) /
          (col("tf") + lit(bmK1) * (lit(1.0 - bmB) + lit(bmB) * col("dl") / avgdl)))
      .groupBy(col("doc_id")).agg(sum(col("score")).as("score"))
    scored
  }

  val q65: Q = (s, d) =>
    bm25Scored(s, d)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
      .select(col("doc_id"), round(col("score"), 6).as("score"))

  /** CTE list ending in `scored` (doc_id, score) — shared by q65/q111. */
  private[operators] val bm25SqlCtes: String = {
    val in = bmTerms.map(t => s"'$t'").mkString(", ")
    s"""stats AS (
       |  SELECT count(*) AS n,
       |    CAST(sum(len(string_split(lower(text), ' '))) AS DOUBLE) /
       |      count(*) AS avgdl
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, len(string_split(lower(text), ' ')) AS dl,
       |    unnest(string_split(lower(text), ' ')) AS t
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, t, count(*) AS tf, any_value(dl) AS dl
       |  FROM tok WHERE t IN ($in) GROUP BY 1, 2),
       |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
       |        (tf.tf * ${bmK1 + 1.0}) /
       |        (tf.tf + $bmK1 * (1.0 - $bmB + $bmB * tf.dl / s.avgdl))) AS score
       |  FROM tf JOIN df USING (t) CROSS JOIN stats s
       |  GROUP BY 1)""".stripMargin
  }

  val q65Sql: String =
    s"""WITH $bm25SqlCtes
       |SELECT doc_id, round(score, 6) AS score
       |FROM scored ORDER BY scored.score DESC, doc_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q111
  /** Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al. 2009 —
    * the fusion every lexical+dense production retriever defaults to):
    * BM25 top-100 for the fixed term query fused with dense-cosine
    * top-100 for the fixed query vector (vec_id 0, q27's), RRF score
    * Σ 1/(60 + rank) over the lists a document appears in, top-10 out.
    *
    * Shape (the 100 TB story): each side is an exact top-K
    * (TakeOrderedAndProject — per-partition heaps, no global sort of the
    * corpus); ranking then runs over the K retrieved rows (driver-scale),
    * and the fusion is a K-row full outer join. The corpus is touched
    * exactly twice — once per ranker — and nothing corpus-sized ever
    * shuffles. doc_id ≙ vec_id is the fixture pairing (one embedding per
    * document).
    *
    * Exactness: ranks are integers off each engine's unrounded ordering
    * (total order via doc_id tiebreak; q65/q27 already prove the two
    * score formulations agree), and the RRF sum is the same two-term
    * double expression on both sides, rounded at 6.
    */
  private val RrfK = 60
  private val FuseTopK = 100

  val q111: Q = (s, d) => {
    import graft.functions.cosine_sim
    val sparse = bm25Scored(s, d)
      .filter(col("doc_id") =!= 0L)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(FuseTopK)
      .withColumn("rs", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("rs"))
    val e = graft.Graft.table(s, d, "embeddings")
    val qv = e.filter(col("vec_id") === 0L).select(col("embedding").as("q_vec"))
    val dense = e.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(qv))
      .withColumn("sim", cosine_sim(col("embedding"), col("q_vec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(FuseTopK)
      .withColumn("rd", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("rd"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (col("rs") + RrfK), lit(0.0)) +
          coalesce(lit(1.0) / (col("rd") + RrfK), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
      .select(col("doc_id"), round(col("rrf"), 6).as("rrf"),
        col("rs"), col("rd"))
  }

  val q111Sql: String =
    s"""WITH $bm25SqlCtes,
       |sp AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rs
       |  FROM (SELECT * FROM scored WHERE doc_id <> 0
       |        ORDER BY score DESC, doc_id LIMIT $FuseTopK)),
       |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
       |ds AS (
       |  SELECT vec_id AS doc_id,
       |    list_sum(list_transform(list_zip(embedding, (SELECT q FROM qv)),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |     * (SELECT sqrt(list_sum(list_transform(q, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) FROM qv)) AS sim
       |  FROM embeddings WHERE vec_id <> 0),
       |dn AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS INT) AS rd
       |  FROM (SELECT * FROM ds ORDER BY sim DESC, doc_id LIMIT $FuseTopK)),
       |f AS (
       |  SELECT coalesce(sp.doc_id, dn.doc_id) AS doc_id, sp.rs, dn.rd,
       |    coalesce(1.0 / (sp.rs + $RrfK), 0.0) + coalesce(1.0 / (dn.rd + $RrfK), 0.0) AS rrf
       |  FROM sp FULL JOIN dn ON sp.doc_id = dn.doc_id)
       |SELECT doc_id, round(rrf, 6) AS rrf, rs, rd
       |FROM f ORDER BY f.rrf DESC, doc_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q66
  /** Per-source token budgeting: each source keeps its documents (best
    * first: longest by n_chars, doc_id tiebreak) until the source's
    * cumulative token count would exceed 30% of its total token mass —
    * the per-domain quota gate crawl pipelines apply so no domain
    * dominates the mixture. Integer arithmetic end-to-end.
    */
  val q66: Q = (s, d) => {
    val dd = docs(s, d).select(
      col("doc_id"), col("source"), col("n_chars"),
      size(split(lower(col("text")), " ")).cast("long").as("dl"))
    // Two-level running sum so no task ever holds a whole source: the
    // naive Window.partitionBy(source).orderBy(n_chars desc, doc_id)
    // puts one giant source on one task at corpus scale. Instead:
    //   (1) per (source, n_chars) group: group total + within-group prefix
    //       ordered by doc_id — parallel across the (fine-grained) lengths;
    //   (2) per source over the GROUPED rows (≤ #distinct lengths, i.e.
    //       metadata-sized): prefix of strictly-longer groups + source total;
    //   (3) cum = longer-groups prefix + within-group prefix. Identical
    //       values to the single-window form, row-local recombination.
    val wInGrp = Window.partitionBy(col("source"), col("n_chars")).orderBy(col("doc_id"))
    val local = dd.withColumn("lcum", sum(col("dl")).over(wInGrp))
    // group total = the group's final prefix value: deriving it from
    // `local` (not from a second dd aggregation) lets ReuseExchange feed
    // both consumers from ONE scan+split+shuffle of the text column
    val grp = local.groupBy(col("source"), col("n_chars")).agg(max(col("lcum")).as("gsum"))
    val wLonger = Window.partitionBy(col("source")).orderBy(col("n_chars").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSrc = Window.partitionBy(col("source"))
    val starts = grp
      .withColumn("start", coalesce(sum(col("gsum")).over(wLonger), lit(0L)))
      .withColumn("tot", sum(col("gsum")).over(wSrc))
      .select(col("source"), col("n_chars"), col("start"), col("tot"))
    // pure integer comparison (cum/total <= 30% as cum*10 <= total*3):
    // no division, so no engine-specific int-vs-float division semantics
    local.join(starts, Seq("source", "n_chars"))
      .withColumn("cum", col("start") + col("lcum"))
      .where(col("cum") * 10L <= col("tot") * 3L)
      .select(col("doc_id"), col("source"), col("cum"))
      .orderBy("source", "cum")
  }

  val q66Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      |  FROM documents),
      |cum AS (
      |  -- CAST: DuckDB sum(BIGINT) is HUGEINT; pandas renders HUGEINT as
      |  -- float64 and the driver's stringified hash sees "83.0" vs "83".
      |  SELECT doc_id, source,
      |    CAST(sum(dl) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
      |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(sum(dl) OVER (PARTITION BY source) AS BIGINT) AS tot
      |  FROM d)
      |SELECT doc_id, source, cum FROM cum WHERE cum * 10 <= tot * 3
      |ORDER BY source, cum""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Incremental cross-corpus dedup: the last 20% of doc ids play "today's
    * crawl batch", the rest the standing corpus; a batch document is
    * dropped when it is a verified near-dup (J >= 0.6) of ANY corpus
    * document. Candidates via the shared MinHash banded-LSH machinery
    * (q20's parameters, so the verified output provably equals the
    * exhaustive oracle at this corpus' similarity gap), restricted to
    * batch × corpus band collisions — batch-vs-batch pairs are NOT
    * dropped here; dedup *within* the batch is q20/q58's job.
    */
  private def isBatch = (col("doc_id") % 10) >= 8

  val q67: Q = (s, d) => {
    val sigs = DocOps.docSignatures(docs(s, d)).filter(col("n") > 0)
    val banded = sigs
      .select(col("doc_id"), explode(DocOps.bandKeys(col("sig"))).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bk"))
    // corpus side is corpus-sized: shuffle-hash, never broadcast
    val corpusB = banded.filter(!isBatch).hint("shuffle_hash")
    val batchB = banded.filter(isBatch)
    val cands = batchB.as("x").join(corpusB.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk"))
      .select(col("x.doc_id").as("batch_doc"), col("y.doc_id").as("corpus_doc"))
      .distinct()

    // exact verification on candidate pairs only
    val sh = DocOps.shingleArrays(docs(s, d))
      .select(col("doc_id"), explode(col("hs")).as("shingle"))
    val sizes = sigs.select(col("doc_id"), col("n"))
    val verified = cands
      .join(sh.as("s1"), col("batch_doc") === col("s1.doc_id"))
      .join(sh.as("s2"),
        col("corpus_doc") === col("s2.doc_id") && col("s1.shingle") === col("s2.shingle"))
      .groupBy(col("batch_doc"), col("corpus_doc")).agg(count(lit(1)).as("i"))
      .join(sizes.as("sa"), col("batch_doc") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("corpus_doc") === col("sb.doc_id"))
      .where(col("i").cast("double") / (col("sa.n") + col("sb.n") - col("i")) >= 0.6)
      .groupBy(col("batch_doc")).agg(min(col("corpus_doc")).as("dup_of"))

    docs(s, d).where(isBatch).select(col("doc_id"))
      .join(verified, col("doc_id") === col("batch_doc"), "left")
      .select(col("doc_id"), col("dup_of"),
        col("dup_of").isNotNull.as("dropped"))
      .orderBy("doc_id")
  }

  val q67Sql: String =
    s"""WITH ${DocOps.jaccardCrossCtes("a.doc_id % 10 < 8 AND b.doc_id % 10 >= 8")}
       |, dups AS (
       |  SELECT doc_b AS batch_doc, min(doc_a) AS dup_of
       |  FROM jcross GROUP BY 1)
       |SELECT d.doc_id, dups.dup_of, dups.dup_of IS NOT NULL AS dropped
       |FROM documents d LEFT JOIN dups ON d.doc_id = dups.batch_doc
       |WHERE d.doc_id % 10 >= 8
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Vocabulary construction stats (tokenizer prep): every distinct token
    * with its corpus frequency, frequency rank, and cumulative corpus
    * coverage — the table a BPE/unigram trainer consumes to pick merges
    * and a curation team reads to set UNK thresholds. Counts and running
    * sums are exact integers; coverage is a single exact-int division.
    */
  /** (token, n, rank64, cum): the frequency-ranked vocabulary with running
    * coverage mass, built WITHOUT a global sort. A plain
    * row_number/sum OVER (ORDER BY n DESC, token) funnels the whole
    * vocabulary — whose equal-frequency hapax tail is the bulk of it at
    * web scale — through one task. Two-level instead (q66/q122's shape):
    * sub-shard by (n, first character), rank/sum within each shard
    * (parallel), and add shard start offsets from a window over the
    * GROUPED table (#distinct-frequencies × alphabet rows — metadata).
    * First-character blocks agree with full-token ordering, so the
    * recombined (rank, cum) are bit-identical to the single-window form;
    * widen the prefix to 2+ chars to shard a larger corpus' tail finer.
    */
  private[operators] def rankedVocab(s: SparkSession, d: String): DataFrame = {
    val counts = docs(s, d)
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .withColumn("pfx", substring(col("token"), 1, 1))
    val wInGrp = Window.partitionBy(col("n"), col("pfx")).orderBy(col("token"))
    val local = counts.withColumn("rk_in", row_number().over(wInGrp).cast("long"))
    // shard size = the shard's final row_number: deriving the grouped
    // table (and the total mass) from `local` lets ReuseExchange feed
    // every consumer from ONE token-count aggregation (q66's trick)
    val grp = local.groupBy(col("n"), col("pfx")).agg(max(col("rk_in")).as("rows"))
    val wBefore = Window.orderBy(col("n").desc, col("pfx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val starts = grp
      .withColumn("start_rank", coalesce(sum(col("rows")).over(wBefore), lit(0L)))
      .withColumn("start_cum",
        coalesce(sum(col("rows") * col("n")).over(wBefore), lit(0L)))
      .select(col("n"), col("pfx"), col("start_rank"), col("start_cum"))
    local.join(starts, Seq("n", "pfx"))
      .select(col("token"), col("n"),
        (col("start_rank") + col("rk_in")).as("rank64"),
        // every row of an (n, pfx) shard contributes exactly n to the
        // running sum, so the within-shard prefix is rk_in * n — exact
        (col("start_cum") + col("rk_in") * col("n")).as("cum"))
  }

  /** Total token mass, grouped-table sized (shares rankedVocab's count
    * aggregation through ReuseExchange).
    */
  private def vocabTotal(s: SparkSession, d: String) = {
    val counts = docs(s, d)
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    counts.agg(sum(col("n")).as("tot"))
  }

  val q68: Q = (s, d) => {
    rankedVocab(s, d).crossJoin(broadcast(vocabTotal(s, d)))
      .select(
        col("rank64").cast("int").as("rank"), col("token"), col("n"), col("cum"),
        (col("cum").cast("double") / col("tot")).as("coverage"))
      .orderBy("rank")
  }

  val q68Sql: String =
    """WITH c AS (
      |  SELECT t AS token, count(*) AS n FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
      |  WHERE t <> '' GROUP BY 1)
      |SELECT
      |  CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank,
      |  token, n,
      |  CAST(sum(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |  CAST(sum(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING) AS DOUBLE)
      |    / sum(n) OVER () AS coverage
      |FROM c ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Tokenization to vocabulary ids — the bridge from q68's vocabulary to
    * q55's sequence packing: every document becomes its ordered id
    * sequence (frequency-rank ids, OOV = 0), emitted as a CSV string plus
    * token/OOV counts. Ordered reassembly uses a per-doc position window
    * (collect_list alone does not survive a shuffle with order intact).
    * At 100 TB the vocab join broadcasts (a real tokenizer vocab is
    * ~100 K rows) and everything else is one per-doc window — parallelism
    * scales with documents. Integer-only output, hash-exact.
    */
  val q70: Q = (s, d) => {
    // ids from the scale-safe two-level rank (shared with q68) — no
    // global sort builds the vocabulary
    val vocab = rankedVocab(s, d)
      .select(col("token"), col("rank64").cast("int").as("id"))
    val toks = docs(s, d).select(
        col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "token")))
      .where(col("token") =!= "")
      .join(broadcast(vocab), Seq("token"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(0)).as("id"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    toks
      .withColumn("ids", concat_ws(",", collect_list(col("id").cast("string")).over(w)))
      .groupBy(col("doc_id"))
      .agg(
        first(col("ids")).as("ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("id") === 0, 1L).otherwise(0L)).as("n_oov"))
      .orderBy("doc_id")
  }

  val q70Sql: String =
    """WITH c AS (
      |  SELECT t AS token, count(*) AS n FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
      |  WHERE t <> '' GROUP BY 1),
      |vocab AS (
      |  SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS id
      |  FROM c),
      |tok AS (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(lower(text), ' '), 1) AS pos,
      |    unnest(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |ids AS (
      |  SELECT t.doc_id, t.pos, coalesce(v.id, 0) AS id
      |  FROM tok t LEFT JOIN vocab v USING (token) WHERE t.token <> '')
      |SELECT doc_id,
      |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids,
      |  count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |FROM ids GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q124
  /** Retrieval evaluation metrics — the scorecard for the q27/q65/q111
    * retrieval stack: recall@10, MRR@10 and nDCG@10 of the dense-cosine
    * ranking for the fixed query (vec 0), with relevance = "shares the
    * query's label" (the embeddings fixture's label column as qrels).
    * One row out; the formulas are the standard ones (reciprocal first
    * relevant rank; DCG with 1/log2(rank+1) gains against the ideal).
    *
    * Shape: the ranking is an exact top-10 (per-partition heaps) plus
    * one metadata aggregation for the relevant-total; metrics are a
    * 10-row fold. Exactness: ranks and relevance are integers off the
    * engines' identical cosine ordering (q27's proof); log2 is
    * ln(x)/ln(2) on both sides and the output rounds at 6.
    */
  private val EvalK = 10

  val q124: Q = (s, d) => {
    import graft.functions.cosine_sim
    val e = graft.Graft.table(s, d, "embeddings")
    val q0 = e.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_vec"), col("label").as("q_label"))
    val ranked = e.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(q0))
      .withColumn("sim", cosine_sim(col("embedding"), col("q_vec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(EvalK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id"))))
      .withColumn("rel", (col("label") === col("q_label")).cast("int"))
    val totalRel = e.as("a").crossJoin(broadcast(q0))
      .filter(col("vec_id") =!= 0L && col("label") === col("q_label"))
      .count()
    val ideal = math.min(totalRel, EvalK.toLong).toInt
    val idcg = (1 to ideal).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).sum
    val ln2 = log(lit(2.0))
    ranked.agg(
      round(sum(col("rel")).cast("double") / math.max(totalRel.toDouble, 1.0), 6)
        .as("recall_at_10"),
      round(coalesce(
        max(when(col("rel") === 1, lit(1.0) / col("rank"))), lit(0.0)), 6)
        .as("mrr_at_10"),
      round(sum(col("rel").cast("double") / (log(col("rank").cast("double") + 1.0) / ln2))
        / idcg, 6).as("ndcg_at_10"))
  }

  val q124Sql: String =
    s"""WITH q AS (
       |  SELECT embedding AS qe, label AS ql FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT vec_id, label,
       |    list_sum(list_transform(list_zip(embedding, (SELECT qe FROM q)),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |     * (SELECT sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) FROM q)) AS sim
       |  FROM embeddings WHERE vec_id <> 0),
       |ranked AS (
       |  SELECT vec_id, label,
       |    CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS INT) AS rank
       |  FROM (SELECT * FROM scored ORDER BY sim DESC, vec_id LIMIT $EvalK)),
       |rel AS (
       |  SELECT rank,
       |    CASE WHEN label = (SELECT ql FROM q) THEN 1 ELSE 0 END AS rel
       |  FROM ranked),
       |tot AS (
       |  SELECT count(*) AS n FROM embeddings
       |  WHERE vec_id <> 0 AND label = (SELECT ql FROM q)),
       |idcg AS (
       |  SELECT sum(1.0 / (ln(r + 1.0) / ln(2.0))) AS v
       |  FROM generate_series(1, $EvalK) t(r)
       |  WHERE r <= least((SELECT n FROM tot), $EvalK))
       |SELECT
       |  round(CAST(sum(rel) AS DOUBLE) / greatest((SELECT n FROM tot), 1), 6) AS recall_at_10,
       |  round(coalesce(max(CASE WHEN rel = 1 THEN 1.0 / rank END), 0.0), 6) AS mrr_at_10,
       |  round(sum(CAST(rel AS DOUBLE) / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0)))
       |    / (SELECT v FROM idcg), 6) AS ndcg_at_10
       |FROM rel""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q65_bm25", q65, Some(q65Sql)),
    ("q66_source_budget", q66, Some(q66Sql)),
    ("q67_incremental_dedup", q67, Some(q67Sql)),
    ("q68_vocabulary", q68, Some(q68Sql)),
    ("q70_tokenize_ids", q70, Some(q70Sql)),
    ("q111_hybrid_rrf", q111, Some(q111Sql)),
    ("q124_retrieval_eval", q124, Some(q124Sql)))
}
