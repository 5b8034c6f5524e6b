package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics operators (round 5, second pack): the classical
  * corpus-linguistics diagnostics a tokenizer/data team runs before and
  * after curation — per-language tokenizer fertility (Ács 2019's metric
  * for multilingual tokenizer fairness), Zipf rank-frequency fit, the
  * n-gram diversity dedup preserves, distributional distance between
  * embedding cohorts (the diagonal-covariance Fréchet distance of
  * Heusel et al. 2017), Heaps'-law vocabulary growth, and Good–Turing
  * frequency-of-frequencies mass.
  *
  * Scale notes (the 100 TB story):
  *  - q135 reuses the q99 memoized merges (driver-held model metadata)
  *    and is one codegen'd projection + one map-side-combined agg.
  *  - q136/q140 run their rank/frequency math on the per-source WORD
  *    COUNT table — vocabulary-sized, metadata next to the corpus; the
  *    only corpus-scale work is the one token-count aggregation.
  *  - q137's distinct-trigram counts are one shuffle on (source, gram)
  *    with map-side partial distinct; the exact-distinct is the audit
  *    contract (the sketch alternative is q43's HLL shape).
  *  - q138 reduces the corpus to |labels| × 64 moment rows before any
  *    pairwise work — the pair join is metadata × metadata.
  *  - q139's global token index uses the q66 two-level prefix-sum
  *    decomposition (per-bucket windows + bucket start offsets from the
  *    grouped, metadata-sized table), so no task ever holds the whole
  *    corpus ordering.
  *
  * Exactness: integer counts and single divisions everywhere a value
  * feeds a comparison; ln/float sums appear only in output columns
  * rounded at 6 dp (the q133 PMI precedent); sqrt is IEEE-exact;
  * variances are explicit identical expression trees (not the engines'
  * own var_pop, whose update algorithms differ).
  */
object CorpusStatsOps {
  import Relational.Q
  import DocOps.docs

  /** Lowercase alphabetic (source, word, count) table — the shared
    * vocabulary-sized input of q136/q140 (same token rule as BPE's q99
    * vocab, carried per source).
    */
  private def sourceCounts(s: org.apache.spark.sql.SparkSession, d: String) =
    docs(s, d)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))

  private val srcCountsSqlCte =
    """wc AS (
      |  SELECT source, w, count(*) AS c FROM (
      |    SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents)
      |  WHERE regexp_matches(w, '^[a-z]+$')
      |  GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q135
  /** Per-language tokenizer fertility: apply the learned BPE merges
    * (q99's memoized rules) to every language's tokens and report
    * subword-per-word fertility and chars-per-subword — the metric that
    * exposes a tokenizer trained on one language mix penalizing another
    * (a low-resource lang with fertility 3× English pays 3× the context
    * budget per word). Counts are integers; the two ratios are single
    * divisions of exact integers (IEEE division is deterministic),
    * rounded on output.
    */
  val q135: Q = (s, d) => {
    val merges = BpeOps.learnMerges(s, d)
    docs(s, d)
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .withColumn("ap", BpeOps.applyMerges(merges, BpeOps.wrapped(col("w"))))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum((length(col("ap")) - length(replace(col("ap"), lit("("), lit(""))))
          .cast("long")).as("n_subwords"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_words"), 6))
      .withColumn("chars_per_subword",
        round(col("n_chars").cast("double") / col("n_subwords"), 6))
      .orderBy("lang")
  }

  val q135Sql: String =
    s"""WITH ${BpeOps.chainSql},
       |${BpeOps.encodeSql("lang")}
       |SELECT lang, COUNT(*) AS n_words,
       |  CAST(SUM(len(w)) AS BIGINT) AS n_chars,
       |  CAST(SUM(len(ap) - len(replace(ap, '(', ''))) AS BIGINT) AS n_subwords,
       |  round(CAST(CAST(SUM(len(ap) - len(replace(ap, '(', ''))) AS BIGINT) AS DOUBLE)
       |    / COUNT(*), 6) AS fertility,
       |  round(CAST(CAST(SUM(len(w)) AS BIGINT) AS DOUBLE)
       |    / CAST(SUM(len(ap) - len(replace(ap, '(', ''))) AS BIGINT), 6) AS chars_per_subword
       |FROM ap GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q136
  /** Zipf rank-frequency fit per source: OLS slope/intercept of
    * ln(freq) on ln(rank) over each source's top terms — the "is this
    * feed natural language or template spam" screen (natural text sits
    * near slope −1; machine-generated boilerplate flattens or cliffs).
    * Ranking is an integer comparison (count DESC, word ASC) on the
    * vocabulary-sized count table; ln and the float sums live only in
    * the output columns, rounded at 6 (q133's transcendental rule).
    */
  private val ZipfTopK = 100

  val q136: Q = (s, d) => {
    // top-K rank WITHOUT a per-source full-vocabulary window: vocabulary
    // grows with the corpus (Heaps — q139 measures it), so row_number()
    // OVER (PARTITION BY source ORDER BY c DESC, w) would sort a web
    // source's ~10⁹-word vocab on one task. q68's rankedVocab two-level
    // instead: shard by (source, c, first char) — first-char blocks agree
    // with full-word ordering inside an equal-count run, so recombined
    // ranks are bit-identical — rank within shards in parallel, add shard
    // start offsets from a window over the GROUPED (per-source
    // #counts × alphabet rows, metadata-sized) table, and drop whole
    // shards that start at ≥ K before the join ever sees them.
    val counts = sourceCounts(s, d).withColumn("pfx", substring(col("w"), 1, 1))
    val wInGrp = Window.partitionBy(col("source"), col("c"), col("pfx"))
      .orderBy(col("w"))
    val local = counts.withColumn("rk_in", row_number().over(wInGrp).cast("long"))
    val grp = local.groupBy(col("source"), col("c"), col("pfx"))
      .agg(max(col("rk_in")).as("rows"))
    val wBefore = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("pfx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val starts = grp
      .withColumn("start", coalesce(sum(col("rows")).over(wBefore), lit(0L)))
      .where(col("start") < ZipfTopK)
      .select(col("source"), col("c"), col("pfx"), col("start"))
    val top = local.join(starts, Seq("source", "c", "pfx"))
      .withColumn("rk", col("start") + col("rk_in"))
      .where(col("rk") <= ZipfTopK)
      .select(col("source"),
        log(col("rk").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    val sums = top.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val slope = (col("n_terms") * col("sxy") - col("sx") * col("sy")) /
      (col("n_terms") * col("sxx") - col("sx") * col("sx"))
    // a source with ONE distinct term has x = ln(1) = 0 for its only
    // point, so the OLS denominator is exactly 0 (NaN on Spark, NULL in
    // DuckDB) — a slope needs two points; such degenerate sources are
    // excluded identically on both sides
    sums.where(col("n_terms") >= 2L)
      .select(col("source"), col("n_terms"),
        round(slope, 6).as("zipf_slope"),
        round((col("sy") - slope * col("sx")) / col("n_terms"), 6).as("intercept"))
      .orderBy("source")
  }

  val q136Sql: String =
    s"""WITH $srcCountsSqlCte,
       |top AS (
       |  SELECT source, ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
       |  FROM (
       |    SELECT source, c,
       |      row_number() OVER (PARTITION BY source ORDER BY c DESC, w) AS rk
       |    FROM wc)
       |  WHERE rk <= $ZipfTopK),
       |s AS (
       |  SELECT source, count(*) AS n_terms,
       |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
       |  FROM top GROUP BY source)
       |SELECT source, n_terms,
       |  round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6) AS zipf_slope,
       |  round((sy - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) * sx)
       |    / n_terms, 6) AS intercept
       |FROM s WHERE n_terms >= 2 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q137
  /** Dedup diversity retention: per source, the distinct word-trigram
    * count of the KEPT corpus (q50's cluster representatives, shared
    * memoized labels) against the full corpus — the check that near-dup
    * removal actually removed redundancy rather than variety (Lee et
    * al. 2022's motivation for measuring duplication at n-gram level).
    * Pure integer counts; retention is integer basis points.
    */
  val q137: Q = (s, d) => {
    val kept = Pipeline.dupLabels(s, d)
      .select(col("doc_id"), (col("doc_id") === col("cluster_id")).as("kept"))
    val tris = docs(s, d)
      .select(col("doc_id"), col("source"), split(lower(col("text")), " ").as("ws"))
      .withColumn("idx",
        when(size(col("ws")) >= 3, sequence(lit(1), size(col("ws")) - 2))
          .otherwise(array().cast("array<int>")))
      .select(col("doc_id"), col("source"), explode(col("idx")).as("i"), col("ws"))
      .select(col("doc_id"), col("source"),
        concat_ws(" ", element_at(col("ws"), col("i")),
          element_at(col("ws"), col("i") + 1),
          element_at(col("ws"), col("i") + 2)).as("tri"))
    // long-form distinct (q87's lesson): one rollup per (source, trigram)
    // first — map-side combined, no SortAggregate/Expand chain from mixing
    // two DISTINCT aggregates — then the per-source distincts are plain
    // counts over the (vocabulary-of-trigrams)-sized rollup
    tris.join(kept, "doc_id")
      .groupBy(col("source"), col("tri"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("nk"))
      .groupBy(col("source"))
      .agg(
        sum(col("n")).as("n_tri"),
        sum(col("nk")).as("n_tri_kept"),
        count(lit(1)).as("d_tri"),
        sum(when(col("nk") > 0L, 1L).otherwise(0L)).as("d_tri_kept"))
      .withColumn("retention_bp", expr("(d_tri_kept * 10000) div d_tri"))
      .orderBy("source")
  }

  val q137Sql: String =
    s"""WITH RECURSIVE ${DocOps.jaccardPairsCtes},
       |edges AS (
       |  SELECT doc_a, doc_b FROM jpairs
       |  UNION ALL SELECT doc_b, doc_a FROM jpairs
       |),
       |reach(doc_id, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.doc_b, r.label FROM reach r JOIN edges e ON e.doc_a = r.doc_id
       |),
       |lab AS (
       |  SELECT doc_id, doc_id = MIN(label) AS kept FROM reach GROUP BY doc_id),
       |tri AS (
       |  SELECT doc_id, source,
       |    ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS tri
       |  FROM (
       |    SELECT doc_id, source, ws, unnest(range(1, greatest(len(ws) - 1, 1))) AS i
       |    FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS ws
       |          FROM documents)))
       |SELECT t.source,
       |  count(*) AS n_tri,
       |  CAST(sum(CASE WHEN lab.kept THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_kept,
       |  CAST(count(DISTINCT t.tri) AS BIGINT) AS d_tri,
       |  CAST(count(DISTINCT CASE WHEN lab.kept THEN t.tri END) AS BIGINT) AS d_tri_kept,
       |  CAST(count(DISTINCT CASE WHEN lab.kept THEN t.tri END) AS BIGINT) * 10000
       |    // CAST(count(DISTINCT t.tri) AS BIGINT) AS retention_bp
       |FROM tri t JOIN lab ON lab.doc_id = t.doc_id
       |GROUP BY t.source ORDER BY t.source""".stripMargin

  // ---------------------------------------------------------------- q138
  /** Embedding cohort distance: the diagonal-covariance Fréchet distance
    * (Heusel et al. 2017's FID, diagonal form) between every label-cohort
    * pair — Σ_d (μ₁−μ₂)² + σ₁² + σ₂² − 2·σ₁σ₂. The distribution-shift
    * scorecard between data slices. The corpus collapses to |labels|×64
    * moment rows (one map-side-combined pass); variances are the explicit
    * E[x²]−E[x]² tree clamped at 0 identically on both engines (the
    * engines' own var_pop use different update algorithms); sqrt is
    * IEEE-exact; the 64-term sum rounds on output only.
    */
  val q138: Q = (s, d) => {
    val e = EmbeddingOps.emb(s, d)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").as("dim"), col("col").cast("double").as("x"))
    val m = e.groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("label"), col("dim"),
        (col("sx") / col("n")).as("mu"),
        greatest(col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")),
          lit(0.0)).as("v"))
    m.as("a").join(m.as("b"),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(round(sum(
        (col("a.mu") - col("b.mu")) * (col("a.mu") - col("b.mu")) +
          col("a.v") + col("b.v") - lit(2.0) * sqrt(col("a.v") * col("b.v"))), 6)
        .as("frechet"))
      .orderBy("label_a", "label_b")
  }

  val q138Sql: String =
    """WITH e AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |m AS (
      |  SELECT label, dim,
      |    sum(x) / count(*) AS mu,
      |    greatest(sum(x * x) / count(*)
      |      - (sum(x) / count(*)) * (sum(x) / count(*)), 0.0) AS v
      |  FROM e GROUP BY 1, 2)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  round(sum((a.mu - b.mu) * (a.mu - b.mu) + a.v + b.v
      |    - 2.0 * sqrt(a.v * b.v)), 6) AS frechet
      |FROM m a JOIN m b ON a.dim = b.dim AND a.label < b.label
      |GROUP BY 1, 2 ORDER BY label_a, label_b""".stripMargin

  // ---------------------------------------------------------------- q139
  /** Heaps'-law vocabulary growth: distinct-vocabulary size at
    * power-of-two corpus prefixes (tokens in doc_id order) — the curve
    * that says whether more data still buys new vocabulary or the crawl
    * has saturated. Every token gets a global 1-based index via the q66
    * two-level prefix sum (per-bucket windows + bucket start offsets
    * from the grouped, metadata-sized bucket table — no task holds the
    * whole corpus ordering); first occurrence is a min per token; each
    * checkpoint's vocabulary is a count of first occurrences at or
    * below it. Integer arithmetic end-to-end.
    */
  private val HeapsBucket = 64L

  val q139: Q = (s, d) => {
    val dd = docs(s, d)
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x rlike '^[a-z]+$')").as("ws"))
      .withColumn("n_tok", size(col("ws")).cast("long"))
      .withColumn("bucket", expr(s"doc_id DIV $HeapsBucket"))
    val wInB = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    val local = dd.withColumn("lcum", sum(col("n_tok")).over(wInB))
    // bucket totals derived from the windowed side (q66's ReuseExchange
    // trick), then localCheckpointed: the bucket table is corpus/64 rows
    // and feeds THREE consumers (starts, the total, the checkpoint list)
    // — without the pin each consumer re-derives it from its own corpus
    // scan (the audit showed 4 scans / 23 exchanges)
    val grp = local.groupBy(col("bucket")).agg(max(col("lcum")).as("bsum"))
      .localCheckpoint(true)
    // THIRD prefix level: corpus/64 is linear, so an un-partitioned
    // window over `grp` would still funnel one task at 100× scale.
    // Superbuckets of 4096 buckets bound the only single-task window to
    // corpus/2^18 two-long-column rows (~400K rows at 10¹¹ docs); the
    // recombined bstart arithmetic is the same integer sum — bit-identical
    val dd2 = grp.withColumn("sb", expr("bucket DIV 4096"))
    val wInSb = Window.partitionBy(col("sb")).orderBy(col("bucket"))
    val local2 = dd2.withColumn("scum", sum(col("bsum")).over(wInSb))
    val sgrp = local2.groupBy(col("sb")).agg(max(col("scum")).as("ssum"))
    val wPrevSb = Window.orderBy(col("sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sstarts = sgrp
      .withColumn("sstart", coalesce(sum(col("ssum")).over(wPrevSb), lit(0L)))
      .select(col("sb"), col("sstart"))
    val starts = local2.join(sstarts, "sb")
      .withColumn("bstart", col("sstart") + col("scum") - col("bsum"))
      .select(col("bucket"), col("bstart"))
    val indexed = local.join(starts, "bucket")
      .withColumn("doc_start", col("bstart") + col("lcum") - col("n_tok"))
      .select(col("doc_start"), posexplode(col("ws")))
      .select((col("doc_start") + col("pos") + 1L).as("idx"), col("col").as("w"))
    val firstOcc = indexed.groupBy(col("w")).agg(min(col("idx")).as("first_idx"))
    val tot = grp.agg(sum(col("bsum")).as("t"))
    val cps = tot
      .select(explode(sequence(lit(4), lit(40))).as("k"), col("t"))
      .where(expr("shiftleft(1L, k)") <= col("t"))
      .select(expr("shiftleft(1L, k)").as("cp"))
      .union(tot.select(col("t").as("cp")))
      .distinct()
    firstOcc.crossJoin(broadcast(cps))
      .groupBy(col("cp"))
      .agg(sum(when(col("first_idx") <= col("cp"), 1L).otherwise(0L)).as("vocab"))
      .select(col("cp").as("prefix_tokens"), col("vocab"))
      .orderBy("prefix_tokens")
  }

  val q139Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '),
      |      x -> regexp_matches(x, '^[a-z]+$')) AS ws
      |  FROM documents),
      |off AS (
      |  SELECT doc_id, ws,
      |    CAST(coalesce(sum(len(ws)) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS doc_start
      |  FROM d),
      |tok AS (
      |  SELECT doc_start + generate_subscripts(ws, 1) AS idx, unnest(ws) AS w
      |  FROM off),
      |fo AS (
      |  SELECT w, CAST(min(idx) AS BIGINT) AS first_idx FROM tok GROUP BY w),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tok),
      |cps AS (
      |  SELECT DISTINCT cp FROM (
      |    SELECT (1::BIGINT << k) AS cp
      |    FROM (SELECT unnest(range(4, 41)) AS k), tot
      |    WHERE (1::BIGINT << k) <= tot.t
      |    UNION ALL SELECT t AS cp FROM tot))
      |SELECT cps.cp AS prefix_tokens,
      |  CAST(sum(CASE WHEN fo.first_idx <= cps.cp THEN 1 ELSE 0 END) AS BIGINT)
      |    AS vocab
      |FROM fo CROSS JOIN cps
      |GROUP BY cps.cp ORDER BY prefix_tokens""".stripMargin

  // ---------------------------------------------------------------- q140
  /** Good–Turing frequency-of-frequencies per source: type/token counts,
    * hapax and dis legomena, and the Good–Turing unseen-probability mass
    * estimate N₁/N — the classic "how much of this source's vocabulary
    * have we NOT seen yet" readout (Good 1953), complementing q139's
    * growth curve. Integer counts; the mass is one exact division,
    * rounded on output.
    */
  val q140: Q = (s, d) => {
    sourceCounts(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("dis"))
      .withColumn("unseen_mass",
        round(col("hapax").cast("double") / col("n_tokens"), 6))
      .orderBy("source")
  }

  val q140Sql: String =
    s"""WITH $srcCountsSqlCte
       |SELECT source,
       |  count(*) AS n_types,
       |  CAST(sum(c) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
       |  round(CAST(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |    / CAST(sum(c) AS BIGINT), 6) AS unseen_mass
       |FROM wc GROUP BY source ORDER BY source""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q135_bpe_fertility", q135, Some(q135Sql)),
    ("q136_zipf_slope", q136, Some(q136Sql)),
    ("q137_dedup_diversity", q137, Some(q137Sql)),
    ("q138_cohort_distance", q138, Some(q138Sql)),
    ("q139_heaps_growth", q139, Some(q139Sql)),
    ("q140_good_turing", q140, Some(q140Sql)))
}
