package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Pipeline-audit operators (round 5): the reports a data platform runs
  * ON its own curation machinery — where duplication comes from, what
  * dedup threw away, how honest the sketches are, and whether the raw
  * feeds look healthy. Every query reuses the memoized heavy
  * intermediates (the verified near-dup pair set, the cluster labels,
  * the MinHash signatures), so the audits cost aggregation passes, not
  * pipeline re-runs — exactly how a real platform materializes its
  * curation byproducts once and reports off them.
  *
  * Scale notes (the 100 TB story):
  *  - q127/q129/q131 operate on the PAIR SET / LABELS, which are
  *    candidate-sized (near-dup pairs), never corpus²; the joins back to
  *    doc metadata are on doc_id — fine-grained keys, no skew.
  *  - q132 is fully firehose-proof: the gap lag is the q66 two-level
  *    split (within-hour-bucket windows + bucket-boundary stitching from
  *    the metadata-sized bucket table) and the median runs on the
  *    (user, gap) count table — no per-key history is materialized.
  *  - q128's EWMA spike fold is irreducibly sequential per key under the
  *    bit-exactness contract (proof note at q128) — its per-key history
  *    bound is ENFORCED by a guard that fails the job past MaxKeyHistory
  *    events rather than building an unbounded aggregation buffer.
  *  - q130 is one map-side-combined digit count — 9 rows of output.
  */
object AuditOps {
  import Relational.Q
  import DocOps.docs

  // ---------------------------------------------------------------- q127
  /** Cross-source duplication matrix: for each unordered source pair, how
    * many verified near-dup pairs (J >= 0.6, the shared q20 pair set)
    * cross them — the "which feeds are mirroring each other" diagnostic
    * that decides which source to de-prioritize in the mixture. min/max
    * Jaccard per cell are order-free exact aggregates; counts are exact.
    */
  val q127: Q = (s, d) => {
    val src = docs(s, d).select(col("doc_id"), col("source"))
    DocOps.verifiedPairs(s, d)
      .join(src.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(src.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(
        least(col("sa.source"), col("sb.source")).as("src_a"),
        greatest(col("sa.source"), col("sb.source")).as("src_b"),
        col("jaccard"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        min(col("jaccard")).as("min_j"),
        max(col("jaccard")).as("max_j"))
      .orderBy("src_a", "src_b")
  }

  val q127Sql: String =
    s"""WITH ${DocOps.jaccardPairsCtes},
       |m AS (
       |  SELECT least(da.source, db.source) AS src_a,
       |    greatest(da.source, db.source) AS src_b, jaccard
       |  FROM jpairs
       |  JOIN documents da ON doc_a = da.doc_id
       |  JOIN documents db ON doc_b = db.doc_id)
       |SELECT src_a, src_b, count(*) AS n_pairs,
       |  min(jaccard) AS min_j, max(jaccard) AS max_j
       |FROM m GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------- q128
  /** Per-user EWMA spike audit (α = 0.5): the recurrence
    * ewma_t = 0.5·v_t + 0.5·ewma_{t-1} folded IN EVENT ORDER per user,
    * counting events whose value exceeds 2× the running mean — the
    * streaming anomaly heuristic a feed monitor runs. α = 0.5 keeps every
    * step IEEE-exact (multiply by 0.5 is exact; one identically-
    * associated add per step), so the spike comparisons — discrete
    * decisions — agree bit-for-bit across engines; only the final EWMA is
    * rounded, on output. The fold is an in-order array aggregate (the
    * sanctioned shape for order-sensitive recurrences); per-user arrays
    * are event-history sized.
    *
    * Why this one CANNOT be chunk-split (proof note): each step is
    * e_t = rnd(0.5·v_t + 0.5·e_{t-1}) — affine in exact arithmetic, so a
    * scan decomposition would summarize a chunk as (A, B) with
    * e_out = A·e_in + B. But under IEEE rounding the inner sums do not
    * distribute over the incoming state: rnd(0.25·v + 0.25·e_in) ≠
    * rnd(0.25·v) + 0.25·e_in — every intermediate ROUNDING inside a chunk
    * depends on e_in, so no state-independent (A, B) reproduces the
    * sequential bit pattern, and the spike comparisons (discrete
    * decisions on those bits: v_t > 2·e_{t-1}) can flip. Contrast q132,
    * whose integer gap/median pipeline decomposes exactly. The fold is
    * therefore irreducibly sequential per key under the exactness
    * contract, and the documented per-key bound is ENFORCED: a key whose
    * history exceeds MaxKeyHistory fails the job with a named error
    * (QueryPackSpec drives the trip) instead of silently building an
    * arbitrarily large aggregation buffer. The TRUE firehose path is the
    * streaming form, `StreamOps.ewmaSpikes`: the identical recurrence as
    * per-key O(1) state (ewma, spikes, n) — sequentiality costs nothing
    * when events fold as they arrive.
    */
  private[graft] val MaxKeyHistory = 8L * 1024 * 1024

  val q128: Q = (s, d) => q128Bounded(MaxKeyHistory)(s, d)

  private[graft] def q128Bounded(maxPerKey: Long): Q = (s, d) => {
    val e = Graft.events(s, d)
      .where(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
    e.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("us"), col("event_id"), col("value"))))
        .as("evs"))
      .where(assert_true(size(col("evs")).cast("long") <= lit(maxPerKey),
        concat(lit("q128 firehose guard: user "), col("user_id").cast("string"),
          lit(s" exceeds $maxPerKey events — split the feed or raise MaxKeyHistory")))
        .isNull)
      .withColumn("vs", expr("transform(evs, x -> x.value)"))
      .withColumn("acc", expr(
        """aggregate(
          |  slice(vs, 2, greatest(size(vs) - 1, 0)),
          |  named_struct('e', element_at(vs, 1), 's', CAST(0 AS BIGINT)),
          |  (acc, x) -> named_struct(
          |    'e', 0.5D * x + 0.5D * acc.e,
          |    's', acc.s + CASE WHEN x > 2D * acc.e THEN 1L ELSE 0L END))""".stripMargin))
      .select(col("user_id"), size(col("vs")).cast("long").as("n_events"),
        round(col("acc.e"), 6).as("ewma"), col("acc.s").as("spikes"))
      .orderBy("user_id")
  }

  // Recursive-CTE fold (q58/q99's oracle pattern), NOT list_reduce:
  // DuckDB 1.0's list_reduce with a struct accumulator mis-binds the
  // accumulator's non-lambda-updated fields (the spike counter came back
  // as only the LAST step's increment while the EWMA field was correct) —
  // the stepwise CTE is unambiguous and recursion depth = max events/user.
  val q128Sql: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, CAST(value AS DOUBLE) AS value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM events WHERE value IS NOT NULL),
      |f(user_id, rn, ewma, spikes, n) AS (
      |  SELECT user_id, rn, value, CAST(0 AS BIGINT), n FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT ev.user_id, ev.rn,
      |    0.5 * ev.value + 0.5 * f.ewma,
      |    f.spikes + CASE WHEN ev.value > 2 * f.ewma THEN 1 ELSE 0 END,
      |    f.n
      |  FROM f JOIN ev ON ev.user_id = f.user_id AND ev.rn = f.rn + 1)
      |SELECT user_id, CAST(n AS BIGINT) AS n_events, round(ewma, 6) AS ewma, spikes
      |FROM f WHERE rn = n ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q129
  /** Dedup survivorship audit: after near-dup clustering keeps each
    * cluster's representative (q50's smallest-doc_id rule, shared
    * memoized labels), compare what was kept vs what was dropped per
    * source — document counts and mean quality score either side. The
    * report that catches a dedup quietly deleting one feed's best
    * content (survivorship bias). Scores are q23's engine-exact
    * composite; per-cell means may associate differently — absorbed by
    * round(…, 6) (q122's precedent).
    */
  val q129: Q = (s, d) => {
    val kept = Pipeline.dupLabels(s, d)
      .select(col("doc_id"), (col("doc_id") === col("cluster_id")).as("kept"))
    docs(s, d).select(col("doc_id"), col("source"))
      .join(DocOps.qualityScores(s, d), "doc_id")
      .join(kept, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        round(avg(when(col("kept"), col("score"))), 6).as("kept_score"),
        round(avg(when(!col("kept"), col("score"))), 6).as("dropped_score"))
      .orderBy("source")
  }

  val q129Sql: String =
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
       |${DocOps.qualityScoreSqlCte}
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN lab.kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  round(avg(CASE WHEN lab.kept THEN q.score END), 6) AS kept_score,
       |  round(avg(CASE WHEN NOT lab.kept THEN q.score END), 6) AS dropped_score
       |FROM documents d
       |JOIN qscore q ON q.doc_id = d.doc_id
       |JOIN lab ON lab.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  // ---------------------------------------------------------------- q130
  /** Benford first-digit audit over order totals — the classic
    * fabricated-data / broken-feed detector: observed first-digit shares
    * vs Benford's log10(1 + 1/d) expectation. The expectations are FIXED
    * LITERALS (6 dp) on both engines — embedding log10 would put a
    * transcendental under a comparison; the literals make every output
    * column a single exact division or subtraction of identical doubles.
    */
  private val BenfordShares: Seq[(Int, Double)] = Seq(
    1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153, 9 -> 0.045757)

  val q130: Q = (s, d) => {
    val digits = Graft.table(s, d, "orders")
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .where(col("digit").between(1, 9))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("tot"))
    val bf = typedlit(BenfordShares.toMap)
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("share"),
        element_at(bf, col("digit")).as("benford"),
        round(abs(col("n").cast("double") / col("tot") - element_at(bf, col("digit"))), 6)
          .as("abs_dev"))
      .orderBy("digit")
  }

  val q130Sql: String = {
    val values = BenfordShares
      .map { case (dg, p) => s"($dg, $p)" }.mkString(", ")
    s"""WITH dg AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
       |  FROM orders),
       |c AS (
       |  SELECT digit, count(*) AS n FROM dg WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
       |bf(digit, benford) AS (VALUES $values)
       |SELECT c.digit, c.n,
       |  round(CAST(c.n AS DOUBLE) / t.tot, 6) AS share,
       |  bf.benford,
       |  round(abs(CAST(c.n AS DOUBLE) / t.tot - bf.benford), 6) AS abs_dev
       |FROM c CROSS JOIN tot t JOIN bf ON bf.digit = c.digit
       |ORDER BY c.digit""".stripMargin
  }

  // ---------------------------------------------------------------- q131
  /** MinHash estimator honesty audit: on every verified near-dup pair,
    * the 64-perm signature agreement rate (matching positions / 64)
    * against the exact Jaccard — the calibration check run before
    * trusting LSH-estimated similarities in place of exact verification.
    * est = matches/64 is an exact dyadic rational; the signatures are not
    * SQL-expressible (custom expression), so Verify dumps them as the
    * `doc_minhash` fixture and the oracle re-derives the agreement count
    * (q21's fixture-dump pattern).
    */
  val q131: Q = (s, d) => {
    val sigs = DocOps.docSignatures(docs(s, d)).select(col("doc_id"), col("sig"))
    DocOps.verifiedPairs(s, d)
      .join(sigs.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sigs.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        (size(filter(zip_with(col("x.sig"), col("y.sig"), (a, b) => a === b),
          bb => bb)).cast("double") / lit(64.0)).as("est"))
      .withColumn("abs_err", round(abs(col("est") - col("jaccard")), 6))
      .orderBy("doc_a", "doc_b")
  }

  val q131Sql: String =
    s"""WITH ${DocOps.jaccardPairsCtes},
       |sig AS (
       |  SELECT doc_id, sig
       |  FROM read_parquet('/tmp/graft_fixtures/doc_minhash/*.parquet')),
       |m AS (
       |  SELECT doc_a, doc_b, jaccard,
       |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
       |      AS DOUBLE) / 64.0 AS est
       |  FROM jpairs
       |  JOIN sig sa ON doc_a = sa.doc_id
       |  JOIN sig sb ON doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, jaccard, est, round(abs(est - jaccard), 6) AS abs_err
       |FROM m ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q132
  /** Per-user inter-arrival profile: gap count, max gap, discrete median
    * gap, and the count of session-breaking silences (> 30 min) — the
    * event-time completeness audit run before trusting a feed's
    * watermark/session configuration (q15's sessionizer consumes the
    * same gaps; this is the calibration table for its threshold). All
    * integer microsecond arithmetic; the median is the discrete element
    * at rank ceil(n/2), matching DuckDB's quantile_disc convention
    * exactly — no interpolation, no float.
    */
  val q132: Q = (s, d) => {
    // Firehose-proof (no per-key history is ever materialized): the lag
    // is split two-level — within-(user, hour-bucket) lag in parallel,
    // bucket-first rows take the previous bucket's last timestamp from a
    // window over the GROUPED (user × active-hours, metadata-sized)
    // table; equal timestamps share a bucket, so the recombined gaps are
    // identical to a single per-user lag. The median is decomposed onto
    // the (user, gap) COUNT table: the discrete median is the smallest
    // gap whose running count reaches rank (n+1) DIV 2 — one spill-safe
    // window over per-user distinct gaps instead of a collect_list whose
    // aggregation buffer holds the whole event history. Integer
    // microsecond arithmetic end-to-end, so every decomposition is
    // bit-identical by construction.
    val ev = Graft.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("tb", expr("us DIV 3600000000"))
    val wInB = Window.partitionBy(col("user_id"), col("tb"))
      .orderBy(col("us"), col("event_id"))
    val local = ev.withColumn("prev_in", lag(col("us"), 1).over(wInB))
    // bucket meta derived from the windowed side (q66's ReuseExchange
    // trick: max over the bucket = the bucket's last timestamp)
    val bmeta = local.groupBy(col("user_id"), col("tb")).agg(max(col("us")).as("last_us"))
    val wMeta = Window.partitionBy(col("user_id")).orderBy(col("tb"))
    val prevB = bmeta
      .withColumn("prev_last", lag(col("last_us"), 1).over(wMeta))
      .select(col("user_id"), col("tb"), col("prev_last"))
    val gaps = local.join(prevB, Seq("user_id", "tb"))
      .withColumn("gap", col("us") - coalesce(col("prev_in"), col("prev_last")))
      .where(col("gap").isNotNull)
    val gcnt = gaps.groupBy(col("user_id"), col("gap")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("user_id")).orderBy(col("gap"))
    val cum = gcnt
      .withColumn("cum", sum(col("c")).over(
        wCum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("c")).over(
        wCum.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    cum.groupBy(col("user_id"))
      .agg(
        max(col("cum")).as("n_gaps"),
        max(col("gap")).as("max_gap"),
        min(expr("CASE WHEN cum >= (tot + 1) DIV 2 THEN gap END")).as("med_gap"),
        sum(when(col("gap") > 1800000000L, col("c")).otherwise(0L)).as("long_gaps"))
      .orderBy("user_id")
  }

  val q132Sql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events)
      |SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_gaps,
      |  CAST(max(gap) AS BIGINT) AS max_gap,
      |  CAST(quantile_disc(gap, 0.5) AS BIGINT) AS med_gap,
      |  CAST(sum(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS long_gaps
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q133
  /** PMI word-association table — the corpus-statistics primitive behind
    * collocation extraction and embedding-evaluation word lists: the top
    * 25 adjacent bigrams by count with their pointwise mutual information
    * ln(p(a,b) / (p(a)·p(b))). Selection and ordering are INTEGER count
    * comparisons (exact); ln is computed only on the output column and
    * rounded at 6 — never under a discrete decision (the exactness rule
    * for transcendentals). One explode for unigrams, one zip_with for
    * bigrams, both map-side combined; the rank cut runs on the
    * vocabulary-sized count table.
    */
  private val PmiTopK = 25

  val q133: Q = (s, d) => {
    val words = docs(s, d)
      .select(split(lower(col("text")), " ").as("ws"))
      .select(expr("filter(ws, x -> x rlike '^[a-z]+$')").as("ws"))
    // the count tables are vocabulary-sized and each feeds 2-3 consumers
    // (totals, the rank cut, the PMI joins): localCheckpoint pins them so
    // the corpus is scanned once per table, not once per consumer
    val uni = words.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val totU = uni.agg(sum(col("c")).as("t"))
    val bi = words
      .select(explode(zip_with(col("ws"),
        slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .where(col("p.w2").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(true)
    val totB = bi.agg(sum(col("c_ab")).as("nb"))
    val top = bi.orderBy(col("c_ab").desc, col("w1"), col("w2")).limit(PmiTopK)
    top
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(totB)).crossJoin(broadcast(totU))
      .select(col("w1"), col("w2"), col("c_ab"),
        round(log(col("c_ab").cast("double") * col("t") * col("t") /
          (col("nb").cast("double") * col("c_a") * col("c_b"))), 6).as("pmi"))
      .orderBy(col("c_ab").desc, col("w1"), col("w2"))
  }

  val q133Sql: String =
    s"""WITH w AS (
       |  SELECT list_filter(string_split(lower(text), ' '),
       |    x -> regexp_matches(x, '^[a-z]+$$')) AS ws
       |  FROM documents),
       |uni AS (
       |  SELECT u AS w, count(*) AS c FROM (SELECT unnest(ws) AS u FROM w) GROUP BY 1),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
       |bi AS (
       |  SELECT p[1] AS w1, p[2] AS w2, count(*) AS c_ab FROM (
       |    SELECT unnest(list_zip(ws, ws[2:])) AS p FROM w)
       |  WHERE p[2] IS NOT NULL GROUP BY 1, 2),
       |nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS nb FROM bi),
       |top AS (
       |  SELECT w1, w2, c_ab FROM bi ORDER BY c_ab DESC, w1, w2 LIMIT $PmiTopK)
       |SELECT top.w1, top.w2, top.c_ab,
       |  round(ln(CAST(top.c_ab AS DOUBLE) * tot.t * tot.t /
       |    (CAST(nb.nb AS DOUBLE) * ua.c * ub.c)), 6) AS pmi
       |FROM top
       |JOIN uni ua ON ua.w = top.w1
       |JOIN uni ub ON ub.w = top.w2
       |CROSS JOIN nb CROSS JOIN tot
       |ORDER BY top.c_ab DESC, top.w1, top.w2""".stripMargin

  // ---------------------------------------------------------------- q134
  /** Per-source dataset card — the one-table summary a dataset release
    * ships: document and token counts, language spread, mean quality,
    * near-dup membership rate (docs sitting in a >1-member cluster, off
    * the memoized labels), all in one row per source. Duplication rate is
    * integer basis points (exact); the mean score is q122's rounded-avg
    * precedent. Everything joins on doc_id against memoized or
    * single-pass per-doc columns — one corpus scan plus metadata-sized
    * rollups.
    */
  val q134: Q = (s, d) => {
    val labels = Pipeline.dupLabels(s, d)
    val clusterSizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cs"))
    val dupFlag = labels.join(clusterSizes, "cluster_id")
      .select(col("doc_id"), (col("cs") > 1L).as("is_dup"))
    docs(s, d)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .cast("long").as("n_tokens"))
      .join(DocOps.qualityScores(s, d), "doc_id")
      .join(dupFlag, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("score")), 6).as("mean_score"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("dup_docs"))
      .withColumn("dup_bp", expr("(dup_docs * 10000) div n_docs"))
      .orderBy("source")
  }

  val q134Sql: String =
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
       |lab AS (SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id),
       |cs AS (SELECT cluster_id, count(*) AS cs FROM lab GROUP BY 1),
       |flag AS (
       |  SELECT lab.doc_id, cs.cs > 1 AS is_dup FROM lab JOIN cs USING (cluster_id)),
       |${DocOps.qualityScoreSqlCte},
       |t AS (
       |  SELECT doc_id, source, lang, n_chars,
       |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
       |      AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT t.source, count(*) AS n_docs,
       |  CAST(count(DISTINCT t.lang) AS BIGINT) AS n_langs,
       |  CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(t.n_chars) AS BIGINT) AS total_chars,
       |  round(avg(q.score), 6) AS mean_score,
       |  CAST(sum(CASE WHEN flag.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
       |  CAST(sum(CASE WHEN flag.is_dup THEN 1 ELSE 0 END) AS BIGINT) * 10000
       |    // count(*) AS dup_bp
       |FROM t
       |JOIN qscore q ON q.doc_id = t.doc_id
       |JOIN flag ON flag.doc_id = t.doc_id
       |GROUP BY t.source ORDER BY t.source""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q127_source_dup_matrix", q127, Some(q127Sql)),
    ("q128_ewma_anomaly", q128, Some(q128Sql)),
    ("q129_dedup_survivorship", q129, Some(q129Sql)),
    ("q130_benford_audit", q130, Some(q130Sql)),
    ("q131_minhash_error", q131, Some(q131Sql)),
    ("q132_interarrival_profile", q132, Some(q132Sql)),
    ("q133_pmi_collocations", q133, Some(q133Sql)),
    ("q134_dataset_card", q134, Some(q134Sql)))
}
