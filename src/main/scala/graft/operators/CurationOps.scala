package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a production training-data pipeline runs
  * between raw crawl and tokenizer: PII redaction, sequence packing,
  * corpus-level boilerplate span removal, and mixture resampling.
  *
  * Scale notes (the 100 TB story):
  *  - q54 PII: stateless regex map — whole-stage codegen, zero shuffle.
  *  - q55 packing: windows are per-shard, so parallelism scales with the
  *    shard count, not 1 (a single global window would serialize the
  *    corpus through one task).
  *  - q56 boilerplate: one shuffle on the gram key (the unavoidable
  *    corpus-frequency aggregation), then the verdict joins back on
  *    doc_id; the frequent-gram set is output-side tiny.
  *  - q57 mixture: per-language totals are a GROUP BY over ~100 rows of
  *    output — broadcast back over the corpus for the keep-gate.
  */
object CurationOps {
  import Relational.Q
  import DocOps.docs

  // ---------------------------------------------------------------- q54
  /** PII detection + redaction counts. The corpus tables are synthetic
    * word-salad with no real PII, so the payload appends deterministic
    * row-derived PII tokens (email / IPv4 / phone) — both engines build
    * the identical payload, then both run their own regex machinery, so
    * the oracle checks real extraction/replacement parity, not fixtures.
    * Regexes are RE2-and-Java-compatible (no backrefs or lookaround).
    */
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneRe = "\\b555-\\d{4}\\b"

  val q54: Q = (s, d) => {
    val payload = concat_ws(
      " ",
      col("text"),
      concat(lit("contact user"), (col("doc_id") % 97).cast("string"),
        lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".example.com")),
      concat(lit("from 10."), (col("doc_id") % 256).cast("string"),
        lit("."), ((col("doc_id") * 7) % 256).cast("string"),
        lit("."), ((col("doc_id") * 13) % 256).cast("string")),
      when(col("doc_id") % 3 === 0,
        concat(lit("call 555-01"), lpad((col("doc_id") % 100).cast("string"), 2, "0"))))
    docs(s, d)
      .select(col("doc_id"), payload.as("payload"))
      .select(
        col("doc_id"),
        regexp_count(col("payload"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("payload"), lit(ipRe)).cast("long").as("n_ips"),
        regexp_count(col("payload"), lit(phoneRe)).cast("long").as("n_phones"),
        length(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("payload"), emailRe, "<EMAIL>"),
              ipRe, "<IP>"),
            phoneRe, "<PHONE>")).cast("long").as("redacted_len"))
      .orderBy("doc_id")
  }

  val q54Sql: String =
    s"""WITH p AS (
       |  SELECT doc_id,
       |    concat_ws(' ', text,
       |      'contact user' || (doc_id % 97) || '@mail' || (doc_id % 7) || '.example.com',
       |      'from 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.' || ((doc_id * 13) % 256),
       |      CASE WHEN doc_id % 3 = 0
       |           THEN 'call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') END
       |    ) AS payload
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(payload, '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(payload, '$ipRe')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(payload, '$phoneRe')) AS BIGINT) AS n_phones,
       |  CAST(length(
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(payload, '$emailRe', '<EMAIL>', 'g'),
       |        '$ipRe', '<IP>', 'g'),
       |      '$phoneRe', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
       |FROM p ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q55
  /** Sequence packing (concat-then-chunk): assign documents to fixed
    * token-budget packs in doc order, the GPT-style pretraining layout. A
    * doc is assigned to the pack where its first token lands (exclusive
    * running sum / budget). Packing is per shard — at scale each shard
    * packs independently in its own task; a global pack order would
    * serialize 100 TB through one window partition.
    */
  private val PackBudget = 2048L
  private val PackShards = 8L

  val q55: Q = (s, d) => {
    val toks = docs(s, d).select(
      col("doc_id"),
      (col("doc_id") % PackShards).as("shard"),
      size(split(col("text"), " ")).cast("long").as("tokens"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("pack_id", floor((col("cum") - col("tokens")) / PackBudget))
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("pack_tokens"))
      .orderBy("shard", "pack_id")
  }

  val q55Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % $PackShards AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
       |  FROM documents),
       |c AS (
       |  SELECT shard, tokens,
       |    SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT shard, CAST(floor((cum - tokens) / $PackBudget.0) AS BIGINT) AS pack_id,
       |  COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS pack_tokens
       |FROM c GROUP BY 1, 2 ORDER BY shard, pack_id""".stripMargin

  // ---------------------------------------------------------------- q56
  /** Corpus-level boilerplate span removal (the line-dedup stage of
    * CCNet/RefinedWeb, over 5-gram spans since the synthetic corpus has
    * no line structure): a span appearing in >= 3 distinct documents is
    * boilerplate; docs whose span mass is mostly boilerplate get dropped.
    * One shuffle on the gram key (the corpus-frequency count), then an
    * aggregation back to doc_id — text itself is never shuffled.
    */
  private val BoilerMinDocs = 3L

  val q56: Q = (s, d) => {
    // per-doc dedupe happens inside the codegen'd shingle_hashes pass
    // (map-side, no shuffle; grams join/count on their 64-bit hash), and
    // the corpus frequency is a count over a gram-partitioned window
    // instead of an agg+self-join — two shuffles total (gram, then
    // doc_id), where the naive distinct/groupBy/join shape pays three.
    val grams = docs(s, d)
      .select(col("doc_id"),
        explode(graft.functions.shingle_hashes(col("text"), 5)).as("gram"))
    grams
      .withColumn("docs_with", count(lit(1)).over(Window.partitionBy("gram")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("docs_with") >= BoilerMinDocs, 1L).otherwise(0L)).as("n_boiler"))
      .select(
        col("doc_id"), col("n_grams"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n_grams")).as("boiler_frac"),
        (col("n_boiler").cast("double") / col("n_grams") <= 0.5).as("keep"))
      .orderBy("doc_id")
  }

  val q56Sql: String =
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS s FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, UNNEST(list_transform(
       |    list_zip(s, s[2:], s[3:], s[4:], s[5:]),
       |    x -> x[1] || ' ' || x[2] || ' ' || x[3] || ' ' || x[4] || ' ' || x[5])) AS gram
       |  FROM t),
       |g2 AS (SELECT doc_id, gram FROM g WHERE gram IS NOT NULL),
       |f AS (SELECT gram, COUNT(*) AS docs_with FROM g2 GROUP BY gram)
       |SELECT doc_id, COUNT(*) AS n_grams,
       |  CAST(SUM(CASE WHEN docs_with >= $BoilerMinDocs THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  CAST(SUM(CASE WHEN docs_with >= $BoilerMinDocs THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS boiler_frac,
       |  (CAST(SUM(CASE WHEN docs_with >= $BoilerMinDocs THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) <= 0.5) AS keep
       |FROM g2 JOIN f USING (gram)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q57
  /** Language-mixture resampling: given a per-language token budget,
    * derive each language's keep-rate from its actual token mass
    * (rate = min(1, budget / actual)), then apply a deterministic
    * systematic gate (doc_id mod 1000 < rate * 1000). The rate table is
    * aggregate-output-sized, so it broadcasts; the gate itself is a
    * stateless map. Reproducible across cluster sizes — the gate depends
    * only on doc_id, never on partitioning or row order.
    */
  private val LangTokenBudget = 20000L

  val q57: Q = (s, d) => {
    val toks = docs(s, d).select(
      col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("tokens"))
    val rates = toks.groupBy(col("lang"))
      .agg(sum(col("tokens")).as("lang_tokens"))
      .select(col("lang"), col("lang_tokens"),
        least(lit(1.0), lit(LangTokenBudget).cast("double") / col("lang_tokens"))
          .as("keep_rate"))
    toks.join(broadcast(rates), "lang")
      .filter((col("doc_id") % 1000).cast("double") < col("keep_rate") * 1000.0)
      .groupBy(col("lang"))
      .agg(
        max(col("lang_tokens")).as("lang_tokens"),
        max(col("keep_rate")).as("keep_rate"),
        count(lit(1)).as("kept_docs"),
        sum(col("tokens")).as("kept_tokens"))
      .orderBy("lang")
  }

  val q57Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
       |  FROM documents),
       |r AS (
       |  SELECT lang, CAST(SUM(tokens) AS BIGINT) AS lang_tokens,
       |    least(1.0, $LangTokenBudget.0 / SUM(tokens)) AS keep_rate
       |  FROM t GROUP BY lang)
       |SELECT lang, MAX(lang_tokens) AS lang_tokens, MAX(keep_rate) AS keep_rate,
       |  COUNT(*) AS kept_docs, CAST(SUM(tokens) AS BIGINT) AS kept_tokens
       |FROM t JOIN r USING (lang)
       |WHERE CAST(doc_id % 1000 AS DOUBLE) < keep_rate * 1000.0
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Deterministic corpus shuffle + split/shard assignment — the step
    * that turns a curated corpus into training shards: every doc gets a
    * pseudorandom-but-reproducible mix key (md5 of seed:doc_id), the
    * train/valid/test split comes from lexicographic ranges of that key
    * (hex chars are uniform, so '< "1"' is a 1/16 slice), the shard from
    * its first hex digit, and the within-shard position from the key
    * order. Changing the seed re-permutes the corpus for the next epoch;
    * nothing depends on partitioning, row order, or cluster size.
    *
    * 100 TB story: the key/split/shard columns are stateless maps; the
    * only shuffle is the per-shard row_number window, whose parallelism
    * equals the shard count (production runs use thousands of shards —
    * 16 here only so the oracle output stays reviewable). No global
    * window, no single-task ordering.
    */
  private[operators] val MixSeed = "graft-epoch-0"

  /** (doc_id, split) under q60's seeded md5 rule — shared with the
    * cross-split leakage report (q103).
    */
  private[operators] def splitOf(s: SparkSession, d: String): DataFrame = {
    val keyed = docs(s, d).select(
      col("doc_id"),
      md5(concat(lit(MixSeed + ":"), col("doc_id").cast("string"))).as("mix_key"))
    keyed.select(col("doc_id"),
      when(col("mix_key") < "1", "test")
        .when(col("mix_key") < "2", "valid")
        .otherwise("train").as("split"))
  }

  /** The same split rule in DuckDB SQL (a CTE named `sp`). */
  private[operators] val splitSqlCte: String =
    s"""sp AS (
       |  SELECT doc_id,
       |    CASE WHEN md5('$MixSeed:' || CAST(doc_id AS VARCHAR)) < '1' THEN 'test'
       |         WHEN md5('$MixSeed:' || CAST(doc_id AS VARCHAR)) < '2' THEN 'valid'
       |         ELSE 'train' END AS split
       |  FROM documents)""".stripMargin

  val q60: Q = (s, d) => {
    val keyed = docs(s, d).select(
      col("doc_id"),
      md5(concat(lit(MixSeed + ":"), col("doc_id").cast("string"))).as("mix_key"))
    val shard = expr("instr('0123456789abcdef', substring(mix_key, 1, 1))")
      .cast("int") - 1
    keyed
      .withColumn("split",
        when(col("mix_key") < "1", "test")
          .when(col("mix_key") < "2", "valid")
          .otherwise("train"))
      .withColumn("shard", shard)
      .withColumn("shard_pos",
        row_number().over(Window.partitionBy(shard).orderBy(col("mix_key")))
          .cast("long"))
      .orderBy("doc_id")
  }

  val q60Sql: String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |    md5('$MixSeed:' || CAST(doc_id AS VARCHAR)) AS mix_key
       |  FROM documents)
       |SELECT doc_id, mix_key,
       |  CASE WHEN mix_key < '1' THEN 'test'
       |       WHEN mix_key < '2' THEN 'valid'
       |       ELSE 'train' END AS split,
       |  CAST(strpos('0123456789abcdef', substr(mix_key, 1, 1)) - 1 AS INT)
       |    AS shard,
       |  CAST(row_number() OVER (
       |    PARTITION BY strpos('0123456789abcdef', substr(mix_key, 1, 1))
       |    ORDER BY mix_key) AS BIGINT) AS shard_pos
       |FROM k ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Overlapping-window document chunking — the RAG/embedding-prep twin of
    * q55's budgeted packing: every document becomes fixed-size token
    * windows (40 tokens, stride 30, so consecutive chunks share 10) with
    * the chunk text reassembled in order. One `sequence` + `explode` per
    * document and a partition-local `slice` — no shuffle at all, no
    * window function, parallelism scales with documents; the explode
    * fan-out is bounded by n_tokens/stride per row. Chunk ids are dense
    * from 0 per document; the trailing chunk may be short but never
    * empty. String/integer output, hash-exact.
    */
  private val ChunkSize = 40
  private val ChunkStride = 30

  val q71: Q = (s, d) => {
    val toks = docs(s, d).select(
        col("doc_id"),
        split(lower(col("text")), " ").as("toks"))
      .withColumn("n", size(col("toks")))
    toks
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(1), col("n"), lit(ChunkStride))).as("start"))
      .withColumn("chunk", slice(col("toks"), col("start"), lit(ChunkSize)))
      .select(
        col("doc_id"),
        ((col("start") - 1) / ChunkStride).cast("int").as("chunk_id"),
        size(col("chunk")).as("chunk_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  val q71Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS toks,
       |    len(string_split(lower(text), ' ')) AS n
       |  FROM documents),
       |st AS (
       |  SELECT doc_id, toks, n, unnest(range(1, n + 1, $ChunkStride)) AS start
       |  FROM t),
       |c AS (
       |  SELECT doc_id,
       |    CAST((start - 1) // $ChunkStride AS INT) AS chunk_id,
       |    toks[start : least(start + ${ChunkSize - 1}, n)] AS chunk
       |  FROM st)
       |SELECT doc_id, chunk_id,
       |  CAST(len(chunk) AS INT) AS chunk_tokens,
       |  array_to_string(chunk, ' ') AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------- q95
  /** Sequence-length bucketing — the batching-efficiency report behind
    * dynamic batching / bucketed samplers: docs grouped into power-of-2
    * token-length buckets per source, with the padded-token cost of
    * batching each bucket to its ceiling vs the corpus-max baseline.
    * The bucket rule is an integer CASE chain (no log2 — engines don't
    * guarantee identical floating log bits at power boundaries), the
    * waste ratio is integer basis points, and the whole query is one
    * map-side-combined group-by: linear, shuffle-light, exact at any
    * scale.
    */
  val q95: Q = (s, d) => {
    val lens = docs(s, d)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tokens"))
    val cap = when(col("tokens") <= 16, 16L)
      .when(col("tokens") <= 32, 32L)
      .when(col("tokens") <= 64, 64L)
      .when(col("tokens") <= 128, 128L)
      .when(col("tokens") <= 256, 256L)
      .when(col("tokens") <= 512, 512L)
      .when(col("tokens") <= 1024, 1024L)
      .when(col("tokens") <= 2048, 2048L)
      .otherwise(4096L)
    lens.withColumn("bucket_cap", cap)
      .groupBy(col("source"), col("bucket_cap"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("sum_tokens"),
        max(col("tokens")).as("max_tokens"))
      .withColumn("padded_tokens", col("bucket_cap") * col("n_docs"))
      .withColumn("waste_bp",
        expr("((padded_tokens - sum_tokens) * 10000) div padded_tokens"))
      .orderBy("source", "bucket_cap")
  }

  val q95Sql: String =
    """WITH t AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents),
      |b AS (
      |  SELECT source,
      |    CASE WHEN tokens <= 16 THEN 16 WHEN tokens <= 32 THEN 32
      |         WHEN tokens <= 64 THEN 64 WHEN tokens <= 128 THEN 128
      |         WHEN tokens <= 256 THEN 256 WHEN tokens <= 512 THEN 512
      |         WHEN tokens <= 1024 THEN 1024 WHEN tokens <= 2048 THEN 2048
      |         ELSE 4096 END AS bucket_cap,
      |    tokens
      |  FROM t),
      |g AS (
      |  SELECT source, CAST(bucket_cap AS BIGINT) AS bucket_cap,
      |    COUNT(*) AS n_docs, SUM(tokens) AS sum_tokens, MAX(tokens) AS max_tokens
      |  FROM b GROUP BY 1, 2)
      |SELECT source, bucket_cap, n_docs, CAST(sum_tokens AS BIGINT) AS sum_tokens,
      |  max_tokens, bucket_cap * n_docs AS padded_tokens,
      |  CAST(((bucket_cap * n_docs - CAST(sum_tokens AS BIGINT)) * 10000)
      |    // (bucket_cap * n_docs) AS BIGINT) AS waste_bp
      |FROM g ORDER BY source, bucket_cap""".stripMargin

  // ---------------------------------------------------------------- q112
  /** Crawl snapshot diff — the recrawl bookkeeping step: given two
    * corpus snapshots, classify every doc_id as added / removed /
    * modified / unchanged. Snapshots are deterministic derivations of
    * the fixture corpus (old = doc_id % 7 != 0; new = doc_id % 5 != 0
    * with every 11th doc's text revised), so both engines build the
    * identical inputs.
    *
    * Shape (the 100 TB story): each side reduces to (doc_id, md5) BEFORE
    * the join — the diff shuffles 16-byte fingerprints, never document
    * bodies, and the full-outer join on doc_id is the only shuffle. At
    * recrawl scale the fingerprint side of the OLD snapshot is exactly
    * the incremental-dedup index q67 maintains.
    */
  val q112: Q = (s, d) => {
    def snap(df: DataFrame) = df.select(col("doc_id"), md5(col("text")).as("h"))
    val old = snap(docs(s, d).filter(col("doc_id") % 7 =!= 0))
    val neu = snap(docs(s, d).filter(col("doc_id") % 5 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))))
    old.as("o").join(neu.as("n"),
        col("o.doc_id") === col("n.doc_id"), "full_outer")
      .select(
        coalesce(col("o.doc_id"), col("n.doc_id")).as("doc_id"),
        when(col("o.doc_id").isNull, lit("added"))
          .when(col("n.doc_id").isNull, lit("removed"))
          .when(col("o.h") =!= col("n.h"), lit("modified"))
          .otherwise(lit("unchanged")).as("status"))
      .orderBy("doc_id")
  }

  val q112Sql: String =
    """WITH o AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0),
      |n AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END) AS h
      |  FROM documents WHERE doc_id % 5 <> 0)
      |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       WHEN o.h <> n.h THEN 'modified'
      |       ELSE 'unchanged' END AS status
      |FROM o FULL JOIN n ON o.doc_id = n.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q113
  /** Temperature-based mixture allocation (the multilingual/multi-source
    * α-sampling of mBERT/XLM-R and data-mixture papers): per-source
    * sampling probability p_i = m_i^α / Σ m_j^α over token masses with
    * α = 0.5 (temperature T = 2) — upweights small sources relative to
    * proportional sampling — and the expected document allocation of a
    * 100k-doc training budget. q57 caps each group at an absolute
    * budget; this is the relative-share counterpart a mixture designer
    * actually tunes.
    *
    * α = 0.5 deliberately: m^0.5 is sqrt, which IEEE 754 requires to be
    * correctly rounded, so every p-term is bit-identical between
    * engines; a transcendental pow(m, α) is only ~1-ulp accurate per
    * libm and a ulp-different p could flip the floor/round boundaries
    * below between engines (the no-transcendentals exactness
    * discipline; ln is tolerated in q65/q75 only because their outputs
    * round before any discrete decision).
    *
    * Shape: one map-side-combined GROUP BY to source-count rows, then an
    * unpartitioned window over those few rows (source count ≪ executor
    * memory at any scale — it is the mixture table itself).
    */
  private val MixDocBudget = 100000L

  val q113: Q = (s, d) => {
    val mass = docs(s, d)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tokens"))
      .groupBy(col("source")).agg(sum(col("tokens")).as("m"))
    val w = Window.partitionBy()
    mass
      .withColumn("pw", sqrt(col("m").cast("double")))
      .withColumn("p", col("pw") / sum(col("pw")).over(w))
      .select(col("source"), col("m"),
        round(col("p"), 6).as("p"),
        floor(col("p") * MixDocBudget + 0.5).cast("long").as("alloc_docs"))
      .orderBy("source")
  }

  val q113Sql: String =
    s"""WITH mass AS (
       |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS m
       |  FROM documents GROUP BY source),
       |p AS (
       |  SELECT source, m,
       |    sqrt(CAST(m AS DOUBLE)) /
       |      sum(sqrt(CAST(m AS DOUBLE))) OVER () AS p
       |  FROM mass)
       |SELECT source, m, round(p, 6) AS p,
       |  CAST(floor(p * $MixDocBudget + 0.5) AS BIGINT) AS alloc_docs
       |FROM p ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q126
  /** Balanced eval-set construction — the "build a held-out benchmark"
    * step, distinct from q60's training split: a 100-doc evaluation set
    * allocated across (source, lang) strata PROPORTIONALLY to corpus
    * mass (alloc_i = budget·c_i DIV n — integer floor, engine-exact)
    * with each stratum contributing its first alloc docs in seeded-hash
    * order (q60's md5 mix key, so the draw is reproducible and
    * uncorrelated with doc content). Proportional stratification keeps
    * the eval set representative; the deterministic draw makes the
    * benchmark reconstructible from the corpus + seed alone.
    *
    * Shape: one map-side-combined stratum count, alloc broadcast back,
    * and a per-stratum window over hash order — parallelism scales with
    * the stratum count, and only (doc_id, stratum, key) tuples shuffle.
    */
  private val EvalBudget = 100L

  val q126: Q = (s, d) => {
    val keyed = docs(s, d).select(
      col("doc_id"), col("source"), col("lang"),
      md5(concat(lit(MixSeed + ":eval:"), col("doc_id").cast("string"))).as("mix_key"))
    val strata = keyed.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val total = strata.agg(sum(col("c")).as("n"))
    val alloc = strata.crossJoin(broadcast(total))
      .select(col("source"), col("lang"),
        expr(s"c * $EvalBudget DIV n").as("alloc"))
    val w = Window.partitionBy(col("source"), col("lang")).orderBy(col("mix_key"))
    keyed.join(broadcast(alloc), Seq("source", "lang"))
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter(col("pick") <= col("alloc"))
      .select(col("doc_id"), col("source"), col("lang"), col("pick"))
      .orderBy("source", "lang", "pick")
  }

  val q126Sql: String =
    s"""WITH k AS (
       |  SELECT doc_id, source, lang,
       |    md5('$MixSeed:eval:' || CAST(doc_id AS VARCHAR)) AS mix_key
       |  FROM documents),
       |st AS (SELECT source, lang, count(*) AS c FROM k GROUP BY 1, 2),
       |t AS (SELECT sum(c) AS n FROM st),
       |a AS (
       |  SELECT source, lang, c * $EvalBudget // (SELECT n FROM t) AS alloc
       |  FROM st),
       |p AS (
       |  SELECT k.doc_id, k.source, k.lang, a.alloc,
       |    CAST(row_number() OVER (
       |      PARTITION BY k.source, k.lang ORDER BY k.mix_key) AS BIGINT) AS pick
       |  FROM k JOIN a USING (source, lang))
       |SELECT doc_id, source, lang, pick
       |FROM p WHERE pick <= alloc
       |ORDER BY source, lang, pick""".stripMargin

  // ---------------------------------------------------------------- q274
  /** Pad/truncate tradeoff sweep (round 7): the SFT one-doc-per-slot
    * layout q55's concat-packing replaces — for context sizes 256 / 512
    * / 1024 / 2048, how many tokens survive, how many are cut by
    * truncation, how much padding the slot wastes, and the slot
    * utilization. One corpus pass fanned 4× by a literal explode
    * (map-side combine; 4-row output); all integer sums, utilization is
    * the single division rounded on output.
    */
  val q274: Q = (s, d) => {
    val toks = DocOps.docs(s, d).select(
      size(split(col("text"), " ")).cast("long").as("tokens"))
    toks
      .select(col("tokens"), explode(expr("array(256L, 512L, 1024L, 2048L)")).as("ctx"))
      .withColumn("kept", least(col("tokens"), col("ctx")))
      .groupBy(col("ctx"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_tokens"),
        sum(col("kept")).as("kept_tokens"),
        sum(col("tokens") - col("kept")).as("truncated_tokens"),
        sum(col("ctx") - col("kept")).as("pad_tokens"),
        round(sum(col("kept")).cast("double") / (count(lit(1)) * col("ctx")), 6)
          .as("utilization"))
      .orderBy("ctx")
  }

  val q274Sql: String =
    """WITH t AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents),
      |f AS (
      |  SELECT tokens, unnest([256, 512, 1024, 2048]) AS ctx FROM t),
      |k AS (
      |  SELECT CAST(ctx AS BIGINT) AS ctx, tokens, least(tokens, ctx) AS kept FROM f)
      |SELECT ctx, count(*) AS n_docs,
      |  CAST(sum(tokens) AS BIGINT) AS total_tokens,
      |  CAST(sum(kept) AS BIGINT) AS kept_tokens,
      |  CAST(sum(tokens - kept) AS BIGINT) AS truncated_tokens,
      |  CAST(sum(ctx - kept) AS BIGINT) AS pad_tokens,
      |  round(CAST(sum(kept) AS DOUBLE) / (count(*) * ctx), 6) AS utilization
      |FROM k GROUP BY 1 ORDER BY ctx""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q274_pad_truncate_sweep", q274, Some(q274Sql)),
    ("q54_pii_redact", q54, Some(q54Sql)),
    ("q55_seq_pack", q55, Some(q55Sql)),
    ("q56_boilerplate", q56, Some(q56Sql)),
    ("q57_mix_sample", q57, Some(q57Sql)),
    ("q60_shard_shuffle", q60, Some(q60Sql)),
    ("q71_chunk_overlap", q71, Some(q71Sql)),
    ("q95_length_buckets", q95, Some(q95Sql)),
    ("q112_snapshot_diff", q112, Some(q112Sql)),
    ("q113_mix_temperature", q113, Some(q113Sql)),
    ("q126_eval_set", q126, Some(q126Sql))
  )
}
