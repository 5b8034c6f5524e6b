package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-style and vocabulary-fit operators (round 6, third pack): the
  * per-source stylistic profile a mixture designer reads next to the
  * volume/quality tables — Coleman–Liau readability (the classic
  * letters/words/sentences formula chosen because it needs NO syllable
  * dictionary), a function-word stylometric fingerprint (Mosteller &
  * Wallace's authorship features, as per-source cosine similarity), the
  * out-of-vocabulary rate against the corpus' own top-K vocabulary (the
  * tokenizer-fit readout), and a discourse/charset profile (question /
  * exclamation / quote / digit / uppercase character rates).
  *
  * Scale notes (the 100 TB story): q157/q160 are single
  * map-side-combined per-source aggregations of row-local integer
  * counts; q158 reduces the corpus to |sources| × 40 function-word
  * counts before its sources² pair join (metadata × metadata); q159's
  * only corpus-scale work is the two token-count aggregations — the
  * top-K cut reuses q68's two-level rankedVocab decomposition (no
  * full-vocabulary single-task window).
  *
  * Exactness: all counts are integers from identical tokenization /
  * regex rules both sides (DuckDB regexp_replace carries the 'g' flag
  * Spark applies implicitly); readability means aggregate in exact
  * integer micro-units (q145's trick); the 40-term stylometry folds run
  * in explicit word order (q152's precedent); every ratio is one
  * division rounded on output.
  */
object StyleOps {
  import Relational.Q
  import DocOps.docs

  // ---------------------------------------------------------------- q157
  /** Coleman–Liau readability per source: per doc,
    * CLI = 0.0588·L − 0.296·S − 15.8 with L = letters per 100 words and
    * S = sentence-enders per 100 words — then per-source n/mean/min/max.
    * Letters/words/enders are integer counts; each doc's CLI is one
    * fixed expression tree (bit-identical both engines); the mean sums
    * exact micro-units so aggregation order cannot drift it.
    */
  val q157: Q = (s, d) => {
    val cli = docs(s, d)
      .select(col("source"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double").as("l"),
        size(split(col("text"), " ")).cast("double").as("w"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.!?]", "")))
          .cast("double").as("sn"))
      .withColumn("cli",
        lit(0.0588) * (lit(100.0) * col("l") / col("w"))
          - lit(0.296) * (lit(100.0) * col("sn") / col("w")) - lit(15.8))
    cli.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(round(col("cli") * lit(1000000.0), 0).cast("long")).as("sm"),
        min(col("cli")).as("mn"), max(col("cli")).as("mx"))
      .select(col("source"), col("n_docs"),
        round(col("sm") / lit(1000000.0) / col("n_docs"), 6).as("mean_cli"),
        round(col("mn"), 6).as("min_cli"), round(col("mx"), 6).as("max_cli"))
      .orderBy("source")
  }

  val q157Sql: String =
    """WITH c AS (
      |  SELECT source,
      |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS l,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS w,
      |    CAST(length(text) - length(regexp_replace(text, '[.!?]', '', 'g'))
      |      AS DOUBLE) AS sn
      |  FROM documents),
      |k AS (
      |  SELECT source,
      |    0.0588 * (100.0 * l / w) - 0.296 * (100.0 * sn / w) - 15.8 AS cli
      |  FROM c)
      |SELECT source, count(*) AS n_docs,
      |  round(CAST(sum(CAST(round(cli * 1000000.0) AS BIGINT)) AS BIGINT)
      |    / 1000000.0 / count(*), 6) AS mean_cli,
      |  round(min(cli), 6) AS min_cli, round(max(cli), 6) AS max_cli
      |FROM k GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q158
  /** Stylometric source fingerprint: each source's frequency vector over
    * the combined 40-word function-word list (the language-ID
    * dictionaries — Mosteller–Wallace features), compared pairwise by
    * cosine. The corpus reduces to |sources| × 40 integer counts before
    * any pairwise work; the 40-term dot/norm folds run in explicit word
    * order on both engines.
    */
  private[operators] val funcWords: Seq[String] =
    DocOps.dicts.flatMap(_._2).distinct.sorted

  val q158: Q = (s, d) => {
    val fw = funcWords
    // pinned: the |sources| × 40 count table feeds both the source
    // scaffold and the vector join — one corpus scan, not two
    val cnt = docs(s, d)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w").isInCollection(fw))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    import s.implicits._
    val scaffold = cnt.select(col("source")).distinct()
      .crossJoin(fw.toDF("w"))
    val vecs = scaffold.join(cnt, Seq("source", "w"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .groupBy(col("source"))
      .agg(expr("transform(sort_array(collect_list(named_struct('w', w," +
        " 'c', CAST(c AS DOUBLE)))), x -> x.c)").as("v"))
    def dot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)")
    val a = vecs.select(col("source").as("src_a"), col("v").as("va"))
    val b = vecs.select(col("source").as("src_b"), col("v").as("vb"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("cos",
        dot("va", "vb") / (sqrt(dot("va", "va")) * sqrt(dot("vb", "vb"))))
      .select(col("src_a"), col("src_b"), round(col("cos"), 6).as("style_cos"))
      .orderBy("src_a", "src_b")
  }

  val q158Sql: String = {
    val fwList = funcWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH cnt AS (
       |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT source, unnest(string_split(lower(text), ' ')) AS w
       |    FROM documents)
       |  WHERE list_contains($fwList, w) GROUP BY 1, 2),
       |sc AS (
       |  SELECT s.source, f.w FROM (SELECT DISTINCT source FROM cnt) s
       |  CROSS JOIN (SELECT unnest($fwList) AS w) f),
       |vx AS MATERIALIZED (
       |  SELECT sc.source,
       |    list(CAST(COALESCE(cnt.c, 0) AS DOUBLE) ORDER BY sc.w) AS v
       |  FROM sc LEFT JOIN cnt ON cnt.source = sc.source AND cnt.w = sc.w
       |  GROUP BY sc.source)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  round(
       |    list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
       |    / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
       |      * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) AS style_cos
       |FROM vx a JOIN vx b ON a.source < b.source
       |ORDER BY src_a, src_b""".stripMargin
  }

  // ---------------------------------------------------------------- q159
  /** Out-of-vocabulary rate per source against the corpus' own top-1000
    * vocabulary (q68's frequency ranking, reused through the two-level
    * rankedVocab decomposition — no global sort): the tokenizer-fit
    * readout that flags a source whose tokens a corpus-fitted vocabulary
    * would shatter. Integer counts, one division.
    */
  private val OovTopK = 1000L

  val q159: Q = (s, d) => {
    val top = RetrievalOps.rankedVocab(s, d)
      .where(col("rank64") <= OovTopK)
      .select(col("token").as("tv"))
    val sc = docs(s, d)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c"))
    sc.join(broadcast(top), col("token") === col("tv"), "left")
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("total_tokens"),
        sum(when(col("tv").isNull, col("c")).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_rate",
        round(col("oov_tokens").cast("double") / col("total_tokens"), 6))
      .orderBy("source")
  }

  val q159Sql: String =
    s"""WITH c AS (
       |  SELECT t AS token, count(*) AS n FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
       |  WHERE t <> '' GROUP BY 1),
       |top AS MATERIALIZED (
       |  SELECT token FROM (
       |    SELECT token, row_number() OVER (ORDER BY n DESC, token) AS rk
       |    FROM c) WHERE rk <= $OovTopK),
       |sc AS (
       |  SELECT source, t AS token, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT source, unnest(string_split(lower(text), ' ')) AS t
       |    FROM documents)
       |  WHERE t <> '' GROUP BY 1, 2)
       |SELECT sc.source,
       |  CAST(sum(sc.c) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN top.token IS NULL THEN sc.c ELSE 0 END) AS BIGINT)
       |    AS oov_tokens,
       |  round(CAST(sum(CASE WHEN top.token IS NULL THEN sc.c ELSE 0 END) AS BIGINT)
       |    / CAST(sum(sc.c) AS DOUBLE), 6) AS oov_rate
       |FROM sc LEFT JOIN top ON top.token = sc.token
       |GROUP BY sc.source ORDER BY sc.source""".stripMargin

  // ---------------------------------------------------------------- q160
  /** Discourse/charset profile per source: question, exclamation, quote,
    * digit, and uppercase character rates — the "conversational vs
    * expository vs tabular" mixture signal. Single-character counts via
    * replace-length deltas, char classes via global regex removal;
    * everything integer until the final divisions.
    */
  val q160: Q = (s, d) => {
    def chCount(c: String) =
      (length(col("text")) - length(regexp_replace(col("text"), c, ""))).cast("long")
    docs(s, d)
      .select(col("source"), length(col("text")).cast("long").as("nch"),
        chCount("\\?").as("qm"), chCount("!").as("em"), chCount("\"").as("qu"),
        chCount("[0-9]").as("dg"), chCount("[A-Z]").as("up"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nch")).as("n_chars"),
        sum(col("qm")).as("sq"), sum(col("em")).as("se"), sum(col("qu")).as("su"),
        sum(col("dg")).as("sd"), sum(col("up")).as("sc"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        round(col("sq").cast("double") / col("n_chars"), 6).as("question_rate"),
        round(col("se").cast("double") / col("n_chars"), 6).as("exclaim_rate"),
        round(col("su").cast("double") / col("n_chars"), 6).as("quote_rate"),
        round(col("sd").cast("double") / col("n_chars"), 6).as("digit_rate"),
        round(col("sc").cast("double") / col("n_chars"), 6).as("upper_rate"))
      .orderBy("source")
  }

  val q160Sql: String =
    """WITH c AS (
      |  SELECT source, CAST(length(text) AS BIGINT) AS nch,
      |    CAST(length(text) - length(regexp_replace(text, '\?', '', 'g')) AS BIGINT) AS qm,
      |    CAST(length(text) - length(regexp_replace(text, '!', '', 'g')) AS BIGINT) AS em,
      |    CAST(length(text) - length(regexp_replace(text, '"', '', 'g')) AS BIGINT) AS qu,
      |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS dg,
      |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS up
      |  FROM documents)
      |SELECT source, count(*) AS n_docs, CAST(sum(nch) AS BIGINT) AS n_chars,
      |  round(CAST(sum(qm) AS BIGINT) / CAST(sum(nch) AS DOUBLE), 6) AS question_rate,
      |  round(CAST(sum(em) AS BIGINT) / CAST(sum(nch) AS DOUBLE), 6) AS exclaim_rate,
      |  round(CAST(sum(qu) AS BIGINT) / CAST(sum(nch) AS DOUBLE), 6) AS quote_rate,
      |  round(CAST(sum(dg) AS BIGINT) / CAST(sum(nch) AS DOUBLE), 6) AS digit_rate,
      |  round(CAST(sum(up) AS BIGINT) / CAST(sum(nch) AS DOUBLE), 6) AS upper_rate
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q157_readability", q157, Some(q157Sql)),
    ("q158_stylometry", q158, Some(q158Sql)),
    ("q159_oov_rate", q159, Some(q159Sql)),
    ("q160_discourse_profile", q160, Some(q160Sql)))
}
