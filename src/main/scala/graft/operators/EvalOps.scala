package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.cosine_sim

/** Retrieval-evaluation operators (round 6, second pack): the honesty
  * audits a platform runs on its OWN approximate retrieval stack —
  * recall of the ANN paths against brute force, the ranking damage of
  * int8 quantization (Kendall tau), result-set overlap across
  * retrievers, and whether approximation flips a downstream kNN label
  * vote. The q131/q142 estimator-honesty contract applied to the ANN
  * layer: every approximation ships with the query that measures it.
  *
  * Scale notes (the 100 TB story): each retriever's candidate pass is
  * the SAME plan its production query runs (q27's one-scan TakeOrdered,
  * q47's probe-filtered scan, q29's bucket-equality scan) — one corpus
  * scan each; everything downstream operates on top-k candidate sets
  * (≤ 20 rows), joined broadcast. No new corpus-scale shuffle exists in
  * this pack.
  *
  * Exactness: recall/overlap/vote counts are integer set intersections;
  * Kendall tau's concordant/discordant counts are integer comparisons
  * of identically-computed doubles (the q58 computed-double-ordering
  * precedent; quantized reconstructions are bit-exact floor pipelines,
  * q110's proof); every ratio is one division rounded on output.
  */
object EvalOps {
  import Relational.Q
  import EmbeddingOps.emb

  private def queryVec(s: SparkSession, d: String): DataFrame =
    emb(s, d).filter(col("vec_id") === 0L).select(col("embedding").as("q_vec"))

  /** Exact-cosine top-k (q27's plan) with dense rank — (vec_id, label,
    * rk). The rank window runs over the ≤ k collected candidates.
    */
  private def exactTop(s: SparkSession, d: String, k: Int): DataFrame =
    emb(s, d).filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(queryVec(s, d)))
      .withColumn("sim", cosine_sim(col("embedding"), col("q_vec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("sim").desc, col("vec_id"))))
      .select(col("vec_id"), col("label"), col("rk"))
      // pinned: every consumer joins this <= k-row set repeatedly, and
      // without the pin each join re-runs the retriever's corpus scan
      // (the audit showed up to 25 embedding scans in q155)
      .localCheckpoint(true)

  /** IVF-probed top-k (q47's plan) with rank. */
  private def ivfTop(s: SparkSession, d: String, k: Int): DataFrame =
    EmbeddingOps.ivfAssigned(s, d)
      .filter(col("vec_id") =!= 0L && col("probed"))
      .crossJoin(broadcast(queryVec(s, d)))
      .withColumn("sim", cosine_sim(col("embedding"), col("q_vec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("sim").desc, col("vec_id"))))
      .select(col("vec_id"), col("label"), col("rk"))
      // pinned: every consumer joins this <= k-row set repeatedly, and
      // without the pin each join re-runs the retriever's corpus scan
      // (the audit showed up to 25 embedding scans in q155)
      .localCheckpoint(true)

  /** SRP-bucket top-k (q29's plan, widened to k) with rank. */
  private def lshTop(s: SparkSession, d: String, k: Int): DataFrame = {
    val signed = EmbeddingOps.srpSigned(s, d)
    val qRow = signed.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_vec"), col("bucket").as("q_bucket"))
    signed
      .crossJoin(broadcast(qRow))
      .filter(col("vec_id") =!= 0L && col("bucket") === col("q_bucket"))
      .withColumn("sim", cosine_sim(col("embedding"), col("q_vec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("sim").desc, col("vec_id"))))
      .select(col("vec_id"), col("label"), col("rk"))
      // pinned: every consumer joins this <= k-row set repeatedly, and
      // without the pin each join re-runs the retriever's corpus scan
      // (the audit showed up to 25 embedding scans in q155)
      .localCheckpoint(true)
  }

  // shared oracle CTEs: exact / ivf / lsh top-10 rankings (the SQL twins
  // of the builders above; ivf/lsh read the Verify fixtures q47/q29
  // already dump)
  private val topSqlCtes: String =
    """q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |sims AS MATERIALIZED (
      |  SELECT vec_id, label,
      |    list_sum(list_transform(list_zip(embedding, (SELECT qe FROM q)),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(embedding,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |      * (SELECT sqrt(list_sum(list_transform(qe,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) FROM q)) AS sim
      |  FROM embeddings WHERE vec_id <> 0),
      |ex AS MATERIALIZED (
      |  SELECT vec_id, label, rk FROM (
      |    SELECT vec_id, label, row_number() OVER (ORDER BY sim DESC, vec_id) AS rk
      |    FROM sims) WHERE rk <= 10),
      |iv AS MATERIALIZED (
      |  SELECT s.vec_id, s.label, row_number() OVER (ORDER BY s.sim DESC, s.vec_id) AS rk
      |  FROM sims s JOIN read_parquet('/tmp/graft_fixtures/ivf_cells/*.parquet') f
      |    ON f.vec_id = s.vec_id
      |  WHERE f.probed QUALIFY rk <= 10),
      |ls AS MATERIALIZED (
      |  SELECT s.vec_id, s.label, row_number() OVER (ORDER BY s.sim DESC, s.vec_id) AS rk
      |  FROM sims s
      |  JOIN read_parquet('/tmp/graft_fixtures/srp_buckets/*.parquet') b
      |    ON b.vec_id = s.vec_id
      |  WHERE b.bucket = (SELECT bucket
      |    FROM read_parquet('/tmp/graft_fixtures/srp_buckets/*.parquet')
      |    WHERE vec_id = 0)
      |  QUALIFY rk <= 10)""".stripMargin

  // ---------------------------------------------------------------- q153
  /** ANN recall@k (k = 1, 5, 10) of the IVF-probed and LSH-bucket paths
    * against the exact brute-force ranking — the standard ANN benchmark
    * readout (recall at fixed candidate budget). Hit counts are integer
    * set intersections of the top-k id sets; recall = hits/k, one exact
    * division. An LSH bucket holding fewer than k candidates scores its
    * honest sub-k recall.
    */
  val q153: Q = (s, d) => {
    val ex = exactTop(s, d, 10).select(col("vec_id").as("tid"), col("rk").as("trk"))
    val iv = ivfTop(s, d, 10).select(col("vec_id").as("iid"), col("rk").as("irk"))
    val ls = lshTop(s, d, 10).select(col("vec_id").as("lid"), col("rk").as("lrk"))
    import s.implicits._
    val ks = Seq(1, 5, 10).toDF("k")
    val ivHits = ks.join(ex, col("trk") <= col("k"))
      .join(iv, col("iid") === col("tid") && col("irk") <= col("k"), "left_semi")
      .groupBy(col("k")).agg(count(lit(1)).as("ivf_hits"))
    val lsHits = ks.join(ex, col("trk") <= col("k"))
      .join(ls, col("lid") === col("tid") && col("lrk") <= col("k"), "left_semi")
      .groupBy(col("k")).agg(count(lit(1)).as("lsh_hits"))
    ks.join(ivHits, Seq("k"), "left").join(lsHits, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("ivf_hits"), lit(0L)).as("ivf_hits"),
        coalesce(col("lsh_hits"), lit(0L)).as("lsh_hits"),
        round(coalesce(col("ivf_hits"), lit(0L)).cast("double") / col("k"), 6)
          .as("ivf_recall"),
        round(coalesce(col("lsh_hits"), lit(0L)).cast("double") / col("k"), 6)
          .as("lsh_recall"))
      .orderBy("k")
  }

  val q153Sql: String =
    s"""WITH $topSqlCtes,
       |ks AS (SELECT unnest([1, 5, 10]) AS k),
       |ivh AS (
       |  SELECT ks.k, count(*) AS ivf_hits
       |  FROM ks JOIN ex ON ex.rk <= ks.k
       |  WHERE EXISTS (SELECT 1 FROM iv
       |                WHERE iv.vec_id = ex.vec_id AND iv.rk <= ks.k)
       |  GROUP BY ks.k),
       |lsh AS (
       |  SELECT ks.k, count(*) AS lsh_hits
       |  FROM ks JOIN ex ON ex.rk <= ks.k
       |  WHERE EXISTS (SELECT 1 FROM ls
       |                WHERE ls.vec_id = ex.vec_id AND ls.rk <= ks.k)
       |  GROUP BY ks.k)
       |SELECT ks.k,
       |  COALESCE(ivh.ivf_hits, 0) AS ivf_hits,
       |  COALESCE(lsh.lsh_hits, 0) AS lsh_hits,
       |  round(CAST(COALESCE(ivh.ivf_hits, 0) AS DOUBLE) / ks.k, 6) AS ivf_recall,
       |  round(CAST(COALESCE(lsh.lsh_hits, 0) AS DOUBLE) / ks.k, 6) AS lsh_recall
       |FROM ks LEFT JOIN ivh ON ivh.k = ks.k LEFT JOIN lsh ON lsh.k = ks.k
       |ORDER BY ks.k""".stripMargin

  // ---------------------------------------------------------------- q154
  /** Quantization rank damage: Kendall tau between the exact-cosine
    * ranking and the int8-dequantized-cosine ranking over the exact
    * top-20 candidates — "how much ordering does 4× compression cost".
    * The reconstruction is q110's bit-exact floor pipeline (per-dim
    * min/max literals, floor exact); both engines compute the quantized
    * cosine with the identical in-order fold, so every pairwise
    * comparison — a discrete decision on identically-computed doubles —
    * agrees (q58's precedent). Concordant/discordant/tie counts are
    * integers; tau-a = (C − D) / pairs is one division.
    */
  private val TauK = 20
  private val TauDims = 64

  val q154: Q = (s, d) => {
    val stats = emb(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v").cast("double")).as("lo"), max(col("v").cast("double")).as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val loL = typedlit((0 until TauDims).map(stats(_)._1))
    val spL = typedlit((0 until TauDims).map(i => stats(i)._2 - stats(i)._1))
    def dequant(e: Column): Column = transform(sequence(lit(0), lit(TauDims - 1)), i => {
      val x = element_at(e, i + 1).cast("double")
      val l = element_at(loL, i + 1)
      val w = element_at(spL, i + 1)
      val code = when(w === 0.0, lit(0.0))
        .otherwise(least(greatest(floor((x - l) / w * 255.0 + 0.5).cast("double"),
          lit(0.0)), lit(255.0)))
      l + code / 255.0 * w
    })
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val cand = exactTop(s, d, TauK)
      .join(emb(s, d).select(col("vec_id"), col("embedding")), "vec_id")
      .withColumn("xe", dequant(col("embedding")))
    val qx = emb(s, d).filter(col("vec_id") === 0L)
      .select(dequant(col("embedding")).as("qe"))
    val scored = cand.crossJoin(broadcast(qx))
      .withColumn("qsim",
        dot(col("xe"), col("qe"))
          / (sqrt(dot(col("xe"), col("xe"))) * sqrt(dot(col("qe"), col("qe")))))
      .select(col("vec_id"), col("rk"), col("qsim"))
    val a = scored.select(col("rk").as("ra"), col("qsim").as("qa"))
    val b = scored.select(col("rk").as("rb"), col("qsim").as("qb"))
    a.join(broadcast(b), col("ra") < col("rb"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("qa") > col("qb"), 1L).otherwise(0L)).as("concordant"),
        sum(when(col("qa") < col("qb"), 1L).otherwise(0L)).as("discordant"),
        sum(when(col("qa") === col("qb"), 1L).otherwise(0L)).as("ties"))
      .select(lit(TauK).as("n_cand"), col("n_pairs"), col("concordant"),
        col("discordant"), col("ties"),
        round((col("concordant") - col("discordant")).cast("double")
          / col("n_pairs"), 6).as("kendall_tau"))
  }

  val q154Sql: String =
    s"""WITH $topSqlCtes,
       |ex20 AS MATERIALIZED (
       |  SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS rk
       |  FROM sims QUALIFY rk <= $TauK),
       |st AS MATERIALIZED (
       |  SELECT t.i AS dim,
       |    min(CAST(embedding[t.i] AS DOUBLE)) AS lo,
       |    max(CAST(embedding[t.i] AS DOUBLE)) AS hi
       |  FROM embeddings, generate_series(1, $TauDims) t(i)
       |  GROUP BY 1),
       |dq AS MATERIALIZED (
       |  SELECT e.vec_id,
       |    list(s.lo + (CASE WHEN s.hi - s.lo = 0 THEN 0.0
       |      ELSE least(greatest(floor((CAST(e.embedding[t.i] AS DOUBLE) - s.lo)
       |        / (s.hi - s.lo) * 255.0 + 0.5), 0.0), 255.0) END)
       |      / 255.0 * (s.hi - s.lo) ORDER BY t.i) AS xe
       |  FROM embeddings e, generate_series(1, $TauDims) t(i)
       |  JOIN st s ON s.dim = t.i
       |  WHERE e.vec_id = 0 OR EXISTS (SELECT 1 FROM ex20 WHERE ex20.vec_id = e.vec_id)
       |  GROUP BY e.vec_id),
       |qs AS MATERIALIZED (
       |  SELECT x.vec_id, r.rk,
       |    list_sum(list_transform(list_zip(x.xe, (SELECT xe FROM dq WHERE vec_id = 0)),
       |      p -> p[1] * p[2]))
       |    / (sqrt(list_sum(list_transform(x.xe, v -> v * v)))
       |      * (SELECT sqrt(list_sum(list_transform(xe, v -> v * v)))
       |         FROM dq WHERE vec_id = 0)) AS qsim
       |  FROM dq x JOIN ex20 r ON r.vec_id = x.vec_id)
       |SELECT $TauK AS n_cand, count(*) AS n_pairs,
       |  CAST(sum(CASE WHEN a.qsim > b.qsim THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
       |  CAST(sum(CASE WHEN a.qsim < b.qsim THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
       |  CAST(sum(CASE WHEN a.qsim = b.qsim THEN 1 ELSE 0 END) AS BIGINT) AS ties,
       |  round(CAST(CAST(sum(CASE WHEN a.qsim > b.qsim THEN 1 ELSE 0 END) AS BIGINT)
       |    - CAST(sum(CASE WHEN a.qsim < b.qsim THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |    / count(*), 6) AS kendall_tau
       |FROM qs a JOIN qs b ON a.rk < b.rk""".stripMargin

  // ---------------------------------------------------------------- q155
  /** Retriever result-set overlap: pairwise Jaccard of the top-10 id
    * sets of the exact, IVF, and LSH retrievers — the redundancy map
    * that tells a platform whether its cheap retrievers are substitutes
    * or complements (feeding q111's fusion). Pure integer set algebra.
    */
  val q155: Q = (s, d) => {
    import s.implicits._
    val sets = Seq(
      ("exact", exactTop(s, d, 10)),
      ("ivf", ivfTop(s, d, 10)),
      ("lsh", lshTop(s, d, 10)))
    val tagged = sets.map { case (n, df) =>
      df.select(lit(n).as("method"), col("vec_id"))
    }.reduce(_ union _)
    val a = tagged.select(col("method").as("ma"), col("vec_id"))
    val b = tagged.select(col("method").as("mb"), col("vec_id").as("vb"))
    // renamed keys: inter/pairs share tagged's lineage (the q142 lesson)
    val inter = a.join(b, col("vec_id") === col("vb") && col("ma") < col("mb"))
      .groupBy(col("ma"), col("mb")).agg(count(lit(1)).as("inter"))
      .select(col("ma").as("ia"), col("mb").as("ib"), col("inter"))
    val szs = tagged.groupBy(col("method")).agg(count(lit(1)).as("sz"))
    val pairs = szs.select(col("method").as("ma"), col("sz").as("sa"))
      .crossJoin(szs.select(col("method").as("mb2"), col("sz").as("sb")))
      .where(col("ma") < col("mb2"))
    pairs.join(inter, col("ma") === col("ia") && col("mb2") === col("ib"), "left")
      .select(col("ma").as("method_a"), col("mb2").as("method_b"),
        coalesce(col("inter"), lit(0L)).as("n_common"),
        (col("sa") + col("sb") - coalesce(col("inter"), lit(0L))).as("n_union"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") / col("n_union"), 6))
      .orderBy("method_a", "method_b")
  }

  val q155Sql: String =
    s"""WITH $topSqlCtes,
       |tg AS (
       |  SELECT 'exact' AS method, vec_id FROM ex
       |  UNION ALL SELECT 'ivf', vec_id FROM iv
       |  UNION ALL SELECT 'lsh', vec_id FROM ls),
       |sz AS (SELECT method, count(*) AS sz FROM tg GROUP BY 1),
       |io AS (
       |  SELECT a.method AS ma, b.method AS mb, count(*) AS inter
       |  FROM tg a JOIN tg b ON a.vec_id = b.vec_id AND a.method < b.method
       |  GROUP BY 1, 2)
       |SELECT sa.method AS method_a, sb.method AS method_b,
       |  COALESCE(io.inter, 0) AS n_common,
       |  sa.sz + sb.sz - COALESCE(io.inter, 0) AS n_union,
       |  round(CAST(COALESCE(io.inter, 0) AS DOUBLE)
       |    / (sa.sz + sb.sz - COALESCE(io.inter, 0)), 6) AS jaccard
       |FROM sz sa JOIN sz sb ON sa.method < sb.method
       |LEFT JOIN io ON io.ma = sa.method AND io.mb = sb.method
       |ORDER BY method_a, method_b""".stripMargin

  // ---------------------------------------------------------------- q156
  /** kNN label-vote consistency: does approximate retrieval change the
    * downstream decision? Majority label of the exact top-10 vs the IVF
    * and LSH top-10 (tie → lexicographically smallest label — an exact
    * string comparison), plus each vote's margin. The one-row audit
    * that catches "recall@10 = 0.8 but the classifier flips".
    */
  val q156: Q = (s, d) => {
    def vote(df: DataFrame, name: String): DataFrame = {
      val w = Window.orderBy(col("votes").desc, col("label"))
      df.groupBy(col("label")).agg(count(lit(1)).as("votes"))
        .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(lit(name).as("method"), col("label"), col("votes"))
    }
    val all = vote(exactTop(s, d, 10), "exact")
      .union(vote(ivfTop(s, d, 10), "ivf"))
      .union(vote(lshTop(s, d, 10), "lsh"))
    val ex = all.where(col("method") === "exact")
      .select(col("label").as("exact_label"))
    all.crossJoin(broadcast(ex))
      .select(col("method"), col("label").as("majority_label"), col("votes"),
        (col("label") === col("exact_label")).as("agrees_with_exact"))
      .orderBy("method")
  }

  val q156Sql: String =
    s"""WITH $topSqlCtes,
       |vt AS (
       |  SELECT method, label, votes FROM (
       |    SELECT method, label, votes, row_number() OVER (
       |      PARTITION BY method ORDER BY votes DESC, label) AS rk
       |    FROM (
       |      SELECT 'exact' AS method, label, count(*) AS votes FROM ex GROUP BY 2
       |      UNION ALL SELECT 'ivf', label, count(*) FROM iv GROUP BY 2
       |      UNION ALL SELECT 'lsh', label, count(*) FROM ls GROUP BY 2))
       |  WHERE rk = 1)
       |SELECT v.method, v.label AS majority_label, CAST(v.votes AS BIGINT) AS votes,
       |  v.label = e.label AS agrees_with_exact
       |FROM vt v CROSS JOIN (SELECT label FROM vt WHERE method = 'exact') e
       |ORDER BY v.method""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q153_ann_recall", q153, Some(q153Sql)),
    ("q154_quant_rank_damage", q154, Some(q154Sql)),
    ("q155_retriever_overlap", q155, Some(q155Sql)),
    ("q156_knn_consistency", q156, Some(q156Sql)))
}
