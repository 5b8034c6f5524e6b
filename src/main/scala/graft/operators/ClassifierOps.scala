package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering (q105) — the "train a cheap classifier,
  * score the corpus" stage of modern data curation (fastText quality
  * filters; DCLM, Li et al. 2024: distill a rule-based labeler into a
  * hashed linear model and threshold on its probability). The pipeline
  * here is complete and distributed: featurize (hashed unigram presence,
  * `gram_buckets` — codegen'd murmur3, the fastText hashing trick),
  * derive labels from a keyword rule (contains "spark" and not "slow" —
  * the stand-in for a boilerplate/spam rule on the synthetic corpus),
  * train full-batch logistic regression with centered features and
  * class-balanced errors under heavy-ball momentum, then score every
  * document with the learned model.
  *
  * Shape (the 100 TB story): the model is B+1 doubles of driver metadata
  * (exactly like q47's k-means centroids). Each training iteration is
  * ONE corpus pass — margins are a row-local array fold over broadcast
  * literal weights (no join, no shuffle of features), and the gradient
  * is one map-side-combined aggregation to B bucket keys (a sentinel
  * bucket carries the total-error term of the centering correction, so
  * the pass is a single job). K iterations = K linear scans; scoring is
  * a stateless map. Nothing driver-side ever holds more than the model.
  *
  * Feature centering is what makes plain GD workable here: presence
  * features co-occur heavily (every doc shares most of the vocabulary),
  * so the uncentered Hessian is dominated by the all-ones direction and
  * full-batch GD either crawls or diverges. Centering folds into a
  * per-model scalar (margin += -Σ_j w_j·μ_j) and a rank-one gradient
  * correction (g_j = s_j − μ_j·ΣE), so the features themselves STAY
  * sparse — the standard trick for training on sparse data without
  * densifying it.
  *
  * Exactness vs the oracle: the DuckDB side replays the identical
  * iterations from the dumped (doc_id, bucket) fixture as unrolled CTEs
  * (q77's discipline). All constants are shared double literals; update
  * expressions use the same association on both sides; per-doc/per-bucket
  * double sums may associate differently and `exp` may differ in the
  * last ulp between libm and the JVM — drift orders of magnitude below
  * the round(…, 6) the output absorbs it with.
  */
object ClassifierOps {
  import Relational.Q

  private[graft] val ClfBuckets = 512
  private[graft] val ClfIters = 12
  private val ClfLr = 4.0
  private val ClfMomentum = 0.9

  /** Featurized corpus: per-doc distinct hashed-unigram buckets + the
    * rule label the classifier distills. One row per document.
    */
  private def feats(s: SparkSession, d: String): DataFrame = {
    val toks = split(lower(col("text")), " ")
    DocOps.docs(s, d).select(
      col("doc_id"),
      array_distinct(graft.functions.gram_buckets(col("text"), 1, ClfBuckets)).as("bs"),
      when(array_contains(toks, "spark") && !array_contains(toks, "slow"), lit(1.0))
        .otherwise(lit(0.0)).as("label"))
  }

  /** Distinct (doc_id, bucket) pairs — the Verify fixture the DuckDB
    * oracle rebuilds the entire training loop from.
    */
  private[graft] def clfGrams(s: SparkSession, d: String): DataFrame =
    feats(s, d).select(col("doc_id"), explode(col("bs")).as("bucket"))

  /** Margin under literal weights: start + Σ_{j∈doc} w_j, row-local.
    * r12: one codegen'd fold (`bucket_weight_sum`) instead of
    * `aggregate(transform(bs, j -> element_at(w, j+1)), start, +)` —
    * the higher-order composition is interpreted (CodegenFallback) and
    * materialized a boxed 512-slot lookup per row, paid once per
    * document per training iteration (12×) plus scoring. Fold order and
    * start term are identical, so margins are bit-identical doubles.
    */
  // INVARIANT (the expression indexes weights(j) unchecked): every bucket
  // in `bs` comes from gram_buckets(text, 1, ClfBuckets) ∈ [0, ClfBuckets)
  // and w.length == ClfBuckets at every call site, so the raw index can
  // never leave [0, w.length) — documented per the r12 advice rather than
  // bounds-checked, keeping the per-element fold branch-free.
  private def marginCol(w: Array[Double], start: Double): Column =
    org.apache.spark.sql.graft.GraftColumns.bucketWeightSum(col("bs"), w, start)

  private def sigmoidCol(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** The trained model: per-bucket weights, bias, and the scoring-time
    * centering constant. Exposed for the spec's convergence assertions.
    */
  private[graft] final case class ClfModel(w: Array[Double], b0: Double, c: Double)

  private[graft] def trainModel(s: SparkSession, d: String): ClfModel = {
    val ftrain = feats(s, d).persist()
    try {
      val firstAgg = ftrain.agg(count(lit(1)), sum(col("label"))).head()
      val n = firstAgg.getLong(0).toDouble
      val posFrac = firstAgg.getDouble(1) / n
      val posW = 0.5 / posFrac
      val negW = 0.5 / (1.0 - posFrac)

      // bucket presence means — one aggregation, B rows of metadata
      val mu = Array.fill(ClfBuckets)(0.0)
      ftrain.select(explode(col("bs")).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
        .collect().foreach(r => mu(r.getInt(0)) = r.getLong(1) / n)

      val w = Array.fill(ClfBuckets)(0.0)
      val vw = Array.fill(ClfBuckets)(0.0)
      var b0 = 0.0
      var vb = 0.0
      for (_ <- 1 to ClfIters) {
        var c = 0.0
        var j = 0
        while (j < ClfBuckets) { c -= w(j) * mu(j); j += 1 }
        // one pass: error per doc, aggregated straight to bucket keys;
        // the sentinel bucket -1 collects the total error (the centering
        // correction and the bias gradient) in the same job
        val scored = ftrain
          .withColumn("m", marginCol(w, b0 + c))
          .withColumn("e",
            (sigmoidCol(col("m")) - col("label")) *
              when(col("label") === 1.0, lit(posW)).otherwise(lit(negW)))
        val sums = scored
          .select(explode(concat(col("bs"), array(lit(-1)))).as("bucket"), col("e"))
          .groupBy(col("bucket")).agg(sum(col("e")).as("se"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val te = sums.getOrElse(-1, 0.0)
        j = 0
        while (j < ClfBuckets) {
          val g = sums.getOrElse(j, 0.0) - mu(j) * te
          vw(j) = ClfMomentum * vw(j) + g / n
          w(j) = w(j) - ClfLr * vw(j)
          j += 1
        }
        vb = ClfMomentum * vb + te / n
        b0 = b0 - ClfLr * vb
      }
      var c = 0.0
      var j = 0
      while (j < ClfBuckets) { c -= w(j) * mu(j); j += 1 }
      ClfModel(w, b0, c)
    } finally { ftrain.unpersist(); () }
  }

  val q105: Q = (s, d) => {
    val model = trainModel(s, d)
    feats(s, d)
      .withColumn("m", marginCol(model.w, model.b0 + model.c))
      .select(col("doc_id"), col("label"),
        round(sigmoidCol(col("m")), 6).as("p"))
      .orderBy("doc_id")
  }

  /** Per-doc label + micro-unit probability from the trained model —
    * the calibration pack's input, dumped as the `clf_scores` fixture
    * (the oracle reads the stored micros; it cannot replay exp
    * bit-exactly). Memoized: one training run feeds q225–q228.
    */
  private val scoredMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def scoredMicro(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(scoredMemo, s, d) {
      val model = trainModel(s, d)
      feats(s, d)
        .withColumn("m", marginCol(model.w, model.b0 + model.c))
        .select(col("doc_id"), col("label").cast("long").as("y"),
          (round(sigmoidCol(col("m")) * lit(1000000.0), 0)).cast("long").as("pm"))
        .localCheckpoint(true)
    }

  val q105Sql: String = {
    val lr = "4.0"
    val mom = "0.9"
    val iters = (1 to ClfIters).map { k =>
      s"""cc$k AS MATERIALIZED (SELECT -sum(w.w * mu.mu) AS c FROM ww${k - 1} w JOIN mu USING (bucket)),
         |mm$k AS MATERIALIZED (
         |  SELECT l.doc_id, l.label,
         |    (SELECT b0 FROM bb${k - 1}) + (SELECT c FROM cc$k) + coalesce(sum(w.w), 0.0) AS m
         |  FROM l LEFT JOIN g USING (doc_id) LEFT JOIN ww${k - 1} w USING (bucket)
         |  GROUP BY l.doc_id, l.label),
         |ee$k AS MATERIALIZED (
         |  SELECT doc_id,
         |    (1.0 / (1.0 + exp(-m)) - label) *
         |      CASE WHEN label = 1.0 THEN (SELECT pw FROM prior)
         |           ELSE (SELECT nw FROM prior) END AS e
         |  FROM mm$k),
         |tE$k AS MATERIALIZED (SELECT sum(e) AS te FROM ee$k),
         |ss$k AS MATERIALIZED (SELECT g.bucket, sum(e.e) AS s FROM g JOIN ee$k e USING (doc_id) GROUP BY 1),
         |ww$k AS MATERIALIZED (
         |  SELECT w.bucket,
         |    w.w - $lr * ($mom * w.vw + (coalesce(s.s, 0.0) - mu.mu * (SELECT te FROM tE$k)) / (SELECT n FROM cnt)) AS w,
         |    $mom * w.vw + (coalesce(s.s, 0.0) - mu.mu * (SELECT te FROM tE$k)) / (SELECT n FROM cnt) AS vw
         |  FROM ww${k - 1} w JOIN mu USING (bucket) LEFT JOIN ss$k s USING (bucket)),
         |bb$k AS MATERIALIZED (
         |  SELECT b.b0 - $lr * ($mom * b.vb + (SELECT te FROM tE$k) / (SELECT n FROM cnt)) AS b0,
         |         $mom * b.vb + (SELECT te FROM tE$k) / (SELECT n FROM cnt) AS vb
         |  FROM bb${k - 1} b)""".stripMargin
    }.mkString(",\n")
    s"""WITH g AS MATERIALIZED (
       |  SELECT doc_id, bucket
       |  FROM read_parquet('/tmp/graft_fixtures/clf_grams/*.parquet')),
       |l AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN list_contains(string_split(lower(text), ' '), 'spark')
       |          AND NOT list_contains(string_split(lower(text), ' '), 'slow')
       |         THEN 1.0 ELSE 0.0 END AS label
       |  FROM documents),
       |cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |prior AS MATERIALIZED (
       |  SELECT 0.5 / (sum(label) / (SELECT n FROM cnt)) AS pw,
       |         0.5 / (1.0 - sum(label) / (SELECT n FROM cnt)) AS nw
       |  FROM l),
       |mu AS MATERIALIZED (
       |  SELECT bucket, count(*) / (SELECT n FROM cnt) AS mu
       |  FROM g GROUP BY 1),
       |ww0 AS MATERIALIZED (SELECT bucket, CAST(0.0 AS DOUBLE) AS w, CAST(0.0 AS DOUBLE) AS vw FROM mu),
       |bb0 AS MATERIALIZED (SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS vb),
       |$iters,
       |ccF AS MATERIALIZED (SELECT -sum(w.w * mu.mu) AS c FROM ww$ClfIters w JOIN mu USING (bucket)),
       |mmF AS MATERIALIZED (
       |  SELECT l.doc_id, l.label,
       |    (SELECT b0 FROM bb$ClfIters) + (SELECT c FROM ccF) + coalesce(sum(w.w), 0.0) AS m
       |  FROM l LEFT JOIN g USING (doc_id) LEFT JOIN ww$ClfIters w USING (bucket)
       |  GROUP BY l.doc_id, l.label)
       |SELECT doc_id, label, round(1.0 / (1.0 + exp(-m)), 6) AS p
       |FROM mmF ORDER BY doc_id""".stripMargin
  }

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q105_quality_classifier", q105, Some(q105Sql)))
}
