package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.{cosine_sim, srp_signature}

/** Similarity search over the `embeddings` table (ArrayType(FloatType)).
  *
  * q27 brute-force top-k: broadcast the (single) query vector, codegen'd
  * cosine over one scan — the exact baseline, linear in corpus size and
  * embarrassingly parallel (this IS the right plan at any scale for one
  * query vector).
  *
  * q28 all-pairs near-dup: exact O(n²) — correctness baseline at test SFs.
  * q29 hyperplane-LSH bucketing: the scale path — signatures partition the
  * corpus so candidate generation is a bucket-equality join, O(n·bits +
  * collisions); deterministic planes mean executors never exchange model
  * state.
  */
object EmbeddingOps {
  import Relational.Q

  private[operators] def emb(s: SparkSession, d: String) = Graft.table(s, d, "embeddings")

  /** The fixed query vector: embedding of vec_id 0 (broadcast single row). */
  private def queryVec(s: SparkSession, d: String): DataFrame =
    emb(s, d).filter(col("vec_id") === 0L).select(col("embedding").as("q_vec"))

  // ---------------------------------------------------------------- q27
  val q27: Q = (s, d) =>
    emb(s, d)
      .filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(queryVec(s, d)))
      .withColumn("sim", cosine_sim(col("embedding"), col("q_vec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("label"), round(col("sim"), 6).as("sim"))

  val q27Sql: String =
    """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
      |s AS (
      |  SELECT vec_id, label,
      |    list_sum(list_transform(list_zip(embedding, (SELECT e FROM q)),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
      |    (SELECT sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) FROM q) AS nb
      |  FROM embeddings WHERE vec_id <> 0)
      |SELECT vec_id, label, round(dot / (na * nb), 6) AS sim
      |FROM s ORDER BY dot / (na * nb) DESC, vec_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Exact all-pairs cosine >= 0.4 (this corpus' near-dup band). */
  val q28: Q = (s, d) => {
    // r12: spread the probe side when the scan produced fewer splits
    // than cores — the O(n²) pair work is per ROW and invisible to
    // input-split sizing, and the one-small-file corpus ran the whole
    // nested-loop probe on a single task (guide §2.5). No-op once the
    // scan is at least core-parallel; only (id, vector) rows move.
    val e = emb(s, d)
    val p = s.sparkContext.defaultParallelism
    val spread = if (e.rdd.getNumPartitions < p) e.repartition(p) else e
    val a = spread.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = emb(s, d).select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine_sim(col("e_a"), col("e_b")))
      .filter(col("sim") >= 0.4)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .orderBy("id_a", "id_b")
  }

  val q28Sql: String =
    """WITH s AS (
      |  SELECT vec_id, embedding AS e,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_sum(list_transform(list_zip(a.e, b.e),
      |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (a.nrm * b.nrm), 6) AS sim
      |FROM s a JOIN s b ON a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(list_zip(a.e, b.e),
      |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (a.nrm * b.nrm) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Corpus + 6-bit hyperplane-LSH bucket per vector (shared by q29 and
    * the Verify fixture dump that powers its oracle).
    */
  private[graft] def srpSigned(s: SparkSession, d: String): DataFrame =
    emb(s, d).withColumn("bucket", srp_signature(col("embedding"), 6, 42L))

  /** LSH-bucketed ANN: hyperplane signatures; search only the query
    * vector's bucket. The signature isn't SQL-expressible (covered by
    * VectorMathSpec + the recall spec), so Verify dumps the per-vector
    * bucket as a fixture parquet and the DuckDB oracle independently
    * re-derives the bucket-equality search and the exact cosine rerank.
    */
  val q29: Q = (s, d) => {
    val signed = srpSigned(s, d)
    val qRow = signed.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_vec"), col("bucket").as("q_bucket"))
    signed
      .crossJoin(broadcast(qRow))
      .filter(col("vec_id") =!= 0L && col("bucket") === col("q_bucket"))
      .withColumn("sim", cosine_sim(col("embedding"), col("q_vec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
      .select(col("vec_id"), col("bucket"), round(col("sim"), 6).as("sim"))
  }

  val q29Sql: String =
    """WITH b AS (
      |  SELECT vec_id, bucket
      |  FROM read_parquet('/tmp/graft_fixtures/srp_buckets/*.parquet')),
      |q AS (
      |  SELECT e.embedding AS qe, b.bucket AS qb
      |  FROM embeddings e JOIN b USING (vec_id) WHERE e.vec_id = 0),
      |s AS (
      |  SELECT e.vec_id, b.bucket,
      |    list_sum(list_transform(list_zip(e.embedding, (SELECT qe FROM q)),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
      |    sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
      |    (SELECT sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) FROM q) AS nb
      |  FROM embeddings e JOIN b USING (vec_id)
      |  WHERE e.vec_id <> 0 AND b.bucket = (SELECT qb FROM q))
      |SELECT vec_id, bucket, round(dot / (na * nb), 6) AS sim
      |FROM s ORDER BY dot / (na * nb) DESC, vec_id LIMIT 5""".stripMargin

  // ---------------------------------------------------------------- q47
  /** IVF-flat ANN: spherical k-means coarse quantizer, probe the `nprobe`
    * cells nearest the query, exact cosine rerank inside them — the
    * inverted-file scale path next to q29's hash-bucket one.
    *
    * The quantizer fit is FAISS-shaped: one seeded sampling scan pulls
    * ~100·nlist vectors to the driver, Lloyd's iterations run driver-side
    * (the quantizer is model metadata — nlist·dim doubles — not data),
    * and cell assignment is an argmax over codegen'd `cosine_sim` columns
    * against literal centroids, so the corpus-side work is one narrow
    * whole-stage-codegen map. At 100 TB the cell id becomes a partition
    * column and a probe prunes partitions; here cells are a column and
    * the `isin` filter is the same semantics. Spherical (unit-normalized
    * means) because Euclidean Voronoi cells only match the cosine query
    * metric on the unit sphere. The quantizer fit isn't SQL-expressible
    * (recall vs the q27 exact baseline is asserted in QueryPackSpec), so
    * Verify dumps each vector's (cell, probed) as a fixture parquet and
    * the DuckDB oracle independently re-derives the probe filter and the
    * exact cosine top-10 rerank.
    */
  /** Corpus with the fitted quantizer applied: every vector's cell id and
    * whether that cell is probed for the fixed query (shared by q47 and
    * the Verify fixture dump).
    */
  private val ivfMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def ivfAssigned(s: SparkSession, d: String): DataFrame =
    // memoized like dupLabels/verifiedPairs: the fit is deterministic
    // (seeded sample, fixed iterations) and q47, q61, and the Verify
    // fixture dump would otherwise each repay the count + sample-collect
    // + driver k-means
    DocOps.Memo.get(ivfMemo, s, d)(computeIvfAssigned(s, d))

  private def computeIvfAssigned(s: SparkSession, d: String): DataFrame = {
    val nprobe = 4
    val nlist = 8
    val e = emb(s, d)
    val fitTarget = 100L * nlist
    val total = e.count() // parquet metadata count
    val sample = (if (total > fitTarget)
        e.select(col("embedding")).sample(withReplacement = false, fitTarget.toDouble / total, 42L)
      else e.select(col("embedding")))
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val centroids = graft.core.VectorMath.sphericalKMeans(sample, nlist, iters = 8)

    val qArr = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    def cos(a: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * qArr(i); na += a(i) * a(i); nb += qArr(i) * qArr(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val probed = centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(c) }
      .take(nprobe).map(_._2).toSeq

    // argmax over (sim, idx) structs: struct comparison is field-ordered,
    // so array_max yields the highest sim with the highest idx breaking
    // exact ties — deterministic, and every term is codegen'd
    val cellCol = array_max(array(centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(
        cosine_sim(col("embedding"), typedLit(c.map(_.toFloat))).as("sim"),
        lit(i).as("idx"))
    }: _*)).getField("idx").as("cell")

    e.withColumn("cell", cellCol)
      .withColumn("probed", col("cell").isin(probed: _*))
  }

  val q47: Q = (s, d) =>
    ivfAssigned(s, d)
      .filter(col("vec_id") =!= 0L && col("probed"))
      .crossJoin(broadcast(queryVec(s, d)))
      .withColumn("sim", cosine_sim(col("embedding"), col("q_vec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("cell"), round(col("sim"), 6).as("sim"))

  val q47Sql: String =
    """WITH f AS (
      |  SELECT vec_id, cell, probed
      |  FROM read_parquet('/tmp/graft_fixtures/ivf_cells/*.parquet')),
      |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |s AS (
      |  SELECT e.vec_id, f.cell,
      |    list_sum(list_transform(list_zip(e.embedding, (SELECT qe FROM q)),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
      |    sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
      |    (SELECT sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) FROM q) AS nb
      |  FROM embeddings e JOIN f USING (vec_id)
      |  WHERE f.probed AND e.vec_id <> 0)
      |SELECT vec_id, cell, round(dot / (na * nb), 6) AS sim
      |FROM s ORDER BY dot / (na * nb) DESC, vec_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q61
  /** SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * clustering embeddings and comparing only WITHIN a cluster — the
    * pairwise work drops from O(n²) to O(Σ cᵢ²). Reuses q47's spherical
    * k-means coarse quantizer for the clustering; a vector is dropped when
    * a lower-id cluster-mate sits at cosine >= the near-dup band (the
    * paper keeps one representative per semantic duplicate group; lowest
    * id is the deterministic choice). At 100 TB the cell id is a partition
    * column, the self-join shuffles once on the cell key (never all-pairs)
    * and cluster count scales with corpus size to bound cᵢ. The oracle
    * re-derives the within-cell pair set + drop rule in DuckDB from the
    * same `ivf_cells` fixture q47 dumps.
    */
  val q61: Q = (s, d) => {
    val t = 0.4 // same near-dup band as the exact q28 baseline
    val assigned = ivfAssigned(s, d).select(col("vec_id"), col("label"), col("cell"), col("embedding"))
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine_sim(col("e_a"), col("e_b")) >= t)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label"), col("cell"))
      .orderBy(col("vec_id")) // pack invariant: total order on every result
  }

  val q61Sql: String =
    """WITH f AS (
      |  SELECT vec_id, cell
      |  FROM read_parquet('/tmp/graft_fixtures/ivf_cells/*.parquet')),
      |c AS (
      |  SELECT e.vec_id, e.label, f.cell, e.embedding
      |  FROM embeddings e JOIN f USING (vec_id)),
      |p AS (
      |  SELECT b.vec_id AS idb
      |  FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.4),
      |d AS (SELECT DISTINCT idb FROM p)
      |SELECT c.vec_id, c.label, c.cell
      |FROM c LEFT JOIN d ON c.vec_id = d.idb WHERE d.idb IS NULL""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Batched multi-query ANN — the production serving shape: top-5
    * neighbors for EVERY query in a batch (vec_ids < 10 stand in for the
    * incoming batch), not one query at a time. The query side (with its
    * LSH buckets) broadcasts — a query batch is always tiny next to the
    * corpus — candidates come from bucket equality (same signatures as
    * q29), and per-query top-k is one window over candidates only. At
    * 100 TB: corpus-side scan + broadcast join + a shuffle of candidates
    * keyed by query id; nothing quadratic, no corpus shuffle.
    */
  val q63: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val signed = srpSigned(s, d)
    val queries = signed.filter(col("vec_id") < 10L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("bucket"))
    val corpus = signed.filter(col("vec_id") >= 10L)
      .select(col("vec_id"), col("embedding"), col("bucket"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .withColumn("sim", cosine_sim(col("embedding"), col("q_vec")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id"), col("rk"), round(col("sim"), 6).as("sim"))
      .orderBy(col("q_id"), col("rk")) // pack invariant: total order
  }

  val q63Sql: String =
    """WITH b AS (
      |  SELECT vec_id, bucket
      |  FROM read_parquet('/tmp/graft_fixtures/srp_buckets/*.parquet')),
      |e AS (
      |  SELECT em.vec_id, em.embedding, b.bucket,
      |    sqrt(list_sum(list_transform(em.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings em JOIN b USING (vec_id)),
      |q AS (SELECT vec_id AS q_id, embedding AS qe, bucket, nrm AS qn FROM e WHERE vec_id < 10),
      |s AS (
      |  SELECT q.q_id, c.vec_id,
      |    list_sum(list_transform(list_zip(c.embedding, q.qe),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (c.nrm * q.qn) AS sim
      |  FROM e c JOIN q USING (bucket) WHERE c.vec_id >= 10),
      |r AS (
      |  SELECT q_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rk
      |  FROM s)
      |SELECT q_id, vec_id, rk, round(sim, 6) AS sim
      |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------- q98
  /** Hard-negative mining for contrastive training — for each anchor in
    * a query batch, the top-5 most-similar vectors whose LABEL DIFFERS
    * (the near-miss negatives that make embedding models learn; random
    * negatives are too easy). Exact shape: the anchor batch broadcasts
    * against one corpus scan — linear and embarrassingly parallel, the
    * right plan for a training-batch-sized anchor set at any corpus
    * size; when the anchor set itself is corpus-scale, the q63
    * bucket-equality candidates feed this same different-label gate.
    */
  val q98: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val anchors = emb(s, d).filter(col("vec_id") < 10L)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
        col("label").as("a_label"))
    emb(s, d).filter(col("vec_id") >= 10L)
      .crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("a_label"))
      .withColumn("sim", cosine_sim(col("embedding"), col("a_vec")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rk") <= 5)
      .select(col("a_id"), col("rk"), col("vec_id"), col("label"),
        round(col("sim"), 6).as("sim"))
      .orderBy("a_id", "rk")
  }

  val q98Sql: String =
    """WITH a AS (
      |  SELECT vec_id AS a_id, embedding AS ae, label AS a_label,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS an
      |  FROM embeddings WHERE vec_id < 10),
      |s AS (
      |  SELECT a.a_id, c.vec_id, c.label,
      |    list_sum(list_transform(list_zip(c.embedding, a.ae),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * a.an) AS sim
      |  FROM embeddings c, a
      |  WHERE c.vec_id >= 10 AND c.label <> a.a_label),
      |r AS (
      |  SELECT a_id, vec_id, label, sim,
      |    CAST(row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, vec_id) AS INT) AS rk
      |  FROM s)
      |SELECT a_id, rk, vec_id, label, round(sim, 6) AS sim
      |FROM r WHERE rk <= 5 ORDER BY a_id, rk""".stripMargin

  // ---------------------------------------------------------------- q104
  /** Triplet mining for metric learning — for each anchor: the nearest
    * SAME-label vector (hardest positive... of the easy kind), the
    * nearest DIFFERENT-label vector (hardest negative, q98's gate), and
    * the margin between them — the (anchor, positive, negative) rows a
    * triplet-loss trainer consumes, with the margin column telling the
    * curriculum which triplets are still informative (margin near zero =
    * hard triplet). One corpus scan against the broadcast anchor batch;
    * the two top-1 windows run over anchor-keyed candidates only.
    */
  val q104: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val anchors = emb(s, d).filter(col("vec_id") < 10L)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
        col("label").as("a_label"))
    val sims = emb(s, d).filter(col("vec_id") >= 10L)
      .crossJoin(broadcast(anchors))
      .withColumn("sim", cosine_sim(col("embedding"), col("a_vec")))
    val w = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("vec_id"))
    def top1(df: org.apache.spark.sql.DataFrame, idName: String, simName: String) =
      df.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("a_id"), col("vec_id").as(idName), col("sim").as(simName))
    val pos = top1(sims.filter(col("label") === col("a_label")), "pos_id", "pos_sim")
    val neg = top1(sims.filter(col("label") =!= col("a_label")), "neg_id", "neg_sim")
    pos.join(neg, "a_id")
      .select(col("a_id"), col("pos_id"), round(col("pos_sim"), 6).as("pos_sim"),
        col("neg_id"), round(col("neg_sim"), 6).as("neg_sim"),
        round(col("pos_sim") - col("neg_sim"), 6).as("margin"))
      .orderBy("a_id")
  }

  val q104Sql: String =
    """WITH a AS (
      |  SELECT vec_id AS a_id, embedding AS ae, label AS a_label,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS an
      |  FROM embeddings WHERE vec_id < 10),
      |s AS (
      |  SELECT a.a_id, a.a_label, c.vec_id, c.label,
      |    list_sum(list_transform(list_zip(c.embedding, a.ae),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * a.an) AS sim
      |  FROM embeddings c, a WHERE c.vec_id >= 10),
      |pos AS (
      |  SELECT a_id, vec_id AS pos_id, sim AS pos_sim
      |  FROM (SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, vec_id) AS rk
      |        FROM s WHERE label = a_label)
      |  WHERE rk = 1),
      |neg AS (
      |  SELECT a_id, vec_id AS neg_id, sim AS neg_sim
      |  FROM (SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, vec_id) AS rk
      |        FROM s WHERE label <> a_label)
      |  WHERE rk = 1)
      |SELECT a_id, pos_id, round(pos_sim, 6) AS pos_sim,
      |  neg_id, round(neg_sim, 6) AS neg_sim,
      |  round(pos_sim - neg_sim, 6) AS margin
      |FROM pos JOIN neg USING (a_id) ORDER BY a_id""".stripMargin

  // ---------------------------------------------------------------- q74
  /** IVF-PQ ANN (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011) — the memory-bounded ANN shape 100 TB actually
    * requires: q47's IVF coarse quantizer prunes the candidate set, and
    * within the probed cells distance comes from PRODUCT-QUANTIZED codes
    * (pqM sub-quantizers × pqK centroids; a vector is pqM small ints, here
    * 8×4 bits = 4 B — 64× smaller than the raw float[64]) via asymmetric
    * distance computation: the query builds one pqM×pqK lookup table of
    * exact subvector-to-centroid distances (model metadata), and each
    * candidate's approximate distance is pqM table lookups summed — no
    * float vector is touched at scan time. ADC ranks a shortlist only;
    * the top-k the user sees is an exact re-rank of that shortlist
    * (FAISS's refine stage) — on near-uniform corpora (like this
    * synthetic one, where pairwise distances concentrate tightly) raw
    * ADC ordering is noise-dominated, and the refine stage is what makes
    * the operator honest at any data distribution.
    *
    * Scale story: codes are computed once by a linear whole-stage-codegen
    * map (the `l2_sq` expression against literal centroids) and would be
    * materialized as a codes column next to the IVF cell partition key;
    * a query then reads 4 B/vector instead of 256 B, broadcast-free
    * (the LUT rides in the plan as a literal). Fit is q47's discipline: a
    * seeded bounded sample to the driver, deterministic Lloyd iterations
    * (`VectorMath.kMeansL2`), float-rounded centroids so plan literals,
    * the dumped fixture, and the oracle all see identical numbers.
    *
    * The oracle is end-to-end: from the `pq_codebooks` fixture alone,
    * DuckDB re-derives every vector's codes (argmin over centroid
    * distances), the query's LUT, the ADC sums (fixed subspace fold
    * order), the IVF probe filter, and the top-10 — so the gate checks
    * encode + LUT + ADC + probe, not just the final ordering.
    */
  private val pqM = 8
  private val pqK = 16
  private val pqSubDim = 8
  private val pqShortlist = 50

  private val pqMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Array[Array[Array[Float]]]]()

  /** Fitted codebooks: pqM × pqK × pqSubDim floats (deterministic). */
  private[graft] def pqFit(s: SparkSession, d: String): Array[Array[Array[Float]]] =
    DocOps.Memo.get(pqMemo, s, d) {
      val e = emb(s, d)
      val fitTarget = 100L * pqK
      val total = e.count()
      val sample = (if (total > fitTarget)
          e.select(col("embedding")).sample(withReplacement = false, fitTarget.toDouble / total, 42L)
        else e.select(col("embedding")))
        .collect().map(_.getSeq[Float](0).toArray)
      Array.tabulate(pqM) { j =>
        val sub = sample.map(v => v.slice(j * pqSubDim, (j + 1) * pqSubDim).map(_.toDouble))
        graft.core.VectorMath.kMeansL2(sub, pqK, iters = 8).map(_.map(_.toFloat))
      }
    }

  /** Codebooks as (sub, cid, centroid) — the Verify fixture parquet. */
  private[graft] def pqCodebookDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pqFit(s, d).zipWithIndex.toSeq.flatMap { case (cents, j) =>
      cents.zipWithIndex.map { case (c, i) => (j, i, c.toSeq) }
    }.toDF("sub", "cid", "centroid")
  }

  /** ADC distances for every probed candidate: (vec_id, cell, adist). */
  private[graft] def pqAdcAll(s: SparkSession, d: String): DataFrame = {
    import graft.functions.l2_sq
    val cb = pqFit(s, d)
    // query-side ADC lookup table: exact double distances, driver math
    // over the same floats the plan and the oracle see
    val qArr = emb(s, d).filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val lut: Array[Array[Double]] = Array.tabulate(pqM) { j =>
      Array.tabulate(pqK) { c =>
        var sum = 0.0; var i = 0
        while (i < pqSubDim) {
          val df = qArr(j * pqSubDim + i).toDouble - cb(j)(c)(i).toDouble
          sum += df * df; i += 1
        }
        sum
      }
    }
    // per-subspace code: argmin over codegen'd l2_sq against literal
    // centroids (lowest distance, lowest cid breaking exact ties)
    def codeCol(j: Int) = {
      val sub = slice(col("embedding"), j * pqSubDim + 1, pqSubDim)
      array_min(array(cb(j).zipWithIndex.toIndexedSeq.map { case (c, i) =>
        struct(l2_sq(sub, typedLit(c.toSeq)).as("d2"), lit(i).as("cid"))
      }: _*)).getField("cid")
    }
    // ADC: one LUT lookup per subspace, summed in fixed subspace order
    val withCodes = (0 until pqM).foldLeft(
      ivfAssigned(s, d).filter(col("vec_id") =!= 0L && col("probed"))) {
      case (df, j) => df.withColumn(s"c$j", codeCol(j))
    }
    val adist = (0 until pqM).map { j =>
      element_at(typedLit(lut(j).toSeq), col(s"c$j") + 1)
    }.reduce(_ + _)
    withCodes
      .withColumn("adist", adist)
      .select(col("vec_id"), col("cell"), col("adist"))
  }

  /** ADC shortlist (top-`pqShortlist` by approximate distance, a
    * TakeOrderedAndProject — never a global sort) then exact re-rank of
    * the shortlist against the original vectors — FAISS's IVFPQ+refine
    * shape. The shortlist is k-sized, so the re-rank join broadcasts and
    * touches `pqShortlist` float vectors total, regardless of corpus
    * size. Output distances are exact (same fold as the `l2_sq` kernel),
    * so they are hash-comparable unrounded.
    */
  val q74: Q = (s, d) => {
    import graft.functions.l2_sq
    val short = pqAdcAll(s, d)
      .orderBy(col("adist").asc, col("vec_id"))
      .limit(pqShortlist)
    short
      .join(emb(s, d).select(col("vec_id"), col("embedding")), "vec_id")
      .crossJoin(broadcast(queryVec(s, d)))
      .withColumn("d2", l2_sq(col("embedding"), col("q_vec")))
      .orderBy(col("d2").asc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("cell"), col("d2"))
  }

  val q74Sql: String = {
    // fixed-order fold over the pqM subspaces: each term is a single-row
    // sum, the chain associates left-to-right exactly like the plan's
    // `reduce(_ + _)`
    val adcSum = (0 until pqM)
      .map(j => s"sum(CASE WHEN c.sub = $j THEN q.d2 END)")
      .mkString("\n    + ")
    s"""WITH cb AS (
       |  SELECT sub, cid, centroid
       |  FROM read_parquet('/tmp/graft_fixtures/pq_codebooks/*.parquet')),
       |f AS (
       |  SELECT vec_id, cell, probed
       |  FROM read_parquet('/tmp/graft_fixtures/ivf_cells/*.parquet')),
       |subs AS (SELECT unnest(range(0, $pqM)) AS sub),
       |sv AS (
       |  SELECT e.vec_id, s.sub,
       |    e.embedding[s.sub*$pqSubDim+1 : s.sub*$pqSubDim+$pqSubDim] AS v
       |  FROM embeddings e CROSS JOIN subs s),
       |dist AS (
       |  SELECT sv.vec_id, sv.sub, cb.cid,
       |    list_sum(list_transform(list_zip(sv.v, cb.centroid),
       |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
       |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d2
       |  FROM sv JOIN cb USING (sub)),
       |codes AS (
       |  SELECT vec_id, sub, cid FROM (
       |    SELECT vec_id, sub, cid,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
       |    FROM dist)
       |  WHERE rn = 1),
       |qd AS (SELECT sub, cid, d2 FROM dist WHERE vec_id = 0),
       |adist AS (
       |  SELECT c.vec_id,
       |    $adcSum AS adist
       |  FROM codes c JOIN qd q ON c.sub = q.sub AND c.cid = q.cid
       |  GROUP BY c.vec_id),
       |short AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT a.vec_id, f.cell,
       |      row_number() OVER (ORDER BY a.adist, a.vec_id) AS rk
       |    FROM adist a JOIN f USING (vec_id)
       |    WHERE f.probed AND a.vec_id <> 0)
       |  WHERE rk <= $pqShortlist),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |rr AS (
       |  SELECT s.vec_id, s.cell,
       |    list_sum(list_transform(list_zip(e.embedding, (SELECT qe FROM q)),
       |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
       |         * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d2
       |  FROM short s JOIN embeddings e USING (vec_id))
       |SELECT vec_id, cell, d2 FROM rr
       |ORDER BY d2, vec_id LIMIT 10""".stripMargin
  }

  // --------------------------------------------------------------- q106
  /** Johnson-Lindenstrauss random-projection compression (q106) — the
    * embedding-compression step of large retrieval/dedup pipelines:
    * project 64-dim float embeddings to 16 dims with a deterministic
    * Rademacher (±1) matrix (signs from murmur3, so executors derive the
    * model from literals — nothing is exchanged), then audit distortion
    * on a deterministic systematic sample of pairs: squared L2 before vs
    * after, per-pair ratio (JL: concentrated around k/d·scaling = 1 with
    * the 1/√k normalization).
    *
    * 100 TB story: the projection is a stateless row-local map with the
    * matrix inlined in the plan — the same shape at any scale, and the
    * natural prelude to q29/q47 indexing on cheaper vectors. The audit
    * here strata-samples by id for oracle visibility; a production audit
    * fixes the sample COUNT (modulus ∝ n) so pair work is constant.
    *
    * Exactness: float elements are cast to double BEFORE arithmetic on
    * both engines (the l2_sq discipline); 1/√16 is the exact double 0.25
    * (written as /4.0); per-dimension sums may associate differently —
    * round(…, 6) absorbs it.
    */
  private[graft] val JlOutDims = 16
  private val JlInDims = 64

  private[graft] lazy val jlSigns: Array[Array[Double]] =
    Array.tabulate(JlOutDims, JlInDims) { (o, i) =>
      if (graft.core.Murmur3x64.hash(
        s"jl-$o-$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)) >= 0L) 1.0
      else -1.0
    }

  /** (o, i, sign) rows — the Verify fixture the oracle re-projects from. */
  private[graft] def jlSignsDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    jlSigns.zipWithIndex.flatMap { case (row, o) =>
      row.zipWithIndex.map { case (sg, i) => (o, i, sg) }
    }.toSeq.toDF("o", "i", "sign")
  }

  /** 16-dim projection of a float-array column: y_o = Σ_i x_i·s_oi / 4.0,
    * row-local (the sign matrix is a plan literal).
    */
  private def jlProject(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val signsLit = typedlit(jlSigns.map(_.toSeq).toSeq)
    transform(sequence(lit(0), lit(JlOutDims - 1)), o =>
      aggregate(
        zip_with(e, element_at(signsLit, o + 1), (x, sg) => x.cast("double") * sg),
        lit(0.0), (acc, v) => acc + v) / lit(4.0))
  }

  val q106: Q = (s, d) => {
    val a = emb(s, d).filter(col("vec_id") % 17 === 0)
      .select(col("vec_id").as("vec_a"), col("embedding").as("e_a"),
        jlProject(col("embedding")).as("p_a"))
    val b = emb(s, d).filter(col("vec_id") % 19 === 0)
      .select(col("vec_id").as("vec_b"), col("embedding").as("e_b"),
        jlProject(col("embedding")).as("p_b"))
    a.crossJoin(broadcast(b))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("d2_orig", graft.functions.l2_sq(col("e_a"), col("e_b")))
      .filter(col("d2_orig") > 0.0)
      .withColumn("d2_proj",
        aggregate(zip_with(col("p_a"), col("p_b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v))
      .select(col("vec_a"), col("vec_b"),
        round(col("d2_orig"), 6).as("d2_orig"),
        round(col("d2_proj"), 6).as("d2_proj"),
        round(col("d2_proj") / col("d2_orig"), 6).as("ratio"))
      .orderBy("vec_a", "vec_b")
  }

  val q106Sql: String =
    """WITH sgn AS MATERIALIZED (
      |  SELECT o, i, sign FROM read_parquet('/tmp/graft_fixtures/jl_signs/*.parquet')),
      |sel AS MATERIALIZED (
      |  SELECT vec_id, embedding FROM embeddings
      |  WHERE vec_id % 17 = 0 OR vec_id % 19 = 0),
      |proj AS MATERIALIZED (
      |  SELECT e.vec_id, s.o,
      |    sum(CAST(e.embedding[s.i + 1] AS DOUBLE) * s.sign) / 4.0 AS y
      |  FROM sel e CROSS JOIN sgn s
      |  GROUP BY 1, 2),
      |pairs AS MATERIALIZED (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) *
      |           (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d2_orig
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id % 17 = 0 AND b.vec_id % 19 = 0 AND a.vec_id < b.vec_id),
      |d2p AS MATERIALIZED (
      |  SELECT p.vec_a, p.vec_b, sum((pa.y - pb.y) * (pa.y - pb.y)) AS d2_proj
      |  FROM pairs p
      |  JOIN proj pa ON pa.vec_id = p.vec_a
      |  JOIN proj pb ON pb.vec_id = p.vec_b AND pb.o = pa.o
      |  GROUP BY 1, 2)
      |SELECT p.vec_a, p.vec_b, round(p.d2_orig, 6) AS d2_orig,
      |  round(d.d2_proj, 6) AS d2_proj,
      |  round(d.d2_proj / p.d2_orig, 6) AS ratio
      |FROM pairs p JOIN d2p d USING (vec_a, vec_b)
      |WHERE p.d2_orig > 0.0
      |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------- q108
  /** Distributed Lloyd's k-means over the embedding corpus — the
    * topic-clustering stage of corpus curation (cluster-then-balance, as
    * in SemDedup's pre-step or DataComp's clustering filters; q47/q61's
    * quantizer trains driver-side on a SAMPLE, this is the full-corpus
    * counterpart for when the clustering itself is the product).
    *
    * Shape (the 100 TB story): centroids are K×64 doubles of driver
    * metadata. Each iteration is ONE corpus pass — assignment is a
    * row-local argmin over broadcast literal centroids (no join, no
    * shuffle of vectors), and the update is one map-side-combined
    * aggregation to K×64 (cell, dim) keys. K iterations = K linear
    * scans; the final labeling is a stateless map. Nothing driver-side
    * ever holds more than the model — the classic scalable k-means loop
    * (MLlib's KMeans does the same passes; this one is pure DataFrame
    * ops so the whole pipeline stays in one engine).
    *
    * Exactness vs the oracle: DuckDB replays the identical iterations as
    * unrolled CTEs from the raw embeddings — same init (first K vectors
    * by vec_id), same in-order per-dim distance fold (list_sum ≙ the
    * aggregate() fold), same first-min-index tie-break, same sum/count
    * mean, same empty-cell carry-forward. Per-(cell,dim) member sums may
    * associate differently between engines — ulp-level drift the
    * round(dist, 6) output absorbs (an argmin flip would need two cells
    * within ~1e-12, which the synthetic corpus never produces).
    */
  private val KmK = 8
  private val KmIters = 4

  /** Row-local squared-L2 distances to each broadcast centroid, in-order
    * per-dim fold (matches the oracle's list_sum association).
    */
  private[graft] def kmDists(cents: Array[Array[Double]]): org.apache.spark.sql.Column =
    transform(
      typedlit(cents.map(_.toSeq).toSeq),
      c => aggregate(
        zip_with(col("embedding"), c,
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, x) => acc + x))

  // memoized across q108/q114 (the q99/q100 discipline): the clustering
  // trains once per (session, scale); consumers pay only their own pass
  private val kmMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Array[Array[Double]]]

  private[graft] def kmeansCentroids(s: SparkSession, d: String): Array[Array[Double]] =
    DocOps.Memo.get(kmMemo, s, d) { kmeansFit(s, d) }

  /** The memoized q108 centroids as a (cell, dim, val) frame — the Verify
    * fixture shape q145's oracle re-derives assignments and silhouettes
    * from (K×64 rows: model metadata, not corpus data).
    */
  private[graft] def kmCentroidsDf(s: SparkSession, d: String): DataFrame = {
    val cents = kmeansCentroids(s, d)
    import s.implicits._
    (for { c <- cents.indices; dim <- cents(c).indices }
      yield (c, dim, cents(c)(dim))).toDF("cell", "dim", "val")
  }

  private def kmeansFit(s: SparkSession, d: String): Array[Array[Double]] = {
    // deterministic init: the first K vectors by vec_id (k-means++ at
    // scale would be a few more passes; init choice is not what this
    // operator demonstrates and determinism is what the oracle needs)
    var cents: Array[Array[Double]] = emb(s, d)
      .filter(col("vec_id") < KmK).orderBy("vec_id")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for (_ <- 1 to KmIters) {
      val dists = kmDists(cents)
      val cell = (array_position(dists, array_min(dists)) - 1L).cast("int")
      // one pass: K×64 (cell, dim) running sums, map-side combined
      val sums = emb(s, d)
        .withColumn("cell", cell)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone()) // empty cells keep their centroid
      sums.foreach { r =>
        val c = r.getInt(0); val dim = r.getInt(1)
        next(c)(dim) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  val q108: Q = (s, d) => {
    val cents = kmeansCentroids(s, d)
    val dists = kmDists(cents)
    emb(s, d)
      .withColumn("cell", (array_position(dists, array_min(dists)) - 1L).cast("int"))
      .withColumn("dist", round(array_min(dists), 6))
      .select(col("vec_id"), col("cell"), col("dist"))
      .orderBy("vec_id")
  }

  /** Unrolled Lloyd's-iteration CTE chain ending in `a$KmIters`
    * (vec_id, cell, dist) — shared by q108 and q114's oracle.
    */
  private val kmeansSqlCtes: String = {
    // cl<k> = centroid lists, a<k> = argmin assignment (dist, cell)
    // order = first-min-index, cent<k+1> = sum/count means with
    // empty-cell carry-forward
    def centLists(k: Int) =
      s"cl$k AS MATERIALIZED (SELECT cell, list(val ORDER BY dim) AS cvec FROM cent$k GROUP BY cell)"
    def assign(k: Int) =
      s"""d$k AS MATERIALIZED (
         |  SELECT e.vec_id, c.cell,
         |    list_sum(list_transform(list_zip(e.embedding, c.cvec),
         |      p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))) AS dist
         |  FROM embeddings e CROSS JOIN cl$k c),
         |a$k AS MATERIALIZED (
         |  SELECT vec_id, cell, dist FROM (
         |    SELECT vec_id, cell, dist,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |    FROM d$k) WHERE rn = 1)""".stripMargin
    def update(k: Int) =
      s"""cent${k + 1} AS MATERIALIZED (
         |  SELECT c.cell, c.dim,
         |    CASE WHEN m.s IS NULL THEN c.val ELSE m.s / m.n END AS val
         |  FROM cent$k c LEFT JOIN (
         |    SELECT a.cell, t.i AS dim,
         |      sum(CAST(e.embedding[t.i] AS DOUBLE)) AS s, count(*) AS n
         |    FROM a$k a JOIN embeddings e USING (vec_id),
         |      generate_series(1, 64) t(i)
         |    GROUP BY 1, 2) m ON m.cell = c.cell AND m.dim = c.dim)""".stripMargin
    val iters = (0 until KmIters).map { k =>
      s"${centLists(k)},\n${assign(k)},\n${update(k)}"
    }.mkString(",\n")
    s"""cent0 AS MATERIALIZED (
       |  SELECT CAST(vec_id AS INT) AS cell, t.i AS dim,
       |    CAST(embedding[t.i] AS DOUBLE) AS val
       |  FROM embeddings, generate_series(1, 64) t(i)
       |  WHERE vec_id < $KmK),
       |$iters,
       |${centLists(KmIters)},
       |${assign(KmIters)}""".stripMargin
  }

  val q108Sql: String =
    s"""WITH $kmeansSqlCtes
       |SELECT vec_id, CAST(cell AS INT) AS cell, round(dist, 6) AS dist
       |FROM a$KmIters ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q110
  /** Int8 scalar quantization of the embedding corpus with a per-vector
    * reconstruction audit — the storage-compression step between raw
    * floats (4 B/dim) and q74's product quantization (0.5 bit/dim):
    * per-dimension affine codes `round((x-min)/(max-min)*255)` give 4×
    * compression with near-lossless distances (FAISS's SQ8; the common
    * default for billion-vector serving tiers).
    *
    * Shape (the 100 TB story): the quantizer is 64 (min, max) pairs of
    * driver metadata from ONE map-side-combined aggregation (min/max are
    * order-independent — exact regardless of partitioning); encode +
    * audit is then a single stateless row-local pass over broadcast
    * literal stats. Nothing shuffles the vectors.
    *
    * Exactness vs the oracle: codes match bit-exactly (same double
    * expression tree, floor is exact); the per-vector error fold is
    * in-order on both sides, and round(…, 9) absorbs the ulp-level
    * association drift of DuckDB's group-sum order.
    */
  private val SqDims = 64

  val q110: Q = (s, d) => {
    val stats = emb(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v").cast("double")).as("lo"), max(col("v").cast("double")).as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val lo = (0 until SqDims).map(stats(_)._1)
    val sp = (0 until SqDims).map(i => stats(i)._2 - stats(i)._1)
    val loL = typedlit(lo); val spL = typedlit(sp)
    // per-dim squared reconstruction error, row-local over literal stats
    val errs = transform(sequence(lit(0), lit(SqDims - 1)), i => {
      val x = element_at(col("embedding"), i + 1).cast("double")
      val l = element_at(loL, i + 1)
      val w = element_at(spL, i + 1)
      val code = when(w === 0.0, lit(0.0))
        .otherwise(least(greatest(floor((x - l) / w * 255.0 + 0.5).cast("double"), lit(0.0)), lit(255.0)))
      val xe = l + code / 255.0 * w
      (x - xe) * (x - xe)
    })
    emb(s, d)
      .select(col("vec_id"),
        round(aggregate(errs, lit(0.0), (acc, x) => acc + x) / SqDims, 9).as("mse"),
        round(sqrt(array_max(errs)), 9).as("linf"))
      .orderBy("vec_id")
  }

  val q110Sql: String =
    s"""WITH st AS MATERIALIZED (
       |  SELECT t.i AS dim,
       |    min(CAST(embedding[t.i] AS DOUBLE)) AS lo,
       |    max(CAST(embedding[t.i] AS DOUBLE)) AS hi
       |  FROM embeddings, generate_series(1, $SqDims) t(i)
       |  GROUP BY 1),
       |e AS (
       |  SELECT vec_id, t.i AS dim, CAST(embedding[t.i] AS DOUBLE) AS x
       |  FROM embeddings, generate_series(1, $SqDims) t(i)),
       |q AS (
       |  SELECT e.vec_id, e.dim, e.x, s.lo, s.hi - s.lo AS sp,
       |    CASE WHEN s.hi - s.lo = 0 THEN 0.0
       |         ELSE least(greatest(floor((e.x - s.lo) / (s.hi - s.lo) * 255.0 + 0.5), 0.0), 255.0)
       |    END AS code
       |  FROM e JOIN st s ON s.dim = e.dim),
       |r AS (
       |  SELECT vec_id, x - (lo + code / 255.0 * sp) AS err FROM q)
       |SELECT vec_id, round(sum(err * err) / $SqDims, 9) AS mse,
       |  round(sqrt(max(err * err)), 9) AS linf
       |FROM r GROUP BY 1 ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q114
  /** Cluster-balanced corpus selection — the balancing step after q108's
    * clustering (DataComp/SemDedup keep corpora from collapsing onto the
    * dominant cluster): cap every topic cluster at the CapPerCell
    * highest-quality documents (q23's composite score; doc_id ≙ vec_id
    * is the fixture pairing). The training is paid ONCE — centroids are
    * memoized across q108/q114 (the q99/q100 discipline).
    *
    * Shape: assignment is the same row-local argmin over broadcast
    * literals; the quality join shuffles (doc_id, score) pairs — never
    * text or vectors — and the per-cluster top-M window partitions by
    * cell, so parallelism scales with K and no global sort exists.
    */
  private val CapPerCell = 25

  val q114: Q = (s, d) => {
    val dists = kmDists(kmeansCentroids(s, d))
    val cells = emb(s, d).select(
      col("vec_id").as("doc_id"),
      (array_position(dists, array_min(dists)) - 1L).cast("int").as("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cell")).orderBy(col("score").desc, col("doc_id"))
    cells.join(DocOps.qualityScores(s, d), "doc_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= CapPerCell)
      .select(col("cell"), col("rank"), col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy("cell", "rank")
  }

  val q114Sql: String =
    s"""WITH $kmeansSqlCtes,
       |${DocOps.qualityScoreSqlCte},
       |j AS (
       |  SELECT a.vec_id AS doc_id, a.cell, q.score
       |  FROM a$KmIters a JOIN qscore q ON q.doc_id = a.vec_id),
       |r AS (
       |  SELECT cell, doc_id, score,
       |    CAST(row_number() OVER (PARTITION BY cell ORDER BY score DESC, doc_id) AS INT) AS rank
       |  FROM j)
       |SELECT CAST(cell AS INT) AS cell, rank, doc_id, round(score, 6) AS score
       |FROM r WHERE rank <= $CapPerCell ORDER BY cell, rank""".stripMargin

  // ---------------------------------------------------------------- q119
  /** Per-dimension embedding health audit — the pre-indexing check a
    * vector platform runs before building ANN structures: mean, std,
    * min, max, and zero fraction per dimension. Dead dimensions
    * (std ≈ 0), exploded ranges, and all-zero columns each break
    * quantizers (q110's per-dim affine codes degenerate, q74's PQ
    * sub-codebooks collapse) and are cheap to catch here.
    *
    * Shape: one posexplode to (dim, value) and one map-side-combined
    * aggregation to 64 rows — linear, no joins, the audit table IS the
    * output. Same moment formula on both engines; per-dim sums may
    * associate differently — ulp drift the round(…, 6) absorbs (min/max
    * and the zero count are order-independent exact).
    */
  val q119: Q = (s, d) =>
    emb(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v", col("v").cast("double"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"),
        min(col("v")).as("mn"),
        max(col("v")).as("mx"),
        sum(when(col("v") === 0.0, 1L).otherwise(0L)).as("zeros"))
      .select(col("dim"),
        round(col("s1") / col("n"), 6).as("mean"),
        round(sqrt(greatest((col("s2") - col("s1") * col("s1") / col("n")) / col("n"), lit(0.0))), 6).as("std"),
        round(col("mn"), 6).as("min_v"),
        round(col("mx"), 6).as("max_v"),
        round(col("zeros").cast("double") / col("n"), 6).as("zero_frac"))
      .orderBy("dim")

  val q119Sql: String =
    """WITH e AS (
      |  SELECT t.i - 1 AS dim, CAST(embedding[t.i] AS DOUBLE) AS v
      |  FROM embeddings, generate_series(1, 64) t(i)),
      |a AS (
      |  SELECT dim, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2,
      |    min(v) AS mn, max(v) AS mx,
      |    sum(CASE WHEN v = 0.0 THEN 1 ELSE 0 END) AS zeros
      |  FROM e GROUP BY 1)
      |SELECT CAST(dim AS INT) AS dim,
      |  round(s1 / n, 6) AS mean,
      |  round(sqrt(greatest((s2 - s1 * s1 / n) / n, 0.0)), 6) AS std,
      |  round(mn, 6) AS min_v, round(mx, 6) AS max_v,
      |  round(CAST(zeros AS DOUBLE) / n, 6) AS zero_frac
      |FROM a ORDER BY dim""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q27_embed_knn", q27, Some(q27Sql)),
    ("q28_embed_neardup", q28, Some(q28Sql)),
    ("q29_ann_lsh", q29, Some(q29Sql)),
    ("q47_ann_ivf", q47, Some(q47Sql)),
    ("q61_semdedup", q61, Some(q61Sql)),
    ("q63_batch_ann", q63, Some(q63Sql)),
    ("q74_ann_ivfpq", q74, Some(q74Sql)),
    ("q98_hard_negatives", q98, Some(q98Sql)),
    ("q104_triplet_mining", q104, Some(q104Sql)),
    ("q106_jl_projection", q106, Some(q106Sql)),
    ("q108_kmeans_topics", q108, Some(q108Sql)),
    ("q110_int8_quant", q110, Some(q110Sql)),
    ("q114_cluster_balance", q114, Some(q114Sql)),
    ("q119_embedding_health", q119, Some(q119Sql))
  )
}
