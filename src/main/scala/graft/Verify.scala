package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Graft.session("graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }

    dumpFixtures(spark, sfDir)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    spark.stop()
  }

  /** Fixtures for the hash/model-dependent oracles (q17/q25/…): murmur3
    * is deterministic (checked against the reference's vectors in
    * Murmur3Spec) but not SQL-expressible; dumping the token map lets
    * the DuckDB oracle verify everything downstream of the hash (ring
    * placement arithmetic, normalization, joins, aggregation). The SQL
    * references this fixed absolute path — fixtures are SCALE-SPECIFIC,
    * so a gate run at one sf needs the fixtures dumped at that sf
    * (`graft.tools.Fixtures <sfDir>` refreshes them without re-running
    * all queries).
    */
  private[graft] def dumpFixtures(spark: SparkSession, sfDir: String): Unit = {
    {
      import org.apache.spark.sql.functions._
      import graft.functions.murmur3_token
      val fixDir = "/tmp/graft_fixtures"
      // each dump guarded like the query loop above: one broken fixture
      // must fail only ITS oracle, not abort Verify before oracle_sql.json
      // is written (which would zero the whole round's correctness signal)
      def dump(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
        try df.coalesce(1).write.mode("overwrite").parquet(s"$fixDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] fixture $name failed: ${e.getMessage}")
        }
      dump("token_map") {
        Graft.events(spark, sfDir).select(col("user_id")).distinct()
          .withColumn("token", murmur3_token(col("user_id").cast("string")))
      }
      // q102: ring placement of each produced key (key = event_id string;
      // default 3-broker x 4-range scratch ring) — the oracle re-derives
      // every offset relationally from it
      dump("event_parts") {
        Graft.events(spark, sfDir).select(col("event_id")).distinct()
          .withColumn("part", graft.functions.ring_partition(
            murmur3_token(col("event_id").cast("string")), 3, 4))
      }
      dump("doc_fingerprints") {
        Graft.table(spark, sfDir, "documents")
          .select(regexp_replace(lower(col("text")), "\\s+", " ").as("norm")).distinct()
          .withColumn("fingerprint", murmur3_token(col("norm")))
      }
      // distinct: (l_orderkey, l_linenumber) repeats in the synthetic
      // lineitem, and the oracle JOIN must stay 1:1 per lineitem row
      dump("lineitem_tokens") {
        Graft.table(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            murmur3_token(concat_ws("-", col("l_orderkey"), col("l_linenumber"))).as("token"))
          .distinct()
      }
      // q21: per-doc simhash signature — the oracle re-derives banding,
      // candidate join, hamming distance, and threshold from it
      dump("doc_simhash")(operators.DocOps.simhashSigs(spark, sfDir))
      // q131: per-doc 64-perm minhash signature — the oracle re-derives
      // the per-pair agreement count (estimator honesty) from it
      dump("doc_minhash") {
        operators.DocOps.docSignatures(Graft.table(spark, sfDir, "documents"))
          .select(col("doc_id"), col("sig"))
      }
      // q29: per-vector LSH bucket — the oracle re-derives the
      // bucket-equality search + exact cosine rerank
      dump("srp_buckets") {
        operators.EmbeddingOps.srpSigned(spark, sfDir).select(col("vec_id"), col("bucket"))
      }
      // q47: per-vector IVF cell + probed flag — the oracle re-derives
      // the probe filter + exact top-10 rerank
      dump("ivf_cells") {
        operators.EmbeddingOps.ivfAssigned(spark, sfDir)
          .select(col("vec_id"), col("cell"), col("probed"))
      }
      // q74: the PQ codebooks — the oracle re-derives every vector's
      // codes, the query LUT, the ADC sums and the probe filter from them
      dump("pq_codebooks")(operators.EmbeddingOps.pqCodebookDf(spark, sfDir))
      // q62: per-doc-per-occurrence hashed bigram buckets — the oracle
      // rebuilds the whole DSIR pipeline from them (bucket counts,
      // smoothing, log-ratios, per-doc sums, top-k)
      dump("dsir_grams") {
        operators.DocOps.dsirGrams(spark, sfDir)
          .select(col("doc_id"), col("bucket"))
      }
      // q86: positional 8-token window hashes — the oracle re-derives the
      // df gate, the gram-equality join, and the run-length pass
      dump("substr_grams")(operators.StatsOps.posGrams(spark, sfDir))
      // q88: per-doc murmur3 token — the oracle re-derives the uniform
      // draw, the priorities, the top-k cut, and the tau estimator
      dump("doc_tokens")(operators.StatsOps.docTokens(spark, sfDir))
      // q89: per-user CMS (row, bucket) cells — the oracle rebuilds the
      // sketch counters from events and re-probes min-over-rows
      dump("cms_buckets")(operators.StatsOps.cmsBuckets(spark, sfDir))
      // q43: the sketch estimates — the oracle computes the exact values
      // itself and re-derives the accuracy flags. MUST be the same
      // aggregation plan q43 runs (approx sketches are merge-order
      // sensitive), hence the shared function.
      dump("sketch_vals")(operators.Advanced.sketchVals(spark, sfDir))
      // q105: per-doc distinct hashed-unigram feature buckets — the
      // oracle replays the full logistic-regression training loop
      // (centering, balanced errors, momentum) from them as unrolled CTEs
      dump("clf_grams")(operators.ClassifierOps.clfGrams(spark, sfDir))
      // q106: the deterministic Rademacher projection matrix — the oracle
      // re-projects every sampled vector from it
      dump("jl_signs")(operators.EmbeddingOps.jlSignsDf(spark, sfDir))
      // q142: the distinct alphabetic vocabulary's murmur3 token map —
      // the oracle re-derives both sketches (bottom-k, union-k) and the
      // exact Jaccard from it
      dump("vocab_tokens") {
        Graft.table(spark, sfDir, "documents")
          .select(explode(split(lower(col("text")), " ")).as("w"))
          .where(col("w").rlike("^[a-z]+$")).distinct()
          .withColumn("token", murmur3_token(col("w")))
      }
      // q145: the memoized q108 k-means centroids (K×64 rows) — the
      // oracle re-derives assignments and silhouettes from them
      dump("km_cents")(operators.EmbeddingOps.kmCentroidsDf(spark, sfDir))
      // q225–q228: the trained classifier's per-doc label + micro-unit
      // probability — the calibration oracles bin/rank the stored
      // integers (exp can't be replayed bit-exactly across engines)
      dump("clf_scores")(operators.ClassifierOps.scoredMicro(spark, sfDir))
      // q229–q232: the driver-trained leading principal component
      // (dim, v, mu) — the oracle reads the literals (a recomputed mu
      // could differ in the last ulp and flip a micro rounding)
      dump("pca_vec")(operators.SpectralOps.pcaVecDf(spark, sfDir))
    }
  }

  /** The oracle map as a JSON object (also dumped standalone by
    * `SqlDump --json` for single-query oracle iteration). String escape
    * covers backslash, quote, and ALL control chars (<0x20) — a tab or
    * CR in builder-authored SQL would otherwise make the driver's
    * json.load fail and silently zero the round's correctness.
    */
  private[graft] def oracleJson: String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  }
}
