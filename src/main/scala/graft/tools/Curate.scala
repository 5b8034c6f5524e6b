package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.{Graft, SparkEntry}

/** End-to-end corpus curation driver — the full pipeline a training-data
  * team runs, composed from the library's own operators and materialized
  * as a sharded corpus + manifest:
  *
  *   raw documents
  *     → near-dup canonical selection + language/quality gates (q51)
  *     → deterministic seeded split/shard assignment (q60)
  *     → sharded parquet corpus partitioned by split=/shard=
  *     → per-shard manifest (doc/char counts) + drop accounting
  *
  * ```
  * sbt "runMain graft.tools.Curate /root/testdata/sf0.001 /tmp/curated"
  * ```
  *
  * Scale notes: the only corpus-sized joins are doc_id equi-joins of the
  * gate verdict and the split assignment back onto the document table
  * (the expensive near-dup pair derivation inside q51 is the memoized
  * LSH path, paid once); the write is one dynamic-partition parquet job
  * whose parallelism follows the split/shard partitioning, and the
  * manifest is a (split, shard)-sized aggregation. Nothing driver-side
  * holds more than the manifest.
  */
object Curate {
  /** Runs the pipeline; returns (kept docs, dropped docs). Factored out
    * of main so CurateSpec drives the real artifact end-to-end.
    */
  def run(spark: org.apache.spark.sql.SparkSession, sfDir: String, outDir: String): (Long, Long) = {
    graft.functions.registerAll(spark)
    val docs = Graft.table(spark, sfDir, "documents")

    // gate verdict: near-dup cluster representatives passing lang+quality
    val kept = SparkEntry.queries("q51_corpus_filter")(spark, sfDir)
      .select(col("doc_id"), col("score"))
    // reproducible split/shard assignment
    val splits = SparkEntry.queries("q60_shard_shuffle")(spark, sfDir)
      .select(col("doc_id"), col("split"), col("shard"))

    val curated = docs
      .join(kept, "doc_id")
      .join(splits, "doc_id")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("score"), col("split"), col("shard"))

    curated.write.mode(SaveMode.Overwrite)
      .partitionBy("split", "shard")
      .parquet(s"$outDir/corpus")

    // manifest off the WRITTEN corpus (not the plan): what shipped is
    // what is counted
    val written = spark.read.parquet(s"$outDir/corpus")
    val manifest = written
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy("split", "shard")
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/manifest")

    val total = docs.count()
    val keptN = written.count()
    (keptN, total - keptN)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Graft.session("graft-curate")
    val (keptN, droppedN) = run(spark, sfDir, outDir)
    println(s"""{"kept":$keptN,"dropped":$droppedN,"out":"$outDir"}""")
    spark.stop()
  }
}
