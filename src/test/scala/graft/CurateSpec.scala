package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end spec for the curation driver: the written corpus must be
  * the gate's verdict exactly, contain no verified near-dup pair, carry a
  * consistent manifest, and reproduce bit-identically on a re-run (the
  * property that makes a curation job restartable).
  */
class CurateSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("curate-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("curate writes the gated corpus with a consistent manifest, no near-dup pairs, reproducibly") {
    val out = Files.createTempDirectory("graft-curate").toString
    val (kept, dropped) = tools.Curate.run(spark, sf, out)
    val total = Graft.table(spark, sf, "documents").count()

    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() == kept)

    // exactly the gate's verdict — no more, no less
    val expected = SparkEntry.queries("q51_corpus_filter")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, "written corpus must equal the q51 verdict")
    // drop accounting against INDEPENDENT derivations (not run()'s own
    // arithmetic): the verdict size and the spec's own file scan
    assert(kept == expected.size.toLong, "reported kept drifts from the verdict")
    assert(dropped == total - expected.size, "reported dropped drifts from the verdict")

    // dedup promise: no verified near-dup pair survives into the corpus
    SparkEntry.queries("q19_dedup_jaccard")(spark, sf).collect().foreach { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      assert(!(got.contains(a) && got.contains(b)),
        s"near-dup pair ($a, $b) both present in the curated corpus")
    }

    // manifest matches the written files
    val manifest = spark.read.parquet(s"$out/manifest")
    val mDocs = manifest.agg(sum(col("n_docs"))).head().getLong(0)
    assert(mDocs == kept, "manifest doc counts must sum to the corpus size")
    val perShard = corpus.groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    manifest.collect().foreach { r =>
      val key = (r.getAs[String]("split"), r.getAs[Int]("shard"))
      assert(perShard(key) == r.getAs[Long]("n_docs"), s"manifest row $key drifts")
    }

    // deterministic: a re-run into a fresh dir writes the identical corpus
    val out2 = Files.createTempDirectory("graft-curate2").toString
    tools.Curate.run(spark, sf, out2)
    val again = spark.read.parquet(s"$out2/corpus")
      .select("doc_id", "split", "shard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val first = corpus.select("doc_id", "split", "shard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(again == first, "curation must be reproducible run-to-run")
  }
}
