package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge-learning invariants on a hand-computed toy corpus, plus the
  * greedy-leftmost property of the wrapped-encoding replace (the exact
  * value parity with DuckDB at sf0.01/sf0.1 is verify_local.py's job).
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("bpe-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Write a toy documents table and return its directory. */
  private def toyCorpus(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("bpe-toy").toString
    val s = spark
    import s.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("learned merges match the hand-computed BPE sequence") {
    // corpus: banana x3, bandana x2 (one word per doc keeps counts obvious)
    val d = toyCorpus(Seq("banana", "banana", "banana", "bandana", "bandana"))
    val m = operators.BpeOps.learnMerges(spark, d)
    // pair counts: (a,n)=10 (n,a)=8 (b,a)=5 (n,d)=2 (d,a)=2
    assert(m(0)._2 == "a" && m(0)._3 == "n" && m(0)._5 == 10L)
    // after an: (b,an)=5 (an,a)=5 tie -> lhs tiebreak picks (an,a)
    assert(m(1)._2 == "an" && m(1)._3 == "a" && m(1)._5 == 5L)
    assert(m(2)._2 == "b" && m(2)._3 == "an" && m(2)._5 == 5L)
  }

  test("wrapped-encoding replace applies merges greedy-leftmost on runs") {
    // aaaa under merge (a,a): greedy BPE gives [aa, aa] (never [a, aa, a]);
    // the wrapped form shares no characters between adjacent matches, so
    // replace-all IS the greedy application
    val d = toyCorpus(Seq("aaaa"))
    val m = operators.BpeOps.learnMerges(spark, d)
    assert(m(0)._2 == "a" && m(0)._3 == "a" && m(0)._5 == 3L)
    // second merge sees the two merged symbols adjacent: (aa, aa)
    assert(m(1)._2 == "aa" && m(1)._3 == "aa" && m(1)._5 == 1L)
  }

  test("driver-side and distributed merge loops learn identical rules") {
    // the driver path (vocab fits DriverVocabMax) must equal the
    // distributed fallback rule-for-rule: same pair counts, same argmax
    // tiebreak, same left-to-right non-overlapping application
    val sf = "/root/testdata/sf0.001"
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val counts = Graft.table(spark, sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .where(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val driver = operators.BpeOps.learnMergesDriver(counts.as[(String, Long)].collect())
    val dist = operators.BpeOps.learnMergesDistributed(spark, counts)
    assert(driver == dist, s"driver=$driver\ndist=$dist")
  }

  test("q100 reports non-negative compression against q99's merges") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q100_bpe_encode")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val before = r.getAs[Long]("symbols_before")
      val after = r.getAs[Long]("symbols_after")
      val bp = r.getAs[Long]("compression_bp")
      assert(after <= before, "merging can only shorten symbol sequences")
      assert(bp == (before - after) * 10000 / before)
    }
  }
}
