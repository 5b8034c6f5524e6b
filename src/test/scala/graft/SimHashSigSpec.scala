package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{murmur3_token, simhash_sig}
import graft.operators.SimHashAgg

/** Parity proof for the codegen'd `simhash_sig` expression: bit-identical
  * to SimHashAgg over the exploded `murmur3_token(word)` stream of
  * `split(lower(text), " ")` — q21's banding and hamming arithmetic run
  * on these signatures, and the Verify fixture the DuckDB oracle consumes
  * is dumped from the same path.
  */
class SimHashSigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("simhash-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("expression equals aggregator over the same word streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Vector("Spark", "table", "row", "KEY", "scan", "the", "a")
    val texts = (1L to 60L).map { id =>
      // repeated words + double spaces + empties exercise the full split
      id -> Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    } :+ (61L -> "solo")
    val df = texts.toDF("id", "text")

    val viaExpr = df.select(col("id"), simhash_sig(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val agg = udaf(new SimHashAgg, Encoders.scalaLong)
    val viaAgg = df
      .select(col("id"), explode(split(lower(col("text")), " ")).as("word"))
      .withColumn("h", murmur3_token(col("word")))
      .groupBy(col("id")).agg(agg(col("h")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(viaExpr.keySet == viaAgg.keySet)
    viaExpr.foreach { case (id, s) => assert(s == viaAgg(id), s"id $id") }
  }

  test("similar texts land within hamming 3, dissimilar far; SQL works") {
    functions.registerAll(spark)
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a.replace("today", "tomorrow")
    val got = Seq((1L, a), (2L, b)).toDF("id", "text")
      .createOrReplaceTempView("simhash_t")
    val sigs = spark.sql("SELECT simhash_sig(text) AS s FROM simhash_t ORDER BY 1")
      .collect().map(_.getLong(0))
    val hamming = java.lang.Long.bitCount(sigs(0) ^ sigs(1))
    assert(hamming <= 16, s"near-dup texts should be close, hamming=$hamming")
  }
}
