package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{minhash_sig, murmur3_token}
import graft.operators.MinHashAgg

/** Parity proof for the codegen'd `minhash_sig` expression: it must be
  * bit-identical to the MinHashAgg aggregator (and the shared
  * core.MinHash math) over the same element set — q20's signatures and
  * the streaming gate's signatures come from the two different paths and
  * must band identically.
  */
class MinHashSigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("minhash-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("expression equals aggregator over the same element sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = (1L to 50L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(40))(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString).distinct
    }
    val df = data.toDF("id", "els")

    val viaExpr = df
      .select(col("id"),
        minhash_sig(transform(col("els"), e => murmur3_token(e)), 64, 42L).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    val agg = udaf(new MinHashAgg(64, seed = 42L), Encoders.scalaLong)
    val viaAgg = df
      .select(col("id"), explode(col("els")).as("e"))
      .withColumn("h", murmur3_token(col("e")))
      .groupBy(col("id")).agg(agg(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    assert(viaExpr.keySet == viaAgg.keySet)
    viaExpr.foreach { case (id, sig) => assert(sig == viaAgg(id), s"id $id") }
  }

  test("expression matches the shared core math and handles the empty set") {
    import spark.implicits._
    val els = Seq("alpha", "beta", "gamma")
    val hashes = els.map(e => core.Murmur3x64.hash(e.getBytes("UTF-8"))).toArray
    val expected = core.MinHash.signature(hashes, 64, 42L).toSeq

    val got = Seq((1L, els), (2L, Seq.empty[String])).toDF("id", "els")
      .select(col("id"),
        minhash_sig(transform(col("els"), e => murmur3_token(e)), 64, 42L).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    assert(got(1L) == expected)
    assert(got(2L) == Seq.fill(64)(Long.MaxValue)) // aggregator zero buffer
  }
}
