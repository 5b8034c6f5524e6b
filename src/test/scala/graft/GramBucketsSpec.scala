package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{gram_buckets, murmur3_token}

/** Parity proof for the codegen'd `gram_buckets` expression: every gram
  * OCCURRENCE (duplicates kept, position order) must bucket to
  * `pmod(murmur3_token(gram_string), B)` of the built-in sliding-window
  * composition — q62's importance weights and the DuckDB oracle's count
  * tables both sum per occurrence off these buckets.
  */
class GramBucketsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("grambuckets-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("expression equals pmod(murmur3) of the built-in sliding window") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Vector("spark", "table", "Row", "KEY", "scan", "", "düne", "x")
    val texts = (1L to 60L).map { id =>
      id -> Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ (61L -> "one two") :+ (62L -> "") :+ (63L -> "a b a b a b")
    val df = texts.toDF("id", "text")

    val b = 1024
    val viaExpr = df
      .select(col("id"), gram_buckets(col("text"), 2, b).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

    // duplicates KEPT: transform over the window sequence, no distinct.
    // sequence(a, b) counts DOWN when b < a, so guard the <2-word case
    // explicitly instead of relying on an empty sequence.
    val viaBuiltin = df
      .withColumn("w", split(lower(col("text")), " "))
      .select(col("id"),
        when(size(col("w")) < 2, typedlit(Array.empty[Int]))
          .otherwise(transform(
            expr("transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1]))"),
            g => pmod(murmur3_token(g), lit(b)).cast("int"))).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

    assert(viaExpr.keySet == viaBuiltin.keySet)
    viaExpr.foreach { case (id, bs) => assert(bs == viaBuiltin(id), s"id $id") }
  }

  test("q62 selects target-like documents: top-50 is majority target lang") {
    val sf = "/root/testdata/sf0.001"
    val top = operators.DocOps.q62(spark, sf).collect()
    assert(top.length == 50)
    val en = top.count(_.getAs[String]("lang") == "en")
    assert(en > 25, s"expected importance resampling to favor the en target, got $en/50")
  }
}
