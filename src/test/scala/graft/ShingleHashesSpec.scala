package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{murmur3_token, shingle_hashes}

/** Parity proof for the codegen'd `shingle_hashes` expression: its hash
  * set must equal `murmur3_token` over the built-in shingle composition
  * (`array_distinct(transform(sequence(...), concat_ws(...)))` on
  * `split(lower(text), " ")`) — q19/q20/q52/q56/q59 all compute set
  * arithmetic on these hashes, and the DuckDB oracles compute the same
  * arithmetic from shingle strings.
  */
class ShingleHashesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("shingle-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def builtinShingles(k: Int) = {
    val idx = (0 until k).map(j => s"w[i+$j]").mkString(", ")
    expr(s"transform(sequence(0, size(w) - $k), i -> concat_ws(' ', $idx))")
  }

  test("expression hash set equals murmur3 of the built-in composition") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("spark", "table", "Row", "KEY", "scan", "", "düne", "x")
    val texts = (1L to 60L).map { id =>
      id -> Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ (61L -> "one two") :+ (62L -> "") :+ (63L -> "a b c a b c a b c")
    val df = texts.toDF("id", "text")

    for (k <- Seq(3, 5)) {
      val viaExpr = df
        .select(col("id"), shingle_hashes(col("text"), k).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

      val viaBuiltins = df
        .select(col("id"), split(lower(col("text")), " ").as("w"))
        .select(col("id"), array_distinct(
          when(size(col("w")) >= k, builtinShingles(k)).otherwise(array())).as("sh"))
        .select(col("id"), transform(col("sh"), x => murmur3_token(x)).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

      assert(viaExpr.keySet == viaBuiltins.keySet)
      viaExpr.foreach { case (id, hs) =>
        assert(hs == viaBuiltins(id), s"k=$k id=$id")
      }
    }
  }

  test("null text yields null, SQL registration works") {
    import spark.implicits._
    functions.registerAll(spark)
    val rows = Seq((1L, "alpha beta gamma delta"), (2L, null))
      .toDF("id", "text").createOrReplaceTempView("sh_t")
    val got = spark.sql(
      "SELECT id, shingle_hashes(text, 3) AS hs FROM sh_t ORDER BY id").collect()
    assert(got(0).getSeq[Long](1).size == 2)
    assert(got(1).isNullAt(1))
  }
}
