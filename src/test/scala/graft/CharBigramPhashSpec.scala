package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.char_bigram_phash

/** Parity proof for the codegen'd `char_bigram_phash` expression (r12,
  * q120's row-local signature): it must be bit-identical to the built-in
  * relational formulation it replaced — positive code points, consecutive
  * bigram buckets at (a*31 + b) mod B, bit i set iff count_i · B is
  * strictly above the total pair count — and null exactly where the old
  * `size(codes) > 1` participation gate dropped the row.
  */
class CharBigramPhashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("charbigram-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("expression equals the relational histogram + mean-test formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh XYZ09.,;"
    val texts = (1L to 80L).map { id =>
      id -> Seq.fill(rnd.nextInt(120))(alpha(rnd.nextInt(alpha.length))).mkString
    } :+ (81L -> "") :+ (82L -> "a") :+ (83L -> "ab") :+ (84L -> "aaaaaaaa")
    val df = texts.toDF("doc_id", "text")

    val viaExpr = df
      .select(col("doc_id"), char_bigram_phash(col("text"), 64).as("phash"))
      .where(col("phash").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // the pre-r12 q120 formulation, verbatim
    val base = df
      .withColumn("codes", expr("filter(transform(split(text, ''), x -> ascii(x)), c -> c > 0)"))
      .withColumn("nc", expr("CAST(size(codes) AS INT)"))
      .where(col("nc") > 1)
      .withColumn("buckets", expr(
        "filter(zip_with(codes, slice(codes, 2, nc), (a, b) -> (a * 31 + b) % 64), x -> x IS NOT NULL)"))
    val bgr = base.select(col("doc_id"), explode(col("buckets")).as("bucket"))
    val tot = bgr.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val st = bgr.groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val viaBuiltin = st.join(tot, "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("cnt") * 64 > col("n"),
        expr("shiftleft(1L, CAST(bucket AS INT))")).otherwise(lit(0L))).as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(viaExpr.keySet == viaBuiltin.keySet,
      s"participation gate mismatch: ${viaExpr.keySet.diff(viaBuiltin.keySet)} / ${viaBuiltin.keySet.diff(viaExpr.keySet)}")
    viaExpr.foreach { case (id, p) => assert(p == viaBuiltin(id), s"doc $id") }
  }

  test("supplementary code points follow the oracle's ord() semantics") {
    import spark.implicits._
    // non-BMP input: Spark's ascii() returns the first UTF-16 code unit (a
    // surrogate) here, so the old built-in chain DIVERGES on such text —
    // the expression must instead match the DECLARED DuckDB oracle, whose
    // ord() is the full code point. Expected value re-derived below via an
    // independent path (String.codePoints) running the oracle arithmetic.
    val texts = Seq(
      (1L, "a😀b😀"), // a 😀 b 😀
      (2L, "😀😁😀ab"),
      (3L, "héllo wörld 🎉"))
    def oracle(t: String): Long = {
      val cps = t.codePoints().toArray.filter(_ > 0)
      val counts = new Array[Int](64)
      var n = 0
      cps.sliding(2).foreach {
        case Array(a, b) => counts((a * 31 + b) % 64) += 1; n += 1
        case _ => ()
      }
      (0 until 64).foldLeft(0L) { (sig, i) =>
        if (counts(i).toLong * 64 > n) sig | (1L << i) else sig
      }
    }
    val got = texts.toDF("doc_id", "text")
      .select(col("doc_id"), char_bigram_phash(col("text"), 64).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == oracle(t), s"doc $id: ${got(id)} != oracle ${oracle(t)}")
    }
  }

  test("null for <2 positive code points; SQL registration works") {
    import spark.implicits._
    functions.registerAll(spark)
    Seq((1L, ""), (2L, "x"), (3L, "xy")).toDF("id", "t").createOrReplaceTempView("cbp_t")
    val rows = spark.sql(
      "SELECT id, char_bigram_phash(t, 64) AS p FROM cbp_t ORDER BY id").collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1) && !rows(2).isNullAt(1))
  }
}
