package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the StatsOps pack at sf0.001. Exact value
  * parity with DuckDB is asserted by tools/verify_local.py at sf0.01.
  */
class StatsOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("stats-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q84: exact moments are coherent and both engines' builtins agree") {
    val rows = q("q84_stats_moments").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getAs[Double]("corr_qty_price")
      assert(corr >= -1.0 && corr <= 1.0)
      assert(math.abs(r.getAs[Double]("r2") - corr * corr) < 1e-12)
      assert(r.getAs[Double]("stddev_qty") > 0.0)
      assert(r.getAs[Boolean]("corr_builtin_ok"))
      assert(r.getAs[Boolean]("slope_builtin_ok"))
      assert(r.getAs[Boolean]("stddev_builtin_ok"))
    }
  }

  test("q85: SCD2 chains are contiguous with exactly one current version") {
    val rows = q("q85_scd2_dim").collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.foreach { case (_, vs) =>
      val versions = vs.map(_.getAs[Int]("version")).sorted
      assert(versions.toSeq == (1 to vs.length), "versions must be 1..n")
      assert(vs.count(_.getAs[Boolean]("is_current")) == 1, "exactly one current")
      // each non-current version's valid_to is the next version's valid_from
      val chain = vs.sortBy(_.getAs[Int]("version"))
      chain.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"))
        case _ => ()
      }
    }
  }

  test("q86: reported pairs really share an identical token span") {
    val pairs = q("q86_substr_contamination").collect()
    assert(pairs.nonEmpty, "synthetic near-dups must yield shared spans")
    val texts = Graft.table(spark, sf, "documents")
      .selectExpr("doc_id", "split(regexp_replace(lower(text), '\\\\s+', ' '), ' ') AS t")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    pairs.take(10).foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val span = r.getAs[Long]("span_tokens").toInt
      assert(a < b)
      assert(span == r.getAs[Long]("max_run").toInt + 7)
      val (ta, tb) = (texts(a), texts(b))
      val windows = tb.sliding(span).map(_.mkString(" ")).toSet
      assert(ta.sliding(span).exists(w => windows.contains(w.mkString(" "))),
        s"docs $a/$b must share a $span-token substring")
    }
  }

  test("q87: profile is internally consistent") {
    val rows = q("q87_column_profile").collect()
    assert(rows.length == 6)
    val byCol = rows.map(r => r.getAs[String]("col_name") -> r).toMap
    val nOrders = Graft.table(spark, sf, "orders").count()
    // primary key: zero nulls, all-distinct
    assert(byCol("o_orderkey").getAs[Long]("n_null") == 0L)
    assert(byCol("o_orderkey").getAs[Long]("n_distinct") == nOrders)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[java.lang.Double]("min_num"), r.getAs[java.lang.Double]("max_num"))
      if (lo != null) assert(lo <= hi)
      val (ls, hs) = (r.getAs[String]("min_str"), r.getAs[String]("max_str"))
      if (ls != null) assert(ls <= hs)
    }
  }

  test("q88: priority sample is deterministic with estimator >= weight") {
    val r1 = q("q88_priority_sample").collect()
    val r2 = q("q88_priority_sample").collect()
    assert(r1.length == 20)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq, "bit-reproducible")
    r1.foreach { r =>
      // w_est = max(w, tau) >= w, the Duffield-Lund-Thorup estimator
      assert(r.getAs[Double]("w_est") >= r.getAs[Double]("w"))
    }
  }

  test("pos_gram_hashes equals the transform/slice/concat_ws composition") {
    import org.apache.spark.sql.functions._
    val docs = Graft.table(spark, sf, "documents")
    val viaExpr = docs.select(col("doc_id"),
      graft.functions.pos_gram_hashes(col("text"), 8).as("hs"))
    val viaBuiltins = docs
      .select(col("doc_id"),
        split(regexp_replace(lower(col("text")), "\\s+", " "), " ").as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) >= 8,
          expr("transform(sequence(0, size(toks)-8), i -> murmur3_token(concat_ws(' ', slice(toks, i+1, 8))))"))
          .otherwise(expr("CAST(array() AS array<long>)")).as("hs"))
    graft.functions.registerAll(spark)
    val a = viaExpr.collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    val b = viaBuiltins.collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(a == b, "codegen'd positional grams must be bit-identical to the composition")
  }

  test("q90: merged incremental pre-aggregates equal the direct aggregate") {
    import org.apache.spark.sql.functions._
    val merged = q("q90_incremental_agg").collect().map(_.toSeq)
    val direct = Graft.table(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total_price"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("first_order"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("last_order"))
      .orderBy("o_custkey").collect().map(_.toSeq)
    assert(merged.toSeq == direct.toSeq)
  }

  test("q91: z-order buckets bound both dimensions' envelopes") {
    val rows = q("q91_zorder_layout").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Graft.table(spark, sf, "orders").count())
    rows.foreach { r =>
      // top 6 z bits pin the top 3 bits of EACH 16-bit dimension, so a
      // bucket's envelope spans < 2^13 in both x and y — the 2-D locality
      // that makes min/max file stats prune under either predicate
      assert(r.getAs[Long]("max_cust") - r.getAs[Long]("min_cust") <= 8191L)
      assert(r.getAs[Long]("max_price") - r.getAs[Long]("min_price") <= 8191L)
    }
  }

  test("q92: per-stratum sample keeps k per source, deterministically") {
    val r1 = q("q92_stratified_priority").collect()
    val r2 = q("q92_stratified_priority").collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    r1.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rows.length))
    }
  }

  test("q89: count-min estimates never undercount") {
    val rows = q("q89_count_min").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L, "CMS min-probe is an upper bound")
      assert(r.getAs[Long]("est") == r.getAs[Long]("exact_n") + r.getAs[Long]("overcount"))
    }
    // estimates are sorted descending in the emitted top-10
    val ests = rows.map(_.getAs[Long]("est")).toSeq
    assert(ests == ests.sorted.reverse)
  }
}
