package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scale

/** Scale-path proofs: salted joins preserve results while splitting hot
  * keys, and bucketed tables join with ZERO shuffle exchanges — the
  * co-location strategy for repeated fact-fact joins at 100 TB.
  */
class ScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Graft.configure(
      SparkSession.builder().appName("scale-spec").master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val sf = "/root/testdata/sf0.001"

  test("salted join equals unsalted join on a hot-keyed input") {
    import spark.implicits._
    // 5000 rows of one hot key + a spread tail
    val skewed = (0 until 5000).map(i => (1L, s"v$i")) ++ (0 until 100).map(i => (i.toLong % 7 + 2, s"t$i"))
    val large = skewed.toDF("k", "payload")
    val dim = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "attr")

    val plain = large.join(dim, "k").select("k", "payload", "attr")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(large, dim, "k", salts = 8)
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(salted == plain)

    // right/full joins would surface each unmatched dim key once PER SALT
    // — rejected loudly instead of silently multiplying
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(large, dim, "k", salts = 8, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(large, dim, "k", salts = 8, joinType = "right")
    }
  }

  test("salted overlap join splits a hot hour and matches the brute-force pair set") {
    import spark.implicits._
    // flash-event fixture: 60 users all live inside ONE epoch hour
    // (pairwise overlaps ~ 60^2/2) plus a quiet tail elsewhere — the
    // exact shape that put sessions-squared in one join task before the
    // user-id shard salt
    val H = 3600000000L
    val hot = (0 until 60).map { u =>
      (u.toLong, u.toLong * 1000L, 1000L * H + (u % 7) * 60000000L,
        1000L * H + 3000000000L + (u % 11) * 60000000L)
    }
    val tail = (0 until 20).map { u =>
      (1000L + u, 99000L + u, (2000L + u) * H + 5L, (2000L + u) * H + 600000000L)
    }
    val sessions = (hot ++ tail).toDF("user_id", "sid", "start_us", "end_us")

    val got = graft.operators.OverlapOps.pairsFromSessions(sessions)
      .select("ua", "sa", "ub", "sb", "ovl_us", "hod")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // exactly once per pair, even with the b side replicated per shard
    assert(got.distinct.length == got.length, "a pair met in more than one shard")

    // brute-force O(n^2) reference over the fixture
    val all = hot ++ tail
    val want = (for {
      a <- all; b <- all
      if a._1 < b._1
      s0 = math.max(a._3, b._3); e0 = math.min(a._4, b._4)
      if e0 - s0 > 0L
    } yield (a._1, a._2, b._1, b._2, e0 - s0, (s0 / H) % 24L)).toSet
    assert(want.size > 1500, s"degenerate fixture: ${want.size} pairs")
    assert(got.toSet == want,
      s"salted plan diverged from brute force: got ${got.length}, want ${want.size}")

    // no single-task hour: the hot hour's probe side now spans ALL
    // SaltShards blocking keys, with no shard holding more than ~2x the
    // even share (murmur3 spread over 60 users)
    val S = graft.operators.OverlapOps.SaltShards
    val shards = sessions
      .select(col("user_id"), expr("start_us DIV 3600000000").as("h"))
      .where(col("h") === 1000L)
      .withColumn("salt", pmod(hash(col("user_id")), lit(S)))
      .groupBy("salt").count().as[(Int, Long)].collect()
    assert(shards.length == S, s"hot hour covers ${shards.length}/$S shards")
    val maxShare = shards.map(_._2).max
    assert(maxShare <= 2L * 60L / S,
      s"one shard holds $maxShare of 60 hot-hour sessions — salt not spreading")
  }

  test("bucketed co-located join runs with zero shuffle exchanges") {
    val warehouse = Files.createTempDirectory("graft-buckets").toString
    val orders = Graft.table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val lineitem = Graft.table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")

    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$warehouse/orders_b").mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$warehouse/lineitem_b").mode("overwrite").saveAsTable("lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      joined.queryExecution.executedPlan.execute().count()
      val plan = joined.queryExecution.executedPlan.toString
      // bucket co-location: join needs no Exchange; only the final
      // aggregation on the same key is exchange-free too
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("topKPerGroup returns exactly k rows per group in order") {
    val li = Graft.table(spark, sf, "lineitem")
    val top = Scale.topKPerGroup(li, Seq("l_returnflag"), col("l_extendedprice").desc, 3)
      .groupBy("l_returnflag").count().collect()
    assert(top.nonEmpty && top.forall(_.getAs[Long]("count") == 3L))
  }

  /** Driver-side union-find ground truth for component checks. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("large-star/small-star components equal union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // topologies label propagation handles worst: long chains + sparse
    // random edges + isolated nodes, across several densities
    for (trial <- 0 until 5) {
      val n = 60 + trial * 30
      // a REAL chain over the first half (diameter ~n/2 — the worst case
      // for label propagation, needing multiple contraction rounds here),
      // sparse random edges over the whole range, isolated tail nodes
      val chain = (0 until n / 2).map(i => (i.toLong, (i + 1).toLong))
      val random = Seq.fill(n / 4)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val edges = (chain ++ random).distinct
      val got = operators.ConnectedComponents
        .components(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val want = unionFind(n, edges)
      // every edge-incident node must carry its component's minimum
      val incident = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(incident.forall(id => got.get(id).contains(want(id))),
        s"trial $trial: mismatch on ${incident.find(id => !got.get(id).contains(want(id)))}")
      assert(got.keySet == incident)
    }
  }

  test("large-star/small-star equals q50's label propagation on the near-dup graph") {
    import spark.implicits._
    val pairs = operators.DocOps.q19(spark, sf).select("doc_a", "doc_b")
    val cc = operators.ConnectedComponents
      .components(pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .as[(Long, Long)].collect().toMap
    val q50 = operators.Pipeline.q50(spark, sf)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    // q50 covers every doc (isolated docs are their own cluster); the CC
    // result covers edge-incident docs — they must agree on those, and
    // every doc absent from the edge set must be a singleton in q50
    cc.foreach { case (id, comp) =>
      assert(q50(id) == comp, s"doc $id: cc=$comp q50=${q50(id)}")
    }
    q50.filterNot { case (id, _) => cc.contains(id) }.foreach { case (id, comp) =>
      assert(comp == id, s"isolated doc $id must be its own cluster")
    }
  }
}
