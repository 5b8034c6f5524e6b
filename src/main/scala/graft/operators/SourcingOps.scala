package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Supply-chain sourcing analytics (round 7, thirty-first pack) over the
  * lineitem-derived part × supplier bipartite graph: sourcing-depth
  * histogram (q266), the per-part sourcing-concentration (HHI)
  * distribution (q267), and supplier substitutability — the pairs
  * sharing the most parts (q268).
  *
  * Scale notes: everything derives from ONE (part, supplier) rollup —
  * a map-side-combined aggregation on the (l_partkey, l_suppkey) key.
  * q266/q267 then aggregate per part (same part key prefix, one
  * shuffle) and land on bounded histograms (suppliers-per-part is
  * bounded by the supplier catalog a part can have; HHI basis points
  * ≤ 10001 cells). q268 (r12) collect_sets the per-part supplier set
  * in one map-side-combined shuffle and expands pairs ROW-LOCALLY —
  * (suppliers of that part)² per row, the q233 basket-bounded pair
  * discipline without the former part-key self-join — then aggregates
  * to supplier pairs before the top-15 TakeOrderedAndProject.
  *
  * Exactness: l_quantity is integral (verified at both scales) so
  * every share/HHI decision is integer arithmetic — the HHI bucket is
  * (10000·Σq_s²) DIV (Q²) on BIGINTs, one cross-multiplied integer
  * division, no double anywhere before output (at extreme scale the
  * squares promote to DECIMAL(38,0) the q211 way); q268's Jaccard is
  * one BIGINT division rounded at 6 on output only.
  */
object SourcingOps {
  import Relational.Q

  /** (l_partkey, l_suppkey, qty) — total quantity per sourcing edge. */
  private def edges(s: SparkSession, d: String): DataFrame =
    Graft.table(s, d, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))

  private val edgesCte: String =
    """e AS (
      |  SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q266
  /** Sourcing-depth histogram: how many parts have exactly N distinct
    * suppliers, with the total quantity riding on each depth.
    */
  val q266: Q = (s, d) =>
    edges(s, d)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_suppliers"), sum(col("qty")).as("q_total"))
      .groupBy(col("n_suppliers"))
      .agg(count(lit(1)).as("n_parts"), sum(col("q_total")).as("sum_qty"))
      .orderBy("n_suppliers")

  val q266Sql: String =
    s"""WITH $edgesCte,
       |p AS (
       |  SELECT l_partkey, count(*) AS n_suppliers, CAST(sum(qty) AS BIGINT) AS q_total
       |  FROM e GROUP BY 1)
       |SELECT n_suppliers, count(*) AS n_parts, CAST(sum(q_total) AS BIGINT) AS sum_qty
       |FROM p GROUP BY 1 ORDER BY n_suppliers""".stripMargin

  // ---------------------------------------------------------------- q267
  /** Sourcing-concentration distribution: per part, HHI over supplier
    * quantity shares in exact basis points — hhi_bp =
    * (10000·Σq_s²) DIV Q² — then the histogram of parts per bp cell.
    */
  val q267: Q = (s, d) =>
    edges(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(col("qty") * col("qty")).as("s2"), sum(col("qty")).as("q"))
      .withColumn("hhi_bp", expr("(10000L * s2) DIV (q * q)"))
      .groupBy(col("hhi_bp"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("hhi_bp")

  val q267Sql: String =
    s"""WITH $edgesCte,
       |p AS (
       |  SELECT l_partkey, CAST(sum(qty * qty) AS BIGINT) AS s2, CAST(sum(qty) AS BIGINT) AS q
       |  FROM e GROUP BY 1)
       |SELECT (10000 * s2) // (q * q) AS hhi_bp, count(*) AS n_parts
       |FROM p GROUP BY 1 ORDER BY hhi_bp""".stripMargin

  // ---------------------------------------------------------------- q268
  /** Supplier substitutability: the top-15 supplier pairs by shared
    * part count, with each pair's part-set Jaccard. Pairs come from the
    * part-key self-join of the edge rollup (per-part bounded), sizes
    * from the per-supplier part counts.
    */
  val q268: Q = (s, d) => {
    // r12: q268 needs only the DISTINCT (part, supplier) set — not the
    // qty rollup — and suppliers-per-part is catalog-bounded, so the
    // per-part supplier set is row-local: ONE map-side-combined
    // collect_set shuffle + row-local pair expansion replaces the old
    // plan's THREE independent lineitem aggregations (a side, b side,
    // sizes) and the part-key join (guide §2.3/§2.4). `ss` is sorted
    // and distinct, so sa < sb by construction — identical pairs to the
    // old join's `sa < sb` filter; sizes come from the same subtree
    // (ReuseExchange shares the one shuffle).
    val perPart = Graft.table(s, d, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
    val sizes = perPart.select(explode(col("ss")).as("l_suppkey"))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_parts"))
    // the pair explode multiplies rows by |ss|² AFTER the aggregation,
    // which AQE's coalescing cannot see (it sizes partitions on the
    // pre-explode bytes and funneled the fan-out into 2 tasks here):
    // spread the rollup to the cluster's parallelism first — the count
    // derives from the runtime, not a local constant (guide §2.5).
    // Round-robin, NOT by l_partkey: a same-key repartition is elided
    // as redundant against the aggregation's partitioning and the
    // coalesced read returns; rows here are part-rollup-sized, so the
    // extra exchange is trivial next to the fan-out it parallelizes.
    val spread = perPart.repartition(s.sparkContext.defaultParallelism)
    // two chained explodes + an ascending filter, NOT a nested
    // transform/slice/flatten lambda chain: higher-order functions are
    // interpreted (CodegenFallback) and allocate per element, measured
    // 2.6× the total CPU of this whole query — the explode generators
    // stay inside whole-stage codegen. `ss` is sorted + distinct, so
    // sb > sa enumerates each unordered pair exactly once.
    val shared = spread
      .select(col("ss"), explode(col("ss")).as("sa"))
      .select(col("sa"), explode(col("ss")).as("sb"))
      .filter(col("sb") > col("sa"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("shared_parts"))
    shared
      .join(sizes.select(col("l_suppkey").as("sa"), col("n_parts").as("na")), Seq("sa"))
      .join(sizes.select(col("l_suppkey").as("sb"), col("n_parts").as("nb")), Seq("sb"))
      .select(col("sa"), col("sb"), col("shared_parts"),
        round(col("shared_parts").cast("double")
          / (col("na") + col("nb") - col("shared_parts")), 6).as("jaccard"))
      .orderBy(col("shared_parts").desc, col("sa"), col("sb"))
      .limit(15)
  }

  val q268Sql: String =
    s"""WITH $edgesCte,
       |sz AS (
       |  SELECT l_suppkey, count(*) AS n_parts FROM e GROUP BY 1),
       |sh AS (
       |  SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, count(*) AS shared_parts
       |  FROM e a JOIN e b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
       |  GROUP BY 1, 2)
       |SELECT sh.sa, sh.sb, sh.shared_parts,
       |  round(CAST(sh.shared_parts AS DOUBLE)
       |    / (za.n_parts + zb.n_parts - sh.shared_parts), 6) AS jaccard
       |FROM sh JOIN sz za ON sh.sa = za.l_suppkey
       |        JOIN sz zb ON sh.sb = zb.l_suppkey
       |ORDER BY sh.shared_parts DESC, sh.sa, sh.sb LIMIT 15""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q266_sourcing_depth", q266, Some(q266Sql)),
    ("q267_sourcing_hhi", q267, Some(q267Sql)),
    ("q268_supplier_overlap", q268, Some(q268Sql)))
}
