package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by alternating large-star / small-star
  * rounds (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) — the petabyte-scale companion to `Pipeline.q50`'s min-label
  * propagation.
  *
  * Why both exist: label propagation costs one shuffle per round but needs
  * O(diameter) rounds — optimal for near-dup graphs (copy-cliques, diameter
  * 1-2) and that is why q50 uses it. Star contraction converges in
  * O(log n) rounds on ANY topology (long chains, stringy web graphs), at
  * ~2x the per-round shuffle cost; it is the right tool once the edge set
  * no longer looks like cliques. Per round each operation is
  * groupBy-min + join — the same shuffle shape as the propagation loop, so
  * everything stays whole-stage-codegen'd hash aggregation; lineage is
  * localCheckpoint-truncated per round exactly like q50's loop.
  *
  * `ScaleSpec` proves the result equals a driver-side union-find on random
  * graphs and equals q50's clusters on the real LSH near-dup pair graph.
  */
object ConnectedComponents {

  /** Large-star: for every node u, hang each strictly-larger neighbor off
    * m(u) = min(neighbors(u) + u). Connectivity-preserving; never creates
    * an edge between two nodes both larger than m.
    */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
    val m = sym.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("m"))
    sym.join(m, "u")
      .where(col("v") > col("u")) // v > u >= m, so no self-loops possible
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: orient each edge large-to-small; for every node u, hang
    * u and its smaller neighbors off their collective minimum.
    */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val m = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
    oriented.select(col("u"), col("v"))
      .union(m.select(col("u"), col("u").as("v")))
      .join(m, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** (id, component) for every node incident to an edge; component = the
    * smallest node id reachable. Nodes absent from `edges` are absent from
    * the result — callers union isolated vertices (see `Pipeline`).
    *
    * Convergence check is a set signature (count + order-independent hash
    * xor), not count alone: a round that rewires edges without changing
    * their number must not read as converged. Non-convergence within
    * `maxRounds` THROWS — the output construction below is only valid at
    * the star-forest fixpoint, and returning mid-contraction edges would
    * silently split components. Rounds needed ≈ log(diameter); the
    * default covers any realistic graph (ScaleSpec converges 180-node
    * chains in < 10), raise it for adversarial topologies.
    *
    * Superseded rounds' checkpoint blocks are reclaimed by the
    * ContextCleaner once the loop rebinds `e` and drops the only
    * reference — at most the two live rounds are strongly held.
    */
  def components(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    var e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    var signature = sig(e)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextSig = sig(next)
      e = next
      converged = nextSig == signature
      signature = nextSig
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds; " +
          "raise maxRounds (rounds needed grows with log of graph diameter)")
    // fixpoint is a star forest: every edge points (node -> component min);
    // roots appear only on the dst side, so union them in as self-rows
    e.select(col("src").as("id"), col("dst").as("component"))
      .union(e.select(col("dst").as("id"), col("dst").as("component")))
      .distinct()
  }

  private def sig(e: DataFrame): (Long, Long) = {
    // bit_xor, not sum: order-independent like sum but cannot overflow
    // under ANSI mode; the edge set is distinct() so xor is a proper set
    // signature (count disambiguates the rare xor collision)
    val r = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }
}
