package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Graft

/** Scale-out join utilities: the hand-rolled paths for the two shuffle
  * pathologies AQE cannot always fix — extreme single-key skew (salting)
  * and repeated co-located joins (bucketing, exercised in ScaleSpec).
  * These complement, not replace, `spark.sql.adaptive.skewJoin`: AQE
  * splits oversized post-shuffle partitions, but a single hot KEY still
  * lands in one task; salting splits the key itself.
  */
object Scale {

  /** Equi-join `skewed` (large, possibly hot-keyed) with `dim` (small
    * enough to replicate `salts`×, but too big to broadcast) spreading
    * each join key over `salts` shuffle partitions.
    *
    * The skewed side gets a deterministic per-row salt (hash of the whole
    * row — stable across retries, no rand()); the dim side is exploded
    * once per salt value, so every (key, salt) bucket can satisfy the
    * join. Row-preserving for inner/left joins with unique dim keys:
    * result equals the unsalted join.
    */
  def saltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full joins are WRONG under salting: an unmatched dim key was
    // exploded `salts`x and every replica would surface as its own
    // null-padded row — reject loudly instead of silently multiplying
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType")
    val saltedLarge = skewed.withColumn(
      "__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(saltedDim,
        saltedLarge(key) === saltedDim(key) && saltedLarge("__salt") === saltedDim("__salt"),
        joinType)
      .drop(saltedDim(key)).drop(saltedDim("__salt")).drop("__salt")
  }

  /** Top-k per group without a global sort: rank inside each group's
    * shuffle partition via a window, filter early. At 100 TB the win is
    * that only k rows per group survive the window stage.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col).toIndexedSeq: _*).orderBy(order)
    df.withColumn("__rk", row_number().over(w)).where(col("__rk") <= k).drop("__rk")
  }

  // ---------------------------------------------------------------- q69
  /** Salted skew-join under the oracle gate: events joined to a per-user
    * dim THROUGH `saltedJoin`, aggregated per tier — while the DuckDB
    * oracle runs the plain unsalted join, so the gate proves salting is
    * row-preserving, not just plausible. The decimal cast makes the
    * revenue sum associative (exact decimal addition), so the result is
    * hash-identical no matter how the salt spreads the rows.
    */
  import Relational.Q

  val q69: Q = (s, d) => {
    val ev = Graft.events(s, d).select(col("user_id"), col("value"))
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("tier", (col("user_id") % 5).cast("int"))
    saltedJoin(ev, dim, "user_id", salts = 8)
      .groupBy(col("tier"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy("tier")
  }

  val q69Sql: String =
    """WITH dim AS (
      |  SELECT DISTINCT user_id, CAST(user_id % 5 AS INT) AS tier FROM events)
      |SELECT tier, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM events e JOIN dim USING (user_id)
      |GROUP BY tier ORDER BY tier""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q69_salted_join", q69, Some(q69Sql)))
}
