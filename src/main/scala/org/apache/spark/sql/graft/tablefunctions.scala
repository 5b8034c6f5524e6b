/** Graft's table-valued functions (Catalyst logical-plan builders).
  *
  * Lives under `org.apache.spark.sql` with the expressions — plan
  * construction uses catalyst internals.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.core.TokenRing

/** `SELECT * FROM ring_partitions(clusterSize, rangesPerToken)` — the
  * ring's partition table (part ordinal, broker start token, range index)
  * as a relation, mirroring the reference's generation/topology
  * introspection (`GET /v1/brokers` + `token.go` math) on the SQL surface.
  * Arguments must be integer literals: the ring layout is plan-time
  * metadata, exactly like the reference's fixed generation map.
  */
object RingPartitionsTable {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2,
      "ring_partitions(clusterSize, rangesPerToken) takes two integer literals")
    val Seq(c, r) = exprs.map {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"ring_partitions arguments must be integer literals, got $other")
    }
    require(c > 0 && r > 0, "ring_partitions arguments must be positive")
    val rows = TokenRing.allPartitions(c, r).zipWithIndex.map {
      case ((token, range), ord) => InternalRow(ord, token, range)
    }
    LocalRelation(
      Seq(
        AttributeReference("part", IntegerType, nullable = false)(),
        AttributeReference("token", LongType, nullable = false)(),
        AttributeReference("range", IntegerType, nullable = false)()),
      rows)
  }
}
