/** Graft's table-valued functions (Catalyst logical-plan builders).
  *
  * Lives under `org.apache.spark.sql` with the expressions — plan
  * construction uses catalyst internals.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

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

/** `SELECT * FROM topic_records('<store root>', '<topic>')` — a topic's
  * current-generation log as a SQL relation: the record envelope
  * (key, value, timestamp, part, offset, topic, token, range, version)
  * straight off the partitioned parquet layout. Both predicates land on
  * partition columns, so other topics and stale generations are pruned at
  * scan, and any WHERE the query adds pushes down like a normal parquet
  * read. The Spark face of the reference's "a topic IS a table" data
  * model — no registration or DDL, mirroring topics.go auto-creation.
  */
/** `SELECT * FROM topic_list('<store root>')` — every topic in a store
  * with its current generation: (topic, version, cluster_size). The
  * data-side discovery listing next to `/v1/brokers`' cluster listing;
  * metadata-sized (one row per topic), evaluated plan-time like
  * `ring_partitions`.
  */
object TopicListTable {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "topic_list(root) takes one string literal")
    val root = exprs.head match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"topic_list argument must be a string literal, got $other")
    }
    val spark = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("topic_list requires an active SparkSession"))
    val rows = new graft.engine.TopicStore(spark, root).listTopics().map {
      case (t, v, c) => InternalRow(UTF8String.fromString(t), v, c)
    }
    LocalRelation(
      Seq(
        AttributeReference("topic", StringType, nullable = false)(),
        AttributeReference("version", IntegerType, nullable = false)(),
        AttributeReference("cluster_size", IntegerType, nullable = false)()),
      rows)
  }
}

/** `SELECT * FROM topic_lag('<store root>', '<group>')` — the
  * operational lag table: one row per (topic, LIVE generation,
  * partition) with the produce watermark, the group's committed
  * next-read position, and the lag (watermark − committed; an
  * uncommitted partition reports the full watermark). The lineage
  * dimension matters after a metadata-only rescale: the group's real
  * backlog lives in ancestor generations, which a current-generation-
  * only readout would report as zero lag. The SQL face of the R8
  * max-produced-offset / consumer-lag metric the reference exposes
  * through Prometheus (`EngineMetrics` carries the push-side twin);
  * metadata-sized, one row per (generation, ring partition), evaluated
  * plan-time like `topic_list`.
  */
object TopicLagTable {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2, "topic_lag(root, group) takes two string literals")
    val Seq(root, group) = exprs.map {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"topic_lag arguments must be string literals, got $other")
    }
    val spark = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("topic_lag requires an active SparkSession"))
    val store = new graft.engine.TopicStore(spark, root)
    // committed comes from groupOffsets DIRECTLY (not watermark − lag:
    // lag clamps at 0, so a committed position at/above the watermark
    // would be misreported as the watermark), and partitions enumerate
    // the full ring 0 until clusterSize·rangesPerToken — producerOffsets
    // is a sparse map, and the doc promises one row per ring partition
    // with uncommitted partitions reporting the full watermark as lag
    val rows = store.listTopics().flatMap { case (t, _, _) =>
      store.generations(t).flatMap { g =>
        val hw = store.producerOffsets(t, g.version)
        val committed = store.groupOffsets(group, t, g.version)
        (0 until g.clusterSize * store.rangesPerToken).map { p =>
          val w = hw.getOrElse(p, 0L)
          val c = committed.getOrElse(p, 0L)
          InternalRow(UTF8String.fromString(t), g.version, p, w, c, math.max(0L, w - c))
        }
      }
    }
    LocalRelation(
      Seq(
        AttributeReference("topic", StringType, nullable = false)(),
        AttributeReference("version", IntegerType, nullable = false)(),
        AttributeReference("part", IntegerType, nullable = false)(),
        AttributeReference("watermark", LongType, nullable = false)(),
        AttributeReference("committed", LongType, nullable = false)(),
        AttributeReference("lag", LongType, nullable = false)()),
      rows)
  }
}

/** `SELECT * FROM topic_offsets_for_time('<store root>', '<topic>',
  * TIMESTAMP '2024-01-01 00:00:00')` — the time-based offset cut on the
  * SQL surface: one row per ring partition with the earliest offset
  * whose record timestamp is >= the argument (partitions with no such
  * record report their high watermark — the seek lands at the end,
  * Kafka's `offsetsForTimes` convention, matching
  * `TopicStore.offsetsForTime`). The third argument is a TIMESTAMP or
  * 'yyyy-mm-dd hh:mm:ss[.f…]' string literal; metadata-sized output,
  * evaluated plan-time like `topic_lag`.
  */
object TopicOffsetsForTimeTable {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3,
      "topic_offsets_for_time(root, topic, ts) takes three literals")
    val Seq(root, topic) = exprs.take(2).map {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"topic_offsets_for_time root/topic must be string literals, got $other")
    }
    val spark = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException(
        "topic_offsets_for_time requires an active SparkSession"))
    // epoch-micros → java.sql.Timestamp with the sub-millisecond part
    // preserved via setNanos (the millis-only constructor would silently
    // shift a sub-millisecond cut earlier)
    def microsToTs(micros: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      t
    }
    val ts = exprs(2) match {
      case Literal(micros: Long, _: TimestampType) => microsToTs(micros)
      case l @ Literal(_: UTF8String, StringType) =>
        // parse through the SESSION timezone (Cast to TimestampType),
        // matching what TIMESTAMP '...' literals resolve to — the old
        // Timestamp.valueOf path used the JVM default timezone, which can
        // disagree with spark.sql.session.timeZone
        val zone = spark.sessionState.conf.sessionLocalTimeZone
        org.apache.spark.sql.catalyst.expressions
          .Cast(l, TimestampType, Some(zone)).eval() match {
          case micros: Long => microsToTs(micros)
          case _ => throw new IllegalArgumentException(
            s"topic_offsets_for_time: unparseable timestamp string ${l.value}")
        }
      case other => throw new IllegalArgumentException(
        s"topic_offsets_for_time ts must be a TIMESTAMP or string literal, got $other")
    }
    val store = new graft.engine.TopicStore(spark, root)
    val rows = store.offsetsForTime(topic, ts).toSeq.sortBy(_._1).map {
      case (p, o) => InternalRow(UTF8String.fromString(topic), p, o)
    }
    LocalRelation(
      Seq(
        AttributeReference("topic", StringType, nullable = false)(),
        AttributeReference("part", IntegerType, nullable = false)(),
        AttributeReference("offset", LongType, nullable = false)()),
      rows)
  }
}

/** `SELECT * FROM topic_stats('<store root>', '<topic>')` — storage and
  * watermark stats per (LIVE generation, ring partition): parquet file
  * count, bytes on disk, and the produce high watermark. The lineage
  * dimension matters after a metadata-only rescale — the bulk of the
  * topic's storage sits in ancestor generations. The SQL face of the
  * broker's admin/observability surface (file counts feed compaction,
  * bytes the retention budget); metadata-sized driver-side FS listing,
  * evaluated plan-time like `topic_lag`.
  */
object TopicStatsTable {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2, "topic_stats(root, topic) takes two string literals")
    val Seq(root, topic) = exprs.map {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"topic_stats arguments must be string literals, got $other")
    }
    val spark = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("topic_stats requires an active SparkSession"))
    val store = new graft.engine.TopicStore(spark, root)
    val rows = store.topicStats(topic).map { case (v, p, files, bytes, hw) =>
      InternalRow(UTF8String.fromString(topic), v, p, files, bytes, hw)
    }
    LocalRelation(
      Seq(
        AttributeReference("topic", StringType, nullable = false)(),
        AttributeReference("version", IntegerType, nullable = false)(),
        AttributeReference("part", IntegerType, nullable = false)(),
        AttributeReference("files", LongType, nullable = false)(),
        AttributeReference("bytes", LongType, nullable = false)(),
        AttributeReference("watermark", LongType, nullable = false)()),
      rows)
  }
}

object TopicRecordsTable {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2,
      "topic_records(root, topic) takes two string literals")
    val Seq(root, topic) = exprs.map {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"topic_records arguments must be string literals, got $other")
    }
    val spark = SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException("topic_records requires an active SparkSession"))
    // single source of truth for the current-generation read rule
    graft.Graft.topic(spark, root, topic).queryExecution.logical
  }
}
