package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Data-contract quality gates (round 6, twenty-fourth pack): the
  * assertion suite a pipeline runs before promoting a batch —
  * referential-integrity orphans across every FK edge (q237),
  * row-level contract violations (q238), primary-key duplicate
  * census (q239), and the order-total vs line-sum cross-field
  * consistency audit (q240).
  *
  * Scale notes (the 100 TB story): q237 is one left-anti join per FK
  * edge (each a key-partitioned shuffle — or broadcast when the
  * parent is a dimension; outputs are single counts); q238/q239 are
  * single map-side-combined passes per table; q240 is one
  * lineitem→orders rollup joined to orders (the q204 shape) feeding a
  * metadata-sized relative-error histogram. Nothing materializes
  * more than violation counts.
  *
  * Exactness: every check is an integer decision — null tests, range
  * tests on exact cents/integer micros (`round(x·100) → BIGINT`
  * before any comparison), epoch-day bounds, duplicate counts, and
  * q240's mismatch buckets via integer cross-multiplication
  * (|derived − stated|·10^k vs stated — no division under a
  * comparison); shares are single divisions rounded on output.
  */
object QualityGateOps {
  import Relational.Q

  // ---------------------------------------------------------------- q237
  /** Referential-integrity audit: orphan-row counts for every FK edge
    * in the star schema, with the child row count and orphan share.
    */
  val q237: Q = (s, d) => {
    // one pass per edge: left join to the distinct parent key, orphans
    // counted as null matches — no separate total-count scan
    def edge(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame =
      child.select(col(key))
        .join(parent.select(col(pkey)).distinct(), col(key) === col(pkey),
          "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col(pkey).isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_child"), 6)
            .as("orphan_share"))
    val li = Graft.table(s, d, "lineitem")
    val o = Graft.table(s, d, "orders")
    val c = Graft.table(s, d, "customer")
    val p = Graft.table(s, d, "part")
    val su = Graft.table(s, d, "supplier")
    val n = Graft.table(s, d, "nation")
    edge("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .unionAll(edge("lineitem.partkey->part", li, "l_partkey", p, "p_partkey"))
      .unionAll(edge("lineitem.suppkey->supplier", li, "l_suppkey", su, "s_suppkey"))
      .unionAll(edge("orders.custkey->customer", o, "o_custkey", c, "c_custkey"))
      .unionAll(edge("customer.nationkey->nation", c, "c_nationkey", n, "n_nationkey"))
      .unionAll(edge("supplier.nationkey->nation", su, "s_nationkey", n, "n_nationkey"))
      .orderBy("fk_edge")
  }

  val q237Sql: String = {
    def e(name: String, child: String, key: String, parent: String,
        pkey: String): String =
      s"""SELECT '$name' AS fk_edge,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $child
         |   WHERE $key NOT IN (SELECT $pkey FROM $parent)) AS n_orphans,
         |  round(CAST((SELECT count(*) FROM $child
         |      WHERE $key NOT IN (SELECT $pkey FROM $parent)) AS DOUBLE)
         |    / (SELECT count(*) FROM $child), 6) AS orphan_share""".stripMargin
    Seq(
      e("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      e("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      e("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      e("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      e("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      e("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
  }

  // ---------------------------------------------------------------- q238
  /** Row-level contract violations on lineitem: per rule, the violating
    * row count (integer tests on exact cents) and share.
    */
  val q238: Q = (s, d) => {
    val li = Graft.table(s, d, "lineitem")
      .select(expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_pct"),
        expr("CAST(round(l_tax * 100) AS BIGINT)").as("tax_pct"),
        col("l_returnflag"), col("l_linestatus"),
        expr("unix_micros(l_shipdate) DIV 86400000000").as("ship_day"))
    val agg = li.agg(count(lit(1)).as("n"),
      sum(when(col("qty_c") <= 0L, 1L).otherwise(0L)).as("v_qty_nonpos"),
      sum(when(col("price_c") <= 0L, 1L).otherwise(0L)).as("v_price_nonpos"),
      sum(when(col("disc_pct") < 0L || col("disc_pct") > 100L, 1L).otherwise(0L))
        .as("v_disc_range"),
      sum(when(col("tax_pct") < 0L || col("tax_pct") > 100L, 1L).otherwise(0L))
        .as("v_tax_range"),
      sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
        .as("v_flag_domain"),
      sum(when(!col("l_linestatus").isin("O", "F"), 1L).otherwise(0L))
        .as("v_status_domain"),
      sum(when(col("ship_day") < 0L || col("ship_day") > 29220L, 1L).otherwise(0L))
        .as("v_date_range"))
      .localCheckpoint(true) // one corpus pass; the 7 rule rows read the pinned row
    val rules = Seq("qty_nonpos", "price_nonpos", "disc_range", "tax_range",
      "flag_domain", "status_domain", "date_range")
    rules.map { r =>
      agg.select(lit(r).as("rule"), col("n").as("n_rows"),
        col(s"v_$r").as("n_violations"),
        round(col(s"v_$r").cast("double") / col("n"), 6).as("violation_share"))
    }.reduce(_ unionAll _).orderBy("rule")
  }

  val q238Sql: String =
    """WITH li AS (
      |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |    CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
      |    CAST(round(l_tax * 100) AS BIGINT) AS tax_pct,
      |    l_returnflag, l_linestatus,
      |    epoch_us(l_shipdate) // 86400000000 AS ship_day
      |  FROM lineitem),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN qty_c <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |    CAST(sum(CASE WHEN price_c <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
      |    CAST(sum(CASE WHEN disc_pct < 0 OR disc_pct > 100 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v3,
      |    CAST(sum(CASE WHEN tax_pct < 0 OR tax_pct > 100 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v4,
      |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0
      |      END) AS BIGINT) AS v5,
      |    CAST(sum(CASE WHEN l_linestatus NOT IN ('O','F') THEN 1 ELSE 0 END)
      |      AS BIGINT) AS v6,
      |    CAST(sum(CASE WHEN ship_day < 0 OR ship_day > 29220 THEN 1 ELSE 0
      |      END) AS BIGINT) AS v7
      |  FROM li)
      |SELECT r.rule, a.n AS n_rows,
      |  CASE r.rule
      |    WHEN 'qty_nonpos' THEN a.v1 WHEN 'price_nonpos' THEN a.v2
      |    WHEN 'disc_range' THEN a.v3 WHEN 'tax_range' THEN a.v4
      |    WHEN 'flag_domain' THEN a.v5 WHEN 'status_domain' THEN a.v6
      |    ELSE a.v7 END AS n_violations,
      |  round(CAST(CASE r.rule
      |    WHEN 'qty_nonpos' THEN a.v1 WHEN 'price_nonpos' THEN a.v2
      |    WHEN 'disc_range' THEN a.v3 WHEN 'tax_range' THEN a.v4
      |    WHEN 'flag_domain' THEN a.v5 WHEN 'status_domain' THEN a.v6
      |    ELSE a.v7 END AS DOUBLE) / a.n, 6) AS violation_share
      |FROM a CROSS JOIN (
      |  SELECT unnest(['qty_nonpos','price_nonpos','disc_range','tax_range',
      |    'flag_domain','status_domain','date_range']) AS rule) r
      |ORDER BY rule""".stripMargin

  // ---------------------------------------------------------------- q239
  /** Primary-key duplicate census: per table, distinct keys, rows in
    * duplicated keys, and the max multiplicity.
    */
  val q239: Q = (s, d) => {
    def dupes(name: String, df: DataFrame, keys: Seq[String]): DataFrame = {
      val cnt = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      cnt.agg(count(lit(1)).as("n_keys"),
          sum(when(col("c") > 1L, col("c")).otherwise(0L)).as("rows_in_dupes"),
          sum(when(col("c") > 1L, 1L).otherwise(0L)).as("n_dup_keys"),
          max(col("c")).as("max_multiplicity"))
        .select(lit(name).as("table_pk"), col("n_keys"), col("n_dup_keys"),
          col("rows_in_dupes"), col("max_multiplicity"))
    }
    dupes("lineitem(orderkey,linenumber)", Graft.table(s, d, "lineitem"),
        Seq("l_orderkey", "l_linenumber"))
      .unionAll(dupes("orders(orderkey)", Graft.table(s, d, "orders"),
        Seq("o_orderkey")))
      .unionAll(dupes("customer(custkey)", Graft.table(s, d, "customer"),
        Seq("c_custkey")))
      .unionAll(dupes("part(partkey)", Graft.table(s, d, "part"),
        Seq("p_partkey")))
      .unionAll(dupes("supplier(suppkey)", Graft.table(s, d, "supplier"),
        Seq("s_suppkey")))
      .unionAll(dupes("documents(doc_id)", Graft.table(s, d, "documents"),
        Seq("doc_id")))
      .orderBy("table_pk")
  }

  val q239Sql: String = {
    def dup(name: String, table: String, keys: String): String =
      s"""SELECT '$name' AS table_pk, CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
         |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         |    AS rows_in_dupes,
         |  CAST(max(c) AS BIGINT) AS max_multiplicity
         |FROM (SELECT $keys, count(*) AS c FROM $table GROUP BY $keys)""".stripMargin
    Seq(
      dup("lineitem(orderkey,linenumber)", "lineitem", "l_orderkey, l_linenumber"),
      dup("orders(orderkey)", "orders", "o_orderkey"),
      dup("customer(custkey)", "customer", "c_custkey"),
      dup("part(partkey)", "part", "p_partkey"),
      dup("supplier(suppkey)", "supplier", "s_suppkey"),
      dup("documents(doc_id)", "documents", "doc_id"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_pk")
  }

  // ---------------------------------------------------------------- q240
  /** Cross-field consistency: o_totalprice vs the order's line sum
    * Σ extendedprice·(1−discount)·(1+tax), both as exact cents; the
    * relative-error histogram uses integer cross-multiplication
    * (|derived − stated|·10^k ≥ stated — no division under a
    * comparison).
    */
  val q240: Q = (s, d) => {
    val line = Graft.table(s, d, "lineitem")
      .select(col("l_orderkey"),
        expr("""CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                * 100) AS BIGINT)""").as("cents"))
      .groupBy(col("l_orderkey")).agg(sum(col("cents")).as("derived"))
    val o = Graft.table(s, d, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("stated"))
    o.join(line, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("stated"), coalesce(col("derived"), lit(0L)).as("derived"))
      .withColumn("adiff", abs(col("derived") - col("stated")))
      .select(
        when(col("adiff") === 0L, "exact")
          .when(col("adiff") * 10000L < col("stated"), "lt_0.01pct")
          .when(col("adiff") * 100L < col("stated"), "lt_1pct")
          .when(col("adiff") * 10L < col("stated"), "lt_10pct")
          .otherwise("ge_10pct").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_orders"))
      .orderBy("bucket")
  }

  val q240Sql: String =
    """WITH line AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
      |      * 100) AS BIGINT)) AS BIGINT) AS derived
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS stated,
      |    coalesce(l.derived, 0) AS derived
      |  FROM orders o LEFT JOIN line l ON l.l_orderkey = o.o_orderkey),
      |b AS (
      |  SELECT CASE
      |    WHEN abs(derived - stated) = 0 THEN 'exact'
      |    WHEN abs(derived - stated) * 10000 < stated THEN 'lt_0.01pct'
      |    WHEN abs(derived - stated) * 100 < stated THEN 'lt_1pct'
      |    WHEN abs(derived - stated) * 10 < stated THEN 'lt_10pct'
      |    ELSE 'ge_10pct' END AS bucket
      |  FROM j)
      |SELECT bucket, count(*) AS n_orders FROM b
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q237_referential_audit", q237, Some(q237Sql)),
    ("q238_contract_violations", q238, Some(q238Sql)),
    ("q239_pk_duplicates", q239, Some(q239Sql)),
    ("q240_total_consistency", q240, Some(q240Sql)))
}
