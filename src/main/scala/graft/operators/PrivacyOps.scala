package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Privacy / re-identification audit (round 6, eleventh pack): before a
  * customer table feeds a training corpus, the release-review
  * questions — k-anonymity class sizes (q185), l-diversity of the
  * sensitive attribute inside each class (q186), the uniqueness-risk
  * ladder as quasi-identifiers accumulate (q187), and the
  * generalization trade-off curve for the numeric identifier (q188).
  *
  * Scale notes (the 100 TB story): every query is one map-side-
  * combined groupBy on the quasi-identifier key followed by
  * aggregations over the CLASS table (bounded by #distinct QI tuples,
  * not records); the ladder/curve variants union a fixed number of
  * such passes. No windows over records, no joins bigger than the
  * class table.
  *
  * Exactness: class sizes, distinct counts, and uniqueness counts are
  * integers; account balances discretize through exact integer cents
  * (round(x·100) → BIGINT, the micro-unit rule) SHIFTED non-negative
  * before integral division — Spark's DIV truncates toward zero while
  * DuckDB's // floors, so bands must never see a negative numerator.
  * Shares are single divisions rounded on output.
  */
object PrivacyOps {
  import Relational.Q

  /** Exact integer cents, shifted non-negative (acctbal ≥ -999.99). */
  private val centsExpr = "CAST(round(c_acctbal * 100) AS BIGINT) + 100000"
  private val centsSql = "CAST(round(c_acctbal * 100) AS BIGINT) + 100000"

  // ---------------------------------------------------------------- q185
  /** k-anonymity census for QI = (nation, segment, 100-unit balance
    * band): the distribution of equivalence-class sizes, with each
    * size's record share and the share of records below the k=5 bar.
    */
  val q185: Q = (s, d) => {
    val classes = Graft.table(s, d, "customer")
      .withColumn("band", expr(s"($centsExpr) DIV 10000"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint(true) // class-table-sized; feeds the census AND the total
    val tot = classes.agg(sum(col("k")).as("n_total"))
    classes.groupBy(col("k")).agg(count(lit(1)).as("n_classes"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("n_classes"),
        (col("k") * col("n_classes")).as("n_records"),
        round((col("k") * col("n_classes")).cast("double") / col("n_total"), 6)
          .as("record_share"),
        when(col("k") < 5L, col("k") * col("n_classes")).otherwise(0L)
          .as("n_below_k5"))
      .orderBy("k")
  }

  val q185Sql: String =
    s"""WITH cls AS (
       |  SELECT c_nationkey, c_mktsegment, ($centsSql) // 10000 AS band,
       |    CAST(count(*) AS BIGINT) AS k
       |  FROM customer GROUP BY 1, 2, 3),
       |t AS (SELECT CAST(sum(k) AS BIGINT) AS n_total FROM cls)
       |SELECT k, count(*) AS n_classes,
       |  CAST(k * count(*) AS BIGINT) AS n_records,
       |  round(CAST(k * count(*) AS DOUBLE) / max(t.n_total), 6) AS record_share,
       |  CAST(CASE WHEN k < 5 THEN k * count(*) ELSE 0 END AS BIGINT) AS n_below_k5
       |FROM cls CROSS JOIN t
       |GROUP BY k ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q186
  /** l-diversity of the sensitive attribute (market segment) inside
    * each QI = (nation, 100-unit balance band) class: how many classes
    * and records sit at each diversity level l — l=1 classes leak the
    * segment outright.
    */
  val q186: Q = (s, d) => {
    val classes = Graft.table(s, d, "customer")
      .withColumn("band", expr(s"($centsExpr) DIV 10000"))
      .groupBy(col("c_nationkey"), col("band"))
      .agg(count(lit(1)).as("k"), countDistinct(col("c_mktsegment")).as("l"))
    classes.groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_records"))
      .orderBy("l")
  }

  val q186Sql: String =
    s"""WITH cls AS (
       |  SELECT c_nationkey, ($centsSql) // 10000 AS band,
       |    CAST(count(*) AS BIGINT) AS k,
       |    CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
       |  FROM customer GROUP BY 1, 2)
       |SELECT l, count(*) AS n_classes, CAST(sum(k) AS BIGINT) AS n_records
       |FROM cls GROUP BY l ORDER BY l""".stripMargin

  // ---------------------------------------------------------------- q187
  /** Uniqueness-risk ladder: as quasi-identifiers accumulate (nation →
    * +segment → +balance band → +exact cents), how many equivalence
    * classes exist, how many records become unique, and the minimum
    * class size. One fixed-size union of four class-table passes.
    */
  val q187: Q = (s, d) => {
    // ONE corpus pass: the finest class table (nation, segment, cents) is
    // bounded by distinct QI tuples; every coarser level is an exact
    // rollup of its counts — no second scan of the records
    val fine = Graft.table(s, d, "customer")
      .withColumn("cents", expr(centsExpr))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("cents"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint(true)
    def level(lv: Int, classes: DataFrame): DataFrame =
      classes
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("k") === 1L, 1L).otherwise(0L)).as("n_unique"),
          min(col("k")).as("min_k"), sum(col("k")).as("n_total"))
        .select(lit(lv).as("level"), col("n_classes"), col("n_unique"),
          col("min_k"),
          round(col("n_unique").cast("double") / col("n_total"), 6)
            .as("unique_share"))
    def rollup(keys: Seq[String]): DataFrame =
      fine.withColumn("band", expr("cents DIV 10000"))
        .groupBy(keys.map(col): _*).agg(sum(col("k")).as("k"))
    level(1, rollup(Seq("c_nationkey")))
      .union(level(2, rollup(Seq("c_nationkey", "c_mktsegment"))))
      .union(level(3, rollup(Seq("c_nationkey", "c_mktsegment", "band"))))
      .union(level(4, fine))
      .orderBy("level")
  }

  val q187Sql: String = {
    def lv(i: Int, keys: String): String =
      s"""SELECT $i AS level, count(*) AS n_classes,
         |  CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  CAST(min(k) AS BIGINT) AS min_k,
         |  round(CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / sum(k), 6) AS unique_share
         |FROM (SELECT CAST(count(*) AS BIGINT) AS k FROM cust GROUP BY $keys)""".stripMargin
    s"""WITH cust AS (
       |  SELECT c_nationkey, c_mktsegment, $centsSql AS cents,
       |    ($centsSql) // 10000 AS band
       |  FROM customer)
       |${lv(1, "c_nationkey")}
       |UNION ALL ${lv(2, "c_nationkey, c_mktsegment")}
       |UNION ALL ${lv(3, "c_nationkey, c_mktsegment, band")}
       |UNION ALL ${lv(4, "c_nationkey, c_mktsegment, cents")}
       |ORDER BY level""".stripMargin
  }

  // ---------------------------------------------------------------- q188
  /** Generalization trade-off curve: for balance-band widths of 1, 10,
    * 100, and 1000 units under QI = (nation, segment, band), the
    * minimum k, the share of records meeting k ≥ 5, and the class
    * count — privacy gained vs resolution lost, one row per width.
    */
  val q188: Q = (s, d) => {
    // same one-pass rollup discipline as q187: every width is an exact
    // regrouping of the finest (nation, segment, cents) class table
    val fine = Graft.table(s, d, "customer")
      .withColumn("cents", expr(centsExpr))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("cents"))
      .agg(count(lit(1)).as("k0"))
      .localCheckpoint(true)
    def width(wu: Long): DataFrame =
      fine.withColumn("band", expr(s"cents DIV ${wu * 100}"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
        .agg(sum(col("k0")).as("k"))
        .agg(count(lit(1)).as("n_classes"), min(col("k")).as("min_k"),
          sum(when(col("k") >= 5L, col("k")).otherwise(0L)).as("n_k5"),
          sum(col("k")).as("n_total"))
        .select(lit(wu).as("band_width"), col("n_classes"), col("min_k"),
          round(col("n_k5").cast("double") / col("n_total"), 6).as("k5_share"))
    width(1L).union(width(10L)).union(width(100L)).union(width(1000L))
      .orderBy("band_width")
  }

  val q188Sql: String = {
    def wv(wu: Long): String =
      s"""SELECT CAST($wu AS BIGINT) AS band_width, count(*) AS n_classes,
         |  CAST(min(k) AS BIGINT) AS min_k,
         |  round(CAST(sum(CASE WHEN k >= 5 THEN k ELSE 0 END) AS DOUBLE)
         |    / sum(k), 6) AS k5_share
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS k FROM cust
         |  GROUP BY c_nationkey, c_mktsegment, cents // ${wu * 100})""".stripMargin
    s"""WITH cust AS (
       |  SELECT c_nationkey, c_mktsegment, $centsSql AS cents FROM customer)
       |${wv(1L)}
       |UNION ALL ${wv(10L)}
       |UNION ALL ${wv(100L)}
       |UNION ALL ${wv(1000L)}
       |ORDER BY band_width""".stripMargin
  }

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q185_k_anonymity", q185, Some(q185Sql)),
    ("q186_l_diversity", q186, Some(q186Sql)),
    ("q187_uniqueness_ladder", q187, Some(q187Sql)),
    ("q188_generalization_curve", q188, Some(q188Sql)))
}
