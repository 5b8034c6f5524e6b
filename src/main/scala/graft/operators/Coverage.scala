package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft

/** Coverage pack: the long tail of the relational surface — cube grouping,
  * aggregate-filtered joins (HAVING), string function library, date
  * arithmetic, and null semantics. Same oracle-parity discipline as
  * Relational.
  */
object Coverage {
  import Relational.Q

  private def dec(c: Column, scale: Int = 4): Column = c.cast(s"decimal(18,$scale)")

  // ---------------------------------------------------------------- q30
  val q30: Q = (s, d) =>
    Graft.table(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_price"))
      .orderBy("flag", "status")

  val q30Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Aggregate-then-filter join (HAVING semantics): big spenders. */
  val q31: Q = (s, d) => {
    val spend = Graft.table(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("spend"))
      .filter(col("spend") > 3000000.0)
    val c = Graft.table(s, d, "customer")
    spend.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("spend"))
      .orderBy("c_custkey")
  }

  val q31Sql: String =
    """SELECT c_custkey, c_name, spend FROM customer
      |JOIN (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
      |      FROM orders GROUP BY o_custkey HAVING spend > 3000000.0) ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Scalar string-function library over part names. */
  val q32: Q = (s, d) =>
    Graft.table(s, d, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).cast("long").as("nlen"),
        substring(col("p_type"), 1, 5).as("type5"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        reverse(col("p_brand")).as("rbrand"),
        instr(col("p_type"), "ED").cast("long").as("ed_pos"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
        col("p_name").like("%gre%").as("has_gre"))
      .orderBy("p_partkey")

  val q32Sql: String =
    """SELECT p_partkey, upper(p_name) AS uname, CAST(length(p_name) AS BIGINT) AS nlen,
      |  substring(p_type, 1, 5) AS type5, replace(p_name, ' ', '_') AS snake,
      |  reverse(p_brand) AS rbrand, CAST(strpos(p_type, 'ED') AS BIGINT) AS ed_pos,
      |  p_brand || '|' || p_type AS bt, p_name LIKE '%gre%' AS has_gre
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Date/time arithmetic and parts. */
  val q33: Q = (s, d) =>
    Graft.table(s, d, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"))
      .orderBy("o_orderkey")

  val q33Sql: String =
    """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
      |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |  CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Null semantics: nullif/coalesce, count(col) vs count(*), null-skipping
    * aggregates.
    */
  val q34: Q = (s, d) =>
    Graft.table(s, d, "lineitem")
      .withColumn("disc_or_null", expr("nullif(l_discount, 0.0)"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("disc_or_null")).as("n_discounted"),
        sum(dec(coalesce(col("disc_or_null"), lit(0.0)), 6)).cast("double").as("sum_disc"),
        min(col("disc_or_null")).as("min_disc"),
        max(col("disc_or_null")).as("max_disc"))
      .orderBy("l_returnflag")

  val q34Sql: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
      |  CAST(SUM(CAST(COALESCE(NULLIF(l_discount, 0.0), 0.0) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc,
      |  MIN(NULLIF(l_discount, 0.0)) AS min_disc,
      |  MAX(NULLIF(l_discount, 0.0)) AS max_disc
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Map-typed columns (build / keys / filter / transform / lookup) plus
    * the math scalar library; rounded to 6dp where libm ulp differences
    * between engines could surface.
    */
  val q48: Q = (s, d) =>
    Graft.table(s, d, "lineitem")
      .withColumn("m", map(
        lit("qty"), col("l_quantity"),
        lit("price"), col("l_extendedprice"),
        lit("disc"), col("l_discount")))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys"),
        size(expr("map_filter(m, (k, v) -> v >= 10.0)")).cast("long").as("n_big"),
        element_at(col("m"), "qty").as("qty_lookup"),
        round(expr("aggregate(map_values(transform_values(m, (k, v) -> v * 2.0)), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"), 6).as("doubled_sum"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        // cast: DuckDB's sign() yields a tinyint while Spark's signum yields a
        // double — identical values hash differently unless both sides agree
        signum(col("l_quantity") - 25.0).cast("long").as("qty_sign"),
        round(greatest(col("l_quantity"), col("l_discount") * 100), 6).as("gr"),
        pmod(col("l_orderkey"), lit(7)).cast("long").as("key_mod"))
      .orderBy("l_orderkey", "l_linenumber")

  val q48Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  'disc,price,qty' AS keys,
      |  CAST((CASE WHEN l_quantity >= 10 THEN 1 ELSE 0 END) +
      |       (CASE WHEN l_extendedprice >= 10 THEN 1 ELSE 0 END) +
      |       (CASE WHEN l_discount >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      |  l_quantity AS qty_lookup,
      |  round(((l_quantity * 2.0 + l_extendedprice * 2.0) + l_discount * 2.0), 6) AS doubled_sum,
      |  round(ln(l_extendedprice), 6) AS ln_price,
      |  round(sqrt(l_quantity), 6) AS sqrt_qty,
      |  round(pow(l_discount, 2), 6) AS disc_sq,
      |  CAST(sign(l_quantity - 25.0) AS BIGINT) AS qty_sign,
      |  round(greatest(l_quantity, l_discount * 100), 6) AS gr,
      |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q79
  /** Unpivot (melt): lineitem's four measure columns into (measure,
    * value) rows — the wide-to-long reshape feature stores feed on.
    * `Dataset.unpivot` plans a single Expand (one pass, no shuffle
    * before the final sort); values pass through bit-exact. The oracle
    * spells the same reshape as a UNION ALL, fixing column order and
    * measure names on both sides.
    */
  val q79: Q = (s, d) =>
    Graft.table(s, d, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")

  val q79Sql: String = {
    val arms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(m => s"""SELECT l_orderkey, l_linenumber, '$m' AS measure, $m AS value
                   |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""$arms
       |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin
  }

  // ---------------------------------------------------------------- q80
  /** The window-function suite in one oracle-gated query: lag/lead,
    * rank/dense_rank over a total order, ntile, percent_rank/cume_dist
    * (exact rationals — single divisions of exact integers), and a
    * RANGE event-time frame (count + long-sum over the trailing 5
    * minutes — integer-exact, so no float-association risk inside
    * engine-specific frame evaluation). One shuffle on user_id; every
    * window shares the same partition key, so all frames evaluate in a
    * single sort pass per partition.
    */
  val q80: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val range5m = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-300000000L, 0L)
    Graft.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .select(
        col("user_id"), col("event_id"), col("us"), col("value"),
        lag(col("value"), 1).over(byUser).as("prev_value"),
        lead(col("value"), 1).over(byUser).as("next_value"),
        row_number().over(byUser).as("rn"),
        ntile(4).over(byUser).as("quartile"),
        percent_rank().over(byUser).as("pct_rank"),
        cume_dist().over(byUser).as("cume"),
        count(lit(1)).over(range5m).as("cnt_5m"),
        sum(col("event_id")).over(range5m).as("idsum_5m"))
      .orderBy("user_id", "rn")
  }

  val q80Sql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
      |SELECT user_id, event_id, us, value,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  CAST(row_number() OVER w AS INT) AS rn,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  count(*) OVER r AS cnt_5m,
      |  CAST(sum(event_id) OVER r AS BIGINT) AS idsum_5m
      |FROM e
      |WINDOW
      |  w AS (PARTITION BY user_id ORDER BY us, event_id),
      |  r AS (PARTITION BY user_id ORDER BY us
      |        RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, rn""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q30_cube", q30, Some(q30Sql)),
    ("q31_having_join", q31, Some(q31Sql)),
    ("q32_string_funcs", q32, Some(q32Sql)),
    ("q33_date_arith", q33, Some(q33Sql)),
    ("q34_null_semantics", q34, Some(q34Sql)),
    ("q48_map_math_funcs", q48, Some(q48Sql)),
    ("q79_unpivot", q79, Some(q79Sql)),
    ("q80_window_suite", q80, Some(q80Sql))
  )
}
