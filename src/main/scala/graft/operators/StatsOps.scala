package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft
import graft.functions.murmur3_token

/** Statistical / data-management operator pack: exact second-moment
  * statistics (corr/regression/stddev) with built-in-aggregate accuracy
  * flags, SCD-2 dimension construction, exact-substring contamination
  * detection (the distributed shape of suffix-array dedup, Lee et al.
  * 2021 "Deduplicating Training Data Makes Language Models Better"),
  * single-pass column profiling, priority sampling (Duffield, Lund,
  * Thorup, JACM 2007), and a Count-Min sketch built as a bounded
  * group-by (Cormode & Muthukrishnan 2005).
  *
  * Determinism contract (same as Relational): every aggregated double
  * passes through an exact DECIMAL sum; all downstream double arithmetic
  * is the identical IEEE expression tree in both engines (+,-,*,/,sqrt
  * are correctly rounded, so identical inputs give identical bits).
  */
object StatsOps {
  import Relational.Q

  private def dec30(c: Column): Column = c.cast("decimal(30,6)")

  // ---------------------------------------------------------------- q84
  /** Exact correlation / linear regression / stddev per group from one
    * pass of decimal power sums — the numerically-reproducible way to
    * compute second moments at 100 TB (partial sums merge exactly in any
    * order; no Welford drift across partitions). The engine's built-in
    * single-pass aggregates (`corr`, `regr_slope`, `stddev_samp`) are
    * emitted as accuracy flags against the exact values: each engine
    * asserts ITS OWN builtin lands within 1e-8 of the shared exact
    * formula, so the gate also cross-checks both builtins' numerics.
    */
  val q84: Q = (s, d) => {
    val li = Graft.table(s, d, "lineitem")
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    // square in the DECIMAL domain: y*y ~ 1e10 needs >16 significant
    // decimal digits at 6 dp — beyond double precision, so a double
    // product cast to decimal rounds differently per engine. decimal
    // multiply of the (exactly agreed) 4-dp casts is exact in both.
    val xd = x.cast("decimal(19,4)")
    val yd = y.cast("decimal(19,4)")
    val a = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("cnt"),
      sum(dec30(x)).cast("double").as("sx"),
      sum(dec30(y)).cast("double").as("sy"),
      sum(xd * xd).cast("double").as("sxx"),
      sum(yd * yd).cast("double").as("syy"),
      sum(xd * yd).cast("double").as("sxy"),
      corr(y, x).as("corr_b"),
      regr_slope(y, x).as("slope_b"),
      stddev_samp(x).as("sd_b"))
    val n = col("cnt").cast("double")
    val covn = n * col("sxy") - col("sx") * col("sy")
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    val corrE = covn / sqrt(vx * vy)
    val slopeE = covn / vx
    def near(b: Column, e: Column): Column = abs(b - e) <= lit(1e-8) * (abs(e) + lit(1.0))
    a.select(
      col("l_returnflag"),
      col("cnt").as("n"),
      corrE.as("corr_qty_price"),
      slopeE.as("slope"),
      ((col("sy") - slopeE * col("sx")) / n).as("intercept"),
      (corrE * corrE).as("r2"),
      sqrt(vx / (n * (n - lit(1.0)))).as("stddev_qty"),
      near(col("corr_b"), corrE).as("corr_builtin_ok"),
      near(col("slope_b"), slopeE).as("slope_builtin_ok"),
      near(col("sd_b"), sqrt(vx / (n * (n - lit(1.0))))).as("stddev_builtin_ok"))
      .orderBy("l_returnflag")
  }

  /** Oracle note: DuckDB's DECIMAL->DOUBLE cast computes a scaled double
    * division and can land 1 ulp off correct rounding at 12+ significant
    * digits; routing through VARCHAR (fast_float strtod, correctly
    * rounded) matches Spark's BigDecimal.doubleValue exactly.
    */
  val q84Sql: String =
    """WITH a AS (
      |  SELECT l_returnflag, COUNT(*) AS cnt,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxy,
      |    corr(l_extendedprice, l_quantity) AS corr_b,
      |    regr_slope(l_extendedprice, l_quantity) AS slope_b,
      |    stddev_samp(l_quantity) AS sd_b
      |  FROM lineitem GROUP BY l_returnflag),
      |e AS (
      |  SELECT l_returnflag, cnt, corr_b, slope_b, sd_b,
      |    CAST(cnt AS DOUBLE) AS n, sx, sy,
      |    (CAST(cnt AS DOUBLE) * sxy - sx * sy) AS covn,
      |    (CAST(cnt AS DOUBLE) * sxx - sx * sx) AS vx,
      |    (CAST(cnt AS DOUBLE) * syy - sy * sy) AS vy
      |  FROM a)
      |SELECT l_returnflag, cnt AS n,
      |  covn / sqrt(vx * vy) AS corr_qty_price,
      |  covn / vx AS slope,
      |  (sy - (covn / vx) * sx) / n AS intercept,
      |  (covn / sqrt(vx * vy)) * (covn / sqrt(vx * vy)) AS r2,
      |  sqrt(vx / (n * (n - 1.0))) AS stddev_qty,
      |  abs(corr_b - covn / sqrt(vx * vy)) <= 1e-8 * (abs(covn / sqrt(vx * vy)) + 1.0) AS corr_builtin_ok,
      |  abs(slope_b - covn / vx) <= 1e-8 * (abs(covn / vx) + 1.0) AS slope_builtin_ok,
      |  abs(sd_b - sqrt(vx / (n * (n - 1.0)))) <= 1e-8 * (abs(sqrt(vx / (n * (n - 1.0)))) + 1.0) AS stddev_builtin_ok
      |FROM e ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q85
  /** SCD Type-2 dimension build: each customer's order history becomes a
    * versioned dimension with [valid_from, valid_to) intervals and an
    * is_current flag — the standard warehouse shape for tracking change
    * over time. One shuffle on the dimension key; the lead() window is
    * partition-local, so the plan is a single key-partitioned sort at
    * any scale.
    */
  val q85: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Graft.table(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_ts", lead(col("o_orderdate"), 1).over(w))
      .select(
        col("o_custkey"), col("o_orderkey"), col("version"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"),
        col("o_totalprice"))
      .orderBy("o_custkey", "version")
  }

  val q85Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  strftime(LEAD(o_orderdate, 1) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
      |  LEAD(o_orderdate, 1) OVER w IS NULL AS is_current,
      |  o_totalprice
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, version""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Exact-substring contamination: find document pairs sharing a run of
    * >= 3 consecutive identical 8-token windows (i.e. an identical
    * substring of >= 10 tokens) — the distributed formulation of
    * suffix-array substring dedup (Lee et al. 2021): positional k-gram
    * fingerprints, an equality join on the gram hash, and a run-length
    * pass over matched positions (consecutive positions at a constant
    * offset delta form one shared span).
    *
    * Scale shape: the join is bucketed by gram hash (one shuffle); grams
    * with document frequency outside [2, 32] are dropped first — df=1
    * grams cannot produce a pair, and ultra-hot grams are boilerplate
    * that q56's span removal handles upstream (the cap is the documented
    * guard against a degenerate self-join, mirrored by the oracle).
    */
  private val SubK = 8 // tokens per window
  private val SubMinRun = 3 // >= 3 consecutive windows = >= SubK+2 tokens

  /** (doc_id, pos, gh): positional SubK-token window hashes of the
    * normalized text — shared by q86 and the Verify fixture dump so the
    * DuckDB oracle re-derives the join + run-length from the same grams.
    * One codegen'd `pos_gram_hashes` evaluation per row (hash values
    * equal murmur3_token of the space-joined window string); the
    * built-in transform/slice/concat_ws composition is interpreted and
    * was the whole query's bottleneck at sf0.1.
    */
  private[graft] def posGrams(s: SparkSession, d: String): DataFrame =
    Graft.table(s, d, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.pos_gram_hashes(col("text"), SubK)).as(Seq("pos", "gh")))

  val q86: Q = (s, d) => {
    val g = posGrams(s, d)
    val keep = g.groupBy(col("gh")).agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df").between(2, 32)).select(col("gh"))
    // materialize the df-gated postings once: both join sides and the
    // run-length pass reuse it, and the gate has already shrunk it to the
    // shared-gram survivors (at 100 TB this is the persisted candidate
    // postings table, tiny next to the corpus)
    val gf = g.join(keep, "gh").localCheckpoint()
    val m = gf.select(col("gh"), col("doc_id").as("doc_a"), col("pos").as("pa"))
      .join(gf.select(col("gh"), col("doc_id").as("doc_b"), col("pos").as("pb")), Seq("gh"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("delta", col("pa") - col("pb"))
    val runs = m
      .withColumn("grp", col("pa") - row_number().over(
        Window.partitionBy(col("doc_a"), col("doc_b"), col("delta")).orderBy(col("pa"))))
      .groupBy(col("doc_a"), col("doc_b"), col("delta"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
    runs.groupBy(col("doc_a"), col("doc_b")).agg(max(col("run_len")).as("max_run"))
      .where(col("max_run") >= SubMinRun)
      .select(col("doc_a"), col("doc_b"), col("max_run"),
        (col("max_run") + lit((SubK - 1).toLong)).as("span_tokens"))
      .orderBy("doc_a", "doc_b")
  }

  val q86Sql: String =
    s"""WITH g AS (
       |  SELECT doc_id, pos, gh
       |  FROM read_parquet('/tmp/graft_fixtures/substr_grams/*.parquet')),
       |keep AS (
       |  SELECT gh FROM (SELECT gh, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gh)
       |  WHERE df BETWEEN 2 AND 32),
       |m AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, a.pos - b.pos AS delta
       |  FROM g a JOIN keep USING (gh) JOIN g b USING (gh)
       |  WHERE a.doc_id < b.doc_id),
       |r AS (
       |  SELECT doc_a, doc_b, delta, pa,
       |    pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, delta ORDER BY pa) AS grp
       |  FROM m),
       |runs AS (
       |  SELECT doc_a, doc_b, COUNT(*) AS run_len
       |  FROM r GROUP BY doc_a, doc_b, delta, grp)
       |SELECT doc_a, doc_b, MAX(run_len) AS max_run,
       |  MAX(run_len) + ${SubK - 1} AS span_tokens
       |FROM runs GROUP BY doc_a, doc_b HAVING MAX(run_len) >= $SubMinRun
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- q87
  /** Single-pass column profiler — the data-quality audit every pipeline
    * runs before training: per-column null count, exact distinct count,
    * numeric min/max, and lexical min/max, emitted long-form. One
    * aggregate job over the table (multi-distinct resolves to one
    * Expand), then a row-local inline() to long form — profiling 100 TB
    * costs one scan.
    */
  val q87: Q = (s, d) => {
    // long-form FIRST (one inline per row), then ONE group-by with a
    // single distinct per group key: a wide single-row agg mixing six
    // countDistincts forces Spark into a SortAggregate/Expand chain with
    // set-valued buffers — measured 3.4 s vs 0.6 s for this shape on the
    // identical input. Long form is also the scalable profiler plan: the
    // per-column distinct partials combine map-side and shuffle only
    // (col_name, value)-distinct partials, never rows.
    val o = Graft.table(s, d, "orders")
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    def numRow(name: String, c: Column): Column = struct(
      lit(name).as("col_name"), c.cast("double").as("num"),
      c.cast("string").as("sv"), nullS.as("str"))
    def strRow(name: String, c: Column): Column = struct(
      lit(name).as("col_name"), nullD.as("num"), c.as("sv"), c.as("str"))
    val long = o.select(inline(array(
      numRow("o_orderkey", col("o_orderkey")),
      numRow("o_custkey", col("o_custkey")),
      numRow("o_totalprice", col("o_totalprice")),
      strRow("o_orderstatus", col("o_orderstatus")),
      strRow("o_orderpriority", col("o_orderpriority")),
      // sv: full-precision cast (injective, exact distinct); str: the
      // displayed second-resolution form (min/max monotonic either way)
      struct(lit("o_orderdate").as("col_name"), nullD.as("num"),
        col("o_orderdate").cast("string").as("sv"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("str")))))
    long.groupBy(col("col_name"))
      .agg(
        (count(lit(1)) - count(col("sv"))).as("n_null"),
        countDistinct(col("sv")).as("n_distinct"),
        min(col("num")).as("min_num"), max(col("num")).as("max_num"),
        min(col("str")).as("min_str"), max(col("str")).as("max_str"))
      .orderBy("col_name")
  }

  val q87Sql: String =
    """WITH a AS (
      |  SELECT COUNT(*) AS n_rows,
      |    COUNT(o_orderkey) AS nn_key, COUNT(DISTINCT o_orderkey) AS nd_key,
      |    CAST(MIN(o_orderkey) AS DOUBLE) AS min_key, CAST(MAX(o_orderkey) AS DOUBLE) AS max_key,
      |    COUNT(o_custkey) AS nn_cust, COUNT(DISTINCT o_custkey) AS nd_cust,
      |    CAST(MIN(o_custkey) AS DOUBLE) AS min_cust, CAST(MAX(o_custkey) AS DOUBLE) AS max_cust,
      |    COUNT(o_totalprice) AS nn_price, COUNT(DISTINCT o_totalprice) AS nd_price,
      |    MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
      |    COUNT(o_orderstatus) AS nn_status, COUNT(DISTINCT o_orderstatus) AS nd_status,
      |    MIN(o_orderstatus) AS min_status, MAX(o_orderstatus) AS max_status,
      |    COUNT(o_orderpriority) AS nn_prio, COUNT(DISTINCT o_orderpriority) AS nd_prio,
      |    MIN(o_orderpriority) AS min_prio, MAX(o_orderpriority) AS max_prio,
      |    COUNT(o_orderdate) AS nn_date, COUNT(DISTINCT o_orderdate) AS nd_date,
      |    strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_date,
      |    strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date
      |  FROM orders)
      |SELECT col_name, n_null, n_distinct, min_num, max_num, min_str, max_str FROM (
      |  SELECT 'o_orderkey' AS col_name, n_rows - nn_key AS n_null, nd_key AS n_distinct, min_key AS min_num, max_key AS max_num, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
      |  UNION ALL SELECT 'o_custkey', n_rows - nn_cust, nd_cust, min_cust, max_cust, NULL, NULL FROM a
      |  UNION ALL SELECT 'o_totalprice', n_rows - nn_price, nd_price, min_price, max_price, NULL, NULL FROM a
      |  UNION ALL SELECT 'o_orderstatus', n_rows - nn_status, nd_status, NULL, NULL, min_status, max_status FROM a
      |  UNION ALL SELECT 'o_orderpriority', n_rows - nn_prio, nd_prio, NULL, NULL, min_prio, max_prio FROM a
      |  UNION ALL SELECT 'o_orderdate', n_rows - nn_date, nd_date, NULL, NULL, min_date, max_date FROM a)
      |ORDER BY col_name""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Priority sampling (Duffield, Lund, Thorup JACM 2007): a weighted
    * sample of k=20 documents by n_chars with the unbiased subset-sum
    * estimator w_est = max(w, tau), tau = the (k+1)-th priority. The
    * priority q = w / u uses a uniform u derived from the engine's own
    * murmur3 token (52 mantissa bits), so every arithmetic step is an
    * exactly-rounded IEEE op both engines compute identically — the
    * sample AND the estimator are bit-reproducible across engines and
    * cluster sizes.
    *
    * Scale shape: top-(k+1) by priority compiles to
    * TakeOrderedAndProject (per-partition heap + driver merge of k+1
    * rows), NOT a global sort — the 100 TB plan is a linear scan.
    */
  private val PrioK = 20

  /** (doc_id, tok): the doc_id hash fixture shared with the oracle. */
  private[graft] def docTokens(s: SparkSession, d: String): DataFrame =
    Graft.table(s, d, "documents")
      .select(col("doc_id"), murmur3_token(col("doc_id").cast("string")).as("tok"))

  val q88: Q = (s, d) => {
    val m52 = 4503599627370495L // 2^52 - 1
    val u = (col("tok").bitwiseAND(lit(m52)).cast("double") + lit(1.0)) / lit(4503599627370496.0)
    val prio = Graft.table(s, d, "documents").select(col("doc_id"), col("n_chars"))
      .join(docTokens(s, d), "doc_id")
      .withColumn("w", col("n_chars").cast("double"))
      .withColumn("q", col("w") / u)
      .select(col("doc_id"), col("w"), col("q"))
    val top = prio.orderBy(desc("q"), asc("doc_id")).limit(PrioK + 1)
    val rk = top.withColumn("rk",
      row_number().over(Window.orderBy(desc("q"), asc("doc_id"))))
    val tau = rk.where(col("rk") === PrioK + 1).select(col("q").as("tau"))
    rk.where(col("rk") <= PrioK)
      .crossJoin(broadcast(tau))
      .select(col("doc_id"), col("w"),
        when(col("w") > col("tau"), col("w")).otherwise(col("tau")).as("w_est"))
      .orderBy("doc_id")
  }

  val q88Sql: String =
    s"""WITH h AS (
       |  SELECT doc_id, tok FROM read_parquet('/tmp/graft_fixtures/doc_tokens/*.parquet')),
       |p AS (
       |  SELECT d.doc_id, CAST(n_chars AS DOUBLE) AS w,
       |    CAST(n_chars AS DOUBLE) /
       |      ((CAST((tok & 4503599627370495) AS DOUBLE) + 1.0) / 4503599627370496.0) AS q
       |  FROM documents d JOIN h USING (doc_id)),
       |r AS (
       |  SELECT doc_id, w, q, ROW_NUMBER() OVER (ORDER BY q DESC, doc_id) AS rk FROM p)
       |SELECT doc_id, w, CASE WHEN w > tau THEN w ELSE tau END AS w_est
       |FROM r CROSS JOIN (SELECT q AS tau FROM r WHERE rk = ${PrioK + 1}) t
       |WHERE rk <= $PrioK ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Count-Min sketch (Cormode & Muthukrishnan 2005) as a bounded
    * group-by: depth 4 x width 2048 counters over the event user stream —
    * the fixed-size frequency summary whose build is a map-side-combined
    * aggregation with OUTPUT cardinality 8192 regardless of key count.
    * Probing min-over-rows gives est >= exact always (counts only ever
    * collide upward); the top-10 estimated users are emitted with their
    * exact counts and overcount, all integers, so the gate is exact. The
    * probe joins a broadcast of the 8k-row sketch.
    */
  private val CmsDepth = 4
  private val CmsWidth = 2048

  private def cmsBucket(row: Column, user: Column): Column =
    pmod(murmur3_token(concat_ws(":", row, user)), lit(CmsWidth))

  /** (user_id, row, bucket) for every distinct user — the oracle's way
    * back from user to sketch cell.
    */
  private[graft] def cmsBuckets(s: SparkSession, d: String): DataFrame =
    Graft.events(s, d).select(col("user_id")).distinct()
      .select(col("user_id"), explode(sequence(lit(0), lit(CmsDepth - 1))).as("row"))
      .withColumn("bucket", cmsBucket(col("row"), col("user_id")))

  val q89: Q = (s, d) => {
    val ev = Graft.events(s, d).select(col("user_id"))
    val sketch = ev
      .select(col("user_id"), explode(sequence(lit(0), lit(CmsDepth - 1))).as("row"))
      .withColumn("bucket", cmsBucket(col("row"), col("user_id")))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("c"))
    val est = cmsBuckets(s, d)
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col("user_id")).agg(min(col("c")).as("est"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
    est.join(exact, "user_id")
      .orderBy(desc("est"), asc("user_id")).limit(10)
      .select(col("user_id"), col("est"), col("exact_n"),
        (col("est") - col("exact_n")).as("overcount"))
      .orderBy(desc("est"), asc("user_id"))
  }

  val q89Sql: String =
    """WITH f AS (
      |  SELECT user_id, row, bucket
      |  FROM read_parquet('/tmp/graft_fixtures/cms_buckets/*.parquet')),
      |sk AS (
      |  SELECT f.row, f.bucket, COUNT(*) AS c
      |  FROM events e JOIN f ON e.user_id = f.user_id GROUP BY f.row, f.bucket),
      |est AS (
      |  SELECT f.user_id, MIN(sk.c) AS est
      |  FROM (SELECT DISTINCT user_id, row, bucket FROM f) f
      |  JOIN sk USING (row, bucket) GROUP BY f.user_id),
      |ex AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id)
      |SELECT user_id, est, exact_n, est - exact_n AS overcount
      |FROM est JOIN ex USING (user_id)
      |ORDER BY est DESC, user_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Incremental aggregate maintenance: the base partition's
    * PRE-AGGREGATED state merged with a fresh delta's pre-aggregate —
    * count/sum/min/max compose associatively, so maintaining a 100 TB
    * rollup costs one pass over the DELTA plus a merge of two
    * aggregate-sized tables, never a rescan of the base. The oracle
    * aggregates the whole table directly, so the gate proves
    * merge(pre(base), pre(delta)) == full recompute, exactly (decimal
    * sums are order-independent).
    */
  val q90: Q = (s, d) => {
    val ord = Graft.table(s, d, "orders")
    def pre(df: DataFrame): DataFrame =
      df.groupBy(col("o_custkey")).agg(
        count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,4)")).as("sp"),
        min(col("o_orderdate")).as("mn"),
        max(col("o_orderdate")).as("mx"))
    val base = pre(ord.where(col("o_orderdate") < lit("1997-01-01")))
    val delta = pre(ord.where(col("o_orderdate") >= lit("1997-01-01")))
    base.unionByName(delta)
      .groupBy(col("o_custkey"))
      .agg(
        sum(col("cnt")).as("n_orders"),
        sum(col("sp")).cast("double").as("total_price"),
        date_format(min(col("mn")), "yyyy-MM-dd HH:mm:ss").as("first_order"),
        date_format(max(col("mx")), "yyyy-MM-dd HH:mm:ss").as("last_order"))
      .orderBy("o_custkey")
  }

  val q90Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
      |  strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_order,
      |  strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Z-order (Morton curve) layout audit: interleave 16 bits of the two
    * filter dimensions (customer, integer price) into one clustering key
    * and report each of the 64 top-level z-ranges' row count and
    * per-dimension min/max envelope. Sorting a 100 TB table by zval
    * makes file-level min/max stats tight in BOTH dimensions at once —
    * this query is the audit a layout job runs to confirm each file's
    * envelope covers a small rectangle, i.e. 2-D predicate pushdown
    * will prune. Bit arithmetic only, so the gate is integer-exact.
    */
  val q91: Q = (s, d) => {
    val ord = Graft.table(s, d, "orders")
      .withColumn("xb", col("o_custkey").bitwiseAND(lit(65535L)))
      .withColumn("yb", floor(col("o_totalprice")).cast("long").bitwiseAND(lit(65535L)))
      // r12: the bit interleave as a FLAT 32-term integer expression —
      // the old aggregate(sequence(0,15), ...) lambda fold is interpreted
      // (higher-order functions have no codegen) and materialized a
      // 16-element sequence per row; same terms in the same order, pure
      // integer adds, so zval is identical
      .withColumn("zval", expr(
        (0 to 15).flatMap(i => Seq(
          s"(((xb >> $i) & 1) << ${2 * i})",
          s"(((yb >> $i) & 1) << ${2 * i + 1})"))
          .mkString("0L + ", " + ", "")))
    ord.withColumn("z_bucket", shiftright(col("zval"), 26))
      .groupBy(col("z_bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("xb")).as("min_cust"), max(col("xb")).as("max_cust"),
        min(col("yb")).as("min_price"), max(col("yb")).as("max_price"))
      .orderBy("z_bucket")
  }

  val q91Sql: String =
    """WITH z AS (
      |  SELECT o_custkey & 65535 AS xb,
      |    CAST(floor(o_totalprice) AS BIGINT) & 65535 AS yb,
      |    CAST(list_sum(list_transform(range(0, 16),
      |      i -> (((o_custkey & 65535) >> i) & 1) * power(2, 2*i)::BIGINT
      |         + (((CAST(floor(o_totalprice) AS BIGINT) & 65535) >> i) & 1) * power(2, 2*i + 1)::BIGINT)) AS BIGINT) AS zval
      |  FROM orders)
      |SELECT zval // 67108864 AS z_bucket, COUNT(*) AS n,
      |  MIN(xb) AS min_cust, MAX(xb) AS max_cust,
      |  MIN(yb) AS min_price, MAX(yb) AS max_price
      |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin

  // ---------------------------------------------------------------- q92
  /** Per-stratum priority sampling: q88's scheme applied independently
    * inside each document source — the "N docs per domain" budgeted
    * sample real curation mixes use (cap any one source's contribution
    * while staying weight-proportional within it). The per-source top-k
    * is a window over the stratum key: one shuffle on source, k rows per
    * stratum survive — no global sort at any scale.
    */
  private val StratumK = 5

  val q92: Q = (s, d) => {
    val m52 = 4503599627370495L
    val u = (col("tok").bitwiseAND(lit(m52)).cast("double") + lit(1.0)) / lit(4503599627370496.0)
    val prio = Graft.table(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
      .join(docTokens(s, d), "doc_id")
      .withColumn("w", col("n_chars").cast("double"))
      .withColumn("q", col("w") / u)
    prio.withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(desc("q"), asc("doc_id"))))
      .where(col("rk") <= StratumK)
      .select(col("source"), col("rk"), col("doc_id"), col("w"))
      .orderBy("source", "rk")
  }

  val q92Sql: String =
    s"""WITH h AS (
       |  SELECT doc_id, tok FROM read_parquet('/tmp/graft_fixtures/doc_tokens/*.parquet')),
       |p AS (
       |  SELECT d.source, d.doc_id, CAST(n_chars AS DOUBLE) AS w,
       |    CAST(n_chars AS DOUBLE) /
       |      ((CAST((tok & 4503599627370495) AS DOUBLE) + 1.0) / 4503599627370496.0) AS q
       |  FROM documents d JOIN h USING (doc_id)),
       |r AS (
       |  SELECT source, doc_id, w, q,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS INT) AS rk
       |  FROM p)
       |SELECT source, rk, doc_id, w FROM r WHERE rk <= $StratumK
       |ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Point-in-time (temporal) join — the feature-store correctness
    * primitive: each lineitem shipment is enriched with the customer's
    * SCD-2 order-history version (q85's dimension) that was valid AT
    * SHIP TIME, never a later one (no training-label leakage). The join
    * is an equality join on the dimension key with the interval
    * predicate `valid_from <= ts < valid_to` evaluated inside it — at
    * 100 TB this shuffles both sides once on custkey and the per-key
    * interval list is versions-per-customer-sized, so the probe stays
    * local and bounded. The report groups by whether the valid version
    * IS the shipment's own order (a customer who re-ordered before the
    * shipment left has a newer version by then) — integer counts +
    * decimal revenue, hash-exact.
    */
  val q93: Q = (s, d) => {
    val w = Window.partitionBy(col("d_custkey"))
      .orderBy(col("valid_from"), col("d_orderkey"))
    val dim = Graft.table(s, d, "orders")
      .select(col("o_custkey").as("d_custkey"), col("o_orderkey").as("d_orderkey"),
        col("o_orderdate").as("valid_from"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
    val fact = Graft.table(s, d, "lineitem")
      .join(Graft.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_custkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_returnflag"))
    fact
      .join(dim,
        col("o_custkey") === col("d_custkey") &&
          col("valid_from") <= col("l_shipdate") &&
          (col("valid_to").isNull || col("l_shipdate") < col("valid_to")))
      .groupBy(
        (col("d_orderkey") === col("l_orderkey")).as("own_version"),
        col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec30(col("l_extendedprice"))).cast("double").as("revenue"),
        avg(col("version").cast("double")).as("avg_version"))
      .orderBy("own_version", "l_returnflag")
  }

  val q93Sql: String =
    """WITH dim AS (
      |  SELECT o_custkey AS d_custkey, o_orderkey AS d_orderkey,
      |    o_orderdate AS valid_from,
      |    CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |    LEAD(o_orderdate, 1) OVER w AS valid_to
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |fact AS (
      |  SELECT l.l_orderkey, o.o_custkey, l.l_shipdate, l.l_extendedprice, l.l_returnflag
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |pit AS (
      |  SELECT f.*, d.d_orderkey, d.version
      |  FROM fact f JOIN dim d
      |    ON f.o_custkey = d.d_custkey
      |   AND d.valid_from <= f.l_shipdate
      |   AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to))
      |SELECT d_orderkey = l_orderkey AS own_version, l_returnflag,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
      |  AVG(CAST(version AS DOUBLE)) AS avg_version
      |FROM pit GROUP BY 1, 2 ORDER BY own_version, l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q94
  /** Equi-width histogram with per-bucket stats — the distribution
    * profile a curation dashboard draws per numeric column. Two linear
    * passes: a min/max aggregate (metadata-sized, broadcast back) and
    * one map-side-combined group-by on the bucket ordinal — no sort, no
    * window, survives any scale. The bucket ordinal is the same double
    * expression tree on both engines ((v-mn)*B/(mx-mn), correctly
    * rounded op-for-op), so assignment is bit-identical; sums pass
    * through exact decimals. Equi-DEPTH boundaries at 100 TB come from
    * q42's percentiles feeding this same assignment — the width variant
    * is the one with a closed-form, engine-exact bucket rule.
    */
  private val HistB = 32

  val q94: Q = (s, d) => {
    val li = Graft.table(s, d, "lineitem").select(col("l_extendedprice").as("v"))
    val bounds = li.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    li.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(lit(HistB - 1),
          floor((col("v") - col("mn")) * lit(HistB.toDouble) / (col("mx") - col("mn")))))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec30(col("v"))).cast("double").as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .orderBy("bucket")
  }

  val q94Sql: String =
    s"""WITH b AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx FROM lineitem),
       |a AS (
       |  SELECT least($HistB - 1,
       |    CAST(floor((l_extendedprice - mn) * $HistB.0 / (mx - mn)) AS BIGINT)) AS bucket,
       |    l_extendedprice AS v
       |  FROM lineitem, b)
       |SELECT bucket, COUNT(*) AS n,
       |  CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS sum_v,
       |  MIN(v) AS min_v, MAX(v) AS max_v
       |FROM a GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q116
  /** Character-entropy gibberish score — the information-theoretic
    * quality signal the ratio heuristics (q23) miss: Shannon entropy of
    * the per-document character distribution. Keyboard-mash and
    * base64-ish blobs sit far from natural text's ~4-bit/char band, and
    * near-zero entropy flags single-character padding — both standard
    * pre-filters before expensive model scoring.
    *
    * Shape: one explode to (doc_id, char) and one two-level aggregation
    * (char counts, then per-doc entropy) — map-side combined, linear,
    * no joins. log2 is computed as ln(x)/ln(2) on BOTH engines (q65/q75's
    * ln discipline: ulp-level libm drift exists but the output rounds
    * before any discrete decision).
    */
  val q116: Q = (s, d) => {
    val chars = Graft.table(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
    val counts = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val ln2 = log(lit(2.0))
    counts.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("distinct_chars"),
        sum(col("c")).as("n"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clogc"))
      // H = log2(n) - (1/n) * sum c*log2(c), folded from -sum p log2 p
      .select(col("doc_id"), col("distinct_chars"),
        round((log(col("n").cast("double")) - col("clogc") / col("n")) / ln2, 6)
          .as("entropy"))
      .orderBy("doc_id")
  }

  val q116Sql: String =
    """WITH c AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      |cc AS (
      |  SELECT doc_id, ch, count(*) AS c FROM c WHERE length(ch) > 0 GROUP BY 1, 2)
      |SELECT doc_id, count(*) AS distinct_chars,
      |  round((ln(CAST(sum(c) AS DOUBLE))
      |         - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / sum(c)) / ln(2.0), 6)
      |    AS entropy
      |FROM cc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q117
  /** Within-corpus repeated-substring report — the per-document view of
    * substring-level duplication (Lee et al. 2022's motivation): for
    * every document, the fraction of its SubK-token windows that appear
    * verbatim in at least one OTHER document. q86 finds the contaminated
    * pairs and their run lengths; this is the corpus-health histogram a
    * dedup job reads first to size the problem.
    *
    * Shape: NO pair join at all — window df (distinct docs per gram) is
    * one map-side-combined aggregation, and the per-doc fraction is a
    * broadcast-joinable (gram, df>=2) flag folded back over the postings.
    * Linear in corpus windows at any scale.
    */
  val q117: Q = (s, d) => {
    val g = posGrams(s, d)
    val shared = g.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= 2)
      .select(col("gh"))
    g.join(shared.withColumn("hit", lit(1L)), Seq("gh"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(coalesce(col("hit"), lit(0L))).as("shared_windows"))
      .select(col("doc_id"), col("n_windows"), col("shared_windows"),
        round(col("shared_windows").cast("double") / col("n_windows"), 6).as("dup_frac"))
      .orderBy("doc_id")
  }

  val q117Sql: String =
    """WITH g AS (
      |  SELECT doc_id, pos, gh
      |  FROM read_parquet('/tmp/graft_fixtures/substr_grams/*.parquet')),
      |df AS (SELECT gh, count(DISTINCT doc_id) AS df FROM g GROUP BY 1)
      |SELECT g.doc_id, count(*) AS n_windows,
      |  CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_windows,
      |  round(CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
      |    AS dup_frac
      |FROM g JOIN df USING (gh)
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  // ---------------------------------------------------------------- q122
  /** Quality-score length-bias calibration — the audit run before
    * trusting a quality filter: documents bucketed into length deciles
    * (ntile over n_chars with doc_id tiebreak — a total order, so the
    * decile boundaries are engine-exact), with each decile's document
    * count, character range, and mean quality score. A score that climbs
    * monotonically with length is measuring length, not quality — the
    * known failure mode of ratio heuristics — and this table is how it
    * shows up.
    *
    * Shape: NO global sort — a global ntile would total-order the corpus
    * through one task. Instead the global rank is rebuilt scale-safely:
    * per-length counts (metadata-sized) give each length's starting rank
    * via a window over the GROUPED table; the within-length rank is a
    * window partitioned by n_chars (parallel across lengths); decile =
    * ntile's closed-form bucket of (rank, N) evaluated row-locally.
    * Output is bit-identical to ntile(10) OVER (ORDER BY n_chars,
    * doc_id), so the oracle keeps the plain ntile form. The score itself
    * is q23's engine-exact composite (shared builder); per-decile mean
    * sums may associate differently — absorbed by round(…, 6).
    */
  val q122: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val dd = Graft.table(s, d, "documents").select(col("doc_id"), col("n_chars"))
    val perLen = dd.groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    val wBefore = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val starts = perLen
      .withColumn("start", coalesce(sum(col("cnt")).over(wBefore), lit(0L)))
      .select(col("n_chars"), col("start"))
    val total = dd.agg(count(lit(1)).as("nn"))
    val wInLen = Window.partitionBy(col("n_chars")).orderBy(col("doc_id"))
    val ranked = dd
      .withColumn("rn", row_number().over(wInLen).cast("long"))
      .join(starts, "n_chars")
      .crossJoin(broadcast(total))
      .withColumn("r", col("start") + col("rn"))
      // ntile(10) closed form: first (N % 10) buckets hold ceil(N/10) rows
      .withColumn("decile", expr(
        """CAST(CASE WHEN r <= (nn % 10) * (nn DIV 10 + 1)
          |     THEN (r - 1) DIV (nn DIV 10 + 1) + 1
          |     ELSE (nn % 10) + (r - (nn % 10) * (nn DIV 10 + 1) - 1) DIV (nn DIV 10) + 1
          |END AS INT)""".stripMargin))
    val scored = ranked.join(DocOps.qualityScores(s, d), "doc_id")
    scored.groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(avg(col("score")), 6).as("mean_score"))
      .orderBy("decile")
  }

  val q122Sql: String =
    s"""WITH ${DocOps.qualityScoreSqlCte},
       |t AS (
       |  SELECT d.doc_id, d.n_chars, q.score,
       |    ntile(10) OVER (ORDER BY d.n_chars, d.doc_id) AS decile
       |  FROM documents d JOIN qscore q ON q.doc_id = d.doc_id)
       |SELECT CAST(decile AS INT) AS decile, count(*) AS n_docs,
       |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       |  round(avg(score), 6) AS mean_score
       |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q123
  /** Source × language composition matrix with lift — the mixture-drift
    * audit between corpus snapshots: per (source, lang) cell, its count
    * and its lift over independence (n·c_sl / (c_s·c_l)). A cell far
    * from 1 means a source is feeding one language disproportionately —
    * the first thing to check when a mixture rebalance (q57/q113)
    * changes model behavior.
    *
    * Exactness: counts are integers; the lift is one two-int-product
    * division evaluated identically on both engines, rounded at 6.
    * Shape: one map-side-combined GROUP BY to cell rows plus two
    * marginal aggregations broadcast back — everything after the first
    * pass is matrix-sized.
    */
  val q123: Q = (s, d) => {
    val dd = Graft.table(s, d, "documents").select(col("source"), col("lang"))
    // ONE corpus pass; marginals and the total are matrix-sized rollups
    // of the cell aggregate (c_s = Σ_l c_sl etc.), never corpus rescans
    val cells = dd.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c_sl"))
    val bySrc = cells.groupBy(col("source")).agg(sum(col("c_sl")).as("c_s"))
    val byLang = cells.groupBy(col("lang")).agg(sum(col("c_sl")).as("c_l"))
    val total = cells.agg(sum(col("c_sl")).as("n"))
    cells
      .join(broadcast(bySrc), "source")
      .join(broadcast(byLang), "lang")
      .crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("c_sl"),
        round(col("c_sl").cast("double") * col("n") / (col("c_s") * col("c_l")), 6).as("lift"))
      .orderBy("source", "lang")
  }

  val q123Sql: String =
    """WITH cells AS (
      |  SELECT source, lang, count(*) AS c_sl FROM documents GROUP BY 1, 2),
      |s AS (SELECT source, count(*) AS c_s FROM documents GROUP BY 1),
      |l AS (SELECT lang, count(*) AS c_l FROM documents GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents)
      |SELECT cells.source, cells.lang, cells.c_sl,
      |  round(CAST(cells.c_sl AS DOUBLE) * (SELECT n FROM n) / (s.c_s * l.c_l), 6) AS lift
      |FROM cells JOIN s USING (source) JOIN l USING (lang)
      |ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------- q125
  /** Population-stability-index drift between two corpus cohorts — the
    * monitoring metric data platforms alarm on between snapshots:
    * document-length distributions of cohort A (even doc_id, the
    * "reference" crawl) vs cohort B (odd doc_id, the "candidate"), PSI =
    * Σ (p_b − p_a)·ln(p_b/p_a) over fixed length bins, plus the per-bin
    * contributions so the drifting bins are visible (the usual reading:
    * PSI < 0.1 stable, > 0.25 action).
    *
    * Bins are FIXED integer boundaries (n_chars DIV 200, capped at 10 —
    * engine-exact bucketing, no quantile estimation), shares are
    * Laplace-smoothed (+1) so an empty bin cannot produce ln(0). One
    * pass to bin-count rows; everything after is bin-count-sized.
    * ln drift between libm and the JVM is absorbed by round(…, 6).
    */
  val q125: Q = (s, d) => {
    val dd = Graft.table(s, d, "documents")
      .select(col("doc_id"),
        least(expr("n_chars DIV 200"), lit(10)).cast("int").as("bin"),
        (col("doc_id") % 2 === 0).as("is_a"))
    val binned = dd.groupBy(col("bin"))
      .agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val tot = binned.agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("k"))
    binned.crossJoin(broadcast(tot))
      // Laplace-smoothed shares: (c + 1) / (n + k)
      .withColumn("pa", (col("ca") + 1.0) / (col("na") + col("k")))
      .withColumn("pb", (col("cb") + 1.0) / (col("nb") + col("k")))
      .select(col("bin"), col("ca"), col("cb"),
        round((col("pb") - col("pa")) * log(col("pb") / col("pa")), 6).as("psi_term"))
      .orderBy("bin")
  }

  val q125Sql: String =
    """WITH d AS (
      |  SELECT doc_id, least(n_chars // 200, 10) AS bin,
      |    doc_id % 2 = 0 AS is_a
      |  FROM documents),
      |b AS (
      |  SELECT bin,
      |    sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
      |    sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
      |  FROM d GROUP BY 1),
      |t AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS k FROM b)
      |SELECT CAST(bin AS INT) AS bin, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
      |  round(((cb + 1.0) / (t.nb + t.k) - (ca + 1.0) / (t.na + t.k))
      |    * ln(((cb + 1.0) / (t.nb + t.k)) / ((ca + 1.0) / (t.na + t.k))), 6) AS psi_term
      |FROM b CROSS JOIN t ORDER BY bin""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q84_stats_moments", q84, Some(q84Sql)),
    ("q85_scd2_dim", q85, Some(q85Sql)),
    ("q86_substr_contamination", q86, Some(q86Sql)),
    ("q87_column_profile", q87, Some(q87Sql)),
    ("q88_priority_sample", q88, Some(q88Sql)),
    ("q89_count_min", q89, Some(q89Sql)),
    ("q90_incremental_agg", q90, Some(q90Sql)),
    ("q91_zorder_layout", q91, Some(q91Sql)),
    ("q92_stratified_priority", q92, Some(q92Sql)),
    ("q93_pit_join", q93, Some(q93Sql)),
    ("q94_histogram", q94, Some(q94Sql)),
    ("q116_char_entropy", q116, Some(q116Sql)),
    ("q117_substr_dup_frac", q117, Some(q117Sql)),
    ("q122_length_bias", q122, Some(q122Sql)),
    ("q123_composition_lift", q123, Some(q123Sql)),
    ("q125_psi_drift", q125, Some(q125Sql)))
}
