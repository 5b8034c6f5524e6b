package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft

/** Rank-correlation analytics (round 6, seventeenth pack): the
  * order-statistics readouts over per-user engagement — Spearman rank
  * correlation between event count and spend per event type (q209),
  * Kendall tau-b over engagement deciles (q210), the biggest
  * half-period rank movers (q211), and the Lorenz concentration curve
  * of user spend (q212).
  *
  * Scale notes (the 100 TB story): every rank here is the count-table
  * closed form (rank = cprev + within-tie position; tie-averaged
  * doubled rank = 2·cprev + c + 1) with cprev built by the two-level
  * superbucket decomposition (within-(key, superbucket) prefix +
  * broadcast superbucket carry — q122/q202's no-global-sort
  * discipline), so no task ever sorts a full value domain. q210's
  * Kendall cell table is ≤ 10×10 per event type (deciles), so the
  * concordance self-join is metadata × metadata. Rank-polynomial sums
  * grow as n·(2n)² and overflow BIGINT near 10⁹ users, so they are
  * carried as DECIMAL(38,0) (HUGEINT in the oracle) — n·Σdr² ≈ 4·10³⁶
  * at 10⁹ users still fits precision 38.
  *
  * Exactness: spend flows as exact micro-units (round(x·1e6) →
  * BIGINT, the q145/q157 rule); ranks, deciles, concordance counts,
  * and the mover cut are integer decisions (ties broken by user_id);
  * Spearman/Kendall are single divisions of exact integer polynomials
  * (sqrt is IEEE-exact), rounded on output; zero-variance denominators
  * are NULL-guarded identically on both sides.
  */
object RankCorrOps {
  import Relational.Q

  /** Count of strictly-smaller values per (grp..., v) without a
    * full-domain window: within-superbucket prefix counts plus a
    * broadcast carry over the metadata-sized superbucket table.
    * Returns columns grp..., v, c, cprev.
    */
  private def cprevTable(
      df: DataFrame, grpCols: Seq[String], vCol: String, sbShift: Int): DataFrame = {
    val keys = grpCols.map(col)
    val cnt = df.groupBy((keys :+ col(vCol)): _*).agg(count(lit(1)).as("c"))
      .withColumn("sb", expr(s"$vCol DIV ${1L << sbShift}"))
      // ONE (keys, sb) exchange shared by the in-bucket window AND the
      // carry aggregation below (r13, guide §2.4): hash(keys, sb)
      // satisfies both their clusterings, where the previous plan
      // exchanged the count table twice — once for each. The repartition
      // moves the already-aggregated (keys, v, c) rows, so map-side
      // combine on the value counts is untouched.
      .repartition((keys :+ col("sb")): _*)
    val wIn = Window.partitionBy((keys :+ col("sb")): _*).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wB = Window.partitionBy(keys: _*).orderBy(col("sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = cnt.groupBy((keys :+ col("sb")): _*).agg(sum(col("c")).as("bc"))
      .withColumn("carry", coalesce(sum(col("bc")).over(wB), lit(0L)))
      .select((keys :+ col("sb") :+ col("carry")): _*)
    cnt.withColumn("inprev", coalesce(sum(col("c")).over(wIn), lit(0L)))
      .join(broadcast(carry), grpCols :+ "sb")
      .withColumn("cprev", col("carry") + col("inprev"))
      .drop("sb", "inprev", "carry")
  }

  /** Per-(event_type, user) engagement: event count x, exact micro-unit
    * spend y. Feeds q209 and q210 — memoized per (session, scale).
    */
  private val utMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def userTypeStats(s: SparkSession, d: String): DataFrame =
    DocOps.Memo.get(utMemo, s, d) {
      Graft.events(s, d)
        .select(col("event_type").as("t"), col("user_id").as("u"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
        .groupBy(col("t"), col("u"))
        .agg(count(lit(1)).as("x"), sum(col("vm")).as("y"))
        .localCheckpoint(true)
    }

  private val UtSqlCte: String =
    """ut AS (
      |  SELECT event_type AS t, user_id AS u, CAST(count(*) AS BIGINT) AS x,
      |    CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- q209
  /** Spearman rank correlation (tie-aware: Pearson over tie-averaged
    * doubled ranks 2·cprev + c + 1) between per-user event count and
    * spend, per event type.
    */
  val q209: Q = (s, d) => {
    val ut = userTypeStats(s, d)
    val drx = cprevTable(ut, Seq("t"), "x", 6)
      .select(col("t").as("tx"), col("x").as("vx"),
        (lit(2L) * col("cprev") + col("c") + 1L).as("drx"))
    val dry = cprevTable(ut, Seq("t"), "y", 24)
      .select(col("t").as("ty"), col("y").as("vy"),
        (lit(2L) * col("cprev") + col("c") + 1L).as("dry"))
    ut.join(drx, col("t") === col("tx") && col("x") === col("vx"))
      .join(dry, col("t") === col("ty") && col("y") === col("vy"))
      .groupBy(col("t"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("drx").cast("decimal(38,0)")).as("sx"),
        sum(col("dry").cast("decimal(38,0)")).as("sy"),
        sum(col("drx").cast("decimal(38,0)") * col("drx").cast("decimal(38,0)")).as("sxx"),
        sum(col("dry").cast("decimal(38,0)") * col("dry").cast("decimal(38,0)")).as("syy"),
        sum(col("drx").cast("decimal(38,0)") * col("dry").cast("decimal(38,0)")).as("sxy"))
      .select(col("t").as("event_type"), col("n").cast("long").as("n_users"),
        expr("""round(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE)) END, 6)""")
          .as("spearman"))
      .orderBy("event_type")
  }

  val q209Sql: String =
    s"""WITH $UtSqlCte,
       |cx AS (
       |  SELECT t, x AS v, CAST(count(*) AS BIGINT) AS c,
       |    CAST(coalesce(sum(count(*)) OVER (PARTITION BY t ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cprev
       |  FROM ut GROUP BY 1, 2),
       |cy AS (
       |  SELECT t, y AS v, CAST(count(*) AS BIGINT) AS c,
       |    CAST(coalesce(sum(count(*)) OVER (PARTITION BY t ORDER BY y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cprev
       |  FROM ut GROUP BY 1, 2),
       |j AS (
       |  SELECT ut.t,
       |    (2 * cx.cprev + cx.c + 1)::HUGEINT AS drx,
       |    (2 * cy.cprev + cy.c + 1)::HUGEINT AS dry
       |  FROM ut
       |  JOIN cx ON cx.t = ut.t AND cx.v = ut.x
       |  JOIN cy ON cy.t = ut.t AND cy.v = ut.y),
       |a AS (
       |  SELECT t, count(*)::HUGEINT AS n, sum(drx) AS sx, sum(dry) AS sy,
       |    sum(drx * drx) AS sxx, sum(dry * dry) AS syy, sum(drx * dry) AS sxy
       |  FROM j GROUP BY 1)
       |SELECT t AS event_type, CAST(n AS BIGINT) AS n_users,
       |  round(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
       |    THEN NULL
       |    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
       |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
       |           * CAST(n * syy - sy * sy AS DOUBLE)) END, 6) AS spearman
       |FROM a ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q210
  /** Kendall tau-b between engagement deciles: per event type, assign
    * count/spend deciles by the closed-form rank (ties broken by user),
    * then count concordant/discordant pairs over the ≤ 10×10 decile
    * cell table; tau-b's tie terms come from the cell margins.
    */
  val q210: Q = (s, d) => {
    val ut = userTypeStats(s, d)
    val nT = ut.groupBy(col("t")).agg(count(lit(1)).as("n"))
    val cpx = cprevTable(ut, Seq("t"), "x", 6)
      .select(col("t").as("tx"), col("x").as("vx"), col("cprev").as("cpx"))
    val cpy = cprevTable(ut, Seq("t"), "y", 24)
      .select(col("t").as("ty"), col("y").as("vy"), col("cprev").as("cpy"))
    val wTx = Window.partitionBy(col("t"), col("x")).orderBy(col("u"))
    val wTy = Window.partitionBy(col("t"), col("y")).orderBy(col("u"))
    val dec = ut.join(cpx, col("t") === col("tx") && col("x") === col("vx"))
      .join(cpy, col("t") === col("ty") && col("y") === col("vy"))
      .join(broadcast(nT), Seq("t"))
      .withColumn("rkx", col("cpx") + row_number().over(wTx))
      .withColumn("rky", col("cpy") + row_number().over(wTy))
      .select(col("t"), col("n"), expr("((rkx - 1) * 10) DIV n").as("dx"),
        expr("((rky - 1) * 10) DIV n").as("dy"))
    // <= 100 rows per event type; the tail's exchanges all ride AQE's
    // coalesced reads + broadcasts over this metadata-sized table, which
    // measured FASTER than pinning a hash(t) partitioning through the
    // checkpoint (a declared-hash(t) LogicalRDD rewrap was tried in r13:
    // 1.32 -> 1.67-2.10 s — the pinned 32-way layout defeats AQE's
    // 1-2-partition coalescing, and task overhead dominates at 500 rows)
    val cells = dec.groupBy(col("t"), col("n"), col("dx"), col("dy"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val a = cells.select(col("t"), col("dx").as("xa"), col("dy").as("ya"),
      col("c").cast("decimal(38,0)").as("ca"))
    val b = cells.select(col("t").as("tb"), col("dx").as("xb"),
      col("dy").as("yb"), col("c").cast("decimal(38,0)").as("cb"))
    val cd = a.join(b, col("t") === col("tb") && col("xa") < col("xb"))
      .groupBy(col("t"))
      .agg(sum(when(col("ya") < col("yb"), col("ca") * col("cb"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("conc"),
        sum(when(col("ya") > col("yb"), col("ca") * col("cb"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("disc"))
    val tx = cells.groupBy(col("t"), col("dx")).agg(sum(col("c")).as("m"))
      .groupBy(col("t"))
      .agg(sum((col("m").cast("decimal(38,0)") * (col("m") - 1L)
        .cast("decimal(38,0)")).cast("decimal(38,0)")).as("txd"))
    val ty = cells.groupBy(col("t"), col("dy")).agg(sum(col("c")).as("m"))
      .groupBy(col("t"))
      .agg(sum((col("m").cast("decimal(38,0)") * (col("m") - 1L)
        .cast("decimal(38,0)")).cast("decimal(38,0)")).as("tyd"))
    cells.groupBy(col("t")).agg(max(col("n")).as("nu"))
      .join(cd, Seq("t")).join(tx, Seq("t")).join(ty, Seq("t"))
      .select(col("t").as("event_type"), col("nu").as("n_users"),
        col("conc").cast("long").as("concordant"),
        col("disc").cast("long").as("discordant"),
        expr("""round(CASE WHEN (CAST(nu AS DECIMAL(38,0)) * (nu - 1) - txd)
                  * (CAST(nu AS DECIMAL(38,0)) * (nu - 1) - tyd) = 0 THEN NULL
                ELSE 2.0 * CAST(conc - disc AS DOUBLE)
                  / sqrt(CAST(CAST(nu AS DECIMAL(38,0)) * (nu - 1) - txd AS DOUBLE)
                       * CAST(CAST(nu AS DECIMAL(38,0)) * (nu - 1) - tyd AS DOUBLE))
                END, 6)""").as("tau_b"))
      .orderBy("event_type")
  }

  val q210Sql: String =
    s"""WITH $UtSqlCte,
       |nt AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
       |cx AS (
       |  SELECT t, x AS v, CAST(coalesce(sum(count(*)) OVER (PARTITION BY t
       |    ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS cprev
       |  FROM ut GROUP BY 1, 2),
       |cy AS (
       |  SELECT t, y AS v, CAST(coalesce(sum(count(*)) OVER (PARTITION BY t
       |    ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS cprev
       |  FROM ut GROUP BY 1, 2),
       |dec AS MATERIALIZED (
       |  SELECT ut.t, nt.n,
       |    ((cx.cprev + row_number() OVER (PARTITION BY ut.t, ut.x ORDER BY ut.u)
       |      - 1) * 10) // nt.n AS dx,
       |    ((cy.cprev + row_number() OVER (PARTITION BY ut.t, ut.y ORDER BY ut.u)
       |      - 1) * 10) // nt.n AS dy
       |  FROM ut
       |  JOIN nt ON nt.t = ut.t
       |  JOIN cx ON cx.t = ut.t AND cx.v = ut.x
       |  JOIN cy ON cy.t = ut.t AND cy.v = ut.y),
       |cells AS MATERIALIZED (
       |  SELECT t, CAST(max(n) AS BIGINT) AS n, dx, dy,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM dec GROUP BY t, dx, dy),
       |cd AS (
       |  SELECT a.t,
       |    sum(CASE WHEN a.dy < b.dy THEN a.c::HUGEINT * b.c ELSE 0 END) AS conc,
       |    sum(CASE WHEN a.dy > b.dy THEN a.c::HUGEINT * b.c ELSE 0 END) AS disc
       |  FROM cells a JOIN cells b ON a.t = b.t AND a.dx < b.dx
       |  GROUP BY 1),
       |tx AS (
       |  SELECT t, sum(m::HUGEINT * (m - 1)) AS txd FROM (
       |    SELECT t, dx, CAST(sum(c) AS BIGINT) AS m FROM cells GROUP BY 1, 2)
       |  GROUP BY 1),
       |ty AS (
       |  SELECT t, sum(m::HUGEINT * (m - 1)) AS tyd FROM (
       |    SELECT t, dy, CAST(sum(c) AS BIGINT) AS m FROM cells GROUP BY 1, 2)
       |  GROUP BY 1),
       |nu AS (SELECT t, max(n) AS nu FROM cells GROUP BY 1)
       |SELECT n.t AS event_type, CAST(n.nu AS BIGINT) AS n_users,
       |  CAST(cd.conc AS BIGINT) AS concordant,
       |  CAST(cd.disc AS BIGINT) AS discordant,
       |  round(CASE WHEN (n.nu::HUGEINT * (n.nu - 1) - tx.txd)
       |      * (n.nu::HUGEINT * (n.nu - 1) - ty.tyd) = 0 THEN NULL
       |    ELSE 2.0 * CAST(cd.conc - cd.disc AS DOUBLE)
       |      / sqrt(CAST(n.nu::HUGEINT * (n.nu - 1) - tx.txd AS DOUBLE)
       |           * CAST(n.nu::HUGEINT * (n.nu - 1) - ty.tyd AS DOUBLE))
       |    END, 6) AS tau_b
       |FROM nu n JOIN cd ON cd.t = n.t JOIN tx ON tx.t = n.t JOIN ty ON ty.t = n.t
       |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q211
  /** Half-period rank movers: split the event span at its midpoint
    * (integer micros), rank users active in BOTH halves by spend in
    * each half (closed-form rank, user tie-break), and report the 20
    * largest absolute rank shifts.
    */
  val q211: Q = (s, d) => {
    val ev = Graft.events(s, d)
      .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
    val mid = ev.agg(expr("(min(us) + max(us)) DIV 2").as("mid"))
    val both = ev.crossJoin(broadcast(mid))
      .withColumn("h", when(col("us") <= col("mid"), 0).otherwise(1))
      .groupBy(col("u"))
      .agg(sum(when(col("h") === 0, col("vm")).otherwise(0L)).as("v0"),
        sum(when(col("h") === 1, col("vm")).otherwise(0L)).as("v1"),
        sum(when(col("h") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("n1"))
      .where(col("n0") > 0 && col("n1") > 0)
      .select(col("u"), col("v0"), col("v1"))
      .localCheckpoint(true) // user-sized; feeds both rank tables + join
    val cp0 = cprevTable(both, Seq.empty, "v0", 24)
      .select(col("v0").as("w0"), col("cprev").as("cp0"))
    val cp1 = cprevTable(both, Seq.empty, "v1", 24)
      .select(col("v1").as("w1"), col("cprev").as("cp1"))
    val w0 = Window.partitionBy(col("v0")).orderBy(col("u"))
    val w1 = Window.partitionBy(col("v1")).orderBy(col("u"))
    both.join(cp0, col("v0") === col("w0"))
      .join(cp1, col("v1") === col("w1"))
      .withColumn("rk0", col("cp0") + row_number().over(w0))
      .withColumn("rk1", col("cp1") + row_number().over(w1))
      .select(col("u").as("user_id"), col("rk0").as("rank_early"),
        col("rk1").as("rank_late"), (col("rk1") - col("rk0")).as("shift"))
      .orderBy(abs(col("shift")).desc, col("user_id"))
      .limit(20)
  }

  val q211Sql: String =
    """WITH ev AS (
      |  SELECT user_id AS u, epoch_us(ts) AS us,
      |    CAST(round(value * 1000000) AS BIGINT) AS vm
      |  FROM events),
      |m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
      |both_h AS MATERIALIZED (
      |  SELECT u,
      |    CAST(sum(CASE WHEN us <= m.mid THEN vm ELSE 0 END) AS BIGINT) AS v0,
      |    CAST(sum(CASE WHEN us > m.mid THEN vm ELSE 0 END) AS BIGINT) AS v1,
      |    CAST(sum(CASE WHEN us <= m.mid THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(sum(CASE WHEN us > m.mid THEN 1 ELSE 0 END) AS BIGINT) AS n1
      |  FROM ev CROSS JOIN m GROUP BY u),
      |bb AS MATERIALIZED (SELECT u, v0, v1 FROM both_h WHERE n0 > 0 AND n1 > 0),
      |c0 AS (
      |  SELECT v0 AS w, CAST(coalesce(sum(count(*)) OVER (ORDER BY v0
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS cprev
      |  FROM bb GROUP BY 1),
      |c1 AS (
      |  SELECT v1 AS w, CAST(coalesce(sum(count(*)) OVER (ORDER BY v1
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS cprev
      |  FROM bb GROUP BY 1),
      |rk AS (
      |  SELECT bb.u AS user_id,
      |    c0.cprev + row_number() OVER (PARTITION BY bb.v0 ORDER BY bb.u)
      |      AS rank_early,
      |    c1.cprev + row_number() OVER (PARTITION BY bb.v1 ORDER BY bb.u)
      |      AS rank_late
      |  FROM bb JOIN c0 ON c0.w = bb.v0 JOIN c1 ON c1.w = bb.v1)
      |SELECT user_id, CAST(rank_early AS BIGINT) AS rank_early,
      |  CAST(rank_late AS BIGINT) AS rank_late,
      |  CAST(rank_late - rank_early AS BIGINT) AS shift
      |FROM rk ORDER BY abs(rank_late - rank_early) DESC, user_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q212
  /** Lorenz concentration curve of user spend: decile users by total
    * spend (closed-form rank), report per-decile users, spend, spend
    * share, and the cumulative share — the Lorenz curve points.
    */
  val q212: Q = (s, d) => {
    val users = Graft.events(s, d)
      .select(col("user_id").as("u"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
      .groupBy(col("u")).agg(sum(col("vm")).as("y"))
      .localCheckpoint(true)
    val cp = cprevTable(users, Seq.empty, "y", 24)
      .select(col("y").as("vy"), col("cprev"))
    val tot = users.agg(count(lit(1)).as("n"),
      sum(col("y").cast("decimal(38,0)")).as("ty"))
    val wTie = Window.partitionBy(col("y")).orderBy(col("u"))
    val dec = users.join(cp, col("y") === col("vy"))
      .crossJoin(broadcast(tot))
      .withColumn("rk", col("cprev") + row_number().over(wTie))
      .withColumn("decile", expr("((rk - 1) * 10) DIV n"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("y").cast("decimal(38,0)")).as("sp"), max(col("ty")).as("ty"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("cum", sum(col("sp")).over(wCum)) // 10-row table
      .select(col("decile"), col("n_users"),
        col("sp").cast("long").as("spend_micro"),
        round(col("sp").cast("double") / col("ty").cast("double"), 6).as("share"),
        round(col("cum").cast("double") / col("ty").cast("double"), 6)
          .as("cum_share"))
      .orderBy("decile")
  }

  val q212Sql: String =
    """WITH users AS (
      |  SELECT user_id AS u,
      |    CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |cp AS (
      |  SELECT y AS vy, CAST(coalesce(sum(count(*)) OVER (ORDER BY y
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS cprev
      |  FROM users GROUP BY 1),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(y::HUGEINT) AS ty FROM users),
      |dec AS (
      |  SELECT ((cp.cprev + row_number() OVER (PARTITION BY u.y ORDER BY u.u)
      |    - 1) * 10) // t.n AS decile, u.y, t.ty
      |  FROM users u JOIN cp ON cp.vy = u.y CROSS JOIN t),
      |g AS (
      |  SELECT decile, count(*) AS n_users, sum(y::HUGEINT) AS sp, max(ty) AS ty
      |  FROM dec GROUP BY 1)
      |SELECT decile, n_users, CAST(sp AS BIGINT) AS spend_micro,
      |  round(CAST(sp AS DOUBLE) / CAST(ty AS DOUBLE), 6) AS share,
      |  round(CAST(sum(sp) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(ty AS DOUBLE), 6) AS cum_share
      |FROM g ORDER BY decile""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q209_engagement_spearman", q209, Some(q209Sql)),
    ("q210_decile_kendall", q210, Some(q210Sql)),
    ("q211_rank_movers", q211, Some(q211Sql)),
    ("q212_lorenz_curve", q212, Some(q212Sql)))
}
