package graft.queries

import graft.etl.Tables
import org.apache.spark.sql.functions._

/** Headline analytical queries (aggregation / join / window shapes the
  * engine must sustain at 100 TB). These are the bench workload: each is
  * a single lazy plan so Catalyst pushes filters/projections into the
  * parquet scan, and small dimension sides are broadcast.
  */
object Analytics {

  /** TPC-H Q1-flavored pricing summary: full lineitem scan, hash
    * aggregate on 2 low-cardinality keys — map-side partial agg makes the
    * shuffle tiny regardless of input scale.
    */
  val q1Pricing = Q(
    "q1_pricing_summary",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          Q.moneySum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0) - col("l_discount")).cast("decimal(18,2)")).cast("double")
            .as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
             avg(l_quantity) AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim))

  /** TPC-H Q3-flavored: selective dimension filter → two-way join →
    * grouped revenue → top-10. The customer filter is pushed to the scan;
    * the filtered customer side is broadcast.
    */
  val q3Revenue = Q(
    "q3_revenue_topk",
    (s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY l_orderkey
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """.trim))

  /** TPC-H Q5-flavored star join: 5-way join with two broadcast
    * dimensions (nation, region) and co-located fact keys.
    */
  val q5Region = Q(
    "q5_region_volume",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      val sup = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name
    """.trim))

  /** Window ranking: top-3 orders per customer (row_number with a unique
    * tiebreak — one shuffle on the partition key).
    */
  val w1Rank = Q(
    "w1_window_topk_per_key",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn
    """.trim))

  /** Running (prefix) sum per key — decimal accumulation so the window
    * sum is order-exact in both engines regardless of their internal
    * window-frame evaluation strategy.
    */
  val w2Running = Q(
    "w2_window_running_sum",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
            .as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderkey
    """.trim))

  /** Aggregate function breadth: min/max/exact distinct on one pass. */
  val q6Stats = Q(
    "q6_agg_stats",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.groupBy(col("l_returnflag"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             count(DISTINCT l_suppkey) AS n_supp, count(DISTINCT l_partkey) AS n_part,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """.trim))

  /** Rollup (hierarchical subtotals) — beyond the reference's surface;
    * Spark gets it free via Expand, one shuffle.
    */
  val q7Rollup = Q(
    "q7_rollup",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem")
      l.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """.trim))

  /** Sessionization via gap detection: lag + conditional sum over the
    * per-user window — one shuffle on user_id, linear in events.
    */
  val q8Sessions = Q(
    "q8_sessionize",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withGap = ev.select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
      withGap
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH g AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events),
      s AS (SELECT user_id,
              CASE WHEN prev_ts IS NULL
                        OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
            FROM g)
      SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*) AS n_events
      FROM s GROUP BY user_id ORDER BY user_id
    """.trim))

  /** As-of join (most recent prior matching event) composed from
    * built-ins — an IGNORE NULLS last() over a trailing window frame —
    * rather than a custom operator (preference (a) of the build brief:
    * the window formulation shuffles once on the partition key and
    * needs no new physical operator).
    */
  val j5Asof = Q(
    "j5_asof_last_prior",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("last_signup_ts",
          last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("last_signup_ts"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, ts, last_signup_ts FROM (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup_ts
        FROM events)
      WHERE event_type = 'purchase'
      ORDER BY event_id
    """.trim))

  /** Forward as-of: for each purchase, the NEXT error event's ts for the
    * same user (first-non-null over the following frame) — completes the
    * as-of pair with j5's backward variant, same one-shuffle window shape.
    */
  val j8AsofNext = Q(
    "j8_asof_next_after",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
      // "first after" as last() over the REVERSED running frame — a
      // (1, unboundedFollowing) frame is recomputed per row by Spark
      // (O(n²) per partition; caught by the round-11 frame lint), while
      // the descending unbounded-PRECEDING frame streams in O(n). The
      // oracle keeps the textbook FOLLOWING spelling: DuckDB's window
      // executor handles it, and the two are definitionally equal.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("next_error_ts",
          last(when(col("event_type") === "error", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("next_error_ts"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, ts, next_error_ts FROM (
        SELECT event_id, user_id, ts, event_type,
               first_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_error_ts
        FROM events)
      WHERE event_type = 'purchase'
      ORDER BY event_id
    """.trim))

  /** Exact percentiles (linear interpolation — same definition as
    * quantile_cont), via [[graft.etl.StatOps.percentiles]]' distributed
    * prefix-sum order statistics rather than the builtin `percentile`
    * aggregate: over a near-distinct price column the builtin's
    * value→count buffer merges O(n) state onto a single task — fine at
    * sf0.1, OOM at 100 TB. Identical interpolation formula, bounded
    * per-task memory.
    */
  val q9Percentiles = Q(
    "q9_percentiles",
    (s, dir) =>
      graft.etl.StatOps.percentiles(Tables(s, dir, "lineitem"),
          Seq("l_returnflag"), "l_extendedprice",
          Seq("median_price" -> 0.5, "p90_price" -> 0.9))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5) AS median_price,
             quantile_cont(l_extendedprice, 0.9) AS p90_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """.trim))

  /** HLL++ approximate distinct — sketch differs per engine, so the
    * driver records the weaker rows-only check (no oracle by design).
    */
  val q10Approx = Q(
    "q10_approx_distinct",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey")).as("approx_supps"))
        .orderBy(col("l_returnflag")),
    None)

  def all: Seq[Q] = Seq(q1Pricing, q3Revenue, q5Region, w1Rank, w2Running, q6Stats,
    q7Rollup, q8Sessions, j5Asof, j8AsofNext, q9Percentiles, q10Approx)
}
