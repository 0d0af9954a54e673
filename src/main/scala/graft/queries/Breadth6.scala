package graft.queries

import graft.etl.{SampleOps, Tables}
import org.apache.spark.sql.functions._

/** Round-4 breadth: customer-order distribution (TPC-H Q13's
  * count-of-counts shape), ordered event funnels, weighted systematic
  * sampling, and the bivariate statistical aggregate family — each a
  * one-or-two-shuffle plan whose partitioning survives a 100 TB input.
  */
object Breadth6 {

  /** TPC-H Q13 (order-count distribution): left join so order-less
    * customers land in the 0 bucket, per-customer count, then a
    * count-of-counts. Two hash aggregates, each partitioned by its own
    * grouping key; the first reuses the join's c_custkey clustering.
    */
  val q45CustOrderDist = Q(
    "q45_cust_order_dist",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """.trim))

  /** Ordered three-stage event funnel (signup → click → purchase,
    * strictly-after semantics): each stage is a per-user min-timestamp
    * aggregate semi-joined to the previous stage's completions. All
    * three joins cluster on user_id, so one shuffle partitioning
    * carries the whole funnel; stage tables shrink monotonically.
    */
  val q46EventFunnel = Q(
    "q46_event_funnel",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.select(lit("1_signup").as("stage"), col("user_id"))
        .unionByName(s2.select(lit("2_click").as("stage"), col("user_id")))
        .unionByName(s3.select(lit("3_purchase").as("stage"), col("user_id")))
        .groupBy(col("stage")).agg(count(lit(1)).as("users"))
        .orderBy(col("stage"))
    },
    Some("""
      WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
      SELECT stage, count(*) AS users FROM (
        SELECT '1_signup' AS stage, user_id FROM s1
        UNION ALL SELECT '2_click', user_id FROM s2
        UNION ALL SELECT '3_purchase', user_id FROM s3)
      GROUP BY stage ORDER BY stage
    """.trim))

  /** Weighted systematic (PPS) sample of ~100 documents, selection
    * probability proportional to n_chars — integer-only arithmetic
    * (cumulative weights + stride boundaries), so the sample is
    * bit-reproducible across engines/runs/partitionings, unlike any
    * rand()-based weighted pick. The prefix sum is distributed
    * (SampleOps), never a single-task global window.
    */
  val q47PpsSample = Q(
    "q47_pps_sample",
    (s, dir) =>
      SampleOps.ppsSystematicSample(Tables(s, dir, "documents"),
          "doc_id", "n_chars", n = 100)
        .orderBy(col("doc_id")),
    Some("""
      WITH w AS (SELECT doc_id, n_chars::BIGINT AS weight,
                        sum(n_chars::BIGINT) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cend,
                        sum(n_chars::BIGINT) OVER () AS total
                 FROM documents)
      SELECT doc_id, weight FROM w
      WHERE floor((cend - weight) / (total // 100)) < floor(cend / (total // 100))
      ORDER BY doc_id
    """.trim))

  /** Bivariate/statistical aggregate family: correlation, sample
    * covariance/variance/stddev and the regression line, one shuffle.
    * Moment aggregates merge partial states (Welford-style) so they
    * distribute; cross-engine float drift is bounded well below the
    * 6 dp the output rounds to.
    */
  val t11StatAggs = Q(
    "t11_stat_aggs",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("covar_qp"),
          round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope_pq"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 6).as("icept_pq"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
             round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qp,
             round(stddev_samp(l_discount), 6) AS sd_disc,
             round(var_samp(l_discount), 6) AS var_disc,
             round(regr_slope(l_extendedprice, l_quantity), 6) AS slope_pq,
             round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept_pq
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """.trim))

  def all: Seq[Q] = Seq(q45CustOrderDist, q46EventFunnel, q47PpsSample, t11StatAggs)
}
