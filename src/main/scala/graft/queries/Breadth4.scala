package graft.queries

import graft.etl.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-3 breadth, continued: the remaining classic TPC-H decision-
  * support patterns expressible over the trimmed testdata schema —
  * bi-directional nation-pair joins (Q7), conditional market-share
  * ratios (Q8), returned-item top-k reporting (Q10), EXISTS-gated
  * priority counts (Q4), conditional promo ratios (Q14) and
  * disjunctive multi-band join predicates (Q19). Q2/Q9/Q11/Q16/Q20 need
  * the partsupp table the synthetic corpus does not ship, so their
  * signature patterns (correlated min over a multi-join; agg-of-agg
  * shares) are covered by q13/q31 instead.
  *
  * Determinism contract (see Breadth3): every aggregate feeding a
  * comparison or ratio is an exact DECIMAL sum; ratios do ONE double
  * division at the end with identical association in both engines.
  */
object Breadth4 {

  private def vol = // l_extendedprice * (1 - l_discount), exact
    (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2)))

  /** TPC-H Q7 pattern — volume shipped between a nation pair in either
    * direction. The nation dimension joins TWICE (supplier side and
    * customer side) under different aliases; both are broadcast, and the
    * pair filter collapses the 625-combination cross space to 2 before
    * the fact tables join. At 100 TB the only shuffles are the three
    * fact-fact equi joins (lineitem-orders-customer), all on their keys.
    */
  val q37VolumeShipping = Q(
    "q37_volume_shipping",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val sup = Tables(s, dir, "supplier")
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      l.join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(vol).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""
      SELECT supp_nation, cust_nation, l_year,
             CAST(sum(volume) AS DOUBLE) AS revenue
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate)::BIGINT AS l_year,
                   CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS volume
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                          JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
                          JOIN nation n1 ON s_nationkey = n1.n_nationkey
                          JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year
    """.trim))

  /** TPC-H Q8 pattern — a nation's market share inside a region:
    * conditional decimal sum over the qualifying volume divided ONCE in
    * double. The region restriction prunes the customer side through two
    * broadcast dims before any fact shuffle.
    */
  val q38MarketShare = Q(
    "q38_market_share",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = Tables(s, dir, "customer")
      val sup = Tables(s, dir, "supplier")
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_regionkey").as("n2_region"))
      val r = Tables(s, dir, "region").filter(col("r_name") === "EUROPE")
        .select(col("r_regionkey"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .join(broadcast(r), col("n2_region") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double") /
          sum(vol).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some("""
      SELECT o_year,
             CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(sum(volume) AS DOUBLE) AS mkt_share
      FROM (SELECT year(o_orderdate)::BIGINT AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS volume,
                   n1.n_name AS supp_nation
            FROM lineitem JOIN part ON l_partkey = p_partkey
                          JOIN supplier ON l_suppkey = s_suppkey
                          JOIN orders ON l_orderkey = o_orderkey
                          JOIN customer ON o_custkey = c_custkey
                          JOIN nation n1 ON s_nationkey = n1.n_nationkey
                          JOIN nation n2 ON c_nationkey = n2.n_nationkey
                          JOIN region ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') all_nations
      GROUP BY o_year
      ORDER BY o_year
    """.trim))

  /** TPC-H Q10 pattern — top-20 customers by revenue lost to returns in
    * one quarter. Deterministic top-k: revenue DESC with the unique
    * custkey as tiebreak in BOTH engines.
    */
  val q39ReturnedItems = Q(
    "q39_returned_items",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(vol).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal, n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    """.trim))

  /** TPC-H Q4 pattern (adapted: the trimmed lineitem has no commit /
    * receipt dates, so "late" = shipped more than 30 days after the
    * order date) — EXISTS decorrelates to a left-semi join whose
    * non-equi condition rides on the orderkey equi join.
    */
  val q40PriorityExists = Q(
    "q40_late_ship_priority",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("interval 30 days"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.trim))

  /** TPC-H Q14 pattern — promo revenue share for one ship month: two
    * exact decimal sums, one double division, times 100 with identical
    * left-to-right association in both engines.
    */
  val q41PromoRevenue = Q(
    "q41_promo_revenue",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      val p = Tables(s, dir, "part").select(col("p_partkey"), col("p_type"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", vol)
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double") /
          sum(vol).cast("double")).as("promo_share"))
    },
    Some("""
      SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS promo_share
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
      ORDER BY promo_share
    """.trim))

  /** TPC-H Q19 pattern — OR of brand/size/quantity conjunct bands as a
    * join predicate. The disjunction shares the partkey equi conjunct,
    * so Catalyst still plans an equi join (broadcast on the dim) and
    * evaluates the bands as a post-join filter; the common
    * `l_quantity <= 30` bound is pushed to the fact scan.
    */
  val q42DisjunctiveBands = Q(
    "q42_disjunctive_bands",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem").filter(col("l_quantity") <= 30.0)
      val p = Tables(s, dir, "part")
      val bands =
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1.0, 11.0)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10.0, 20.0)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20.0, 30.0))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey") && bands)
        .agg(sum(vol).cast("double").as("revenue"), count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
      ORDER BY revenue
    """.trim))

  /** Percent-of-total (ratio_to_report): each nation's share of global
    * revenue. Exact decimal sums at both levels (group and grand total
    * via an unpartitioned window over |nations| rows), ONE double
    * division per row.
    */
  val q43RevenueShare = Q(
    "q43_revenue_share",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val l = Tables(s, dir, "lineitem")
      val sup = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val rev = l.join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(vol).as("rev_dec"))
      rev.select(col("n_name"),
          col("rev_dec").cast("double").as("revenue"),
          (col("rev_dec").cast("double") /
            sum(col("rev_dec")).over(Window.partitionBy()).cast("double"))
            .as("share"))
        .orderBy(col("n_name"))
    },
    Some("""
      WITH rev AS (
        SELECT n_name,
               sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS rev_dec
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name)
      SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
             CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER () AS DOUBLE) AS share
      FROM rev ORDER BY n_name
    """.trim))

  /** Running DISTINCT count over a window — a composition neither engine
    * supports natively (no DISTINCT inside window frames): flag each
    * (priority, custkey)'s first order via row_number (a high-NDV
    * partition key — parallel), then running-sum the flags. The running
    * sum is NOT a window partitioned by the 5-value priority (that
    * funnels the fact table through 5 reducer tasks): it is
    * [[graft.etl.StatOps.withRunningSum]]'s distributed prefix sum —
    * range-partition on (priority, date, orderkey), per-partition
    * running sums, broadcast offsets. Order is total (date, then unique
    * orderkey), so the running values are deterministic row-by-row.
    */
  val q44RunningDistinct = Q(
    "q44_running_distinct_custs",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
      val firstSeen = Window.partitionBy(col("o_orderpriority"), col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val flagged = o
        .withColumn("__new", when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      graft.etl.StatOps.withRunningSum(flagged, Seq("o_orderpriority"),
          Seq("o_orderdate", "o_orderkey"), "__new", "n_distinct_custs")
        .select(col("o_orderkey"), col("o_orderpriority"), col("n_distinct_custs"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH flagged AS (
        SELECT o_orderkey, o_orderpriority, o_orderdate,
               CASE WHEN row_number() OVER (PARTITION BY o_orderpriority, o_custkey
                                            ORDER BY o_orderdate, o_orderkey) = 1
                    THEN 1 ELSE 0 END AS new_cust
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1995-03-01 00:00:00')
      SELECT o_orderkey, o_orderpriority,
             sum(new_cust) OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING)::BIGINT AS n_distinct_custs
      FROM flagged ORDER BY o_orderkey
    """.trim))

  def all: Seq[Q] = Seq(q37VolumeShipping, q38MarketShare, q39ReturnedItems,
    q40PriorityExists, q41PromoRevenue, q42DisjunctiveBands, q43RevenueShare,
    q44RunningDistinct)
}
