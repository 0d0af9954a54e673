package graft.queries

import graft.etl.{StatOps, Tables}
import org.apache.spark.sql.functions._

/** Round-11 ninth wave: exact two-sample Kolmogorov–Smirnov drift
  * test — the bin-free complement of dq4's PSI.
  */
object Breadth18 {

  /** KS drift between the pre-1995 and post-1995 order-value
    * distributions — [[StatOps.ksTwoSample]]: the exact max-CDF-gap
    * statistic with no binning choice to defend, distributed by the
    * two-measure prefix-sum CDF (range-partitioned running sums +
    * broadcast offsets — the groupedCdf discipline, never a
    * global-sort window over the fact table). The oracle replays the
    * same step functions with a plain window over the value histogram
    * and picks the same (D desc, value desc) argmax.
    */
  val dq12KsDrift = Q(
    "dq12_ks_drift",
    (s, dir) =>
      StatOps.ksTwoSample(
        Tables(s, dir, "orders"),
        when(col("o_orderdate") < lit("1995-01-01").cast("timestamp"), 0L)
          .otherwise(1L),
        "o_totalprice"),
    Some("""
      WITH s AS (SELECT o_totalprice::DOUBLE AS v,
                        CASE WHEN o_orderdate < '1995-01-01'::TIMESTAMP
                          THEN 0 ELSE 1 END AS h
                 FROM orders WHERE o_totalprice IS NOT NULL),
      hst AS (SELECT v,
                sum(CASE WHEN h = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
                sum(CASE WHEN h = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
              FROM s GROUP BY 1),
      c AS (SELECT v,
              sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cuma,
              sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cumb
            FROM hst),
      t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM hst),
      g AS (SELECT v, na, nb,
              abs(cuma::DOUBLE / na::DOUBLE - cumb::DOUBLE / nb::DOUBLE) AS d
            FROM c, t)
      SELECT na AS n_a, nb AS n_b, round(d, 9) AS ks_stat, v AS ks_at
      FROM g ORDER BY d DESC, v DESC LIMIT 1
    """.trim))

  val all: Seq[Q] = Seq(dq12KsDrift)
}
