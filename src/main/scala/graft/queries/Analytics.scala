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

  def all: Seq[Q] = Seq(q1Pricing)
}
