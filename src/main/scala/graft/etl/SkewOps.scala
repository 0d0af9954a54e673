package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers for hot grouping keys at scale.
  *
  * AQE's skew-join splitting covers joins; for aggregations over a
  * pathologically hot key the classic fix is salting: shard each group
  * into `buckets` sub-groups, partially aggregate, then merge. Two
  * shuffles, but the first distributes the hot key across the cluster
  * instead of funnelling it through one task. Only decomposable
  * aggregates (sum/count/min/max) can be salted this way.
  */
object SkewOps {

  /** Deterministic salt derived from a discriminator column (e.g. the
    * row's natural unique id), so re-runs shard identically.
    */
  def saltCol(discriminator: Column, buckets: Int): Column =
    pmod(xxhash64(discriminator), lit(buckets.toLong))

  /** Salted sum/count over possibly-skewed keys: shard → partial
    * aggregate → merge. Result equals a direct groupBy (sum/count are
    * associative), with the hot key's work spread over `buckets` tasks.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      discriminator: String, buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", saltCol(col(discriminator), buckets))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
