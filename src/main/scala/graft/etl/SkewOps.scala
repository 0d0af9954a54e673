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

  /** Salted equi join for a skewed probe side: the probe's hot keys
    * hash across `buckets` sub-partitions, and the build side is
    * replicated once per bucket (explode over 0..buckets-1), so the join
    * on (key, salt) spreads a hot key over `buckets` tasks instead of
    * funnelling it through one. Inner-join semantics are preserved
    * exactly: each probe row carries ONE salt and meets each matching
    * build row exactly once (at that salt's replica).
    *
    * AQE's skew-join splitting handles this transparently when the
    * build side fits its stats-based thresholds; explicit salting is
    * the deterministic fallback for the 100 TB plan when the build side
    * must also shuffle (too big to broadcast) and a single key
    * dominates (AQE can only split the PROBE side's partitions — a
    * sort-merge run of one giant key still serializes its merge).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      discriminator: String, buckets: Int = 16): DataFrame = {
    val salted = probe.withColumn("__salt", saltCol(col(discriminator), buckets))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
