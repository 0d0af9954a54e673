package graft

import org.apache.spark.sql.functions._

/** Partition-count invariance — the property the engine-wide decimal
  * moment discipline (round-then-DECIMAL-sum) exists to buy: a result
  * must not depend on how many shuffle partitions computed it, or the
  * same job gives different answers on a 32-core box and a
  * 1000-executor cluster. Each float-heavy family representative runs
  * under 3 and then 13 shuffle partitions (both co-prime to the data's
  * natural groupings) and must collect identical rows.
  *
  * `spark.sql.shuffle.partitions` is a runtime conf, so one session
  * re-plans each run; results are canonicalized by sorted string form
  * (the driver's hash-compare discipline).
  */
class DeterminismSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  private val targets = Seq(
    "text_lm_score",        // DECIMAL(27,9) nll sums
    "text_dsir_weights",    // bucketed log-ratio sums
    "text_ccnet_buckets",   // distributed CDF thresholds + decimal mean
    "text_source_kl",       // DECIMAL(38,12) contribution sums
    "eval_source_drift",    // rounded shares before ln
    "ann_kmeans_iter",      // element-wise decimal centroid means
    "q9_percentiles",       // range-partitioned prefix-sum CDF
    "q6_agg_stats",         // money-decimal aggregates
    "eval_retrieval_metrics") // decimal DCG folds

  private def canon(name: String): Seq[String] = {
    val df = graft.queries.Registry.queries(name)(spark, sf)
    df.collect().map(_.toString).sorted.toSeq
  }

  test("float-heavy queries are invariant to the shuffle partition count") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      targets.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = canon(name)
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        val b = canon(name)
        assert(a === b, s"$name: result depends on the partition count")
        assert(a.nonEmpty, s"$name: empty result defeats the comparison")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }
}
