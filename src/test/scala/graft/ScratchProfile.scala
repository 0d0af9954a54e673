package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch profiler for decomposing a slow query's stages.
  * Not part of the registry or test suite; edit freely between runs.
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ScratchProfile"
  *
  * Current shape: decompose the per-query FIXED cost (plan build,
  * analyze+optimize+physical, codegen+execute) for a few cheap
  * registry queries, repeated, to see what a 145-query bench pays
  * per query beyond the data.
  */
object ScratchProfile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.register(spark)

    // table warm-up as in Bench
    graft.etl.Tables.names.foreach { t =>
      try graft.etl.Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }

    // current shape: explain(formatted) audit of the round-9 breadth
    // queries — grep the printed plans for broadcast/pushdown/partition
    // properties
    for (name <- Seq("ann_dim_stats", "sketch_cms_topk", "ann_mmr_diversify",
        "media_scene_changes", "text_split_leakage", "text_bpe_merges")) {
      println(s"================ $name ================")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
