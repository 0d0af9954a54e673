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

    // current shape: decompose pipeline_curation_funnel at sf0.1
    import org.apache.spark.sql.functions._
    import graft.ext.{Dedup, TextOps}
    graft.functions.VectorExpressions.register(spark)
    val dir = sfDir
    val idx = time("ensureAugBandIndex") {
      graft.queries.Breadth20.ensureAugBandIndex(spark, dir)
    }
    // augmentedDocs is private to queries; rebuild the equivalent corpus
    val d0 = graft.etl.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val docs = d0.unionByName(
      d0.withColumn("doc_id", col("doc_id") + 100000L)
        .withColumn("text", concat(lit("xx "), col("text"))))
    val dcp = time("docs checkpoint")(docs.localCheckpoint())
    val g = time("gopher gate") {
      TextOps.gopherRulesByLang(dcp, "doc_id", "text", "lang")
        .filter(col("keep") === 1).select(col("doc_id"))
    }
    val s2 = time("s2 checkpoint")(dcp.join(g, Seq("doc_id"), "left_semi").localCheckpoint())
    val s3 = time("s3 exact dedup") {
      s2.groupBy(md5(Dedup.normText(col("text"))).as("__h"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
        .join(s2, Seq("doc_id"), "left_semi").localCheckpoint()
    }
    val pairs = time("pairs from index") {
      Dedup.indexCandidatePairs(spark.read.parquet(idx), "doc_id")
        .join(s3.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
        .join(s3.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
        .localCheckpoint()
    }
    val s4 = time("cluster assignment") {
      Dedup.clusterAssignment(dcp.join(s3, Seq("doc_id"), "left_semi"), pairs, "doc_id")
        .filter(col("doc_id") === col("cluster_id")).select(col("doc_id")).localCheckpoint()
    }
    val s5 = time("quality gate") {
      TextOps.withQuality(dcp.join(s4, Seq("doc_id"), "left_semi"), "text")
        .filter(col("quality") >= 0.5 && col("n_words") >= 10).select(col("doc_id")).count()
    }
    spark.stop()
  }
}
