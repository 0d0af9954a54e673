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

    // current shape: two-level routed serve recall vs nsuper, with
    // routing-cosine economics (VERDICT r12 item 5)
    import org.apache.spark.sql.functions._
    import graft.ext.Similarity
    val emb = graft.etl.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val queries = emb.filter(col("vec_id") % 100 === 0).localCheckpoint()
    val exact = Similarity.bruteForceTopK(spark, emb, queries,
        "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
      exact.join(approx.select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1L)), Seq("query_id", "neighbor_id"), "left")
        .agg(avg(coalesce(col("__hit"), lit(0L)).cast("double")))
        .collect()(0).getDouble(0)
    val idxDir = graft.queries.Extensions.ensureIvfInt8Index(spark, sfDir)
    val idx = spark.read.parquet(idxDir).localCheckpoint()
    val cents = graft.queries.Extensions.servingCentroids(spark, sfDir)
      .localCheckpoint()
    val nCents = cents.count()
    val nSupers = cents.filter(col("cid") % 29 === 7).count()
    println(s"cells=$nCents supers=$nSupers")
    val flat = Similarity.serveQuantizedIvf(spark, idx, queries, cents,
      "vec_id", "embedding", "cid", "cv", k = 5,
      nprobe = graft.queries.Extensions.ServingNprobe,
      spill = graft.queries.Extensions.ServingSpill)
    println(f"flat nprobe15 recall ${recallOf(flat)}%.3f cosines=$nCents")
    for (ns <- Seq(2, 3, 4)) {
      val routed = Similarity.serveQuantizedIvfTwoLevel(spark, idx, queries,
        cents, "vec_id", "embedding", "cid", "cv", k = 5,
        superMod = 29, superResidue = 7, nsuper = ns,
        nprobe = graft.queries.Extensions.ServingNprobe)
      // routing cosines: supers + avg children over the ns chosen supers
      // (children partition over supers; avg child count = cells/supers)
      val cos = nSupers + ns * nCents / nSupers
      println(f"routed nsuper=$ns recall ${recallOf(routed)}%.3f cosines~$cos")
    }
    spark.stop()
  }
}
