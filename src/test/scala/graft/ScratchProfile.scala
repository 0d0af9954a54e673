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

    // current shape: decompose dedup_tfidf_pairs — ingest-staged
    // postings vs in-query build, and the pair stage alone, 3 reps each
    import org.apache.spark.sql.functions._
    import graft.ext.TextOps
    val pq = time("ensureTfidfPostings (ingest)") {
      graft.queries.Breadth8.ensureTfidfPostings(spark, sfDir)
    }
    (1 to 3).foreach { i =>
      time(s"serve from parquet rep$i") {
        TextOps.tfidfPairsFromPostings(spark.read.parquet(pq), "doc_id", 0.5)
          .orderBy(col("doc_a"), col("doc_b")).count()
      }
    }
    (1 to 3).foreach { i =>
      time(s"old full build+pairs rep$i") {
        val docs = graft.etl.Tables(spark, sfDir, "documents")
          .select(col("doc_id"), col("text"))
        TextOps.tfidfSimilarPairs(docs, "doc_id", "text",
          maxDf = 20, minSim = 0.5)
          .orderBy(col("doc_a"), col("doc_b")).count()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
