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

    // current shape: decompose dedup_incremental_prefix at sf0.1
    import org.apache.spark.sql.functions._
    import graft.ext.Dedup
    graft.functions.VectorExpressions.register(spark)
    val d0 = graft.etl.Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val docs = d0.unionByName(
      d0.select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("xx "), col("text")).as("text")))
      .filter(Dedup.hash32(col("doc_id").cast("string")) % 2 === 0)
    val sh = time("shingle-hash") {
      Dedup.withShingleHashes(docs, "text", k = 3)
        .select(col("doc_id"), col("__hashes").as("__tk")).localCheckpoint()
    }
    val split = Dedup.hash32(col("doc_id").cast("string")) % 4
    val s1 = time("rank s1")(Dedup.valueRankedTokens(sh.filter(split === 0), "doc_id", "__tk").localCheckpoint())
    val s2 = time("rank s2")(Dedup.valueRankedTokens(sh.filter(split =!= 0), "doc_id", "__tk").localCheckpoint())
    (1 to 2).foreach { i =>
      time(s"march rep$i") {
        Dedup.prefixPairsMarch(Seq(s1, s2), "doc_id", 0.5).count()
      }
    }
    (1 to 2).foreach { i =>
      time(s"one-shot rarest rep$i") {
        Dedup.prefixFilterPairs(sh, "doc_id", "__tk", 0.5).count()
      }
    }
    spark.stop()
  }
}
