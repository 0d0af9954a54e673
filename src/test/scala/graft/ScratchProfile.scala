package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch profiler for decomposing a slow query's stages.
  * Not part of the registry or test suite; edit freely between runs.
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ScratchProfile"
  *
  * Current shape: decompose eval_heaps_growth's two jobs (dense-id
  * guard aggregate vs the bucket-aggregate collect) at sf0.1.
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
    graft.etl.Tables.names.foreach { t =>
      try graft.etl.Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    import org.apache.spark.sql.functions._
    val docs = graft.etl.Tables(spark, sfDir, "documents")
    (1 to 3).foreach { i =>
      time(s"[$i] head agg (max,count doc_id)") {
        docs.select((col("doc_id") + 1L).as("__rk"))
          .agg(max(col("__rk")), count(lit(1))).head()
      }
      time(s"[$i] docsPer-only agg") {
        docs.select((col("doc_id") + 1L).as("__rk"))
          .groupBy((floor((col("__rk") * 10 - 1).cast("double") / 100000.0) + 1).as("b"))
          .agg(count(lit(1))).collect()
      }
      time(s"[$i] vocab first-seen agg") {
        docs.select((col("doc_id") + 1L).as("__rk"),
            explode(split(lower(col("text")), "\\s+")).as("token"))
          .filter(col("token") =!= "")
          .groupBy(col("token")).agg(min(col("__rk")).as("__fs"))
          .groupBy((floor((col("__fs") * 10 - 1).cast("double") / 100000.0) + 1).as("b"))
          .agg(count(lit(1))).collect()
      }
      time(s"[$i] full heapsGrowth") {
        graft.ext.TextOps.heapsGrowth(docs, "doc_id", "text", buckets = 10)
          .collect()
      }
      time(s"[$i] full zipfCurve") {
        graft.ext.TextOps.zipfCurve(docs, "doc_id", "text").collect()
      }
    }
    spark.stop()
  }
}
