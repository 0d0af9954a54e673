package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev-only scratch profiler for decomposing a slow query's stages.
  * Not part of the registry or test suite; edit freely between runs.
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ScratchProfile"
  */
object ScratchProfile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.register(spark)
    import graft.etl.Tables

    val d = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"), col("lang"))
    val copies = d.withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(lit("xx "), col("text")))
    val docs = d.unionByName(copies)

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val bands = Dedup.minhashBands(docs, "doc_id", "text")
      time("bands (sig + explode)")(bands.count())
      val pairsNoDistinct = {
        val a = bands.select(col("doc_id").as("doc_a"), col("band"))
        val b = bands.select(col("doc_id").as("doc_b"), col("band").as("band_b"))
        a.join(b.hint("shuffle_hash"),
          col("band") === col("band_b") && col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"))
      }
      time("join (no distinct)")(pairsNoDistinct.count())
      val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      time("pairs (with distinct)")(pairs.count())
      val t0 = System.nanoTime()
      val comp = Dedup.clusterAssignment(docs, pairs, "doc_id")
      val built = (System.nanoTime() - t0) / 1e9
      time("clusterAssignment count")(comp.count())
      println(f"clusterAssignment build (CC rounds)   $built%8.3f s")
    }
    spark.stop()
  }
}
