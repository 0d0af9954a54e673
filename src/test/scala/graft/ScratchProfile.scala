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
    println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
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
      time("docs scan")(docs.count())
      val words = Dedup.withWords(docs, "text", 3)
      time("withWords")(words.count())
      val hs = words.withColumn("__hs",
        array_distinct(expr("graft_shingle_hashes64(__words, 3)")))
      time("shingle+distinct")(hs.select(sum(size(col("__hs")))).collect())
      val postings = hs.select(col("doc_id"), col("lang").as("__bk"),
        size(col("__hs")).as("__n"), explode(col("__hs")).as("__h"))
      time("postings")(postings.count())
      val a = postings.select(col("doc_id").as("doc_a"), col("__bk"),
        col("__n").as("__na"), col("__h"))
      val b = postings.select(col("doc_id").as("doc_b"), col("__bk").as("__bk2"),
        col("__n").as("__nb"), col("__h").as("__h2"))
      val joined = a.join(b,
        col("__bk") === col("__bk2") && col("__h") === col("__h2") &&
          col("doc_a") < col("doc_b"))
      time("postings self-join SMJ")(joined.count())
      val joinedSh = a.join(b.hint("shuffle_hash"),
        col("__bk") === col("__bk2") && col("__h") === col("__h2") &&
          col("doc_a") < col("doc_b"))
      time("postings self-join SHJ")(joinedSh.count())
      val grouped = joinedSh.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).cast("int").as("inter"),
          first(col("__na")).as("__na"), first(col("__nb")).as("__nb"))
      time("SHJ + groupBy")(grouped.count())
      val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 0.5)
      time("full ngramJaccardPairs")(full.count())
      if (rep == 1) {
        println("postings rows: " + postings.count())
        println("joined rows:   " + joined.count())
      }
    }
    spark.stop()
  }
}
