package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch profiler for decomposing a slow query's stages.
  * Not part of the registry or test suite; edit freely between runs.
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ScratchProfile"
  *
  * Current shape: decompose dedup_containment (the largest remaining
  * non-by-design tail query at r16 close) into artifact scan, bucket
  * aggregate, pair expansion + distinct, and verify at sf0.1.
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
    import org.apache.spark.sql.functions._
    val setsDir = graft.queries.Breadth20.ensureAugShingleSets(spark, sfDir)
    val maxDf = 20
    (1 to 3).foreach { i =>
      time(s"[$i] full query (count)") {
        graft.SparkEntry.queries("dedup_containment")(spark, sfDir).count()
      }
      val sets = spark.read.parquet(setsDir).localCheckpoint(eager = false)
      time(s"[$i] postCount agg (materializes)") {
        sets.agg(coalesce(sum(size(col("__hs"))), lit(0L))).collect()
      }
      val buckets = sets.select(col("doc_id"), explode(col("__hs")).as("__h"))
        .groupBy(col("__h"))
        .agg(sort_array(collect_set(col("doc_id"))).as("__ds"))
        .filter(size(col("__ds")).between(2, maxDf))
      val cands = time(s"[$i] buckets + expand + distinct") {
        val c = buckets.select(explode(expr(
            """flatten(transform(__ds, (a, i) ->
                 transform(slice(__ds, i + 2, size(__ds)), b -> struct(a AS doc_a, b AS doc_b))))"""))
            .as("__p"))
          .select(col("__p.doc_a"), col("__p.doc_b"))
          .distinct()
          .localCheckpoint(eager = false)
        println(s"    n_cands=${c.count()}")
        c
      }
      time(s"[$i] verify (score joins + filter)") {
        cands
          .join(sets.select(col("doc_id").as("doc_a"), col("__hs").as("__ha")), "doc_a")
          .join(sets.select(col("doc_id").as("doc_b"), col("__hs").as("__hb")), "doc_b")
          .withColumn("__inter", size(array_intersect(col("__ha"), col("__hb"))))
          .withColumn("__ca", round(col("__inter").cast("double") / size(col("__ha")), 9))
          .withColumn("__cb", round(col("__inter").cast("double") / size(col("__hb")), 9))
          .select(explode(array(
            struct(col("doc_a").as("contained"), col("doc_b").as("container"),
              col("__ca").as("containment")),
            struct(col("doc_b").as("contained"), col("doc_a").as("container"),
              col("__cb").as("containment")))).as("__d"))
          .filter(col("__d.containment") >= 0.8)
          .count()
      }
    }
    spark.stop()
  }
}
