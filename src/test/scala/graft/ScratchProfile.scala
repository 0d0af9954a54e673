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

    // current shape: decompose dedup_prefix_filter's chain at sf0.1
    import org.apache.spark.sql.functions._
    import graft.ext.Dedup
    val d0 = graft.etl.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val docs = d0.unionByName(
        d0.withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("text", concat(lit("xx "), col("text"))))
      .filter(Dedup.hash32(col("doc_id").cast("string")) % 2 === 0)
    val sh = Dedup.withShingles(docs, "text", k = 3)
      .withColumn("__shingles", expr(
        "transform(__shingles, s -> cast(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT))"))
    time("shingles count")(sh.count())
    val toks = sh.select(col("doc_id"), array_distinct(col("__shingles")).as("__toks"))
    val posting = toks.select(col("doc_id"), explode(col("__toks")).as("__t"))
    time("posting count")(posting.count())
    val dfreq = posting.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val ranked = posting.join(dfreq, "__t")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("__df"), col("__t")))).as("__rt"))
      .select(col("doc_id"),
        expr("transform(__rt, x -> x.__t)").as("__st"),
        size(col("__rt")).as("__n"))
    val rankedC = time("ranked checkpoint")(ranked.localCheckpoint())
    val prefixed = rankedC.withColumn("__p",
      expr(s"slice(__st, 1, size(__st) - cast(ceil(0.5 * size(__st)) as int) + 1)"))
    val pp = time("pp checkpoint")(prefixed
      .select(col("doc_id"), col("__n"), explode(col("__p")).as("__t"))
      .localCheckpoint())
    time("maxPosting probe")(
      pp.groupBy(col("__t")).agg(count(lit(1)).as("__len"))
        .agg(max(col("__len"))).head())
    val a = pp.select(col("doc_id").as("doc_a"), col("__n").as("__na"), col("__t"))
    val b = pp.select(col("doc_id").as("doc_b"), col("__n").as("__nb"),
      col("__t").as("__t2"))
    val cand = a.join(b.hint("shuffle_hash"),
        col("__t") === col("__t2") && col("doc_a") < col("doc_b") &&
          least(col("__na"), col("__nb")).cast("double") >=
            greatest(col("__na"), col("__nb")) * 0.5)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val candC = time("candidate join+distinct")(cand.localCheckpoint())
    println(s"candidates: ${candC.count()}")
    val out = candC
      .join(rankedC.select(col("doc_id").as("doc_a"), col("__st").as("__ta")), "doc_a")
      .join(rankedC.select(col("doc_id").as("doc_b"), col("__st").as("__tb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("__ta"), col("__tb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("__ta")) + size(col("__tb")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
    time("verify")(out.count())
    spark.stop()
  }
}
