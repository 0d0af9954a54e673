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

    // current shape: quantify the PPJoin positional filter on
    // dedup_prefix_filter's propose at sf0.1 — raw token-match volume,
    // candidate pairs WITHOUT the positional stages (length filter +
    // distinct, the r11 shape) vs WITH them (r12), and the verified
    // output both must agree on (exactness witness)
    import org.apache.spark.sql.functions._
    import graft.ext.Dedup
    val ranked = time("ranked artifact (ingest)") {
      spark.read.parquet(
        graft.queries.Breadth11.ensurePrefixRanked(spark, sfDir))
        .localCheckpoint()
    }
    val t = 0.5
    val prefixed = ranked.withColumn("__p",
      expr(s"slice(__st, 1, size(__st) - cast(ceil($t * size(__st)) as int) + 1)"))
    val pp = time("pp checkpoint")(prefixed
      .select(col("doc_id"), col("__n"),
        posexplode(col("__p")).as(Seq("__i0", "__t")))
      .select(col("doc_id"), col("__n"), (col("__i0") + 1).as("__i"), col("__t"))
      .localCheckpoint())
    val a = pp.select(col("doc_id").as("doc_a"), col("__n").as("__na"),
      col("__i").as("__ia"), col("__t"))
    val b = pp.select(col("doc_id").as("doc_b"), col("__n").as("__nb"),
      col("__i").as("__ib"), col("__t").as("__t2"))
    def passes(bound: org.apache.spark.sql.Column) =
      bound.cast("double") * (1.0 + t) >=
        (col("__na") + col("__nb")).cast("double") * t - 1e-9
    val lengthOk = col("__t") === col("__t2") && col("doc_a") < col("doc_b") &&
      least(col("__na"), col("__nb")).cast("double") >=
        greatest(col("__na"), col("__nb")) * t
    println(s"raw length-filtered token matches: " +
      time("matches (no positional)")(a.join(b.hint("shuffle_hash"), lengthOk).count()))
    val candOld = a.join(b.hint("shuffle_hash"), lengthOk)
      .select(col("doc_a"), col("doc_b")).distinct()
    println(s"candidates r11 (distinct, no positional): " +
      time("candidates r11")(candOld.count()))
    val candNew = a.join(b.hint("shuffle_hash"),
        lengthOk && passes(least(col("__ia"), col("__ib")) +
          least(col("__na") - col("__ia"), col("__nb") - col("__ib"))))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("__ia")).as("__i1"), min(col("__ib")).as("__j1"),
        first(col("__na")).as("__na"), first(col("__nb")).as("__nb"))
      .filter(passes(lit(1) +
        least(col("__na") - col("__i1"), col("__nb") - col("__j1"))))
      .select(col("doc_a"), col("doc_b"))
    println(s"candidates r12 (positional, first-match bound): " +
      time("candidates r12")(candNew.count()))
    val full = time("full query (served)") {
      Dedup.prefixFilterPairsRanked(ranked, "doc_id", threshold = t).count()
    }
    println(s"verified output pairs: $full")
    spark.stop()
  }
}
