package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch profiler for decomposing a slow query's stages.
  * Not part of the registry or test suite; edit freely between runs.
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ScratchProfile"
  *
  * Current shape: decompose dedup_incremental_prefix (the r16 slowest
  * remaining query) into artifact read, posting materialization + guard,
  * candidate join, verify, and final sort at sf0.1.
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
    import graft.ext.Dedup
    val rankedDir = graft.queries.Breadth11.ensurePrefixRanked(spark, sfDir)
    (1 to 3).foreach { i =>
      time(s"[$i] full query (count)") {
        graft.SparkEntry.queries("dedup_incremental_prefix")(spark, sfDir).count()
      }
      val ranked = spark.read.parquet(rankedDir)
      val split = Dedup.hash32(col("doc_id").cast("string")) % 4
      val states = Seq(ranked.filter(split === 0), ranked.filter(split =!= 0))
      val threshold = 0.5
      val tagged = states.zipWithIndex
        .map { case (st, j) => st.withColumn("__b", lit(j)) }
        .reduce(_ unionByName _)
      val pp = time(s"[$i] pp materialize + guard") {
        val p = tagged
          .withColumn("__p", expr(
            s"slice(__st, 1, size(__st) - cast(ceil($threshold * size(__st)) as int) + 1)"))
          .select(col("doc_id"), col("__b"), col("__n"),
            posexplode(col("__p")).as(Seq("__i0", "__t")))
          .select(col("doc_id"), col("__b"), col("__n"), (col("__i0") + 1).as("__i"),
            col("__t"))
          .localCheckpoint(eager = false)
        p.groupBy(col("__b"), col("__t")).agg(count(lit(1)).as("__len"))
          .agg(max(col("__len"))).head()
        p
      }
      def passes(bound: org.apache.spark.sql.Column) =
        bound.cast("double") * (1.0 + threshold) >=
          (col("__na") + col("__nb")).cast("double") * threshold - 1e-9
      val aSide = pp.select(col("doc_id").as("doc_a"), col("__b").as("__ba"),
        col("__n").as("__na"), col("__i").as("__ia"), col("__t"))
      val bSide = pp.select(col("doc_id").as("doc_b"), col("__b").as("__bb"),
        col("__n").as("__nb"), col("__i").as("__ib"), col("__t").as("__t2"))
      val marchCond = (col("__ba") < col("__bb") && col("doc_a") =!= col("doc_b")) ||
        (col("__ba") === col("__bb") && col("doc_a") < col("doc_b"))
      val cands = aSide.join(bSide.hint("shuffle_hash"),
          col("__t") === col("__t2") && marchCond &&
            least(col("__na"), col("__nb")).cast("double") >=
              greatest(col("__na"), col("__nb")) * threshold &&
            passes(least(col("__ia"), col("__ib")) +
              least(col("__na") - col("__ia"), col("__nb") - col("__ib"))))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(min(col("__ia")).as("__i1"), min(col("__ib")).as("__j1"),
          first(col("__na")).as("__na"), first(col("__nb")).as("__nb"))
        .filter(passes(lit(1) +
          least(col("__na") - col("__i1"), col("__nb") - col("__j1"))))
        .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        .distinct()
      val candsM = time(s"[$i] candidate join + distinct") {
        val c = cands.localCheckpoint(eager = false); c.count(); c
      }
      val sets = states.map(_.select(col("doc_id"), col("__st")))
        .reduce(_ unionByName _)
      time(s"[$i] verify + sort (count)") {
        candsM
          .join(sets.select(col("doc_id").as("doc_a"), col("__st").as("__ta")), "doc_a")
          .join(sets.select(col("doc_id").as("doc_b"), col("__st").as("__tb")), "doc_b")
          .withColumn("inter", size(array_intersect(col("__ta"), col("__tb"))))
          .withColumn("jaccard", col("inter").cast("double") /
            (size(col("__ta")) + size(col("__tb")) - col("inter")))
          .filter(col("jaccard") >= threshold)
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
          .count()
      }
      time(s"[$i] one-shot dedup_prefix_filter") {
        graft.SparkEntry.queries("dedup_prefix_filter")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
