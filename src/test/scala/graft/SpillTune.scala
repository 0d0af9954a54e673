package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: sweep the boundary-spill epsilon of the IVF serving tier
  * and print (mean recall@5, stored-rows factor) per eps — the
  * measurement behind the ServingSpillEps choice. Run:
  * `sbt "Test/runMain graft.SpillTune [sfDir]"`.
  */
object SpillTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.etl.Tables(spark, sfDir, "embeddings")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val cents = graft.queries.Extensions.servingCentroids(spark, sfDir)
    val exact = graft.ext.Similarity
      .bruteForceTopK(spark, emb, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    // nprobe rides the serving constant: the sweep must measure the eps
    // knee at the CURRENT grid/probe point (the r11 sweep ran the old
    // 278-cell/nprobe-5 tier and went stale when the grid tripled)
    for (eps <- Seq(-1.0, 0.05, 0.1, 0.15, 0.2)) {
      val approx = graft.ext.Similarity.ivfTopK(spark, emb, queries, cents,
          "vec_id", "embedding", "cid", "cv", k = 5,
          nprobe = graft.queries.Extensions.ServingNprobe,
          spill = graft.queries.Extensions.ServingSpill, spillEps = eps)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(approx, Seq("query_id", "neighbor_id")).count()
      val nq = exact.select("query_id").distinct().count()
      val stored = graft.ext.Similarity.buildQuantizedIvfIndex(spark, emb,
        cents, "vec_id", "embedding", "cid", "cv",
        spill = graft.queries.Extensions.ServingSpill, spillEps = eps).count()
      println(f"eps=$eps%5.2f  recall@5=${hit.toDouble / (5 * nq)}%.3f  " +
        f"index rows=${stored}%d (${stored.toDouble / n}%.2fx corpus)")
    }
    spark.stop()
  }
}
