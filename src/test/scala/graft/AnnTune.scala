package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement main (test scope, like ScratchProfile/SpillTune):
  * decompose the sf0.1 eval_ann_recall gap and compare coarse-quantizer
  * variants at a FIXED scanned fraction. Usage:
  *   sbt "Test/runMain graft.AnnTune /root/testdata/sf0.1"
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Similarity
    val emb = graft.etl.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = emb.count()
    val queries = emb.filter(col("vec_id") % 100 === 0).localCheckpoint()
    val exact = Similarity.bruteForceTopK(spark, emb, queries,
        "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()

    def recallOf(approx: DataFrame): Double = {
      val r = exact.join(approx.select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1L)), Seq("query_id", "neighbor_id"), "left")
        .agg(avg(coalesce(col("__hit"), lit(0L)).cast("double")))
        .collect()(0).getDouble(0)
      r
    }

    // scanned fraction: avg over queries of candidate rows / corpus
    def scannedFrac(cents: DataFrame, nprobe: Int, spill: Int): Double = {
      val sizes = Similarity.kmeansAssign(spark, emb, cents,
          "vec_id", "embedding", "cid", "cv")
        .groupBy(col("cluster")).count()
      val qAssign = Similarity.ivfTopK(spark, emb, queries, cents,
        "vec_id", "embedding", "cid", "cv", k = 5, nprobe = nprobe,
        spill = spill)
      // approximate: nprobe lists x avg list size x spill / n
      val c = sizes.count()
      val _ = qAssign
      nprobe.toDouble * spill / c
    }

    def centsFor(mod: Int, rem: Int, rounds: Int): DataFrame =
      Similarity.lloydCentroids(spark, emb,
        emb.filter(col("vec_id") % mod === rem && col("vec_id") < 5000),
        "vec_id", "embedding", "vec_id", "embedding", rounds = rounds)
        .localCheckpoint()

    def centsFor2(rounds: Int): DataFrame =
      Similarity.lloydCentroids(spark, emb,
        emb.filter((col("vec_id") % 18 === 13 || col("vec_id") % 18 === 5) &&
          col("vec_id") < 5000),
        "vec_id", "embedding", "vec_id", "embedding", rounds = rounds)
        .localCheckpoint()

    def run(tag: String, cents: DataFrame, nprobe: Int, spill: Int,
        spillEps: Double = -1.0): Unit = {
      val t0 = System.nanoTime()
      val approx = Similarity.ivfTopK(spark, emb, queries, cents,
        "vec_id", "embedding", "cid", "cv", k = 5, nprobe = nprobe,
        spill = spill, spillEps = spillEps)
      val r = recallOf(approx)
      val c = cents.count()
      val frac = nprobe.toDouble * spill / c
      println(f"$tag%-40s recall@5 $r%.3f  c=$c%4d nprobe=$nprobe spill=$spill eps=$spillEps frac~$frac%.3f  ${(System.nanoTime()-t0)/1e9}%6.1f s")
    }

    println(s"corpus n=$n, queries=${queries.count()}")
    run("3x odd %6=3 np15 sp2", centsFor(6, 3, 2), 15, 2)

    // PQ recall: plain vs HD-rotated space, m=8 (subDim 8) and m=16
    val remb = emb.select(col("vec_id"),
      Similarity.opqRotate(col("embedding"), 64).as("embedding"))
      .localCheckpoint()
    val rq = remb.filter(col("vec_id") % 100 === 0)
    def pqRecall(corpus: DataFrame, qs: DataFrame, m: Int): Double =
      recallOf(Similarity.pqTopK(spark, corpus, qs,
        corpus.filter(col("vec_id") % 5 === 0 && col("vec_id") < 5000),
        "vec_id", "embedding", m = m, k = 5))
    Seq(8, 16).foreach { m =>
      println(f"pq m=$m plain   recall@5 ${pqRecall(emb, queries, m)}%.3f")
      println(f"pq m=$m rotated recall@5 ${pqRecall(remb, rq, m)}%.3f")
    }
    spark.stop()
  }
}
