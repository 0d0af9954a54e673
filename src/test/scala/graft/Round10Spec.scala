package graft

import org.apache.spark.sql.functions._

/** Round-10 pins: the TRAINED IVF serving tier (fixed-round Lloyd
  * coarse quantizer + spill-2 multi-assignment) and its recall floor —
  * VERDICT r9 item 1. The quantizer seeds (`vec_id % 18 = 13`) are
  * disjoint from the `% 100 = 0` query set by construction, so the
  * recall numbers carry no train/eval leakage.
  */
class Round10Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("trained serving tier: eval_ann_recall mean >= 0.6 (was 0.23 untrained)") {
    val rows = graft.queries.Registry.queries("eval_ann_recall")(spark, sf)
      .select("recall").as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect()
    assert(rows.nonEmpty)
    val mean = rows.sum / rows.length
    // measured 0.76 at sf0.01 / 0.58 at sf0.1 — the floor leaves noise
    // margin but would catch a regression to the untrained 0.23/0.34
    assert(mean >= 0.6, s"trained-tier mean recall@5 degraded to $mean")
  }

  test("lloydCentroids: fixed rounds, centroid count bounded by seeds, deterministic") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val seeds = emb.filter(col("vec_id") % 18 === 13 && col("vec_id") < 5000)
    val c1 = graft.ext.Similarity.lloydCentroids(spark, emb, seeds,
      "vec_id", "embedding", "vec_id", "embedding", rounds = 2)
    val nSeeds = seeds.count()
    val got = c1.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(got.length <= nSeeds && got.nonEmpty)
    // every centroid id is a seed id (lists keep their seed's identity)
    val seedIds = seeds.select(col("vec_id")).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(got.forall(c => seedIds.contains(c._1)))
    // deterministic: a second training run returns bit-identical centroids
    val again = graft.ext.Similarity.lloydCentroids(spark, emb, seeds,
      "vec_id", "embedding", "vec_id", "embedding", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("spill=2 ivfTopK: no duplicate (query, neighbor) pairs, ranks dense per query") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val out = graft.ext.Similarity.ivfTopK(spark, emb,
      emb.filter(col("vec_id") % 100 === 0),
      graft.queries.Extensions.servingCentroids(spark, sf),
      "vec_id", "embedding", "cid", "cv", k = 5, nprobe = 5,
      spill = graft.queries.Extensions.ServingSpill)
    val rows = out.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaInt)).collect()
    val pairs = rows.map(r => (r._1, r._2))
    assert(pairs.length === pairs.distinct.length,
      "spilled index leaked duplicate candidate pairs through the dedupe")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length),
        s"query $q ranks not dense: ${rs.map(_._3).sorted.mkString(",")}")
    }
  }

  test("spilled int8 index: each vector stored in exactly ServingSpill lists") {
    val idxDir = graft.queries.Extensions.ensureIvfInt8Index(spark, sf)
    val idx = spark.read.parquet(idxDir)
    val perVec = idx.groupBy(col("vec_id")).agg(
      count(lit(1)).as("n"), countDistinct(col("list")).as("nl"))
    val bad = perVec.filter(col("n") =!= graft.queries.Extensions.ServingSpill ||
      col("nl") =!= graft.queries.Extensions.ServingSpill).count()
    assert(bad === 0, s"$bad vectors not stored in exactly ServingSpill distinct lists")
  }

  test("serving centroids artifact: trained table persisted once, k rows, no corpus column") {
    val cents = graft.queries.Extensions.servingCentroids(spark, sf)
    assert(cents.columns.sorted.toSeq === Seq("cid", "cv"))
    val n = cents.count()
    // seed count bound: every 18th vector under 5000
    assert(n > 0 && n <= 278, s"unexpected centroid count $n")
  }
}
