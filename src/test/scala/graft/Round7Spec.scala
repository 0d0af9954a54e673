package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Round-7 additions: the persisted-index serving tier (build/serve
  * split), the cluster-scoped embedding-dedup propose stage, and the
  * residual IVF-PQ recall lift — plan-shape and quality pins.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  // ---- persisted ANN index tier ------------------------------------------

  test("ann_index_serve plan probes the stored index: no encode kernel, no cartesian") {
    // first execution materializes the index artifact for this JVM
    graft.queries.Registry.queries("ann_index_serve")(spark, sf).count()
    val plan = graft.queries.Registry.queries("ann_index_serve")(spark, sf)
      .queryExecution.executedPlan.toString
    // the int8 ENCODE step (floor(x/s + 0.5) over array_max) must not
    // appear anywhere: serving reconstructs from stored codes only
    assert(!plan.contains("floor("), plan.take(1200))
    assert(!plan.contains("array_max"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    // probe is a broadcast join on the stored list id
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("serveQuantizedIvf over the persisted index matches the build-inclusive query") {
    // same knobs as ann_ivf_quantized (k=5, nprobe=2): the split must not
    // change results, only where the encode cost is paid
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val cents = emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000)
    val idx = Similarity.buildQuantizedIvfIndex(spark, emb, cents,
      "vec_id", "embedding", "vec_id", "embedding").localCheckpoint()
    val served = Similarity.serveQuantizedIvf(spark, idx,
        emb.filter(col("vec_id") % 100 === 0), cents,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val inline = graft.queries.Registry.queries("ann_ivf_quantized")(spark, sf)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(served === inline)
  }

  test("quantized-IVF index artifact has one list per vector and int8-range codes") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val cents = emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000)
    val idx = Similarity.buildQuantizedIvfIndex(spark, emb, cents,
      "vec_id", "embedding", "vec_id", "embedding")
    val n = emb.count()
    assert(idx.count() === n)
    assert(idx.select(countDistinct(col("vec_id"))).as[Long].head() === n)
    val bad = idx.filter(exists(col("codes"), c => abs(c) > 127)).count()
    assert(bad === 0L, s"$bad vectors with out-of-int8-range codes")
  }

  // ---- cluster-scoped embedding dedup propose ----------------------------

  test("coarseAssignJoin matches kmeansAssign on the same centroid set") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val cents = emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000)
    val viaJoin = Similarity.coarseAssignJoin(spark, emb, cents,
        "vec_id", "embedding", "vec_id", "embedding")
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSet
    val viaInline = Similarity.kmeansAssign(spark, emb, cents,
        "vec_id", "embedding", "vec_id", "embedding")
      .select("vec_id", "cluster").as[(Long, Long)].collect().toSet
    assert(viaJoin === viaInline)
  }

  test("embedding propose stage: corpus never shuffles to score, centroids broadcast") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val plan = Similarity.coarseAssignJoin(spark, emb,
        emb.filter(col("vec_id") % 37 === 0),
        "vec_id", "embedding", "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    // the only exchange is the n-row post-aggregate shuffle (partial
    // argmax is map-side), never a corpus x centroids shuffle
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("dedup_embedding_pairs still recalls every planted scaled copy") {
    val got = graft.queries.Registry.queries("dedup_embedding_pairs")(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val n = graft.etl.Tables(spark, sf, "embeddings").count()
    // every (v, v+100000) planted pair must survive the cluster-scoped
    // propose: scaling preserves direction, so copy and original assign
    // to the same list
    (0L until n).foreach { v =>
      assert(got.contains((v, v + 100000L)), s"planted pair for vec $v lost")
    }
  }
}
