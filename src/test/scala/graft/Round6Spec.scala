package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Round-6 additions: quantized IVF serving (the probe-limited plan the
  * round-5 verdict asked for in place of brute-force quantized ranking)
  * and product quantization — recall, exactness, and plan-shape pins.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  // recall pins run at sf0.01 (5 queries × top-5 = 25 pairs); the tiny
  // sf0.001 corpus has a single query vector and pins nothing
  private val sf = "/root/testdata/sf0.01"

  // ---- quantized IVF serving ---------------------------------------------

  test("ivfQuantizedTopK: marginal recall loss of int8 codes vs full-precision IVF is tiny") {
    val ivf = graft.queries.Registry.queries("ann_ivf_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = graft.queries.Registry.queries("ann_ivf_quantized")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    // the recall ceiling is the coarse quantizer (nprobe), NOT the int8
    // codes: quantized serving must return almost exactly what
    // full-precision IVF returns (measured 1.0 at sf0.01)
    val overlap = (ivf & quant).size.toDouble / ivf.size
    assert(overlap >= 0.9, s"int8-marginal overlap with full-precision IVF: $overlap")
  }

  test("ivfQuantizedTopK plans no cartesian product and no corpus-side shuffle join") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val plan = Similarity.ivfQuantizedTopK(spark, emb,
        emb.filter(col("vec_id") % 100 === 0), emb.filter(col("vec_id") % 37 === 0),
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // candidate probe is a broadcast join on the list id — the corpus
    // (reconstructed from codes scan-side) is never shuffled to rank
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  // ---- product quantization ----------------------------------------------

  test("ann_pq_topk recall vs exact top-k with a data-derived codebook") {
    val exact = graft.queries.Registry.queries("ann_cosine_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = graft.queries.Registry.queries("ann_pq_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // 8 bytes/vector vs 256: recall is bounded by the 20-codeword/sub-space
    // codebook, not by bugs (measured 0.28 at sf0.01)
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.2, s"PQ recall@5: $recall")
  }

  test("pqEncode is pure scan-side: no exchange, no join, no window") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val model = Similarity.pqTrain(emb.filter(col("vec_id") % 25 === 0),
      "vec_id", "embedding", m = 8)
    val plan = Similarity.pqEncode(emb, "vec_id", "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(!plan.contains("Join"), plan.take(800))
    assert(!plan.contains("Window "), plan.take(800))
  }

  test("PQ codes are dense indices and reconstruction concatenates codewords") {
    // 4 dims × m=2: codebook from two training rows, hand-checkable
    val train = Seq(
      (0L, Seq(0.0f, 0.0f, 10.0f, 10.0f)),
      (1L, Seq(1.0f, 1.0f, -10.0f, -10.0f))).toDF("vec_id", "embedding")
    val model = Similarity.pqTrain(train, "vec_id", "embedding", m = 2)
    assert(model.subDim === 2 && model.ksub === 2)
    val data = Seq(
      (10L, Seq(0.9f, 0.9f, 8.0f, 9.0f)),    // near (1,1) then (10,10)
      (11L, Seq(0.1f, -0.2f, -7.0f, -12.0f))) // near (0,0) then (-10,-10)
      .toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(data, "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(10L) === Seq(1, 0))
    assert(codes(11L) === Seq(0, 1))
    val rec = Similarity.pqEncode(data, "vec_id", "embedding", model)
      .select(col("vec_id"), Similarity.pqReconstruct(col("codes"), model).as("r"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(rec(10L) === Seq(1.0, 1.0, 10.0, 10.0))
    assert(rec(11L) === Seq(0.0, 0.0, -10.0, -10.0))
  }

  test("PQ encoding is partitioning-invariant") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val model = Similarity.pqTrain(emb.filter(col("vec_id") % 25 === 0),
      "vec_id", "embedding", m = 8)
    val a = Similarity.pqEncode(emb, "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().toMap
    val b = Similarity.pqEncode(emb.repartition(7), "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().toMap
    assert(a === b)
    assert(a.values.forall(cs => cs.length == 8 &&
      cs.forall(c => c >= 0 && c < model.ksub)))
  }

  test("ann_ivfpq_topk: composed PQ + IVF serving still finds real neighbors") {
    val exact = graft.queries.Registry.queries("ann_cosine_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = graft.queries.Registry.queries("ann_ivfpq_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && ivfpq.nonEmpty)
    // both levers at once: the ceiling is the coarse probe (ann_ivf_topk
    // reaches 0.24 here) degraded by PQ ranking fidelity — measured 0.12,
    // far from the ~0 of 25 random corpus picks
    val recall = (exact & ivfpq).size.toDouble / exact.size
    assert(recall >= 0.10, s"IVFPQ recall@5: $recall")
  }

  test("Lloyd-refined PQ codebook: training MSE never above its sampled init; recall holds") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    // the sampled codebook (every 5th of the 500-row corpus) is EXACTLY
    // pqTrainRefined's stratified init at ksub=100, so Lloyd's monotone
    // MSE property makes this a hard guarantee, not a tuning accident
    val train = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") < 5000)
    val sampled = Similarity.pqTrain(train, "vec_id", "embedding", m = 8)
    val refined = Similarity.pqTrainRefined(emb, "vec_id", "embedding", m = 8,
      ksub = 100, iters = 5)
    def mse(model: Similarity.PqModel): Double = {
      val recon = Similarity.pqEncode(emb, "vec_id", "embedding", model)
        .select(col("vec_id"), Similarity.pqReconstruct(col("codes"), model).as("r"))
      emb.join(recon, "vec_id")
        .select(aggregate(zip_with(col("embedding"), col("r"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, x) => a + x).as("e"))
        .agg(avg(col("e"))).as[Double].collect()(0)
    }
    val (mSampled, mRefined) = (mse(sampled), mse(refined))
    assert(mRefined <= mSampled + 1e-12,
      s"refined codebook MSE $mRefined vs sampled $mSampled")
    val exact = graft.queries.Registry.queries("ann_cosine_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.pqTopKWithModel(spark, emb,
        emb.filter(col("vec_id") % 100 === 0), refined, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.2, s"refined-codebook recall@5: $recall")
  }

  test("ivfRangeSearch plans no window and no cartesian — pure probe volume") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val df = Similarity.ivfRangeSearch(spark, emb,
      emb.filter(col("vec_id") % 100 === 0),
      emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000),
      "vec_id", "embedding", "vec_id", "embedding", minSim = 0.2, nprobe = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window "), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    // radius semantics: every returned pair clears the threshold
    assert(df.agg(min(col("sim"))).as[Double].collect()(0) >= 0.2)
  }

  test("ann_filtered_topk: every neighbor shares its query's label, k respected") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val labels = emb.select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val got = graft.queries.Registry.queries("ann_filtered_topk")(spark, sf)
      .select("query_id", "label", "neighbor_id", "rank")
      .as[(Long, Int, Long, Int)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, l, n, r) =>
      assert(labels(q) === l && labels(n) === l,
        s"query $q (label ${labels(q)}) returned neighbor $n (label ${labels(n)})")
      assert(r >= 1 && r <= 3)
    }
  }

  test("dedup_semantic keeps exactly one canonical doc per semantic cluster") {
    val got = graft.queries.Registry.queries("dedup_semantic")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    got.groupBy(_._2).foreach { case (cluster, rows) =>
      assert(rows.map(_._3).sum === 1, s"cluster $cluster keep count != 1")
      assert(rows.exists(r => r._1 == cluster && r._3 == 1),
        s"cluster $cluster canonical is not the min id")
    }
    // the planted scaled copies must actually collapse: strictly fewer
    // survivors than documents
    assert(got.count(_._3 == 1) < got.length)
  }

  test("pqTrain rejects dims not divisible by m") {
    val train = Seq((0L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(train, "vec_id", "embedding", m = 2)
    }
  }

  // ---- sketch estimator accuracy (q10/q34 are rows-only at the driver:
  // ---- estimates are engine-specific, so quality is pinned HERE) --------

  test("q10 approx_count_distinct tracks exact distincts within the HLL++ error bound at sf0.1") {
    val sf01 = "/root/testdata/sf0.1"
    val li = graft.etl.Tables(spark, sf01, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = graft.queries.Registry.queries("q10_approx_distinct")(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    // default rsd = 0.05: hold each estimate to 3 sigma
    approx.foreach { case (flag, (ap, as_)) =>
      val (ep, es) = exact(flag)
      assert(math.abs(ap - ep).toDouble / ep <= 0.15, s"$flag parts: $ap vs $ep")
      assert(math.abs(as_ - es).toDouble / es <= 0.15, s"$flag supps: $as_ vs $es")
    }
  }

  test("q34 DataSketches HLL union estimate is within 2% of exact at sf0.1") {
    val sf01 = "/root/testdata/sf0.1"
    val ev = graft.etl.Tables(spark, sf01, "events")
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.queries.Registry.queries("q34_hll_mergeable_sketch")(spark, sf01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    // default lgK=12 → rsd ≈ 1.6%; the two-level union (daily sketches
    // merged per type) must not degrade the estimate materially
    approx.foreach { case (t, a) =>
      val e = exact(t)
      assert(math.abs(a - e).toDouble / e <= 0.02, s"$t: approx $a vs exact $e")
    }
  }
}
