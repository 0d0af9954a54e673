package graft

import graft.etl.SampleOps
import graft.ext.{EvalOps, Similarity}
import org.apache.spark.sql.functions._

/** Round-9 second wave: retrieval-evaluation metrics (recall/MRR/nDCG),
  * binary sign-quantized Hamming ANN, and A-ES weighted sampling —
  * semantic pins the oracle hash check can't express (known-answer
  * metric values, recall vs the exact ranker, partitioning
  * invariance).
  */
class Round9bSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- retrieval metrics -------------------------------------------------

  test("retrievalMetrics: perfect ranking scores recall=mrr=ndcg=1") {
    val run = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L))
      .toDF("query_id", "rank", "doc_id")
    val qrels = Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("query_id", "doc_id")
    val Array(r) = EvalOps.retrievalMetrics(run, qrels, "doc_id", k = 10).collect()
    assert(r.getAs[Long]("n_rel") === 3L && r.getAs[Long]("n_hit") === 3L)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Double]("mrr") === 1.0)
    assert(r.getAs[Double]("ndcg") === 1.0)
  }

  test("retrievalMetrics: known-answer partial ranking") {
    // relevant docs {10, 11, 12, 13}; run hits 11 at rank 2 and 13 at rank 4
    val run = Seq((7L, 1L, 99L), (7L, 2L, 11L), (7L, 3L, 98L), (7L, 4L, 13L))
      .toDF("query_id", "rank", "doc_id")
    val qrels = Seq((7L, 10L), (7L, 11L), (7L, 12L), (7L, 13L))
      .toDF("query_id", "doc_id")
    val Array(r) = EvalOps.retrievalMetrics(run, qrels, "doc_id", k = 10).collect()
    assert(r.getAs[Double]("recall") === 0.5)
    assert(r.getAs[Double]("mrr") === 0.5)
    val ln2 = math.log(2.0)
    def term(rank: Int) =
      BigDecimal(ln2 / math.log(rank + 1.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val dcg = term(2) + term(4)
    val idcg = (1 to 4).map(term).sum
    val expected = BigDecimal(dcg.toDouble / idcg.toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ndcg") === expected)
  }

  test("retrievalMetrics: query with zero relevant docs reports zeros, not a dropped row") {
    val run = Seq((1L, 1L, 10L), (2L, 1L, 10L)).toDF("query_id", "rank", "doc_id")
    val qrels = Seq((1L, 10L)).toDF("query_id", "doc_id")
    val rows = EvalOps.retrievalMetrics(run, qrels, "doc_id", k = 10)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(rows.keySet === Set(1L, 2L))
    val q2 = rows(2L)
    assert(q2.getAs[Long]("n_rel") === 0L && q2.getAs[Double]("recall") === 0.0 &&
      q2.getAs[Double]("mrr") === 0.0 && q2.getAs[Double]("ndcg") === 0.0)
  }

  test("andQrels: relevant iff the doc contains EVERY query term") {
    val docs = Seq(
      (1L, "alpha beta gamma"), // both terms → relevant
      (2L, "alpha alpha delta"), // missing beta
      (3L, "beta  alpha"), // both (whitespace-normalized) → relevant
      (4L, "gamma delta")).toDF("doc_id", "text")
    val qt = Seq((1L, "alpha"), (1L, "beta")).toDF("query_id", "term")
    val got = EvalOps.andQrels(docs, qt, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got === Set(1L, 3L))
  }

  // ---- binary Hamming ANN ------------------------------------------------

  test("signWord packs all 64 sign bits (bit 63 = Long.MIN lands correctly)") {
    val df = Seq(
      (1L, Array.fill(64)(0.5f)), // all positive → all bits set → -1L
      (2L, Array.fill(64)(-0.5f)), // none set → 0L
      (3L, Array.tabulate(64)(i => if (i == 63) 0.5f else -0.5f)) // only bit 63
    ).toDF("id", "v")
    val got = df.withColumn("w", Similarity.signWord("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("w")).toMap
    assert(got(1L) === -1L && got(2L) === 0L && got(3L) === Long.MinValue)
  }

  test("SignWord64 kernel equals the HOF additive fold on real embeddings") {
    // the declarative reference formula the kernel replaces: disjoint
    // powers of two sum without carries, so the fold IS the bitwise OR
    val hof = expr(
      """aggregate(sequence(0, size(embedding) - 1), CAST(0 AS BIGINT),
          (acc, i) -> acc + CASE WHEN CAST(element_at(embedding, i + 1) AS DOUBLE) > 0.0D
            THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)""")
    val mismatches = graft.etl.Tables(spark, sf, "embeddings")
      .withColumn("__k", Similarity.signWord("embedding"))
      .withColumn("__h", hof)
      .filter(col("__k") =!= col("__h"))
      .count()
    assert(mismatches === 0L)
  }

  test("binaryHammingTopK: rerank recall@5 vs exact cosine on real embeddings") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(spark, emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def recallAt(kCand: Int): Double = {
      val binary = Similarity.binaryHammingTopK(spark, emb, queries,
          "vec_id", "embedding", kCand = kCand, k = 5)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      binary.intersect(exact).size.toDouble / exact.size
    }
    assert(exact.nonEmpty)
    // 64-bit sign sketch + top-20 rerank pool: comfortably above chance;
    // pin the floor so a packing/popcount regression fails loudly
    val r20 = recallAt(20)
    assert(r20 >= 0.45, s"binary rescoring recall@5 $r20 < 0.45")
    // an exact-top-5 member inside the pool always survives the cosine
    // rerank (only 4 corpus rows can outscore it), so recall is
    // monotone in the pool size — the serving knob a deployment turns
    val r50 = recallAt(50)
    assert(r50 >= r20, s"widening the Hamming pool dropped recall: $r50 < $r20")
  }

  test("binaryHammingTopK: hamming column is consistent with explicit sign disagreement") {
    val emb = graft.etl.Tables(spark, sf, "embeddings").limit(50).cache()
    val got = Similarity.binaryHammingTopK(spark, emb, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", kCand = 10, k = 3).collect()
    val vecs = emb.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    got.foreach { r =>
      val q = vecs(r.getAs[Long]("query_id")); val c = vecs(r.getAs[Long]("neighbor_id"))
      val expect = q.indices.count(i => (q(i) > 0) != (c(i) > 0))
      assert(r.getAs[Long]("hamming") === expect.toLong)
    }
  }

  // ---- containment dedup -------------------------------------------------

  test("containmentPairs: a true subset scores 1.0 in exactly one direction") {
    // A's two word-trigrams both appear in B; B has four, so
    // containment(A⊆B) = 1.0 and containment(B⊆A) = 0.5 — only the
    // directed (A, B) row clears a 0.6 threshold
    val docs = Seq(
      (1L, "p q r s"),
      (2L, "p q r s t u"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val got = graft.ext.Dedup.containmentPairs(docs, "doc_id", "text",
        threshold = 0.6, maxDf = 20)
      .collect().map(r => (r.getAs[Long]("contained"), r.getAs[Long]("container"),
        r.getAs[Double]("containment")))
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
  }

  // ---- shard manifest ----------------------------------------------------

  test("shard manifest conserves corpus totals across the 16 shards") {
    val rows = graft.queries.Breadth9.q59ShardManifest.fn(spark, sf).collect()
    val docs = graft.etl.Tables(spark, sf, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val totalBytes = docs.agg(sum(col("n_chars"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_bytes")).sum === totalBytes)
    assert(rows.map(_.getAs[Long]("shard")).toSet.subsetOf((0L to 15L).toSet))
  }

  // ---- IVF rebalance -----------------------------------------------------

  test("ivfRebalanceSplit: sub-assignments exactly partition each hot list") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val rows = graft.ext.Similarity.ivfRebalanceSplit(spark, emb,
      emb.filter(col("vec_id") % 7 === 0), "vec_id", "embedding", nSplit = 2).collect()
    val byCid = rows.groupBy(_.getAs[Long]("cid"))
    assert(byCid.size === 2, s"expected 2 split lists, got ${byCid.size}")
    byCid.foreach { case (cid, rs) =>
      val nBefore = rs.head.getAs[Long]("n_before")
      assert(rs.map(_.getAs[Long]("n_members")).sum === nBefore,
        s"list $cid: sub counts must sum to n_before")
      assert(rs.map(_.getAs[Long]("sub")).toSet.subsetOf(Set(0L, 1L)))
    }
  }

  // ---- dedup propose evaluation ------------------------------------------

  test("eval_dedup_quality: hit counts bounded and metrics in range") {
    val Array(r) = graft.queries.Breadth9.evalDedupQuality.fn(spark, sf).collect()
    val (t, p, h) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_proposed"),
      r.getAs[Long]("n_hit"))
    assert(h <= t && h <= p, "hits cannot exceed either side")
    assert(t > 0, "fixture must contain true near-dup pairs")
    Seq("precision", "recall").foreach { m =>
      val v = r.getAs[Double](m); assert(v >= 0.0 && v <= 1.0, s"$m=$v")
    }
  }

  // ---- streaming CDC apply -----------------------------------------------

  test("cdcSink: streamed changelog application equals the batch latest-wins fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "status")
    val root = java.nio.file.Files.createTempDirectory("cdc_").toString
    val stream = MemoryStream[(Long, Long, String, String)]
    val q = graft.streaming.StreamingOps.cdcSink(
      stream.toDF().toDF("id", "seq", "op", "status"),
      base, "id", Seq("status"), s"$root/out", s"$root/ck")
    // batch 0: within-batch latest-wins (key 1: U then D at higher seq
    // -> net delete); key 2 plain update
    stream.addData((1L, 1L, "U", "p"), (1L, 2L, "D", null),
      (2L, 1L, "U", "x"))
    q.processAllAvailable()
    // batch 1: cross-batch replacement — key 1 resurrects (U after the
    // batch-0 D), key 2 dies (D after the batch-0 U), key 4 updates
    stream.addData((1L, 3L, "U", "z"), (2L, 2L, "D", null), (4L, 1L, "U", "w"))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$root/out/v1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "z", 3L -> "c", 4L -> "w"))
    // retention maintenance over the CDC sink's version history
    val rep = graft.etl.LayoutOps.vacuumVersions(spark, s"$root/out", keep = 1)
      .collect().map(r => r.getAs[Long]("version") -> r.getAs[String]("action")).toMap
    assert(rep === Map(0L -> "expired", 1L -> "kept"))
    assert(!new java.io.File(s"$root/out/v0").exists())
    val after = spark.read.parquet(s"$root/out/v1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === got)
  }

  test("attributionStateful: streamed last-touch equals the batch window on real events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.StreamingOps.AttribIn
    implicit val ctx = spark.sqlContext
    val ev = graft.etl.Tables(spark, sf, "events")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"), col("value"))
    // batch reference: the q61 strictly-preceding window, per purchase
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = ev
      .withColumn("touch", coalesce(
        last(when(col("event_type").isin("click", "view"), col("event_type")),
          ignoreNulls = true).over(w), lit("direct")))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("touch"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("touch")).toMap
    // stream the same events in two ts-ordered chunks (state must carry
    // a batch-1 touch into a batch-2 purchase)
    val rows = ev.as[AttribIn].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (chunk1, chunk2) = rows.splitAt(rows.length / 2)
    val stream = MemoryStream[AttribIn]
    val q = graft.streaming.StreamingOps.attributionStateful(stream.toDS())
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    stream.addData(chunk1.toIndexedSeq); q.processAllAvailable()
    stream.addData(chunk2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val got = spark.table("attrib")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("touch")).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  // ---- A-ES weighted sampling --------------------------------------------

  test("weightedSampleTopN is invariant under input partitioning") {
    val o = graft.etl.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val a = SampleOps.weightedSampleTopN(o, "o_orderkey", "o_totalprice", 25)
      .collect().map(_.getAs[Long]("o_orderkey")).toSet
    val b = SampleOps.weightedSampleTopN(o.repartition(13), "o_orderkey", "o_totalprice", 25)
      .collect().map(_.getAs[Long]("o_orderkey")).toSet
    assert(a === b && a.size === 25)
  }

  test("weightedSampleTopN is weight-proportional: sample mean weight above population mean") {
    val o = graft.etl.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val popMean = o.agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
    val sample = SampleOps.weightedSampleTopN(o, "o_orderkey", "o_totalprice", 50)
    val sampMean = sample.agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(sampMean > popMean,
      s"PPS sample mean $sampMean should exceed population mean $popMean")
  }

  test("quality-model confusion matrix partitions the corpus and bounds the metrics") {
    val Array(r) = graft.queries.Breadth9.evalQualityConfusion.fn(spark, sf).collect()
    val n = graft.etl.Tables(spark, sf, "documents").count()
    val total = r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn")
    assert(total === n, "confusion cells must partition the corpus exactly")
    Seq("precision", "recall", "f1", "accuracy").foreach { m =>
      val v = r.getAs[Double](m)
      assert(v >= 0.0 && v <= 1.0, s"$m=$v out of [0,1]")
    }
  }

  test("calibration bins cover the corpus; mean_prob lies inside each bin") {
    val rows = graft.queries.Breadth9.evalModelCalibration.fn(spark, sf).collect()
    val n = graft.etl.Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum === n)
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin"); val mp = r.getAs[Double]("mean_prob")
      assert(bin >= 0 && bin <= 9)
      // bin 9 also absorbs prob == 1.0
      assert(mp >= bin / 10.0 - 1e-9 && mp <= (bin + 1) / 10.0 + (if (bin == 9) 1e-9 else 1e-9),
        s"mean_prob $mp outside bin $bin")
      val rate = r.getAs[Double]("keep_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("xml roundtrip preserves rows and exact doubles") {
    import org.apache.spark.sql.types._
    val orders = graft.etl.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    val out = java.nio.file.Files.createTempDirectory("xml_").toString + "/orders"
    orders.write.option("rowTag", "order").format("xml").save(out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderpriority", StringType)))
    val back = spark.read.schema(schema).option("rowTag", "order").format("xml").load(out)
    assert(back.count() === orders.count())
    // shortest-repr double serialization must roundtrip bit-for-bit
    val diff = back.union(orders).except(back.intersect(orders))
    assert(diff.isEmpty, "XML roundtrip changed at least one row")
  }

  test("weightedSampleTopN plans a TakeOrdered, not a global sort") {
    val o = graft.etl.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val plan = SampleOps.weightedSampleTopN(o, "o_orderkey", "o_totalprice", 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-n plan, got:\n$plan")
  }
}
