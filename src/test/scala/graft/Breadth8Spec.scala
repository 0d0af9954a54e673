package graft

import graft.ext.{SketchOps, TextOps}
import org.apache.spark.sql.functions._

/** Round-9 breadth pins: BPE merge learning (hand-computed toy corpus),
  * count-min sketch bounds + mergeability, scene-change segmentation
  * invariants, and the linear quality classifier's threshold contract.
  */
class Breadth8Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- BPE ---------------------------------------------------------------

  test("bpeMerges learns the hand-computed merges on a toy corpus") {
    // words: low x3, lower, lowest, new, newer
    // r1: (l,o)=5 ties (o,w)=5, lexicographic -> (l,o)
    // r2: (lo,w)=5
    // r3: ties at 2: (e,r),(e,w),(low,e),(n,e) -> (e,r)
    val docs = Seq("low low low lower lowest", "new newer").toDF("text")
    val m = TextOps.bpeMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "e", "r", 2L)))
  }

  test("bpeMerges rewrite merges touching occurrences (fixpoint replace)") {
    // "ababab" spelled |a|b|a|b|a|b| : single-pass replace would merge
    // only alternate occurrences; the 5-pass fixpoint must take all 3,
    // making (ab,ab) the round-2 winner.
    val docs = Seq("ababab ababab cd").toDF("text")
    val m = TextOps.bpeMerges(docs, "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) === ((1L, "a", "b", 6L)))
    assert(m(1) === ((2L, "ab", "ab", 4L))) // 2 adjacent (ab,ab) pairs per word occurrence
  }

  // ---- count-min sketch --------------------------------------------------

  test("CMS estimate upper-bounds the exact count for every candidate") {
    val wc = graft.etl.Tables(spark, sf, "documents")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val cells = SketchOps.cmsCells(wc, "word", "cnt", depth = 3, width = 64)
    val est = SketchOps.cmsEstimate(cells, wc, "word", depth = 3, width = 64)
      .join(wc, "word")
    assert(est.filter(col("cms_est") < col("cnt")).count() === 0L)
  }

  test("CMS cells are mergeable: cells(A)+cells(B) == cells(A union B)") {
    val docs = graft.etl.Tables(spark, sf, "documents")
    def wc(d: org.apache.spark.sql.DataFrame) = d
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val merged = SketchOps.cmsCells(wc(a), "word", "cnt", 3, 64)
      .unionByName(SketchOps.cmsCells(wc(b), "word", "cnt", 3, 64))
      .groupBy(col("row"), col("bucket")).agg(sum(col("cell")).as("cell"))
    val full = SketchOps.cmsCells(wc(docs), "word", "cnt", 3, 64)
    assert(merged.join(full, Seq("row", "bucket"), "full_outer")
      .filter(not(merged("cell") <=> full("cell"))).count() === 0L)
  }

  test("streaming CMS cells equal the batch grid over the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[String]
    val cells = graft.ext.SketchOps.streamingCmsCells(
      stream.toDS().toDF("word"), "word", depth = 3, width = 64)
    val q = cells.writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    val keys = Seq("alpha", "beta", "alpha", "gamma", "alpha", "beta")
    stream.addData(keys.take(3): _*)
    q.processAllAvailable()
    stream.addData(keys.drop(3): _*) // second batch updates the same grid
    q.processAllAvailable()
    val streamed = spark.table("cms_cells")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    q.stop()
    val batch = graft.ext.SketchOps.cmsCells(
      keys.toDF("word").groupBy("word").agg(count(lit(1)).as("cnt")),
      "word", "cnt", 3, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
  }

  test("CMS estimate is exact when no key collides in all rows") {
    val wc = Seq(("alpha", 10L), ("beta", 3L)).toDF("word", "cnt")
    val cells = SketchOps.cmsCells(wc, "word", "cnt", 3, 64)
    val est = SketchOps.cmsEstimate(cells, wc, "word", 3, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("alpha" -> 10L, "beta" -> 3L))
  }

  test("CMS estimates 0 for a key the sketch never saw (unless it collides everywhere)") {
    val wc = Seq(("alpha", 10L)).toDF("word", "cnt")
    val cells = SketchOps.cmsCells(wc, "word", "cnt", 3, 64)
    val unseen = Seq("never-inserted-key").toDF("word")
    val est = SketchOps.cmsEstimate(cells, unseen, "word", 3, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a single inserted key cannot fill all 3 of the probe's cells
    // (different salts -> different buckets with overwhelming odds; the
    // fixture keys verified disjoint), so the min must see an empty cell
    assert(est === Map("never-inserted-key" -> 0L))
  }

  // ---- incremental k-means -----------------------------------------------

  test("merged k-means sufficient statistics equal the full-corpus recompute") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val cents = emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000)
    val full = graft.ext.Similarity.kmeansAssign(spark, emb, cents,
        "vec_id", "embedding", "vec_id", "embedding")
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("x").cast("double"), 9)
          .cast(org.apache.spark.sql.types.DecimalType(27, 9))).cast("double")
          / count(lit(1))).as("mean"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val merged = graft.queries.Breadth8.annKmeansMerge.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(merged === full) // decimal sums are associative — exact equality
  }

  // ---- scene changes -----------------------------------------------------

  test("sceneChanges: scene_no starts at 0, is nondecreasing, steps by at most 1") {
    val sc = graft.ext.Multimodal
      .sceneChanges(graft.etl.Tables(spark, sf, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"), col("frame_no")).collect()
    val byDoc = sc.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rows) =>
      val scenes = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(scenes.head === 0L)
      scenes.sliding(2).foreach { case Array(p, n) =>
        assert(n === p || n === p + 1)
      case _ => ()
      }
    }
  }

  // ---- MMR ---------------------------------------------------------------

  test("mmrSelect: k distinct picks per query, steps 1..k, scores non-increasing from step 2") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val sel = graft.ext.Similarity.mmrSelect(spark, emb,
        emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
        k = 5, nCand = 25, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    sel.groupBy(_._1).foreach { case (_, rows) =>
      val byStep = rows.sortBy(_._2)
      assert(byStep.map(_._2).toSeq === (1L to 5L))
      assert(byStep.map(_._3).distinct.length === 5) // diversified = no repeats
      // the greedy max over a shrinking set with a growing penalty is
      // non-increasing once the penalty term exists (step >= 2)
      byStep.drop(1).map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(b <= a + 1e-12)
        case _           => ()
      }
    }
  }

  // ---- rank fusion -------------------------------------------------------

  test("rankFusionTopK: retrievers genuinely disagree; fused picks come from the pools") {
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 100 === 0)
    val fused = graft.ext.Similarity.rankFusionTopK(spark, emb, q,
      "vec_id", "embedding", k = 5, kPool = 20)
    val cosTop = graft.ext.Similarity.bruteForceTopK(spark, emb, q,
        "vec_id", "embedding", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = fused.collect()
    // max possible score is both rank-1 slots: 2/61
    rows.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 2.0 / 61 + 1e-12))
    // on this corpus the L2 ranking must actually differ from cosine
    // somewhere (vector norms vary) — otherwise the op tests nothing
    val fusedSet = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(fusedSet.exists(p => !cosTop.contains(p)) ||
      rows.exists(r => r.getDouble(3) < 2.0 / 61 - 1e-12))
  }

  // ---- linear quality classifier -----------------------------------------

  test("withModelQuality: keep == (prob >= 0.5) and prob strictly inside (0,1)") {
    val q = TextOps.withModelQuality(graft.etl.Tables(spark, sf, "documents"), "text")
    assert(q.filter((col("prob") >= 0.5) =!= (col("keep") === 1L)).count() === 0L)
    assert(q.filter(col("prob") <= 0.0 || col("prob") >= 1.0).count() === 0L)
  }

  // ---- TF-IDF similarity join --------------------------------------------

  test("tfidfSimilarPairs finds every perturbed copy pair at high similarity") {
    val pairs = graft.queries.Breadth8.dedupTfidfPairs.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every original with >= 3+2 words pairs with its "xx "-prefixed copy
    val eligible = graft.etl.Tables(spark, sf, "documents")
      .filter(size(split(graft.ext.Dedup.normText(col("text")), " ")) >= 3)
      .select(col("doc_id")).collect().map(_.getLong(0))
    eligible.foreach { id =>
      val sim = pairs.get((id, id + 100000L))
      assert(sim.exists(_ >= 0.5), s"doc $id: copy pair missing or weak ($sim)")
    }
  }

  // ---- approx percentiles ------------------------------------------------

  test("percentile_approx lands inside the exact [q-0.02, q+0.02] order-statistic bracket") {
    // GK returns an ACTUAL data value with bounded RANK error (not the
    // interpolated quantile_cont value StatOps reports), so the right
    // pin is a rank bracket: the sketch's answer must sit between the
    // exact 48th/52nd (88th/92nd) percentiles. On small groups the
    // value-relative gap between adjacent order statistics can be
    // percents — a value-relative pin would flake.
    val o = graft.etl.Tables(spark, sf, "orders")
    val approx = graft.queries.Breadth8.q57ApproxPercentile.fn(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val exact = graft.etl.StatOps.percentiles(o, Seq("o_orderpriority"),
        "o_totalprice",
        Seq("lo50" -> 0.48, "hi50" -> 0.52, "lo90" -> 0.88, "hi90" -> 0.92))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (lo50, hi50, lo90, hi90)) =>
      val (a50, a90) = approx(k)
      assert(a50 >= lo50 && a50 <= hi50, s"$k p50: $a50 outside [$lo50, $hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"$k p90: $a90 outside [$lo90, $hi90]")
    }
  }

  // ---- split leakage -----------------------------------------------------

  test("cluster-aware splits leak NOTHING: every fingerprint lands in one split") {
    val splits = graft.queries.Breadth8.textSplitByCluster.fn(spark, sf)
    assert(splits.groupBy(col("fingerprint"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count() === 0L)
    // and the id-hash splitter DOES leak on the same corpus — the two
    // queries demonstrate the bug and the fix as a pair
    assert(graft.queries.Breadth8.textSplitLeakage.fn(spark, sf).count() > 0L)
  }

  test("split leakage rows always span >= 2 splits and list them sorted") {
    val leak = graft.queries.Breadth8.textSplitLeakage.fn(spark, sf)
    val rows = leak.collect()
    assert(rows.nonEmpty) // augmented corpus has cross-split exact dups
    rows.foreach { r =>
      val nSplits = r.getLong(1)
      val splits = r.getString(4).split(",")
      assert(nSplits >= 2L && splits.length.toLong === nSplits)
      assert(splits.sorted.sameElements(splits))
    }
  }
}
