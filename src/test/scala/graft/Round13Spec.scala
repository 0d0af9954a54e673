package graft

import org.apache.spark.sql.functions._

/** Round-13 pins: dedicated specs for the two round-12 post-record
  * queries (VERDICT r12 item 3) — a hand-solved 6-doc fixture through
  * all five curation-funnel stages, and a k-anonymity fixture where
  * each fix_hint branch fires.
  */
class Round13Spec extends SparkSpec {

  test("curationFunnel: hand-solved 6-doc fixture through all five stages") {
    import spark.implicits._
    // one victim per stage, chosen so each dies at EXACTLY one gate:
    //   doc 1: clean survivor (stops + long words -> quality 0.689)
    //   doc 2: byte-identical dup of doc 1 -> dies at exact_dedup (min id kept)
    //   doc 3: "xx "-prepended near-copy of doc 1 (shingle Jaccard 30/31)
    //          -> dies at near_dup_canonical (cluster min = 1)
    //   doc 4: 10 words -> dies at gopher_gate (min 30 words)
    //   doc 5: 3-char low-letter words ("w01".."w30") -> passes gopher
    //          (char ratio exactly 3x words, 2 distinct stops) but
    //          quality 0.35 < 0.5 -> dies at quality_gate
    //   doc 6: clean survivor with disjoint shingles (stops mid-text)
    val text1 = (Seq("the", "and", "for", "that") ++
      (1 to 28).map(i => f"alpha$i%02d")).mkString(" ")
    val text5 = (Seq("the", "and") ++ (1 to 30).map(i => f"w$i%02d")).mkString(" ")
    val text6 = ((1 to 15).map(i => f"bravo$i%02d") ++ Seq("is", "it") ++
      (16 to 30).map(i => f"bravo$i%02d")).mkString(" ")
    val docs = Seq(
      (1L, "en", text1),
      (2L, "en", text1),
      (3L, "en", "xx " + text1),
      (4L, "en", "the and one two three four five six seven eight"),
      (5L, "en", text5),
      (6L, "en", text6)).toDF("doc_id", "lang", "text")
    val pairs = graft.ext.Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    val out = graft.queries.Breadth20.curationFunnel(docs, pairs)
      .select(col("stage_no"), col("stage"), col("n_docs"),
        col("n_dropped"), col("drop_rate"))
      .as[(Long, String, Long, Option[Long], Option[Double])]
      .collect().toSeq
    assert(out === Seq(
      (1L, "raw", 6L, None, None),
      (2L, "gopher_gate", 5L, Some(1L), Some(0.166666667)),
      (3L, "exact_dedup", 4L, Some(1L), Some(0.2)),
      (4L, "near_dup_canonical", 3L, Some(1L), Some(0.25)),
      (5L, "quality_gate", 2L, Some(1L), Some(0.333333333))))
  }

  test("curationFunnel: survivor counts are monotone non-increasing on real data") {
    import spark.implicits._
    val out = SparkEntry.queries("pipeline_curation_funnel")(
        spark, "/root/testdata/sf0.001")
      .select(col("n_docs")).as[Long].collect().toSeq
    assert(out.length === 5)
    assert(out.head > 0L)
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b, s"funnel must be monotone, got $out")
    }
  }

  test("agreementNamePairs: tight-dist OR multi-pass evidence keeps a pair; loose single-pass evidence does not") {
    import spark.implicits._
    // keys: first-3 and last-3 chars — independent enough that a pair
    // can be proposed by one pass, the other, or both
    val recs = Seq(
      (1L, "ABCxxDEF"), (2L, "ABCyyDEF"), // both passes, dist 2 -> kept (agreement)
      (3L, "QQQxxGGG"), (4L, "QQQxyGGH"), // prefix pass only, dist 2 -> dropped
      (5L, "ZZZaaAAA"), (6L, "ZZZaaAAB")) // prefix pass only, dist 1 -> kept (tight)
      .toDF("id", "name")
    val out = graft.ext.EntityOps.agreementNamePairs(recs, "id", "name",
        Seq(expr("substring(name, 1, 3)"), expr("right(name, 3)")),
        maxDist = 2, tightDist = 1, minPasses = 2, maxBlock = 8)
      .select("id_a", "id_b", "dist", "n_passes")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 2L, 2L), (5L, 6L, 1L, 1L)))
  }

  test("eval_er_frontier: agreement tier prices the transposition recall cost; suffix precision is corpus-capped in both tiers") {
    import spark.implicits._
    val m = SparkEntry.queries("eval_er_frontier")(spark, "/root/testdata/sf0.001")
      .select(col("tier"), col("cls"), col("precision"), col("recall"))
      .as[(String, String, Option[Double], Option[Double])]
      .collect().map { case (t, c, p, r) => (t, c) -> ((p, r)) }.toMap
    // the recall-first tier finds every injected pair in every class
    assert(m(("two_pass_d2", "deletion")) === ((Some(1.0), Some(1.0))))
    assert(m(("two_pass_d2", "transposition"))._2 === Some(1.0))
    assert(m(("two_pass_d2", "suffix_typo"))._2 === Some(1.0))
    // the agreement tier's stated cost: dist-2 single-pass evidence
    // (here, the whole transposition class) is dropped...
    assert(m(("agree2_or_d1", "transposition"))._2 === Some(0.0))
    // ...while unambiguous classes are untouched
    assert(m(("agree2_or_d1", "deletion")) === ((Some(1.0), Some(1.0))))
    assert(m(("agree2_or_d1", "suffix_typo"))._2 === Some(1.0))
    // the single-field ceiling: suffix precision is stuck at ~1/decade
    // in BOTH tiers (the typo'd name is byte-identical to a wrong serial
    // neighbor, so every verifier and every pass votes for the imposter)
    for (t <- Seq("two_pass_d2", "agree2_or_d1")) {
      val p = m((t, "suffix_typo"))._1.get
      assert(p > 0.0 && p <= 0.15, s"suffix precision ceiling at $t: $p")
    }
  }

  test("eval_routed_economics: both tiers priced against the same truth; routed serve meets its recall floor at sf0.1-tuned settings") {
    import spark.implicits._
    val rows = SparkEntry.queries("eval_routed_economics")(
        spark, "/root/testdata/sf0.001")
      .select(col("config"), col("routing_cosines"), col("n_truth"),
        col("n_hit"), col("recall"))
      .as[(String, Double, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) === Seq("flat_nprobe15", "routed_nsuper3"))
    rows.foreach { case (c, cos, nt, nh, r) =>
      assert(cos > 0.0, s"$c cosines")
      assert(nt > 0 && nh >= 0 && nh <= nt, s"$c hits")
      assert(r >= 0.0 && r <= 1.0 && math.abs(r - nh.toDouble / nt) < 1e-6,
        s"$c recall consistency")
    }
  }

  test("prefix-filter incremental march == one-shot, both batch orders, equal jaccard values") {
    import graft.ext.Dedup
    // near-dup-bearing fixture: originals + "xx "-prepended copies
    val d0 = graft.etl.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val docs = d0.unionByName(
      d0.select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("xx "), col("text")).as("text")))
    val sh = Dedup.withShingles(docs, "text", k = 3)
      .withColumn("__tk", expr(
        "transform(__shingles, s -> cast(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT))"))
      .select(col("doc_id"), col("__tk"))
    val split = Dedup.hash32(col("doc_id").cast("string")) % 2
    val s1 = Dedup.valueRankedTokens(sh.filter(split === 0), "doc_id", "__tk")
      .localCheckpoint()
    val s2 = Dedup.valueRankedTokens(sh.filter(split =!= 0), "doc_id", "__tk")
      .localCheckpoint()
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = {
      import spark.implicits._
      df.select(col("doc_a").cast("long"), col("doc_b").cast("long"),
        col("jaccard")).as[(Long, Long, Double)].collect().toSet
    }
    // one-shot baseline through the RAREST-FIRST shipped path: the
    // verified pair set is total-order-independent, which is exactly
    // the property that lets the march use value order
    val oneShot = pairsOf(Dedup.prefixFilterPairs(sh, "doc_id", "__tk", 0.5))
    assert(oneShot.nonEmpty, "fixture must produce near-dup pairs")
    val march12 = pairsOf(
      Dedup.prefixPairsOfBatch(s1.limit(0), s1, "doc_id", 0.5).unionByName(
        Dedup.prefixPairsOfBatch(s1, s2, "doc_id", 0.5)))
    val march21 = pairsOf(
      Dedup.prefixPairsOfBatch(s2.limit(0), s2, "doc_id", 0.5).unionByName(
        Dedup.prefixPairsOfBatch(s2, s1, "doc_id", 0.5)))
    assert(march12 === oneShot)
    assert(march21 === oneShot)
    // the single-call whole-corpus march (shared postings, one verify)
    // equals both, in either batch order
    assert(pairsOf(Dedup.prefixPairsMarch(Seq(s1, s2), "doc_id", 0.5)) === oneShot)
    assert(pairsOf(Dedup.prefixPairsMarch(Seq(s2, s1), "doc_id", 0.5)) === oneShot)
  }

  test("lDiversityAudit: a k-large but single-band class reads as risk; a diverse class meets l") {
    import spark.implicits._
    // class (1, A): 6 members, ALL in band 2 -> k-anonymous at k=5 yet
    // zero-diversity (knowing nation+segment discloses the band);
    // class (2, B): 4 members across 3 bands -> meets l=3
    val q = (Seq.fill(6)((1L, "A", 2L)) ++
      Seq((2L, "B", 1L), (2L, "B", 2L), (2L, "B", 3L), (2L, "B", 3L)))
      .toDF("nation", "segment", "bal_band")
    val out = graft.queries.Breadth21.lDiversityAudit(q, l = 3L)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "A", 6L, 1L, 0L),
      (2L, "B", 4L, 3L, 1L)))
  }

  test("tClosenessAudit: ordinal EMD — global-matching class scores 0, one-band classes score 0.5") {
    import spark.implicits._
    // global distribution over bands {1, 2} is (0.5, 0.5); class X sits
    // entirely in band 1, Y entirely in band 2 (EMD = 0.5 each), Z
    // mirrors the global exactly (EMD = 0)
    val q = (Seq.fill(4)((1L, "X", 1L)) ++ Seq.fill(4)((2L, "Y", 2L)) ++
      Seq((3L, "Z", 1L), (3L, "Z", 1L), (3L, "Z", 2L), (3L, "Z", 2L)))
      .toDF("nation", "segment", "bal_band")
    val out = graft.queries.Breadth21.tClosenessAudit(q, t = 0.2)
      .as[(Long, String, Long, Double, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "X", 4L, 0.5, 0L),
      (2L, "Y", 4L, 0.5, 0L),
      (3L, "Z", 4L, 0.0, 1L)))
  }

  test("eval_lsh_curve: aligned power-of-2 bands nest, so proposals and recall are monotone in rows_per_band") {
    import spark.implicits._
    // a pair agreeing on an r-hash band agrees on both its aligned
    // r/2-hash sub-bands, so cand(8) ⊆ cand(4) ⊆ cand(2) ⊆ cand(1) —
    // n_proposed and recall must be non-increasing in r, and r=1
    // (any shared minhash collides) must have recall 1.0 on truth
    // pairs (J ≥ 0.5 forces at least one agreeing hash in expectation
    // is NOT a theorem — but the nesting and the r=1 ⊇ r=2 relation
    // are; recall 1.0 at r=1 is pinned as the fixture's measured
    // property, the curve's anchor row)
    val rows = SparkEntry.queries("eval_lsh_curve")(spark, "/root/testdata/sf0.001")
      .select(col("rows_per_band"), col("n_proposed"), col("n_hit"),
        col("n_truth"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) === Seq(1L, 2L, 4L, 8L))
    assert(rows.head._4 > 0L, "fixture must have truth pairs")
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 >= b._2, s"proposals must nest: $rows")
      assert(a._3 >= b._3, s"hits must nest: $rows")
    }
  }

  test("KMV intersection: complete sketches (groups smaller than k) estimate exactly") {
    import spark.implicits._
    import graft.ext.{Dedup, SketchOps}
    // |A|=10, |B|=10, |A∩B|=5 — with k=32 > |A∪B| the merged sketch
    // holds every value, so est_union = 15 exactly and est_inter = 5
    val rows = ((1 to 10).map(u => ("A", u.toLong)) ++
      (6 to 15).map(u => ("B", u.toLong))).toDF("grp", "user_id")
    val tu = rows.withColumn("__h", Dedup.hash32(col("user_id").cast("string")))
    val sk = SketchOps.kmvSketches(tu, "grp", "__h", k = 32)
    val out = SketchOps.kmvIntersectEstimates(sk, "grp", k = 32)
      .select(col("type_a"), col("type_b"), col("kk"), col("est_union"),
        col("est_inter"))
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(out === Seq(("A", "B", 15L, 15.0, 5.0)))
  }

  test("streamingKmv converges to the batch sketch (<= k longs state per group)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tu = graft.etl.Tables(spark, "/root/testdata/sf0.001", "events")
        .select(col("event_type").as("group"),
          graft.ext.Dedup.hash32(col("user_id").cast("string")).as("h"))
      val rows = tu.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val stream = MemoryStream[(String, Long)]
      val out = graft.streaming.StreamingOps.streamingKmv(
        stream.toDS().toDF("group", "h"), k = 8)
      val q = out.writeStream.format("memory").queryName("kmv_stream")
        .outputMode("append").start()
      try {
        rows.grouped(23).foreach { b => stream.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val emitted = spark.table("kmv_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val served = emitted.groupBy(_._1).values.flatMap { rs =>
        val mx = rs.map(_._4).max
        rs.filter(_._4 == mx).map(r => (r._1, r._2, r._3))
      }.toSet
      val batch = graft.ext.SketchOps.kmvSketches(tu, "group", "h", k = 8)
        .select(col("group"), col("__h"), col("__rk").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch.nonEmpty)
      assert(served === batch, "streamed KMV diverges from the batch sketch")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("kAnonymityAudit: each fix_hint branch fires on its own class") {
    import spark.implicits._
    // four size-1 risk classes, one per branch, plus size-5 filler
    // classes that (a) are themselves >= k so they never appear and
    // (b) push exactly ONE single-attribute rollup over k:
    //   (1,A,1): rollup over (nation,segment)=(1,A) has 6 rows -> drop_bal_band
    //   (2,B,3): (2,B) has 1; (nation,band)=(2,3) has 6 -> drop_segment
    //   (3,D,4): (3,D)=1, (3,4)=1; (segment,band)=(D,4) has 6 -> drop_nation
    //   (5,E,5): every rollup 1 -> suppress
    val rows =
      Seq((1L, "A", 1L), (2L, "B", 3L), (3L, "D", 4L), (5L, "E", 5L)) ++
        Seq.fill(5)((1L, "A", 2L)) ++ // lifts (1,A,*) rollup to 6
        Seq.fill(5)((2L, "C", 3L)) ++ // lifts (2,*,3) rollup to 6
        Seq.fill(5)((4L, "D", 4L))    // lifts (*,D,4) rollup to 6
    val q = rows.toDF("nation", "segment", "bal_band")
    val out = graft.queries.Breadth20.kAnonymityAudit(q, k = 5L)
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, "A", 1L, 1L, "drop_bal_band"),
      (2L, "B", 3L, 1L, "drop_segment"),
      (3L, "D", 4L, 1L, "drop_nation"),
      (5L, "E", 5L, 1L, "suppress")))
  }
}
