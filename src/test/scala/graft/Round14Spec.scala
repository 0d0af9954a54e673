package graft

import org.apache.spark.sql.functions._

/** Round-14 pins: the signed-zero normalization in the OLS slope
  * helper (the round-13 driver hash-red), heapsGrowth's dense-id
  * guard, and the boilerplate-scrub all-scrubbed-doc edge.
  */
class Round14Spec extends SparkSpec {

  test("heapsGrowth: degenerate constant-vocab fit emits literal +0.0") {
    import spark.implicits._
    // 10 docs over a vocabulary that saturates in the first bucket:
    // vocab is constant across buckets, the OLS numerator is an exact
    // 0 crossed with double-cast ulps. The slope must be bit-exact
    // +0.0 (sign bit clear) — Spark's BigDecimal round already has no
    // signed zero, and olsSlope normalizes on top; the driver hashes
    // doubles byte-aware, so -0.0 here was round 13's one red row.
    val docs = (0L to 9L).map(i => (i, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps.heapsGrowth(docs, "doc_id", "text",
        buckets = 10)
      .orderBy(col("bucket"))
      .select(col("bucket"), col("n_docs"), col("vocab"),
        col("heaps_beta"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.size === 10)
    assert(out.map(_._3).distinct === Seq(3L), "vocab must saturate")
    out.foreach { case (b, _, _, beta) =>
      assert(beta === 0.0, s"bucket $b slope must be 0")
      assert(java.lang.Double.doubleToRawLongBits(beta) === 0L,
        s"bucket $b slope must be +0.0, not -0.0 (raw bits " +
          java.lang.Long.toHexString(
            java.lang.Double.doubleToRawLongBits(beta)) + ")")
    }
  }

  test("heapsGrowth: gapped ids fail loudly (dense 0-based contract)") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (5L, "c d"), (9L, "e f"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.ext.TextOps.heapsGrowth(docs, "doc_id", "text", buckets = 3)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("dense 0-based")),
      s"expected the dense-id guard, got: ${msgs(e).mkString(" | ")}")
  }

  test("graft_shingle_md5_120: both halves equal the oracle hex idioms") {
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val out = Seq(Tuple1(text)).toDF("text")
      .select(posexplode(expr("graft_shingle_md5_120(split(text, ' '), 8)")))
      .select(col("pos"), col("col.h1"), col("col.h2"))
      .as[(Int, Long, Long)].collect().toSeq
    val w = text.split(" ")
    assert(out.size === w.length - 7)
    out.foreach { case (p, h1, h2) =>
      val hex = md5hex(w.slice(p, p + 8).mkString(" "))
      // h1 = ('0x'||substr(md5,1,15))::BIGINT, h2 = substr(md5,17,15)
      assert(h1 === java.lang.Long.parseLong(hex.substring(0, 15), 16))
      assert(h2 === java.lang.Long.parseLong(hex.substring(16, 31), 16))
    }
  }

  test("boilerplateScrubBySource: all-boilerplate doc keeps 0 lines, md5('')") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // source s1, 4 docs: "nav footer" on all 4 (df 100% >= 25%), doc 4
    // is ONLY the footer — every line scrubbed, the n_kept = 0 edge
    // that made the oracle's FILTERed list md5 NULL while Spark's
    // collect_list path gave md5('') (ADVICE r13).
    val docs = Seq(
      (1L, "s1", "nav footer\nreal one"),
      (2L, "s1", "nav footer\nreal two"),
      (3L, "s1", "real three\nnav footer"),
      (4L, "s1", "nav footer")).toDF("doc_id", "source", "text")
    val out = graft.ext.TextOps.boilerplateScrubBySource(
        docs, "doc_id", "source", "text", fracPct = 25)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        col("cleaned_md5"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 1L, md5hex("real one")),
      (2L, 2L, 1L, md5hex("real two")),
      (3L, 2L, 1L, md5hex("real three")),
      (4L, 1L, 0L, md5hex(""))))
  }

  test("ppsSystematicHits: estimator divides by realized draws (HT exact on size)") {
    // total = 350, n = 100 → stride 3, realized draws 350/3 = 116 > n:
    // the regime where dividing by nominal n biases the HT size total
    // by 16%. eval_ht_estimate divides by Σhits, so the size measure
    // recovers the population total EXACTLY here too.
    import spark.implicits._
    val docs = (0L until 35L).map(i => (i, 10L)).toDF("doc_id", "wt")
    val rows = graft.etl.SampleOps.ppsSystematicHits(docs, "doc_id", "wt",
        n = 100)
      .select(col("hits"), col("w_total"))
      .as[(Long, Long)].collect().toSeq
    val s = rows.map(_._1).sum
    assert(s > 100L, s"fixture must realize > n draws, got $s")
    val est = rows.map { case (h, wt) => h.toDouble * wt / s }.sum
    assert(math.abs(est - 350.0) < 1e-6,
      s"realized-draw HT must recover the exact size total, got $est")
  }

  test("theilSenTrend: one outlier day, slope/intercept unmoved, residual flags it") {
    import spark.implicits._
    import java.sql.Date
    // y = 2·t + 5 on 10 consecutive days, except day t=5 spikes to 1000:
    // 36 clean pair slopes are exactly 2.0, the 9 outlier pairs split 5
    // large-positive / 4 large-negative, so the median of all 45 is
    // still exactly 2.0 — and the median residual level is the clean
    // days', so the outlier surfaces as ITS residual (1000 − 15 = 985),
    // not as a dragged trend (a 7-day MA would move by 985/7 ≈ 141 on
    // every window containing it).
    val base = Date.valueOf("2024-01-01").toLocalDate
    val daily = (0 to 9).map { t =>
      val y = if (t == 5) 1000.0 else 2.0 * t + 5.0
      (Date.valueOf(base.plusDays(t)), y)
    }.toDF("d", "total")
    val out = graft.etl.StatOps.theilSenTrend(daily, "d", "total")
      .orderBy(col("d"))
      .select(col("d"), col("total"), col("n_pairs"), col("ts_slope"),
        col("residual"))
      .as[(Date, Double, Long, Double, Double)].collect().toSeq
    assert(out.size === 10)
    assert(out.head._3 === 45L)
    out.foreach { case (_, _, _, slope, _) => assert(slope === 2.0) }
    out.zipWithIndex.foreach { case ((_, _, _, _, resid), t) =>
      if (t == 5) assert(resid === 985.0, s"outlier residual, got $resid")
      else assert(resid === 0.0, s"clean day $t residual, got $resid")
    }
  }

  test("curriculumOrder: md5-pinned shards, easiest-first positions") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shardOf(id: Long, shards: Int): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % shards
    val docs = Seq((0L, 0.9), (1L, 0.5), (2L, 0.7), (3L, 0.9),
      (4L, 0.1), (5L, 0.3), (6L, 0.8), (7L, 0.6))
      .toDF("doc_id", "quality")
    val out = graft.etl.SampleOps.curriculumOrder(docs, "doc_id", "quality",
        shards = 2)
      .select(col("doc_id"), col("shard"), col("position"), col("score"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    // shard assignment is the md5 idiom, independently recomputed
    out.foreach { case (id, sh, _, _) => assert(sh === shardOf(id, 2)) }
    // within each shard: positions are 1..n and score ramps easiest
    // (highest) first, ties broken by md5(id) — fully deterministic
    out.groupBy(_._2).foreach { case (_, members) =>
      val sorted = members.sortBy(_._3)
      assert(sorted.map(_._3) === (1L to members.size).toSeq)
      val expected = members.sortBy(m => (-m._4, md5hex(m._1.toString)))
      assert(sorted.map(_._1) === expected.map(_._1),
        "per-shard order must be (score DESC, md5(id))")
    }
  }

  test("manifest file skipping: strict subset of files, answers unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("manifest_spec_").toString
    // 4 range-clustered files over k = 0..399: per-file [min,max] are
    // narrow and disjoint, so a k in [50, 99] predicate must plan to
    // ~1 file of 4
    (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(4, col("k"))
      .write.parquet(s"$dir/t")
    val mani = graft.etl.LayoutOps.buildFileManifest(spark, s"$dir/t", Seq("k"))
      .localCheckpoint()
    val nFiles = mani.count()
    assert(nFiles === 4L)
    // pruned planning: the selected file set is a strict subset...
    val selected = mani
      .filter(coalesce(col("max_k") >= 50L && col("min_k") <= 99L, lit(true)))
      .count()
    assert(selected < nFiles && selected >= 1L,
      s"narrow range must prune files, selected $selected of $nFiles")
    // ...and the answers are IDENTICAL to the unpruned read (superset
    // guarantee + residual filter)
    val pruned = graft.etl.LayoutOps.manifestPrunedRead(spark, s"$dir/t",
        mani, "k", lit(50L), lit(99L))
      .filter(col("k").between(50L, 99L))
      .orderBy(col("k")).as[(Long, String)].collect().toSeq
    val direct = spark.read.parquet(s"$dir/t")
      .filter(col("k").between(50L, 99L))
      .orderBy(col("k")).as[(Long, String)].collect().toSeq
    assert(pruned === direct)
    assert(pruned.size === 50)
    // an empty range prunes everything and returns the table's schema
    val none = graft.etl.LayoutOps.manifestPrunedRead(spark, s"$dir/t",
      mani, "k", lit(10000L), lit(20000L))
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("k", "v"))
  }

  test("manifest file skipping: all-null stat column is conservatively kept") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("manifest_null_").toString
    Seq((Option.empty[Long], "a"), (Option.empty[Long], "b"))
      .toDF("k", "v").coalesce(1).write.parquet(s"$dir/t")
    val mani = graft.etl.LayoutOps.buildFileManifest(spark, s"$dir/t", Seq("k"))
    // min_k/max_k are NULL: the file's interval is unknown, so a
    // pruned read must still open it (superset guarantee)
    val out = graft.etl.LayoutOps.manifestPrunedRead(spark, s"$dir/t",
      mani, "k", lit(0L), lit(1L))
    assert(out.count() === 2L)
  }

  test("olsSlope callers: zipfCurve unaffected by the positive-point filter") {
    import spark.implicits._
    // rank/freq are always >= 1 so the x>0 && y>0 filter is a no-op for
    // zipf; pin a hand-solved 3-point fit: freq 8,4,2 at rank 1,2,3 is
    // exactly log-linear with slope ln(2)/... computed via the same
    // 9-dp-rounded decimal moments the engine uses.
    val docs = Seq.tabulate(14) { i =>
      val t = if (i < 8) "aa" else if (i < 12) "bb" else "cc"
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val out = graft.ext.TextOps.zipfCurve(docs, "doc_id", "text", topR = 3)
      .orderBy(col("rank"))
      .select(col("rank"), col("token"), col("freq"), col("zipf_slope"))
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Seq((1L, "aa", 8L), (2L, "bb", 4L), (3L, "cc", 2L)))
    val slope = out.head._4
    assert(slope < -1.2 && slope > -1.3,
      s"log2-spaced frequencies over ranks 1..3 fit near -1.26, got $slope")
    assert(out.map(_._4).distinct.size === 1)
  }
}
