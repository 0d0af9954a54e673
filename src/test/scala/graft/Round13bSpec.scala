package graft

import org.apache.spark.sql.functions._

/** Round-13 second-wave pins: the surgical exact-substring cut, the
  * time-series monitoring tier, leakage-free feature encoding, and the
  * corpus-statistics evals.
  */
class Round13bSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("spanRemoval: hand-solved fixture — canonical survives, copies cut") {
    import spark.implicits._
    // doc 1: 20 distinct words; doc 2 lifts doc 1's words a05..a12 (one
    // shared 8-gram, canonical in doc 1) inside a fringe; doc 3 repeats
    // its own first 8 words once (within-doc dup: first kept, second cut)
    val w1 = (1 to 20).map(i => f"a$i%02d")
    val d1 = w1.mkString(" ")
    val d2 = (Seq("x1", "x2") ++ w1.slice(4, 12) ++ Seq("y1", "y2")).mkString(" ")
    val d3 = ((1 to 8).map(i => s"b$i") ++ (1 to 8).map(i => s"b$i") ++
      Seq("c1", "c2")).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = graft.ext.TextOps.spanRemoval(docs, "doc_id", "text", n = 8)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_words"), col("removed_words"),
        col("kept_words"), col("clean_md5"))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 20L, 0L, 20L, md5hex(d1)),
      (2L, 12L, 8L, 4L, md5hex("x1 x2 y1 y2")),
      (3L, 18L, 8L, 10L, md5hex(((1 to 8).map(i => s"b$i") ++
        Seq("c1", "c2")).mkString(" ")))))
  }

  test("spanRemoval: cut positions partition the document exactly") {
    import spark.implicits._
    val out = SparkEntry.queries("dedup_span_removal")(
        spark, "/root/testdata/sf0.001")
      .select(col("n_words"), col("removed_words"), col("kept_words"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (n, r, k) =>
      assert(r + k === n, s"removed + kept must equal n_words, got ($n,$r,$k)")
    }
    // the perturbed copies guarantee real surgery somewhere
    assert(out.map(_._2).sum > 0L, "augmented corpus must lose spans")
  }

  test("md5-60 shingle kernel == hex-round-trip formulation, value for value") {
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until 20).map(j => s"w${(i * 7 + j * 3) % 13}").mkString(" "))
    }.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("__w"))
    val n = docs
      .select(expr("graft_shingle_md5_60(__w, 8)").as("k"),
        expr("""transform(sequence(0, size(__w) - 8), i ->
          cast(conv(substring(md5(concat_ws(' ', __w[i], __w[i+1], __w[i+2],
            __w[i+3], __w[i+4], __w[i+5], __w[i+6], __w[i+7])), 1, 15), 16, 10)
          AS BIGINT))""").as("r"))
      .filter(expr("k <> r"))
      .count()
    assert(n === 0L, "kernel must be bit-equal to the md5 hex idiom")
  }

  test("spanRemoval: over-long doc fails loudly, not silently") {
    import spark.implicits._
    // shrink the pack bound so the guard path exercises cheaply — the
    // production default is the same expression at SpanPosPack
    val big = (0 until 80).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, big), (2L, big)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.ext.TextOps.spanRemoval(docs, "doc_id", "text", n = 8,
          posPack = 64L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("SpanPosPack")))
  }

  test("seasonalDecompose: pure trend+weekly series decomposes exactly") {
    import spark.implicits._
    // value = 10 + s(phase) with s summing to 0 over any 7 consecutive
    // days: the 7-day centered MA recovers the base exactly on every
    // full-window day, the detrended value IS the weekly shape, and
    // the residual is identically zero.
    val shape = Seq(3.0, -1.0, 2.0, -4.0, 0.0, 1.0, -1.0)
    val day0 = java.time.LocalDate.parse("2024-03-04")
    val rows = (0 until 21).map { i =>
      val d = day0.plusDays(i)
      val phase = (d.toEpochDay % 7).toInt
      (java.sql.Date.valueOf(d), 10.0 + shape(phase))
    }
    val out = graft.etl.StatOps.seasonalDecompose(
        rows.toDF("d", "total"), "d", "total", period = 7, half = 3)
      .orderBy(col("d"))
      .select(col("d"), col("trend"), col("phase"), col("seasonal"),
        col("residual"))
      .as[(java.sql.Date, Option[Double], Long, Double, Option[Double])]
      .collect().toSeq
    assert(out.length === 21)
    out.take(3).foreach { case (_, t, _, _, r) =>
      assert(t.isEmpty && r.isEmpty, "edge days carry no trend")
    }
    out.takeRight(3).foreach { case (_, t, _, _, r) =>
      assert(t.isEmpty && r.isEmpty)
    }
    out.slice(3, 18).foreach { case (d, t, p, s, r) =>
      assert(t === Some(10.0), s"trend at $d")
      assert(s === shape(p.toInt), s"seasonal at phase $p")
      assert(r === Some(0.0), s"residual at $d")
    }
  }

  test("cusumChangepoints: closed form equals the textbook recursion; step fires") {
    import spark.implicits._
    // 20 quiet days at 10 (with a deterministic ripple so sd > 0),
    // then 10 shifted days at 20
    val day0 = java.time.LocalDate.parse("2024-05-01")
    val xs = (0 until 30).map { i =>
      val base = if (i < 20) 10.0 else 20.0
      base + (i % 3) * 0.5
    }
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (java.sql.Date.valueOf(day0.plusDays(i)), x)
    }
    val out = graft.etl.StatOps.cusumChangepoints(
        rows.toDF("d", "x"), "d", "x", k = 0.5, h = 4.0)
      .orderBy(col("d"))
      .select(col("cusum_pos"), col("cusum_neg"), col("changepoint"),
        col("mu"), col("sd"))
      .as[(Double, Double, Long, Double, Double)].collect().toSeq
    // textbook recursion S_t = max(0, S_{t-1} + d_t) on the same terms
    val n = xs.length
    val s = xs.sum
    val q = xs.map(x => x * x).sum
    val mu = s / n
    val sd = math.sqrt((q - s * s / n) / (n - 1.0))
    def rec(drift: Double => Double): Seq[Double] =
      xs.scanLeft(0.0)((acc, x) =>
        math.max(0.0, acc + BigDecimal(drift(x)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).tail
    val expPos = rec(x => x - mu - 0.5 * sd)
    val expNeg = rec(x => mu - x - 0.5 * sd)
    out.zip(expPos.zip(expNeg)).zipWithIndex.foreach {
      case (((p, ng, _, _, _), (ep, en)), i) =>
        assert(math.abs(p - ep) < 1e-6, s"cusum_pos day $i: $p vs $ep")
        assert(math.abs(ng - en) < 1e-6, s"cusum_neg day $i: $ng vs $en")
    }
    // the quiet head never flags; the shifted tail must flag
    assert(out.take(20).forall(_._3 === 0L), "no false alarm pre-shift")
    assert(out.drop(21).exists(_._3 === 1L), "shift must be detected")
  }

  private def encFixture(flip: Boolean) = {
    import spark.implicits._
    // (cat, fold, y): A/f0 = {1,1}, A/f1 = {0}, B/f0 = {0,0}, B/f1 = {1,1,1}
    val y0 = if (flip) 0L else 1L
    Seq(("A", 0L, y0), ("A", 0L, 1L), ("A", 1L, 0L),
      ("B", 0L, 0L), ("B", 0L, 0L),
      ("B", 1L, 1L), ("B", 1L, 1L), ("B", 1L, 1L))
      .toDF("cat0", "fold0", "y")
  }

  private def encMap(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    graft.etl.FeatureOps.targetEncodeOof(df, "cat0", col("y"), col("fold0"),
        smoothing = 2.0)
      .select(col("cat"), col("fold"), col("n_oof"), col("enc"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (c, f, n, e) => (c, f) -> (n, e) }.toMap
  }

  test("targetEncodeOof: hand-solved 2x2 fixture") {
    val m = encMap(encFixture(flip = false))
    // grand (n, s) = (8, 5); priors excluding fold 0 / fold 1:
    // (5-2)/(8-4) = 0.75 and (5-3)/(8-4) = 0.5
    assert(m(("A", 0L)) === ((1L, 0.5)))  // (0 + 2*0.75) / (1 + 2)
    assert(m(("A", 1L)) === ((2L, 0.75))) // (2 + 2*0.5)  / (2 + 2)
    assert(m(("B", 0L)) === ((3L, 0.9)))  // (3 + 2*0.75) / (3 + 2)
    assert(m(("B", 1L)) === ((2L, 0.25))) // (0 + 2*0.5)  / (2 + 2)
  }

  test("targetEncodeOof: a row's own target cannot reach its own encoding") {
    // flip one (A, fold 0) label: that fold-cell's own encoding must be
    // UNCHANGED (its target is excluded from both the cell sum and the
    // excluded-fold prior) — the structural no-leak theorem
    val before = encMap(encFixture(flip = false))
    val after = encMap(encFixture(flip = true))
    assert(before(("A", 0L)) === after(("A", 0L)))
    // while encodings that legitimately see the row DO move
    assert(before(("A", 1L)) !== after(("A", 1L)))
  }

  test("woeIv: hand-solved two-category fixture") {
    import spark.implicits._
    val df = (Seq.fill(3)(("X", 1L)) ++ Seq(("X", 0L)) ++
      Seq(("Y", 1L)) ++ Seq.fill(3)(("Y", 0L))).toDF("cat0", "y")
    val out = graft.etl.FeatureOps.woeIv(df, "cat0", col("y"))
      .orderBy(col("cat"))
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    def r9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val woeX = r9(math.log((3.5 / 4) / (1.5 / 4)))
    val ivX = r9((3.5 / 4 - 1.5 / 4) * woeX)
    val woeY = r9(math.log((1.5 / 4) / (3.5 / 4)))
    val ivY = r9((1.5 / 4 - 3.5 / 4) * woeY)
    assert(out === Seq(("X", 4L, 3L, 1L, woeX, ivX),
      ("Y", 4L, 1L, 3L, woeY, ivY)))
    // evidence is symmetric and IV is non-negative by construction
    assert(woeX === -woeY && ivX > 0 && ivY > 0)
  }

  test("zipfCurve: exact 1/r corpus fits slope -1") {
    import spark.implicits._
    // freq(r) = 12/r for r = 1..4: ln freq = ln 12 - ln r, slope -1
    val toks = Seq.fill(12)("t1") ++ Seq.fill(6)("t2") ++
      Seq.fill(4)("t3") ++ Seq.fill(3)("t4")
    val docs = toks.grouped(5).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps.zipfCurve(docs, "doc_id", "text", topR = 4)
      .orderBy(col("rank"))
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Seq((1L, "t1", 12L), (2L, "t2", 6L), (3L, "t3", 4L), (4L, "t4", 3L)))
    out.foreach(r => assert(math.abs(r._4 - (-1.0)) < 1e-6,
      s"slope ${r._4} must be -1"))
  }

  test("heapsGrowth: one new token per document accumulates exactly") {
    import spark.implicits._
    // doc i = {shared} ∪ {unique_i}: with 10 docs in 10 buckets the
    // cumulative vocab at bucket k is k+1 and n_docs is k
    val docs = (0 until 10).map(i => (i.toLong, s"shared uniq$i"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps.heapsGrowth(docs, "doc_id", "text",
        buckets = 10)
      .orderBy(col("bucket"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ===
      (1 to 10).map(k => (k.toLong, k.toLong, k.toLong + 1)))
    // the fitted beta matches the same OLS computed by hand
    def r9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = (1 to 10).map(k => (r9(math.log(k)), r9(math.log(k + 1))))
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    out.foreach(r => assert(math.abs(r._4 - beta) < 1e-6))
  }

  test("paddingWaste: sorted batching removes all padding on a bimodal fixture") {
    import spark.implicits._
    // lengths (1, 9, 1, 9) in id order, one shard, batch size 2:
    //   arrival = (1,9),(1,9) -> padded 36, real 20, waste 4/9
    //   sorted  = (1,1),(9,9) -> padded 20, waste 0
    val docs = Seq(
      (1L, "w"), (2L, ("x " * 9).trim), (3L, "y"), (4L, ("z " * 9).trim))
      .toDF("doc_id", "text")
    val out = graft.ext.TextOps.paddingWaste(docs, "doc_id", "text",
        batchSize = 2, shards = 1)
      .orderBy(col("strategy"))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("arrival", 2L, 20L, 36L, 0.444444444),
      ("length_sorted", 2L, 20L, 20L, 0.0)))
  }

  test("streamingCusum == batch detector bit-for-bit; out-of-order fails loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try { streamingCusumBody() } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  private def streamingCusumBody(): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val day0 = java.time.LocalDate.parse("2024-05-01")
    val xs = (0 until 30).map { i =>
      (if (i < 20) 10.0 else 20.0) + (i % 3) * 0.5
    }
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (java.sql.Date.valueOf(day0.plusDays(i)), x)
    }
    val batch = graft.etl.StatOps.cusumChangepoints(
        rows.toDF("d", "x"), "d", "x", k = 0.5, h = 4.0)
      .orderBy(col("d"))
      .select(col("d"), col("cusum_pos"), col("cusum_neg"), col("changepoint"))
      .as[(java.sql.Date, Double, Double, Long)].collect().toSeq
      .map(r => (r._1.toLocalDate.toEpochDay, r._2, r._3, r._4))
    // the batch op's INTERNAL (unrounded) moments, reproduced on the
    // same exact-in-double fixture (all values are multiples of 0.5)
    val n = xs.length
    val s = xs.sum
    val q = xs.map(x => x * x).sum
    val mu = s / n
    val sd = math.sqrt((q - s * s / n) / (n - 1.0))
    val stream = MemoryStream[(String, Long, Double)]
    val out = graft.streaming.StreamingOps.streamingCusum(
      stream.toDS().toDF("series", "day", "x"), mu, sd, k = 0.5, h = 4.0)
    val qy = out.writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      xs.zipWithIndex.map { case (x, i) =>
        ("ev", day0.plusDays(i).toEpochDay, x)
      }.grouped(7).foreach { b => stream.addData(b); qy.processAllAvailable() }
    } finally qy.stop()
    val streamed = spark.table("cusum_stream").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(streamed === batch,
      "streamed CUSUM must equal the batch detector bit-for-bit")
    // out-of-order arrival corrupts the running min — must fail loudly
    val bad = MemoryStream[(String, Long, Double)]
    val out2 = graft.streaming.StreamingOps.streamingCusum(
      bad.toDS().toDF("series", "day", "x"), mu, sd)
    val qy2 = out2.writeStream.format("memory").queryName("cusum_bad")
      .outputMode("append").start()
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        bad.addData(Seq(("ev", 10L, 1.0)))
        qy2.processAllAvailable()
        bad.addData(Seq(("ev", 9L, 1.0)))
        qy2.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("in-order days")))
    } finally qy2.stop()
  }

  test("autocorrelation: exact period-3 series peaks at lag 3 with r = 0.9") {
    import spark.implicits._
    // 30 days repeating (1, 2, 3): dev = (-1, 0, 1, ...), so
    // r_3 = (sum dev^2 over t>3) / (sum dev^2) = 18/20 = 0.9 exactly
    val day0 = java.time.LocalDate.parse("2024-07-01")
    val xs = (0 until 30).map(i => 1.0 + (i % 3))
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (java.sql.Date.valueOf(day0.plusDays(i)), x)
    }
    val out = graft.etl.StatOps.autocorrelation(
        rows.toDF("d", "x"), "d", "x", maxLag = 6)
      .orderBy(col("lag_k"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ===
      (1 to 6).map(k => (k.toLong, 30L - k)))
    val acf = out.map(r => r._1 -> r._3).toMap
    assert(acf(3L) === 0.9 && acf(6L) === 0.8, "period-3 harmonics")
    // direct-formula cross-check at every lag
    val mu = xs.sum / xs.length
    val dev = xs.map(_ - mu)
    val den = dev.map(d => d * d).sum
    (1 to 6).foreach { k =>
      val num = (k until 30).map(t => dev(t) * dev(t - k)).sum
      assert(math.abs(acf(k.toLong) - num / den) < 1e-9, s"lag $k")
    }
  }

  test("anomalyReport: quiet head ok, incident spike escalates, counts consistent") {
    import spark.implicits._
    // a 2-day incident spike mid-series — SHORT, so the contaminated
    // global moments cannot absorb it (a 1/3-duration step caps the
    // contaminated z at sqrt(2) < 2 no matter its size; a 2/30 spike
    // reaches ~3.7 sigma) and all three detectors can catch it
    val day0 = java.time.LocalDate.parse("2024-05-01")
    val rows = (0 until 30).map { i =>
      val base = if (i == 14 || i == 15) 30.0 else 10.0
      (java.sql.Date.valueOf(day0.plusDays(i)), base + (i % 3) * 0.5)
    }
    val out = graft.queries.Breadth22.anomalyReport(rows.toDF("d", "x"))
      .orderBy(col("d"))
      .select(col("z_flag"), col("resid_flag"), col("cusum_flag"),
        col("n_flags"), col("verdict"))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    out.foreach { case (z, r, c, n, v) =>
      assert(n === z + r + c, "n_flags must be the flag sum")
      assert(v === (if (n >= 2) "anomaly" else if (n == 1) "watch" else "ok"))
    }
    // days far from the spike's MA window stay quiet
    assert(out.take(11).forall(_._5 === "ok"), "no false alarm pre-spike")
    // the spike days must escalate to a multi-detector anomaly verdict
    assert(out.slice(14, 16).exists(_._5 === "anomaly"), "spike must escalate")
  }

  test("bm25Prf: feedback expansion surfaces a doc the base query cannot see") {
    import spark.implicits._
    // docs 1-3 match 'alpha' and are saturated with 'beta'; doc 4 has
    // ONLY 'beta' (invisible to the base query); docs 5+ are noise.
    // PRF must pick 'beta' as an expansion term and pull doc 4 in.
    val docs = Seq(
      (1L, "alpha beta beta beta pad1"),
      (2L, "alpha beta beta beta pad2"),
      (3L, "alpha beta beta beta pad3"),
      (4L, "beta beta beta beta beta"),
      (5L, "gamma delta pad4 pad5 pad6"),
      (6L, "gamma delta pad7 pad8 pad9")).toDF("doc_id", "text")
    val postings = graft.ext.TextOps.buildInvertedIndex(docs, "doc_id", "text")
      .localCheckpoint()
    val stats = graft.ext.TextOps.corpusStats(postings, "doc_id")
    val base = graft.ext.TextOps.bm25RankFromPostings(
        postings.filter(col("term") === "alpha"), stats, "doc_id", 25)
      .select(col("doc_id")).as[Long].collect().toSet
    val prf = graft.ext.TextOps.bm25Prf(postings, stats, "doc_id",
        Seq("alpha"), feedbackK = 3, expandE = 1, k = 25)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(!base.contains(4L), "base query must not see the beta-only doc")
    assert(prf.contains(4L), "expansion must surface the beta-only doc")
    assert(Set(1L, 2L, 3L).subsetOf(prf), "original hits survive expansion")
    assert(!prf.contains(5L) && !prf.contains(6L),
      "noise docs share no query term and stay out")
  }

  test("reconciliationAudit: reconciled, mismatched and orphan orders each counted") {
    import spark.implicits._
    val orders = Seq(
      (1L, "O", 21.0),  // matches its lines exactly
      (2L, "O", 30.0),  // lines sum to 21 -> gap 9.00
      (3L, "F", 10.0))  // no lines at all
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    // each line: 10.00 * 1.10 * 0.95 = 10.45 exactly; two lines = 20.90
    // plus one 0.10-line (0.10 * 1.0 * 1.0) -> 21.00
    val li = Seq(
      (1L, 10.0, 0.10, 0.05), (1L, 10.0, 0.10, 0.05), (1L, 0.1, 0.0, 0.0),
      (2L, 10.0, 0.10, 0.05), (2L, 10.0, 0.10, 0.05), (2L, 0.1, 0.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_tax", "l_discount")
    val out = graft.queries.Breadth22.reconciliationAudit(orders, li)
      .orderBy(col("o_orderstatus"))
      .as[(String, Long, Long, Option[Long], Option[Long],
        Option[Double], Option[Double])]
      .collect().toSeq
    assert(out === Seq(
      ("F", 1L, 1L, None, None, None, None),
      ("O", 2L, 0L, Some(1L), Some(1L), Some(9.0), Some(9.0))))
  }

  test("boilerplateScrubBySource: per-source threshold cuts A's banner, keeps B's rarity") {
    import spark.implicits._
    // source A: banner on all 4 docs (scrubbed); 'shared promo' in 1/4
    // of A (kept there) but 4/4 of B (scrubbed there) — the same line
    // text gets OPPOSITE verdicts per source, which no global
    // threshold can express
    val docs = Seq(
      (1L, "A", "nav bar a\nbody one\nshared promo"),
      (2L, "A", "nav bar a\nbody two"),
      (3L, "A", "nav bar a\nbody three"),
      (4L, "A", "nav bar a\nbody four"),
      (5L, "B", "shared promo\nbeta one"),
      (6L, "B", "shared promo\nbeta two"),
      (7L, "B", "shared promo\nbeta three"),
      (8L, "B", "shared promo\nbeta four"))
      .toDF("doc_id", "source", "text")
    val out = graft.ext.TextOps.boilerplateScrubBySource(
        docs, "doc_id", "source", "text", fracPct = 25)
      .orderBy(col("doc_id"))
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, "A", 3L, 2L, md5hex("body one\nshared promo")),
      (2L, "A", 2L, 1L, md5hex("body two")),
      (3L, "A", 2L, 1L, md5hex("body three")),
      (4L, "A", 2L, 1L, md5hex("body four")),
      (5L, "B", 2L, 1L, md5hex("beta one")),
      (6L, "B", 2L, 1L, md5hex("beta two")),
      (7L, "B", 2L, 1L, md5hex("beta three")),
      (8L, "B", 2L, 1L, md5hex("beta four"))))
  }

  test("ppsSystematicHits: heavy unit multi-hits; HT recovers the size total exactly") {
    import spark.implicits._
    // weights (1,1,1,7), total 10, n=5 -> stride 2: unit 2 hits once,
    // unit 4 (interval [3,10)) covers strides 4,6,8,10 -> 4 hits
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 7L))
      .toDF("doc_id", "w")
    val out = graft.etl.SampleOps.ppsSystematicHits(df, "doc_id", "w", n = 5)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 1L, 1L, 10L), (4L, 7L, 4L, 10L)))
    assert(out.map(_._3).sum === 5L, "hit counts sum to n by construction")
    // HT estimator: exact for the size measure, biased-for-this-draw
    // for the count (2 + 8/7)
    val htW = out.map { case (_, w, h, tot) => h.toDouble * w * tot / (5.0 * w) }.sum
    val htN = out.map { case (_, w, h, tot) => h.toDouble * 1.0 * tot / (5.0 * w) }.sum
    assert(htW === 10.0)
    assert(math.abs(htN - (2.0 + 8.0 / 7.0)) < 1e-12)
  }
}
