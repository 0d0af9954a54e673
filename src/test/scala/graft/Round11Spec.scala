package graft

import org.apache.spark.sql.functions._

/** Round-11 pins: the ADVICE-r10 hardening fixes (NaN-score exclusion
  * in the per-group cap, null-safe snapshot-diff keys, loud TTL
  * validation in streaming attribution) and the round's headline
  * slices as they land.
  */
class Round11Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("topKPerGroup: NaN scores never fill a slot (explicit exclusion)") {
    import spark.implicits._
    // naive ORDER BY score DESC would rank NaN FIRST (Spark sorts NaN
    // greatest); the negated-CDF key would rank it last — the contract
    // is exclusion, so neither ambiguity can leak into the kept set
    val df = Seq(
      ("g", 1L, 5.0), ("g", 2L, Double.NaN), ("g", 3L, 4.0),
      ("g", 4L, 3.0), ("h", 5L, Double.NaN), ("h", 6L, 1.0))
      .toDF("grp", "id", "s")
    val kept = graft.etl.SampleOps.topKPerGroup(df, "grp", "s", "id", k = 2)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 6L),
      s"NaN-scored rows must be excluded outright, got $kept")
  }

  test("snapshotDiff: null key values match null-safely (no phantom add+remove)") {
    import spark.implicits._
    val a = Seq((Option(1L), "x"), (Option.empty[Long], "y"),
      (Option(3L), "z")).toDF("k", "v")
    val b = Seq((Option(1L), "x"), (Option.empty[Long], "y2"),
      (Option(4L), "w")).toDF("k", "v")
    val out = graft.etl.LayoutOps.snapshotDiff(a, b, Seq("k"))
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull -> r.getString(1)).toMap
    // the null-keyed row present in both snapshots reads CHANGED (value
    // differs), not a spurious removed+added pair
    assert(out === Map("1" -> "unchanged", (null: String) -> "changed",
      "3" -> "removed", "4" -> "added"), s"got $out")
  }

  test("blockedNamePairs: oversized blocks are dropped AND reported, never joined") {
    import spark.implicits._
    // one skewed block (10 records under key 'AAA' > cap 8 — the
    // corpus-sized skew bucket in miniature) plus one healthy block
    val recs = ((1 to 10).map(i => (i.toLong, f"AAA-name$i%02d")) ++
      Seq((21L, "BBB-samex"), (22L, "BBB-samey"), (23L, "CCC-alone")))
      .toDF("id", "name")
    val key = substring(col("name"), 1, 3)
    val pairs = graft.ext.EntityOps.blockedNamePairs(
      recs, "id", "name", key, maxDist = 2, maxBlock = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the skewed block contributes ZERO pairs (dropped, not joined);
    // the healthy block still links
    assert(pairs === Set((21L, 22L)), s"got $pairs")
    val dropped = graft.ext.EntityOps.oversizedBlocks(recs, key, maxBlock = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dropped === Set(("AAA", 10L)), s"dropped-block report: $dropped")
    // null blocking keys never pair and ARE reported
    val withNull = recs.unionByName(Seq((30L, null.asInstanceOf[String]))
      .toDF("id", "name"))
    val p2 = graft.ext.EntityOps.blockedNamePairs(
      withNull, "id", "name", key, maxDist = 2, maxBlock = 8).count()
    assert(p2 === 1L)
    val d2 = graft.ext.EntityOps.oversizedBlocks(withNull, key, maxBlock = 8)
      .collect().map(r => Option(r.getString(0))).toSet
    assert(d2 === Set(Some("AAA"), None))
  }

  test("entityTable: pairs -> CC -> quality canonical, singletons included") {
    import spark.implicits._
    val recs = Seq((1L, "alpha", 0.2), (2L, "alphb", 0.9),
      (3L, "beta", 0.8), (4L, "betb", 0.1), (5L, "gamma", 0.5))
      .toDF("id", "name", "q")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val out = graft.ext.EntityOps.entityTable(recs, pairs, "id", "name",
        col("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(4))).toSet
    // each entity keeps its highest-quality member; the unmatched
    // record is its own singleton entity
    assert(out === Set((1L, 2L, "alphb", 2L), (3L, 3L, "beta", 2L),
      (5L, 5L, "gamma", 1L)), s"got $out")
  }

  test("per-lang quality: stop_ratio scores against the row's OWN language list") {
    import spark.implicits._
    // identical Spanish text under three lang labels: under 'es' every
    // word is a Spanish stop word; under 'en' none are (the pre-fix
    // bias); an unlisted lang falls back to the English list
    val txt = "el la de que y en un por con no"
    val df = Seq((1L, "es", txt), (2L, "en", txt), (3L, "xx", txt),
      (4L, "en", "the and of to a in is it that for"))
      .toDF("doc_id", "lang", "text")
    val out = graft.ext.TextOps.withQualityByLang(df, "text", "lang")
      .select("doc_id", "stop_ratio").as[(Long, Double)].collect().toMap
    assert(out(1L) === 1.0, "Spanish doc must score against the Spanish list")
    // 'en' from the Spanish text: zero English stop hits — the bias
    assert(out(2L) === 0.0)
    assert(out(3L) === out(2L), "unlisted lang falls back to English")
    assert(out(4L) === 1.0)
    // monolingual entry point == per-lang on an all-English frame
    val en = df.filter(col("lang") === "en")
    val mono = graft.ext.TextOps.withQuality(en, "text")
      .select("doc_id", "quality").as[(Long, Double)].collect().toSet
    val byLang = graft.ext.TextOps.withQualityByLang(en, "text", "lang")
      .select("doc_id", "quality").as[(Long, Double)].collect().toSet
    assert(mono === byLang)
    // gopher stop rule: the Spanish doc passes under per-lang rules
    // (>= 2 distinct es stops), fails under the English-only rule
    val g = graft.ext.TextOps.gopherRulesByLang(df, "doc_id", "text", "lang",
        minWords = 1)
      .select("doc_id", "flag_stop").as[(Long, Long)].collect().toMap
    assert(g(1L) === 1L)
    val gEn = graft.ext.TextOps.gopherRules(df.filter(col("doc_id") === 1),
        "doc_id", "text", minWords = 1)
      .select("doc_id", "flag_stop").as[(Long, Long)].collect().toMap
    assert(gEn(1L) === 0L, "English-only rule is a de-facto language gate")
  }

  test("columnDrift: schema-driven sums on a null-transition fixture") {
    import spark.implicits._
    // half A: v = (10, null, 20), s all non-null; half B: v all non-null
    // (30, 50), s = (x, null) — a null-rate TRANSITION in both
    // directions plus a mean shift, the exact alarm shapes
    val df = Seq(
      (0L, Option(10.0), Option("x")), (0L, Option.empty[Double], Option("y")),
      (0L, Option(20.0), Option("z")),
      (1L, Option(30.0), Option("x")), (1L, Option(50.0), Option.empty[String]))
      .toDF("h", "v", "s")
    val out = graft.ext.EvalOps.columnDrift(df, col("h"), Seq("v", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)))).toMap
    val (vna, vnb, vma, vmb, vshift) = out("v")
    assert(vna === 0.333333333 && vnb === 0.0) // rate rounds to 9 dp
    assert(vma === Some(15.0) && vmb === Some(40.0) && vshift === Some(25.0))
    val (sna, snb, sma, smb, sshift) = out("s")
    assert(sna === 0.0 && snb === 0.5)
    // non-numeric: null means, null shift
    assert(sma.isEmpty && smb.isEmpty && sshift.isEmpty)
    // unknown column is a loud error, not a silent skip
    intercept[IllegalArgumentException] {
      graft.ext.EvalOps.columnDrift(df, col("h"), Seq("nope"))
    }
  }

  test("vacuumVersions dryRun: identical report, nothing deleted (idempotent)") {
    val root = java.nio.file.Files.createTempDirectory("graft_vacdry_").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 to 3).foreach { n =>
      spark.range(n + 1).write.mode("overwrite").parquet(s"$root/v$n")
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/v2/_SUCCESS"), false)
    def run(dry: Boolean) = graft.etl.LayoutOps
      .vacuumVersions(spark, root, keep = 2, dryRun = dry)
      .select("version", "action").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = Map(0L -> "expired", 1L -> "kept", 2L -> "debris", 3L -> "kept")
    assert(run(dry = true) === expect)
    // dry run deleted nothing: a second dry run sees the SAME history
    assert(run(dry = true) === expect)
    assert((0 to 3).forall(n =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$root/v$n"))))
    // the real vacuum then reclaims exactly the reported versions
    assert(run(dry = false) === expect)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/v0")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/v2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v1")))
    fs.delete(new org.apache.hadoop.fs.Path(root), true): Unit
  }

  test("containment propose: budget-tranched expansion == single-pass, pair for pair") {
    val docs = graft.etl.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    def pairs(budget: Long) = graft.ext.Dedup.containmentPairs(
        docs, "doc_id", "text", threshold = 0.8,
        pairBudgetPerPass = budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = pairs(Long.MaxValue >> 8)
    // a 4k budget forces many propose tranches AND multiple verify
    // passes at sf0.01 (perPass floors at 1000 candidates) — both
    // staged paths of the 100×-smoke fix, exercised at test scale
    val tranched = pairs(4000L)
    assert(single.nonEmpty && tranched === single,
      s"tranched propose diverged: ${tranched.size} vs ${single.size} pairs")
  }

  test("incremental training mix: 2-batch state march == batch capstone, bit-equal") {
    import graft.ext.MixOps
    val docs = graft.etl.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    // the daily march: day 1 = md5-even docs, day 2 = the rest (a
    // content-overlapping split — some day-2 docs duplicate day-1
    // content, so the cross-batch dedup rule is actually exercised)
    val half = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 2
    val day1 = docs.filter(half === 0)
    val day2 = docs.filter(half === 1)
    val marched = MixOps.mergeMixState(
      MixOps.mixStateOfBatch(day1), MixOps.mixStateOfBatch(day2))
    val oneShot = MixOps.mixStateOfBatch(docs)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(rows(marched) === rows(oneShot),
      "merged keep-state diverges from the one-shot state")
    // and the manifest derived from the marched state equals the batch
    // capstone query's manifest bit-for-bit
    val m1 = MixOps.mixManifest(marched)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val capstone = graft.queries.Registry.queries("pipeline_training_mix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(m1 === capstone,
      "incremental manifest diverges from the batch capstone")
    // merge order must not matter (associativity of the min-struct)
    val rev = MixOps.mergeMixState(
      MixOps.mixStateOfBatch(day2), MixOps.mixStateOfBatch(day1))
    assert(rows(rev) === rows(oneShot))
  }

  test("opqSigns: exactly orthogonal, deterministic, cosine-preserving") {
    val d = 64
    val signs = graft.ext.Similarity.opqSigns(d)
    // R Rᵀ = d·I in exact integer arithmetic: rows of the ±1 matrix
    // are pairwise orthogonal (Hadamard rows stay orthogonal under a
    // shared column sign flip)
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(j => signs(a)(j) * signs(b)(j)).sum
      assert(dot === (if (a == b) d else 0),
        s"rows $a,$b dot=$dot — rotation not orthogonal")
    }
    // power-of-two guard is loud
    intercept[IllegalArgumentException] { graft.ext.Similarity.opqSigns(48) }
    // cosine preservation on real vectors (up to the 9 dp element
    // rounding): rotated-space cosine tracks original cosine
    val emb = graft.etl.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(40)
    val rot = emb.select(col("vec_id"),
      graft.ext.Similarity.opqRotate(col("embedding"), d).as("embedding"))
    def cosPairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
      graft.functions.VectorExpressions.register(spark)
      val a = df.select(col("vec_id").as("ia"), col("embedding").as("va"))
      val b = df.select(col("vec_id").as("ib"), col("embedding").as("vb"))
      a.join(b, col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          round(expr("graft_cosine(va, vb)"), 9).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    val orig = cosPairs(emb)
    val rotc = cosPairs(rot)
    orig.foreach { case (k, c) =>
      assert(math.abs(rotc(k) - c) < 1e-6,
        s"pair $k cosine moved $c -> ${rotc(k)} under rotation")
    }
    // determinism: two applications are bit-identical
    val r2 = emb.select(col("vec_id"),
      graft.ext.Similarity.opqRotate(col("embedding"), d).as("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rot.collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
      .foreach { case (id, v) => assert(r2(id) === v) }
  }

  test("attributionStateful: non-positive TTL rejected at construction") {
    import spark.implicits._
    val empty = spark.emptyDataset[graft.streaming.StreamingOps.AttribIn]
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingOps.attributionStateful(empty,
        dormantTtlMs = Some(0L))
    }
    assert(e.getMessage.contains("dormantTtlMs"))
    // positive TTL still constructs
    graft.streaming.StreamingOps.attributionStateful(empty,
      dormantTtlMs = Some(1000L))
  }

  test("modularity: two triangles bridged by one edge score Newman's classic Q") {
    import spark.implicits._
    // {0,1,2} and {3,4,5} triangles + bridge (2,3): m=7, each community
    // e_c=3, d_c=7 -> contribution 3/7 - (7/14)^2, total Q = 5/14
    val und = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L),
      (4L, 5L), (2L, 3L)).toDF("u", "v")
    val com = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L),
      (5L, 1L)).toDF("node", "community")
    val rows = graft.ext.GraphOps.modularity(und, com)
      .orderBy(col("community"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val want = BigDecimal(3.0 / 7 - 0.25).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.toSeq === Seq((0L, 3L, 3L, 7L, want), (1L, 3L, 3L, 7L, want)),
      s"got ${rows.toSeq}")
    // total Q for the textbook graph is 5/14 ~ 0.357
    assert(math.abs(rows.map(_._5).sum - 5.0 / 14) < 2e-9)
  }

  test("intervalOverlapPairs == naive theta join (multi-bin, touching, zero-length)") {
    import spark.implicits._
    // lengths 0..8 with binDays=7 exercise zero-length intervals,
    // e == s touching overlaps, and intervals spanning 2-3 bins
    val iv = (1 to 60).map { i =>
      val s = java.time.LocalDate.of(2020, 1, 1).plusDays(i * 13 % 50)
      (i % 3L, i.toLong, java.sql.Date.valueOf(s),
        java.sql.Date.valueOf(s.plusDays(i % 9)))
    }.toDF("part", "id", "s0", "e0")
    val got = graft.etl.EventOps
      .intervalOverlapPairs(iv, "part", "id", "s0", "e0", binDays = 7)
      .select("ia", "ib").as[(Long, Long)].collect()
    val a = iv.select(col("part"), col("id").as("ia"), col("s0").as("sa"),
      col("e0").as("ea"))
    val b = iv.select(col("part"), col("id").as("ib"), col("s0").as("sb"),
      col("e0").as("eb"))
    val want = a.join(b, "part")
      .filter(col("ia") < col("ib") &&
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(got.length === want.size,
      s"bin-ownership dedup must emit each pair EXACTLY once: " +
        s"${got.length} rows vs ${want.size} pairs")
    assert(got.toSet === want)
  }

  test("freshness: lag anchored at global max, both stale branches, loud knobs") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    // group a holds the global max (lag 0); b lags 7200 s (stale at the
    // 1800 s threshold); a's old event falls outside the 3600 s window
    val ev = Seq(("a", ts(0)), ("a", ts(10000)), ("b", ts(2800)))
      .toDF("g", "t")
    val out = graft.ext.EvalOps
      .freshness(ev, "g", "t", recentWindowSec = 3600, staleAfterSec = 1800)
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(("a", 2L, 0L, 1L, 0L), ("b", 1L, 7200L, 0L, 1L)),
      s"got ${out.toSeq}")
    intercept[IllegalArgumentException] {
      graft.ext.EvalOps.freshness(ev, "g", "t", recentWindowSec = 0,
        staleAfterSec = 1800)
    }
  }

  test("event transitions: counts from the tie-broken sequence, rates sum to 1") {
    val out = graft.queries.Registry.queries("q63_event_transitions")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // rates within each from_type row-normalize to exactly 1 (after
    // 9 dp rounding, tolerance covers the k rounded terms)
    val sums = out.groupBy(col("from_type"))
      .agg(sum(col("rate")).as("s"), sum(col("n")).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    sums.foreach { case (ft, s, _) =>
      assert(math.abs(s - 1.0) < 1e-7, s"rates for $ft sum to $s")
    }
    // total transitions = total events minus one per user (lead drops
    // exactly the last event of every user's sequence)
    val ev = graft.etl.Tables(spark, sf, "events")
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(sums.map(_._3).sum === expected)
  }

  test("mixtureWaterFill: capped mass redistributes, allocation sums to budget") {
    import spark.implicits._
    // hand-solved: n=(100,1600), tau=.5 -> w=(10,40), cap=4n=(400,6400),
    // budget=3*1700=5100; lambda_1=5100/50=102 caps 'a' (1020>400);
    // lambda_2=(5100-400)/40=117.5 leaves 'b' uncapped -> alloc=(400,4700)
    val two = Seq(("a", 100L), ("b", 1600L)).toDF("g", "n")
    val out = graft.etl.SampleOps
      .mixtureWaterFill(two, "g", "n", tau = 0.5, budgetEpochs = 3L, maxEpochs = 4)
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(out.toSeq === Seq(("a", 400.0, 4.0, 1L), ("b", 4700.0, 2.9375, 0L)),
      s"got ${out.toSeq}")
    // uncapped case: pure temperature proportions, still budget-exact
    val unc = Seq(("a", 100L), ("b", 400L)).toDF("g", "n")
    val o2 = graft.etl.SampleOps
      .mixtureWaterFill(unc, "g", "n", tau = 0.5, budgetEpochs = 2L, maxEpochs = 4)
      .orderBy(col("g"))
      .collect().map(r => (r.getDouble(2), r.getLong(4)))
    assert(math.abs(o2(0)._1 - 1000.0 / 3) < 1e-4 &&
      math.abs(o2(1)._1 - 2000.0 / 3) < 1e-4 &&
      o2.forall(_._2 == 0L), s"got ${o2.toSeq}")
    assert(math.abs(o2.map(_._1).sum - 1000.0) < 1e-4)
    // infeasible budget rejected loudly
    intercept[IllegalArgumentException] {
      graft.etl.SampleOps.mixtureWaterFill(two, "g", "n", 0.5,
        budgetEpochs = 5L, maxEpochs = 4)
    }
  }

  test("partition gaps: exactly the injected error-feed holes, no others") {
    val got = graft.queries.Registry.queries("dq9_partition_gaps")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
    assert(got.nonEmpty && got.forall(_._1 === "error"),
      s"only the injected error-feed gaps should surface: ${got.toSeq}")
    // independently derive the injected holes: every day in the log's
    // range whose day-of-month divides by 5
    val ev = graft.etl.Tables(spark, sf, "events")
      .select(to_date(col("ts")).as("d"))
    val Array(d0, d1) = ev.agg(min(col("d")), max(col("d"))).collect()(0)
      .toSeq.map(_.toString).toArray
    val want = spark.sql(
      s"SELECT explode(sequence(date'$d0', date'$d1', interval 1 day)) AS d")
      .filter(dayofmonth(col("d")) % 5 === 0)
      .collect().map(_.getDate(0).toString).toSet
    assert(got.map(_._2).toSet === want, s"got ${got.toSeq}")
  }

  test("prefixFilterPairs: exact vs naive all-pairs on a token fixture, loud posting bound") {
    import spark.implicits._
    // token sets engineered so the propose must survive every shape:
    // an identical pair (J=1), a just-above-threshold pair, a
    // just-below pair, and a disjoint pair
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")),          // J(1,2)=1.0
      (3L, Seq("a", "b", "c", "x")),          // J(1,3)=3/5=0.6
      (4L, Seq("a", "x", "y", "z")),          // J(1,4)=1/7<0.5
      (5L, Seq("p", "q"))                     // disjoint
    ).toDF("id", "toks")
    val got = graft.ext.Dedup.prefixFilterPairs(docs, "id", "toks", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // naive truth over all 10 pairs
    val rows = docs.as[(Long, Seq[String])].collect()
    val want = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      inter = ta.toSet.intersect(tb.toSet).size
      j = inter.toDouble / (ta.toSet.size + tb.toSet.size - inter)
      if j >= 0.5
    } yield (ia, ib)).toSet
    assert(got === want, s"prefix filter must be EXACT: got $got want $want")
    // the posting-length guard refuses loudly instead of running an
    // unbounded quadratic join
    val ex = intercept[IllegalArgumentException] {
      graft.ext.Dedup.prefixFilterPairs(docs, "id", "toks",
        threshold = 0.5, maxPosting = 1L).collect()
    }
    assert(ex.getMessage.contains("maxPosting"), ex.getMessage)
  }

  test("compactionPlan: size-tiered sequential fill on a hand-solved manifest") {
    import spark.implicits._
    // sizes 90,60,50,40,10 at target 100, largest-first:
    // cum-prev 0,90,150,200,240 -> bins 0,0,1,2,2
    val m = Seq(("p", "f40", 40L), ("p", "f90", 90L), ("p", "f10", 10L),
      ("p", "f60", 60L), ("p", "f50", 50L), ("q", "g1", 500L))
      .toDF("part", "file", "sz")
    val got = graft.etl.LayoutOps.compactionPlan(m, "part", "file", "sz", lit(100.0))
      .select("part", "bin_id", "n_files", "total_size", "action")
      .as[(String, Long, Long, Long, String)].collect().toSet
    assert(got === Set(
      ("p", 0L, 2L, 150L, "compact"),   // 90+60 (overshoot by at most one file)
      ("p", 1L, 1L, 50L, "keep"),
      ("p", 2L, 2L, 50L, "compact"),    // 40+10
      ("q", 0L, 1L, 500L, "keep")       // an already-large file stays put
    ), s"got $got")
  }

  test("embeddingDrift: hand-solved centroid shift; identical halves read as zero drift") {
    import spark.implicits._
    // group g: half-0 mean (1,0), half-1 mean (0,1) -> cos 0, l2 sqrt(2)
    // group h: identical halves -> cos 1, l2 0
    val emb = Seq(
      ("g", 0, Seq(1.0f, 0.0f)), ("g", 2, Seq(1.0f, 0.0f)),
      ("g", 1, Seq(0.0f, 1.0f)), ("g", 3, Seq(0.0f, 1.0f)),
      ("h", 0, Seq(0.5f, 0.5f)), ("h", 1, Seq(0.5f, 0.5f)))
      .toDF("grp", "vid", "embedding")
    val got = graft.ext.EvalOps.embeddingDrift(emb, "grp", col("vid") % 2, "embedding")
      .select("grp", "n_old", "n_new", "centroid_cos", "l2_shift")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got("g") === ((2L, 2L, 0.0, BigDecimal(math.sqrt(2)).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble)), s"got ${got("g")}")
    assert(got("h") === ((1L, 1L, 1.0, 0.0)), s"got ${got("h")}")
  }

  test("eval_embedding_drift query: injected odd-label drift clears the noise floor") {
    val out = graft.queries.Breadth11.evalEmbeddingDrift.fn(spark, sf)
      .select("label", "l2_shift").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val (odd, even) = out.partition(_._1 % 2 == 1)
    assert(odd.nonEmpty && even.nonEmpty)
    // +2.0 in one dimension must dominate the ~0.3 sampling-noise floor
    assert(odd.forall(_._2 > 1.2), s"odd labels must show the injected shift: ${odd.toSeq}")
    assert(even.forall(_._2 < 0.8), s"even labels are the null case: ${even.toSeq}")
  }

  test("eval_er_quality query: multi-pass blocking reaches recall 1.0 on EVERY typo class") {
    // round 11 pinned the single suffix-pass blind spot (suffix typos at
    // recall 0 AND precision 0); round 12's two-pass propose (VERDICT
    // r11 item 1) must make every class fully recallable, while the eval
    // still PRICES the corpus-forced costs: serial-ID neighbors within a
    // decade genuinely sit at dist 1, so the last-char-blind second pass
    // yields base_pair false positives and suffix-class precision 1/10
    val rows = graft.queries.Breadth11.evalErQuality.fn(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet ===
      Set("deletion", "transposition", "suffix_typo", "base_pair"))
    Seq("deletion", "transposition").foreach { cls =>
      val (t, p, h) = rows(cls)
      assert(t === p && p === h && t > 0, s"$cls class must fully link: ${rows(cls)}")
    }
    val (st, sp, sh) = rows("suffix_typo")
    assert(st > 0 && sh === st,
      s"suffix class must be fully recalled by the second pass: ${rows("suffix_typo")}")
    assert(sp === 10 * st,
      s"each typo pairs with its full decade (precision 0.1 priced): ${rows("suffix_typo")}")
    val (bt, bp, bh) = rows("base_pair")
    assert(bt === 0L && bh === 0L && bp > 0L,
      s"base_pair row must price the forced neighbor links: ${rows("base_pair")}")
  }

  test("q64_ewma_decay: dyadic weights make the aggregate partition-invariant bit-for-bit") {
    val ev = graft.etl.Tables(spark, sf, "events")
    def run(parts: Int) = {
      val q = graft.queries.Breadth11.q64EwmaDecay
      // repartition the source through a temp view is invasive; instead
      // rerun the query twice under different shuffle partition counts —
      // order-independence must hold for the sums to be bit-equal
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try q.fn(spark, sf).collect().map(r =>
        (r.getLong(0), r.getDouble(3), r.getDouble(4))).toSeq.sorted
      finally spark.conf.set("spark.sql.shuffle.partitions", 32)
    }
    val a = run(3)
    val b = run(17)
    assert(a === b, "decay sums must be exactly order-independent")
    assert(a.nonEmpty && a.forall { case (_, s, _) => s > 0.0 }, "scores positive")
    assert(ev.select(countDistinct(col("user_id"))).head.getLong(0) === a.size.toLong)
  }

  test("bottom-k sample is MERGEABLE: per-shard bottom-k union-truncate == global bottom-k") {
    val docs = graft.etl.Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("k"))
    val global = docs.orderBy(col("k")).limit(64)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // simulate shards: 4 hash-disjoint slices, bottom-64 each, then
    // merge = union + re-truncate (the tree-reduction a cluster runs)
    val shardBottoms = (0 until 4).flatMap { sh =>
      docs.filter(col("doc_id") % 4 === sh).orderBy(col("k")).limit(64)
        .collect().map(r => (r.getLong(0), r.getString(1)))
    }
    val merged = shardBottoms.sortBy(_._2).take(64)
    assert(merged === global, "bottom-k must merge exactly")
  }

  test("j14_bloom_semi: bloom prefilter changes NOTHING vs the plain semi join, and is in the plan") {
    val q = graft.queries.Breadth12.j14BloomSemi.fn(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "the bloom prefilter must survive into the physical plan")
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val big = graft.etl.Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > 400000.0).select(col("o_orderkey"))
    val want = graft.etl.Tables(spark, sf, "lineitem")
      .join(big, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), graft.queries.Q.moneySum(col("l_quantity")).as("sq"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want, s"bloom false positives must be removed by the exact join: $got vs $want")
  }

  test("dq10_benford: observed frequencies sum to 1; expected follow the log-digit law") {
    val rows = graft.queries.Breadth12.dq10Benford.fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 9L))
    val obsSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(obsSum - 1.0) < 1e-6, s"obs_freq sums to $obsSum")
    val expSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(expSum - 1.0) < 1e-6, s"exp_freq (log-digit law) sums to $expSum")
    // synthetic uniform prices must NOT conform — the audit reports it
    assert(rows.map(_.getDouble(4)).sum > 100.0, "chi2 must flag the non-Benford fixture")
  }

  test("linkPredict: hand-solved bipartite fixture; over-fan keys excluded by contract") {
    import spark.implicits._
    // p1{1,2} p2{1,2,3} p3{1}; p4 has fan 5 > cap 4 and must vanish —
    // including from the degree counts the jaccard reads
    val edges = (Seq((101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L), (102L, 3L),
      (103L, 1L)) ++ (1L to 5L).map(s => (104L, s))).toDF("k", "n")
    val got = graft.ext.GraphOps.linkPredict(edges, "k", "n", maxFan = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"suppliers seen only via the over-fan key must not pair: ${got.keySet}")
    assert(got((1L, 2L)) === ((2L, 0.666666667, 0.833333333)), s"got ${got((1L, 2L))}")
    assert(got((1L, 3L)) === ((1L, 0.333333333, 0.333333333)))
    assert(got((2L, 3L)) === ((1L, 0.5, 0.333333333)))
  }

  test("pipeline_dedup_cascade: stages chain (out_1 == in_2) and both stages bite") {
    val rows = graft.queries.Breadth12.pipelineDedupCascade.fn(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (i1, r1, o1) = rows("1_exact")
    val (i2, r2, o2) = rows("2_near")
    assert(o1 === i2, "stage 2 consumes exactly stage 1's survivors")
    assert(i1 === o1 + r1 && i2 === o2 + r2, "counts must balance")
    assert(r1 > 0 && r2 > 0, s"both stages must remove rows: $rows")
    // the exact-copy replica is at least what stage 1 removes
    assert(r1 >= i1 / 3, s"stage 1 must catch the injected exact-copy replica: $rows")
  }

  test("q65_path_trigrams: rates sum to 1 over a k^3-bounded frame") {
    val rows = graft.queries.Breadth12.q65PathTrigrams.fn(spark, sf).collect()
    val types = graft.etl.Tables(spark, sf, "events")
      .select(countDistinct(col("event_type"))).head.getLong(0)
    assert(rows.length <= types * types * types,
      "the aggregated frame is bounded by the type alphabet, not the corpus")
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-6)
  }

  // ---- wave 4 ------------------------------------------------------------

  test("paretoFront2D: hand-solved skyline, ties co-kept, bucket-invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.95, 3L),  // kept: best quality
      (2L, 0.9, 10L),  // kept
      (3L, 0.9, 10L),  // kept: tie with 2 on BOTH axes — co-optimal
      (4L, 0.9, 5L),   // dominated by 2 (same q, fewer words)
      (5L, 0.5, 20L),  // kept
      (6L, 0.5, 15L),  // dominated by 5
      (7L, 0.45, 20L), // dominated by 5 (equal words, lower q)
      (8L, 0.2, 30L))  // kept: longest
      .toDF("id", "q", "w")
    val expect = Set(1L, 2L, 3L, 5L, 8L)
    for (scale <- Seq(1000.0, 1.0)) { // 1.0 = everything in one bucket:
      // the decomposition must not change the answer, only the plan
      val got = graft.etl.SampleOps.paretoFront2D(df, "q", "w", scale)
        .select("id").as[Long].collect().toSet
      assert(got === expect, s"bucketScale=$scale got $got")
    }
  }

  test("welchPairs: hand-computed t and Welch-Satterthwaite df") {
    import spark.implicits._
    val df = (Seq(1L, 2L, 3L, 4L, 5L).map(("A", _)) ++
      Seq(2L, 4L, 6L).map(("B", _))).toDF("arm", "x")
    val r = graft.etl.StatOps.welchPairs(df, "arm", "x").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "A" && row.getString(1) === "B")
    assert(row.getLong(2) === 5L && row.getLong(3) === 3L)
    assert(row.getDouble(4) === 3.0 && row.getDouble(5) === 4.0)
    // var_A=2.5, var_B=4: t = -1/sqrt(0.5 + 4/3), df via Welch formula
    assert(math.abs(row.getDouble(6) - -0.738548946) < 1e-8, s"t=${row.getDouble(6)}")
    assert(math.abs(row.getDouble(7) - 3.532846715) < 1e-8, s"df=${row.getDouble(7)}")
  }

  test("triDiversity: boilerplate concentrates, diverse text spreads") {
    import spark.implicits._
    val df = Seq(
      ("spam", "a b c a b c a b c a b c"), // 10 trigrams, 3 distinct (4/3/3)
      ("div", "one two three four five"))  // 3 trigrams, all distinct
      .toDF("src", "text")
    val got = graft.ext.TextOps.triDiversity(df, "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("spam") === ((10L, 3L, 0.3, 0.4, 0.34)), s"got ${got("spam")}")
    assert(got("div") === ((3L, 3L, 1.0, 0.333333333, 0.333333333)))
    assert(got("spam")._5 > got("div")._5,
      "template spam must score more concentrated than diverse prose")
  }

  test("dedup_cluster_report: buckets are powers of two and mass balances") {
    val rows = graft.queries.Breadth13.dedupClusterReport.fn(spark, sf).collect()
    // the query runs over the 2x augmented corpus (originals + xx-
    // perturbed replicas) — every one of those docs must be bucketed
    val nAug = 2 * graft.etl.Tables(spark, sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum === nAug,
      "every augmented doc lands in exactly one cluster-size bucket")
    rows.foreach { r =>
      val (b, nc, nd, dup) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert((b & (b - 1)) === 0L, s"bucket $b is not a power of two")
      assert(dup === nd - nc, "removable dups = docs minus one survivor per cluster")
    }
    assert(rows.map(_.getLong(0)).max >= 2, "the injected replicas must form multi-doc clusters")
  }

  test("eval_rank_overlap: rbo bounded, perfect agreement scores exactly 1") {
    val rows = graft.queries.Breadth13.evalRankOverlap.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, rbo) = (r.getLong(1), r.getDouble(2))
      assert(n >= 0 && n <= 10, s"n_common out of range: $n")
      assert(rbo >= 0.0 && rbo <= 1.0 + 1e-9, s"rbo out of range: $rbo")
      if (n == 0) assert(rbo === 0.0)
    }
    // the serving tier at sf0.01 reproduces at least one exact top-10
    // in order — RBO must then be exactly 1.0 (the weight table sums
    // to the normalizer), which pins the weight generation end-to-end
    assert(rows.exists(r => r.getLong(1) === 10L && r.getDouble(2) === 1.0),
      s"expected a perfect-agreement query: ${rows.map(r => (r.getLong(1), r.getDouble(2))).mkString(", ")}")
  }

  test("q66_rfm_segments: segments span 1-4, customer mass balances") {
    val rows = graft.queries.Breadth14.q66RfmSegments.fn(spark, sf).collect()
    val nCust = graft.etl.Tables(spark, sf, "orders")
      .select(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(rows.map(_.getLong(3)).sum === nCust,
      "every customer lands in exactly one RFM cell")
    rows.foreach { r =>
      Seq(0, 1, 2).foreach { i =>
        assert(r.getLong(i) >= 1 && r.getLong(i) <= 4, s"segment out of range: $r") }
    }
    // quartile cuts put ~25% of customers in each 1-D band: marginal
    // mass of m_seg=1 must be 15-35% (exact quarter up to cut ties)
    val m1 = rows.filter(_.getLong(2) === 1L).map(_.getLong(3)).sum.toDouble / nCust
    assert(m1 > 0.15 && m1 < 0.35, s"m_seg=1 marginal mass $m1 not quartile-like")
  }

  test("text_dup_spans: injected shared span is counted, unique doc scores 0") {
    import spark.implicits._
    // doc 1 and 2 share one 8-word span; doc 3 is all-unique
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"$shared one two"),
      (2L, s"zero $shared"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))
      .toDF("doc_id", "text")
    val q = graft.queries.Breadth14.textDupSpans
    // replicate the query body over the fixture via a temp dir write
    val dir = java.nio.file.Files.createTempDirectory("dupspans").toString
    df.write.parquet(s"$dir/documents.parquet")
    val got = q.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: 10 words -> 3 spans, exactly one (the shared span at its
    // only aligned offset) duplicated; doc 2: 9 words -> 2 spans, 1 dup
    assert(got(1L) === ((3L, 1L, 0.333333333)), s"got ${got(1L)}")
    assert(got(2L) === ((2L, 1L, 0.5)), s"got ${got(2L)}")
    assert(got(3L) === ((2L, 0L, 0.0)), s"unique doc must score 0: ${got(3L)}")
  }

  test("text_cooccur_lift: hand-solved collocation, self-pairs and singletons dropped") {
    import spark.implicits._
    // "a b a b": pairs (a,b)x4 (self-pairs a-a, b-b dropped);
    // "a b c": (a,b), (a,c), (b,c) -> only (a,b) survives n>=2 with n=5
    // N=7 tokens (a:3 b:3 c:1), P=5 kept pairs:
    // lift = 5*7*7 / (5*3*3) = 245/45
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cooc").toString
    df.write.parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Breadth15.textCooccurLift.fn(spark, dir).collect()
    assert(rows.length === 1, s"got ${rows.mkString(", ")}")
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) === (("a", "b", 5L)))
    assert(r.getDouble(3) === 5.444444444, s"lift=${r.getDouble(3)}")
  }

  test("sample_neyman_alloc: allocations integer-exact to the budget, near ideal") {
    val rows = graft.queries.Breadth15.sampleNeymanAlloc.fn(spark, sf).collect()
    assert(rows.map(_.getLong(4)).sum === 100L,
      "largest-remainder rounding must spend the budget exactly")
    rows.foreach { r =>
      assert(math.abs(r.getLong(4) - r.getDouble(3)) < 1.0,
        s"allocation must sit within 1 of the Neyman ideal: $r")
      assert(r.getDouble(2) > 0.0, "every stratum has spread")
    }
  }

  test("layout_overlap_depth: time-clustered files disjoint, hash files fully overlapped") {
    val got = graft.queries.Breadth15.layoutOverlapDepth.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (hf, hmax, _) = got("hash")
    val (_, tmax, tavg) = got("time")
    assert(tmax === 1L && tavg === 1.0,
      s"month-clustered ranges are disjoint -> depth exactly 1: ${got("time")}")
    assert(hmax === hf,
      s"every hash file spans the full range -> max depth = file count: ${got("hash")}")
  }

  test("hits: hand-solved star (one authority, three symmetric hubs), L1 sums to 1") {
    import spark.implicits._
    // 1,2,3 all point at 10; 10 points at 20. After one iteration:
    // auth: 10 = 3/4, 20 = 1/4; hub: 1,2,3 = 0.75/2.5 = 0.3, 10 = 0.1
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (10L, 20L)).toDF("src", "dst")
    val got = graft.ext.GraphOps.hits(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(10L) === ((0.1, 0.75)), s"got ${got(10L)}")
    assert(got(20L) === ((0.0, 0.25)))
    Seq(1L, 2L, 3L).foreach(k => assert(got(k) === ((0.3, 0.0)), s"node $k: ${got(k)}"))
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9, "hub mass L1-normalized")
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9, "auth mass L1-normalized")
  }

  test("ruleAudit: one pass, NULL predicate counts as a violation") {
    import spark.implicits._
    val df = Seq((Option(5L), "ok"), (Option(50L), "ok"), (Option.empty[Long], "ok"))
      .toDF("qty", "status")
    val got = graft.ext.EvalOps.ruleAudit(df, Seq(
        ("qty_band", col("qty") >= 1 && col("qty") <= 30),
        ("status_domain", col("status") === "ok")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // null qty row: the band predicate is NULL -> unprovable -> violation
    assert(got("qty_band") === ((3L, 2L, 0.666666667)), s"got ${got("qty_band")}")
    assert(got("status_domain") === ((3L, 0L, 0.0)))
  }

  test("eval_quality_parity: four-fifths flag fires exactly on the starved language") {
    import spark.implicits._
    // lang xx: punctuation-heavy garbage the quality model drops;
    // lang en: clean prose it keeps -> keep rates 0 vs 1, total 0.5,
    // parity 0.0 vs 2.0 -> only xx crosses the 0.8 line
    val en = "the quick brown fox jumps over the lazy dog again and again with ease"
    val xx = "!!! ??? *** ### $$$ %%% @@@ ^^^ &&& ~~~"
    val df = ((1 to 4).map(i => (i.toLong, en, "en")) ++
      (5 to 8).map(i => (i.toLong, xx, "xx"))).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("parity").toString
    df.write.parquet(s"$dir/documents.parquet")
    val got = graft.queries.Breadth17.evalQualityParity.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got("en") === ((1.0, 2.0, 0L)), s"got ${got("en")}")
    assert(got("xx") === ((0.0, 0.0, 1L)), s"starved language must flag: ${got("xx")}")
  }

  test("text_hashed_features: stateless, bounded width, signed mass conserved") {
    val rows = graft.queries.Breadth17.textHashedFeatures.fn(spark, sf).collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64),
      "feature index bounded by the hash width")
    assert(rows.forall(_.getLong(2) !== 0L), "zero-sum buckets dropped (sparse)")
    // signed mass: sum of weights == sum over tokens of their sign,
    // independent of bucketing — recompute from the token stream
    val toks = graft.etl.Tables(spark, sf, "documents")
      .select(explode(graft.ext.TextOps.words(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .withColumn("h", graft.ext.Dedup.hash32(col("t")))
      .withColumn("sgn", lit(1L) - lit(2L) * (shiftright(col("h"), 6) % 2))
      .agg(sum(col("sgn"))).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum === toks,
      "per-bucket sums must conserve the total signed token mass")
  }

  test("ksTwoSample: hand-solved max CDF gap; identical samples read zero") {
    import spark.implicits._
    // A = [1,2,3], B = [3,4]: the gap peaks at v=2 (F_a=2/3, F_b=0)
    val df = Seq((0L, 1.0), (0L, 2.0), (0L, 3.0), (1L, 3.0), (1L, 4.0))
      .toDF("h", "v")
    val r = graft.etl.StatOps.ksTwoSample(df, col("h"), "v").head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === 0.666666667, s"ks=${r.getDouble(2)}")
    assert(r.getDouble(3) === 2.0, s"at=${r.getDouble(3)}")
    // identical halves: every gap is 0; the argmax tie resolves to the
    // largest value (the documented oracle-matching tie-break)
    val same = Seq((0L, 1.0), (1L, 1.0), (0L, 7.0), (1L, 7.0)).toDF("h", "v")
    val r2 = graft.etl.StatOps.ksTwoSample(same, col("h"), "v").head
    assert(r2.getDouble(2) === 0.0 && r2.getDouble(3) === 7.0, s"got $r2")
  }

  test("streaming rule audit: conditional sums merge across micro-batches (== batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // ruleAudit's per-rule state is (n, violations) — mergeable by
    // addition, so the streaming twin is a plain streaming aggregate in
    // complete mode; this pins the scaladoc's incremental-monitor claim
    val b1 = Seq((5L, "ok"), (50L, "ok"))
    val b2 = Seq((12L, "bad"), (3L, "ok"), (99L, "ok"))
    val stream = MemoryStream[(Long, String)]
    val pred = expr("qty >= 1 AND qty <= 30")
    val agg = stream.toDS().toDF("qty", "status")
      .agg(count(lit(1)).as("n"),
        sum(when(pred, 0L).otherwise(1L)).as("v_band"),
        sum(when(col("status") === "ok", 0L).otherwise(1L)).as("v_status"))
    val q = agg.writeStream.format("memory").outputMode("complete")
      .queryName("rule_audit_stream").start()
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable()
    val s = spark.table("rule_audit_stream").head
    q.stop()
    val batch = graft.ext.EvalOps.ruleAudit(
        (b1 ++ b2).toDF("qty", "status"),
        Seq(("band", pred), ("status", col("status") === "ok")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert((s.getLong(0), s.getLong(1)) === batch("band"))
    assert((s.getLong(0), s.getLong(2)) === batch("status"))
  }

  test("q67_resample_interp: hand-solved linear fill, no nulls in the grid") {
    import spark.implicits._
    // user 0 observes value 1.0 at minute 0 and 9.0 at minute 4: the
    // three gap minutes interpolate to exactly 3, 5, 7
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val ev = Seq((1L, 0L, ts(0), "click", 1.0), (2L, 0L, ts(4), "click", 9.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("interp").toString
    ev.write.parquet(s"$dir/events.parquet")
    val got = graft.queries.Breadth19.q67ResampleInterp.fn(spark, dir).collect()
      .map(r => r.getTimestamp(1).getTime / 60000 -> r.getDouble(2)).toMap
    assert(got === Map(0L -> 1.0, 1L -> 3.0, 2L -> 5.0, 3L -> 7.0, 4L -> 9.0),
      s"got $got")
    // and on the real corpus the both-direction fallback leaves no nulls
    val real = graft.queries.Breadth19.q67ResampleInterp.fn(spark, sf)
    assert(real.filter(col("v_interp").isNull).count() === 0L)
  }

  test("j15_nearest_event: nearest side wins, equidistant resolves to prior") {
    import spark.implicits._
    // user 1: clicks at t=100s and t=300s, purchase at t=180s -> prior
    // (gap 80s) beats next (gap 120s); user 2: clicks equidistant at
    // 100/300 around purchase 200 -> PRIOR by the documented tie-break;
    // user 3: purchase with only a later click -> next side
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 1L, ts(100), "click"), (2L, 1L, ts(180), "purchase"), (3L, 1L, ts(300), "click"),
      (4L, 2L, ts(100), "click"), (5L, 2L, ts(200), "purchase"), (6L, 2L, ts(300), "click"),
      (7L, 3L, ts(500), "purchase"), (8L, 3L, ts(650), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("nearest").toString
    ev.write.parquet(s"$dir/events.parquet")
    def secOf(x: Any): Long = x match {
      case t: java.sql.Timestamp => t.getTime / 1000
      case d: java.time.LocalDateTime => d.toEpochSecond(java.time.ZoneOffset.UTC)
    }
    val got = graft.queries.Breadth19.j15NearestEvent.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((secOf(r.get(3)), r.getLong(4)))).toMap
    assert(got(2L) === ((100L, 80000000L)), s"nearer prior must win: ${got(2L)}")
    assert(got(5L) === ((100L, 100000000L)), s"equidistant resolves PRIOR: ${got(5L)}")
    assert(got(7L) === ((650L, 150000000L)), s"only-next falls forward: ${got(7L)}")
  }
}
