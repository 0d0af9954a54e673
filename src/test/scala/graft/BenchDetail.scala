package graft

import org.apache.spark.sql.SparkSession

/** Steady-state benchmark: times each registered query `reps` times and
  * reports min/median — separating one-time plan/codegen cost and box
  * noise from steady-state cost (the driver's Bench is single-shot, so
  * its total is ~85% per-query fixed cost at sf0.1 and swings tens of
  * percent run-to-run; see BASELINE.md). Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.BenchDetail [reps] [jsonOut]"
  * With `jsonOut`, writes the machine-readable artifact (committed as
  * BENCHDETAIL_r{N}.json per round) so regressions are separable from
  * noise without a judge rerun: compare `median` per query, not the
  * single-shot BENCH number.
  */
object BenchDetail {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val jsonOut = if (args.length >= 2 && args(1) != "-") Some(args(1)) else None
    // dev-loop convenience: extra args select queries by name substring
    val filters = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    // same one-time warm-ups as the driver Bench: table relations and
    // ingest-time layouts are built before any timed query
    graft.etl.Tables.names.foreach { t =>
      try graft.etl.Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    try {
      graft.etl.LayoutOps.ensureBucketed(spark, sfDir, "orders", Seq("o_orderkey"), 8)
      graft.etl.LayoutOps.ensureBucketed(spark, sfDir, "lineitem", Seq("l_orderkey"), 8)
      graft.etl.LayoutOps.ensurePartitionedOrders(spark, sfDir)
      graft.queries.Extensions.ensureIvfInt8Index(spark, sfDir)
      graft.queries.Extensions.ensureIvfPqIndex(spark, sfDir)
      graft.queries.Extensions.ensureAnnTruth(spark, sfDir)
      graft.queries.Extensions.ensureDedupIndex(spark, sfDir)
      graft.queries.Extensions.ensureDedupClusters(spark, sfDir)
      graft.queries.Extensions.ensurePhashClusters(spark, sfDir)
      graft.queries.Breadth10.ensureVacuumHistory(spark, sfDir)
      graft.queries.Breadth7.ensureTextIndex(spark, sfDir)
      graft.queries.Breadth11.ensurePrefixRanked(spark, sfDir)
      graft.queries.Breadth8.ensureTfidfPostings(spark, sfDir)
      graft.queries.Breadth12.ensureLinkPostings(spark, sfDir)
      graft.queries.Breadth20.ensureAugBandIndex(spark, sfDir)
      graft.queries.Breadth20.ensureWinnowPostings(spark, sfDir)
      graft.queries.Breadth20.ensureAugShingleSets(spark, sfDir)
      graft.queries.Breadth20.ensureAugSimhash(spark, sfDir)
      graft.queries.Breadth14.ensureSpanPostings(spark, sfDir)
      graft.queries.Breadth20.ensureAugClusters(spark, sfDir)
      graft.queries.Breadth20.ensureDocStats(spark, sfDir)
      graft.queries.Breadth11.ensurePiiStats(spark, sfDir)
      graft.queries.Breadth11.ensureErClusters(spark, sfDir)
      graft.queries.Breadth10.ensureDocLengths(spark, sfDir)
      graft.queries.Breadth11.ensureErBlocksD3(spark, sfDir)
      graft.queries.Breadth8.ensureSplitFingerprints(spark, sfDir)
      graft.queries.Breadth23.ensureOrdersManifest(spark, sfDir)
      graft.queries.Breadth24.ensureStagedOrdersAppend(spark, sfDir)
      graft.queries.Breadth24.ensureOrdersCommits(spark, sfDir)
      graft.queries.Breadth24.ensureLineitemManifest(spark, sfDir)
      graft.queries.Breadth24.ensureOrdersMergeCommit(spark, sfDir)
    } catch { case _: Throwable => () }
    // Calibration probe (VERDICT r11 item 4): a fixed synthetic set —
    // one scan-agg, one shuffle join, one window — timed AFTER warm-up
    // and before any registry query, emitted as calib_s in the JSON
    // header. Rounds run on a box whose state drifts a uniform 1.1-1.4x
    // between sessions with no code change; per-query regressions are
    // read as (median / calib_s) ratios round-over-round so the drift
    // divides out. The probe deliberately uses NO registry table or
    // query: spark.range data only, so it measures the box + JVM, never
    // the build. min-of-3 — the probe must not absorb its own cold
    // codegen into the calibration constant.
    // min-of-3 after a discarded warm-up (the warm-up absorbs the
    // probe's own cold janino compile); cleanup scoped to RDDs the
    // probe itself persisted — none today — so a future cross-query
    // persisted frame survives (ADVICE r14)
    val preProbe = spark.sparkContext.getPersistentRDDs.keySet
    val calib = {
      def probe(): Double = {
        val t0 = System.nanoTime()
        val a = spark.range(0, 20000000, 1, 32)
          .selectExpr("id % 97 AS k", "id AS v")
        val b = spark.range(0, 1000000, 1, 32)
          .selectExpr("id % 97 AS k", "id AS w")
        a.join(b.groupBy("k").count(), "k")
          .selectExpr("k", "v", "count",
            "sum(v) OVER (PARTITION BY k % 7 ORDER BY v ROWS BETWEEN 100 PRECEDING AND CURRENT ROW) AS r")
          .selectExpr("sum(r + count) AS s").collect()
        (System.nanoTime() - t0) / 1e9
      }
      probe()
      (1 to 3).map(_ => probe()).min
    }
    // Fixed-overhead probe (VERDICT r14 item 3): median latency of 7
    // single-stage jobs, each with a FRESH inlined literal so every rep
    // pays one janino compile + one job launch — the per-query fixed
    // constant that drifted ~1.4× in r14 while the throughput probe
    // above stayed flat. Sub-0.3 s query regressions are read against
    // calib_fixed_s; heavyweight ones against calib_s.
    val calibFixed = {
      def probe(i: Int): Double = {
        val t0 = System.nanoTime()
        spark.range(0, 100000, 1, 32)
          .selectExpr(s"sum(id % ${101 + i}) AS s$i").collect()
        (System.nanoTime() - t0) / 1e9
      }
      probe(0)
      val ts = (1 to 7).map(probe).sorted
      ts(ts.size / 2)
    }
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!preProbe.contains(id)) rdd.unpersist(false)
    }
    // Per-query job counter (VERDICT r15 item 3): sub-second medians are
    // dominated by per-job fixed cost, so a drifting median decomposes as
    // calib_fixed_s × n_jobs — without the count, adjudication has to
    // guess (the r15 graph_ppr/cluster-family problem). Counted with a
    // listener; the bus is async, so the count is read AFTER the rep's
    // (untimed) unpersist housekeeping and the per-query value is the MAX
    // over reps — lag can only undercount, never overcount, and the true
    // count is constant per plan (AQE may vary it by ±1).
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    })
    // the fixed-overhead probe's own shape (one single-stage job) — the
    // unit n_jobs multiplies against; emitted in the header
    val calibFixedJobs = {
      Thread.sleep(50)
      val j0 = jobCount.get()
      spark.range(0, 100000, 1, 32).selectExpr("sum(id % 113) AS s").collect()
      Thread.sleep(50)
      jobCount.get() - j0
    }
    println(f"calib_s $calib%.3f calib_fixed_s $calibFixed%.4f calib_fixed_n_jobs $calibFixedJobs")
    // a query that crashes must NOT record its (near-zero) failure-path
    // timing — in the committed regression artifact that would read as a
    // dramatic speedup; it records err instead and is excluded from totals
    val selected =
      if (filters.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => filters.exists(n.contains) }
    val rows = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      var nJobs = 0
      val times = (1 to reps).map { _ =>
        // snapshot BEFORE the rep so the cleanup below is scoped to the
        // rep's own residue — a future cross-query persisted frame (or a
        // memoized localCheckpoint-backed artifact, whose lineage is
        // truncated and unrecoverable once evicted) must survive the
        // loop (ADVICE r11)
        val preexisting = spark.sparkContext.getPersistentRDDs.keySet
        val jobs0 = jobCount.get()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch {
          case t: Throwable => err = Some(t.getClass.getSimpleName)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop the rep's localCheckpoint blocks OUTSIDE the timed
        // section: 282 queries x reps, many checkpointing sf0.1-scale
        // frames, otherwise accumulate in the block manager until later
        // queries lose execution memory to storage residue (measured
        // as a broad ~16% drift on untouched queries as the registry
        // grew). A real job runs one query per app; the residue is a
        // bench artifact, not a query property. Logical-plan caches and
        // the parquet run dirs are untouched.
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!preexisting.contains(id)) rdd.unpersist(false)
        }
        nJobs = math.max(nJobs, jobCount.get() - jobs0)
        dt
      }.sorted
      (name, times.head, times(times.size / 2), nJobs, err)
    }
    val ok = rows.filter(_._5.isEmpty)
    println(f"${"query"}%-28s ${"min"}%8s ${"median"}%8s ${"jobs"}%5s")
    ok.sortBy(-_._3).foreach { case (n, mn, md, nj, _) => println(f"$n%-28s $mn%8.3f $md%8.3f $nj%5d") }
    rows.collect { case (n, _, _, _, Some(e)) => println(f"$n%-28s ERR $e") }
    println(f"TOTAL(median) ${ok.map(_._3).sum}%.2f s  TOTAL(min) ${ok.map(_._2).sum}%.2f s" +
      (if (ok.size < rows.size) s"  (${rows.size - ok.size} ERRORED)" else ""))
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    jsonOut.foreach { path =>
      val qs = rows.sortBy(-_._3).map {
        case (n, mn, md, nj, None) =>
          s""""$n":{"min":${fmt(mn)},"median":${fmt(md)},"n_jobs":$nj}"""
        case (n, _, _, _, Some(e)) => s""""$n":{"err":"$e"}"""
      }.mkString(",")
      val json =
        s"""{"reps":$reps,"sf":"$sfDir","cpus":$cpus,""" +
          s""""calib_s":${fmt(calib)},""" +
          s""""calib_fixed_s":${fmt(calibFixed)},""" +
          s""""calib_fixed_n_jobs":$calibFixedJobs,""" +
          s""""total_median":${fmt(ok.map(_._3).sum)},""" +
          s""""total_min":${fmt(ok.map(_._2).sum)},""" +
          s""""n_err":${rows.size - ok.size},""" +
          s""""nq":${rows.size},"queries":{$qs}}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
      println(s"wrote $path")
    }
    spark.stop()
  }
}
