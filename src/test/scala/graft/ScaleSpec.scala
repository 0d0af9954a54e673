package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Plan-level assertions for the scale features that only show up in
  * physical plans: partition pruning (static + dynamic) over partitioned
  * parquet and scan-level filter/column pushdown. These are the
  * mechanisms that turn a 100 TB table into a per-query few-GB read.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val partedDir = {
    val dir = java.nio.file.Files.createTempDirectory("parted_").toString + "/li"
    val li = graft.etl.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    Sinks.writeParquet(li, dir, partitionBy = Seq("l_returnflag"))
    dir
  }

  test("static partition pruning: filter on the partition key prunes directories") {
    val q = spark.read.parquet(partedDir).filter($"l_returnflag" === "A")
    val scan = q.queryExecution.executedPlan.toString
    // pruned scan reads 1 of 3 partition directories
    val counted = q.queryExecution.optimizedPlan.stats
    assert(q.count() ==
      graft.etl.Tables(spark, "/root/testdata/sf0.001", "lineitem")
        .filter($"l_returnflag" === "A").count())
    assert(scan.contains("PartitionFilters") || scan.contains("l_returnflag"))
    assert(counted.sizeInBytes > 0)
  }

  test("dynamic partition pruning: selective dim filter prunes the fact scan") {
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // DPP inserts the pruning subquery only for a *selective* filter on a
    // real source relation (a bare LocalRelation does not qualify)
    val dimDir = java.nio.file.Files.createTempDirectory("dim_").toString + "/d"
    Seq(("A", "keep"), ("N", "drop"), ("R", "drop")).toDF("flag", "label")
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.parquet(partedDir)
    val dim = spark.read.parquet(dimDir).filter($"label" === "keep")
    val q = fact.join(dim, fact("l_returnflag") === dim("flag"))
      .select($"l_orderkey", $"label")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      plan.take(800))
    assert(q.count() > 0)
  }

  test("runtime bloom-filter pruning: selective join side filters the probe scan") {
    // Spark 4 injects a bloom filter from the selective build side into
    // the probe scan (row-level runtime filtering — the shuffle-join
    // analogue of dynamic partition pruning). Thresholds lowered so the
    // tiny test tables qualify.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val li = graft.etl.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      val o = graft.etl.Tables(spark, "/root/testdata/sf0.001", "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      val q = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select($"l_orderkey", $"l_quantity")
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        plan.take(1000))
      assert(q.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("registry-wide plan hygiene: no cartesian products, no rand()") {
    val sf = "/root/testdata/sf0.001"
    val crossOk = Set("j7_cross_join")
    graft.queries.Registry.all.foreach { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      if (!crossOk(q.name))
        assert(!plan.contains("CartesianProduct"),
          s"${q.name} plans a cartesian product:\n${plan.take(600)}")
      assert(!plan.contains("rand("),
        s"${q.name} is nondeterministic (rand):\n${plan.take(600)}")
    }
  }

  test("registry-wide plan hygiene: no O(n)-buffer percentile over row-scale columns") {
    // Spark's exact `percentile` merges a value→count buffer onto ONE
    // task — O(n) memory over a near-distinct (row-scale) column. It is
    // only admissible over bounded domains (daily aggregates, small-int
    // word counts). Row-scale percentiles must use StatOps.percentiles'
    // distributed prefix-sum order statistics (this rule shipped two
    // offenders in round 8: q55_winsorize, q9_percentiles).
    val sf = "/root/testdata/sf0.001"
    val boundedDomainOk = Set(
      "dq5_mad_anomaly_days",   // percentile over ~365 daily aggregate rows
      "pipeline_dataset_card")  // percentile over small-int word counts
    val offenders = graft.queries.Registry.all.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.optimizedPlan.toString
      if (plan.contains("percentile(") && !boundedDomainOk(q.name)) Some(q.name)
      else None
    }
    assert(offenders.isEmpty,
      s"exact percentile over a row-scale column (single-task O(n) buffer " +
        s"at 100 TB — use StatOps.percentiles): ${offenders.mkString(", ")}")
  }

  /** Detector for the low-NDV window hazard: a Window whose EVERY
    * partition key has statically-bounded NDV sorts the whole input
    * into that many reducer tasks (n/3 rows through one task at
    * 100 TB). Bounded-NDV keys are (a) known handful-of-values named
    * columns, and (b) COMPUTED keys of the form `expr % <small
    * literal>` — resolved through Project aliases, the shape the name
    * list cannot see (VERDICT r14 item 1: q72's md5 % 8 shard window
    * funneled the corpus through 8 tasks and the lint was blind to
    * it). Windows with an Aggregate below are exempt (tiny frames by
    * construction).
    */
  private def lowNdvWindowOffenders(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, ExprId, Pmod, Remainder}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project, Window => LWindow}
    val lowNdvCols = Set("l_returnflag", "l_linestatus", "o_orderstatus",
      "o_orderpriority", "l_shipmode", "event_type", "lang", "split")
    val MaxModulus = 64L
    // alias definitions anywhere in the plan — window partition keys are
    // AttributeReferences into the Projects below them
    val defs: Map[ExprId, Expression] = plan.collect {
      case p: Project => p.projectList.collect { case a: Alias => a.exprId -> a.child }
    }.flatten.toMap
    def smallLit(e: Expression): Boolean = e.foldable && (e.eval() match {
      case n: java.lang.Number => math.abs(n.longValue) <= MaxModulus
      case _ => false
    })
    def bounded(e: Expression, depth: Int): Boolean = e match {
      case a: AttributeReference =>
        lowNdvCols(a.name) ||
          (depth < 8 && defs.get(a.exprId).exists(bounded(_, depth + 1)))
      case c: Cast => bounded(c.child, depth)
      case r: Remainder => smallLit(r.right)
      case p: Pmod => smallLit(p.right)
      case _ => false
    }
    plan.collect {
      // a window with NO partition key at all is the degenerate case of
      // the same hazard: ALL rows through one reducer task
      case w: LWindow if w.partitionSpec.forall(bounded(_, 0)) &&
          w.child.collectFirst { case a: Aggregate => a }.isEmpty =>
        s"[${w.partitionSpec.mkString(",")}]"
    }
  }

  test("registry-wide plan hygiene: no low-NDV window over an un-aggregated fact table") {
    // This rule shipped one offender in round 8 (q56_quantile_transform's
    // 3-partition percent_rank); the computed-modulus arm would have
    // shipped two more in round 14 (q72's md5 % 8 curriculum shard,
    // paddingWaste's hash32 % 64 batch shard — both now ride the
    // distributed prefix-sum rank, StatOps.withRowNumber).
    val sf = "/root/testdata/sf0.001"
    val offenders = graft.queries.Registry.all.flatMap { q =>
      lowNdvWindowOffenders(q.fn(spark, sf).queryExecution.optimizedPlan)
        .map(s => s"${q.name}: $s")
    }
    assert(offenders.isEmpty,
      s"low-NDV/global window over an un-aggregated input (single-task " +
        s"sort at scale): ${offenders.mkString("; ")}")
  }

  test("low-NDV window lint self-check: flags the retired q72 shape (md5 % 8 window)") {
    // regression fixture: the exact round-14 curriculumOrder plan shape —
    // row_number() over a window partitioned on a computed small-modulus
    // shard key over an un-aggregated input. The lint MUST go red on it
    // (it was blind to computed keys in r14), and must stay green on the
    // same key once an Aggregate sits below the window.
    import org.apache.spark.sql.expressions.Window
    val docs = spark.range(100).select(col("id").cast("string").as("doc_id"),
      (col("id") % 13).cast("double").as("quality"))
    val h = conv(substring(md5(col("doc_id")), 1, 8), 16, 10).cast("long")
    val oldShape = docs.withColumn("shard", h % 8)
      .withColumn("position", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("quality").desc)))
    assert(lowNdvWindowOffenders(oldShape.queryExecution.optimizedPlan).nonEmpty,
      "lint must flag a computed small-modulus window partition key")
    val aggBelow = docs.withColumn("shard", h % 8)
      .groupBy(col("shard"), col("quality")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("quality").desc)))
    assert(lowNdvWindowOffenders(aggBelow.queryExecution.optimizedPlan).isEmpty,
      "lint must exempt windows over aggregated frames")
  }

  test("registry-wide plan hygiene: no shrinking unbounded-FOLLOWING window frame") {
    // Spark executes a frame whose upper bound is UNBOUNDED FOLLOWING
    // but whose lower bound moves (e.g. ROWS BETWEEN 1 FOLLOWING AND
    // UNBOUNDED FOLLOWING) by RECOMPUTING the aggregate from scratch
    // for every row — O(n²) per partition (this rule shipped one
    // offender in round 11: q67_resample_interp's first draft took
    // >9 min on a 43k-row partition; the reversed-order running frame
    // computes the identical answer in O(n)). Frames that are
    // unbounded on BOTH ends are fine (one aggregate per partition).
    import org.apache.spark.sql.catalyst.expressions.{SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val sf = "/root/testdata/sf0.001"
    val offenders = graft.queries.Registry.all.flatMap { q =>
      q.fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: LWindow =>
          w.windowExpressions.flatMap(_.collect {
            case WindowExpression(_, WindowSpecDefinition(_, _,
                SpecifiedWindowFrame(_, lo, UnboundedFollowing)))
                if lo != UnboundedPreceding =>
              s"${q.name}: ($lo, UnboundedFollowing)"
          })
      }.flatten
    }
    assert(offenders.isEmpty,
      s"shrinking unbounded-FOLLOWING frame (O(n²) per partition — use " +
        s"the reversed-order running frame): ${offenders.mkString("; ")}")
  }

  test("registry-wide source hygiene: metadata-bucket pair joins ride a systematic sample") {
    // Exact pairwise similarity inside a METADATA bucket (lang, domain,
    // ...) is unbounded under corpus skew — English is ~half a web
    // corpus, so "per-bucket pairwise" quietly becomes all-pairs at
    // 100 TB. The op is only admissible as a truth/eval tool over a
    // bounded deterministic sample; production near-dup pairs come from
    // the band-bucketed variant (ngramJaccardPairsLsh — bucket size set
    // by signature parameters, not corpus skew). The sample filter sits
    // below ngramJaccardPairs' localCheckpoint, so no plan-level walk
    // can see it — this lint checks the registry SOURCE instead: every
    // ngramJaccardPairs call site must sample its input with the
    // md5-systematic hash32 discipline (this rule shipped two offenders
    // in round 9: dedup_ngram_jaccard and eval_dedup_quality's truth).
    import scala.jdk.CollectionConverters._
    val qdir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val offenders = java.nio.file.Files.list(qdir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).flatMap { p =>
        val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        // call-site window: the op call plus its receiver/arg block
        raw"ngramJaccardPairs\(".r.findAllMatchIn(src).flatMap { m =>
          // the sample filter may be inline in the arg or a helper
          // defined just above the call — scan both directions
          val window = src.substring(math.max(0, m.start - 500),
            math.min(src.length, m.start + 400))
          if (window.contains("hash32")) None
          else Some(s"${p.getFileName}:${src.substring(0, m.start).count(_ == '\n') + 1}")
        }
      }.toList
    assert(offenders.isEmpty,
      s"ngramJaccardPairs over an unsampled corpus (metadata-bucket " +
        s"all-pairs under skew at 100 TB — thread a hash32 systematic " +
        s"sample into the input or use ngramJaccardPairsLsh): " +
        offenders.mkString(", "))
  }

  test("TPC-H-pattern queries broadcast their dimension/aggregate sides") {
    // the explicit broadcast() hints must survive planning: the brand
    // parts + thresholds (q27), the HAVING aggregate (q28), the scalar
    // max (q31) and the stats threshold (q30) are all small sides
    val sf = "/root/testdata/sf0.001"
    Seq("q27_small_qty_loss", "q28_big_orders", "q30_inactive_high_balance",
        "q31_top_supplier").foreach { name =>
      val plan = graft.queries.Registry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
        s"$name lost its broadcast:\n${plan.take(800)}")
    }
    // the custom as-of join plans exactly one AsOfJoinExec and no Window
    val asofPlan = graft.queries.Registry.queries("j9_asof_custom_operator")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(asofPlan.contains("AsOfJoin") && !asofPlan.contains("Window"),
      asofPlan.take(800))
    // the binned range join is an EQUI join — no nested-loop operator
    val binnedPlan = graft.queries.Registry.queries("j10_binned_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin"), binnedPlan.take(800))
    // q42's OR-of-conjunct bands share the partkey equi conjunct:
    // Catalyst must extract it and plan a hash join, never a nested loop
    val bandsPlan = graft.queries.Registry.queries("q42_disjunctive_bands")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(bandsPlan.contains("BroadcastHashJoin") &&
      !bandsPlan.contains("BroadcastNestedLoopJoin"), bandsPlan.take(800))
    // q37 joins the nation dim twice under aliases — both stay broadcast
    val shipPlan = graft.queries.Registry.queries("q37_volume_shipping")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(shipPlan).size >= 2, shipPlan.take(800))
  }

  test("parquet schema evolution: mergeSchema unions batch schemas, old rows null-fill") {
    // a 100 TB table accretes columns over time; readers must see the
    // union schema with null-fill for pre-evolution files
    val dir = java.nio.file.Files.createTempDirectory("evolve_").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/batch=0")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(s"$dir/batch=1")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("batch", "id", "score", "v"))
    val rows = merged.orderBy($"id")
      .select($"id", $"score").collect()
    assert(rows(0).isNullAt(1))           // old batch null-fills the new column
    assert(rows(1).getDouble(1) == 9.5)
  }

  test("scan pushdown: predicate and projection reach the parquet reader") {
    val q = graft.etl.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .filter($"l_orderkey" < 100)
      .select($"l_orderkey", $"l_quantity")
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]"),
      formatted.take(1200))
    assert(formatted.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      formatted.take(1200))
  }
}
