package graft

import graft.etl.StatOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 additions: distributed exact order statistics replacing the
  * O(n)-buffer builtin `percentile` (q55/q9) and the low-NDV-partition
  * window (q56) — equivalence pins against the builtins they replace,
  * plus plan-shape assertions that the scale hazards are actually gone.
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- StatOps.percentiles ≡ builtin percentile --------------------------

  test("StatOps.percentiles matches builtin percentile bit-for-bit (grouped)") {
    val li = graft.etl.Tables(spark, sf, "lineitem")
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.0)").as("p00"),
        expr("percentile(l_extendedprice, 1.0)").as("p100"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val dist = StatOps.percentiles(li, Seq("l_returnflag"), "l_extendedprice",
        Seq("p50" -> 0.5, "p90" -> 0.9, "p00" -> 0.0, "p100" -> 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(dist === builtin) // exact == on doubles: same interpolation formula
  }

  test("StatOps.percentiles matches builtin percentile bit-for-bit (global)") {
    val o = graft.etl.Tables(spark, sf, "orders")
    val Array(b) = o.agg(expr("percentile(o_totalprice, 0.01)").as("p01"),
      expr("percentile(o_totalprice, 0.99)").as("p99")).collect()
    val Array(d) = StatOps.percentiles(o, Nil, "o_totalprice",
      Seq("p01" -> 0.01, "p99" -> 0.99)).collect()
    assert(d.getDouble(0) === b.getDouble(0) && d.getDouble(1) === b.getDouble(1))
  }

  test("StatOps ignores nulls and handles heavy ties like the builtin") {
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", null),
      ("b", 5.0), ("b", null), ("b", 5.0),
      ("c", 7.5)).toDF("g", "v")
    val builtin = df.groupBy($"g")
      .agg(expr("percentile(v, 0.25)").as("q1"), expr("percentile(v, 0.5)").as("q2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val dist = StatOps.percentiles(df, Seq("g"), "v",
        Seq("q1" -> 0.25, "q2" -> 0.5))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(dist === builtin)
  }

  test("groupedCdf: contiguous [start,end) intervals partition each group") {
    val li = graft.etl.Tables(spark, sf, "lineitem")
    val cdf = StatOps.groupedCdf(li, Seq("l_returnflag"), "l_extendedprice")
    val rows = cdf.orderBy($"l_returnflag", $"__v")
      .select($"l_returnflag", $"__c", $"__start", $"__end", $"__n")
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (g, rs) =>
      val n = rs.head.getLong(4)
      assert(rs.forall(_.getLong(4) == n), s"$g: __n not constant")
      var expect = 0L
      rs.foreach { r =>
        assert(r.getLong(2) == expect, s"$g: gap at ${r.getLong(2)} != $expect")
        assert(r.getLong(3) == r.getLong(2) + r.getLong(1))
        expect = r.getLong(3)
      }
      assert(expect == n, s"$g: intervals cover $expect of $n rows")
    }
  }

  // ---- q56 CDF-based transform ≡ real window functions -------------------

  test("q56 quantile transform matches percent_rank/ntile window semantics") {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val viaWindow = graft.etl.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round(percent_rank().over(w), 9).as("pct_rank"),
        ntile(10).over(w).cast("long").as("decile"))
    val viaCdf = graft.queries.Breadth7.q56QuantileTransform.fn(spark, sf)
    assert(viaCdf.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaCdf).isEmpty,
      "CDF-based transform diverges from the window formulation")
  }

  // ---- plan-shape: the scale hazards are gone ----------------------------

  test("q55/q9 plans carry no builtin Percentile aggregate") {
    Seq("q55_winsorize", "q9_percentiles").foreach { name =>
      val plan = graft.queries.Registry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("percentile("),
        s"$name still plans the O(n)-buffer percentile:\n${plan.take(800)}")
    }
  }

  test("mergeInvertedIndex ≡ rebuild from the union corpus (postings + stats)") {
    import graft.ext.TextOps
    val docs = graft.etl.Tables(spark, sf, "documents")
      .select($"doc_id", $"text")
    val base = TextOps.buildInvertedIndex(docs, "doc_id", "text")
    val stats = TextOps.corpusStats(base, "doc_id")
    // re-crawl 0–9 with changed text, append 10–19 under fresh ids,
    // and DELETE doc 0 via a re-crawl that tokenizes to nothing
    val delta = docs.filter($"doc_id" > 0 && $"doc_id" < 10)
      .select($"doc_id", concat(lit("zz "), $"text").as("text"))
      .unionByName(docs.filter($"doc_id" >= 10 && $"doc_id" < 20)
        .select(($"doc_id" + 500000L).as("doc_id"), $"text"))
      .unionByName(docs.filter($"doc_id" === 0)
        .select($"doc_id", lit("   ").as("text")))
    val (mergedPosts, mergedStats) =
      TextOps.mergeInvertedIndex(base, stats, delta, "doc_id", "text")
    val union = docs.filter($"doc_id" >= 20 || ($"doc_id" >= 10 && $"doc_id" < 20))
      .unionByName(docs.filter($"doc_id" > 0 && $"doc_id" < 10)
        .select($"doc_id", concat(lit("zz "), $"text").as("text")))
      .unionByName(docs.filter($"doc_id" >= 10 && $"doc_id" < 20)
        .select(($"doc_id" + 500000L).as("doc_id"), $"text"))
    val rebuiltPosts = TextOps.buildInvertedIndex(union, "doc_id", "text")
    assert(mergedPosts.exceptAll(rebuiltPosts).isEmpty &&
      rebuiltPosts.exceptAll(mergedPosts).isEmpty,
      "merged postings diverge from a rebuild")
    val Array(ms) = mergedStats.collect()
    val Array(rs) = TextOps.corpusStats(rebuiltPosts, "doc_id").collect()
    assert(ms.getLong(0) === rs.getLong(0) && ms.getLong(1) === rs.getLong(1),
      s"merged stats $ms != rebuilt $rs")
  }

  test("streamingPostings converges to the batch index build (re-crawls + deletions)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB provider (multi-column-
    // family state); restore whatever the suite had afterwards
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val stream = MemoryStream[(Long, Long, String)]
    val out = StreamingOps.streamingPostings(stream.toDS().toDF("doc_id", "seq", "text"))
    val q = out.writeStream.format("memory").queryName("sposts")
      .outputMode("append").start()
    stream.addData((1L, 1L, "Alpha beta  beta"), (2L, 1L, "gamma delta"),
      (3L, 1L, "keep me"))
    q.processAllAvailable()
    // doc 1 re-crawled (normalization exercised), doc 3 re-crawled to
    // whitespace (deletion), doc 2 gets an out-of-order STALE version
    stream.addData((1L, 2L, "alpha ALPHA new"), (3L, 2L, "   "),
      (2L, 0L, "stale ignored"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sposts")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // the sink upsert rule: keep each doc's max-seq rows; term rows of
    // that version are the doc's postings (none ⇒ deleted)
    val served = rows.groupBy(_._2).values.flatMap { rs =>
      val mx = rs.map(_._5).max
      rs.filter(r => r._5 == mx && r._1.nonEmpty)
    }.map(r => (r._1, r._2, r._3, r._4)).toSet
    val finalCorpus = Seq((1L, "alpha ALPHA new"), (2L, "gamma delta"),
      (3L, "   ")).toDF("doc_id", "text")
    val batch = graft.ext.TextOps.buildInvertedIndex(finalCorpus, "doc_id", "text")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(served === batch, s"served=$served batch=$batch")
    // the deletion is visible: doc 3's latest marker has seq 2, dl 0
    val d3 = rows.filter(r => r._2 == 3L && r._1.isEmpty).maxBy(_._5)
    assert(d3._5 === 2L && d3._4 === 0L, d3.toString)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("mergeIvfPqIndex ≡ rebuild from the union corpus (full index frame)") {
    import graft.ext.Similarity
    val emb = graft.etl.Tables(spark, sf, "embeddings")
    val cents = emb.filter($"vec_id" % 37 === 0 && $"vec_id" < 5000)
    val model = Similarity.ivfPqResidualModel(
      emb.filter($"vec_id" % 5 === 0 && $"vec_id" < 5000), cents,
      "vec_id", "embedding", "vec_id", "embedding", m = 16)
    val base = Similarity.buildIvfPqIndex(spark, emb, cents, model,
      "vec_id", "embedding", "vec_id", "embedding").localCheckpoint()
    val recrawl = emb.as("a").join(emb.as("b"), $"b.vec_id" === $"a.vec_id" + 1)
      .filter($"a.vec_id" % 10 === 3 && $"a.vec_id" < 400)
      .select($"a.vec_id".as("vec_id"), $"b.embedding".as("embedding"))
    val fresh = emb.filter($"vec_id" % 10 === 7)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val merged = Similarity.mergeIvfPqIndex(spark, base,
      recrawl.unionByName(fresh), cents, model,
      "vec_id", "embedding", "vec_id", "embedding")
    val union = emb.filter(!($"vec_id" % 10 === 3 && $"vec_id" < 400))
      .select($"vec_id", $"embedding")
      .unionByName(recrawl).unionByName(fresh)
    val rebuilt = Similarity.buildIvfPqIndex(spark, union, cents, model,
      "vec_id", "embedding", "vec_id", "embedding")
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty,
      "merged IVF-PQ index diverges from a rebuild")
  }

  test("media_phash_serve touches only the stored artifacts — no phash kernel, no CC") {
    val qe = graft.queries.Registry.queries("media_phash_serve")(spark, sf)
      .queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("byte_phash"),
      s"serve plan re-hashes the corpus:\n${plan.take(800)}")
    // pushed-down probe filter on the assignment scan, broadcast sizes
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(qe.optimizedPlan.toString.contains("doc_id IN") ||
      plan.contains("In(doc_id"), plan.take(800))
  }

  test("q56 plans no window partitioned solely by the 3-value return flag") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = graft.queries.Registry.queries("q56_quantile_transform")(spark, sf)
      .queryExecution.optimizedPlan
    // windows keyed only on the 3-value flag are fine over tiny
    // aggregated frames (the prefix-sum offsets); the hazard is one
    // directly over the un-aggregated fact table
    val lowNdv = plan.collect {
      case w: LWindow if w.partitionSpec.forall {
        case a: AttributeReference => a.name == "l_returnflag"
        case _ => false
      } && w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(lowNdv.isEmpty,
      s"q56 still sorts the fact table into 3 reducer partitions: $lowNdv")
  }
}
