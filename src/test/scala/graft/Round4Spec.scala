package graft

import graft.etl.SampleOps
import graft.ext.{Similarity, TextOps}
import org.apache.spark.sql.functions._

class Round4Spec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

  test("kmeansAssign: nearest centroid by cosine, centroid-id tiebreak") {
    val v = vecs(
      1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(0.0, 1.0, 0.1),
      3L -> Seq(0.7, 0.7, 0.0)) // equidistant from both centroids → lower cid
    val c = vecs(10L -> Seq(1.0, 0.0, 0.0), 20L -> Seq(0.0, 1.0, 0.0))
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val got = Similarity.kmeansAssign(spark, v, c, "vec_id", "embedding", "cid", "cv")
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 10L, 2L -> 20L, 3L -> 10L))
  }

  test("kmeansAssign is scan-side: zero exchanges, zero joins in the plan") {
    val v = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    val c = vecs(10L -> Seq(1.0, 0.0), 20L -> Seq(0.0, 1.0))
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val plan = Similarity.kmeansAssign(spark, v, c, "vec_id", "embedding", "cid", "cv")
      .queryExecution.executedPlan
    val bad = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(bad.isEmpty, s"expected a pure projection, got:\n$plan")
  }

  test("kmeansLloydRound: centroids move to assigned means, vectors reassign") {
    // Seed centroids sit badly: c10 at x-axis, c20 at y-axis. Vectors
    // cluster tightly around (1,1,0) and (0,0,1); after one round the
    // recomputed centroids are the cluster means and the (0,0,1) group —
    // initially split — lands together.
    val v = vecs(
      1L -> Seq(1.0, 0.9, 0.0), 2L -> Seq(0.9, 1.0, 0.0),
      3L -> Seq(0.0, 0.1, 1.0), 4L -> Seq(0.1, 0.0, 1.0))
    val c = vecs(10L -> Seq(1.0, 0.0, 0.0), 20L -> Seq(0.0, 0.0, 1.0))
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val r = Similarity.kmeansLloydRound(spark, v, "vec_id", "embedding", c, "cid", "cv")
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L))
  }

  test("kmeansConverge: reaches a fixpoint; recovers planted clusters from bad seeds") {
    // two tight planted clusters around (1,1,0) and (0,0,1); seeds both
    // start inside cluster A — convergence must still separate them
    val v = vecs(
      1L -> Seq(1.0, 0.9, 0.0), 2L -> Seq(0.9, 1.0, 0.1), 3L -> Seq(1.0, 1.0, 0.0),
      4L -> Seq(0.0, 0.1, 1.0), 5L -> Seq(0.1, 0.0, 0.9), 6L -> Seq(0.0, 0.0, 1.0))
    val c = vecs(10L -> Seq(1.0, 0.8, 0.0), 20L -> Seq(0.8, 1.0, 0.3))
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val got = Similarity.kmeansConverge(spark, v, c, "vec_id", "embedding",
        "cid", "cv", maxIters = 10)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val clustersOfA = Set(got(1L), got(2L), got(3L))
    val clustersOfB = Set(got(4L), got(5L), got(6L))
    assert(clustersOfA.size == 1 && clustersOfB.size == 1 &&
      clustersOfA != clustersOfB, got.toString)
  }

  test("redactPii: emails and phones replaced, counts reported") {
    val df = Seq(
      (1L, "write to Alice.Smith+x@sub.example.org today"),
      (2L, "call +1-555-0147 or 44-555-123-4567 now"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val got = TextOps.redactPii(df, "doc_id", "text")
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 1L, 0L, "write to <EMAIL> today")))
    assert(got(1) === ((2L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(got(2) === ((3L, 0L, 0L, "nothing here")))
  }

  test("chunkDupStats: corpus-wide duplicated chunks counted per doc") {
    val shared = "a b c d" // one shared 4-word chunk
    val df = Seq(
      (1L, s"$shared e f g h"),      // chunks: shared, "e f g h"
      (2L, s"$shared x y z w"),      // chunks: shared, "x y z w"
      (3L, "p q r")).toDF("doc_id", "text") // <4 words → no chunks, absent
    val got = TextOps.chunkDupStats(df, "doc_id", "text", chunkWords = 4)
      .select("doc_id", "n_chunks", "n_dup_chunks")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 2L, 1L), (2L, 2L, 1L)))
  }

  test("bfsLayers: first-discovery distance; exhausted frontier is a no-op") {
    // path 1-2-3-4-5 (diameter 4) plus an unreachable triangle 10-11-12;
    // a diamond 2-6, 6-4 gives node 4 two discovery paths — min wins
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L), (6L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val src = Seq(1L).toDF("node")
    val got = graft.ext.GraphOps.bfsLayers(edges, src, maxDepth = 6)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2, 4L -> 3, 5L -> 4))
  }

  test("funnel: strictly-after ordering, greedy-earliest completion") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val e = Seq(
      // user 1: full ordered funnel
      (1L, "a", t(10)), (1L, "b", t(20)), (1L, "c", t(30)),
      // user 2: b BEFORE a → never completes b
      (2L, "b", t(5)), (2L, "a", t(10)),
      // user 3: b at the same instant as a → strictly-after excludes it
      (3L, "a", t(10)), (3L, "b", t(10)),
      // user 4: greedy-earliest — first b after a gates c, earlier c ignored
      (4L, "a", t(10)), (4L, "c", t(15)), (4L, "b", t(20)), (4L, "c", t(25)))
      .toDF("user_id", "event_type", "ts")
    val got = graft.etl.EventOps.funnel(e, "user_id", "event_type", "ts",
        Seq("a", "b", "c"))
      .select("stage", "user_id").as[(String, Long)].collect().toSet
    assert(got === Set(
      ("1_a", 1L), ("2_b", 1L), ("3_c", 1L),
      ("1_a", 2L),
      ("1_a", 3L),
      ("1_a", 4L), ("2_b", 4L), ("3_c", 4L)))
  }

  test("ppsSystematicSample matches the single-partition reference; heavy rows certain") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map(i =>
      (i, if (i == 137L) 50000L else 1L + rnd.nextInt(100)))
    val df = rows.toDF("doc_id", "n_chars")
    val got = SampleOps.ppsSystematicSample(df, "doc_id", "n_chars", n = 20)
      .select("doc_id").as[Long].collect().toSet
    // naive reference: same stride rule over an in-memory prefix sum
    val total = rows.map(_._2).sum
    val stride = total / 20
    var cum = 0L
    val want = rows.flatMap { case (id, w) =>
      val s = cum; cum += w
      if (s / stride < cum / stride) Some(id) else None
    }.toSet
    assert(got === want)
    assert(got.contains(137L)) // weight >> stride → certainty selection
    // the heavy row absorbs the boundaries it spans, so the sample is
    // smaller than n but never larger
    assert(got.size <= 20 && got.size >= 5)
  }
}
