package graft

import org.apache.spark.sql.functions._

/** Round-12 pins: multi-pass ER blocking (the VERDICT-r11 item-1
  * recall-0 fix) and the round's headline slices as they land.
  */
class Round12Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("multiPassNamePairs: each pass covers the other's blind spot; dedup before verify") {
    import spark.implicits._
    // serial-ID-style fixture in miniature: a PREFIX typo (invisible to
    // a prefix key, visible to a suffix key) and a SUFFIX typo
    // (vice-versa). Either single pass has recall 1/2 here; the union
    // must find both.
    val recs = Seq(
      (1L, "Customer#111"), (2L, "Xustomer#111"), // prefix typo of 1
      (3L, "Customer#345"), (4L, "Customer#346")) // suffix typo of 3
      .toDF("id", "name")
    val suffixKey = expr("right(name, 4)")
    val prefixKey = expr("substring(name, 1, length(name) - 1)")
    def pairsOf(keys: Seq[org.apache.spark.sql.Column]): Set[(Long, Long)] =
      graft.ext.EntityOps.multiPassNamePairs(recs, "id", "name", keys,
          maxDist = 1, maxBlock = 8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairsOf(Seq(suffixKey)) === Set((1L, 2L)))
    assert(pairsOf(Seq(prefixKey)) === Set((3L, 4L)))
    assert(pairsOf(Seq(suffixKey, prefixKey)) === Set((1L, 2L), (3L, 4L)))
    // a pair proposed by BOTH passes (identical names share every key)
    // is emitted once — the distinct runs before the verify
    val dup = Seq((1L, "same"), (2L, "same")).toDF("id", "name")
    val out = graft.ext.EntityOps.multiPassNamePairs(dup, "id", "name",
      Seq(expr("right(name, 2)"), expr("substring(name, 1, 2)")),
      maxDist = 1, maxBlock = 8).collect()
    assert(out.length === 1, s"dup-proposed pair must verify once, got ${out.length}")
  }

  test("multiPassNamePairs: per-pass caps are independent (a block oversized in one pass still links via the other)") {
    import spark.implicits._
    // 10 records share the suffix key 'AAA' (oversized at cap 8) but
    // split across distinct prefix keys; the one real near-pair links
    // through the prefix pass even though the suffix pass dropped it
    val recs = ((1 to 8).map(i => (i.toLong, f"zz$i%02d-AAA")) ++
      Seq((9L, "yy01-AAA"), (10L, "yy02-AAA"))).toDF("id", "name")
    val pairs = graft.ext.EntityOps.multiPassNamePairs(recs, "id", "name",
        Seq(expr("right(name, 3)"), expr("substring(name, 1, 2)")),
        maxDist = 2, maxBlock = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // suffix pass: block AAA has 10 > 8 records -> dropped entirely.
    // prefix pass: block 'yy' has exactly the two near records; block
    // 'zz' has 8 records all within dist 2 of each other (28 pairs).
    assert(pairs.contains((9L, 10L)),
      s"prefix pass must recover the pair the oversized suffix block dropped: $pairs")
    assert(pairs.size === 29, s"expected 28 zz-block pairs + 1 yy pair, got ${pairs.size}")
  }

  test("minhash incremental march == one-shot candidate pairs, both batch orders, delta-only shingling") {
    import graft.ext.Dedup
    // same shape as the query fixture (originals + perturbed copies so
    // near-dup candidates exist), built inline — augmentedDocs is
    // package-private to the query layer
    val d0 = graft.etl.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val docs = d0.unionByName(
      d0.select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("xx "), col("text")).as("text")))
    val split = graft.ext.Dedup.hash32(col("doc_id").cast("string")) % 2
    val b1 = docs.filter(split === 0)
    val b2 = docs.filter(split =!= 0)
    // the state of a batch is built from THAT batch's frame alone —
    // structurally, the delta march can never re-shingle old docs
    val s1 = Dedup.buildBandIndex(b1, "doc_id", "text").localCheckpoint()
    val s2 = Dedup.buildBandIndex(b2, "doc_id", "text").localCheckpoint()
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      import spark.implicits._
      df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .as[(Long, Long)].collect().toSet
    }
    val oneShot = pairsOf(Dedup.minhashCandidatePairs(docs, "doc_id", "text"))
    val march12 = pairsOf(Dedup.minhashPairsOfBatch(s1.limit(0), s1, "doc_id")) ++
      pairsOf(Dedup.minhashPairsOfBatch(s1, s2, "doc_id"))
    val march21 = pairsOf(Dedup.minhashPairsOfBatch(s2.limit(0), s2, "doc_id")) ++
      pairsOf(Dedup.minhashPairsOfBatch(s2, s1, "doc_id"))
    assert(oneShot.nonEmpty, "fixture must produce near-dup candidates")
    assert(march12 === oneShot, "batch-1-then-2 march must equal the one-shot pairs")
    assert(march21 === oneShot, "merge order must not matter (mergeable state)")
  }

  test("CentroidTopK kernel == transform/array_sort reference on random inputs (incl. ties, NaN, float)") {
    import org.apache.spark.sql.graft.PlanDf
    import spark.implicits._
    // deterministic pseudo-random vectors; a duplicated centroid forces
    // exact negsim ties (cid must break them), an all-zero query forces
    // the NaN path, and float input exercises the elemIsFloat branch
    val dims = 8
    def vec(seed: Int): Seq[Double] =
      (0 until dims).map(j => math.sin(seed * 31 + j * 7).toDouble)
    val cents: Array[(Long, Seq[Double])] =
      ((1 to 40).map(i => (i.toLong, vec(i))) :+ (41L, vec(3))).toArray
    val rows = ((1 to 30).map(i => (i.toLong, vec(100 + i))) :+
      (31L, Seq.fill(dims)(0.0))).toDF("id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    def run(df: org.apache.spark.sql.DataFrame, vcol: org.apache.spark.sql.Column,
        k: Int, kernel: Boolean): Map[Long, Seq[(Double, Long)]] = {
      val scored =
        if (kernel)
          PlanDf.column(graft.functions.CentroidTopK(PlanDf.expression(vcol),
            cents.map(_._1), cents.map(_._2.toArray), k))
        else
          slice(array_sort(transform(typedLit(cents.toSeq), c =>
            struct(
              (-round(PlanDf.column(graft.functions.CosineSimilarity(
                PlanDf.expression(vcol),
                PlanDf.expression(c.getField("_2")))), 9)).as("negsim"),
              c.getField("_1").as("cid")))), 1, k)
      df.select(col("id"), scored.as("s")).collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getDouble(0), x.getLong(1))).toSeq)
        .toMap
    }
    for (k <- Seq(1, 5, 15)) {
      val kr = run(rows, col("v"), k, kernel = true)
      val rf = run(rows, col("v"), k, kernel = false)
      // NaN != NaN under ==, so compare through a total-order key
      def key(m: Map[Long, Seq[(Double, Long)]]) =
        m.view.mapValues(_.map { case (d, c) =>
          (java.lang.Double.doubleToLongBits(d), c) }).toMap
      assert(key(kr) === key(rf), s"kernel != reference at k=$k")
    }
    // float-typed input takes the same ordering
    val fRows = rows.withColumn("vf", col("v").cast("array<float>"))
    val kf = run(fRows, col("vf"), 5, kernel = true)
    val rff = run(fRows, col("vf"), 5, kernel = false)
    def key(m: Map[Long, Seq[(Double, Long)]]) =
      m.view.mapValues(_.map { case (d, c) =>
        (java.lang.Double.doubleToLongBits(d), c) }).toMap
    assert(key(kf) === key(rff), "kernel != reference on float input")
  }
}
