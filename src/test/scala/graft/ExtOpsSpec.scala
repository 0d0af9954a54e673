package graft

import graft.ext.{Multimodal, Similarity, TextOps}
import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._

class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkWindows: exact boundaries, overlap, and short-tail chunks") {
    def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc(50)), (2L, doc(51)), (3L, doc(10)), (4L, doc(95)))
      .toDF("doc_id", "text")
    val got = TextOps.chunkWindows(df, "doc_id", "text", window = 50, step = 40)
      .select("doc_id", "chunk_no", "n_words")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 50 words: exactly one full chunk; 51: second chunk covers words 41..51
    assert(got.keys.count(_._1 == 1L) === 1 && got((1L, 0L)) === 50L)
    assert(got.keys.count(_._1 == 2L) === 2 && got((2L, 1L)) === 11L)
    // <= overlap words: still one chunk
    assert(got.keys.count(_._1 == 3L) === 1 && got((3L, 0L)) === 10L)
    // 95 words: ceil((95-10)/40) = 3 chunks, last covers 81..95
    assert(got.keys.count(_._1 == 4L) === 3 && got((4L, 2L)) === 15L)
    // overlap is real: chunk k starts at word 40k+1, so words 41..50 are
    // in both chunk 0 and chunk 1 of doc 4 — pin via md5 of re-sliced text
    val md = TextOps.chunkWindows(df.filter($"doc_id" === 4L), "doc_id", "text")
      .orderBy("chunk_no").select("chunk_md5").as[String].collect()
    val words = (1 to 95).map(i => s"w$i")
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString
    assert(md.toSeq === Seq(
      h(words.slice(0, 50).mkString(" ")),
      h(words.slice(40, 90).mkString(" ")),
      h(words.slice(80, 95).mkString(" "))))
  }

  test("packWindows distributed prefix sum equals the naive global window") {
    val rnd = new scala.util.Random(3)
    val docs = (1L to 500L).map(i =>
      (i, (1 to (1 + rnd.nextInt(40))).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.packWindows(docs, "doc_id", "text", windowTokens = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // naive reference: sequential scan
    val lens = docs.orderBy("doc_id").select(size(split($"text", " ")).cast("long"))
      .as[Long].collect()
    var pos = 0L
    val want = lens.zipWithIndex.map { case (n, i) =>
      val s = pos; pos += n
      (i + 1L, s, s / 64, (s + n - 1) / 64)
    }
    assert(got.toSeq === want.toSeq)
    // windows tile the stream: consecutive docs' ranges are contiguous
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, s"first_window must be monotone: $a -> $b")
    }
  }

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("codegen'd cosine expression equals the HOF formulation bit-for-bit") {
    VectorExpressions.register(spark)
    val both = vecs.as("a").crossJoin(vecs.as("b"))
      .select(expr("graft_cosine(a.embedding, b.embedding)").as("cg"),
        Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)
      || (r.getDouble(0).isNaN && r.getDouble(1).isNaN)))
  }

  test("TopKAggregator matches window-based top-k incl. score ties") {
    import graft.functions.TopKAggregator
    val df = Seq(
      ("a", 10.0, 1L), ("a", 30.0, 2L), ("a", 20.0, 3L), ("a", 30.0, 0L), ("a", 5.0, 9L),
      ("b", 1.0, 7L)
    ).toDF("g", "score", "id")
    val got = df.groupBy($"g")
      .agg(TopKAggregator.topKIds(3)($"score", $"id").as("ids"))
      .orderBy($"g").collect()
    // ties on 30.0 break by smaller id: 0 before 2
    assert(got(0).getSeq[Long](1) == Seq(0L, 2L, 3L))
    assert(got(1).getSeq[Long](1) == Seq(7L))
  }

  test("graft_hash32 equals the built-in md5/conv formulation") {
    VectorExpressions.register(spark)
    val ss = (1 to 200).map(i => s"shingle $i ${"x" * (i % 7)} é$i")
    val bad = ss.toDF("s")
      .filter(expr("graft_hash32(s)") =!= graft.ext.Dedup.hash32(col("s")))
      .count()
    assert(bad == 0)
  }

  test("brute-force top-k ranks by cosine with id tiebreak") {
    val got = Similarity.bruteForceTopK(spark, vecs, vecs.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 3).collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L, 4L))
    assert(got.head.getAs[Double]("sim") > 0.99)
  }

  test("hyperplane LSH: parallel vectors always collide, antipodal never") {
    val lv = Seq(
      (1L, Array(1.0f, 0.2f, 0.3f)),
      (2L, Array(2.0f, 0.4f, 0.6f)),   // same direction: every bit agrees
      (4L, Array(-1.0f, -0.2f, -0.3f)) // antipodal: every bit differs
    ).toDF("vec_id", "embedding")
    val got = Similarity.lshTopK(spark, lv, lv.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 3, bits = 3, tables = 4, dims = 3)
    val ids = got.select("neighbor_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("IVF: same-list neighbors found, other-cluster vectors not scanned") {
    val vs = Seq(
      (1L, Array(1.0f, 0.1f, 0.0f)),
      (2L, Array(0.95f, 0.05f, 0.0f)),
      (3L, Array(0.0f, 0.1f, 1.0f)),
      (4L, Array(0.05f, 0.0f, 0.9f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((10L, Array(1.0f, 0.0f, 0.0f)), (20L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("cid", "cv")
    val got = Similarity.ivfTopK(spark, vs, vs.filter($"vec_id" === 1), cents,
      "vec_id", "embedding", "cid", "cv", k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got == Set(2L)) // 3 and 4 live in the other centroid's list
  }

  test("ANN recall: LSH and IVF keep most of the exact top-k") {
    val emb = graft.etl.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" % 100 === 0)
    val k = 5
    def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exact = resultSet(Similarity.bruteForceTopK(spark, emb, queries,
      "vec_id", "embedding", k))
    val lsh = resultSet(Similarity.lshTopK(spark, emb, queries,
      "vec_id", "embedding", k, bits = 4, tables = 6))
    val ivf = resultSet(Similarity.ivfTopK(spark, emb, queries,
      emb.filter($"vec_id" % 37 === 0), "vec_id", "embedding",
      "vec_id", "embedding", k, nprobe = 2))
    val lshRecall = (exact intersect lsh).size.toDouble / exact.size
    val ivfRecall = (exact intersect ivf).size.toDouble / exact.size
    // floors, not exact pins: the point is the approximation is USEFUL
    // (scanning ~1/2^bits resp. ~1/|centroids| of the corpus), not lossless
    println(s"recall@$k lsh=$lshRecall ivf=$ivfRecall")
    assert(lshRecall >= 0.35, s"LSH recall@$k degraded to $lshRecall")
    assert(ivfRecall >= 0.4, s"IVF recall@$k degraded to $ivfRecall")
  }

  test("langid heuristic: stopword-rich english beats spanish/german") {
    val df = Seq(
      (1L, "the cat and the dog sat in the garden for a while"),
      (2L, "el perro y la casa de que un gato en la calle"),
      (3L, "der hund und die katze ist ein tier mit den leuten")
    ).toDF("doc_id", "text")
    val got = TextOps.withLangId(df, "text").select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "es" && got(3L) == "de")
  }

  test("trigram langid: characteristic character n-grams pick the language") {
    val df = Seq(
      (1L, "the weather is changing and the morning brings another thing"),
      (2L, "la situación de los niños que vienen de la región"),
      (3L, "die entscheidung zu einer schnellen lösung ist eine übung")
    ).toDF("doc_id", "text")
    val got = TextOps.withLangIdTrigram(df, "text").select("doc_id", "lang_pred_tri")
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "es" && got(3L) == "de")
  }

  test("quality / tokens / fingerprint are deterministic and sane") {
    val df = Seq((1L, "the quick brown fox! 123 jumps."))
      .toDF("doc_id", "text")
    val q = TextOps.withQuality(df, "text").collect()(0)
    assert(q.getAs[Long]("n_words") == 6L)
    val quality = q.getAs[Double]("quality")
    assert(quality > 0.0 && quality <= 1.0)
    val t = TextOps.withTokenCounts(df, "text").collect()(0)
    assert(t.getAs[Long]("ws_tokens") == 6L)
    assert(t.getAs[Long]("bpe_tokens") == 8L) // 5 words + '!' + '123' + '.'
    val f1 = TextOps.withFingerprint(df, "text").collect()(0).getAs[Long]("fingerprint")
    val f2 = TextOps.withFingerprint(df, "text").collect()(0).getAs[Long]("fingerprint")
    assert(f1 == f2 && f1 >= 0L && f1 < 1000000007L)
  }

  test("multimodal: media table schema + batch feature extraction stub") {
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.toMediaTable(docs)
    assert(media.schema("media").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_len == 11L)
    assert(feats(1L).avg_byte > 0.0)
    assert(feats(2L).byte_len == 0L && feats(2L).avg_byte == 0.0)
    assert(feats(1L).header_md5.length == 32)
  }

  test("fused shingle/minhash/simhash expressions equal HOF references") {
    VectorExpressions.register(spark)
    val docs = graft.etl.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // shingle hashes (md5-32): fused vs transform(shingles, graft_hash32)
    val sh = graft.ext.Dedup.withShingles(docs, "text", 3)
      .withColumn("ref", expr("transform(__shingles, s -> graft_hash32(s))"))
      .withColumn("fused", expr("graft_shingle_hashes32(__words, 3)"))
    assert(sh.filter(expr("ref <> fused")).isEmpty)
    // shingle hashes (xxhash64): fused vs xxhash64 over the strings
    val sh64 = graft.ext.Dedup.withShingles(docs, "text", 3)
      .withColumn("ref", expr("transform(__shingles, s -> xxhash64(s))"))
      .withColumn("fused", expr("graft_shingle_hashes64(__words, 3)"))
    assert(sh64.filter(expr("ref <> fused")).isEmpty)
    // minhash signature: fused vs 8-lane HOF array_min formulation
    val sig = graft.ext.Dedup.withShingleHashes(docs, "text", 3)
      .withColumn("ref", expr(graft.ext.Dedup.signatureExprReference))
      .withColumn("fused", expr("graft_minhash_sig(__hashes)"))
    assert(sig.filter(expr("ref <> fused")).isEmpty)
    // simhash: fused vs 32-round filter/aggregate formulation
    val sim = graft.ext.Dedup.withWords(docs, "text", 1)
      .withColumn("__whashes", expr("graft_shingle_hashes32(__words, 1)"))
      .withColumn("ref",
        expr("""aggregate(sequence(0, 31), 0L, (acc, b) ->
                 acc + IF(2 * size(filter(__whashes, h -> shiftright(h, b) % 2 = 1)) > size(__whashes),
                          shiftleft(1L, b), 0L))"""))
      .withColumn("fused", expr("graft_simhash32(__whashes)"))
    assert(sim.filter(expr("ref <> fused")).isEmpty)
  }

  test("multimodal: frame sampling, resize, decode-to-vector shapes") {
    val media = Seq(
      (1L, ("a" * 300).getBytes("UTF-8")),   // 300 bytes → frames at 0,128,256
      (2L, "short".getBytes("UTF-8")),        // 5 bytes → 1 frame of 5
      (3L, Array.emptyByteArray)              // empty → no frames
    ).toDF("doc_id", "media")
    val frames = graft.ext.Multimodal.sampleFrames(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Array[Byte]](2)).toMap
    assert(frames.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)))
    assert(frames((1L, 0L)).length == 64 && frames((1L, 2L)).length == 44)
    assert(frames((2L, 0L)).length == 5)

    val resized = graft.ext.Multimodal.resizeBatch(spark, media, 8).collect()
      .map(r => r.doc_id -> r).toMap
    assert(resized.values.forall(_.media.length == 8))
    assert(resized(2L).media.take(5).toSeq == "short".getBytes("UTF-8").toSeq)
    assert(resized(2L).media.drop(5).forall(_ == 0))

    val vecs = graft.ext.Multimodal.decodeToVectors(spark, media, dim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toIndexedSeq).toMap
    assert(vecs.values.forall(_.length == 4))
    val n1 = math.sqrt(vecs(1L).map(v => v.toDouble * v).sum)
    assert(math.abs(n1 - 1.0) < 1e-5)       // L2-normalized
    assert(vecs(3L).forall(_ == 0f))        // empty payload → zero vector
  }

  test("media frames oracle assumption: corpus is pure ASCII") {
    // media_frames' DuckDB oracle slices VARCHAR where Spark slices
    // bytes; equality needs byte==char. Guard the corpus property here.
    val docs = graft.etl.Tables(spark, "/root/testdata/sf0.001", "documents")
    val nonAscii = docs.filter(length(col("text")) =!= org.apache.spark.sql.functions
      .octet_length(col("text"))).count()
    assert(nonAscii == 0)
  }

  test("connected components: known graph, path + triangle + isolates") {
    // path 1-2-3-4 (diameter 3 forces >1 propagation round), triangle
    // 10-11-12, isolated edgeless docs 20, 21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("doc_a", "doc_b")
    val docs = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L)).toDF("doc_id")
    val got = graft.ext.Dedup.clusterAssignment(docs, edges, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("cluster assignment: one canonical survivor per cluster") {
    val edges = Seq((5L, 6L), (6L, 7L), (8L, 9L)).toDF("doc_a", "doc_b")
    val docs = (5L to 9L).toDF("doc_id")
    val clusters = graft.ext.Dedup.clusterAssignment(docs, edges, "doc_id").cache()
    try {
      val survivors = clusters.filter($"doc_id" === $"cluster_id")
      // one survivor per distinct cluster, and it's the cluster min
      assert(survivors.count() == clusters.select($"cluster_id").distinct().count())
      val mins = clusters.groupBy($"cluster_id").agg(min($"doc_id").as("mn"))
        .filter($"cluster_id" =!= $"mn").count()
      assert(mins == 0)
    } finally clusters.unpersist()
  }
}
