package graft

import graft.etl.CatalogOps
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CatalogStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("catalog: entity filter on {layer}_{entity}.{ext} names + top-1 latest") {
    val meta = Seq(
      ("f1", "raw_creditos.csv", "file", "2024-01-01 10:00:00"),
      ("f2", "raw_creditos.csv", "file", "2024-03-01 10:00:00"),
      ("f3", "raw_radicados.csv", "file", "2024-02-01 10:00:00"),
      ("f4", "notes.txt", "file", "2024-04-01 10:00:00")
    ).toDF("id", "name", "mimeType", "ct")
      .withColumn("createdTime", to_timestamp(col("ct")))
    val creditos = CatalogOps.filterByEntity(meta, "creditos")
    assert(creditos.count() == 2)
    val top = CatalogOps.latest(creditos).collect()(0)
    assert(top.getAs[String]("id") == "f2") // newest wins (O1)
  }

  test("catalog: listFiles over a real directory") {
    val dir = java.nio.file.Files.createTempDirectory("cat_")
    java.nio.file.Files.write(dir.resolve("raw_creditos.csv"), "x".getBytes)
    java.nio.file.Files.write(dir.resolve("raw_radicados.csv"), "y".getBytes)
    val meta = CatalogOps.listFiles(spark, dir.toString)
    assert(meta.count() == 2)
    assert(CatalogOps.filterByName(meta, "raw_creditos.csv").count() == 1)
  }

  test("streaming change feed: stream-static join emits audit rows per batch") {
    implicit val ctx = spark.sqlContext
    val published = Seq((1L, "A", 100L), (2L, "B", 200L)).toDF("id", "v1", "v2")
    val stream = MemoryStream[(Long, String, Long)]
    val feed = StreamingOps.changeFeed(
      stream.toDF().toDF("id", "v1", "v2"), published, "id", Seq("v1", "v2"),
      fuenteLog = "stream/test", runId = "run-s")
    val q = feed.writeStream.format("memory").queryName("feed").outputMode("append").start()
    stream.addData((1L, "A", 100L), (2L, "B_mod", 200L), (9L, "X", 1L))
    q.processAllAvailable()
    val got = spark.table("feed").collect()
    q.stop()
    assert(got.length == 1) // only id=2 changed; id=9 unmatched; id=1 unchanged
    assert(got(0).getAs[String]("entity_id") == "2")
    assert(got(0).getAs[String]("v1") == "B_mod" && got(0).getAs[String]("v1_modeled") == "B")
  }

  test("stream-stream interval join matches within the delay bound only") {
    implicit val ctx = spark.sqlContext
    val l = MemoryStream[(Long, java.sql.Timestamp)]
    val r = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingOps.streamStreamJoin(
      l.toDF().toDF("k", "ts"), r.toDF().toDF("k", "ts"),
      "k", "ts", maxDelay = "5 minutes", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    l.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
    r.addData(
      (1L, ts("2024-01-01 00:03:00")),  // same key, within 5 min → match
      (1L, ts("2024-01-01 00:09:00")),  // same key, too late → no match
      (2L, ts("2023-12-31 23:59:00")),  // same key, before left → no match
      (3L, ts("2024-01-01 00:01:00"))) // unseen key → no match
    q.processAllAvailable()
    val got = spark.table("ssj").collect()
    q.stop()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("l_key") == 1L)
    assert(got(0).getAs[java.sql.Timestamp]("r_ts") == ts("2024-01-01 00:03:00"))
  }

  test("stream-stream LEFT OUTER interval join: unmatched rows emit nulls after watermark") {
    implicit val ctx = spark.sqlContext
    val l = MemoryStream[(Long, java.sql.Timestamp)]
    val r = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamingOps.streamStreamJoin(
      l.toDF().toDF("k", "ts"), r.toDF().toDF("k", "ts"),
      "k", "ts", maxDelay = "5 minutes", watermark = "10 minutes",
      joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssjlo").outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    l.addData((1L, ts("2024-01-01 00:00:00")), (5L, ts("2024-01-01 00:00:00")))
    r.addData((1L, ts("2024-01-01 00:03:00")))
    q.processAllAvailable()
    // push the watermark far past k=5's join-window close so its
    // null-padded row must flush
    l.addData((9L, ts("2024-01-01 01:00:00")))
    r.addData((9L, ts("2024-01-01 01:00:00")))
    q.processAllAvailable()
    // one more watermark advance: outer results flush one batch later
    l.addData((10L, ts("2024-01-01 02:00:00")))
    r.addData((10L, ts("2024-01-01 02:00:00")))
    q.processAllAvailable()
    val got = spark.table("ssjlo").collect()
    q.stop()
    val matched = got.filter(row => !row.isNullAt(row.fieldIndex("r_ts")))
    val unmatched = got.filter(row => row.isNullAt(row.fieldIndex("r_ts")))
    assert(matched.exists(row => row.getAs[Long]("l_key") == 1L &&
      row.getAs[java.sql.Timestamp]("r_ts") == ts("2024-01-01 00:03:00")))
    assert(unmatched.exists(row => row.getAs[Long]("l_key") == 5L),
      s"expected a null-padded row for k=5, got: ${got.mkString("; ")}")
  }

  test("file-source streaming e2e: jsonl directory → parquet sink with checkpoint") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("fstream_")
    val (in, out, chk) = (s"$root/in", s"$root/out", s"$root/chk")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def writeBatch(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    writeBatch("b0.jsonl", Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "second doc"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).json(in)
      .withColumn("n_chars", length(col("text")).cast("long"))
    val q = stream.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()
    q.processAllAvailable()
    // a second file lands later; the checkpoint makes ingestion incremental
    writeBatch("b1.jsonl", Seq("""{"doc_id": 3, "text": "third"}"""))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out).orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_chars")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 11L), (2L, 10L), (3L, 5L)))
  }

  test("transformWithState running profile with RocksDB state store") {
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[StreamingOps.ProfileIn]
      val out = StreamingOps.runningProfile(stream.toDS())
      val q = out.writeStream.format("memory").queryName("profiles")
        .outputMode("update").start()
      stream.addData(StreamingOps.ProfileIn(1L, 2.0), StreamingOps.ProfileIn(1L, 3.0),
        StreamingOps.ProfileIn(2L, 10.0))
      q.processAllAvailable()
      stream.addData(StreamingOps.ProfileIn(1L, 5.0))
      q.processAllAvailable()
      q.stop()
      // update mode: latest row per key reflects accumulated state
      val last = spark.table("profiles").groupBy($"user_id")
        .agg(max($"n_events").as("n"), max($"total_value").as("v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(last(1L) == ((3L, 10.0)))
      assert(last(2L) == ((1L, 10.0)))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming session_window: sessions finalize once the watermark passes their end") {
    implicit val ctx = spark.sqlContext
    val m = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = m.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n_events"))
    val q = agg.writeStream.format("memory").queryName("sess_sw").outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    m.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")),
      (1L, ts("2024-01-01 01:00:00")))
    q.processAllAvailable()
    m.addData((9L, ts("2024-01-01 06:00:00"))) // watermark push
    q.processAllAvailable()
    val got = spark.table("sess_sw").collect()
      .map(row => (row.getAs[Long]("user_id"),
        row.getAs[java.sql.Timestamp]("start"), row.getAs[Long]("n_events"))).toSet
    q.stop()
    // two finalized sessions for user 1: [00:00, 00:10+30) with 2 events,
    // [01:00, 01:30) with 1; user 9's session is still open
    assert(got == Set((1L, ts("2024-01-01 00:00:00"), 2L),
      (1L, ts("2024-01-01 01:00:00"), 1L)), got.toString)
  }

  test("streaming windowed rates with watermark") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val rates = StreamingOps.eventRates(
      stream.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", "10 minutes", "10 minutes", "5 minutes")
    val q = rates.writeStream.format("memory").queryName("rates").outputMode("complete").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    stream.addData(
      (ts("2024-01-01 00:01:00"), "click", 1.0),
      (ts("2024-01-01 00:02:00"), "click", 2.0),
      (ts("2024-01-01 00:11:00"), "view", 5.0))
    q.processAllAvailable()
    val got = spark.table("rates").collect()
    q.stop()
    assert(got.length == 2)
    val click = got.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("n_events") == 2L && click.getAs[Double]("total_value") == 3.0)
  }

  test("stateful sessionization with flatMapGroupsWithState") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.StreamingOps.{Event, SessionOut}
    val stream = MemoryStream[Event]
    val sessions = StreamingOps.sessionizeStateful(stream.toDS(), gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("sess").outputMode("append").start()
    def ev(u: Long, s: String) = Event(u, java.sql.Timestamp.valueOf(s))
    // two bursts for user 1 separated by > 30 min: first closes when the
    // second arrives
    stream.addData(ev(1L, "2024-01-01 00:00:00"), ev(1L, "2024-01-01 00:10:00"))
    q.processAllAvailable()
    stream.addData(ev(1L, "2024-01-01 02:00:00"))
    q.processAllAvailable()
    val got = spark.table("sess").as[SessionOut].collect()
    q.stop()
    assert(got.length == 1)
    assert(got(0).user_id == 1L && got(0).n_events == 2)
    assert(got(0).session_end.toString.startsWith("2024-01-01 00:10"))
  }

  test("streaming dedup within watermark") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long, String)]
    val dd = StreamingOps.streamingDedup(
      stream.toDF().toDF("ts", "doc_id", "text"), "ts", Seq("doc_id"), "10 minutes")
    val q = dd.writeStream.format("memory").queryName("dd").outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    stream.addData(
      (ts("2024-01-01 00:01:00"), 1L, "a"),
      (ts("2024-01-01 00:02:00"), 1L, "a dup"),
      (ts("2024-01-01 00:03:00"), 2L, "b"))
    q.processAllAvailable()
    val got = spark.table("dd").collect()
    q.stop()
    assert(got.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L))
  }

  test("foreachBatch merge sink: each batch merges against the latest version") {
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("msink_").toString
    val published0 = Seq(("1", "A", "x"), ("2", "B", "y"), ("3", "C", "z"))
      .toDF("id", "status", "attr")
    val stream = MemoryStream[(String, String, String)]
    val q = StreamingOps.mergeSink(stream.toDF().toDF("id", "status", "attr"),
      published0, "id", Seq("status", "attr"), s"$root/out", s"$root/chk")
    // batch 0: id=2 modified, id=9 new, id=1 unchanged (id=3 absent from
    // the incoming snapshot → dropped, full-snapshot merge semantics)
    stream.addData(("1", "A", "x"), ("2", "B_mod", "y"), ("9", "N", "n"))
    q.processAllAvailable()
    val v0 = spark.read.parquet(s"$root/out/v0")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(v0 == Map("1" -> ("A", "x"), "2" -> ("B_mod", "y"), "9" -> ("N", "n")))
    // batch 1 merges against v0, not published0: id=9 now unchanged,
    // id=1 modified
    stream.addData(("1", "A2", "x"), ("2", "B_mod", "y"), ("9", "N", "n"))
    q.processAllAvailable()
    q.stop()
    val v1 = spark.read.parquet(s"$root/out/v1")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(v1 == Map("1" -> ("A2", "x"), "2" -> ("B_mod", "y"), "9" -> ("N", "n")))
    // retention maintenance over the sink's version history: keep=1
    // expires v0, the serving version v1 survives untouched
    val rep = graft.etl.LayoutOps.vacuumVersions(spark, s"$root/out", keep = 1)
      .collect().map(r => r.getAs[Long]("version") -> r.getAs[String]("action")).toMap
    assert(rep === Map(0L -> "expired", 1L -> "kept"))
    assert(!new java.io.File(s"$root/out/v0").exists())
    val after = spark.read.parquet(s"$root/out/v1")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(after === v1)
  }

  test("merge sink retry ignores its own partial version directory") {
    // Crash-retry contract: if a previous attempt of batch N left a
    // partially-written (no _SUCCESS) v<N> behind, the retry must merge
    // against v<N-1>, not its own incomplete output.
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("msink_retry_").toString
    val published0 = Seq(("1", "A", "x")).toDF("id", "status", "attr")
    val stream = MemoryStream[(String, String, String)]
    val q1 = StreamingOps.mergeSink(stream.toDF().toDF("id", "status", "attr"),
      published0, "id", Seq("status", "attr"), s"$root/out", s"$root/chk")
    stream.addData(("1", "A", "x"), ("2", "B", "y"))
    q1.processAllAvailable()
    q1.stop()
    // Simulate a crashed attempt of batch 1: a v1 directory exists with
    // a garbage part file and no _SUCCESS marker. Reading it would blow
    // up (or worse, silently merge against partial data).
    val partial = new java.io.File(s"$root/out/v1")
    assert(partial.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/out/v1/part-00000.snappy.parquet"),
      "not a parquet footer".getBytes)
    // Restart on the same checkpoint: the next batch is batchId=1 again.
    val q2 = StreamingOps.mergeSink(stream.toDF().toDF("id", "status", "attr"),
      published0, "id", Seq("status", "attr"), s"$root/out", s"$root/chk")
    stream.addData(("1", "A", "x"), ("2", "B_mod", "y"))
    q2.processAllAvailable()
    q2.stop()
    val v1 = spark.read.parquet(s"$root/out/v1")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(v1 == Map("1" -> ("A", "x"), "2" -> ("B_mod", "y")))
  }

  test("streaming as-of join: lefts finalize at watermark with latest prior right") {
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val l = MemoryStream[(Long, java.sql.Timestamp)]
      val r = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val out = StreamingOps.streamingAsOf(l.toDS(), r.toDS(), delay = "5 minutes")
      val q = out.writeStream.format("memory").queryName("sasof")
        .outputMode("append").start()
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // batch 1: two lefts buffered; rights arrive OUT OF ORDER (00:08
      // before 00:02) — nothing may emit yet (watermark still behind)
      l.addData((1L, ts("2024-01-01 00:10:00")), (2L, ts("2024-01-01 00:10:00")))
      r.addData((1L, ts("2024-01-01 00:08:00"), 8.0))
      q.processAllAvailable()
      r.addData((1L, ts("2024-01-01 00:02:00"), 2.0)) // late but pre-watermark
      q.processAllAvailable()
      assert(spark.table("sasof").isEmpty,
        "lefts must not finalize before the watermark passes their ts")
      // advance the watermark far past both lefts on BOTH inputs (the
      // union's watermark is the min over the two)
      l.addData((9L, ts("2024-01-01 01:00:00")))
      r.addData((9L, ts("2024-01-01 01:00:00"), 0.0))
      q.processAllAvailable()
      // one more nudge: timer firing needs the next microbatch after
      // the watermark update in some planners
      l.addData((9L, ts("2024-01-01 02:00:00")))
      r.addData((9L, ts("2024-01-01 02:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("sasof").collect()
        .map(row => (row.getAs[Long]("k"), row.getAs[java.sql.Timestamp]("l_ts"),
          Option(row.getAs[java.sql.Timestamp]("r_ts")),
          Option(row.getAs[Any]("r_v")))).toSeq
      q.stop()
      // k=1: latest right <= 00:10 is 00:08 (the out-of-order 00:02 must
      // NOT shadow it); k=2: no right at all → null-padded (left outer)
      assert(got.exists(g => g._1 == 1L && g._2 == ts("2024-01-01 00:10:00") &&
        g._3.contains(ts("2024-01-01 00:08:00")) && g._4.contains(8.0)), got.toString)
      assert(got.exists(g => g._1 == 2L && g._3.isEmpty && g._4.isEmpty), got.toString)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming as-of join: watermark eviction keeps exactly the still-matchable rights") {
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val l = MemoryStream[(Long, java.sql.Timestamp)]
      val r = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val out = StreamingOps.streamingAsOf(l.toDS(), r.toDS(), delay = "1 minute")
      val q = out.writeStream.format("memory").queryName("sasof2")
        .outputMode("append").start()
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // phase 1: rights 00:01 and 00:05; left at 00:06 finalizes once the
      // watermark passes it, matching 00:05
      r.addData((7L, ts("2024-01-01 00:01:00"), 1.0), (7L, ts("2024-01-01 00:05:00"), 5.0))
      l.addData((7L, ts("2024-01-01 00:06:00")))
      q.processAllAvailable()
      l.addData((9L, ts("2024-01-01 00:30:00"))); r.addData((9L, ts("2024-01-01 00:30:00"), 0.0))
      q.processAllAvailable()
      l.addData((9L, ts("2024-01-01 00:31:00"))); r.addData((9L, ts("2024-01-01 00:31:00"), 0.0))
      q.processAllAvailable()
      // phase 2: a NEW left at 00:40 still matches the surviving 00:05
      // right (eviction must keep the latest right at/below the watermark)
      l.addData((7L, ts("2024-01-01 00:40:00")))
      q.processAllAvailable()
      l.addData((9L, ts("2024-01-01 01:30:00"))); r.addData((9L, ts("2024-01-01 01:30:00"), 0.0))
      q.processAllAvailable()
      l.addData((9L, ts("2024-01-01 01:31:00"))); r.addData((9L, ts("2024-01-01 01:31:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("sasof2").collect()
        .map(row => (row.getAs[Long]("k"), row.getAs[java.sql.Timestamp]("l_ts"),
          Option(row.getAs[java.sql.Timestamp]("r_ts")))).toSeq
      q.stop()
      assert(got.exists(g => g._1 == 7L && g._2 == ts("2024-01-01 00:06:00") &&
        g._3.contains(ts("2024-01-01 00:05:00"))), got.toString)
      assert(got.exists(g => g._1 == 7L && g._2 == ts("2024-01-01 00:40:00") &&
        g._3.contains(ts("2024-01-01 00:05:00"))), got.toString)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming near-dedup proposes the same pairs as batch LSH") {
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dupText = "the quick brown fox jumps over the lazy dog again and again today"
      val otherText = "completely unrelated words about spark shuffles exchanges and joins"
      val stream = MemoryStream[(Long, String)]
      val out = graft.streaming.StreamingOps.streamingNearDedup(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text")
      val q = out.writeStream.format("memory").queryName("ndd")
        .outputMode("append").start()
      // batch 1 seeds the buckets; the duplicate arrives in a LATER batch
      // so the match must come from state, not intra-batch collision
      stream.addData((1L, dupText), (3L, otherText))
      q.processAllAvailable()
      assert(spark.table("ndd").isEmpty, "no pairs before a duplicate arrives")
      stream.addData((2L, dupText))
      q.processAllAvailable()
      q.stop()
      // one pair per colliding band: distinct at the sink (as documented)
      val got = spark.table("ndd").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 2L)), got.toString)
      // equivalence: batch LSH over the same corpus proposes the same set
      val batch = graft.ext.Dedup.minhashCandidatePairs(
          Seq((1L, dupText), (2L, dupText), (3L, otherText)).toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === got)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming near-dedup under in-order arrival equals the batch band-star frame") {
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // A 3-doc duplicate cluster: the star frame {(1,2),(1,4)} differs
      // from the full candidate frame (which also pairs (2,4)) — so this
      // pins the STAR semantics, not just "some pairs came out".
      val dupText = "the quick brown fox jumps over the lazy dog again and again today"
      val otherText = "completely unrelated words about spark shuffles exchanges and joins"
      val corpus = Seq((1L, dupText), (2L, dupText), (3L, otherText), (4L, dupText))
      val stream = MemoryStream[(Long, String)]
      val out = graft.streaming.StreamingOps.streamingNearDedup(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text")
      val q = out.writeStream.format("memory").queryName("nddstar")
        .outputMode("append").start()
      // in-order arrival: one doc per micro-batch, ascending id — the
      // regime dedup_stream_pairs (Dedup.bandStarPairs) models
      corpus.foreach { d => stream.addData(d); q.processAllAvailable() }
      q.stop()
      val streamed = spark.table("nddstar").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.ext.Dedup.bandStarPairs(
          corpus.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch, s"streamed=$streamed batch=$batch")
      assert(streamed === Set((1L, 2L), (1L, 4L)), streamed.toString)
      // and the star frame is strictly smaller than the candidate frame
      val full = graft.ext.Dedup.minhashCandidatePairs(
          corpus.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(full === streamed + ((2L, 4L)), full.toString)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming funnel: out-of-order arrivals, strictly-after machine, batch equivalence") {
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
      val out = StreamingOps.streamingFunnel(
        stream.toDS().toDF("user_id", "ts", "event_type"),
        "user_id", "event_type", "ts", Seq("a", "b", "c"), delay = "30 minutes")
      val q = out.writeStream.format("memory").queryName("sfunnel")
        .outputMode("append").start()
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // user 1 arrives OUT OF ORDER: b(00:20) lands a batch before
      // a(00:10); user 2's b precedes its a in EVENT time (never stage 2)
      val rows = Seq(
        (1L, ts("2024-01-01 00:20:00"), "b"),
        (2L, ts("2024-01-01 00:05:00"), "b"),
        (2L, ts("2024-01-01 00:10:00"), "a"))
      stream.addData(rows.head)
      q.processAllAvailable()
      val late = Seq(
        (1L, ts("2024-01-01 00:10:00"), "a"),
        (1L, ts("2024-01-01 00:30:00"), "c"),
        (9L, ts("2024-01-01 00:25:00"), "x")) // non-funnel event drops
      stream.addData(late ++ rows.tail: _*)
      q.processAllAvailable()
      assert(spark.table("sfunnel").isEmpty,
        "nothing may finalize before the watermark passes the events")
      // push the watermark far past everything, twice (timer fires on
      // the microbatch after the watermark update)
      stream.addData((8L, ts("2024-01-01 02:00:00"), "a"))
      q.processAllAvailable()
      stream.addData((8L, ts("2024-01-01 03:00:00"), "a"))
      q.processAllAvailable()
      val got = spark.table("sfunnel").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage"),
          r.getAs[java.sql.Timestamp]("completed_at"))).toSet
      q.stop()
      assert(got.contains((1L, 1, ts("2024-01-01 00:10:00"))), got.toString)
      assert(got.contains((1L, 2, ts("2024-01-01 00:20:00"))), got.toString)
      assert(got.contains((1L, 3, ts("2024-01-01 00:30:00"))), got.toString)
      assert(!got.exists(g => g._1 == 2L && g._2 == 2), got.toString)
      // batch equivalence on users 1 and 2 (user 8's watermark-nudge rows
      // included: its stage-1 completion must agree too)
      val batchRows = (rows ++ late).filter(_._1 != 9L) ++
        Seq((8L, ts("2024-01-01 02:00:00"), "a"), (8L, ts("2024-01-01 03:00:00"), "a"))
      val batch = graft.etl.EventOps.funnel(
          batchRows.toDF("user_id", "ts", "event_type"),
          "user_id", "event_type", "ts", Seq("a", "b", "c"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[String]("stage").takeWhile(_ != '_').toInt,
          r.getAs[java.sql.Timestamp]("completed_at"))).toSet
      // the stream may not have finalized user 8's own nudge rows (the
      // watermark sits at their ts); compare on the finalized users
      val finalized = Set(1L, 2L)
      assert(batch.filter(b => finalized(b._1)) === got.filter(g => finalized(g._1)))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
