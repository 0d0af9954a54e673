package graft

import org.apache.spark.sql.functions._

/** Round-15 pins: incremental manifest refresh (== full rebuild), and
  * the append-commit protocol's contracts — snapshot equality, reader
  * isolation across later commits, crash-debris invisibility,
  * manifest-driven compaction, and vacuum retention.
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("refreshFileManifest == full rebuild after appends and deletes") {
    val dir = freshDir("refresh_spec_")
    (0L until 300L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(3, col("k")).write.parquet(s"$dir/t")
    val m0 = graft.etl.LayoutOps.buildFileManifest(spark, s"$dir/t", Seq("k"))
      .localCheckpoint()
    // grow the table by two more range files...
    (300L until 500L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.mode("append").parquet(s"$dir/t")
    // ...and delete one original file (compaction/vacuum would)
    val fs = new org.apache.hadoop.fs.Path(s"$dir/t")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = m0.select(col("file")).orderBy(col("file")).head().getString(0)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      new java.net.URI(victim).getPath), false))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Long)] =
      df.select(regexp_extract(col("file"), "[^/]+$", 0), col("n_rows"),
          col("min_k"), col("max_k"))
        .as[(String, Long, Long, Long)].collect().toSeq.sorted
    val refreshed = graft.etl.LayoutOps.refreshFileManifest(
      spark, s"$dir/t", m0, Seq("k"))
    val rebuilt = graft.etl.LayoutOps.buildFileManifest(
      spark, s"$dir/t", Seq("k"))
    assert(canon(refreshed) === canon(rebuilt))
    assert(canon(refreshed).nonEmpty)
    // the refresh must NOT have re-statted the surviving original
    // files: its plan reads only the NEW files (2 range files), never
    // the whole directory (m0 is checkpointed, so the only file scan
    // in the refreshed plan is the new-file stat pass)
    val scanned = refreshed.inputFiles
    assert(scanned.length === 2,
      s"refresh must stat only the appended files, scanned ${scanned.length}")
  }

  test("appendCommit: snapshot equality and version history") {
    val root = freshDir("commit_spec_") + "/t"
    val a = (0L until 100L).map(k => (k, k % 7)).toDF("k", "m")
    val b = (100L until 250L).map(k => (k, k % 7)).toDF("k", "m")
    val v1 = graft.etl.CommitOps.appendCommit(spark, root, a, Seq("k"))
    val v2 = graft.etl.CommitOps.appendCommit(spark, root, b, Seq("k"))
    assert(v1 === 1L && v2 === 2L)
    assert(graft.etl.CommitOps.latestVersion(spark, root) === Some(2L))
    val latest = graft.etl.CommitOps.readSnapshot(spark, root)
      .select(col("k")).as[Long].collect().toSet
    assert(latest === (0L until 250L).toSet)
    val pinned = graft.etl.CommitOps.readSnapshot(spark, root, Some(1L))
      .select(col("k")).as[Long].collect().toSet
    assert(pinned === (0L until 100L).toSet)
    // the snapshot manifest carries per-file stats usable for skipping
    val mani = graft.etl.CommitOps.snapshotManifest(spark, root)
    assert(mani.columns.toSet ===
      Set("file", "n_rows", "min_k", "max_k", "n_bytes"))
    assert(mani.agg(sum(col("n_rows"))).head().getLong(0) === 250L)
  }

  test("appendCommit: reader isolation — an open reader is pinned to its snapshot") {
    val root = freshDir("commit_iso_") + "/t"
    graft.etl.CommitOps.appendCommit(spark, root,
      (0L until 50L).map(k => (k, "a")).toDF("k", "tag"), Seq("k"))
    // reader resolves its file list NOW (v1)...
    val reader = graft.etl.CommitOps.readSnapshot(spark, root)
    // ...a writer commits v2 (and even compacts) while the reader is open
    graft.etl.CommitOps.appendCommit(spark, root,
      (50L until 90L).map(k => (k, "b")).toDF("k", "tag"), Seq("k"))
    graft.etl.CommitOps.compactCommit(spark, root,
      targetFileBytes = 1L << 26, statCols = Seq("k"))
    // the open reader still evaluates to exactly v1's contents
    assert(reader.select(col("k")).as[Long].collect().toSet ===
      (0L until 50L).toSet)
    // while a NEW reader sees the committed appends
    assert(graft.etl.CommitOps.readSnapshot(spark, root).count() === 90L)
  }

  test("appendCommit: an uncommitted manifest (crash debris) is invisible") {
    val root = freshDir("commit_crash_") + "/t"
    graft.etl.CommitOps.appendCommit(spark, root,
      (0L until 30L).map(k => (k, 1)).toDF("k", "m"), Seq("k"))
    // simulate a writer that died mid-manifest-write: a v2 dir with
    // data but no _SUCCESS
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$root/_manifests/v1").write
      .parquet(s"$root/_manifests/v2")
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/_manifests/v2/_SUCCESS"), false))
    assert(graft.etl.CommitOps.latestVersion(spark, root) === Some(1L))
    assert(graft.etl.CommitOps.readSnapshot(spark, root).count() === 30L)
    // the next commit must never reuse the debris number
    val v = graft.etl.CommitOps.appendCommit(spark, root,
      (30L until 40L).map(k => (k, 1)).toDF("k", "m"), Seq("k"))
    assert(v === 3L)
    assert(graft.etl.CommitOps.readSnapshot(spark, root).count() === 40L)
  }

  test("compactCommit: manifest-driven bin rewrite, data unchanged, fewer files") {
    val root = freshDir("commit_compact_") + "/t"
    // 5 tiny commits -> >= 5 small files
    (0 until 5).foreach { i =>
      graft.etl.CommitOps.appendCommit(spark, root,
        (i * 20L until (i + 1) * 20L).map(k => (k, s"v$k")).toDF("k", "v")
          .coalesce(1), Seq("k"))
    }
    val before = graft.etl.CommitOps.snapshotManifest(spark, root).count()
    assert(before === 5L)
    val v = graft.etl.CommitOps.compactCommit(spark, root,
      targetFileBytes = 1L << 26, statCols = Seq("k"))
    assert(v === 6L)
    val after = graft.etl.CommitOps.snapshotManifest(spark, root)
      .localCheckpoint()
    assert(after.count() < before, "compaction must reduce the file count")
    assert(graft.etl.CommitOps.readSnapshot(spark, root)
      .select(col("k")).as[Long].collect().toSet === (0L until 100L).toSet)
    // stats refreshed for the rewritten files
    assert(after.agg(sum(col("n_rows"))).head().getLong(0) === 100L)
    assert(after.agg(min(col("min_k")), max(col("max_k")))
      .as[(Long, Long)].head() === ((0L, 99L)))
    // a second compaction finds nothing to do and keeps the version
    assert(graft.etl.CommitOps.compactCommit(spark, root,
      targetFileBytes = 1L << 26, statCols = Seq("k")) === 6L)
  }

  test("mergeCommit: copy-on-write upsert rewrites only key-overlapping files") {
    val root = freshDir("commit_merge_") + "/t"
    // key-clustered base: 4 range files over k = 0..99
    graft.etl.CommitOps.appendCommit(spark, root,
      (0L until 100L).map(k => (k, "old")).toDF("k", "v")
        .repartitionByRange(4, col("k")), Seq("k"))
    val baseFiles = graft.etl.CommitOps.snapshotManifest(spark, root)
      .select(col("file")).as[String].collect().toSet
    assert(baseFiles.size === 4)
    // updates hit keys 5 and 7 (one file's interval) + one pure insert
    val v = graft.etl.CommitOps.mergeCommit(spark, root,
      Seq((5L, "new"), (7L, "new"), (150L, "ins")).toDF("k", "v"),
      "k", Seq("k"))
    assert(v === 2L)
    val snap = graft.etl.CommitOps.readSnapshot(spark, root)
      .as[(Long, String)].collect().toMap
    assert(snap.size === 101)
    assert(snap(5L) === "new" && snap(7L) === "new" && snap(150L) === "ins")
    assert(snap(6L) === "old" && snap(99L) === "old")
    // only the one key-overlapping file rewrote: the other 3 base
    // files' manifest rows survive VERBATIM (same file names)
    val after = graft.etl.CommitOps.snapshotManifest(spark, root)
      .select(col("file")).as[String].collect().toSet
    assert((baseFiles intersect after).size === 3,
      s"3 untouched base files must keep their manifest rows, " +
        s"kept ${(baseFiles intersect after).size}")
    // an open v1 reader still sees the pre-merge contents
    assert(graft.etl.CommitOps.readSnapshot(spark, root, Some(1L))
      .filter(col("k") === 5L).as[(Long, String)].head()._2 === "old")
  }

  test("vacuumCommits: retention keeps the serving snapshot readable, reclaims the rest") {
    val root = freshDir("commit_vacuum_") + "/t"
    (0 until 4).foreach { i =>
      graft.etl.CommitOps.appendCommit(spark, root,
        (i * 10L until (i + 1) * 10L).map(k => (k, 1)).toDF("k", "m")
          .coalesce(1), Seq("k"))
    }
    graft.etl.CommitOps.compactCommit(spark, root,
      targetFileBytes = 1L << 26, statCols = Seq("k"))
    val (manis, orphans) = graft.etl.CommitOps.vacuumCommits(spark, root,
      keep = 1)
    assert(manis === 4, s"4 old manifests reclaimed, got $manis")
    assert(orphans === 4, s"4 pre-compaction files reclaimed, got $orphans")
    // the kept snapshot still reads in full
    assert(graft.etl.CommitOps.readSnapshot(spark, root)
      .select(col("k")).as[Long].collect().toSet === (0L until 40L).toSet)
    // vacuumed versions are gone (loudly)
    intercept[IllegalArgumentException] {
      graft.etl.CommitOps.snapshotManifest(spark, root, Some(1L))
    }
  }

  test("manifestJoinPrunedRead: dim keys prune fact files, join answers unchanged") {
    val dir = freshDir("joinskip_")
    (0L until 800L).map(k => (k, k * 2)).toDF("k", "v")
      .repartitionByRange(8, col("k")).write.parquet(s"$dir/t")
    val mani = graft.etl.LayoutOps
      .buildFileManifest(spark, s"$dir/t", Seq("k")).localCheckpoint()
    val dim = Seq(10L, 11L, 720L).toDF("k") // keys at both ends of the range
    val pruned = graft.etl.LayoutOps.manifestJoinPrunedRead(
      spark, s"$dir/t", mani, "k", dim)
    assert(pruned.inputFiles.length >= 1 && pruned.inputFiles.length < 8,
      s"point-selective dim must prune files, opened ${pruned.inputFiles.length} of 8")
    val got = pruned.join(dim, Seq("k")).orderBy(col("k"))
      .as[(Long, Long)].collect().toSeq
    val want = spark.read.parquet(s"$dir/t").join(dim, Seq("k"))
      .orderBy(col("k")).as[(Long, Long)].collect().toSeq
    assert(got === want && got.size === 3)
    // empty dim prunes everything and keeps the table's schema
    val none = graft.etl.LayoutOps.manifestJoinPrunedRead(
      spark, s"$dir/t", mani, "k", Seq.empty[Long].toDF("k"))
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("k", "v"))
    // a non-selective dim fails loudly at the key cap
    intercept[IllegalArgumentException] {
      graft.etl.LayoutOps.manifestJoinPrunedRead(spark, s"$dir/t", mani,
        "k", spark.range(20001).toDF("k"))
    }
  }

  test("layout_manifest_refresh and layout_append_commit: registry rows run green at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.Breadth24.layoutManifestRefresh.fn(spark, sf)
    assert(r.count() === 3L) // three months in the quarter
    val c = graft.queries.Breadth24.layoutAppendCommit.fn(spark, sf)
    val direct = graft.etl.Tables(spark, sf, "orders")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
      .as[(String, Long)].collect().toSeq
    assert(c.select(col("o_orderstatus"), col("n_orders"))
      .as[(String, Long)].collect().toSeq === direct)
  }
}
