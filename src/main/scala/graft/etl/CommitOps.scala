package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-consistent incremental ingest on plain parquet — the
  * poor-man's Iceberg/Delta commit protocol (VERDICT r14 item 8),
  * composing the pieces the layout family already owns: immutable data
  * files, per-file [min,max] manifests ([[LayoutOps.buildFileManifest]]
  * schema + `n_bytes`), incremental manifest maintenance (stat only the
  * appended files — [[LayoutOps.refreshFileManifest]]'s discipline),
  * and manifest-driven compaction ([[LayoutOps.compactionPlan]]'s
  * size-tiered bins).
  *
  * Table layout (parquet under `root/data/c<uuid>` — immutable, one
  * dir per commit — and the snapshot-N file list + stats under
  * `root/_manifests/v<N>`).
  *
  * The COMMIT EVENT is the `_SUCCESS` marker of the `v<N>` manifest
  * write (Spark writes it strictly last): readers resolve "latest" as
  * the max `v<N>` carrying `_SUCCESS`, so a crashed manifest write is
  * invisible (debris for [[vacuumCommits]]) and there is no pointer-
  * swap window at all — the marker append IS the atomic pointer swap.
  *
  * Reader isolation: [[readSnapshot]] resolves the snapshot's file list
  * once (driver-side, metadata-scale, loudly capped) and the returned
  * frame reads that explicit immutable list — commits and compactions
  * that land later add files but never touch listed ones, so an open
  * reader's results are pinned to its snapshot until [[vacuumCommits]]
  * reclaims versions past the retention window (spec-pinned in
  * Round15Spec). Single writer assumed (the reference's ETL model);
  * writer-writer coordination is a lock service's job, not a layout's.
  *
  * Scale shape: a commit's cost is one pass over the APPENDED data
  * (stats) plus a metadata-scale manifest rewrite; nothing ever
  * re-scans the table. Compaction reads only the small-file bins it
  * rewrites. Reference anchor: the reference's full-refresh sink
  * (src/load.py-style swap) replaced by true appends.
  */
object CommitOps {

  private def manifestRoot(root: String) = s"$root/_manifests"

  private def hadoopFs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All `v<N>` manifest versions present, with their committed flag. */
  private def versions(spark: SparkSession, root: String): Seq[(Long, Boolean)] = {
    val p = new Path(manifestRoot(root))
    val fs = hadoopFs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .filter(_.getPath.getName.matches("v\\d+"))
      .map(s => (s.getPath.getName.drop(1).toLong,
        fs.exists(new Path(s.getPath, "_SUCCESS"))))
      .sortBy(_._1)
  }

  /** Latest COMMITTED snapshot version, if any. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).collect { case (v, true) => v }.maxOption

  /** The snapshot's manifest frame (latest committed by default). */
  def snapshotManifest(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshot under $root"))
    require(versions(spark, root).contains((v, true)),
      s"snapshot v$v is not committed under $root")
    spark.read.parquet(s"${manifestRoot(root)}/v$v")
  }

  /** Read a snapshot: the manifest's explicit immutable file list
    * (driver-side file NAMES, loudly capped — the metastore planning
    * pattern), so the frame is pinned to the snapshot no matter what
    * commits after. A snapshot listing no files fails loudly (an
    * all-empty-append history has nothing to read; zero-row data files
    * never enter a manifest because their stat pass emits no row).
    */
  def readSnapshot(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val files = snapshotManifest(spark, root, version)
      .select(col("file")).limit(LayoutOps.MaxManifestFiles + 1)
      .collect().map(_.getString(0))
    require(files.length <= LayoutOps.MaxManifestFiles,
      s"readSnapshot: snapshot exceeds ${LayoutOps.MaxManifestFiles} files")
    require(files.nonEmpty, s"readSnapshot: snapshot under $root lists no files")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Stats rows ([[LayoutOps.buildFileManifest]] schema + n_bytes) for
    * an explicit NEW-file list: one pass over exactly those files.
    */
  private def statFiles(spark: SparkSession,
      files: Seq[org.apache.hadoop.fs.FileStatus],
      statCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val stats = spark.read.parquet(files.map(_.getPath.toString): _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    import spark.implicits._
    // size keys from the SAME normalization as the scan-reported names
    // (LayoutOps.normFilePath — ADVICE r15: toUri.getPath drops the URI
    // authority, normFileCol keeps it, so on hdfs/s3 the inner join
    // matched nothing and a commit silently dropped every appended file)
    val sizes = files.map(s => (LayoutOps.normFilePath(s.getPath.toString), s.getLen))
      .toDF("__p", "n_bytes")
    val joined = stats.join(broadcast(sizes),
        LayoutOps.normFileCol(col("file")) === col("__p"), "left")
      .drop("__p")
      .localCheckpoint()
    // loud guard: a stats row whose normalized name matched no listed
    // file means the two normalizations diverged again — fail the
    // commit, never write a manifest missing its n_bytes. (Fewer stats
    // rows than files is legitimate: zero-row data files emit no group.)
    val unmatched = joined.filter(col("n_bytes").isNull).count()
    require(unmatched == 0L,
      s"statFiles: $unmatched stat rows matched no listed file — " +
        "path normalization mismatch between scan names and FS listing")
    joined
  }

  /** Write `vNew` = `prev` (may be empty) ∪ stats of `newFiles`, and
    * return the new version. The manifest write's `_SUCCESS` is the
    * commit point.
    */
  private def commitManifest(spark: SparkSession, root: String,
      prev: Option[DataFrame], newFiles: Seq[org.apache.hadoop.fs.FileStatus],
      statCols: Seq[String]): Long = {
    // next version past ANY existing vdir (committed or crash debris) —
    // never reuse a debris number, vacuum reclaims it
    val next = versions(spark, root).map(_._1).maxOption.getOrElse(0L) + 1L
    val fresh =
      if (newFiles.isEmpty) None
      else Some(statFiles(spark, newFiles, statCols))
    val mani = (prev, fresh) match {
      case (Some(p), Some(f)) => p.unionByName(f)
      case (Some(p), None) => p
      case (None, Some(f)) => f
      case (None, None) =>
        throw new IllegalArgumentException("empty commit on an empty table")
    }
    // tiny metadata write: one file per manifest keeps reader listing O(1)
    mani.coalesce(1).write.parquet(s"${manifestRoot(root)}/v$next")
    next
  }

  /** Append `df` as a new snapshot: write immutable data files under a
    * fresh commit dir, stat ONLY those files (cost ∝ appended data),
    * union into the previous manifest, commit. Returns the new version.
    */
  def appendCommit(spark: SparkSession, root: String, df: DataFrame,
      statCols: Seq[String]): Long = {
    require(statCols.nonEmpty, "need at least one stat column")
    val commitDir =
      s"$root/data/c${java.util.UUID.randomUUID().toString.take(12)}"
    df.write.parquet(commitDir)
    val newFiles = LayoutOps.listDataFiles(spark, commitDir)
    val prev = latestVersion(spark, root)
      .map(v => snapshotManifest(spark, root, Some(v)))
    commitManifest(spark, root, prev, newFiles, statCols)
  }

  /** Manifest-driven compaction as a COMMIT: pick multi-file bins from
    * the snapshot manifest's size stats ([[LayoutOps.compactionPlan]],
    * one partition — candidate selection never walks the directory,
    * VERDICT r14 item 4), rewrite ONLY those bins' files into
    * ~`targetFileBytes` files, and commit a manifest keeping every
    * already-compact file row untouched. Old files stay on disk for
    * open readers until [[vacuumCommits]]. Returns the new version
    * (unchanged latest if nothing needs compacting).
    */
  def compactCommit(spark: SparkSession, root: String,
      targetFileBytes: Long, statCols: Seq[String]): Long = {
    require(targetFileBytes >= 1)
    val mani = snapshotManifest(spark, root).localCheckpoint()
    // candidate selection from manifest stats only, never a directory
    // walk: compactionPlan's size-tiered fill over one partition; files
    // landing in multi-file bins are the rewrite work list
    val binned = LayoutOps.compactionPlanBins(
      mani.withColumn("__part", lit(1)), "__part", "file", "n_bytes",
      lit(targetFileBytes.toDouble))
    val counted = binned.join(
      binned.groupBy(col("bin_id")).agg(count(lit(1)).as("__nf")), "bin_id")
      .filter(col("__nf") > 1)
    val toRewrite = counted.select(col("file"))
      .limit(LayoutOps.MaxManifestFiles + 1).collect().map(_.getString(0))
    require(toRewrite.length <= LayoutOps.MaxManifestFiles,
      s"compactCommit: more than ${LayoutOps.MaxManifestFiles} files")
    if (toRewrite.isEmpty) return latestVersion(spark, root).get
    val totalBytes = counted.agg(sum(col("n_bytes"))).head().getLong(0)
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val commitDir =
      s"$root/data/c${java.util.UUID.randomUUID().toString.take(12)}"
    spark.read.parquet(toRewrite.toIndexedSeq: _*)
      .repartition(nOut).write.parquet(commitDir)
    import spark.implicits._
    val keepDf = mani.join(
      broadcast(toRewrite.toSeq.toDF("__f")), col("file") === col("__f"),
      "left_anti").drop("__f")
    val newFiles = LayoutOps.listDataFiles(spark, commitDir)
    commitManifest(spark, root, Some(keepDf), newFiles, statCols)
  }

  /** Copy-on-write MERGE as a commit — the Delta/Iceberg upsert
    * pattern composed from this round's pieces: files that can contain
    * a matched key are found through the manifest's [min, max]
    * intervals on `keyCol` (the [[LayoutOps.manifestJoinPrunedRead]]
    * runtime-filter test when the update-key set is broadcast-scale;
    * the keys' [min, max] envelope past [[LayoutOps.MaxJoinPruneKeys]]
    * — a coarser superset, never a miss), and ONLY those files
    * rewrite (surviving rows anti-joined on the key + the updates
    * appended); every untouched file keeps its manifest row verbatim.
    * Rows whose key matches an update are replaced; unmatched update
    * keys insert. Old files stay for open readers until
    * [[vacuumCommits]]. At 100 TB the rewrite cost is the matched
    * files' bytes, not the table — which is the entire point of
    * keeping key-clustered layouts under a manifest. The snapshot's
    * manifest must carry `min_/max_$keyCol` stats (commit with
    * `keyCol` in `statCols`).
    */
  def mergeCommit(spark: SparkSession, root: String, updates: DataFrame,
      keyCol: String, statCols: Seq[String]): Long = {
    val mani = snapshotManifest(spark, root).localCheckpoint()
    require(mani.columns.contains(s"min_$keyCol"),
      s"mergeCommit needs min_/max_$keyCol stats in the snapshot manifest")
    val ks = updates.select(col(keyCol).as("__k"))
      .filter(col("__k").isNotNull).distinct()
      .localCheckpoint(eager = false) // the count materializes
    val nk = ks.count()
    // loud MERGE-source guards (ADVICE r15, the Delta/Iceberg contract):
    // a NULL update key can never match (it would silently always
    // insert), and duplicate update keys would silently commit
    // duplicated rows where Delta fails on multiple matches. One
    // aggregate over the updates; nk (distinct) is already materialized.
    val uStats = updates.agg(
      count(lit(1)).as("__n"), count(col(keyCol)).as("__nn")).head()
    require(uStats.getLong(0) == uStats.getLong(1),
      s"mergeCommit: ${uStats.getLong(0) - uStats.getLong(1)} update rows " +
        s"have a NULL $keyCol — null keys bypass the match path")
    require(uStats.getLong(1) == nk,
      s"mergeCommit: updates carry duplicate $keyCol values " +
        s"(${uStats.getLong(1)} rows, $nk distinct) — one row per key required")
    val hitFiles =
      if (nk <= LayoutOps.MaxJoinPruneKeys)
        mani.join(broadcast(ks), coalesce(
          col(s"min_$keyCol") <= col("__k") &&
            col(s"max_$keyCol") >= col("__k"), lit(true)), "left_semi")
      else {
        val env = ks.agg(min(col("__k")).as("__lo"), max(col("__k")).as("__hi"))
          .head()
        mani.filter(coalesce(
          col(s"max_$keyCol") >= lit(env.get(0)) &&
            col(s"min_$keyCol") <= lit(env.get(1)), lit(true)))
      }
    val touched = hitFiles.select(col("file"))
      .limit(LayoutOps.MaxManifestFiles + 1).collect().map(_.getString(0))
    require(touched.length <= LayoutOps.MaxManifestFiles,
      s"mergeCommit: more than ${LayoutOps.MaxManifestFiles} files touched")
    import spark.implicits._
    val untouched = mani.join(broadcast(touched.toSeq.toDF("__f")),
      col("file") === col("__f"), "left_anti")
    val newData =
      if (touched.isEmpty) updates
      else spark.read.parquet(touched.toIndexedSeq: _*)
        .join(ks, col(keyCol) === col("__k"), "left_anti")
        .unionByName(updates)
    val commitDir =
      s"$root/data/c${java.util.UUID.randomUUID().toString.take(12)}"
    newData.write.parquet(commitDir)
    val newFiles = LayoutOps.listDataFiles(spark, commitDir)
    commitManifest(spark, root, Some(untouched), newFiles, statCols)
  }

  /** Retention: keep the newest `keep` committed manifests, delete
    * older/debris manifests and every data file no kept manifest
    * references. FS metadata + a driver-side name set (capped at the
    * manifest ceiling); returns (manifests deleted, data files
    * deleted).
    */
  def vacuumCommits(spark: SparkSession, root: String,
      keep: Int): (Int, Int) = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val fs = hadoopFs(spark, root)
    val all = versions(spark, root)
    val committed = all.collect { case (v, true) => v }
    val keepSet = committed.sorted.takeRight(keep).toSet
    val newestCommitted = committed.maxOption.getOrElse(Long.MinValue)
    // uncommitted versions above the newest committed may be a writer
    // mid-flight (same rule as vacuumVersions): leave them alone
    val dropManis = all.filter { case (v, ok) =>
      (ok && !keepSet(v)) || (!ok && v < newestCommitted)
    }.map(_._1)
    val referenced: Set[String] = keepSet.toSeq.sorted.flatMap { v =>
      snapshotManifest(spark, root, Some(v))
        .select(LayoutOps.normFileCol(col("file")))
        .limit(LayoutOps.MaxManifestFiles + 1).collect().map(_.getString(0))
    }.toSet
    require(referenced.size <= LayoutOps.MaxManifestFiles,
      s"vacuumCommits: kept snapshots exceed ${LayoutOps.MaxManifestFiles} files")
    val orphans = LayoutOps.listDataFiles(spark, s"$root/data")
      .filter(s => !referenced(LayoutOps.normFilePath(s.getPath.toString)))
    dropManis.foreach(v =>
      fs.delete(new Path(s"${manifestRoot(root)}/v$v"), true): Unit)
    orphans.foreach(s => fs.delete(s.getPath, false): Unit)
    // empty commit dirs are cosmetic; remove any now-fileless ones
    val dataRoot = new Path(s"$root/data")
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot).toSeq
      .filter(_.isDirectory)
      .filter(d => LayoutOps.listDataFiles(spark, d.getPath.toString).isEmpty)
      .foreach(d => fs.delete(d.getPath, true): Unit)
    (dropManis.size, orphans.size)
  }
}
