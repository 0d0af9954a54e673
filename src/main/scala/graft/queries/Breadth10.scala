package graft.queries

import graft.etl.{LayoutOps, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave: storage-maintenance operators for the versioned
  * parquet sinks (vacuum/retention — the compact-and-expire op a
  * 100 TB deployment schedules daily), plus round-10 quality and
  * robustness follow-ups.
  */
object Breadth10 {

  /** Vacuum/retention over a versioned sink root — the maintenance op
    * that keeps the `mergeSink`/`cdcSink` `v<batchId>` layout from
    * accumulating one full table copy per micro-batch forever (at
    * 100 TB the dominant storage line within a day; every table format
    * ships this as VACUUM / expire_snapshots).
    *
    * The fixture builds a four-version history of a deterministic
    * orders slice (vN = orderkeys with key mod 5 ≤ N), strips v2's
    * commit marker to stage the crash-debris case (batch 2 died and
    * re-ran as v3), then vacuums with keep=2. Expected actions:
    * v0 expired (old committed), v1 kept, v2 debris (uncommitted below
    * the newest committed version), v3 kept. The report carries each
    * pre-vacuum version's row count — the reclaimed-space line a
    * maintenance job logs; per-version file/byte footprints are
    * engine-specific and pinned in Round10Spec instead. All vacuum
    * work is FS metadata; the only scans are the four footer-only
    * row counts.
    */
  val q63LayoutVacuum = Q(
    "layout_vacuum",
    (s, dir) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_vacuum_").toString
      val orders = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      (0 to 3).foreach { n =>
        orders.filter(col("o_orderkey") % 5 <= n)
          .write.mode("overwrite").parquet(s"$root/v$n")
      }
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v2/_SUCCESS"), false)
      // pre-vacuum row counts (parquet footer metadata, no data read)
      val counts = (0 to 3).map { n =>
        n.toLong -> s.read.parquet(s"$root/v$n").count()
      }.toMap
      val report = LayoutOps.vacuumVersions(s, root, keep = 2)
        .select(col("version"), col("committed"), col("action")).collect()
        .map(r => (r.getLong(0), counts(r.getLong(0)), r.getBoolean(1), r.getString(2)))
        .toSeq
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      report.toDF("version", "n_rows", "committed", "action")
        .orderBy(col("version"))
    },
    Some("""
      WITH m AS (SELECT o_orderkey % 5 AS md FROM orders),
      v AS (SELECT unnest(range(4))::BIGINT AS version),
      c AS (SELECT v.version, count(*)::BIGINT AS n_rows
            FROM v JOIN m ON m.md <= v.version GROUP BY v.version)
      SELECT version, n_rows,
             version <> 2 AS committed,
             CASE version WHEN 0 THEN 'expired' WHEN 2 THEN 'debris'
                          ELSE 'kept' END AS action
      FROM c ORDER BY version
    """.trim))

  val all: Seq[Q] = Seq(q63LayoutVacuum)
}
