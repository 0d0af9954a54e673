package graft.sources

import graft.etl.CleanOps
import org.apache.spark.sql.DataFrame

/** S8/S10 — the engine's sinks.
  *
  * The reference's two sinks are a DuckDB table (`src/db_manager.py:36-40`)
  * and a full-refresh Google Sheet (clear + rewrite,
  * `src/gsheets_handler.py:119-171`). Here:
  *  - the canonical analytical sink is parquet, optionally partitioned —
  *    partition columns become directory keys, which is what enables
  *    static/dynamic partition pruning at 100 TB;
  *  - the export sink is header-first CSV of an all-string frame, the
  *    faithful mapping of the sheet rewrite (full refresh = overwrite).
  */
object Sinks {

  /** Partitioned parquet sink (overwrite = the reference's full-refresh
    * semantics).
    */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Full-refresh CSV export: stringified frame, header as first row —
    * the sheet-rewrite twin (S10).
    */
  def writeCsvExport(df: DataFrame, path: String, sep: String = ";"): Unit =
    CleanOps.castAllToString(df)
      .write.mode("overwrite")
      .option("header", "true")
      .option("sep", sep)
      .csv(path)

  /** Bucketed catalog table: rows are hash-bucketed on the join key at
    * write time, so equi-joins between tables bucketed the same way scan
    * co-located buckets and skip the shuffle entirely — the 100 TB
    * answer for repeated large-fact joins (vs paying the exchange per
    * query).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
