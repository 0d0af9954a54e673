package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q1/Q2/A2 — ragged-row detection and repair
  * (`/root/reference/src/utils_.py:5-29`,
  * `src/gsheets_handler.py:104-108,176-194`).
  *
  * The reference receives spreadsheet data as row-lists whose widths may
  * not match the header; it samples rows to estimate the mismatch rate,
  * then pads short rows (one variant also truncates long ones). Spark's
  * CSV reader does this natively (PERMISSIVE + explicit schema), but the
  * operators exist here for row-list-shaped inputs (array<string>
  * columns) — e.g. an API connector delivering raw rows.
  */
object ShapeOps {

  /** A2/Q1 — estimated fraction of sampled rows whose width mismatches
    * the header (reference samples 20 rows; here a fraction-based sample
    * so the estimate is scale-independent). Action, not a plan: returns
    * the rate.
    */
  def raggedRate(df: DataFrame, rowsCol: String, headerWidth: Int,
      sampleFraction: Double = 0.1, seed: Long = 42L): Double = {
    val sampled = df.sample(withReplacement = false, sampleFraction, seed)
    val base = if (sampled.isEmpty) df else sampled
    val row = base.agg(
      avg(when(size(col(rowsCol)) =!= headerWidth, 1.0).otherwise(0.0)).as("rate"))
      .collect()(0)
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** Q2 — pad short rows with nulls and truncate long rows to the header
    * width (the gsheets_handler.py:176-194 variant, which does both).
    * Pure column expression — no UDF, no shuffle.
    */
  def repairRows(rowsCol: Column, headerWidth: Int): Column =
    slice(
      concat(rowsCol,
        array_repeat(lit(null).cast("string"),
          greatest(lit(headerWidth) - size(rowsCol), lit(0)))),
      1, headerWidth)

  /** Row-lists → columnar DataFrame with the given header (the
    * list-of-rows → DataFrame step of S3, gsheets_handler.py:111).
    */
  def rowsToTable(df: DataFrame, rowsCol: String, header: Seq[String]): DataFrame = {
    val repaired = repairRows(col(rowsCol), header.length)
    df.select(header.zipWithIndex.map { case (n, i) =>
      element_at(repaired, i + 1).as(n)
    }: _*)
  }
}
