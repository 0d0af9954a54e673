package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches. The count-min sketch here is the
  * classic d×w grid (Cormode & Muthukrishnan 2005): d independent
  * hash rows, each mapping a key into one of w buckets; a cell holds
  * the summed weight of every key landing in it, and the point
  * estimate for a key is the minimum over its d cells — an upper
  * bound on the true count, exact when no collision hit all d rows.
  *
  * Scale posture (100 TB): the cell table is d×w rows REGARDLESS of
  * corpus size, built by one map-side-combining aggregate over the
  * weighted key table — the same "constant-size mergeable state"
  * discipline as the HLL sketch in q34. Per-partition (or per-day)
  * cell tables merge by summing cells, so incremental maintenance is
  * a union + re-aggregate, never a corpus rescan. Hashing is the
  * engine-portable md5-32 ([[Dedup.hash32]]) with a per-row salt, so
  * a DuckDB oracle replays the exact grid.
  */
object SketchOps {

  /** Row-salted bucket for row `row` of a width-`width` grid —
    * engine-portable (md5-32), replayed verbatim by the SQL twins.
    */
  def cmsBucket(keyCol: String, row: Int, width: Int) =
    Dedup.hash32(concat(lit(s"cms$row|"), col(keyCol))) % width

  private def bucket(keyCol: String, row: Int, width: Int) =
    cmsBucket(keyCol, row, width)

  /** Build the d×w cell table from a weighted key table (key, weight).
    * One union of d scan-side projections, one hash aggregate.
    */
  def cmsCells(keyed: DataFrame, keyCol: String, weightCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2)
    (0 until depth)
      .map(r => keyed.select(lit(r.toLong).as("row"),
        bucket(keyCol, r, width).as("bucket"), col(weightCol).as("__w")))
      .reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("__w")).as("cell"))
  }

  /** Point estimates for a candidate key table: min over the d probed
    * cells. The cell table is broadcast (d×w rows by construction);
    * candidates never shuffle. An empty probed cell reads as 0 (left
    * join, not inner — a key the sketch never saw must estimate 0, and
    * an inner join would silently take the min over fewer rows).
    */
  def cmsEstimate(cells: DataFrame, candidates: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2)
    (0 until depth)
      .map(r => candidates.select(col(keyCol), lit(r.toLong).as("row"),
        bucket(keyCol, r, width).as("bucket")))
      .reduce(_ unionByName _)
      .join(broadcast(cells), Seq("row", "bucket"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cell"), lit(0L))).as("cms_est"))
  }

  /** Streaming maintenance of the cell grid: one occurrence per input
    * row, cells as a standard streaming aggregate (complete/update
    * mode). State is the d×w grid — CONSTANT regardless of stream
    * volume, the whole point of sketching a stream — and equals the
    * batch [[cmsCells]] grid over the same rows (pinned in
    * Breadth8Spec).
    */
  def streamingCmsCells(keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2)
    (0 until depth)
      .map(r => keys.select(lit(r.toLong).as("row"),
        bucket(keyCol, r, width).as("bucket")))
      .reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cell"))
  }
}
