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

  /** KMV (k-minimum-values / bottom-k) distinct sketch per group
    * (Beyer et al., SIGMOD'07): each group's sketch is its k smallest
    * md5-32 key hashes — a CONSTANT-size mergeable state (merging two
    * sketches = k smallest of their union) whose k-th value estimates
    * the group's distinct count as (k−1)/U_(k) with hashes normalized
    * to [0,1). The sketch that, unlike HLL, also supports SET
    * OPERATIONS ([[kmvIntersectEstimates]]). Input is a DISTINCT
    * (group, hash) frame (typically an aggregate, e.g. the heavy-user
    * rollup); the per-group bottom-k here is a rank window — fine
    * while groups are few and the input is an aggregate (the shipped
    * shape); a user-scale deployment pre-filters scan-side at
    * `hash < cut` with cut ≈ C·k/n_min·2³² before the window, the
    * silence-segments discipline (not defaulted here because an
    * under-sized cut silently truncates the sketch of a small group —
    * the knob must be set per corpus, loudly).
    */
  def kmvSketches(grouped: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    grouped.select(col(groupCol), col(hashCol).as("__h")).distinct()
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__h"))))
      .filter(col("__rk") <= k)
      .select(col(groupCol), col("__h"), col("__rk"))
  }

  /** Pairwise distinct-INTERSECTION estimates from per-group KMV
    * sketches: for each group pair, the k smallest hashes of the
    * MERGED sketch vote — ρ = (fraction present in BOTH sides'
    * sketches), |A∪B|est = (kk−1)/U_(kk) (or the exact merged count
    * when the merged sketch holds fewer than k values — the sketches
    * are then complete sets), |A∩B|est = ρ·|A∪B|est. Everything after
    * the sketches is (groups² × k)-scale — metadata, never corpus.
    * All hashes are md5-32, so a DuckDB twin replays the estimates
    * bit-for-bit.
    */
  def kmvIntersectEstimates(sketches: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = sketches.select(col(groupCol).as("type_a"), col("__h"))
    val b = sketches.select(col(groupCol).as("type_b"), col("__h"))
    // merged candidate values per pair, deduped (a value in both
    // sketches appears once), re-ranked; membership flags ride along
    val merged = a.select(col("type_a"), col("__h"))
      .join(b.select(col("type_b")).distinct(), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), col("__h"), lit(1L).as("__ina"))
      .unionByName(
        b.select(col("type_b"), col("__h"))
          .join(a.select(col("type_a")).distinct(), col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"), col("__h"), lit(2L).as("__ina")))
      .groupBy(col("type_a"), col("type_b"), col("__h"))
      .agg(max(when(col("__ina") === 1L, 1L).otherwise(0L)).as("__in_a"),
        max(when(col("__ina") === 2L, 1L).otherwise(0L)).as("__in_b"))
    val wp = Window.partitionBy(col("type_a"), col("type_b")).orderBy(col("__h"))
    val topk = merged.withColumn("__rk", row_number().over(wp))
      .filter(col("__rk") <= k)
    topk.groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("__kk"),
        max(col("__h")).as("__uk"),
        sum(col("__in_a") * col("__in_b")).as("__match"))
      .withColumn("est_union",
        when(col("__kk") < k, col("__kk").cast("double"))
          .otherwise(round((col("__kk") - 1).cast("double") /
            (col("__uk").cast("double") / 4294967296.0), 6)))
      .withColumn("jaccard_est",
        round(col("__match").cast("double") / col("__kk"), 9))
      .withColumn("est_inter",
        round(col("jaccard_est") * col("est_union"), 6))
      .select(col("type_a"), col("type_b"), col("__kk").cast("long").as("kk"),
        col("est_union"), col("jaccard_est"), col("est_inter"))
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
