package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence operators over an (entity, type, timestamp) event
  * log. The funnel is the workhorse of product/behavior analytics and
  * of multi-stage pipeline telemetry.
  */
object EventOps {

  /** N-stage ordered funnel with strictly-after semantics: an entity
    * completes stage i at the EARLIEST event of `stages(i)` that is
    * strictly after its stage i-1 completion (greedy-earliest is the
    * standard funnel definition and provably maximizes completions).
    *
    * Returns (stage_idx, stage, <entityCol>, completed_at) — one row
    * per entity per completed stage. `stage_idx` (1-based) is the
    * funnel-order sort key; the `1_<name>` label is display-friendly
    * but its LEXICAL order breaks past 9 stages ("10_x" < "2_y"), so
    * order by `stage_idx`, never by label, in multi-stage funnels.
    *
    * Every stage is a filter → per-entity min aggregate → join to the
    * previous stage's completions, all keyed on the entity column: one
    * hash partitioning carries the whole funnel, and stage tables
    * shrink monotonically (completions only lose members).
    */
  /** Gap-based sessionization to a row-level session frame: one row per
    * (entity, session) with boundaries and event counts. A new session
    * starts when the microsecond gap to the previous event EXCEEDS the
    * gap (a gap of exactly the duration still merges — verified against
    * `session_window`'s inclusive-end rule, so the streaming twin
    * `StreamingOps.streamingSessionize` finalizes byte-identical
    * sessions; the earlier `q8_sessionize` count op keeps the legacy
    * seconds-truncated semantics).
    *
    * Plan shape: one hash partitioning on the entity carries both the
    * lag/running-sum window pass and the session aggregate — Catalyst
    * reuses the exchange, so the whole operator is a single shuffle of
    * the event log no matter how many sessions it yields. At 100 TB the
    * window state per task is one row (lag-1 + running sum), never a
    * buffered partition.
    */
  def sessionize(events: DataFrame, entityCol: String, tsCol: String,
      tieBreakCol: String, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieBreakCol))
    // explicit ROWS frame: the default is RANGE-UNBOUNDED-PRECEDING,
    // which would include peer rows if (ts, tieBreak) ever repeated and
    // diverge from the oracle's ROWS frame and the streaming twin
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NTZ → TIMESTAMP is a no-op under the engine's pinned UTC session
    // timezone; unix_micros needs the instant type.
    val us = unix_micros(col(tsCol).cast("timestamp"))
    events
      .withColumn("__prev_us", lag(us, 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_us").isNull ||
          us - col("__prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new_session")).over(wRows))
      .groupBy(col(entityCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("started_at"),
        max(col(tsCol)).as("ended_at"),
        count(lit(1)).as("n_events"))
  }

  def funnel(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val labeled = stages.zipWithIndex.map { case (s, i) => (i + 1, s"${i + 1}_$s", s) }
    val completions = labeled.foldLeft(Seq.empty[(Int, String, DataFrame)]) {
      case (acc, (idx, label, stage)) =>
        val candidates = events.filter(col(typeCol) === stage)
        val gated = acc.lastOption match {
          case None => candidates
          case Some((_, _, prev)) =>
            candidates.join(prev.select(col(entityCol), col("completed_at").as("__prev_t")),
                entityCol)
              .filter(col(tsCol) > col("__prev_t"))
        }
        // materialize each stage's completions (≤ one row per entity —
        // tiny next to the event log): without this, stage i's subtree
        // re-embeds stages 1..i-1 and the final union re-reads the log
        // O(stages²) times
        val done = gated.groupBy(col(entityCol))
          .agg(min(col(tsCol)).as("completed_at"))
          .localCheckpoint()
        acc :+ ((idx, label, done))
    }
    completions.map { case (idx, label, df) =>
      df.select(lit(idx).as("stage_idx"), lit(label).as("stage"),
        col(entityCol), col("completed_at"))
    }.reduce(_.unionByName(_))
  }

  /** Interval×interval overlap self-join by day-bucket expansion — the
    * missing sibling of the point-in-interval binned range join (j10)
    * and the as-of family: emit every unordered pair of intervals in
    * the same partition whose [start, end] DATE ranges overlap
    * (inclusive ends), exactly once. Input columns: `partCol` (the
    * co-location key — e.g. supplier), `idCol` (unique item id),
    * `startCol`/`endCol` (DATEs, start ≤ end).
    *
    * Why not a theta-join: `a.s <= b.e AND b.s <= a.e` alone has no
    * equi-key, so Catalyst would plan a per-partition nested loop —
    * quadratic in partition size. Binning both sides on
    * floor(epoch_day / binDays) and joining on (partCol, bin) restores
    * an equi-key; each interval lands in ≤ ⌈len/binDays⌉+1 bins, so with
    * `binDays` ≥ the max interval length the expansion is ≤ 2× and every
    * overlapping pair shares at least one bin. Dedup is arithmetic, not
    * a `distinct`: a pair is EMITTED ONLY in the bin that contains
    * greatest(a.start, b.start) — the overlap's first day — so no
    * pair-wide shuffle is ever spent removing bin duplicates.
    *
    * 100 TB posture: cost is Σ_buckets size² over (partCol, bin)
    * buckets — bounded when `binDays` tracks the max interval length
    * and the partition key spreads load (a skewed partCol wants the
    * salting treatment of j12). The join is a plain shuffle hash/sort
    * join on the composite key; no broadcast, no driver state.
    */
  def intervalOverlapPairs(iv: DataFrame, partCol: String, idCol: String,
      startCol: String, endCol: String, binDays: Int): DataFrame = {
    require(binDays >= 1, s"binDays must be positive, got $binDays")
    def day(c: org.apache.spark.sql.Column) = datediff(c, lit("1970-01-01"))
    // The start-bin rides each side (scan-side, once per expanded row):
    // the dedup predicate below needs bin(greatest(sa, sb)), and
    // floor-division by a positive constant is monotone, so it equals
    // greatest(bin(sa), bin(sb)) — an int max per candidate instead of
    // a datediff + division per candidate (the candidate stream is the
    // expansion's multiple of the fact table; r16 measured the old
    // per-candidate date math as pure overhead on an identical result).
    def side(suffix: String) = iv.select(
      col(partCol),
      col(idCol).as(s"i$suffix"),
      col(startCol).as(s"s$suffix"),
      col(endCol).as(s"e$suffix"))
      .withColumn(s"__b0$suffix", (day(col(s"s$suffix")) / binDays).cast("long"))
      .withColumn("__bin", explode(sequence(
        col(s"__b0$suffix"),
        (day(col(s"e$suffix")) / binDays).cast("long"))))
    // shuffle_hash: both sides are the same expanded fact frame — a
    // sort-merge join pays two full sorts of the expansion for nothing
    side("a").join(side("b").hint("shuffle_hash"), Seq(partCol, "__bin"))
      .filter(col("ia") < col("ib") &&
        col("sa") <= col("eb") && col("sb") <= col("ea") &&
        col("__bin") === greatest(col("__b0a"), col("__b0b")))
      .select(col(partCol), col("ia"), col("ib"))
  }
}
