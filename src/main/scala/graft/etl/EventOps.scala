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
}
