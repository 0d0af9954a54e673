package graft.queries

import graft.etl.Tables
import org.apache.spark.sql.functions._

/** Round-8 breadth: row-level sessionization (the batch side of the
  * `session_window` streaming twin), BM25 ranked retrieval over an
  * inverted index with a persisted build/serve split, fixed-iteration
  * PageRank, Johnson-Lindenstrauss random projection, centroid-distance
  * embedding outliers, and deterministic train/val/test splits — each a
  * bounded-shuffle plan whose partitioning survives a 100 TB input.
  */
object Breadth7 {

  /** Row-level gap sessions (30-minute gap, microsecond-strict — the
    * `session_window` merge rule): one row per (user, session) with
    * boundaries and event count. The whole operator is one shuffle of
    * the event log on user_id (window pass + session aggregate share
    * the exchange). `q8_sessionize` keeps the legacy seconds-truncated
    * per-user counts; this is the session frame under it, and
    * `StreamingOps.streamingSessionize` finalizes exactly these rows
    * (Round8Spec pins the equivalence).
    */
  val q53SessionStats = Q(
    "q53_session_stats",
    (s, dir) =>
      graft.etl.EventOps.sessionize(Tables(s, dir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 1800L)
        .orderBy(col("user_id"), col("session_seq")),
    Some("""
      WITH g AS (
        SELECT user_id, ts, event_id,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events),
      f AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_us IS NULL
                         OR epoch_us(ts) - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM g),
      sn AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
        FROM f)
      SELECT user_id, session_seq, min(ts) AS started_at, max(ts) AS ended_at,
             count(*) AS n_events
      FROM sn GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq
    """.trim))

  def all: Seq[Q] = Seq(q53SessionStats)
}
