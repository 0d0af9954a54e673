package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U2 — upsert/merge refresh (`/root/reference/src/log_handler.py:99-128`):
  * published rows that are unchanged stay, everything else is replaced by
  * the incoming snapshot; output schema is harmonized to all-string and
  * sorted by the (stringified) id — faithful to the reference's
  * stringify-then-concat-then-sort.
  *
  * Scale posture: `unchangedIds` is usually a large fraction of the
  * table, so it is NOT broadcast — the semi/anti joins are shuffle joins
  * on the PK and AQE may downgrade them to broadcast only when the id set
  * is provably small.
  */
object MergeOps {

  private val Sfx = "_b"

  /** J2 — ids whose audit columns are unchanged between snapshots.
    * Null-sensitive on purpose: `!(a =!= b)` is null when either side is
    * null, and `filter` drops null predicates — so a null in an audit
    * column means "changed" (log_handler.py:102-104, P22 semantics).
    */
  def unchangedIds(a: DataFrame, b: DataFrame, idCol: String,
      auditCols: Seq[String]): DataFrame = {
    val bRen = b.toDF(b.columns.map(c => if (c == idCol) c else c + Sfx).toIndexedSeq: _*)
    a.join(bRen, Seq(idCol), "inner")
      .filter(auditCols.map(c => !(col(c) =!= col(c + Sfx))).reduce(_ && _))
      .select(col(idCol))
      .distinct() // A1
  }

  /** U2 — the full merge: semi (J3) ∪ anti (J4), stringified (P20),
    * sorted by id (O2).
    */
  private val log = org.apache.log4j.Logger.getLogger(getClass)

  def tableUpdated(a: DataFrame, b: DataFrame, idCol: String,
      auditCols: Seq[String]): DataFrame = {
    // Q3 — dimension-mismatch warning (log_handler.py:45-46)
    if (a.columns.length != b.columns.length)
      log.warn(s"merge: snapshots have different widths " +
        s"(${a.columns.length} vs ${b.columns.length})")
    // The unchanged-id set feeds both the semi and the anti join, and
    // Catalyst does not reuse the subtree (fresh exprIds per reference →
    // no ReuseExchange): without materialization the A⋈B change-detect
    // join executes once per consumer. One id-only localCheckpoint —
    // the standard shape for a reused subplan at scale (ids are ~8 B/row
    // even when the table is 100 TB).
    val unchanged = unchangedIds(a, b, idCol, auditCols).localCheckpoint()
    val kept = a.join(unchanged, Seq(idCol), "left_semi")
    val newOrModified = b.join(unchanged, Seq(idCol), "left_anti")
    CleanOps.castAllToString(kept)
      .unionByName(CleanOps.castAllToString(newOrModified)) // U1
      .orderBy(col(idCol))
  }
}
