package graft.queries

import graft.etl.{AuditOps, MergeOps, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audit-log + merge/upsert operator queries (SURVEY.md §2.3-§2.6, Q5/U2)
  * over two deterministic snapshots of `orders`:
  *
  *  - snapshot A = orders as published;
  *  - snapshot B = incoming refresh: rows deleted (key % 89 = 0),
  *    modified (% 97, % 101, and a null-audit-value case % 103 in the
  *    merge variant), and brand-new keys (% 211 → key + 1e8).
  *
  * The merge variant mutates only string columns: stringified doubles
  * must keep their exact 2-decimal representation for the oracle's
  * VARCHAR compare (Java 17's Double.toString vs DuckDB shortest-repr
  * diverge on non-2-decimal doubles).
  */
object AuditMerge {

  private val RunTs = java.time.LocalDateTime.of(2026, 8, 12, 0, 0, 0)

  private def snapshotB(s: SparkSession, dir: String, forMerge: Boolean): DataFrame = {
    val o = Tables(s, dir, "orders")
    val base = o.filter(col("o_orderkey") % 89 =!= 0)
    val modded =
      if (forMerge)
        base.select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 101 === 0, lit("X"))
            .when(col("o_orderkey") % 103 === 0, lit(null))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"),
          when(col("o_orderkey") % 97 === 0, lit("MODIFIED"))
            .otherwise(col("o_orderpriority")).as("o_orderpriority"))
      else
        base.select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 101 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 100.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
    val news = o.filter(col("o_orderkey") % 211 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
    modded.unionByName(news)
  }

  private val SnapBAudit = """
    snap_b AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 101 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 89 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 211 = 0)"""

  private val SnapBMerge = """
    snap_b AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 101 = 0 THEN 'X'
                  WHEN o_orderkey % 103 = 0 THEN NULL
                  ELSE o_orderstatus END AS o_orderstatus,
             o_totalprice, o_orderdate,
             CASE WHEN o_orderkey % 97 = 0 THEN 'MODIFIED' ELSE o_orderpriority END AS o_orderpriority
      FROM orders WHERE o_orderkey % 89 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 211 = 0)"""

  private val UnchangedCte = """
    unchanged AS (
      SELECT DISTINCT a.o_orderkey AS uk
      FROM orders a JOIN snap_b b ON a.o_orderkey = b.o_orderkey
      WHERE NOT (a.o_orderstatus <> b.o_orderstatus)
        AND NOT (a.o_orderpriority <> b.o_orderpriority))"""

  /** Q5/J1/P16-P19 — the reference's audit log (inner join: every change
    * is 'Modificado'; the faithful semantics).
    */
  val j01 = Q(
    "q5_authlog",
    (s, dir) =>
      AuditOps.authlog(Tables(s, dir, "orders"), snapshotB(s, dir, forMerge = false),
          "o_orderkey", Seq("o_totalprice", "o_orderstatus"),
          fuenteLog = "fbs/orders", runId = "run-1", runTs = RunTs)
        .orderBy(col("o_orderkey")),
    Some(s"""
      WITH $SnapBAudit
      SELECT 'run-1' AS id_log, TIMESTAMP '2026-08-12 00:00:00' AS fecha_modificacion,
             'Modificado' AS tipo_cambio, 'fbs/orders' AS fuente_log,
             a.o_orderkey AS o_orderkey, b.o_orderkey AS o_orderkey_modeled,
             a.o_totalprice AS o_totalprice, b.o_totalprice AS o_totalprice_modeled,
             a.o_orderstatus AS o_orderstatus, b.o_orderstatus AS o_orderstatus_modeled
      FROM orders a JOIN snap_b b ON a.o_orderkey = b.o_orderkey
      WHERE (a.o_totalprice IS NOT NULL AND b.o_totalprice IS NOT NULL AND a.o_totalprice <> b.o_totalprice)
         OR (a.o_orderstatus IS NOT NULL AND b.o_orderstatus IS NOT NULL AND a.o_orderstatus <> b.o_orderstatus)
      ORDER BY o_orderkey
    """.trim))

  /** Q5 full-outer variant — coherent Nuevo/Eliminado/Modificado
    * (SURVEY.md §7.3: the reference's unreachable branches made real).
    */
  val j02 = Q(
    "q5_authlog_fullouter",
    (s, dir) =>
      AuditOps.authlog(Tables(s, dir, "orders"), snapshotB(s, dir, forMerge = false),
          "o_orderkey", Seq("o_totalprice", "o_orderstatus"),
          fuenteLog = "fbs/orders", runId = "run-1", runTs = RunTs, fullOuter = true)
        .orderBy(coalesce(col("o_orderkey"), col("o_orderkey_modeled"))),
    Some(s"""
      WITH $SnapBAudit
      SELECT 'run-1' AS id_log, TIMESTAMP '2026-08-12 00:00:00' AS fecha_modificacion,
             CASE WHEN a.o_orderkey IS NULL THEN 'Nuevo'
                  WHEN b.o_orderkey IS NULL THEN 'Eliminado'
                  ELSE 'Modificado' END AS tipo_cambio,
             'fbs/orders' AS fuente_log,
             a.o_orderkey AS o_orderkey, b.o_orderkey AS o_orderkey_modeled,
             a.o_totalprice AS o_totalprice, b.o_totalprice AS o_totalprice_modeled,
             a.o_orderstatus AS o_orderstatus, b.o_orderstatus AS o_orderstatus_modeled
      FROM orders a FULL JOIN snap_b b ON a.o_orderkey = b.o_orderkey
      WHERE (a.o_totalprice IS NOT NULL AND b.o_totalprice IS NOT NULL AND a.o_totalprice <> b.o_totalprice)
         OR (a.o_orderstatus IS NOT NULL AND b.o_orderstatus IS NOT NULL AND a.o_orderstatus <> b.o_orderstatus)
         OR a.o_orderkey IS NULL OR b.o_orderkey IS NULL
      ORDER BY coalesce(a.o_orderkey, b.o_orderkey)
    """.trim))

  /** J2+A1 — distinct unchanged ids (null-sensitive filter drops
    * null-audit rows, P22).
    */
  val a01 = Q(
    "a1_unchanged_ids",
    (s, dir) =>
      MergeOps.unchangedIds(Tables(s, dir, "orders"), snapshotB(s, dir, forMerge = true),
          "o_orderkey", Seq("o_orderstatus", "o_orderpriority"))
        .orderBy(col("o_orderkey")),
    Some(s"""
      WITH $SnapBMerge, $UnchangedCte
      SELECT uk AS o_orderkey FROM unchanged ORDER BY o_orderkey
    """.trim))

  /** J3 — left-semi: published rows that survive the refresh unchanged. */
  val j03 = Q(
    "j3_unchanged_semi",
    (s, dir) => {
      val a = Tables(s, dir, "orders")
      val unchanged = MergeOps.unchangedIds(a, snapshotB(s, dir, forMerge = true),
        "o_orderkey", Seq("o_orderstatus", "o_orderpriority"))
      a.join(unchanged, Seq("o_orderkey"), "left_semi").orderBy(col("o_orderkey"))
    },
    Some(s"""
      WITH $SnapBMerge, $UnchangedCte
      SELECT a.* FROM orders a
      WHERE EXISTS (SELECT 1 FROM unchanged WHERE uk = a.o_orderkey)
      ORDER BY o_orderkey
    """.trim))

  /** J4 — left-anti: incoming rows that are new or modified. */
  val j04 = Q(
    "j4_new_or_modified_anti",
    (s, dir) => {
      val a = Tables(s, dir, "orders")
      val b = snapshotB(s, dir, forMerge = true)
      val unchanged = MergeOps.unchangedIds(a, b, "o_orderkey",
        Seq("o_orderstatus", "o_orderpriority"))
      b.join(unchanged, Seq("o_orderkey"), "left_anti").orderBy(col("o_orderkey"))
    },
    Some(s"""
      WITH $SnapBMerge, $UnchangedCte
      SELECT b.* FROM snap_b b
      WHERE NOT EXISTS (SELECT 1 FROM unchanged WHERE uk = b.o_orderkey)
      ORDER BY o_orderkey
    """.trim))

  /** U2 — the full merge/upsert: semi ∪ anti, all-string, sorted by the
    * stringified id (lexicographic — faithful to the reference's
    * stringify-then-sort, log_handler.py:119-128).
    */
  val u01 = Q(
    "u2_merge_upsert",
    (s, dir) =>
      MergeOps.tableUpdated(Tables(s, dir, "orders"), snapshotB(s, dir, forMerge = true),
        "o_orderkey", Seq("o_orderstatus", "o_orderpriority")),
    Some(s"""
      WITH $SnapBMerge, $UnchangedCte
      SELECT o_orderkey::VARCHAR AS o_orderkey, o_custkey::VARCHAR AS o_custkey,
             o_orderstatus, o_totalprice::VARCHAR AS o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate, o_orderpriority
      FROM (SELECT a.* FROM orders a
            WHERE EXISTS (SELECT 1 FROM unchanged WHERE uk = a.o_orderkey)
            UNION ALL
            SELECT b.* FROM snap_b b
            WHERE NOT EXISTS (SELECT 1 FROM unchanged WHERE uk = b.o_orderkey))
      ORDER BY o_orderkey
    """.trim))

  /** U5 — SCD type-2 history build from the two snapshots: one full
    * outer join classifies every key (insert/delete/update/unchanged),
    * then a generator emits the closed-out and/or current version rows —
    * one pass, no per-branch re-join (the UNION ALL the oracle spells
    * out would re-execute the join per branch). The null-sensitive
    * change predicate matches the merge family's unchanged-ids
    * semantics.
    */
  val u05 = Q(
    "u5_scd2_history",
    (s, dir) => {
      val a = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("ka"), col("o_orderstatus").as("sa"),
          col("o_orderpriority").as("pa"))
      val b = snapshotB(s, dir, forMerge = true)
        .select(col("o_orderkey").as("kb"), col("o_orderstatus").as("sb"),
          col("o_orderpriority").as("pb"))
      val hist = lit("1995-01-01 00:00:00").cast("timestamp")
      val run = lit("2026-08-12 00:00:00").cast("timestamp")
      val unchanged =
        coalesce(!(col("sa") =!= col("sb")) && !(col("pa") =!= col("pb")), lit(false))
      val cls = when(col("ka").isNull, "insert").when(col("kb").isNull, "delete")
        .when(unchanged, "unchanged").otherwise("update")
      val oldRow = struct(col("sa").as("st"), hist.as("vf"),
        when(col("cls").isin("update", "delete"), run).as("vt"),
        when(col("cls") === "unchanged", 1L).otherwise(0L).as("cur"))
      val newRow = struct(col("sb").as("st"), run.as("vf"),
        lit(null).cast("timestamp").as("vt"), lit(1L).as("cur"))
      a.join(b, col("ka") === col("kb"), "full_outer")
        .withColumn("cls", cls)
        .select(coalesce(col("ka"), col("kb")).as("o_orderkey"),
          explode(array(
            when(col("ka").isNotNull, oldRow),
            when(col("cls").isin("insert", "update"), newRow))).as("r"))
        .filter(col("r").isNotNull)
        .select(col("o_orderkey"), col("r.st").as("o_orderstatus"),
          col("r.vf").as("valid_from"), col("r.vt").as("valid_to"),
          col("r.cur").as("is_current"))
        .orderBy(col("o_orderkey"), col("is_current"), col("valid_from"))
    },
    Some(s"""
      WITH $SnapBMerge,
      j AS (SELECT a.o_orderkey AS ka, a.o_orderstatus AS sa, a.o_orderpriority AS pa,
                   b.o_orderkey AS kb, b.o_orderstatus AS sb, b.o_orderpriority AS pb
            FROM orders a FULL JOIN snap_b b ON a.o_orderkey = b.o_orderkey),
      c AS (SELECT *, CASE WHEN ka IS NULL THEN 'insert'
                           WHEN kb IS NULL THEN 'delete'
                           WHEN coalesce(NOT (sa <> sb) AND NOT (pa <> pb), false)
                                THEN 'unchanged'
                           ELSE 'update' END AS cls
            FROM j)
      SELECT coalesce(ka, kb) AS o_orderkey, sa AS o_orderstatus,
             TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
             CASE WHEN cls IN ('update', 'delete')
                  THEN TIMESTAMP '2026-08-12 00:00:00' END AS valid_to,
             (CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END)::BIGINT AS is_current
      FROM c WHERE ka IS NOT NULL
      UNION ALL
      SELECT coalesce(ka, kb), sb, TIMESTAMP '2026-08-12 00:00:00', NULL, 1::BIGINT
      FROM c WHERE cls IN ('insert', 'update')
      ORDER BY o_orderkey, is_current, valid_from
    """.trim))

  /** O1 — top-1 by recency with a unique tiebreak (the reference's
    * newest-file pick, extraction_layer.py:33-36, as TakeOrderedAndProject).
    */
  val o01 = Q(
    "o1_top1_latest",
    (s, dir) =>
      Tables(s, dir, "events")
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(1)
        .select(col("event_id"), col("ts")),
    Some("SELECT event_id, ts FROM events ORDER BY ts DESC, event_id DESC LIMIT 1"))

  def all: Seq[Q] = Seq(j01, j02, a01, j03, j04, u01, u05, o01)
}
