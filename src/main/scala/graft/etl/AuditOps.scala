package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q5 — audit/change-log builder (`/root/reference/src/log_handler.py:43-94`).
  *
  * Joins the raw and modeled snapshots of an entity on its PK, keeps rows
  * whose audit columns differ, and annotates run metadata. The reference's
  * inner join makes the Nuevo/Eliminado branches of `tipo_cambio`
  * unreachable (log_handler.py:72-75 — its `{id}_b` column is a latent
  * bug); `fullOuter = true` implements the coherent semantics behind a
  * flag (SURVEY.md §7.3).
  *
  * Run metadata (`runId`, `runTs`) is injected by the caller — the
  * reference evaluates `uuid4()`/`now()` once per run (log_handler.py:64-70),
  * i.e. a per-run literal, which also keeps the oracle deterministic.
  */
object AuditOps {

  val Suffix = "_modeled"

  /** J1 — polars-style suffix join: every right column is renamed with
    * the suffix (Spark has no suffix argument; rename-then-join).
    */
  def joinWithSuffix(a: DataFrame, b: DataFrame, on: String,
      suffix: String = Suffix, how: String = "inner"): DataFrame = {
    val bRen = b.toDF(b.columns.map(_ + suffix).toIndexedSeq: _*)
    a.join(bRen, a(on) === bRen(on + suffix), how)
  }

  /** P16 — OR-fold change predicate over audit columns: changed iff both
    * sides non-null and unequal (log_handler.py:54-59).
    */
  def changePredicate(targetCols: Seq[String], suffix: String = Suffix): Column =
    targetCols
      .map(c => col(c).isNotNull && col(c + suffix).isNotNull && col(c) =!= col(c + suffix))
      .reduce(_ || _)

  /** P18 — change-type categorization over the joined frame. */
  def tipoCambio(idCol: String, suffix: String = Suffix): Column =
    when(col(idCol).isNull, "Nuevo")
      .when(col(idCol + suffix).isNull, "Eliminado")
      .otherwise("Modificado")

  def authlog(raw: DataFrame, modeled: DataFrame, idCol: String,
      targetCols: Seq[String], fuenteLog: String, runId: String,
      runTs: java.time.LocalDateTime, fullOuter: Boolean = false): DataFrame = {
    val how = if (fullOuter) "full_outer" else "inner"
    val joined = joinWithSuffix(raw, modeled, idCol, Suffix, how)
    val changed =
      if (fullOuter)
        changePredicate(targetCols) || col(idCol).isNull || col(idCol + Suffix).isNull
      else changePredicate(targetCols)
    // P17 annotations + P19 explicit column order (log_handler.py:64-93)
    val ordered: Seq[Column] =
      Seq(lit(runId).as("id_log"), lit(runTs).as("fecha_modificacion"),
        tipoCambio(idCol).as("tipo_cambio"), lit(fuenteLog).as("fuente_log"),
        col(idCol), col(idCol + Suffix)) ++
        targetCols.flatMap(c => Seq(col(c), col(c + Suffix)))
    joined.filter(changed).select(ordered: _*)
  }
}
