package graft

import graft.etl.{AuditOps, MergeOps}
import org.apache.spark.sql.functions._

/** FIXTURES.md §1 — the reference's own golden-path fixture
  * (log_handler.py:131-148): 4-row published vs incoming frames with one
  * modified, one deleted, one added row.
  */
class AuditMergeSpec extends SparkSpec {
  import spark.implicits._

  private val runTs = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)

  def dfA = Seq(
    (1L, "A", 100L), (2L, "B", 200L), (3L, "C", 300L), (4L, "D", 400L)
  ).toDF("id_registro", "valor1", "valor2")

  def dfB = Seq(
    (1L, "A", 100L), (2L, "B_cambiado", 205L), (3L, "C", 300L), (5L, "E", 500L)
  ).toDF("id_registro", "valor1", "valor2")

  test("Q5 authlog (inner): exactly the modified row, annotated") {
    val log = AuditOps.authlog(dfA, dfB, "id_registro", Seq("valor1", "valor2"),
      "test/fixture", "run-1", runTs)
    val rows = log.collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("tipo_cambio") == "Modificado")
    assert(r.getAs[String]("id_log") == "run-1")
    assert(r.getAs[String]("fuente_log") == "test/fixture")
    assert(r.getAs[Long]("id_registro") == 2L)
    assert(r.getAs[String]("valor1") == "B" && r.getAs[String]("valor1_modeled") == "B_cambiado")
    assert(r.getAs[Long]("valor2") == 200L && r.getAs[Long]("valor2_modeled") == 205L)
    // P19 explicit column order
    assert(log.columns.toSeq == Seq("id_log", "fecha_modificacion", "tipo_cambio",
      "fuente_log", "id_registro", "id_registro_modeled",
      "valor1", "valor1_modeled", "valor2", "valor2_modeled"))
  }

  test("Q5 authlog (full outer): Nuevo and Eliminado become reachable") {
    val log = AuditOps.authlog(dfA, dfB, "id_registro", Seq("valor1", "valor2"),
      "test/fixture", "run-1", runTs, fullOuter = true)
    val tipos = log.select("tipo_cambio").as[String].collect().sorted.toSeq
    assert(tipos == Seq("Eliminado", "Modificado", "Nuevo"))
  }

  test("J2 unchanged ids: {1,3}; null audit value counts as changed") {
    val ids = MergeOps.unchangedIds(dfA, dfB, "id_registro", Seq("valor1", "valor2"))
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L))
    // a null in an audit column drops the row from 'unchanged' (P22)
    val bNull = Seq((1L, null.asInstanceOf[String], 100L), (3L, "C", 300L))
      .toDF("id_registro", "valor1", "valor2")
    val ids2 = MergeOps.unchangedIds(dfA, bNull, "id_registro", Seq("valor1", "valor2"))
      .as[Long].collect().toSeq
    assert(ids2 == Seq(3L))
  }

  test("U2 merge: unchanged(A) ∪ new-or-modified(B), all-string, sorted") {
    val merged = MergeOps.tableUpdated(dfA, dfB, "id_registro", Seq("valor1", "valor2"))
    assert(merged.schema.fields.forall(_.dataType.typeName == "string"))
    val got = merged.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("1", "A", "100"), ("2", "B_cambiado", "205"),
      ("3", "C", "300"), ("5", "E", "500")))
  }
}
