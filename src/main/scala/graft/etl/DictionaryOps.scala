package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One row of the schema dictionary (the reference's
  * `data_dictionary/Diccionario_FBS.xlsx`: columns Nombre_columna, Tipo,
  * Jerarquia, Sujeto_auditoria — SURVEY.md §1.2). Kept as code/CSV, not
  * xlsx (no xlsx reader in OSS Spark; SURVEY.md §7.3).
  */
final case class DictColumn(
    name: String,
    tipo: String, // Integer | String | Timestamp | Float | Bool
    jerarquia: String = "0", // PK | FK | 0 | 1
    audit: Boolean = false)

/** P15/P24 — dictionary-driven cast pass (log_handler.py:7-40).
  *
  * Type mapping mirrors the reference exactly (log_handler.py:8-15):
  * Integer→Long, String→String, Timestamp→Timestamp(dd/MM/yyyy when the
  * column is still a string), Float→Double, and — deliberate quirk —
  * **Bool→String**. Columns in the dictionary but absent from the frame
  * are skipped with a warning (log_handler.py:34-36).
  */
object DictionaryOps {
  private val log = org.apache.log4j.Logger.getLogger(getClass)

  def castByDictionary(df: DataFrame, dict: Seq[DictColumn],
      dateFormat: String = "dd/MM/yyyy"): DataFrame = {
    val present = df.columns.toSet
    val exprs = df.columns.map { c =>
      dict.find(_.name == c) match {
        case Some(d) => d.tipo match {
          case "Integer" => col(c).cast(LongType).as(c)
          case "Float"   => col(c).cast(DoubleType).as(c)
          case "Bool"    => col(c).cast(StringType).as(c)
          case "String"  => col(c).cast(StringType).as(c)
          case "Timestamp" =>
            if (df.schema(c).dataType == StringType)
              to_timestamp(col(c), dateFormat).cast(TimestampNTZType).as(c)
            else col(c).cast(TimestampNTZType).as(c)
          case other =>
            log.warn(s"dictionary: unknown Tipo '$other' for column $c — left as-is")
            col(c)
        }
        case None => col(c)
      }
    }
    dict.filterNot(d => present(d.name)).foreach { d =>
      log.warn(s"dictionary: column ${d.name} not in frame — skipped")
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** P24 — PK column name from the dictionary (etl.py:107). */
  def primaryKey(dict: Seq[DictColumn]): String =
    dict.find(_.jerarquia == "PK")
      .getOrElse(throw new IllegalArgumentException("dictionary has no PK row"))
      .name

  /** Audit-relevant column names (Sujeto_auditoria flag). */
  def auditColumns(dict: Seq[DictColumn]): Seq[String] =
    dict.filter(_.audit).map(_.name)
}
