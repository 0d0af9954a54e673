package graft.etl

/** The reference's full schema dictionary
  * (`/root/reference/data_dictionary/Diccionario_FBS.xlsx`, sheets
  * `creditos` (47 logical columns) and `radicados` (14)), transcribed as
  * code per the §7.3 decision (no xlsx reader in OSS Spark; semantics
  * live in the registry).
  *
  * Faithful quirks preserved: duplicate logical names (`FormaPago`,
  * `Periodicidad` twice — the reason the physical creditos header needs
  * duplicate-header renaming, SURVEY.md §1.3), `Tipo70 / 30` as Bool
  * (→ String per the reference's type map), PK `Crédito` typed String.
  * `jerarquia`: PK/FK/"" as in the sheet; `audit` = Sujeto_auditoria,
  * derived columns carry Calculado=1 (`derived = true`).
  */
object Dictionaries {

  private def c(name: String, tipo: String, jerarquia: String = "",
      audit: Boolean = false): DictColumn =
    DictColumn(name, tipo, jerarquia, audit)

  val creditos: Seq[DictColumn] = Seq(
    c("Dias Mora Actual", "Integer"),
    c("Crédito", "String", jerarquia = "PK"),
    c("EstadoCrédito", "String", audit = true),
    c("Monto", "Float"),
    c("Saldo", "Float"),
    c("Plazo", "Integer"),
    c("FechaSolicitud", "Timestamp"),
    c("CódigoLínea", "String"),
    c("Línea", "String"),
    c("CuotasPagas", "Integer"),
    c("TasaInterés", "Float", audit = true),
    c("FormaPago", "String"),
    c("Categoría", "String"),
    c("ValorCuota", "Float", audit = true),
    c("IdentificaciónDeudor", "String", jerarquia = "FK"),
    c("CategoríaDeudor", "String"),
    c("Nombre Deudor", "String"),
    c("VencimientoCuota", "Timestamp"),
    c("DirecciónResidencia", "String"),
    c("DirecciónCorrespondencia", "String"),
    c("E Mail", "String", jerarquia = "FK"),
    c("NúmeroVez", "Integer"),
    c("Municipio Residencia", "String"),
    c("Departamento Residencia", "String"),
    c("Monto Aprobado", "Float"),
    c("Fecha Acta Aprobación", "Timestamp", audit = true),
    c("ActaAprobación", "String"),
    c("Destino", "String"),
    c("Estado", "String"),
    c("FechaGiro", "Timestamp", audit = true),
    c("FechaIngreso", "Timestamp", audit = true),
    c("FechaInicio", "Timestamp", audit = true),
    c("FechaLegalización", "Timestamp", audit = true),
    c("FormaPago", "String"), // duplicate logical name (sheet rows 12/34)
    c("Indice Color", "String"),
    c("LíneaCrédito", "String", audit = true),
    c("NombreCategoría", "String"),
    c("Observaciones", "String"),
    c("Pagaduría", "String"),
    c("Periodicidad", "String"),
    c("Periodicidad", "String"), // duplicate logical name (rows 40/41)
    c("Tipo70 / 30", "Bool"),
    c("tiempo_solicitud_giro", "Integer"),
    c("tiempo_solicitud_inicio", "Integer"),
    c("tiempo_solicitud_legalizacion", "Integer"),
    c("fecha_actual", "Timestamp"),
    c("tiempo_de_espera", "Integer"))

  val radicados: Seq[DictColumn] = Seq(
    c("Radicado", "String", jerarquia = "PK"),
    c("Fecha Radicacion", "Timestamp"),
    c("Procedencia", "String", jerarquia = "FK", audit = true),
    c("Detalle", "String"),
    c("Naturaleza", "String"),
    c("Medio", "String"),
    c("Expediente", "String"),
    c("Destino", "String"),
    c("Rpta", "String"),
    c("Opciones", "String"),
    c("cargo_destino", "String"),
    c("cod_grupo_destino", "String"),
    c("funcionario_destino", "String"),
    c("grupo_destino", "String"))
}
