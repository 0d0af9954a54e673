package graft

import graft.etl.{Dictionaries, EtlRunner}
import java.nio.charset.Charset
import java.nio.file.Files

/** End-to-end orchestrator test: two successive radicados loads with a
  * modification between them → merge + authlog, mirroring the
  * reference's raw→modeled flow plus its dormant integrate path.
  */
class EtlRunnerSpec extends SparkSpec {

  private def writeCsv(dir: java.nio.file.Path, name: String, rows: Seq[String]): Unit = {
    val header = "Radicado;Fecha Radicacion;Procedencia;Detalle;Naturaleza;" +
      "Medio;Expediente;Destino;Rpta;Opciones"
    Files.write(dir.resolve(name),
      (Seq("JUNK", header) ++ rows).mkString("\n").getBytes(Charset.forName("ISO-8859-1")))
  }

  test("catalog → extract → transform → load → integrate, end to end") {
    val raw = Files.createTempDirectory("raw_")
    val modeled = Files.createTempDirectory("mod_")
    val today = java.sql.Date.valueOf("2026-08-12")

    writeCsv(raw, "raw_radicados.csv", Seq(
      "100;15/03/2024 14:30;PEPE;asunto;N;WEB;E1;PROFESIONAL-GGC-JUAN PEREZ;0;",
      "101;16/03/2024 09:00;ANA;otro;N;WEB;E2;MARIA LOPEZ;1;"))
    val r1 = EtlRunner.run(spark, raw.toString, modeled.toString, "radicados",
      today, Dictionaries.radicados, auditCols = Seq("Rpta", "funcionario_destino"))
    assert(r1.rows == 2 && r1.authlogRows.isEmpty) // first run: nothing to diff
    val first = spark.read.parquet(r1.modeledPath)
    assert(first.count() == 2)
    assert(first.filter(first("Radicado") === "100")
      .select("grupo_destino").collect()(0).getString(0) == "Grupo de gestion de cesantias")

    // second snapshot: 100 answered (Rpta flips), 102 appears
    writeCsv(raw, "raw2_radicados.csv", Seq(
      "100;15/03/2024 14:30;PEPE;asunto;N;WEB;E1;PROFESIONAL-GGC-JUAN PEREZ;1;",
      "101;16/03/2024 09:00;ANA;otro;N;WEB;E2;MARIA LOPEZ;1;",
      "102;17/03/2024 10:00;LUIS;nuevo;N;WEB;E3;ASESOR-GTICS-ANA RUIZ;0;"))
    val r2 = EtlRunner.run(spark, raw.toString, modeled.toString, "radicados",
      today, Dictionaries.radicados, auditCols = Seq("Rpta", "funcionario_destino"))
    assert(r2.sourceFile.endsWith("raw2_radicados.csv")) // newest file picked
    assert(r2.authlogRows.contains(1L)) // exactly the Rpta change on 100
    val merged = spark.read.parquet(r2.modeledPath)
    assert(merged.count() == 3)
    assert(merged.filter(merged("Radicado") === "100")
      .select("Rpta").collect()(0).getString(0) == "1") // refreshed value won
    val log = spark.read.parquet(modeled.toString + "/radicados_authlog")
    assert(log.count() == 1)
    assert(log.select("tipo_cambio").collect()(0).getString(0) == "Modificado")
  }
}
