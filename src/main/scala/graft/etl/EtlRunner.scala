package graft.etl

import graft.sources.{LocalFsConnector, SinkConnector, SourceConnector}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's orchestrator (`/root/reference/etl.py:22-119`,
  * `ETLDataPipeline`) as a typed, explicit pipeline:
  *
  *   catalog (S12/P23/O1: newest raw file for the entity)
  *     → extract (S1 reference-CSV read)
  *     → transform (F1 registry: raw_{entity})
  *     → load (S8 parquet sink, full refresh)
  *     → optional integrate (Q5 authlog + U2 merge vs the previous
  *       modeled snapshot — the reference's dormant-but-complete path,
  *       log_handler.py:43-128)
  *
  * Replaces reflection-with-silent-None dispatch with explicit errors
  * (SURVEY.md §7.3). All steps are lazy DataFrame chains; only the sink
  * actions execute.
  *
  * Remote I/O goes through the [[graft.sources.SourceConnector]] /
  * [[graft.sources.SinkConnector]] seam: the default
  * [[graft.sources.LocalFsConnector]] reads/writes the local FS, and a
  * cloud deployment passes its own connector pair — the lifecycle code
  * below never touches a filesystem API directly for extract/load.
  */
object EtlRunner {

  final case class RunResult(
      sourceFile: String, rows: Long, modeledPath: String,
      authlogRows: Option[Long])

  def run(spark: SparkSession, rawDir: String, modeledDir: String,
      entity: String, today: java.sql.Date,
      dictionary: Seq[DictColumn] = Nil,
      auditCols: Seq[String] = Nil,
      runId: String = "run-1",
      runTs: java.time.LocalDateTime = java.time.LocalDateTime.of(2026, 8, 12, 0, 0),
      source: SourceConnector = LocalFsConnector,
      sink: SinkConnector = LocalFsConnector): RunResult = {

    // catalog: newest raw file for the entity (etl.py:32-49 + O1)
    val meta = source.listObjects(spark, rawDir)
    val candidates = CatalogOps.filterByEntity(meta, entity)
    val latest = CatalogOps.latest(candidates).collect()
    require(latest.nonEmpty, s"no raw file for entity '$entity' in $rawDir")
    val file = latest(0).getAs[String]("id")

    // extract + transform
    val raw = source.readCsv(spark, file)
    val cleaned = entity match {
      case "creditos" => Pipelines.cleanCreditos(raw, today)
      case "radicados" => Pipelines.cleanRadicados(raw)
      case other => Pipelines.transform(other, "raw", raw)
    }
    val typed =
      if (dictionary.nonEmpty) DictionaryOps.castByDictionary(cleaned, dictionary)
      else cleaned

    // integrate against the previous modeled snapshot, if one exists
    val modeledPath = s"$modeledDir/$entity"
    val previous: Option[DataFrame] =
      if (new java.io.File(modeledPath).exists())
        Some(spark.read.parquet(modeledPath))
      else None
    val authlogRows = previous.flatMap { prev =>
      if (auditCols.nonEmpty && dictionary.nonEmpty) {
        val id = DictionaryOps.primaryKey(dictionary)
        val log = AuditOps.authlog(prev, typed, id, auditCols,
          fuenteLog = s"$rawDir/$entity", runId = runId, runTs = runTs)
        sink.writeTable(log, s"$modeledDir/${entity}_authlog")
        Some(log.count())
      } else None
    }
    val toWrite = previous match {
      case Some(prev) if auditCols.nonEmpty && dictionary.nonEmpty =>
        MergeOps.tableUpdated(prev, typed,
          DictionaryOps.primaryKey(dictionary), auditCols)
      case _ => typed
    }

    // load (full refresh, S8) — write to a temp dir then swap, so the
    // previous snapshot (still referenced by the lazy merge plan) isn't
    // clobbered mid-read
    val tmp = modeledPath + "__tmp"
    sink.writeTable(toWrite, tmp)
    val out = spark.read.parquet(tmp)
    val n = out.count()
    val target = new java.io.File(modeledPath)
    if (target.exists()) {
      val old = new java.io.File(modeledPath + "__old")
      deleteRecursively(old)
      target.renameTo(old)
      deleteRecursively(old)
    }
    new java.io.File(tmp).renameTo(target)
    RunResult(file, n, modeledPath, authlogRows)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
