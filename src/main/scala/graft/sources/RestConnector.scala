package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** REST-shaped implementation of the connector seam — the shape a live
  * Drive/Sheets (or any object-store + sheet API) deployment has, with
  * the reference's remote-I/O semantics made explicit and testable
  * against a local HTTP stub (EtlRunnerSpec):
  *
  *  - paged catalog listing: `GET {base}/objects?container=..&pageSize=..
  *    [&pageToken=..]` → `{"files":[{id,name,mimeType,parent,createdTime,
  *    modifiedTime}..], "nextPageToken": ".."}`, looped until the token
  *    is absent — the files.list pagination loop of
  *    `/root/reference/src/gdrive_handler.py:115-166`;
  *  - chunked media download: `GET {base}/objects/{id}/media` with
  *    `Range: bytes=a-b` per chunk until complete — the
  *    MediaIoBaseDownload next_chunk loop of
  *    `/root/reference/src/gdrive_handler.py:220-260`;
  *  - full-refresh sheet write: `POST {base}/sheets/{id}/clear` then
  *    `PUT {base}/sheets/{id}/values` with the header row first — the
  *    values().clear + values().update(USER_ENTERED) pair of
  *    `/root/reference/src/gsheets_handler.py:119-171`;
  *  - sheet read: `GET {base}/sheets/{id}/values` → `{"values":[[..]..]}`
  *    row lists, row 0 the header, ragged rows repaired to header width
  *    (`/root/reference/src/gsheets_handler.py:81-117`).
  *
  * Transient faults (HTTP 429/5xx, connection errors) retry with bounded
  * linear backoff — per REQUEST, so one flaky chunk re-fetches only that
  * chunk's range, not the whole object.
  *
  * All HTTP runs driver-side: catalog pages, sheet payloads and raw CSV
  * objects are driver-small by the reference's own design (it buffers
  * whole files in memory); the cluster-scale data path stays parquet.
  * Downloads spool to a per-connector temp dir so extraction feeds the
  * SAME tolerant CSV reader as every other source ([[CsvSource]]) —
  * the remote boundary changes, the engine semantics don't. `writeTable`
  * stays a parquet sink: in the reference too, the analytical store
  * (DuckDB) is local even when sources and exports are remote.
  */
class RestConnector(baseUrl: String, pageSize: Int = 100,
    chunkSize: Int = 256 * 1024, maxRetries: Int = 3, retryBackoffMs: Long = 50)
  extends SourceConnector with SinkConnector {

  require(pageSize >= 1 && chunkSize >= 1 && maxRetries >= 0)

  private val mapper = new ObjectMapper()
  private val spool = {
    val d = java.nio.file.Files.createTempDirectory("graft_rest_")
    d.toFile.deleteOnExit()
    d
  }

  // ---- HTTP plumbing -----------------------------------------------------

  private final case class HttpResponse(status: Int, body: Array[Byte],
      contentRange: Option[String] = None)

  /** One HTTP exchange. Only 2xx returns; 429/5xx and connect/read
    * failures throw retryably, other statuses fail loudly.
    */
  private def exchange(method: String, url: String,
      headers: Map[String, String], body: Option[Array[Byte]]): HttpResponse = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        conn.getOutputStream.write(b)
      }
      val status = conn.getResponseCode
      val in = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val bytes =
        if (in == null) Array.emptyByteArray
        else try in.readAllBytes() finally in.close()
      HttpResponse(status, bytes, Option(conn.getHeaderField("Content-Range")))
    } finally conn.disconnect()
  }

  /** Bounded-retry wrapper: transient statuses/IO errors retry with
    * linear backoff, anything else (4xx contract errors) fails fast.
    * `acceptStatus` marks non-2xx statuses the CALLER treats as a
    * normal outcome (e.g. 416 as end-of-object in the chunk loop).
    */
  private def request(method: String, url: String,
      headers: Map[String, String] = Map.empty,
      body: Option[Array[Byte]] = None,
      acceptStatus: Set[Int] = Set.empty): HttpResponse = {
    var attempt = 0
    var last: Either[Throwable, HttpResponse] = null
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(retryBackoffMs * attempt)
      last =
        try {
          val r = exchange(method, url, headers, body)
          if (r.status == 429 || r.status >= 500) Left(new java.io.IOException(
            s"$method $url -> HTTP ${r.status} (transient)"))
          else Right(r)
        } catch { case e: java.io.IOException => Left(e) }
      last match {
        case Right(r) if (r.status >= 200 && r.status < 300) ||
          acceptStatus(r.status) => return r
        case Right(r) => throw new IllegalStateException(
          s"$method $url -> HTTP ${r.status}: ${new String(r.body, "UTF-8").take(200)}")
        case Left(_) => attempt += 1
      }
    }
    throw new java.io.IOException(
      s"$method $url failed after ${maxRetries + 1} attempts", last.swap.toOption.orNull)
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def parse(body: Array[Byte]): JsonNode =
    mapper.readTree(new String(body, "UTF-8"))

  // ---- SourceConnector ---------------------------------------------------

  def listObjects(spark: SparkSession, container: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val metas = scala.collection.mutable.ArrayBuffer.empty[graft.etl.CatalogOps.FileMeta]
    var pageToken: Option[String] = None
    var pages = 0
    while (pages == 0 || pageToken.isDefined) {
      val tok = pageToken.map(t => s"&pageToken=${enc(t)}").getOrElse("")
      val page = parse(request("GET",
        s"$baseUrl/objects?container=${enc(container)}&pageSize=$pageSize$tok").body)
      page.path("files").elements().asScala.foreach { f =>
        metas += graft.etl.CatalogOps.FileMeta(
          id = f.path("id").asText(),
          name = f.path("name").asText(),
          mimeType = f.path("mimeType").asText("file"),
          parent = f.path("parent").asText(container),
          createdTime = java.sql.Timestamp.from(
            java.time.Instant.parse(f.path("createdTime").asText())),
          modifiedTime = java.sql.Timestamp.from(
            java.time.Instant.parse(f.path("modifiedTime").asText())))
      }
      pageToken = Option(page.get("nextPageToken")).filter(!_.isNull).map(_.asText())
        .filter(_.nonEmpty)
      pages += 1
      require(pages <= 100000, s"catalog paging for $container did not terminate")
    }
    spark.createDataset(metas.toSeq)(
      Encoders.product[graft.etl.CatalogOps.FileMeta]).toDF()
  }

  /** `bytes a-b/total` → the declared total length, when the server
    * gives one (`*` means unknown and stays None).
    */
  private def contentRangeTotal(r: HttpResponse): Option[Long] =
    r.contentRange.map(_.trim).flatMap { v =>
      v.split("/", 2) match {
        case Array(_, t) if t.nonEmpty && t.forall(_.isDigit) => Some(t.toLong)
        case _ => None
      }
    }

  /** Ranged chunk loop: ask for `chunkSize` bytes at a time. Termination
    * is by EVIDENCE, never by a short body — a 206 shorter than the
    * requested span is legal mid-object (RFC 9110 §14.4) and a truncated
    * connection can surface the same way, so guessing EOF from it would
    * silently hand a cut-off file to the CSV reader. The loop ends on:
    * a 200 (server ignored Range: the body IS the whole object), a 416
    * (start offset at/past EOF — what an RFC-compliant server answers
    * after an exact-multiple-of-chunkSize object, and for empty objects
    * on the first request), the offset reaching the Content-Range
    * declared total, or — when the server declares no total — an empty
    * 206 body. A short chunk mid-object just continues from the new
    * offset; an EMPTY 206 before a declared total is no-progress
    * truncation and fails loudly.
    */
  private def download(objectId: String): java.nio.file.Path = {
    val out = spool.resolve(
      java.util.UUID.nameUUIDFromBytes(objectId.getBytes("UTF-8")).toString + ".bin")
    val buf = new java.io.ByteArrayOutputStream()
    var offset = 0L
    var done = false
    while (!done) {
      val r = request("GET", s"$baseUrl/objects/${enc(objectId)}/media",
        headers = Map("Range" -> s"bytes=$offset-${offset + chunkSize - 1}"),
        acceptStatus = Set(416))
      r.status match {
        case 416 => done = true
        case 200 => // whole object in one response, regardless of prior chunks
          buf.reset(); buf.write(r.body); done = true
        case _ =>
          val total = contentRangeTotal(r)
          require(r.body.nonEmpty || total.forall(offset >= _),
            s"object $objectId: empty 206 at offset $offset of declared " +
              s"${total.getOrElse(-1L)} bytes — truncated download")
          buf.write(r.body)
          offset += r.body.length
          done = total match {
            case Some(t) => offset >= t
            case None => r.body.isEmpty
          }
      }
    }
    java.nio.file.Files.write(out, buf.toByteArray)
    out
  }

  def readCsv(spark: SparkSession, objectId: String, sep: String = ";",
      encoding: String = "latin1", skipLines: Int = 1): DataFrame =
    CsvSource.readReferenceCsv(spark, download(objectId).toString,
      sep, encoding, skipLines)

  def readSheet(spark: SparkSession, objectId: String, sep: String = ",",
      encoding: String = "UTF-8"): DataFrame = {
    import scala.jdk.CollectionConverters._
    val values = parse(request("GET",
      s"$baseUrl/sheets/${enc(objectId)}/values").body).path("values")
    val rows = values.elements().asScala.map(r =>
      r.elements().asScala.map(c => if (c.isNull) null else c.asText()).toSeq).toSeq
    require(rows.nonEmpty, s"sheet $objectId is empty")
    val header = CsvSource.dedupeHeaders(rows.head.map(h => Option(h).getOrElse("")))
    val data = spark.createDataset(rows.tail.map(Tuple1(_)))(
      Encoders.product[Tuple1[Seq[String]]])
    graft.etl.ShapeOps.rowsToTable(data.toDF("__row"), "__row", header)
  }

  // ---- SinkConnector -----------------------------------------------------

  def writeTable(df: DataFrame, target: String, partitionBy: Seq[String] = Nil): Unit =
    Sinks.writeParquet(df, target, partitionBy)

  /** Clear-then-update full refresh, header row first, every cell
    * stringified (nulls stay JSON null, as the reference's row payload
    * does). The collect is bounded: a sheet export is a driver-small
    * report surface by nature, and the cap turns misuse (a corpus
    * routed to a sheet) into a loud error instead of a driver OOM.
    * Row order is pinned before the collect — `orderBy` names the sort
    * columns (typed sort, so numeric ids order numerically), defaulting
    * to all columns — because a partition-dependent export order makes
    * every sheet round-trip diff noisy for no reason.
    */
  def writeFullRefreshExport(df: DataFrame, target: String, sep: String = ";"): Unit =
    writeFullRefreshExport(df, target, sep, orderBy = Nil)

  def writeFullRefreshExport(df: DataFrame, target: String, sep: String,
      orderBy: Seq[String]): Unit = {
    val maxRows = 1000000L
    val ord = if (orderBy.nonEmpty) orderBy else df.columns.toSeq
    val all = df
      .orderBy(ord.map(org.apache.spark.sql.functions.col): _*)
      .select(df.columns.map(c =>
        org.apache.spark.sql.functions.col(c).cast("string")): _*)
      .limit(maxRows.toInt + 1).collect()
    require(all.length <= maxRows,
      s"sheet export to $target exceeds $maxRows rows — not a sheet-shaped result")
    val payload: ObjectNode = mapper.createObjectNode()
    val values: ArrayNode = payload.putArray("values")
    val headerRow = values.addArray()
    df.columns.foreach(headerRow.add)
    all.foreach { row =>
      val r = values.addArray()
      (0 until row.length).foreach { i =>
        if (row.isNullAt(i)) r.addNull() else r.add(row.getString(i)): Unit
      }
    }
    request("POST", s"$baseUrl/sheets/${enc(target)}/clear"): Unit
    request("PUT", s"$baseUrl/sheets/${enc(target)}/values",
      body = Some(mapper.writeValueAsBytes(payload))): Unit
  }
}
