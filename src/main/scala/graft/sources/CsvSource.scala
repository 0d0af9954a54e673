package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S1/S3 — the reference's tolerant CSV ingestion
  * (`/root/reference/src/gdrive_handler.py:220-260`): semicolon-separated,
  * latin1, junk leading line(s), ragged rows, duplicate headers.
  *
  * Spark mapping:
  *  - header is read driver-side (a few lines through Hadoop FS — works
  *    for any scheme, no full-file read);
  *  - data lines are decoded per-file in executors (charset-aware; Spark's
  *    text reader assumes UTF-8) and parsed with an explicit all-string
  *    schema in PERMISSIVE mode — short rows null-pad, long rows truncate,
  *    exactly the reference's `truncate_ragged_lines` + null padding;
  *  - duplicate headers are renamed `{name}_duplicated_{n}` (polars'
  *    convention), so the downstream P1 drop behaves identically.
  *
  * Scale note: per-file whole-buffer decode mirrors the reference's
  * in-memory download (it warns at 10 MB); the bulk-data path of this
  * engine is parquet, CSV is the ingestion edge.
  */
object CsvSource {

  /** Polars-style duplicate-header rename. */
  def dedupeHeaders(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      seen.get(n) match {
        case None => seen(n) = 0; n
        case Some(k) => seen(n) = k + 1; s"${n}_duplicated_$k"
      }
    }
  }

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\"")) t.substring(1, t.length - 1)
    else t
  }

  /** Reads the header line (after `skipLines` junk lines) driver-side. */
  def readHeader(spark: SparkSession, path: String, sep: String,
      encoding: String, skipLines: Int): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), encoding))
    try {
      (0 until skipLines).foreach(_ => br.readLine())
      val line = Option(br.readLine()).getOrElse(
        throw new IllegalArgumentException(s"$path has no header line after skipping $skipLines"))
      line.split(java.util.regex.Pattern.quote(sep), -1).toSeq.map(stripQuotes)
    } finally br.close()
  }

  private val log = org.apache.log4j.Logger.getLogger(getClass)

  def readReferenceCsv(spark: SparkSession, path: String, sep: String = ";",
      encoding: String = "latin1", skipLines: Int = 1): DataFrame = {
    // Q4 — size guard (gdrive_handler.py:235-239 warns past 10 MB)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getFileStatus(p).getLen
    if (bytes > 10L * 1024 * 1024)
      log.warn(f"$path is ${bytes / 1048576.0}%.1f MB (> 10 MB guard)")
    val names = dedupeHeaders(readHeader(spark, path, sep, encoding, skipLines))
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val drop = skipLines + 1
    val dataLines = spark.createDataset(
      spark.sparkContext.binaryFiles(path).values.flatMap { pds =>
        val content = new String(pds.toArray(), java.nio.charset.Charset.forName(encoding))
        content.split("\r?\n", -1).iterator.drop(drop).filterNot(_.isEmpty)
      })(Encoders.STRING)
    spark.read
      .schema(schema)
      .option("sep", sep)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .csv(dataLines)
  }
}
