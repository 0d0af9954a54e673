package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines ingestion for document corpora (the dominant wire format
  * for web-scraped training data). Same tolerance posture as the CSV
  * source: PERMISSIVE parse with an explicit schema, malformed lines
  * preserved in a `_corrupt_record` column instead of failing the job —
  * at 100 TB a single bad line must never kill a scan, and the corrupt
  * rows remain queryable for quarantine/repair.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with the given schema; malformed lines land in
    * `_corrupt_record` (all other fields null), well-formed lines have a
    * null `_corrupt_record`.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Split a JSONL read into (clean rows without the corrupt column,
    * quarantined raw lines). The input is cached first: Spark disallows
    * scans whose pruned schema is only `_corrupt_record`
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and a
    * quarantine split reads the frame twice anyway.
    */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    val clean = cached.filter(cached(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.filter(cached(CorruptCol).isNotNull).select(cached(CorruptCol))
    (clean, bad)
  }
}
