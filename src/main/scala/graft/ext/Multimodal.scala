package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §7.5): media payloads are
  * opaque `binary` columns with a typed metadata struct alongside. The
  * Spark-side mechanics — schema, partition-friendly batch iteration,
  * feature extraction signature — are real; the *decoder* is a
  * deterministic stand-in because image/audio codecs are not available
  * in this environment. A production build swaps `decodeStub` for a JNI
  * / library call without touching the dataflow.
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long, byte_len: Long, avg_byte: Double, header_md5: String)

  /** documents → media table: binary payload + metadata struct. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(lit("text/plain").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder — stands in for image decode / resize / frame-sample.
    * Deterministic so tests and reruns agree.
    */
  private def decodeStub(bytes: Array[Byte]): (Double, String) = {
    val avg = if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes.take(16))
    (avg, md.map("%02x".format(_)).mkString)
  }

  /** Per-partition batch feature extraction over the binary column —
    * the mapPartitions shape a real decoder needs (amortized init, one
    * pass, no driver collect).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real decoder would initialize its codec once per partition here
        it.map { case (id, bytes) =>
          val (avg, md5h) = decodeStub(bytes)
          MediaFeatures(id, bytes.length.toLong, avg, md5h)
        }
      }
  }
}
