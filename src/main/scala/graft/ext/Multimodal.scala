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

  /** Frame sampling over an opaque media payload: cut the byte stream
    * into fixed-`stride` windows and keep the first `frameBytes` of each
    * (a video would decode keyframes; the slicing/generator mechanics are
    * identical). Pure codegen'd expressions — byte slicing happens
    * scan-side, one output row per sampled frame, no UDF and no shuffle.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 128): DataFrame = {
    media
      .withColumn("__frames",
        when(length(col("media")) > 0,
          expr(s"transform(sequence(0, int(ceil(length(media) / $stride.0)) - 1)," +
               s" i -> substring(media, i * $stride + 1, $frameBytes))"))
          .otherwise(expr("array()")))
      .select(col("doc_id"), posexplode(col("__frames")).as(Seq("frame_no", "frame")))
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        col("frame"))
  }

  final case class ResizedMedia(doc_id: Long, media: Array[Byte], out_bytes: Long)

  /** Resize stand-in: clamp/pad each payload to `targetBytes` (a real
    * image resize keeps the same batch shape: binary in → binary out,
    * per-partition codec init, size recorded in metadata).
    */
  def resizeBatch(spark: SparkSession, media: DataFrame, targetBytes: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = if (bytes.length >= targetBytes) bytes.take(targetBytes)
            else bytes ++ Array.fill[Byte](targetBytes - bytes.length)(0)
          ResizedMedia(id, out, out.length.toLong)
        }
      }
  }

  /** Decode-to-vector stand-in: binary → fixed-`dim` float feature
    * vector (the embedding-extraction batch shape; a real model would
    * run a forward pass per partition-batch here). Deterministic:
    * byte histogram folded into `dim` buckets, L2-normalized.
    */
  def decodeToVectors(spark: SparkSession, media: DataFrame, dim: Int = 16): DataFrame = {
    import spark.implicits._
    val ds = media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Float](dim)
          bytes.foreach(b => hist((b & 0xff) % dim) += 1f)
          val norm = math.sqrt(hist.foldLeft(0.0)((a, v) => a + v.toDouble * v)).toFloat
          (id, if (norm == 0f) hist else hist.map(_ / norm))
        }
      }
    ds.toDF("doc_id", "embedding")
  }
}
