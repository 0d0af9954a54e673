package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All queries registered in [[graft.SparkEntry]] read via this object so
  * the scan layer is one place: parquet, schema-on-file, no inference
  * games. At cluster scale these would be catalog tables; the sfDir
  * parameter stands in for the catalog namespace.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Per-(session, dir, table) logical-plan cache: repeated reads of the
  // same path would otherwise re-list the directory and re-read parquet
  // footers on every query — the single-node stand-in for a metastore's
  // cached table metadata. DataFrames are immutable, so sharing the
  // relation across queries is safe; data is NOT cached, only the
  // resolved scan.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, name), {
      if (name == "events") {
        // events.ts has shipped as both parquet TIMESTAMP(NANOS) — which
        // Spark 4 cannot read natively — and TIMESTAMP(MICROS), depending
        // on the fixture generation. Resolve by the schema actually on
        // disk: nanos arrive as int64 (nanosAsLong) and truncate to
        // micros — the same conversion DuckDB applies, so oracle values
        // line up — while micros just normalize to TIMESTAMP_NTZ.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$sfDir/$name.parquet")
        val tsIsLong = raw.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType
        if (tsIsLong)
          raw.withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        else
          raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
      } else {
        spark.read.parquet(s"$sfDir/$name.parquet")
      }
    })
}
