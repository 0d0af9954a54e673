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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 cannot read
      // natively; read the raw int64 nanos and truncate to micros — the
      // same conversion DuckDB applies, so oracle values line up.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
