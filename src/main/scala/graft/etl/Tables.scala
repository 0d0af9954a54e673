package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
