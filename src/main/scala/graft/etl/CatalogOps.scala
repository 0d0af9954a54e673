package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S12/P23/O1 — the reference's remote-catalog traversal
  * (`/root/reference/src/gdrive_handler.py:83-217`, `etl.py:32-49`)
  * as DataFrame operations over a file-metadata table. The Drive API
  * becomes a filesystem listing; the list-comprehension filters become
  * real Catalyst filters.
  */
object CatalogOps {

  final case class FileMeta(
      id: String, name: String, mimeType: String, parent: String,
      createdTime: java.sql.Timestamp, modifiedTime: java.sql.Timestamp)

  /** Local/HDFS directory listing → metadata table (the engine's stand-in
    * for Drive folder traversal; driver-side like any catalog op).
    */
  def listFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val metas = fs.listStatus(p).toSeq.map { st =>
      FileMeta(
        id = st.getPath.toString,
        name = st.getPath.getName,
        mimeType = if (st.isDirectory) "folder" else "file",
        parent = dir,
        createdTime = new java.sql.Timestamp(st.getModificationTime),
        modifiedTime = new java.sql.Timestamp(st.getModificationTime))
    }
    metas.toDF()
  }

  /** P23 — entity filter on `{layer}_{entity}.{ext}` file names
    * (etl.py:34: split on '_' then '.').
    */
  def filterByEntity(meta: DataFrame, entity: String): DataFrame =
    meta.filter(split(split(col("name"), "_").getItem(1), "\\.").getItem(0) === entity)

  /** Exact-name filter (etl.py:36, modeled layer). */
  def filterByName(meta: DataFrame, name: String): DataFrame =
    meta.filter(col("name") === name)

  /** O1 — newest file first (extraction_layer.py:33-36): TopK plan
    * (TakeOrderedAndProject), not a full sort.
    */
  def latest(meta: DataFrame): DataFrame =
    meta.orderBy(col("createdTime").desc, col("name")).limit(1)

  /** Registers the parquet tables in the session catalog and computes
    * table + column statistics — the stats-priming step a cluster
    * deployment runs once per ingest so the cost-based optimizer can
    * estimate row counts, NDVs and selectivities (join reorder, build
    * side and broadcast decisions). At 100 TB this is
    * `ANALYZE TABLE ... FOR ALL COLUMNS` over external tables in place;
    * here the testdata is re-saved as managed tables because the
    * in-memory catalog cannot attach stats to a bare path.
    */
  def primeStatistics(spark: SparkSession, sfDir: String,
      tables: Seq[String], prefix: String = "graft_"): Unit =
    tables.foreach { t =>
      Tables(spark, sfDir, t).write.mode("overwrite").saveAsTable(s"$prefix$t")
      spark.sql(s"ANALYZE TABLE $prefix$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
}
