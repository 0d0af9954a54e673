package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch profiler for decomposing a slow query's stages.
  * Not part of the registry or test suite; edit freely between runs.
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ScratchProfile"
  */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pass(label: String, aqe: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val t0 = System.nanoTime()
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    pass("pass1 aqe=on", aqe = true)
    pass("pass2 aqe=off", aqe = false)
    pass("pass3 aqe=on", aqe = true)
    pass("pass4 aqe=off", aqe = false)
    spark.stop()
  }
}
