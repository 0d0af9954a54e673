package graft

import org.apache.spark.sql.SparkSession

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
    val q = SparkEntry.queries("u2_merge_upsert")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    println("HAS_REUSED_EXCHANGE=" + plan.contains("ReusedExchange"))
    q.count()
    val planAfter = q.queryExecution.executedPlan.toString
    println("AFTER_AQE_REUSED=" + planAfter.contains("ReusedExchange"))
    println(planAfter.split("\n").filter(l => l.contains("Exchange") || l.contains("Join")).mkString("\n"))
    spark.stop()
  }
}
