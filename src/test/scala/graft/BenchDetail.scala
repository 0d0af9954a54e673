package graft

import org.apache.spark.sql.SparkSession

/** Dev-only benchmark: times each registered query `reps` times and
  * reports min/median — separates plan/JIT warmup from steady-state cost
  * (the driver's Bench is single-shot). Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.BenchDetail [reps]"
  */
object BenchDetail {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (name, times.head, times(times.size / 2))
    }
    println(f"${"query"}%-28s ${"min"}%8s ${"median"}%8s")
    rows.sortBy(-_._3).foreach { case (n, mn, md) => println(f"$n%-28s $mn%8.3f $md%8.3f") }
    println(f"TOTAL(median) ${rows.map(_._3).sum}%.2f s  TOTAL(min) ${rows.map(_._2).sum}%.2f s")
    spark.stop()
  }
}
