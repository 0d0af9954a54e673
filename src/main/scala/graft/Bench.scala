package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up so session startup isn't billed to the first query
    spark.range(1000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The driver captures only a bounded tail of stdout and parses the
    // JSON line out of it; keep the whole line comfortably under 1700
    // chars. Times at 3 dp (Locale.ROOT — never a comma decimal), and
    // the per-query breakdown clipped slowest-first to a byte budget so
    // the headline "value" always survives the tail window.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val prefix =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","nq":${results.size},"queries":{"""
    val suffix = s"""},"sf":"$sfDir"}"""
    val budget = 1700 - prefix.length - suffix.length
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    results.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      val e = "\"" + k + "\":" + fmt(v)
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
    }
    println(prefix + entries.mkString(",") + suffix)
    spark.stop()
  }
}
