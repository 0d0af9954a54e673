package graft

import org.apache.spark.sql.functions._

/** Optimizer-rule tests (custom Rule[LogicalPlan] surface). */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed input: a LocalRelation would be constant-folded away
  // before the rewrite has anything to match
  private def names = graft.etl.Tables(spark, "/root/testdata/sf0.001", "customer")
    .select($"c_name".as("s"))

  test("Md5Hash32Rewrite: portable md5 chain rewritten to the fused expression") {
    graft.plans.Md5Hash32Rewrite.install(spark)
    val df = names.selectExpr("s", "cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint) AS h")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("md5hash32"),
      s"rule did not fire:\n$optimized")
    // values unchanged vs the fused kernel applied directly
    val got = df.orderBy($"s").select($"s", $"h").as[(String, Long)].collect()
    got.foreach { case (s, h) =>
      assert(h == graft.functions.Md5Hash32.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    }
  }

  test("Md5Hash32Rewrite: non-matching conv/substring shapes are untouched") {
    graft.plans.Md5Hash32Rewrite.install(spark)
    val df = names
      .selectExpr("cast(conv(substring(md5(s), 1, 6), 16, 10) as bigint) AS h6",
        "cast(conv(substring(md5(s), 1, 8), 16, 8) as bigint) AS oct8")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("md5hash32"))
    assert(df.count() > 0)
  }
}
