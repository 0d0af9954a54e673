package graft

import graft.etl.CatalogOps
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** Cost-based-optimizer wiring: ANALYZE TABLE statistics land in the
  * catalog, flow into plan estimates, and change physical planning.
  * (SURVEY §4.2 — stats/CBO is Catalyst surface the engine must drive,
  * not reimplement.)
  */
class CboSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val primed: Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    CatalogOps.primeStatistics(spark, sfDir, Seq("nation", "customer", "orders"))
  }

  test("ANALYZE TABLE computes row counts and column NDV/min/max") {
    primed
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("graft_nation"))
    val stats = meta.stats.get
    assert(stats.rowCount.contains(BigInt(25)))
    val nk = stats.colStats("n_nationkey")
    assert(nk.distinctCount.exists(_.toInt === 25))
    assert(nk.min.contains("0") && nk.max.contains("24"))
  }

  test("CBO uses column stats for filter selectivity estimates") {
    primed
    val cust = spark.table("graft_customer")
    val total = cust.queryExecution.optimizedPlan.stats.rowCount.get
    // range predicate over an analyzed column: the estimate must shrink
    // (min/max interpolation), not stay at the table row count
    val filtered = cust.filter(col("c_custkey") <= 100L)
      .queryExecution.optimizedPlan.stats.rowCount.get
    assert(total > 0 && filtered < total,
      s"expected selective estimate, got $filtered of $total")
  }

  test("stats drive the broadcast decision") {
    primed
    val j = spark.table("graft_orders")
      .join(spark.table("graft_nation"), col("o_orderkey") % 25 === col("n_nationkey"))
    val bhj = collect(j.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "25-row analyzed dim should broadcast")
  }
}
