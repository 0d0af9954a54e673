package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the query registry itself — the driver consumes
  * these maps blindly, so drift fails loudly here instead of silently
  * zeroing a round's correctness.
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key has a query; names are unique and well-formed") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs.keySet),
      s"oracles without queries: ${os.keySet -- qs.keySet}")
    assert(qs.keySet.forall(_.matches("[a-z][a-z0-9_]+")), "query name style")
    // the intentionally rows-only queries are the two sketch estimators
    // (engine-specific estimates can't hash-match a DuckDB oracle)
    assert((qs.keySet -- os.keySet) ==
      Set("q10_approx_distinct", "q34_hll_mergeable_sketch"))
  }

  test("every oracle ends in a deterministic ORDER BY") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name oracle lacks ORDER BY")
    }
  }
}
