package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB SQL the driver replays as the correctness oracle.
  *
  * Column names MUST match between `fn`'s output and `oracle` (the driver
  * sorts columns by name before hashing). Output types are kept to
  * {string, long, double, date, timestamp} so the two engines' physical
  * schemas line up.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact money aggregation: both Spark and DuckDB sum in DECIMAL(18,2)
    * (order-independent, bit-exact) then cast back to double so the final
    * schema is plain `double` in both engines. Avoids last-ulp mismatches
    * from double summation order.
    */
  def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
}

/** Central query registry — SparkEntry derives both maps from here. */
object Registry {
  def all: Seq[Q] = {
    val qs = Analytics.all ++ Parity.all ++ AuditMerge.all ++ Extensions.all ++
      Breadth.all ++ Breadth2.all ++ Breadth3.all ++ Breadth4.all ++ Breadth5.all ++
      Breadth6.all ++ Breadth7.all ++ Breadth8.all ++ Breadth9.all ++ Breadth10.all ++
      Breadth11.all ++ Breadth12.all ++ Breadth13.all ++ Breadth14.all ++
      Breadth15.all ++ Breadth16.all ++ Breadth17.all ++ Breadth18.all ++
      Breadth19.all ++ Breadth20.all ++ Breadth21.all ++ Breadth22.all ++
      Breadth23.all ++ Breadth24.all
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names would shadow silently: ${dups.mkString(", ")}")
    qs
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
