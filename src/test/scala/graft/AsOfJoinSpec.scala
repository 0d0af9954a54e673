package graft

import graft.etl.Tables
import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom as-of join operator (logical plan + strategy + physical
  * exec): semantics on a known dataset, equivalence with the j5/j8
  * window composition on real events data, plan shape, and null/self-
  * join hygiene.
  */
class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def quotes: DataFrame = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 20L, 2.5), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("sym", "t", "px")

  private def trades: DataFrame = Seq(
    ("A", 5L), ("A", 10L), ("A", 25L), ("A", 99L),
    ("B", 15L), ("B", 14L), ("C", 50L), (null.asInstanceOf[String], 60L)
  ).toDF("sym", "t")

  private def asof(fwd: Boolean, strict: Boolean): Map[(String, Long), Option[Double]] = {
    val r = quotes.select(col("sym").as("qsym"), col("t").as("qt"), col("px"))
    AsOfJoin.asofJoin(trades, r, Seq("sym"), Seq("qsym"), "t", "qt",
        forward = fwd, strict = strict)
      .select(col("sym"), col("t"), col("px"))
      .collect()
      .map(row => (Option(row.getString(0)).orNull, row.getLong(1)) ->
        (if (row.isNullAt(2)) None else Some(row.getDouble(2))))
      .toMap
  }

  test("backward strict: latest quote strictly before each trade") {
    val m = asof(fwd = false, strict = true)
    assert(m(("A", 5L)).isEmpty)           // nothing before t=5
    assert(m(("A", 10L)).isEmpty)          // strict: t=10 quote excluded
    assert(m(("A", 25L)).contains(2.5))    // last of the t=20 duplicates
    assert(m(("A", 99L)).contains(3.0))
    assert(m(("B", 15L)).isEmpty)          // strict
    assert(m(("B", 14L)).isEmpty)
    assert(m(("C", 50L)).isEmpty)          // key absent on right
    assert(m((null, 60L)).isEmpty)         // null key never matches
  }

  test("backward inclusive picks the equal-time quote") {
    val m = asof(fwd = false, strict = false)
    assert(m(("A", 10L)).contains(1.0))
    assert(m(("B", 15L)).contains(9.0))
    assert(m(("A", 25L)).contains(2.5))
  }

  test("forward strict/inclusive: earliest later quote") {
    val ms = asof(fwd = true, strict = true)
    assert(ms(("A", 5L)).contains(1.0))
    assert(ms(("A", 25L)).contains(3.0))
    assert(ms(("A", 99L)).isEmpty)
    assert(ms(("B", 15L)).isEmpty)         // strict: equal excluded, none later
    val mi = asof(fwd = true, strict = false)
    assert(mi(("B", 15L)).contains(9.0))
    // duplicate-time forward from t=10: strict lands on the t=20 run
    assert(ms(("A", 10L)).contains(2.0) || ms(("A", 10L)).contains(2.5))
  }

  test("matches the window composition on events (backward + forward)") {
    val ev = Tables(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"))

    val custom = AsOfJoin.asofJoin(purchases, signups,
        Seq("user_id"), Seq("r_user_id"), "ts", "r_ts")
      .select(col("event_id"), col("r_ts").as("last_signup_ts"))

    // reference: correlated max over strictly-prior signups, via window
    // on the union trick — here simply a groupBy max join per (user, ts)
    val ref = purchases.alias("p")
      .join(signups, col("user_id") === col("r_user_id") && col("r_ts") < col("ts"), "left")
      .groupBy(col("event_id")).agg(max(col("r_ts")).as("last_signup_ts"))

    val diff = custom.exceptAll(ref).count() + ref.exceptAll(custom).count()
    assert(diff === 0)

    val customFwd = AsOfJoin.asofJoin(purchases, signups,
        Seq("user_id"), Seq("r_user_id"), "ts", "r_ts", forward = true)
      .select(col("event_id"), col("r_ts").as("next_signup_ts"))
    val refFwd = purchases.alias("p")
      .join(signups, col("user_id") === col("r_user_id") && col("r_ts") > col("ts"), "left")
      .groupBy(col("event_id")).agg(min(col("r_ts")).as("next_signup_ts"))
    val diffFwd = customFwd.exceptAll(refFwd).count() + refFwd.exceptAll(customFwd).count()
    assert(diffFwd === 0)
  }

  test("plans as AsOfJoinExec and accepts a self-join without ambiguity") {
    val ev = Tables(spark, sfDir, "events")
    // both sides from the SAME analyzed relation: attribute dedup path
    val l = ev.filter(col("event_type") === "purchase")
    val r = ev.filter(col("event_type") === "signup")
    val joinedDf = AsOfJoin.asofJoin(l, r, Seq("user_id"), Seq("user_id"), "ts", "ts")
    joinedDf.count() // executes fine
    val execs = collect(joinedDf.queryExecution.executedPlan) {
      case e: AsOfJoinExec => e
    }
    assert(execs.size === 1)
    // window function nowhere in the plan: this is the operator, not sugar
    assert(!joinedDf.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("tolerance bounds the match distance in native units") {
    val r = quotes.select(col("sym").as("qsym"), col("t").as("qt"), col("px"))
    def withTol(fwd: Boolean, tol: Long): Map[(String, Long), Option[Double]] =
      AsOfJoin.asofJoin(trades, r, Seq("sym"), Seq("qsym"), "t", "qt",
          forward = fwd, strict = true, tolerance = Some(tol))
        .select(col("sym"), col("t"), col("px")).collect()
        .map(row => (Option(row.getString(0)).orNull, row.getLong(1)) ->
          (if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toMap
    // backward: A@25 matches the t=20 quote (distance 5) at tol>=5 only
    assert(withTol(fwd = false, tol = 5L)(("A", 25L)).contains(2.5))
    assert(withTol(fwd = false, tol = 4L)(("A", 25L)).isEmpty)
    // A@99's nearest prior is t=30 (distance 69): out of a 10-tick budget
    assert(withTol(fwd = false, tol = 10L)(("A", 99L)).isEmpty)
    // forward: A@25's next quote is t=30 (distance 5)
    assert(withTol(fwd = true, tol = 5L)(("A", 25L)).contains(3.0))
    assert(withTol(fwd = true, tol = 4L)(("A", 25L)).isEmpty)
    // tolerance never ADDS matches: B@15 strict-backward has none either way
    assert(withTol(fwd = false, tol = 1000L)(("B", 15L)).isEmpty)
  }

  test("tolerance brute-force equivalence on random data") {
    val rnd = new scala.util.Random(7)
    val q = Seq.fill(300)((s"s${rnd.nextInt(5)}", rnd.nextInt(100).toLong,
      rnd.nextDouble())).toDF("qsym", "qt", "px")
    val t = Seq.fill(200)((s"s${rnd.nextInt(6)}", rnd.nextInt(110).toLong))
      .toDF("sym", "t")
    val tol = 13L
    val got = AsOfJoin.asofJoin(t, q, Seq("sym"), Seq("qsym"), "t", "qt",
        forward = false, strict = true, tolerance = Some(tol))
      .select(col("sym"), col("t"), col("qt")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val quotesBy = q.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case ((sym, lt), m) =>
      val want = quotesBy.getOrElse(sym, Array.empty[Long])
        .filter(rt => rt < lt && lt - rt <= tol).lastOption
      assert(m == want, s"($sym, $lt): got $m want $want")
    }
  }

  test("empty right side yields all-null matches, not an error") {
    val r = quotes.filter(col("px") < 0)
      .select(col("sym").as("qsym"), col("t").as("qt"), col("px"))
    val out = AsOfJoin.asofJoin(trades, r, Seq("sym"), Seq("qsym"), "t", "qt")
    assert(out.count() === 8)
    assert(out.filter(col("px").isNotNull).count() === 0)
  }

  test("key type mismatch fails fast") {
    val r = quotes.select(col("sym").as("qsym"), col("t").as("qt"), col("px"))
    val badLeft = trades.withColumn("sym2", col("t").cast("int"))
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(badLeft, r, Seq("sym2"), Seq("qsym"), "t", "qt")
    }
  }

  test("output survives UnsafeRow-expecting parents (shuffle, sort) without a select") {
    // Regression: the exec used to emit JoinedRow, which a parent
    // shuffle's UnsafeRowSerializer or SortExec would CCE on.
    val r = quotes.select(col("sym").as("qsym"), col("t").as("qt"), col("px"))
    val j = AsOfJoin.asofJoin(trades, r, Seq("sym"), Seq("qsym"), "t", "qt")
    assert(j.repartition(4).count() === 8)
    val sorted = j.orderBy(col("t")).collect()
    assert(sorted.length === 8)
    assert(j.repartition(3, col("sym")).orderBy(col("sym"), col("t")).count() === 8)
  }

  test("string time column: buffered values are copied, not buffer views") {
    // Regression: right-side time values read from a reused projection
    // row are UTF8String views; without a copy the sort index would be
    // built over whatever the LAST row left in the buffer.
    val rq = Seq(("A", "b", 1.0), ("A", "d", 2.0), ("A", "f", 3.0),
        ("B", "c", 9.0))
      .toDF("qsym", "qt", "px")
    val lt = Seq(("A", "c"), ("A", "e"), ("A", "a"), ("B", "z"))
      .toDF("sym", "t")
    val m = AsOfJoin.asofJoin(lt, rq, Seq("sym"), Seq("qsym"), "t", "qt")
      .select(col("sym"), col("t"), col("px")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(m(("A", "c")).contains(1.0)) // latest qt < "c" is "b"
    assert(m(("A", "e")).contains(2.0))
    assert(m(("A", "a")).isEmpty)
    assert(m(("B", "z")).contains(9.0))
  }

  test("equal-time duplicates match deterministically (byte-order tiebreak)") {
    // Two quotes at t=20 (px 2.0 and 2.5). The tiebreak orders the run
    // by unsafe row bytes, so repeated runs under different partition
    // layouts must pick the SAME duplicate every time.
    val r = quotes.select(col("sym").as("qsym"), col("t").as("qt"), col("px"))
    def pick(parts: Int): Option[Double] = {
      val rr = r.repartition(parts, col("qsym"))
      AsOfJoin.asofJoin(trades, rr, Seq("sym"), Seq("qsym"), "t", "qt")
        .filter(col("sym") === "A" && col("t") === 25L)
        .select(col("px")).collect()
        .headOption.flatMap(row => if (row.isNullAt(0)) None else Some(row.getDouble(0)))
    }
    val results = Seq(1, 2, 7, 32).map(pick)
    assert(results.distinct.size === 1, s"tie pick varied across layouts: $results")
    assert(results.head.nonEmpty)
  }
}
