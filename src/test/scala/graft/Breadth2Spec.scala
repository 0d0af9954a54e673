package graft

import graft.queries.Breadth2
import org.apache.spark.sql.functions._

/** Unit checks for the round-2 breadth queries — semantic invariants on
  * small fixtures plus plan shape for the scale-sensitive ones (testdata
  * sf0.001 where a real table is needed).
  */
class Breadth2Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("driver contract: entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q15 cube: grand total row equals table count") {
    val out = Breadth2.q15Cube.fn(spark, sf)
    val total = out.filter($"l_returnflag".isNull && $"l_linestatus".isNull)
      .select($"n").as[Long].collect()
    assert(total.toSeq == Seq(Tables0.lineitemCount(spark, sf)))
    // cube = rollup ∪ column marginals: at least grand total + both 1-dim slices
    assert(out.count() >= 3)
  }

  test("p27 unpivot: 4 long rows per wide row, values preserved") {
    val wide = graft.etl.Tables(spark, sf, "lineitem").filter($"l_orderkey" < 1000)
    val out = Breadth2.p27Unpivot.fn(spark, sf)
    assert(out.count() == 4 * wide.count())
    val first = wide.orderBy($"l_orderkey", $"l_linenumber").limit(1)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity").as[(Long, Int, Double)].head()
    val qty = out.filter($"measure" === "l_quantity" &&
        $"l_orderkey" === first._1 && $"l_linenumber" === first._2.toLong)
      .select($"value").as[Double].head()
    assert(qty == first._3)
  }

  test("approx_percentile tracks exact percentiles within its accuracy bound") {
    // the sketch path for quantiles at 100 TB (exact percentile = full
    // sort per group); accuracy 1/eps = 10000 → rank error <= n/10000
    val li = graft.etl.Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val row = li.agg(
      org.apache.spark.sql.functions.expr(
        "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("apx"),
      org.apache.spark.sql.functions.expr(
        "percentile(l_extendedprice, array(0.5, 0.95))").as("exact")).collect()(0)
    val apx = row.getSeq[Double](0)
    val exact = row.getSeq[Double](1)
    apx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.01, s"approx $a vs exact $e")
    }
  }

  test("w3 lead/lag: matches brute-force neighbor computation") {
    val src = graft.etl.Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
      .collect()
    val expected = src.groupBy(_.getLong(1)).values.flatMap { rows =>
      val sorted = rows.sortBy(r =>
        (r.getAs[java.time.LocalDateTime](3).toEpochSecond(java.time.ZoneOffset.UTC),
          r.getLong(0)))
      sorted.zipWithIndex.map { case (r, i) =>
        r.getLong(0) -> (
          if (i == 0) None else Some(sorted(i - 1).getDouble(2)),
          if (i == sorted.length - 1) None else Some(sorted(i + 1).getDouble(2)),
          (i + 1).toLong)
      }
    }.toMap
    val got = Breadth2.w3LeadLag.fn(spark, sf)
      .select($"o_orderkey", $"prev_price", $"next_price", $"rn", $"quartile")
      .as[(Long, Option[Double], Option[Double], Long, Long)].collect()
    got.foreach { case (k, prev, next, rn, tile) =>
      val (ep, en, ern) = expected(k)
      assert(prev == ep && next == en && rn == ern, s"orderkey $k")
      assert(tile >= 1L && tile <= 4L)
    }
  }

  test("w4 range frame: equals brute-force trailing-30-day sum") {
    val orders = graft.etl.Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate".cast("date").as("d"))
      .collect()
    val brute = orders.map { r =>
      val (k, c, d) = (r.getLong(0), r.getLong(1), r.getDate(3).toLocalDate)
      val s = orders.filter { o =>
        o.getLong(1) == c && {
          val od = o.getDate(3).toLocalDate
          !od.isAfter(d) && !od.isBefore(d.minusDays(30))
        }
      }.map(o => BigDecimal(o.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      k -> s.toDouble
    }.toMap
    val got = Breadth2.w4RangeFrame.fn(spark, sf)
      .select($"o_orderkey", $"rolling_30d").as[(Long, Double)].collect()
    got.foreach { case (k, v) => assert(v == brute(k), s"orderkey $k") }
  }

  test("t7 arrays: known nation keys produce expected set algebra") {
    val out = Breadth2.t7Arrays.fn(spark, sf)
      .filter($"n_nationkey" <= 3)
      .select($"n_nationkey", $"inter", $"uni", $"minus", $"asum")
      .as[(Long, String, String, String, Long)].collect()
    // k=0: a=[1], b=[0,1,2]
    val r0 = out.find(_._1 == 0L).get
    assert(r0._2 == "1" && r0._3 == "0,1,2" && r0._4 == "" && r0._5 == 1L)
    // k=3: a=[1,2,3,4], b=[0,1,2]
    val r3 = out.find(_._1 == 3L).get
    assert(r3._2 == "1,2" && r3._3 == "0,1,2,3,4" && r3._4 == "3,4" && r3._5 == 10L)
  }

  test("j6 band join: labels respect bounds; plan broadcasts the dim") {
    val out = Breadth2.j6BandJoin.fn(spark, sf).cache()
    try {
      val bad = out.filter(
        ($"label" === "S" && ($"p_size" < 0 || $"p_size" >= 10)) ||
        ($"label" === "M" && ($"p_size" < 10 || $"p_size" >= 25)) ||
        ($"label" === "L" && ($"p_size" < 25 || $"p_size" >= 50)) ||
        ($"label" === "XL" && ($"p_size" < 50 || $"p_size" >= 100)))
      assert(bad.count() == 0)
      // every part classified exactly once
      assert(out.count() == graft.etl.Tables(spark, sf, "part").count())
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    } finally out.unpersist()
  }

  test("q18 salted aggregation equals direct group-by") {
    val li = graft.etl.Tables(spark, sf, "lineitem")
    val direct = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
      .as[(String, Double, Long)].collect().toSeq
    val salted = Breadth2.q18Salted.fn(spark, sf)
      .as[(String, Double, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("q19 lateral top-2 equals window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    val o = graft.etl.Tables(spark, sf, "orders")
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val expected = o.withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
      .select($"o_custkey".as("c_custkey"), $"o_orderkey", $"o_totalprice")
      .orderBy($"c_custkey", $"o_totalprice".desc, $"o_orderkey")
      .as[(Long, Long, Double)].collect().toSeq
    val got = Breadth2.q19Lateral.fn(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    // lateral only yields customers that have orders; both sides agree
    assert(got == expected)
  }

  test("q20 resample: contiguous minute grid, ffill leaves no gaps after first obs") {
    val out = Breadth2.q20Resample.fn(spark, sf).cache()
    try {
      // per user: row count == minutes between min and max (inclusive)
      val spans = out.groupBy($"user_id")
        .agg(count(lit(1)).as("rows"),
          (unix_timestamp(max($"m")) - unix_timestamp(min($"m"))).as("secs"))
        .collect()
      spans.foreach(r => assert(r.getLong(1) == r.getLong(2) / 60 + 1))
      // after the first non-null, v_filled never goes null again
      val badGaps = out.filter($"v_filled".isNull)
        .join(out.filter($"v_filled".isNotNull).groupBy($"user_id")
          .agg(min($"m").as("first_obs")), Seq("user_id"))
        .filter($"m" > $"first_obs").count()
      assert(badGaps == 0)
    } finally out.unpersist()
  }

  test("q21 histogram: buckets cover all rows, ids in range") {
    val out = Breadth2.q21Histogram.fn(spark, sf).as[(Long, Long)].collect()
    assert(out.map(_._2).sum == graft.etl.Tables(spark, sf, "events").count())
    assert(out.forall { case (b, _) => b >= 0L && b <= 11L })
  }

  test("q22 systematic sample: deterministic, plausible rate, stable subset") {
    val once = Breadth2.q22Sample.fn(spark, sf).select($"o_orderkey").as[Long].collect().toSeq
    val again = Breadth2.q22Sample.fn(spark, sf).select($"o_orderkey").as[Long].collect().toSeq
    assert(once == again)
    val total = graft.etl.Tables(spark, sf, "orders").count()
    val rate = once.size.toDouble / total
    assert(rate > 0.02 && rate < 0.08, s"rate $rate")  // 1/20 ± sampling noise
  }

  test("q23 profile: matches direct per-column aggregates") {
    val o = graft.etl.Tables(spark, sf, "orders")
    val got = Breadth2.q23Profile.fn(spark, sf)
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("o_custkey")._2 == 0)
    assert(got("o_custkey")._3 == o.select($"o_custkey").distinct().count())
    assert(got("o_orderstatus")._4 == "F")  // min of {F,O,P}
    assert(got("o_orderstatus")._5 == "P")
    assert(got.keySet == Set("o_orderstatus", "o_orderpriority", "o_custkey"))
  }

  test("q16 exists: equals explicit semi/anti join composition") {
    val c = graft.etl.Tables(spark, sf, "customer")
    val o = graft.etl.Tables(spark, sf, "orders")
    val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val pending = o.filter($"o_orderstatus" === "P").select($"o_custkey")
    val expected = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .join(pending, c("c_custkey") === pending("o_custkey"), "left_anti")
      .select($"c_custkey").as[Long].collect().sorted.toSeq
    val got = Breadth2.q16Exists.fn(spark, sf).select($"c_custkey")
      .as[Long].collect().toSeq
    assert(got == expected)
  }
}

/** Tiny helper kept out of the test bodies so the fixture reads stay
  * one-line.
  */
private object Tables0 {
  def lineitemCount(spark: org.apache.spark.sql.SparkSession, sf: String): Long =
    graft.etl.Tables(spark, sf, "lineitem").count()
}
