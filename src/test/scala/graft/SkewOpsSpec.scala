package graft

import graft.etl.SkewOps
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregate equals direct groupBy on a skewed key") {
    // 10k rows on one hot key + a long tail
    val hot = (1 to 10000).map(i => ("hot", i.toLong, 1.0))
    val tail = (1 to 100).map(i => (s"k$i", i.toLong, 2.0))
    val df = (hot ++ tail).toDF("key", "id", "v")
    val salted = SkewOps.saltedSumCount(df, Seq("key"), "v", "id", buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = df.groupBy("key").agg(sum("v"), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
    assert(salted("hot") == ((10000.0, 10000L)))
  }

  test("salted join equals direct join on a skewed key, including duplicates") {
    // probe: one hot key with 5k rows; build: multiple rows per key so
    // the join multiplicity must survive salting exactly
    val probe = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("key", "id")
    val build = Seq(("hot", "b1"), ("hot", "b2"), ("k1", "b3"), ("zz", "b4"))
      .toDF("key", "attr")
    val got = SkewOps.saltedJoin(probe, build, Seq("key"), "id", buckets = 8)
      .groupBy("key", "attr").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = probe.join(build, Seq("key"))
      .groupBy("key", "attr").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got(("hot", "b1")) == 5000L && got(("k1", "b3")) == 1L)
    assert(!got.keySet.exists(_._1 == "zz")) // inner semantics: unmatched build dropped
  }
}
