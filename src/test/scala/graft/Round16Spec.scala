package graft

import org.apache.spark.sql.functions._

/** Round-16 pins (optimization round): the ADVICE-r15 correctness
  * guards — null-group-key rows survive the prefix-sum rank ops, and
  * mergeCommit rejects MERGE sources Delta/Iceberg would reject.
  */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("withRowNumber keeps rows whose group key is NULL (window semantics)") {
    val df = Seq(
      (Some("a"), 1L), (Some("a"), 2L), (None, 3L), (None, 4L), (Some("b"), 5L)
    ).toDF("g", "v")
    val got = graft.etl.StatOps.withRowNumber(df, Seq("g"), Seq(col("v")), "rn")
      .select(col("g"), col("v"), col("rn"))
      .as[(Option[String], Long, Long)].collect().toSet
    // the window it replaces: row_number() OVER (PARTITION BY g ORDER BY v)
    // numbers the NULL group as its own partition
    assert(got === Set(
      (Some("a"), 1L, 1L), (Some("a"), 2L, 2L),
      (None, 3L, 1L), (None, 4L, 2L),
      (Some("b"), 5L, 1L)))
  }

  test("withRunningSum keeps rows whose group key is NULL") {
    val df = Seq(
      (Some("a"), 1L, 10L), (None, 2L, 20L), (None, 3L, 30L)
    ).toDF("g", "o", "x")
    val got = graft.etl.StatOps.withRunningSum(df, Seq("g"), Seq("o"), "x", "rs")
      .select(col("g"), col("o"), col("rs"))
      .as[(Option[String], Long, Long)].collect().toSet
    assert(got === Set(
      (Some("a"), 1L, 10L), (None, 2L, 20L), (None, 3L, 50L)))
  }

  test("mergeCommit rejects duplicate and NULL update keys loudly") {
    val root = freshDir("merge_guard_") + "/t"
    val base = (0L until 50L).map(k => (k, "b")).toDF("k", "s")
    graft.etl.CommitOps.appendCommit(spark, root, base, Seq("k"))
    val dup = Seq((1L, "u"), (1L, "u2")).toDF("k", "s")
    val eDup = intercept[IllegalArgumentException] {
      graft.etl.CommitOps.mergeCommit(spark, root, dup, "k", Seq("k"))
    }
    assert(eDup.getMessage.contains("duplicate"))
    val withNull = Seq((Some(1L), "u"), (None, "n")).toDF("k", "s")
    val eNull = intercept[IllegalArgumentException] {
      graft.etl.CommitOps.mergeCommit(spark, root, withNull, "k", Seq("k"))
    }
    assert(eNull.getMessage.contains("NULL"))
    // the failed merges must not have committed anything
    assert(graft.etl.CommitOps.latestVersion(spark, root) === Some(1L))
  }

  test("winnow fromPostings over a persisted posting frame == live ops") {
    import graft.ext.TextOps
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "xx the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "a completely different sentence with many unrelated words in this row"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today")
    ).toDF("doc_id", "text")
    val dir = freshDir("winnow_fp_") + "/p"
    TextOps.winnowPostings(docs, "doc_id", "text", k = 4, w = 4)
      .write.parquet(dir)
    val staged = spark.read.parquet(dir)
    val liveFp = TextOps.winnowFingerprints(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect().toSeq
    val stagedFp = TextOps.winnowFingerprintsFromPostings(staged, "doc_id")
      .orderBy(col("doc_id")).collect().toSeq
    assert(liveFp === stagedFp && liveFp.nonEmpty)
    val livePairs = TextOps.winnowPairs(docs, "doc_id", "text",
        minShared = 1, maxDf = 20)
      .orderBy(col("doc_a"), col("doc_b")).collect().toSeq
    val stagedPairs = TextOps.winnowPairsFromPostings(staged, "doc_id",
        minShared = 1, maxDf = 20)
      .orderBy(col("doc_a"), col("doc_b")).collect().toSeq
    assert(livePairs === stagedPairs && livePairs.nonEmpty)
  }

  test("single-join tableUpdated: null-id incoming rows kept, deletes dropped") {
    import graft.etl.{CleanOps, MergeOps}
    // exercises the classification branches the orders fixture cannot:
    // a NULL incoming id (anti-join semantics keep it), a published-only
    // id (dropped), and a null audit value (counts as changed)
    val a = Seq((Some(1L), Some("x")), (Some(2L), Some("y")), (Some(3L), Some("z")))
      .toDF("id", "v")
    val b = Seq((Some(1L), Some("x")), (Some(2L), None: Option[String]),
      (None: Option[Long], Some("n"))).toDF("id", "v")
    val got = MergeOps.tableUpdated(a, b, "id", Seq("v"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSeq
    // sorted by stringified id, nulls first (Spark ASC NULLS FIRST):
    // null-id b row kept, id 1 unchanged (a's row), id 2 changed (b's
    // null-v row), id 3 deleted
    assert(got === Seq((None, Some("n")), (Some("1"), Some("x")),
      (Some("2"), None)))
    assert(CleanOps.castAllToString(a).schema.fields.forall(_.dataType.typeName == "string"))
  }
}
