package graft

import graft.etl.{AuditOps, CleanOps, MergeOps}
import graft.sources.JsonlSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Operator invariants + remaining source formats. */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  private def dfA = Seq(
    (1L, "A", 100L), (2L, "B", 200L), (3L, "C", 300L)
  ).toDF("id", "v1", "v2")

  test("merge is idempotent: tableUpdated(a, a) == stringify(a) sorted") {
    val merged = MergeOps.tableUpdated(dfA, dfA, "id", Seq("v1", "v2"))
    val expected = CleanOps.castAllToString(dfA).orderBy($"id")
    assert(merged.collect().toSeq == expected.collect().toSeq)
  }

  test("authlog of identical snapshots is empty; fullouter too") {
    val runTs = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
    assert(AuditOps.authlog(dfA, dfA, "id", Seq("v1", "v2"), "t", "r", runTs).count() == 0)
    assert(AuditOps.authlog(dfA, dfA, "id", Seq("v1", "v2"), "t", "r", runTs,
      fullOuter = true).count() == 0)
  }

  test("merge twice with same incoming == merge once (stable refresh)") {
    val dfB = Seq((1L, "A", 100L), (2L, "B2", 201L), (4L, "D", 400L))
      .toDF("id", "v1", "v2")
    val once = MergeOps.tableUpdated(dfA, dfB, "id", Seq("v1", "v2"))
    // re-merging the refreshed table with the same incoming changes nothing
    val bStr = CleanOps.castAllToString(dfB)
    val twice = MergeOps.tableUpdated(once, bStr, "id", Seq("v1", "v2"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("JSONL source: clean rows parsed, malformed lines quarantined") {
    val p = java.nio.file.Files.createTempFile("docs_", ".jsonl")
    java.nio.file.Files.write(p, Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "segunda linea"}""",
      """{"doc_id": 3, "text": "unterminated...""",
      """not json at all"""
    ).mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = JsonlSource.readJsonl(spark, p.toString, schema)
    val (clean, bad) = JsonlSource.splitCorrupt(df)
    assert(clean.count() == 2 && bad.count() == 2)
    assert(clean.orderBy($"doc_id").select("text").as[String].collect()
      .toSeq == Seq("hello world", "segunda linea"))
    assert(bad.as[String].collect().exists(_.contains("not json at all")))
  }

  test("ORC sink/source round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("orc_").toString + "/t"
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "s", "v")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // ORC read-back loosens nullability; compare names and types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
  }
}
