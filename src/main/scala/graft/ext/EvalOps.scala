package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Retrieval-quality evaluation: the offline metrics harness every
  * retrieval tier (BM25, dense ANN, hybrid fusion) is judged by before
  * it feeds a training-data pipeline — recall@k, MRR@k, and binary-gain
  * nDCG@k per query, computed from a ranked run and a qrels table.
  *
  * Scale posture: the run is at most q×k rows and qrels join it on
  * (query_id, doc_id) — the only corpus-scale work is building qrels,
  * which probes the term-keyed postings with a broadcast query
  * vocabulary (same discipline as BM25 batch retrieval); every metric
  * aggregate after that is per-query over ≤ k rows. Nothing here grows
  * with corpus size, so the same code evaluates a 100 TB index.
  *
  * Determinism: each per-rank DCG term rounds to 9 dp before an exact
  * DECIMAL(27,9) sum (order-independent), mirroring the engine-wide
  * moment discipline; the ideal DCG folds the same rounded terms over
  * an ascending `sequence`, so both engines sum identical values.
  */
object EvalOps {

  /** Binary AND-semantics qrels: a document is relevant to a query iff
    * it contains EVERY one of the query's terms at least once. This is
    * the deterministic label set both engines can derive from the
    * corpus itself — no human judgments exist in a synthetic fixture.
    *
    * `docs` is (idCol, textCol); `queryTerms` is (query_id, term),
    * assumed duplicate-free (deduped defensively below, as in
    * [[TextOps.bm25MultiRank]]).
    */
  def andQrels(docs: DataFrame, queryTerms: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val qt = queryTerms.select(col("query_id"), col("term")).distinct()
    val qn = qt.groupBy(col("query_id")).agg(count(lit(1)).as("__n_terms"))
    val docTerms = docs
      .select(col(idCol), explode(array_distinct(TextOps.words(col(textCol)))).as("term"))
    docTerms.join(broadcast(qt), "term")
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("__c"))
      .join(broadcast(qn), "query_id")
      .filter(col("__c") === col("__n_terms"))
      .select(col("query_id"), col(idCol))
  }

  /** Per-query recall@k, MRR@k, and binary nDCG@k.
    *
    * `run` is (query_id, rank, idCol) with rank 1-based and ≤ k rows
    * per query; `qrels` is (query_id, idCol). Queries with no relevant
    * documents report all-zero metrics rather than dropping out (a
    * silent drop would overstate the mean in a dashboard rollup).
    */
  def retrievalMetrics(run: DataFrame, qrels: DataFrame,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val dec = DecimalType(27, 9)
    val nrel = qrels.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val hits = run.join(qrels, Seq("query_id", idCol))
    val perHit = hits.groupBy(col("query_id")).agg(
      count(lit(1)).as("n_hit"),
      round(lit(1.0) / min(col("rank")), 9).as("__mrr"),
      // 1/log2(r+1) written as ln(2)/ln(r+1): the engine-wide
      // cross-parity guarantee is on ln, not on libm log2
      sum(round(log(lit(2.0)) / log(col("rank") + 1), 9).cast(dec))
        .cast("double").as("__dcg"))
    run.select(col("query_id")).distinct()
      .join(nrel, Seq("query_id"), "left")
      .join(perHit, Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("recall",
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(round(col("n_hit").cast("double") / col("n_rel"), 9)))
      .withColumn("mrr", coalesce(col("__mrr"), lit(0.0)))
      // ideal DCG: the best attainable score puts min(n_rel, k)
      // relevant docs at ranks 1..m; fold the same 9dp-rounded terms
      // as the observed DCG in exact decimal so order cannot matter
      .withColumn("__idcg",
        when(col("n_rel") === 0, lit(0.0)).otherwise(expr(
          s"""CAST(aggregate(sequence(1, int(least(n_rel, $k))),
              CAST(0 AS DECIMAL(27, 9)),
              (acc, i) -> CAST(acc + CAST(round(ln(2.0D) / ln(CAST(i AS DOUBLE) + 1.0D), 9)
                AS DECIMAL(27, 9)) AS DECIMAL(27, 9))) AS DOUBLE)""")))
      .withColumn("ndcg",
        when(col("__idcg") === 0.0, lit(0.0))
          .otherwise(round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), 9)))
      .select(col("query_id"), col("n_rel"), col("n_hit"),
        col("recall"), col("mrr"), col("ndcg"))
  }
}
