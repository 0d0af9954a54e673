package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** k-NN label accuracy — the standard intrinsic eval of an embedding
    * space (does the metric structure respect the labels?): each query
    * vector's k nearest corpus neighbors (exact cosine, self excluded)
    * vote for a label (majority, ties to the smallest label id); the
    * prediction is scored against the query's own label and rolled up
    * per true label, so a per-class failure is visible instead of
    * averaged away.
    *
    * Scale posture: the query set is bounded by design (an eval draws a
    * deterministic sample — callers pass it explicitly), so the corpus
    * scan is one broadcast-queries scoring pass; everything after the
    * top-k is per-query over ≤ k rows. At 100 TB swap the exact ranker
    * for the IVF probe — votes and rollup are ranker-agnostic.
    *
    * Determinism: sims round to 9 dp with id tie-breaks in the ranker;
    * vote counts are integers with the label tie-break, so both engines
    * pick identical predictions.
    */
  def knnLabelAccuracy(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val nn = Similarity.bruteForceTopK(spark, corpus, queries, idCol, vecCol, k)
    val nbrLabels = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).cast("long").as("__nl"))
    val pred = nn.join(nbrLabels, "neighbor_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col("query_id"))
      .agg(max(struct(col("__cnt").as("c"), (-col("__nl")).as("negl"))).as("__best"))
      .select(col("query_id"), (-col("__best").getField("negl")).as("__pred"))
    pred
      .join(queries.select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("label")), "query_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("__pred") === col("label"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy",
        round(col("n_correct").cast("double") / col("n_queries"), 9))
  }

  /** Population-stability-index report from per-group count pairs —
    * the drift math shared by the batch monitor (`eval_source_drift`)
    * and its incremental twin: counts ARE PSI's sufficient statistic
    * (merging two count frames is addition), so a streaming per-group
    * counter maintains drift exactly — the same merge-is-addition
    * argument as the CMS grid and the k-means statistic merge.
    *
    * Input is one row per group: (groupCol, n_a, n_b). Shares are
    * Laplace-smoothed — a group absent from one snapshot contributes a
    * large finite term, not ∞ — and round to 9 dp BEFORE the ln so
    * both engines take ln of identical doubles.
    */
  def psiReport(counts: DataFrame, groupCol: String): DataFrame = {
    val tot = counts.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb"), count(lit(1)).as("__s"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p_a",
        round((col("n_a") + 1).cast("double") / (col("__ta") + col("__s")), 9))
      .withColumn("p_b",
        round((col("n_b") + 1).cast("double") / (col("__tb") + col("__s")), 9))
      .withColumn("psi_term",
        round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")), 9))
      .select(col(groupCol), col("n_a"), col("n_b"), col("p_a"), col("p_b"),
        col("psi_term"))
  }

  /** Per-cluster label purity — the clustering-quality eval run on a
    * trained (or seed) coarse quantizer before it is trusted to route
    * an ANN index: for each cluster, the share of members carrying the
    * cluster's majority label (ties to the smallest label id). Low
    * purity on a list means the quantizer splits semantic neighbors
    * across lists and serve-time recall pays for it.
    *
    * `assigned` is one row per member with (clusterCol, labelCol);
    * labels must be numeric (the deterministic tie-break negates them).
    * Both aggregates are map-side-combinable over (cluster, label)
    * cells — never wider than k × |labels| rows after the first
    * shuffle, so the eval costs one pass at any corpus size.
    */
  def clusterLabelPurity(assigned: DataFrame, clusterCol: String,
      labelCol: String): DataFrame = {
    val cells = assigned
      .groupBy(col(clusterCol).cast("long").as("cluster"),
        col(labelCol).cast("long").as("__l"))
      .agg(count(lit(1)).as("__cnt"))
    cells.groupBy(col("cluster"))
      .agg(sum(col("__cnt")).as("n"),
        max(struct(col("__cnt").as("c"), (-col("__l")).as("negl"))).as("__best"))
      .select(col("cluster"), col("n"),
        (-col("__best").getField("negl")).as("top_label"),
        col("__best").getField("c").as("n_top"))
      .withColumn("purity", round(col("n_top").cast("double") / col("n"), 9))
  }

  /** Schema-driven column-level drift monitor — per monitored column,
    * null rate in each snapshot half and (for numeric columns) the
    * half means with their absolute shift: the per-column checks a
    * data-observability suite alarms on (a silent upstream change
    * shows up as a null-rate jump or a mean shift long before anyone
    * reads the rows).
    *
    * `half` must evaluate to 0/1 (the two populations — a snapshot
    * hash split, a day boundary, an A/B flag). The conditional sums
    * for EVERY column are generated from `df`'s schema into ONE
    * map-side-combined aggregate pass — the table is scanned once
    * however many columns are monitored; the per-column report rows
    * then project from that single aggregate row, so adding a column
    * adds three counters, not a scan. Numeric means sum in
    * DECIMAL(18,2) before one double division (the engine money
    * discipline); non-numeric columns report null rates with null
    * means. Rates round to 9 dp, means and shifts to 6 dp.
    */
  def columnDrift(df: DataFrame, half: org.apache.spark.sql.Column,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnDrift needs at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"column $c not in schema ${schema.fieldNames.toSeq}"))
    val numeric = cols.filter(c =>
      schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .toSet
    val dec = DecimalType(18, 2)
    val h = df.withColumn("__h", half.cast("long"))
    val aggCols =
      Seq(sum(when(col("__h") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__h") === 1, 1L).otherwise(0L)).as("n_b")) ++
      cols.zipWithIndex.flatMap { case (c, i) =>
        val base = Seq(
          sum(when(col("__h") === 0 && col(c).isNull, 1L).otherwise(0L))
            .as(s"null_a_$i"),
          sum(when(col("__h") === 1 && col(c).isNull, 1L).otherwise(0L))
            .as(s"null_b_$i"))
        if (numeric(c)) base ++ Seq(
          sum(when(col("__h") === 0, col(c)).cast(dec)).as(s"sum_a_$i"),
          sum(when(col("__h") === 1, col(c)).cast(dec)).as(s"sum_b_$i"))
        else base
      }
    val agg = h.agg(aggCols.head, aggCols.tail: _*)
    def rate(nulls: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      round(nulls.cast("double") / n, 9)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val (ma, mb) =
        if (numeric(c)) (
          round(col(s"sum_a_$i").cast("double") / (col("n_a") - col(s"null_a_$i")), 6),
          round(col(s"sum_b_$i").cast("double") / (col("n_b") - col(s"null_b_$i")), 6))
        else (lit(null).cast("double"), lit(null).cast("double"))
      agg.select(lit(c).as("column_name"),
        rate(col(s"null_a_$i"), col("n_a")).as("null_rate_a"),
        rate(col(s"null_b_$i"), col("n_b")).as("null_rate_b"),
        ma.as("mean_a"), mb.as("mean_b"))
    }
    rows.reduce(_ unionByName _)
      .withColumn("mean_shift",
        when(col("mean_a").isNotNull,
          round(abs(col("mean_a") - col("mean_b")), 6)))
  }

  /** Rule-driven constraint audit: every rule is a boolean predicate
    * over the frame; the report is one row per rule with checked /
    * violation counts and the violation rate — the dq tier's
    * cross-FIELD axis (dq1–dq3 audit single columns; a business rule
    * like "ship date is never before order date" spans several).
    * A row where the predicate evaluates to NULL counts as a
    * VIOLATION — a constraint that cannot be proven satisfied is not
    * satisfied (the SQL CHECK-constraint reading would silently pass
    * it; an audit must not).
    *
    * All rules fold into ONE map-side-combined conditional-sum
    * aggregate pass (the [[columnDrift]] shape — adding a rule adds a
    * sum, not a scan), and the one-row result is checkpointed before
    * fan-out into per-rule report rows, so the fact table is scanned
    * exactly once however many rules are registered.
    */
  def ruleAudit(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "ruleAudit needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "duplicate rule names")
    val aggs = Seq(count(lit(1)).as("__n")) ++
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"__v_$i") }
    val agg = df.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    rules.zipWithIndex.map { case ((name, _), i) =>
      agg.select(lit(name).as("rule"), col("__n").as("n_checked"),
        col(s"__v_$i").as("n_violations"),
        round(col(s"__v_$i").cast("double") / col("__n").cast("double"), 9)
          .as("violation_rate"))
    }.reduce(_ unionByName _)
  }

  /** Per-group freshness/SLA monitor — the arrival-lag complement of
    * the value-distribution monitors (dq4/dq7 watch WHAT arrived; this
    * watches WHEN): for every group, event count, newest timestamp, lag
    * behind the corpus-wide newest timestamp in whole seconds, count of
    * events inside the trailing `recentWindowSec` window (anchored at
    * the global max, so the report is reproducible from the data alone
    * — no wall clock, the injected-literal discipline of P5/P17), and a
    * 0/1 stale flag for lag > `staleAfterSec`. A source whose feed
    * silently died shows lag climbing and n_recent → 0 long before any
    * distribution test fires.
    *
    * Plan shape: one global max (one-row frame, broadcast into the
    * scan) + one group-keyed aggregate with map-side partials — two
    * passes over the log, no window function, no per-group state beyond
    * the aggregation buffer. Lag arithmetic is integer microseconds
    * (`div`), never float, so the seconds are engine-exact.
    */
  def freshness(events: DataFrame, groupCol: String, tsCol: String,
      recentWindowSec: Long, staleAfterSec: Long): DataFrame = {
    require(recentWindowSec > 0, s"recentWindowSec must be positive, got $recentWindowSec")
    require(staleAfterSec >= 0, s"staleAfterSec must be non-negative, got $staleAfterSec")
    val gmax = events.agg(max(col(tsCol).cast("timestamp")).as("__gmax"))
    events.crossJoin(broadcast(gmax))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_events"),
        max(col(tsCol).cast("timestamp")).as("max_ts"),
        sum(when(unix_micros(col(tsCol).cast("timestamp")) >=
          unix_micros(col("__gmax")) - recentWindowSec * 1000000L, 1L)
          .otherwise(0L)).as("n_recent"),
        max(unix_micros(col("__gmax"))).as("__gm"))
      .withColumn("lag_sec",
        expr("(__gm - unix_micros(max_ts)) div 1000000"))
      .withColumn("stale",
        when(col("lag_sec") > staleAfterSec, 1L).otherwise(0L))
      .select(col(groupCol), col("n_events"), col("max_ts"),
        col("lag_sec"), col("n_recent"), col("stale"))
  }

  /** Embedding-space drift between two corpus snapshots, per group —
    * the vector-tier complement of [[psiReport]] (categorical counts)
    * and [[columnDrift]] (scalar columns): when the embedding model is
    * swapped or the upstream content shifts, each group's MEAN VECTOR
    * moves, and that movement (cosine between the two halves' centroids,
    * L2 shift norm) is the alarm a vector-index owner pages on — a
    * centroid that moved invalidates trained IVF lists and ANN recall
    * pins long before any scalar monitor notices.
    *
    * `half` splits rows into snapshot 0/1 (deterministic id parity, a
    * date cutoff, ...). Plan: posexplode to (group, dim, half) cells →
    * ONE map-side-combined aggregate to g×d×2 rows (the per-dim means,
    * exact DECIMAL sums → rounded doubles — the ann_dim_stats moment
    * discipline) → per-(group, dim) pivot of the two means → per-group
    * fold over d rows. Nothing after the first aggregate scales with
    * the corpus; per-dim products round to 9 dp and sum in
    * DECIMAL(27,9), so the fold is order-independent and
    * engine-portable.
    */
  def embeddingDrift(emb: DataFrame, groupCol: String,
      half: org.apache.spark.sql.Column, vecCol: String): DataFrame = {
    val cells = emb
      .withColumn("__half", half.cast("int"))
      .select(col(groupCol), col("__half"),
        posexplode(col(vecCol)).as(Seq("__dim", "__x")))
      .groupBy(col(groupCol), col("__dim"), col("__half"))
      .agg(count(lit(1)).as("__n"),
        sum(round(col("__x").cast("double"), 9).cast(DecimalType(27, 9))).as("__sx"))
      .withColumn("__mean", round(col("__sx").cast("double") / col("__n"), 9))
    val byDim = cells.groupBy(col(groupCol), col("__dim"))
      .agg(max(when(col("__half") === 0, col("__mean"))).as("__m0"),
        max(when(col("__half") === 1, col("__mean"))).as("__m1"),
        max(when(col("__half") === 0, col("__n"))).as("__n0"),
        max(when(col("__half") === 1, col("__n"))).as("__n1"))
    def dsum(c: org.apache.spark.sql.Column) =
      sum(round(c, 9).cast(DecimalType(27, 9))).cast("double")
    byDim.groupBy(col(groupCol))
      .agg(max(col("__n0")).cast("long").as("n_old"),
        max(col("__n1")).cast("long").as("n_new"),
        dsum(col("__m0") * col("__m1")).as("__s01"),
        dsum(col("__m0") * col("__m0")).as("__s00"),
        dsum(col("__m1") * col("__m1")).as("__s11"),
        dsum((col("__m0") - col("__m1")) * (col("__m0") - col("__m1"))).as("__sdd"))
      .select(col(groupCol), col("n_old"), col("n_new"),
        round(col("__s01") / (sqrt(col("__s00")) * sqrt(col("__s11"))), 9)
          .as("centroid_cos"),
        round(sqrt(col("__sdd")), 9).as("l2_shift"))
  }
}
