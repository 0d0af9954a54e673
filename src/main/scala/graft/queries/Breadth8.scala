package graft.queries

import graft.etl.Tables
import graft.ext.{Dedup, SketchOps, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 breadth: scene-change segmentation on the media byte-stream,
  * model-based quality filtering (fasttext-shaped linear classifier),
  * train/test leakage detection AND the leakage-safe cluster-aware
  * splitter that fixes it, a mergeable count-min frequency sketch with
  * an exact SQL twin (top-k + incremental base/delta merge),
  * per-dimension embedding statistics (the whitening/anisotropy
  * diagnostic), incremental k-means sufficient-statistic merging, MMR
  * diversified selection, reciprocal-rank fusion across retrievers,
  * sparse TF-IDF similarity self-join over trigram shingles, BPE
  * tokenizer induction, and mergeable approximate percentiles — each
  * with the scale posture documented inline.
  */
object Breadth8 {

  /** Scene cuts from frame-to-frame RMS jumps (threshold 12.0) plus a
    * 0-based running scene index per media item. One shuffle on the
    * media id (row-scale NDV — the q53 window discipline, not a
    * low-NDV partition); frames never leave their item's partition.
    */
  val mediaSceneChanges = Q(
    "media_scene_changes",
    (s, dir) =>
      graft.ext.Multimodal.sceneChanges(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"), col("frame_no")),
    Some("""
      WITH f AS (SELECT doc_id, text,
                        unnest(range((length(text) + 63) // 64)) AS frame_no
                 FROM documents WHERE length(text) > 0),
      c AS (SELECT doc_id, frame_no,
                   substring(text, (frame_no * 64 + 1)::INT, 64) AS chunk
            FROM f),
      e AS (SELECT doc_id, frame_no, length(chunk)::BIGINT AS n_samples,
                   list_sum(list_transform(range(1, length(chunk) + 1),
                     p -> ord(substring(chunk, p::INT, 1)) *
                          ord(substring(chunk, p::INT, 1))))::BIGINT AS energy
            FROM c),
      r AS (SELECT doc_id, frame_no,
                   round(sqrt(energy::DOUBLE / n_samples), 9) AS rms
            FROM e),
      d AS (SELECT doc_id, frame_no, rms,
                   lag(rms) OVER (PARTITION BY doc_id ORDER BY frame_no) AS prev
            FROM r),
      s AS (SELECT doc_id, frame_no, rms,
                   CASE WHEN prev IS NULL OR abs(rms - prev) > 12.0
                        THEN 1 ELSE 0 END AS cut
            FROM d)
      SELECT doc_id, frame_no, rms,
             (sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_no
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)::BIGINT AS scene_no
      FROM s ORDER BY doc_id, frame_no
    """.trim))

  /** Model-based quality filtering: fixed-weight linear classifier over
    * the quality features (see [[TextOps.withModelQuality]]); scan-side,
    * fully codegen'd, no shuffle.
    */
  val textQualityModel = Q(
    "text_quality_model",
    (s, dir) =>
      TextOps.withModelQuality(Tables(s, dir, "documents"), "text")
        .select(col("doc_id"), col("logit"), col("prob"), col("keep"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH n AS (SELECT doc_id, text, ${Extensions.NormW} AS w FROM documents),
      m AS (SELECT doc_id,
              len(w)::BIGINT AS n_words,
              length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio,
              length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE / len(w) AS avg_word_len,
              ${Extensions.sqlHits(TextOps.StopEn)}::DOUBLE / len(w) AS stop_ratio
            FROM n),
      l AS (SELECT doc_id,
              2.0 * least(stop_ratio * 5.0, 1.0)
                  + 1.5 * least(avg_word_len / 8.0, 1.0)
                  - 3.0 * punct_ratio
                  + 0.5 * least(n_words / 200.0, 1.0)
                  - 1.2 AS logit
            FROM m),
      p AS (SELECT doc_id, logit,
              round(1.0 / (1.0 + exp(-logit)), 9) AS prob FROM l)
      SELECT doc_id, logit, prob,
             (CASE WHEN prob >= 0.5 THEN 1 ELSE 0 END)::BIGINT AS keep
      FROM p ORDER BY doc_id
    """.trim))

  /** Train/test contamination check: content fingerprints (md5 of the
    * normalized text) that appear in MORE THAN ONE assigned split — the
    * leak a near-dup-unaware splitter creates. Runs over the augmented
    * corpus (whose exact duplicates straddle splits by construction of
    * the id-hash assignment). One fingerprint-keyed aggregate; at
    * 100 TB this is the same single-shuffle shape as exact dedup.
    */
  /** Ingest-staged per-doc (fingerprint, split) over the augmented
    * corpus: content md5 + id-hash split assignment are computed ONCE
    * at ingest — the leakage check, the cluster-safe splitter, and the
    * release gate's leakage check all read the staged scalars instead
    * of re-scanning corpus text (VERDICT r14 item 2).
    */
  def ensureSplitFingerprints(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    graft.etl.LayoutOps.ensureRunDir(s, dir, "split_fingerprints") { d =>
      Extensions.augmentedDocs(s, dir, perturb = false)
        .withColumn("fingerprint", md5(Dedup.normText(col("text"))))
        .withColumn("__b", Dedup.hash32(col("doc_id").cast("string")) % 100)
        .withColumn("split",
          when(col("__b") < 80, "train").when(col("__b") < 90, "val")
            .otherwise("test"))
        .select(col("doc_id"), col("fingerprint"), col("split"))
        .write.parquet(d)
    }

  val textSplitLeakage = Q(
    "text_split_leakage",
    (s, dir) => {
      val d = s.read.parquet(ensureSplitFingerprints(s, dir))
      d.groupBy(col("fingerprint"))
        .agg(countDistinct(col("split")).as("n_splits"),
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          concat_ws(",", array_sort(collect_set(col("split")))).as("splits"))
        .filter(col("n_splits") >= 2)
        .orderBy(col("fingerprint"))
    },
    Some(s"""
      WITH ${Extensions.augCte(perturb = false)},
      t AS (SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
              CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                   ELSE 'test' END AS split
            FROM (SELECT doc_id, text,
                    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
                  FROM aug))
      SELECT fingerprint, count(DISTINCT split) AS n_splits, count(*) AS n_docs,
             min(doc_id) AS first_doc,
             string_agg(DISTINCT split, ',' ORDER BY split) AS splits
      FROM t GROUP BY fingerprint HAVING count(DISTINCT split) >= 2
      ORDER BY fingerprint
    """.trim))

  /** Leakage-SAFE split assignment — the fix for what
    * `text_split_leakage` detects: every doc inherits the split of its
    * duplicate-cluster representative (min doc id per content
    * fingerprint), so same-content docs can never straddle splits
    * (Breadth8Spec pins zero leakage over these splits). Plan: the
    * fingerprint aggregate and the join back share one
    * fingerprint-keyed shuffle — exact dedup's shape plus an equi
    * join, still a single data-movement pass at 100 TB.
    */
  val textSplitByCluster = Q(
    "text_split_by_cluster",
    (s, dir) => {
      val d = s.read.parquet(ensureSplitFingerprints(s, dir))
        .select(col("doc_id"), col("fingerprint"))
      val rep = d.groupBy(col("fingerprint")).agg(min(col("doc_id")).as("rep_id"))
      d.join(rep, "fingerprint")
        .withColumn("__b", Dedup.hash32(col("rep_id").cast("string")) % 100)
        .withColumn("split",
          when(col("__b") < 80, "train").when(col("__b") < 90, "val").otherwise("test"))
        .select(col("doc_id"), col("fingerprint"), col("rep_id"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${Extensions.augCte(perturb = false)},
      t AS (SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM aug),
      r AS (SELECT fingerprint, min(doc_id) AS rep_id FROM t GROUP BY fingerprint),
      j AS (SELECT t.doc_id, t.fingerprint, r.rep_id,
              ('0x' || substr(md5(r.rep_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
            FROM t JOIN r USING (fingerprint))
      SELECT doc_id, fingerprint, rep_id,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM j ORDER BY doc_id
    """.trim))

  /** Build-if-absent the persisted df-capped TF-IDF postings for
    * [[dedupTfidfPairs]] — the `ensurePrefixRanked` recipe applied to
    * the last pair family whose term postings still rebuilt in-query
    * (VERDICT r12 item 1): tokenize + shingle-hash + tf/df aggregates +
    * norm join run once per corpus at ingest, and the query is billed
    * its pair join, not the corpus prep.
    */
  def ensureTfidfPostings(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    graft.etl.LayoutOps.ensureRunDir(s, dir, "dedup_tfidf_postings") { d =>
      TextOps.tfidfWeightedPostings(
        Extensions.augmentedDocs(s, dir, perturb = true),
        "doc_id", "text", maxDf = 20).write.parquet(d)
    }

  /** Sparse TF-IDF similarity self-join over the perturbed augmented
    * corpus (df ≤ 20 pair generation, cosine ≥ 0.5) — see
    * [[TextOps.tfidfSimilarPairs]]. The weighted-vector complement to
    * the MinHash/simhash set-overlap propose stages. Serves from the
    * ingest-staged postings artifact ([[ensureTfidfPostings]]).
    */
  val dedupTfidfPairs = Q(
    "dedup_tfidf_pairs",
    (s, dir) =>
      TextOps.tfidfPairsFromPostings(
          s.read.parquet(ensureTfidfPostings(s, dir)), "doc_id", minSim = 0.5)
        .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH ${Extensions.augCte(perturb = true)},
      norm AS (SELECT doc_id, ${Extensions.NormW} AS w FROM aug
               WHERE len(${Extensions.NormW}) >= 3),
      t AS (SELECT doc_id,
              ('0x' || substr(md5(w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]), 1, 8))::BIGINT AS term
            FROM norm, unnest(range(1, len(w) - 1)) AS u(i)),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM norm),
      wt AS (SELECT tf.doc_id, tf.term, dfq.df_docs,
               round(tf.tf * ln((n.n_docs + 1)::DOUBLE / (dfq.df_docs + 1)), 9) AS w
             FROM tf JOIN dfq USING (term) CROSS JOIN n),
      pr AS (SELECT * FROM wt WHERE df_docs <= 20),
      nrm AS (SELECT doc_id,
                round(sqrt(CAST(sum(CAST(round(w * w, 9) AS DECIMAL(27, 9)))
                  AS DOUBLE)), 9) AS nrm
              FROM pr GROUP BY doc_id),
      d AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(sum(CAST(round(a.w * b.w, 9) AS DECIMAL(27, 9))) AS DOUBLE) AS dot
            FROM pr a JOIN pr b ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      s AS (SELECT doc_a, doc_b,
              round(dot / (na.nrm * nb.nrm), 9) AS sim
            FROM d JOIN nrm na ON na.doc_id = d.doc_a
                   JOIN nrm nb ON nb.doc_id = d.doc_b)
      SELECT doc_a, doc_b, sim FROM s WHERE sim >= 0.5
      ORDER BY doc_a, doc_b
    """.trim))

  /** Count-min heavy hitters: the corpus word histogram sketched into a
    * 3×64 mergeable cell grid, point-estimated for the exact top-15
    * words (est >= exact always; equality when no full-row collision).
    * The cell table is constant-size regardless of corpus scale and
    * merges across partitions/days by cell addition — the q34 HLL
    * discipline for frequencies, here with an exact md5-replayable twin
    * so the driver hash-checks the whole grid path, not just bounds.
    */
  val sketchCmsTopk = Q(
    "sketch_cms_topk",
    (s, dir) => {
      // the histogram materializes ONCE (plan-audited: without the
      // checkpoint every downstream reference — 3 cell rows, top-k,
      // 3 probe rows — re-scanned the corpus)
      val wc = Tables(s, dir, "documents")
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("exact_cnt"))
        .localCheckpoint()
      val cells = SketchOps.cmsCells(wc, "word", "exact_cnt", depth = 3, width = 64)
      val top = wc.orderBy(col("exact_cnt").desc, col("word")).limit(15)
      SketchOps.cmsEstimate(cells, top, "word", depth = 3, width = 64)
        .join(top, "word")
        .select(col("word"), col("exact_cnt"), col("cms_est"))
        .orderBy(col("exact_cnt").desc, col("word"))
    },
    Some("""
      WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
                 FROM documents),
      wc AS (SELECT word, count(*) AS exact_cnt FROM w GROUP BY word),
      rows3 AS (SELECT unnest([0, 1, 2]) AS row),
      cells AS (SELECT r.row,
                  ('0x' || substr(md5('cms' || r.row::VARCHAR || '|' || word), 1, 8))::BIGINT % 64 AS bucket,
                  sum(exact_cnt)::BIGINT AS cell
                FROM wc, rows3 r GROUP BY 1, 2),
      top AS (SELECT word, exact_cnt FROM wc
              ORDER BY exact_cnt DESC, word LIMIT 15),
      probes AS (SELECT word, r.row,
                   ('0x' || substr(md5('cms' || r.row::VARCHAR || '|' || word), 1, 8))::BIGINT % 64 AS bucket
                 FROM top, rows3 r),
      est AS (SELECT word, min(cell) AS cms_est
              FROM probes JOIN cells USING (row, bucket) GROUP BY word)
      SELECT t.word, t.exact_cnt, e.cms_est
      FROM top t JOIN est e USING (word)
      ORDER BY exact_cnt DESC, word
    """.trim))

  /** Incremental sketch maintenance, driver-graded: the corpus arrives
    * as two partitions (base: doc_id % 10 != 0; delta: % 10 == 0), each
    * sketched independently; the merged grid is cell-wise addition —
    * never a corpus rescan — and serves point estimates for the union's
    * top-10 words. The U2-merge discipline applied to the frequency
    * sketch (Breadth8Spec pins merged == full-build cell-for-cell; this
    * oracle covers the merge path itself end-to-end).
    */
  val sketchCmsMerge = Q(
    "sketch_cms_merge",
    (s, dir) => {
      // one corpus scan, and the checkpoint holds the COMPACT
      // per-(partition, word) histogram, not the exploded word stream
      // (checkpointing the stream measured 20 s at 10× vs ~4 s here);
      // base/delta/full histograms all derive from it
      val wcPart = Tables(s, dir, "documents")
        .select((col("doc_id") % 10 === 0).as("__delta"),
          explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
        .groupBy(col("__delta"), col("word")).agg(count(lit(1)).as("exact_cnt"))
        .localCheckpoint()
      val base = SketchOps.cmsCells(wcPart.filter(!col("__delta")),
        "word", "exact_cnt", depth = 3, width = 64)
      val delta = SketchOps.cmsCells(wcPart.filter(col("__delta")),
        "word", "exact_cnt", depth = 3, width = 64)
      val merged = base.unionByName(delta)
        .groupBy(col("row"), col("bucket")).agg(sum(col("cell")).as("cell"))
      val full = wcPart.groupBy(col("word")).agg(sum(col("exact_cnt")).as("exact_cnt"))
      val top = full.orderBy(col("exact_cnt").desc, col("word")).limit(10)
      SketchOps.cmsEstimate(merged, top, "word", depth = 3, width = 64)
        .join(top, "word")
        .select(col("word"), col("exact_cnt"), col("cms_est"))
        .orderBy(col("exact_cnt").desc, col("word"))
    },
    Some("""
      WITH w AS (SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
                 FROM documents),
      rows3 AS (SELECT unnest([0, 1, 2]) AS row),
      wcb AS (SELECT word, count(*) AS cnt FROM w WHERE doc_id % 10 <> 0 GROUP BY word),
      wcd AS (SELECT word, count(*) AS cnt FROM w WHERE doc_id % 10 = 0 GROUP BY word),
      parts AS (
        SELECT r.row,
               ('0x' || substr(md5('cms' || r.row::VARCHAR || '|' || word), 1, 8))::BIGINT % 64 AS bucket,
               sum(cnt)::BIGINT AS cell
        FROM wcb, rows3 r GROUP BY 1, 2
        UNION ALL
        SELECT r.row,
               ('0x' || substr(md5('cms' || r.row::VARCHAR || '|' || word), 1, 8))::BIGINT % 64 AS bucket,
               sum(cnt)::BIGINT AS cell
        FROM wcd, rows3 r GROUP BY 1, 2),
      cells AS (SELECT row, bucket, sum(cell)::BIGINT AS cell
                FROM parts GROUP BY 1, 2),
      wc AS (SELECT word, count(*) AS exact_cnt FROM w GROUP BY word),
      top AS (SELECT word, exact_cnt FROM wc
              ORDER BY exact_cnt DESC, word LIMIT 10),
      probes AS (SELECT word, r.row,
                   ('0x' || substr(md5('cms' || r.row::VARCHAR || '|' || word), 1, 8))::BIGINT % 64 AS bucket
                 FROM top, rows3 r),
      est AS (SELECT word, min(cell) AS cms_est
              FROM probes JOIN cells USING (row, bucket) GROUP BY word)
      SELECT t.word, t.exact_cnt, e.cms_est
      FROM top t JOIN est e USING (word)
      ORDER BY exact_cnt DESC, word
    """.trim))

  /** Incremental k-means, the model twin of the index merges: base and
    * delta corpora each reduce to per-(cluster, dim) sufficient
    * statistics (decimal-exact coordinate sums + counts) against the
    * FIXED centroid model; the merged centroid update is statistic
    * addition — never a corpus rescan — and equals the full-corpus
    * recompute exactly (decimal sums are associative; Breadth8Spec pins
    * it). This is the mini-batch/distributed centroid-update shape: at
    * 100 TB each partition ships k×dims rows, the merge is
    * constant-size.
    */
  val annKmeansMerge = Q(
    "ann_kmeans_merge",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000)
      def stats(part: org.apache.spark.sql.DataFrame) =
        graft.ext.Similarity.kmeansAssign(s, part, cents,
            "vec_id", "embedding", "vec_id", "embedding")
          .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy(col("cluster"), col("dim").cast("long").as("dim"))
          .agg(sum(round(col("x").cast("double"), 9)
            .cast(DecimalType(27, 9))).as("__s"), count(lit(1)).as("n"))
      stats(emb.filter(col("vec_id") % 10 =!= 0))
        .unionByName(stats(emb.filter(col("vec_id") % 10 === 0)))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("__s")).as("__s"), sum(col("n")).as("n"))
        // mean stays UNROUNDED: exact decimal sum -> double cast -> one
        // IEEE divide is bit-identical in both engines, while a 9-dp
        // round re-introduces the decimal-half-boundary divergence
        // (observed at sf0.1: a mean of ...2655 rounded differently)
        .select(col("cluster"), col("dim"), col("n"),
          (col("__s").cast("double") / col("n")).as("mean"))
        .orderBy(col("cluster"), col("dim"))
    },
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                    WHERE vec_id % 37 = 0 AND vec_id < 5000),
      a AS (SELECT vec_id, embedding, is_delta, cid FROM (
              SELECT e.vec_id, e.embedding, (e.vec_id % 10 = 0) AS is_delta, t.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY ${Extensions.sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
              FROM embeddings e, cent t) WHERE rn = 1),
      x AS (SELECT cid AS cluster, i AS dim, embedding[(i + 1)::INT]::DOUBLE AS xd,
                   is_delta
            FROM a, unnest(range(len(embedding))) AS u(i)),
      s AS (SELECT cluster, dim, is_delta,
                   sum(CAST(round(xd, 9) AS DECIMAL(27, 9))) AS s,
                   count(*) AS n
            FROM x GROUP BY 1, 2, 3),
      m AS (SELECT cluster, dim, sum(s) AS s, sum(n)::BIGINT AS n
            FROM s GROUP BY 1, 2)
      SELECT cluster, dim, n, s::DOUBLE / n AS mean
      FROM m ORDER BY cluster, dim
    """.trim))

  /** Per-dimension embedding statistics (mean/std): the anisotropy and
    * whitening diagnostic. Sums are 9-dp-rounded DECIMAL(27,9) — exact
    * and order-independent (the kmeans centroid discipline) — divided
    * once in double. One map-side-combining aggregate on (dim): the
    * group count equals the embedding width, and partial aggregation
    * means low key NDV is harmless here (unlike a window partition).
    */
  val annDimStats = Q(
    "ann_dim_stats",
    (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .withColumn("xd", col("x").cast("double"))
        .groupBy(col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("xd"), 9).cast(DecimalType(27, 9))).as("__sx"),
          sum(round(col("xd") * col("xd"), 9).cast(DecimalType(27, 9))).as("__sxx"))
        .select(col("dim"), col("n"),
          round(col("__sx").cast("double") / col("n"), 9).as("mean"),
          round(sqrt(greatest(
            col("__sxx").cast("double") / col("n") -
              (col("__sx").cast("double") / col("n")) *
              (col("__sx").cast("double") / col("n")),
            lit(0.0))), 9).as("std"))
        .orderBy(col("dim")),
    Some("""
      WITH x AS (SELECT i AS dim, embedding[(i + 1)::INT]::DOUBLE AS xd
                 FROM embeddings, unnest(range(len(embedding))) AS u(i)),
      a AS (SELECT dim, count(*) AS n,
              sum(CAST(round(xd, 9) AS DECIMAL(27, 9))) AS sx,
              sum(CAST(round(xd * xd, 9) AS DECIMAL(27, 9))) AS sxx
            FROM x GROUP BY dim)
      SELECT dim, n, round(sx::DOUBLE / n, 9) AS mean,
             round(sqrt(greatest(
               sxx::DOUBLE / n - (sx::DOUBLE / n) * (sx::DOUBLE / n), 0.0)), 9) AS std
      FROM a ORDER BY dim
    """.trim))

  /** Mergeable approximate percentiles: `percentile_approx` (the
    * Greenwald-Khanna-style quantile summary) over the same row-scale
    * column whose EXACT path is StatOps.percentiles — the
    * bounded-memory, partial-aggregating sketch a 100 TB pipeline uses
    * when the contract tolerates approximation (the q10/q34 sketch
    * discipline applied to quantiles). Estimates are engine-specific →
    * rows-only at the driver; Breadth8Spec pins relative error vs the
    * exact distributed order statistics at ≤ 0.5%.
    */
  val q57ApproxPercentile = Q(
    "q57_approx_percentile",
    (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          expr("percentile_approx(o_totalprice, 0.5, 10000)").as("p50_approx"),
          expr("percentile_approx(o_totalprice, 0.9, 10000)").as("p90_approx"))
        .orderBy(col("o_orderpriority")),
    None)

  // ---- MMR diversified selection -----------------------------------------

  private def mmrRoundCtes(r: Int): String = {
    val prev = s"selu${r - 1}"
    s"""m$r AS (
        SELECT c.query_id, c.cand_id, max(${Extensions.sqlCos("c.cv", "s.sv")}) AS ms
        FROM cand c JOIN (SELECT query_id, cv AS sv FROM $prev) s USING (query_id)
        WHERE NOT EXISTS (SELECT 1 FROM $prev x
                          WHERE x.query_id = c.query_id AND x.cand_id = c.cand_id)
        GROUP BY 1, 2),
      p$r AS (
        SELECT query_id, cand_id, rel, mmr, $r::BIGINT AS step, cv FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY mmr DESC, cand_id) AS rn FROM (
            SELECT c.query_id, c.cand_id, c.rel, c.cv,
                   (7 * CAST(round(c.rel * 1000000000, 0) AS BIGINT)
                    - 3 * CAST(round(m.ms * 1000000000, 0) AS BIGINT)) / 1e10 AS mmr
            FROM m$r m JOIN cand c USING (query_id, cand_id)))
        WHERE rn = 1),
      selu$r AS (SELECT * FROM $prev UNION ALL SELECT * FROM p$r)"""
  }

  /** MMR top-5 from the 25 most-relevant candidates per query, λ=0.7
    * (see [[graft.ext.Similarity.mmrSelect]]): diversified retrieval /
    * batch de-redundancy. The oracle unrolls the four greedy rounds.
    */
  val annMmrDiversify = Q(
    "ann_mmr_diversify",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      graft.ext.Similarity.mmrSelect(s, emb,
          emb.filter(col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 5, nCand = 25, lambda = 0.7)
        .orderBy(col("query_id"), col("step"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                 WHERE vec_id % 100 = 0),
      c0 AS (SELECT q.query_id, e.vec_id AS cand_id,
                    ${Extensions.sqlCos("e.embedding", "q.qv")} AS rel,
                    e.embedding AS cv
             FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
      cand AS (SELECT query_id, cand_id, rel, cv FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                             ORDER BY rel DESC, cand_id) AS rn FROM c0)
               WHERE rn <= 25),
      selu1 AS (SELECT query_id, cand_id, rel, rel AS mmr, 1::BIGINT AS step, cv
                FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, cand_id) AS rn FROM cand)
                WHERE rn = 1),
      ${mmrRoundCtes(2)},
      ${mmrRoundCtes(3)},
      ${mmrRoundCtes(4)},
      ${mmrRoundCtes(5)}
      SELECT query_id, step, cand_id, rel, mmr FROM selu5
      ORDER BY query_id, step
    """.trim))

  /** Reciprocal-rank fusion of the cosine and Euclidean rankings
    * (top-20 pools, k=60 fusion constant, top-5 fused) — see
    * [[graft.ext.Similarity.rankFusionTopK]]. The hybrid-search
    * combiner over retrievers that genuinely disagree on this corpus
    * (vector norms vary), with the fused score exact in both engines
    * because ranks are small integers.
    */
  val annRankFusion = Q(
    "ann_rank_fusion",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      graft.ext.Similarity.rankFusionTopK(s, emb,
          emb.filter(col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 5, kPool = 20)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                 WHERE vec_id % 100 = 0),
      sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                    ${Extensions.sqlCos("e.embedding", "q.qv")} AS cosv,
                    round(sqrt(list_sum(list_transform(range(len(q.qv)), i ->
                      (q.qv[i+1]::DOUBLE - e.embedding[i+1]::DOUBLE)
                      * (q.qv[i+1]::DOUBLE - e.embedding[i+1]::DOUBLE)))), 9) AS l2v
             FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
      rc AS (SELECT query_id, neighbor_id, rn::BIGINT AS rank_cos FROM (
               SELECT query_id, neighbor_id, row_number() OVER (
                 PARTITION BY query_id ORDER BY cosv DESC, neighbor_id) AS rn
               FROM sc) WHERE rn <= 20),
      rl AS (SELECT query_id, neighbor_id, rn::BIGINT AS rank_l2 FROM (
               SELECT query_id, neighbor_id, row_number() OVER (
                 PARTITION BY query_id ORDER BY l2v ASC, neighbor_id) AS rn
               FROM sc) WHERE rn <= 20),
      f AS (SELECT coalesce(rc.query_id, rl.query_id) AS query_id,
                   coalesce(rc.neighbor_id, rl.neighbor_id) AS neighbor_id,
                   coalesce(1.0 / (60.0 + rank_cos), 0.0)
                     + coalesce(1.0 / (60.0 + rank_l2), 0.0) AS rrf_score
            FROM rc FULL OUTER JOIN rl
              ON rc.query_id = rl.query_id AND rc.neighbor_id = rl.neighbor_id)
      SELECT query_id, rank, neighbor_id, rrf_score FROM (
        SELECT query_id, neighbor_id, rrf_score, row_number() OVER (
          PARTITION BY query_id ORDER BY rrf_score DESC, neighbor_id)::BIGINT AS rank
        FROM f) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  // ---- BPE tokenizer induction -------------------------------------------

  private def bpeRoundCtes(i: Int): String = {
    val prev = s"wc${i - 1}"
    s"""p$i AS (
        SELECT s[j] AS left_sym, s[j + 1] AS right_sym, sum(cnt)::BIGINT AS pair_cnt
        FROM (SELECT list_filter(str_split(seq, '|'), x -> x <> '') AS s, cnt
              FROM $prev),
             unnest(range(1, len(s))) AS u(j)
        GROUP BY 1, 2),
      best$i AS (SELECT left_sym, right_sym, pair_cnt FROM p$i
                 ORDER BY pair_cnt DESC, left_sym, right_sym LIMIT 1),
      wc$i AS (
        SELECT replace(replace(replace(replace(replace(seq, pat, rep),
                 pat, rep), pat, rep), pat, rep), pat, rep) AS seq, cnt
        FROM $prev, (SELECT '|' || left_sym || '|' || right_sym || '|' AS pat,
                            '|' || left_sym || right_sym || '|' AS rep
                     FROM best$i) b)"""
  }

  /** Three rounds of BPE merge learning over the corpus word histogram
    * (see [[TextOps.bpeMerges]] for semantics and the 100 TB posture:
    * corpus → word histogram once, then vocabulary-bounded rounds).
    * Both engines apply the merge rewrite as exactly five nested
    * `replace` passes, so the twin is equal by construction even before
    * the fixpoint argument.
    */
  val textBpeMerges = Q(
    "text_bpe_merges",
    (s, dir) =>
      TextOps.bpeMerges(Tables(s, dir, "documents"), "text", rounds = 3),
    Some(s"""
      WITH wc0 AS (
        SELECT '|' || regexp_replace(word, '(.)', '\\1|', 'g') AS seq,
               count(*) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
              FROM documents)
        GROUP BY 1),
      ${bpeRoundCtes(1)},
      ${bpeRoundCtes(2)},
      ${bpeRoundCtes(3)}
      SELECT merge_round, left_sym, right_sym, pair_cnt FROM (
        SELECT 1::BIGINT AS merge_round, * FROM best1
        UNION ALL SELECT 2::BIGINT, * FROM best2
        UNION ALL SELECT 3::BIGINT, * FROM best3)
      ORDER BY merge_round
    """.trim))

  def all: Seq[Q] = Seq(mediaSceneChanges, textQualityModel, textSplitLeakage,
    textSplitByCluster, dedupTfidfPairs, sketchCmsTopk, sketchCmsMerge,
    annDimStats, annKmeansMerge, annMmrDiversify, annRankFusion,
    textBpeMerges, q57ApproxPercentile)
}
