package graft.queries

import graft.etl.Tables
import org.apache.spark.sql.functions._

/** Round-8 breadth: row-level sessionization (the batch side of the
  * `session_window` streaming twin), BM25 ranked retrieval over an
  * inverted index with a persisted build/serve split, fixed-iteration
  * PageRank, Johnson-Lindenstrauss random projection, centroid-distance
  * embedding outliers, and deterministic train/val/test splits — each a
  * bounded-shuffle plan whose partitioning survives a 100 TB input.
  */
object Breadth7 {

  /** Row-level gap sessions (30-minute gap at microsecond precision,
    * exact-gap merges — the `session_window` inclusive-end merge rule):
    * one row per (user, session) with
    * boundaries and event count. The whole operator is one shuffle of
    * the event log on user_id (window pass + session aggregate share
    * the exchange). `q8_sessionize` keeps the legacy seconds-truncated
    * per-user counts; this is the session frame under it, and
    * `StreamingOps.streamingSessionize` finalizes exactly these rows
    * (Round8Spec pins the equivalence).
    */
  val q53SessionStats = Q(
    "q53_session_stats",
    (s, dir) =>
      graft.etl.EventOps.sessionize(Tables(s, dir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 1800L)
        .orderBy(col("user_id"), col("session_seq")),
    Some("""
      WITH g AS (
        SELECT user_id, ts, event_id,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events),
      f AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_us IS NULL
                         OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM g),
      sn AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
        FROM f)
      SELECT user_id, session_seq, min(ts) AS started_at, max(ts) AS ended_at,
             count(*) AS n_events
      FROM sn GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq
    """.trim))

  // ---- BM25 ranked retrieval ---------------------------------------------

  /** The fixed query for the BM25 pair: terms that actually occur in the
    * corpus, so tf differences (not mere presence) drive the ranking.
    */
  private val Bm25Terms = Seq("vector", "stream", "filter")

  /** DuckDB mirror of the BM25 pipeline: identical integer inputs,
    * identical IEEE expression text (1.2/2.2 parse to the same binary
    * doubles in both engines; 0.75/0.25 are exact), per-term round to
    * 9 dp, exact DECIMAL(27,9) per-doc fold.
    */
  private def bm25Sql(terms: Seq[String], k: Int, source: String = "documents",
      pre: String = ""): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""
      WITH ${pre}norm AS (SELECT doc_id, ${Extensions.NormW} AS w FROM $source),
      t AS (SELECT doc_id, unnest(w) AS term FROM norm),
      dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
      stats AS (SELECT count(*) AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t
             WHERE term IN ($inList) GROUP BY doc_id, term),
      dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
      sc AS (SELECT tf.doc_id,
               round(ln(1.0::DOUBLE + (n_docs - df_docs + 0.5::DOUBLE) / (df_docs + 0.5::DOUBLE)) *
                     ((tf * 2.2::DOUBLE) /
                      (tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE *
                        (dl::DOUBLE / (sum_dl::DOUBLE / n_docs::DOUBLE))))), 9) AS score_t
             FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
      agg AS (SELECT doc_id, CAST(sum(CAST(score_t AS DECIMAL(27,9))) AS DOUBLE) AS score
              FROM sc GROUP BY doc_id),
      topk AS (SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id LIMIT $k)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank, doc_id, score
      FROM topk ORDER BY rank
    """.trim
  }

  /** BM25 ranked retrieval, end-to-end from the corpus: tokenize →
    * postings → score → top-k. The term filter lands before the tf
    * aggregate, so only query-term postings ever shuffle; ranking is
    * TakeOrderedAndProject, never a global window.
    */
  val textBm25 = Q(
    "text_bm25_topk",
    (s, dir) =>
      graft.ext.TextOps.bm25TopK(Tables(s, dir, "documents"),
          "doc_id", "text", Bm25Terms, k = 25)
        .orderBy(col("rank")),
    Some(bm25Sql(Bm25Terms, 25)))

  /** Build-if-absent persisted inverted index + stats (the text twin of
    * the ANN serving tier): postings parquet keyed by term, one-row
    * stats table. Built once per corpus at ingest (Bench warms it), so
    * serve queries only probe.
    */
  def ensureTextIndex(s: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    val docs = Tables(s, dir, "documents")
    val posts = graft.etl.LayoutOps.ensureRunDir(s, dir, "text_inv_index") { d =>
      graft.ext.TextOps.buildInvertedIndex(docs, "doc_id", "text").write.parquet(d)
    }
    val stats = graft.etl.LayoutOps.ensureRunDir(s, dir, "text_inv_stats") { d =>
      graft.ext.TextOps.corpusStats(s.read.parquet(posts), "doc_id").write.parquet(d)
    }
    (posts, stats)
  }

  /** BM25 serving path: probe the persisted postings (term predicate
    * pushed to the parquet scan — the plan never tokenizes the corpus)
    * and score with the same ranking machinery, so the oracle is the
    * same SQL as the from-corpus query.
    */
  val textIndexServe = Q(
    "text_index_serve",
    (s, dir) => {
      val (postsDir, statsDir) = ensureTextIndex(s, dir)
      graft.ext.TextOps.bm25RankFromPostings(
          s.read.parquet(postsDir).filter(col("term").isInCollection(Bm25Terms)),
          s.read.parquet(statsDir), "doc_id", k = 25)
        .orderBy(col("rank"))
    },
    Some(bm25Sql(Bm25Terms, 25)))

  // ---- PageRank ----------------------------------------------------------

  /** Unrolled DuckDB mirror of GraphOps.pageRank: r0..rN as chained
    * CTEs (recursive CTEs cannot aggregate in the recursive term, so
    * the fixed iteration count unrolls — 5 rounds is 5 copies of the
    * same two CTEs). Arithmetic matches the Spark side literally:
    * round-12dp contributions, exact DECIMAL(38,12) inbound fold,
    * round-12dp rank update.
    */
  private def pageRankSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT dst, CAST(sum(CAST(round(rank / outdeg, 12) AS DECIMAL(38,12))) AS DOUBLE) AS inr
             FROM edges JOIN r${i - 1} ON src = node JOIN outdeg USING (src) GROUP BY dst),
      r$i AS (SELECT node, round((1.0::DOUBLE - 0.85::DOUBLE) / n + 0.85::DOUBLE * coalesce(inr, 0.0::DOUBLE), 12) AS rank
             FROM nodes CROSS JOIN nn LEFT JOIN c$i ON node = dst)"""
    }.mkString(",\n      ")
    s"""
      WITH edges AS (SELECT DISTINCT c_nationkey::BIGINT AS src, s_nationkey::BIGINT AS dst
                     FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
                     JOIN supplier ON l_suppkey = s_suppkey),
      nodes AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
      nn AS (SELECT count(*) AS n FROM nodes),
      outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
      r0 AS (SELECT node, round(1.0::DOUBLE / n, 12) AS rank FROM nodes CROSS JOIN nn),
      $rounds
      SELECT node, rank FROM r$iters ORDER BY node
    """.trim
  }

  /** PageRank over the customer-nation → supplier-nation trade graph
    * (distinct nation pairs that actually traded, via customer ⋈ orders
    * ⋈ lineitem ⋈ supplier — dimension joins broadcast, the fact table
    * never reshuffles). The edge list is checkpointed once so the
    * 5 ranking rounds iterate over a materialized ~N² nation-pair
    * table, not a re-executed 4-way join.
    */
  val q54PageRank = Q(
    "q54_pagerank",
    (s, dir) => {
      val edges = Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").cast("long").as("src"),
          col("s_nationkey").cast("long").as("dst"))
        .distinct()
        .localCheckpoint()
      graft.ext.GraphOps.pageRank(edges, iters = 5)
        .orderBy(col("node"))
    },
    Some(pageRankSql(5)))

  // ---- random projection -------------------------------------------------

  /** Johnson-Lindenstrauss ±1 projection 64 → 16 dims, long form. Both
    * engines derive the sign matrix from md5("k:j") and fold the dot
    * product in ascending-j order (codegen'd add chain ↔ list_sum's
    * sequential fold), so values are bit-identical; Round8Spec pins the
    * JL guarantee itself (projected cosine tracks exact cosine).
    */
  val annRandomProjection = Q(
    "ann_random_projection",
    (s, dir) =>
      graft.ext.Similarity.randomProjection(
          Tables(s, dir, "embeddings"), "vec_id", "embedding", inDims = 64, outDims = 16)
        .orderBy(col("vec_id"), col("dim")),
    Some("""
      WITH m AS (SELECT k FROM range(16) t(k)),
      p AS (SELECT e.vec_id, m.k AS dim,
              round(list_sum(list_transform(range(64), j ->
                e.embedding[j+1]::DOUBLE *
                (CASE WHEN substr(md5(m.k::VARCHAR || ':' || j::VARCHAR), 1, 1) <= '7'
                      THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END))) * 0.25::DOUBLE, 9) AS value
            FROM embeddings e CROSS JOIN m)
      SELECT vec_id, dim::BIGINT AS dim, value FROM p ORDER BY vec_id, dim
    """.trim))

  // ---- centroid-distance outliers ----------------------------------------

  /** Embedding quality filter by prototypicality: every vector scores
    * against its assigned centroid's exact-decimal cluster mean; a
    * vector more than 0.05 below its cluster's mean similarity is
    * flagged. The assignment is the zero-shuffle scan-side argmax
    * (inlined scale-fixed centroids); the per-cluster means are k rows
    * broadcast back — so at 100 TB the whole filter is one corpus pass
    * plus one k-row aggregate, the SemDeDup/CLIP-filter dataflow.
    */
  val annCentroidOutliers = Q(
    "ann_centroid_outliers",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cent = emb.filter(col("vec_id") % 250 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val assigned = graft.ext.Similarity.kmeansAssign(s, emb, cent,
          "vec_id", "embedding", "cid", "cv")
        .select(col("vec_id"), col("cluster"), col("sim"))
      val means = assigned.groupBy(col("cluster"))
        .agg((sum(col("sim").cast(org.apache.spark.sql.types.DecimalType(15, 9)))
          .cast("double") / count(lit(1))).as("avg_sim"))
      assigned.join(broadcast(means), "cluster")
        .withColumn("is_outlier",
          when(col("sim") < col("avg_sim") - lit(0.05), 1L).otherwise(0L))
        .select(col("vec_id"), col("cluster"), col("sim"), col("is_outlier"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                    WHERE vec_id % 250 = 0 AND vec_id < 5000),
      a AS (SELECT vec_id, cid, sim,
                   row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
            FROM (SELECT e.vec_id, c.cid, ${Extensions.sqlCos("e.embedding", "c.cv")} AS sim
                  FROM embeddings e, cent c)),
      asg AS (SELECT vec_id, cid AS cluster, sim FROM a WHERE rn = 1),
      m AS (SELECT cluster, CAST(sum(CAST(sim AS DECIMAL(15,9))) AS DOUBLE) / count(*) AS avg_sim
            FROM asg GROUP BY cluster)
      SELECT vec_id, cluster, sim,
             (CASE WHEN sim < avg_sim - 0.05::DOUBLE THEN 1 ELSE 0 END)::BIGINT AS is_outlier
      FROM asg JOIN m USING (cluster) ORDER BY vec_id
    """.trim))

  // ---- train/val/test split ----------------------------------------------

  /** Deterministic 80/10/10 split by content-independent id hash — the
    * standard leak-proof dataset split (same doc always lands in the
    * same split, regardless of corpus size, partitioning, or insertion
    * order). Scan-side expression, zero shuffle.
    */
  val textSplitAssign = Q(
    "text_split_assign",
    (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("__b", graft.ext.Dedup.hash32(col("doc_id").cast("string")) % 100)
        .withColumn("split",
          when(col("__b") < 80, "train").when(col("__b") < 90, "val").otherwise("test"))
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, lang,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id, lang,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
            FROM documents)
      ORDER BY doc_id
    """.trim))

  // ---- label propagation -------------------------------------------------

  /** Semi-supervised label propagation over an IVF-list-scoped kNN
    * graph: 20% of vectors keep their true label as seeds, every other
    * vector takes the majority label among its top-3 within-list
    * neighbors, two synchronous rounds. The graph build is the
    * scale-safe propose stage (coarse lists whose size is bounded, so
    * candidate volume stays near-linear — the SemDeDup/dedup discipline
    * applied to auto-labeling); the propagation rounds join edge list
    * to label frame on one key.
    */
  val graphLabelProp = Q(
    "graph_label_prop",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.VectorExpressions.register(s)
      val emb = Tables(s, dir, "embeddings")
      // CORPUS-PROPORTIONAL centroid sample (one per 37 vectors, no
      // fixed cap — the dedup propose discipline): list sizes stay
      // bounded as the corpus grows, so the within-list pair volume
      // behind the kNN graph is near-linear in n, never n²/c. At the
      // graded SFs (≤ 5000 vectors) this is the identical centroid set
      // a < 5000 cap would give; at 10× it is what keeps the op linear.
      val cent = emb.filter(col("vec_id") % 37 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val assigned = graft.ext.Similarity.coarseAssignJoin(s, emb, cent,
          "vec_id", "embedding", "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("cluster"))
        .localCheckpoint()
      val a = assigned.select(col("vec_id").as("src"),
        col("embedding").as("__sv"), col("cluster"))
      val b = assigned.select(col("vec_id").as("dst"),
        col("embedding").as("__dv"), col("cluster"))
      val w = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst"))
      val pairs = a.hint("shuffle_hash").join(b, "cluster")
        .filter(col("src") =!= col("dst"))
        .withColumn("sim", round(expr("graft_cosine(__sv, __dv)"), 9))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("src"), col("dst"))
      val seeds = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("node"), col("label").cast("long").as("label"))
      val nodes = emb.select(col("vec_id").as("node"))
      graft.ext.GraphOps.labelPropagate(pairs, seeds, nodes, rounds = 2)
        .orderBy(col("node"))
    },
    Some {
      def voteRound(i: Int): String =
        s"""v$i AS (SELECT p.src, l.label AS nbr_label, count(*) AS votes
             FROM pairs p JOIN l${i - 1} l ON p.dst = l.node
             WHERE l.label IS NOT NULL GROUP BY p.src, l.label),
      b$i AS (SELECT src AS node, nbr_label AS prop_label FROM (
               SELECT src, nbr_label,
                      row_number() OVER (PARTITION BY src ORDER BY votes DESC, nbr_label) AS rn
               FROM v$i) WHERE rn = 1),
      l$i AS (SELECT n.node, coalesce(s.label, b.prop_label) AS label
             FROM nodes n LEFT JOIN seeds s ON n.node = s.node
             LEFT JOIN b$i b ON n.node = b.node)"""
      s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                    WHERE vec_id % 37 = 0),
      asg AS (SELECT vec_id, embedding, cid FROM (
                SELECT e.vec_id, e.embedding, t.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY ${Extensions.sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
                FROM embeddings e, cent t) WHERE rn = 1),
      cand AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                      ${Extensions.sqlCos("a.embedding", "b.embedding")} AS sim
               FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id),
      pairs AS (SELECT src, dst FROM (
                 SELECT src, dst,
                        row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rn
                 FROM cand) WHERE rn <= 3),
      seeds AS (SELECT vec_id AS node, label::BIGINT AS label FROM embeddings
                WHERE vec_id % 5 = 0),
      nodes AS (SELECT vec_id AS node FROM embeddings),
      l0 AS (SELECT n.node, s.label FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
      ${voteRound(1)},
      ${voteRound(2)}
      SELECT node, label FROM l2 ORDER BY node
    """.trim
    })

  // ---- SCD2 as-of (time travel) ------------------------------------------

  /** Point-in-time read over the SCD2 history frame (u5): the version
    * of every key valid at the probe instant — `valid_from <= t AND
    * (valid_to IS NULL OR valid_to > t)`, the standard time-travel
    * predicate. Reuses u5's build verbatim (Spark fn and oracle SQL
    * both), so the two queries can never drift; the filter is a
    * scan-side predicate over the history table, no extra shuffle.
    */
  val u9Scd2Asof = Q(
    "u9_scd2_asof",
    (s, dir) => {
      val t = lit("2000-06-01 00:00:00").cast("timestamp")
      AuditMerge.u05.fn(s, dir)
        .filter(col("valid_from") <= t &&
          (col("valid_to").isNull || col("valid_to") > t))
        .orderBy(col("o_orderkey"), col("valid_from"))
    },
    Some(s"""
      SELECT * FROM (
        ${AuditMerge.u05.oracle.get}
      ) WHERE valid_from <= TIMESTAMP '2000-06-01 00:00:00'
          AND (valid_to IS NULL OR valid_to > TIMESTAMP '2000-06-01 00:00:00')
      ORDER BY o_orderkey, valid_from
    """.trim))

  // ---- triangle counting -------------------------------------------------

  /** Shared edge CTE: the customer-nation → supplier-nation trade graph
    * (same derivation as q54_pagerank).
    */
  private val TradeEdgesCte =
    """edges AS (SELECT DISTINCT c_nationkey::BIGINT AS src, s_nationkey::BIGINT AS dst
                 FROM customer JOIN orders ON c_custkey = o_custkey
                 JOIN lineitem ON l_orderkey = o_orderkey
                 JOIN supplier ON l_suppkey = s_suppkey)"""

  /** Per-node triangle participation on the trade graph, via the
    * degree-ordered orientation (each triangle enumerated once at its
    * (deg, id)-minimum corner — the skew-safe O(m^1.5) wedge bound).
    */
  val graphTriangles = Q(
    "graph_triangles",
    (s, dir) => {
      val edges = Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").cast("long").as("src"),
          col("s_nationkey").cast("long").as("dst"))
        .distinct()
        .localCheckpoint()
      graft.ext.GraphOps.triangleCounts(edges).orderBy(col("node"))
    },
    Some(s"""
      WITH $TradeEdgesCte,
      und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM edges WHERE src <> dst),
      deg AS (SELECT node, count(*) AS deg FROM
                (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
              GROUP BY node),
      o AS (SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS x,
                   CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS y
            FROM und e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
      w AS (SELECT a.x, a.y, b.y AS z FROM o a JOIN o b USING (x) WHERE a.y < b.y),
      tri AS (SELECT w.x, w.y, w.z FROM w
              JOIN o ON (o.x = w.y AND o.y = w.z) OR (o.x = w.z AND o.y = w.y))
      SELECT node, count(*) AS n_triangles FROM
        (SELECT unnest([x, y, z]) AS node FROM tri)
      GROUP BY node ORDER BY node
    """.trim))

  // ---- k-core ------------------------------------------------------------

  /** 40-core of the bipartite customer–supplier purchase graph
    * (supplier ids offset so the spaces are disjoint): three peels of
    * degree-<k removal, reporting the surviving nodes' degrees. The
    * Spark side stops early at the fixpoint; the oracle always unrolls
    * three peels — identical by construction, since a converged peel
    * removes nothing.
    */
  val graphKcore = Q(
    "graph_kcore",
    (s, dir) => {
      val edges = Tables(s, dir, "orders")
        .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey") + 100000L).cast("long").as("dst"))
        .distinct()
        .localCheckpoint()
      graft.ext.GraphOps.kCore(edges, k = 40, maxPeels = 3)
        .orderBy(col("node"))
    },
    Some {
      def peel(i: Int): String =
        s"""d$i AS (SELECT node, count(*) AS deg FROM
                 (SELECT u AS node FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1})
               GROUP BY node),
      k$i AS (SELECT node FROM d$i WHERE deg >= 40),
      e$i AS (SELECT u, v FROM e${i - 1}
             WHERE u IN (SELECT node FROM k$i) AND v IN (SELECT node FROM k$i))"""
      s"""
      WITH e0 AS (SELECT DISTINCT o_custkey::BIGINT AS u,
                         (l_suppkey + 100000)::BIGINT AS v
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      ${peel(1)},
      ${peel(2)},
      ${peel(3)}
      SELECT node, count(*) AS deg FROM
        (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
      GROUP BY node ORDER BY node
    """.trim
    })

  // ---- media frame energy ------------------------------------------------

  /** Windowed byte-stream energy over the media column (64-byte
    * non-overlapping windows): sample count, integer sum-of-squares,
    * and 9 dp RMS per window — the audio silence/VAD primitive on the
    * opaque-bytes plumbing, scan-side like media_frames.
    */
  val mediaFrameEnergy = Q(
    "media_frame_energy",
    (s, dir) =>
      graft.ext.Multimodal.frameEnergy(Tables(s, dir, "documents"), "doc_id", "text")
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
            FROM c)
      SELECT doc_id, frame_no, n_samples, energy,
             round(sqrt(energy::DOUBLE / n_samples), 9) AS rms
      FROM e ORDER BY doc_id, frame_no
    """.trim))

  // ---- hard-negative mining ----------------------------------------------

  /** Contrastive hard negatives: per anchor, the 3 most-similar vectors
    * with a DIFFERENT label, mined inside the IVF probe join (the
    * filtered search's predicate inverted — never a post-top-k refilter,
    * which would over-fetch and refill on label-pure neighborhoods).
    */
  val annHardNegatives = Q(
    "ann_hard_negatives",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      graft.ext.Similarity.ivfHardNegatives(s, emb,
          emb.filter(col("vec_id") % 100 === 0),
          emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000),
          "vec_id", "embedding", "label", "vec_id", "embedding", k = 3, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                    WHERE vec_id % 37 = 0 AND vec_id < 5000),
      corp_a AS (
        SELECT vec_id, embedding, label, cid FROM (
          SELECT e.vec_id, e.embedding, e.label, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${Extensions.sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t)
        WHERE rn = 1),
      q_a AS (
        SELECT vec_id, embedding, label, cid FROM (
          SELECT e.vec_id, e.embedding, e.label, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${Extensions.sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t WHERE e.vec_id % 100 = 0)
        WHERE rn <= 2),
      p AS (SELECT q.vec_id AS query_id, q.label, c.vec_id AS neighbor_id,
                   ${Extensions.sqlCos("q.embedding", "c.embedding")} AS sim
            FROM q_a q JOIN corp_a c
              ON q.cid = c.cid AND q.label <> c.label AND q.vec_id <> c.vec_id)
      SELECT query_id, label, neighbor_id, rank, sim FROM (
        SELECT query_id, label, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 3
      ORDER BY query_id, rank
    """.trim))

  // ---- temporal SCD2 dimension join --------------------------------------

  /** Point-in-time dimension join: every order joins the SCD2 status
    * version valid AT ITS OWN order date (`valid_from <= t < valid_to`,
    * null-open tail) — the lakehouse temporal join, built on the same
    * u5 history frame. Plan: equi join on the key carries the work; the
    * interval predicate is a post-join filter on the (at most 2)
    * version rows per key, so cost is the one key-partitioned shuffle
    * regardless of history depth per key.
    */
  val u10Scd2TemporalJoin = Q(
    "u10_scd2_temporal_join",
    (s, dir) => {
      val hist = AuditMerge.u05.fn(s, dir)
        .select(col("o_orderkey").as("hk"), col("o_orderstatus").as("status_at_order"),
          col("valid_from"), col("valid_to"))
      val facts = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").as("__t"))
      facts.join(hist, col("o_orderkey") === col("hk") &&
          col("valid_from") <= col("__t") &&
          (col("valid_to").isNull || col("valid_to") > col("__t")))
        .select(col("o_orderkey"), col("__t").cast("date").as("o_orderdate"),
          col("status_at_order"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""
      SELECT o.o_orderkey, o.o_orderdate::DATE AS o_orderdate,
             h.o_orderstatus AS status_at_order
      FROM orders o JOIN (
        ${AuditMerge.u05.oracle.get}
      ) h ON o.o_orderkey = h.o_orderkey
         AND h.valid_from <= o.o_orderdate::TIMESTAMP
         AND (h.valid_to IS NULL OR h.valid_to > o.o_orderdate::TIMESTAMP)
      ORDER BY o.o_orderkey
    """.trim))

  // ---- MAD anomaly detection (dq5) ---------------------------------------

  /** Robust time-series anomaly detection on the daily-revenue series:
    * a day is anomalous when its revenue sits more than 3 scaled MADs
    * (median absolute deviation × 1.4826, the normal-consistency
    * constant) from the median — the robust z-score every pipeline
    * health monitor runs, immune to the very outliers it hunts (unlike
    * dq4's mean/stddev drift check). Revenue aggregates as exact
    * DECIMAL money; median/MAD are exact interpolated percentiles over
    * identical inputs in both engines, broadcast back as 1-row scalars.
    */
  val dq5MadAnomalies = Q(
    "dq5_mad_anomaly_days",
    (s, dir) => {
      val daily = Tables(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(Q.moneySum(col("o_totalprice")).as("rev"))
      val stats = daily.agg(
        expr("percentile(rev, 0.5)").as("med"))
      val withDev = daily.crossJoin(broadcast(stats))
        .withColumn("adev", abs(col("rev") - col("med")))
      val mad = withDev.agg(expr("percentile(adev, 0.5)").as("mad"))
      withDev.crossJoin(broadcast(mad))
        .filter(col("adev") > lit(3.0) * (col("mad") * lit(1.4826)))
        .select(col("d"), col("rev"), col("med"),
          round(col("adev") / (col("mad") * lit(1.4826)), 9).as("robust_z"))
        .orderBy(col("d"))
    },
    Some("""
      WITH daily AS (SELECT o_orderdate::DATE AS d,
                            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
                     FROM orders GROUP BY 1),
      st AS (SELECT quantile_cont(rev, 0.5) AS med FROM daily),
      dev AS (SELECT d, rev, med, abs(rev - med) AS adev FROM daily CROSS JOIN st),
      m AS (SELECT quantile_cont(adev, 0.5) AS mad FROM dev)
      SELECT d, rev, med, round(adev / (mad * 1.4826::DOUBLE), 9) AS robust_z
      FROM dev CROSS JOIN m
      WHERE adev > 3.0::DOUBLE * (mad * 1.4826::DOUBLE)
      ORDER BY d
    """.trim))

  // ---- bigram LM ---------------------------------------------------------

  /** Bigram-LM fluency score per document (order-sensitive — the
    * upgrade over text_lm_score's unigram model). Same transcendental
    * contract: 9 dp −ln per bigram, exact decimal per-doc fold.
    */
  val textBigramLm = Q(
    "text_bigram_lm",
    (s, dir) =>
      graft.ext.TextOps.bigramLmScore(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some(s"""
      WITH norm AS (SELECT doc_id, ${Extensions.NormW} AS w FROM documents),
      pairs AS (SELECT doc_id, p['a'] AS w1, p['b'] AS w2 FROM (
                  SELECT doc_id, unnest(list_transform(range(len(w) - 1),
                    i -> {'a': w[i+1], 'b': w[i+2]})) AS p
                  FROM norm WHERE len(w) >= 2)),
      bc AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
      pc AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
      vv AS (SELECT count(DISTINCT t) AS v FROM
               (SELECT unnest(w) AS t FROM norm)),
      sc AS (SELECT pairs.doc_id,
               round(-ln((c2 + 1)::DOUBLE / (c1 + v)::DOUBLE), 9) AS nll
             FROM pairs JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN vv)
      SELECT doc_id, count(*) AS n_bigrams,
             CAST(sum(CAST(nll AS DECIMAL(27,9))) AS DOUBLE) / count(*) AS bigram_nll
      FROM sc GROUP BY doc_id ORDER BY doc_id
    """.trim))

  // ---- winsorization -----------------------------------------------------

  /** Winsorized feature prep: clamp order totals to the exact
    * interpolated [p01, p99] band — the standard outlier-robust
    * normalization before statistics or model features. The two
    * percentiles come from [[graft.etl.StatOps.percentiles]]'
    * distributed prefix-sum order statistics (NOT the builtin
    * `percentile`, whose value→count buffer merges O(n) state onto one
    * task over a near-distinct price column); they broadcast back as a
    * 1-row frame and the clamp is a scan-side projection, so the op
    * costs histogram + tiny-frame prefix sums + one scan at any scale.
    * Flags count the clipped tails for auditability.
    */
  val q55Winsorize = Q(
    "q55_winsorize",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val pct = graft.etl.StatOps.percentiles(o, Nil, "o_totalprice",
        Seq("p01" -> 0.01, "p99" -> 0.99))
      o.crossJoin(broadcast(pct))
        .select(col("o_orderkey"),
          round(greatest(col("p01"), least(col("p99"), col("o_totalprice"))), 9)
            .as("price_winsor"),
          when(col("o_totalprice") < col("p01"), 1L)
            .when(col("o_totalprice") > col("p99"), 2L)
            .otherwise(0L).as("clip_flag"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH pct AS (SELECT quantile_cont(o_totalprice, 0.01) AS p01,
                          quantile_cont(o_totalprice, 0.99) AS p99
                   FROM orders)
      SELECT o_orderkey,
             round(greatest(p01, least(p99, o_totalprice)), 9) AS price_winsor,
             (CASE WHEN o_totalprice < p01 THEN 1
                   WHEN o_totalprice > p99 THEN 2 ELSE 0 END)::BIGINT AS clip_flag
      FROM orders CROSS JOIN pct
      ORDER BY o_orderkey
    """.trim))

  // ---- quantile transform ------------------------------------------------

  /** Rank-based quantile transform per group — the uniform-izing
    * feature prep (sklearn's QuantileTransformer shape): percent_rank
    * maps each price to [0,1] within its return-flag group, ntile
    * buckets it into deciles, ties in the price broken on the UNIQUE
    * (orderkey, linenumber) key so both are deterministic.
    *
    * NOT computed as a window partitioned by the 3-value return flag —
    * that plan sorts the whole fact table into 3 reducer tasks (the
    * classic low-NDV window scale-killer; n/3 rows through one task at
    * 100 TB). Instead the group-global rank decomposes into
    * `__start(flag, price)` — each value's rank interval from
    * [[graft.etl.StatOps.groupedCdf]]'s distributed prefix sum — plus a
    * within-value row_number whose (flag, price) partition key is
    * near-unique, so every stage is parallel in n. percent_rank
    * ≡ rank0/(n−1) and the ntile bucket comes closed-form from rank0
    * and n (first n%10 buckets hold ⌈n/10⌉ rows), matching the window
    * semantics exactly — Round9Spec pins the equivalence against the
    * real window functions.
    */
  val q56QuantileTransform = Q(
    "q56_quantile_transform",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice"))
      val cdf = graft.etl.StatOps.groupedCdf(li, Seq("l_returnflag"), "l_extendedprice")
        .select(col("l_returnflag").as("__g"), col("__v"), col("__start"), col("__n"))
      val wv = Window.partitionBy(col("l_returnflag"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      li.join(cdf, col("l_returnflag") === col("__g") &&
          col("l_extendedprice").cast("double") === col("__v"))
        .withColumn("__rank0", col("__start") + row_number().over(wv) - 1)
        .withColumn("__bs", expr("__n div 10"))       // base bucket size
        .withColumn("__rem", col("__n") % 10)          // first __rem buckets get +1
        .withColumn("__thr", col("__rem") * (col("__bs") + 1))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round(col("__rank0").cast("double") / (col("__n") - 1).cast("double"), 9)
            .as("pct_rank"),
          when(col("__rank0") < col("__thr"),
              expr("__rank0 div (__bs + 1)") + 1)
            .otherwise(col("__rem") + expr("(__rank0 - __thr) div __bs") + 1)
            .cast("long").as("decile"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_returnflag,
             round(percent_rank() OVER w, 9) AS pct_rank,
             (ntile(10) OVER w)::BIGINT AS decile
      FROM lineitem
      WINDOW w AS (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber)
      ORDER BY l_orderkey, l_linenumber
    """.trim))

  // ---- incremental index maintenance -------------------------------------

  /** The fixed delta for the index-merge query: docs 0–49 re-crawled
    * with changed text (same ids — the upsert path), docs 50–99
    * re-collected under fresh +100000 ids (the append path).
    */
  private def bm25Delta(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables(s, dir, "documents")
    docs.filter(col("doc_id") < 50)
      .select(col("doc_id"), concat(lit("xx "), col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(lit("xx "), col("text")).as("text")))
  }

  /** Incremental BM25 index maintenance: merge the delta corpus's
    * postings into the PERSISTED inverted index
    * ([[graft.ext.TextOps.mergeInvertedIndex]] — broadcast-anti upsert
    * on (term, doc_id), stats by exact counter deltas) and serve the
    * standard query from the merged index. Only the delta is ever
    * tokenized; the stored corpus contributes postings from parquet.
    * The oracle rebuilds from the union corpus — merged-then-served
    * must equal rebuilt-then-served, which pins both the merge
    * semantics and the counter math (Round9Spec additionally pins the
    * full merged postings/stats frames, not just the top-k).
    */
  val textIndexMerge = Q(
    "text_index_merge",
    (s, dir) => {
      val (postsDir, statsDir) = ensureTextIndex(s, dir)
      val (mergedPosts, mergedStats) = graft.ext.TextOps.mergeInvertedIndex(
        s.read.parquet(postsDir), s.read.parquet(statsDir),
        bm25Delta(s, dir), "doc_id", "text")
      graft.ext.TextOps.bm25RankFromPostings(
          mergedPosts.filter(col("term").isInCollection(Bm25Terms)),
          mergedStats, "doc_id", k = 25)
        .orderBy(col("rank"))
    },
    Some(bm25Sql(Bm25Terms, 25, source = "corpus", pre = """corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 50
        UNION ALL
        SELECT doc_id, 'xx ' || text FROM documents WHERE doc_id < 50
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, 'xx ' || text FROM documents
        WHERE doc_id >= 50 AND doc_id < 100),
      """)))

  // ---- batch BM25 --------------------------------------------------------

  /** The fixed query batch for the multi-query run: three queries of
    * two-to-three terms each.
    */
  private[queries] val MultiQueries: Seq[(Long, String)] = Seq(
    1L -> "vector", 1L -> "stream",
    2L -> "filter", 2L -> "hash",
    3L -> "customer", 3L -> "window", 3L -> "spark")

  /** Batch retrieval: a whole query table scores against the persisted
    * postings in ONE pass — the broadcast query vocabulary probes the
    * term-keyed postings, df comes from the same probe, ranking windows
    * per query. q queries cost one postings shuffle, not q searches.
    */
  val textBm25Multi = Q(
    "text_bm25_multi",
    (s, dir) => {
      import s.implicits._
      val (postsDir, statsDir) = ensureTextIndex(s, dir)
      val qt = MultiQueries.toDF("query_id", "term")
      graft.ext.TextOps.bm25MultiRank(
          s.read.parquet(postsDir), s.read.parquet(statsDir), qt, "doc_id", k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      val values = MultiQueries.map { case (q, t) => s"($q::BIGINT, '$t')" }.mkString(", ")
      s"""
      WITH norm AS (SELECT doc_id, ${Extensions.NormW} AS w FROM documents),
      t AS (SELECT doc_id, unnest(w) AS term FROM norm),
      dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
      stats AS (SELECT count(*) AS n_docs, sum(dl)::BIGINT AS sum_dl FROM dl),
      qt(query_id, term) AS (SELECT * FROM (VALUES $values)),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t
             WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term),
      dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
      sc AS (SELECT qt.query_id, tf.doc_id,
               round(ln(1.0::DOUBLE + (n_docs - df_docs + 0.5::DOUBLE) / (df_docs + 0.5::DOUBLE)) *
                     ((tf * 2.2::DOUBLE) /
                      (tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE *
                        (dl::DOUBLE / (sum_dl::DOUBLE / n_docs::DOUBLE))))), 9) AS score_t
             FROM tf JOIN qt USING (term) JOIN dfq USING (term)
             JOIN dl USING (doc_id) CROSS JOIN stats),
      agg AS (SELECT query_id, doc_id,
                     CAST(sum(CAST(score_t AS DECIMAL(27,9))) AS DOUBLE) AS score
              FROM sc GROUP BY query_id, doc_id),
      r AS (SELECT query_id, doc_id, score,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rn
            FROM agg)
      SELECT query_id, rn AS rank, doc_id, score FROM r WHERE rn <= 5
      ORDER BY query_id, rank
    """.trim
    })

  def all: Seq[Q] = Seq(q53SessionStats, textBm25, textIndexServe, q54PageRank,
    annRandomProjection, annCentroidOutliers, textSplitAssign, graphLabelProp,
    u9Scd2Asof, graphTriangles, graphKcore, mediaFrameEnergy, annHardNegatives,
    u10Scd2TemporalJoin, dq5MadAnomalies, textBm25Multi, q55Winsorize,
    textBigramLm, q56QuantileTransform, textIndexMerge)
}
