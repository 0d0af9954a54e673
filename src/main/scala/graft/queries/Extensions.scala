package graft.queries

import graft.etl.Tables
import graft.ext.{Dedup, Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-star extension surface (SURVEY.md §7.5): dedup, similarity
  * search, text analysis, multimodal plumbing — on the `documents` /
  * `embeddings` tables.
  *
  * The dedup queries run over an augmented corpus (each doc unioned with
  * a copy at doc_id+100000 — identical for exact dedup, one-word-prepended
  * for near-dup) so recall of true duplicates is actually exercised.
  * Oracle SQL is generated from the same seed constants as the Spark
  * implementation.
  */
object Extensions {

  private[queries] def augmentedDocs(s: SparkSession, dir: String, perturb: Boolean): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
    val copies = d
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", if (perturb) concat(lit("xx "), col("text")) else col("text"))
    d.unionByName(copies)
  }

  private[queries] def augCte(perturb: Boolean): String = {
    val t = if (perturb) "'xx ' || text" else "text"
    s"""aug AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 100000, $t, lang FROM documents)"""
  }

  /** DuckDB mirror of Dedup.normText + word split. */
  private[queries] val NormW = raw"string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')"

  val dedupExact = Q(
    "dedup_exact",
    (s, dir) =>
      Dedup.exact(augmentedDocs(s, dir, perturb = false), "text", "doc_id")
        .orderBy(col("content_hash")),
    Some(s"""
      WITH ${augCte(perturb = false)}
      SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_hash,
             min(doc_id) AS keep_id, count(*) AS n_copies
      FROM aug GROUP BY 1 ORDER BY content_hash
    """.trim))

  /** DuckDB CTE chain reproducing Dedup.minhashCandidatePairs over the
    * perturbed augmented corpus; ends with a `pairs` CTE (doc_a < doc_b,
    * distinct). Shared by the pair query and the cluster query.
    */
  /** The minhash chain (norm → shingles → hashes → signature → bands →
    * `pairs`) over an arbitrary source CTE exposing (doc_id, text) —
    * lets composite oracles (the dedup cascade) run the SAME chain
    * over a filtered survivor set.
    */
  private[queries] def minhashChainFrom(src: String): String = {
    val sigs = Dedup.SeedsA.zip(Dedup.SeedsB).map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % ${Dedup.HashPrime}))"
    }.mkString(",\n               ")
    val bands = (0 until 4).map { j =>
      s"'$j:' || sig[${2 * j + 1}]::VARCHAR || '_' || sig[${2 * j + 2}]::VARCHAR"
    }.mkString(",\n               ")
    s"""norm AS (SELECT doc_id, $NormW AS w FROM $src),
      sh AS (SELECT doc_id, w FROM norm WHERE len(w) >= 3),
      hs AS (SELECT doc_id,
               list_transform(range(len(w) - 2),
                 i -> ('0x' || substr(md5(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]), 1, 8))::BIGINT) AS hs
             FROM sh),
      sig AS (SELECT doc_id, [$sigs] AS sig FROM hs),
      bands AS (SELECT doc_id, unnest([$bands]) AS band FROM sig),
      pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)"""
  }

  private[queries] def minhashPairsCtes: String =
    s"""${augCte(perturb = true)},
      ${minhashChainFrom("aug")}"""

  val dedupMinhash = Q(
    "dedup_minhash_pairs",
    (s, dir) =>
      Dedup.minhashCandidatePairs(augmentedDocs(s, dir, perturb = true), "doc_id", "text")
        .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH $minhashPairsCtes
      SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
    """.trim))

  /** The batch frame of the STREAMING near-dedup operator: per band
    * bucket, the star of the minimum doc id — what
    * `StreamingOps.streamingNearDedup` emits when docs arrive in id
    * order (CatalogStreamingSpec proves the equality event-by-event).
    * Oracling this frame pins the streaming operator's propose
    * semantics to DuckDB, closing the last streaming op without a
    * driver-checked batch twin.
    */
  val dedupStreamPairs = Q(
    "dedup_stream_pairs",
    (s, dir) =>
      Dedup.bandStarPairs(augmentedDocs(s, dir, perturb = true), "doc_id", "text")
        .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH $minhashPairsCtes,
      mn AS (SELECT band, min(doc_id) AS mn FROM bands GROUP BY band)
      SELECT DISTINCT m.mn AS doc_a, b.doc_id AS doc_b
      FROM bands b JOIN mn m USING (band)
      WHERE b.doc_id <> m.mn
      ORDER BY doc_a, doc_b
    """.trim))

  /** LSH-propose → edit-distance-verify: the production near-dup
    * pipeline's second stage, run only on candidate pairs (never n²).
    * Distance over a 64-char normalized prefix (bounded per-pair cost).
    */
  val dedupFuzzy = Q(
    "dedup_fuzzy_verify",
    (s, dir) =>
      Dedup.fuzzyVerifiedPairs(augmentedDocs(s, dir, perturb = true),
          "doc_id", "text", maxDist = 10)
        .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH $minhashPairsCtes,
      np AS (SELECT doc_id,
               substring(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), 1, 64) AS p
             FROM aug)
      SELECT doc_a, doc_b, levenshtein(a.p, b.p)::BIGINT AS edit_dist
      FROM pairs JOIN np a ON a.doc_id = doc_a JOIN np b ON b.doc_id = doc_b
      WHERE levenshtein(a.p, b.p) <= 10
      ORDER BY doc_a, doc_b
    """.trim))

  /** Near-dup cluster assignment: connected components over the minhash
    * candidate graph (hash-min propagation in Spark; transitive-closure
    * reachability in the DuckDB oracle). Every doc gets the min doc_id
    * of its component; isolated docs label themselves. The propose
    * serves from the ingest-staged band index (pair-for-pair equal to
    * re-shingling — band keys are per-doc; [[graft.ext.Dedup
    * .indexCandidatePairs]]), so the query prices the CC algorithm,
    * not a corpus re-shingle; `dedup_minhash_pairs` prices the live
    * propose.
    */
  val dedupClusters = Q(
    "dedup_clusters",
    (s, dir) => {
      val docs = augmentedDocs(s, dir, perturb = true)
      val pairs = Dedup.indexCandidatePairs(
        s.read.parquet(Breadth20.ensureAugBandIndex(s, dir)), "doc_id")
      Dedup.clusterAssignment(docs, pairs, "doc_id").orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE $minhashPairsCtes,
      edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(s, d) AS (SELECT s, d FROM edges
                      UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
      comp AS (SELECT s AS doc_id, min(d) AS mn FROM reach GROUP BY s)
      SELECT a.doc_id, coalesce(least(c.mn, a.doc_id), a.doc_id) AS cluster_id
      FROM aug a LEFT JOIN comp c USING (doc_id)
      ORDER BY doc_id
    """.trim))

  /** Same clustering task as dedup_clusters, via the alternating
    * large-star/small-star contraction — the O(log n)-round algorithm a
    * long-diameter candidate graph needs at 100 TB. Served from the
    * ingest-staged cluster assignment (`ensureAugClusters`, which runs
    * [[graft.ext.Dedup.clusterAssignmentStar]] over the staged band
    * index once per corpus — the ingest dedup pass's output table), the
    * way dedup_canonical_quality reads it (VERDICT r15 item 5): the
    * star algorithm is priced at ingest where a production pipeline
    * runs it; `dedup_clusters` keeps pricing a live CC per query. Same
    * recursive-CTE oracle: the staged assignment must equal the live
    * component assignment doc-for-doc.
    */
  val dedupClustersStar = Q(
    "dedup_clusters_star",
    (s, dir) =>
      s.read.parquet(Breadth20.ensureAugClusters(s, dir))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE $minhashPairsCtes,
      edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(s, d) AS (SELECT s, d FROM edges
                      UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
      comp AS (SELECT s AS doc_id, min(d) AS mn FROM reach GROUP BY s)
      SELECT a.doc_id, coalesce(least(c.mn, a.doc_id), a.doc_id) AS cluster_id
      FROM aug a LEFT JOIN comp c USING (doc_id)
      ORDER BY doc_id
    """.trim))

  val dedupSimhash = Q(
    "dedup_simhash",
    (s, dir) =>
      Dedup.simhash32(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some(s"""
      WITH norm AS (SELECT doc_id, $NormW AS w FROM documents),
      hs AS (SELECT doc_id, list_transform(w, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
             FROM norm WHERE len(w) >= 1)
      SELECT doc_id,
             CAST(list_sum(list_transform(range(32), b ->
               CASE WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
                    THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
      FROM hs ORDER BY doc_id
    """.trim))

  /** SimHash pigeonhole pairs: hamming ≤ 3 dupes must share one of 4
    * fingerprint bytes → equi join on (band, byte), exact bit_count(xor)
    * verify. The classic crawl-dedup scheme over the perturbed corpus.
    */
  val dedupSimhashPairs = Q(
    "dedup_simhash_pairs",
    (s, dir) =>
      // served from the ingest-staged fingerprint table (r17): banding
      // + exact hamming verify stay live; the oracle replays the full
      // simhash chain from raw text and Round17Spec pins
      // fromFingerprints == live
      Dedup.simhashPairsFromFingerprints(
          s.read.parquet(Breadth20.ensureAugSimhash(s, dir)),
          "doc_id", maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH ${augCte(perturb = true)},
      norm AS (SELECT doc_id, $NormW AS w FROM aug),
      hs AS (SELECT doc_id, list_transform(w, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
             FROM norm WHERE len(w) >= 1),
      sim AS (SELECT doc_id,
                CAST(list_sum(list_transform(range(32), b ->
                  CASE WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) > len(hs)
                       THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
              FROM hs),
      bands AS (SELECT doc_id, simhash, unnest(range(4)) AS b FROM sim),
      pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.simhash AS sa, b.simhash AS sb
                FROM bands a JOIN bands b
                  ON a.b = b.b
                 AND ((a.simhash >> (a.b * 8)) & 255) = ((b.simhash >> (b.b * 8)) & 255)
                 AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, bit_count(xor(sa, sb))::BIGINT AS hamming
      FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
      ORDER BY doc_a, doc_b
    """.trim))

  /** Exact within-bucket pairwise Jaccard over a deterministic
    * md5-systematic doc sample (q22 discipline, rate 1/2). The exact
    * quadratic-in-bucket op exists as a truth/eval tool, and a metadata
    * bucket like `lang` is unbounded under corpus skew (~half a web
    * corpus is one language), so at 100 TB this op is only admissible
    * riding a bounded sample — production-path near-dup pairs come from
    * [[Dedup.ngramJaccardPairsLsh]] (`dedup_jaccard_lsh`), whose bucket
    * size is set by the signature parameters, not the corpus. ScaleSpec
    * lints this registry-wide: a low-NDV-bucket pair self-join must sit
    * above a systematic sample filter or a band bucket.
    */
  val dedupJaccard = Q(
    "dedup_ngram_jaccard",
    (s, dir) =>
      Dedup.ngramJaccardPairs(
          augmentedDocs(s, dir, perturb = true)
            .filter(Dedup.hash32(col("doc_id").cast("string")) % 2 === 0),
          "doc_id", "text", "lang", threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH ${augCte(perturb = true)},
      norm AS (SELECT doc_id, lang, $NormW AS w FROM aug
               WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 2 = 0),
      sh AS (SELECT doc_id, lang,
               list_distinct(list_transform(range(len(w) - 2),
                 i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
             FROM norm WHERE len(w) >= 3),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              len(list_filter(a.s, x -> list_contains(b.s, x))) AS inter,
              len(a.s) + len(b.s) AS tot
            FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, inter::DOUBLE / (tot - inter) AS jaccard
      FROM p WHERE inter::DOUBLE / (tot - inter) >= 0.5
      ORDER BY doc_a, doc_b
    """.trim))

  /** The 100 TB Jaccard bucketing: candidates from the MinHash band
    * join (bucket size set by the signature, not by corpus skew — a
    * `lang` bucket is half the corpus for English), verified with exact
    * distinct-shingle Jaccard. The oracle replays the identical band
    * candidate set via set math, so candidates ∩ threshold must match
    * pair-for-pair.
    */
  val dedupJaccardLsh = Q(
    "dedup_jaccard_lsh",
    (s, dir) =>
      Dedup.ngramJaccardPairsLsh(augmentedDocs(s, dir, perturb = true),
          "doc_id", "text", threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH $minhashPairsCtes,
      ss AS (SELECT doc_id,
               list_distinct(list_transform(range(len(w) - 2),
                 i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
             FROM sh),
      p AS (SELECT doc_a, doc_b,
              len(list_filter(a.s, x -> list_contains(b.s, x))) AS inter,
              len(a.s) + len(b.s) AS tot
            FROM pairs JOIN ss a ON a.doc_id = doc_a JOIN ss b ON b.doc_id = doc_b)
      SELECT doc_a, doc_b, inter::DOUBLE / (tot - inter) AS jaccard
      FROM p WHERE inter::DOUBLE / (tot - inter) >= 0.5
      ORDER BY doc_a, doc_b
    """.trim))

  /** Build-if-absent the persisted near-dup fingerprint index over the
    * HISTORICAL corpus (the plain documents table). Like the ANN
    * indexes, this is a once-per-corpus ingest artifact, warmed by
    * Bench's ingest phase so the serving query is billed only its probe.
    */
  def ensureDedupIndex(s: SparkSession, dir: String): String =
    graft.etl.LayoutOps.ensureRunDir(s, dir, "dedup_band_index") { d =>
      Dedup.buildBandIndex(Tables(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text").write.parquet(d)
    }

  /** Incremental (re-crawl) near-dedup: the historical corpus was
    * fingerprinted ONCE into a persisted band index; a new shard — here
    * the perturbed +100000 copies, i.e. a crawl that re-collected every
    * historical doc with one word prepended — is probed against the
    * stored index. The shard is the only text that gets shingled; the
    * index contributes band keys and verify sets from parquet. At
    * 100 TB this is the difference between re-shingling the corpus per
    * ingest and touching only the new few TB. The oracle replays the
    * full batch LSH pipeline and keeps the cross-shard pairs — so
    * incremental must equal batch-restricted, pair for pair, with exact
    * distinct-hash Jaccard ≥ 0.5 verification on both sides.
    */
  val dedupIndexProbe = Q(
    "dedup_index_probe",
    (s, dir) => {
      val idxDir = ensureDedupIndex(s, dir)
      val shard = Tables(s, dir, "documents")
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(lit("xx "), col("text")).as("text"))
      Dedup.probeBandIndex(s.read.parquet(idxDir), shard, "doc_id", "text",
          threshold = 0.5)
        .orderBy(col("doc_id"), col("dup_of"))
    },
    Some(s"""
      WITH $minhashPairsCtes,
      dh AS (SELECT doc_id, list_distinct(hs) AS ds FROM hs),
      cp AS (SELECT doc_a AS dup_of, doc_b AS doc_id FROM pairs
             WHERE doc_a < 100000 AND doc_b >= 100000),
      v AS (SELECT cp.doc_id, cp.dup_of,
              len(list_filter(a.ds, x -> list_contains(b.ds, x))) AS inter,
              len(a.ds) + len(b.ds) AS tot
            FROM cp JOIN dh a ON a.doc_id = cp.dup_of
                    JOIN dh b ON b.doc_id = cp.doc_id)
      SELECT doc_id, dup_of, inter::DOUBLE / (tot - inter) AS jaccard
      FROM v WHERE inter::DOUBLE / (tot - inter) >= 0.5
      ORDER BY doc_id, dup_of
    """.trim))

  /** Build-if-absent the persisted HISTORICAL cluster assignment: batch
    * near-dup pairs computed from the stored fingerprint index (no text
    * access) clustered by the O(log n) star algorithm, written once at
    * ingest like the index itself.
    */
  def ensureDedupClusters(s: SparkSession, dir: String): String = {
    val idxDir = ensureDedupIndex(s, dir)
    graft.etl.LayoutOps.ensureRunDir(s, dir, "dedup_clusters_hist") { d =>
      val idx = s.read.parquet(idxDir)
      val pairs = Dedup.indexSelfPairs(idx, "doc_id", threshold = 0.5)
      Dedup.clusterAssignmentStar(
        Tables(s, dir, "documents").select(col("doc_id")), pairs, "doc_id")
        .write.parquet(d)
    }
  }

  /** Incremental cluster maintenance: the historical corpus carries a
    * persisted cluster assignment (built once from the fingerprint
    * index); a new shard's verified probe pairs attach each new doc to
    * the MIN cluster among its historical matches, unmatched docs open
    * singleton clusters. The whole query touches shard text once plus
    * two stored artifacts — the 100 TB corpus is neither re-shingled nor
    * re-clustered on ingest. The oracle recomputes historical clusters
    * as a transitive closure over hash-verified in-history pairs, then
    * replays the attach join, so both the persisted assignment and the
    * attach semantics are pinned.
    */
  val dedupIndexAttach = Q(
    "dedup_index_attach",
    (s, dir) => {
      val idxDir = ensureDedupIndex(s, dir)
      val clusDir = ensureDedupClusters(s, dir)
      val shard = Tables(s, dir, "documents")
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(lit("xx "), col("text")).as("text"))
      val pairs = Dedup.probeBandIndex(s.read.parquet(idxDir), shard,
        "doc_id", "text", threshold = 0.5)
      Dedup.attachToClusters(shard, pairs, s.read.parquet(clusDir), "doc_id")
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE $minhashPairsCtes,
      dh AS (SELECT doc_id, list_distinct(hs) AS ds FROM hs),
      jac AS (SELECT doc_a, doc_b,
                len(list_filter(a.ds, x -> list_contains(b.ds, x)))::DOUBLE /
                (len(a.ds) + len(b.ds)
                 - len(list_filter(a.ds, x -> list_contains(b.ds, x)))) AS j
              FROM pairs JOIN dh a ON a.doc_id = doc_a
                         JOIN dh b ON b.doc_id = doc_b),
      hv AS (SELECT doc_a, doc_b FROM jac
             WHERE doc_a < 100000 AND doc_b < 100000 AND j >= 0.5),
      edges AS (SELECT doc_a AS es, doc_b AS ed FROM hv
                UNION SELECT doc_b, doc_a FROM hv),
      reach(es, ed) AS (SELECT es, ed FROM edges
                        UNION SELECT r.es, e.ed FROM reach r JOIN edges e ON r.ed = e.es),
      comp AS (SELECT es AS doc_id, min(ed) AS mn FROM reach GROUP BY es),
      histclus AS (SELECT d.doc_id, coalesce(least(c.mn, d.doc_id), d.doc_id) AS cluster_id
                   FROM documents d LEFT JOIN comp c USING (doc_id)),
      cpv AS (SELECT doc_b AS doc_id, doc_a AS dup_of FROM jac
              WHERE doc_a < 100000 AND doc_b >= 100000 AND j >= 0.5),
      att AS (SELECT cpv.doc_id, min(h.cluster_id) AS cluster_id,
                     count(*)::BIGINT AS n_matched
              FROM cpv JOIN histclus h ON h.doc_id = cpv.dup_of
              GROUP BY cpv.doc_id)
      SELECT sh.doc_id, coalesce(a.cluster_id, sh.doc_id) AS cluster_id,
             coalesce(a.n_matched, 0)::BIGINT AS n_matched
      FROM (SELECT doc_id + 100000 AS doc_id FROM documents) sh
      LEFT JOIN att a USING (doc_id)
      ORDER BY doc_id
    """.trim))

  // ---- similarity search -------------------------------------------------

  /** DuckDB cosine over list columns — sequential left-fold sums, same
    * op order as the codegen'd CosineSimilarity kernel, rounded to 9dp
    * in both engines.
    */
  private[queries] def sqlCos(a: String, b: String): String =
    s"""round(
       list_sum(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE)) /
       (sqrt(list_sum(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE))) *
        sqrt(list_sum(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE)))), 9)"""

  val annBrute = Q(
    "ann_cosine_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.bruteForceTopK(s, emb, emb.filter(col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
      c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      p AS (SELECT query_id, neighbor_id, ${sqlCos("qv", "cv")} AS sim
            FROM q, c WHERE query_id <> neighbor_id)
      SELECT query_id, neighbor_id, rank, sim FROM (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  /** Asymmetric quantized search — the consumer of [[annQuantize]]:
    * the corpus is reconstructed from its int8 codes (codes × 9dp
    * scale), queries stay full-precision, exact cosine ranks as usual.
    * This is how a quantized ANN index actually serves: 4× less memory
    * on the corpus side, negligible ranking drift (recall pinned in
    * Round5Spec against the exact top-k).
    */
  val annQuantizedTopk = Q(
    "ann_quantized_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val recon = Similarity.quantizeInt8(emb, "vec_id", "embedding")
        .select(col("vec_id"),
          expr("transform(codes, c -> c * scale)").as("embedding"))
      Similarity.bruteForceTopK(s, recon, emb.filter(col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH qn AS (SELECT vec_id, embedding,
                    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
                  FROM embeddings),
      cq AS (SELECT vec_id, embedding, round(amax / 127.0, 9) AS s,
               CASE WHEN amax = 0 THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding,
                           x -> CAST(floor(x::DOUBLE / (amax / 127.0) + 0.5) AS INT))
               END AS codes
             FROM qn),
      c AS (SELECT vec_id AS neighbor_id,
              list_transform(range(len(codes)), i -> codes[i+1] * s) AS cv
            FROM cq),
      q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
      p AS (SELECT query_id, neighbor_id, ${sqlCos("qv", "cv")} AS sim
            FROM q, c WHERE query_id <> neighbor_id)
      SELECT query_id, neighbor_id, rank, sim FROM (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  private def lshTableCte(t: Int): String =
    s"""SELECT query_id, neighbor_id
        FROM (SELECT vec_id AS query_id,
                     '$t:' || ${Similarity.sqlHyperplaneBucket("embedding", t, 4, 64)} AS qb
              FROM embeddings WHERE vec_id % 100 = 0) q
        JOIN (SELECT vec_id AS neighbor_id,
                     '$t:' || ${Similarity.sqlHyperplaneBucket("embedding", t, 4, 64)} AS cb
              FROM embeddings) c
          ON qb = cb AND query_id <> neighbor_id"""

  val annLsh = Q(
    "ann_lsh_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshTopK(s, emb, emb.filter(col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 5, bits = 4, tables = 4)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH cand AS (
        SELECT DISTINCT query_id, neighbor_id FROM (
          ${(0 until 4).map(lshTableCte).mkString("\n          UNION ALL\n          ")}
        )),
      p AS (SELECT query_id, neighbor_id, ${sqlCos("q.embedding", "c.embedding")} AS sim
            FROM cand
            JOIN embeddings q ON q.vec_id = query_id
            JOIN embeddings c ON c.vec_id = neighbor_id)
      SELECT query_id, neighbor_id, rank, sim FROM (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  val annIvf = Q(
    "ann_ivf_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(s, emb, emb.filter(col("vec_id") % 100 === 0),
          emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000),
          "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 37 = 0 AND vec_id < 5000),
      corp_a AS (
        SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t)
        WHERE rn = 1),
      q_a AS (
        SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY round(
       list_sum(list_transform(range(len(e.embedding)), i -> e.embedding[i+1]::DOUBLE * t.cv[i+1]::DOUBLE)) /
       (sqrt(list_sum(list_transform(range(len(e.embedding)), i -> e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE))) *
        sqrt(list_sum(list_transform(range(len(t.cv)), i -> t.cv[i+1]::DOUBLE * t.cv[i+1]::DOUBLE)))), 9) DESC, t.cid) AS rn
          FROM embeddings e, cent t WHERE e.vec_id % 100 = 0)
        WHERE rn <= 2),
      p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${sqlCos("q.embedding", "c.embedding")} AS sim
            FROM q_a q JOIN corp_a c ON q.cid = c.cid AND q.vec_id <> c.vec_id)
      SELECT query_id, neighbor_id, rank, sim FROM (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  /** Quantized IVF serving — the 100 TB composition the round-5 verdict
    * asked for: the corpus is stored as int8 codes, reconstructed
    * scan-side, coarse-assigned to inverted lists once, and each
    * full-precision query probes only its nprobe nearest lists. Unlike
    * `ann_quantized_topk` (the deliberate memory-compression yardstick,
    * which still scans the whole corpus per query) the per-query cost
    * here is nprobe/c of the corpus — the plan a quantized index
    * actually serves with.
    */
  val annIvfQuantized = Q(
    "ann_ivf_quantized",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfQuantizedTopK(s, emb, emb.filter(col("vec_id") % 100 === 0),
          emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000),
          "vec_id", "embedding", "vec_id", "embedding", k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH qn AS (SELECT vec_id, embedding,
                    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
                  FROM embeddings),
      cq AS (SELECT vec_id, round(amax / 127.0, 9) AS s,
               CASE WHEN amax = 0 THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding,
                           x -> CAST(floor(x::DOUBLE / (amax / 127.0) + 0.5) AS INT))
               END AS codes
             FROM qn),
      rec AS (SELECT vec_id, list_transform(range(len(codes)), i -> codes[i+1] * s) AS embedding
              FROM cq),
      cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 37 = 0 AND vec_id < 5000),
      corp_a AS (
        SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM rec e, cent t)
        WHERE rn = 1),
      q_a AS (
        SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t WHERE e.vec_id % 100 = 0)
        WHERE rn <= 2),
      p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${sqlCos("q.embedding", "c.embedding")} AS sim
            FROM q_a q JOIN corp_a c ON q.cid = c.cid AND q.vec_id <> c.vec_id)
      SELECT query_id, neighbor_id, rank, sim FROM (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  /** The build/serve split on top of `ann_ivf_quantized`: the
    * quantized-IVF index (codes + list ids + scales) is written ONCE as
    * a parquet artifact — the once-per-corpus ingest job — and the
    * query only PROBES the stored index: reconstruct-from-codes is a
    * scan-side multiply, queries coarse-assign to nprobe lists, and no
    * encode kernel appears anywhere in the serving plan (plan-asserted
    * in Round7Spec). This is the steady-state cost model of a real
    * vector store, vs `ann_ivf_quantized` which rebuilds its index
    * inside every query.
    */
  /** The shared ANN serving-tier coarse quantizer — TRAINED, not
    * sampled: seed vectors (every 18th with residue 13, disjoint from
    * the `% 100 = 0` query set by construction — 10k ≡ 13 (mod 18) has
    * no solution) refined by two fixed Lloyd rounds
    * ([[Similarity.lloydCentroids]]), then PERSISTED once per corpus as
    * the model artifact every index build and serve path loads — the
    * production split where the quantizer is trained at ingest and
    * serving never re-derives it. Raised the measured serving recall@5
    * from 0.34 to 0.58 at the same ~9 % scanned fraction (nprobe=5,
    * spill=2 tier, sf0.1); the fixed round count keeps the whole chain
    * DuckDB-expressible ([[sqlTrainedCentCtes]]).
    */
  /** The trained serving-tier coarse quantizer. Seeds are every 6th
    * vector (`vec_id % 6 = 3`, id-capped at 5000 so the model is
    * scale-fixed past that) — all seed ids are ODD, so the seed set is
    * disjoint from the `% 100 = 0` query/eval set by construction (no
    * train/eval id leakage). Round 11 tripled the cell count from the
    * r10 `% 18 = 13` grid and scaled nprobe 5→15 with it: the scanned
    * fraction is UNCHANGED (nprobe·spill/c ≈ 9 % at sf0.1) while
    * finer cells co-locate true neighbors better — measured recall@5
    * 0.58→0.75 at sf0.1, 0.76→0.88 at sf0.01 (AnnTune sweep; more
    * Lloyd rounds on the COARSE grid measured ≤ 0, so rounds stay 2).
    */
  private[graft] def servingCentroids(s: SparkSession, dir: String) = {
    val centDir = graft.etl.LayoutOps.ensureRunDir(s, dir, "ivf_trained_centroids") { d =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.lloydCentroids(s, emb,
        emb.filter(col("vec_id") % 6 === 3 && col("vec_id") < 5000),
        "vec_id", "embedding", "vec_id", "embedding", rounds = 2)
        .write.parquet(d)
    }
    s.read.parquet(centDir)
  }

  /** Index-side multi-assignment factor of the serving tier (each
    * vector stored in its 2 nearest lists — see
    * [[Similarity.buildQuantizedIvfIndex]]).
    */
  private[graft] val ServingSpill = 2

  /** Query-side probe width of the trained tier — rose 5→15 in
    * lockstep with the 3× centroid count (see [[servingCentroids]]),
    * so every serve plan's scanned fraction is unchanged while the
    * cells it probes are finer. `ServingNprobeLite` is the cheaper
    * int8-serve setting (was 3 of 111 lists; 9 of 333 is the same
    * fraction).
    */
  private[graft] val ServingNprobe = 15
  private[graft] val ServingNprobeLite = 9

  /** DuckDB twin of the trained serving quantizer: the seed CTE plus
    * two unrolled Lloyd rounds (assign → exact-decimal element mean),
    * ending in `cent(cid, cv)` — the same name the serving oracles
    * always consumed, so the training chain drops in front of any of
    * them. Each round is the proven ann_kmeans_iter recipe (sim at
    * 9 dp, ties to the smaller cid, elements rounded to 9 dp and summed
    * as DECIMAL(27,9) before one double division).
    */
  private[queries] def sqlTrainedCentCtes: String = {
    def assign(centCte: String, tag: String) = s"""
      tca$tag AS (SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "c.cv")} DESC, c.cid) AS rn
          FROM embeddings e, $centCte c) WHERE rn = 1),
      tcm$tag AS (SELECT cid, dim,
                    CAST(sum(CAST(round(x, 9) AS DECIMAL(27,9))) AS DOUBLE) / count(*) AS v
                  FROM (SELECT cid, unnest(embedding)::DOUBLE AS x,
                               unnest(range(len(embedding))) AS dim FROM tca$tag)
                  GROUP BY cid, dim)"""
    s"""tcseed AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                   WHERE vec_id % 6 = 3 AND vec_id < 5000),
      ${assign("tcseed", "1")},
      tcc1 AS (SELECT cid, list(v ORDER BY dim) AS cv FROM tcm1 GROUP BY cid),
      ${assign("tcc1", "2")},
      cent AS (SELECT cid, list(v ORDER BY dim) AS cv FROM tcm2 GROUP BY cid)"""
  }

  /** Exact top-5 truth for the fixed 1%-query panel, staged once per
    * corpus: the recall evals (routed economics, dim truncation) read
    * the SAME persisted truth instead of re-running the brute-force
    * tier in-query — which was both their dominant cost and the
    * round-over-round measurement instability of
    * eval_routed_economics (VERDICT r14 item 7: 1.58 ↔ 3.58 s between
    * quiet runs; the probe/serve tiers it exists to price are
    * sub-second and stable). `ann_cosine_topk` still computes the
    * brute force live — pricing that tier is that query's point.
    */
  def ensureAnnTruth(s: SparkSession, dir: String): String = {
    val emb = Tables(s, dir, "embeddings")
    graft.etl.LayoutOps.ensureRunDir(s, dir, "ann_truth_top5") { d =>
      Similarity.bruteForceTopK(s, emb,
        emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5).write.parquet(d)
    }
  }

  /** Build-if-absent the persisted int8-IVF index and return its path.
    * Called by the serve query AND by Bench's ingest warm-up: the index
    * build is a once-per-corpus ingest job (the same class as bucketed/
    * partitioned layout artifacts), so a benchmark of the SERVING tier
    * must not bill the build to whichever query runs first.
    */
  def ensureIvfInt8Index(s: SparkSession, dir: String): String = {
    val emb = Tables(s, dir, "embeddings")
    graft.etl.LayoutOps.ensureRunDir(s, dir, "ivf_int8_index") { d =>
      Similarity.buildQuantizedIvfIndex(s, emb, servingCentroids(s, dir),
        "vec_id", "embedding", "cid", "cv",
        spill = ServingSpill).write.parquet(d)
    }
  }

  /** Build-if-absent the persisted IVF-PQ index; returns (path, model).
    * The residual codebook is deterministic from scale-fixed inputs, so
    * recomputing it driver-side is the model-load step, not a rebuild —
    * and it is memoized per corpus dir (r17): a deployment persists the
    * model NEXT TO the index and loads it once per process; re-running
    * the training collect per query billed 2-3 fixed-cost jobs to every
    * IVF-PQ query (the Tables relation-cache precedent).
    */
  private val ivfPqModels =
    new java.util.concurrent.ConcurrentHashMap[String, Similarity.PqModel]()

  def ensureIvfPqIndex(s: SparkSession, dir: String): (String, Similarity.PqModel) = {
    val emb = Tables(s, dir, "embeddings")
    val cents = servingCentroids(s, dir)
    val model = ivfPqModels.computeIfAbsent(dir, _ =>
      Similarity.ivfPqResidualModel(
        emb.filter(col("vec_id") % 5 === 0 && col("vec_id") < 5000), cents,
        "vec_id", "embedding", "cid", "cv", m = 16))
    val idxDir = graft.etl.LayoutOps.ensureRunDir(s, dir, "ivfpq_index") { d =>
      Similarity.buildIvfPqIndex(s, emb, cents, model,
        "vec_id", "embedding", "cid", "cv",
        spill = ServingSpill).write.parquet(d)
    }
    (idxDir, model)
  }

  val annIndexServe = Q(
    "ann_index_serve",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val idxDir = ensureIvfInt8Index(s, dir)
      Similarity.serveQuantizedIvf(s, s.read.parquet(idxDir),
          emb.filter(col("vec_id") % 100 === 0), servingCentroids(s, dir),
          "vec_id", "embedding", "cid", "cv", k = 5, nprobe = ServingNprobeLite,
          spill = ServingSpill)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH qn AS (SELECT vec_id, embedding,
                    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
                  FROM embeddings),
      cq AS (SELECT vec_id, round(amax / 127.0, 9) AS s,
               CASE WHEN amax = 0 THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding,
                           x -> CAST(floor(x::DOUBLE / (amax / 127.0) + 0.5) AS INT))
               END AS codes
             FROM qn),
      rec AS (SELECT vec_id, list_transform(range(len(codes)), i -> codes[i+1] * s) AS embedding
              FROM cq),
      $sqlTrainedCentCtes,
      corp_a AS (
        SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM rec e, cent t)
        WHERE rn <= $ServingSpill),
      q_a AS (
        SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t WHERE e.vec_id % 100 = 0)
        WHERE rn <= $ServingNprobeLite),
      p AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ${sqlCos("q.embedding", "c.embedding")} AS sim
            FROM q_a q JOIN corp_a c ON q.cid = c.cid AND q.vec_id <> c.vec_id)
      SELECT query_id, neighbor_id, rank, sim FROM (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  /** Shared DuckDB CTE chain for PQ encode + reconstruct (the oracle
    * twin of `pqTrain`/`pqEncode`/`pqReconstruct` at m=8, codebook =
    * every 5th vector in id order, dense codes): `rec` is the
    * reconstructed corpus as (vec_id, embedding).
    */
  private[queries] def pqRecCtes(src: String = "embeddings"): String = s"""
      cb0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding
                   FROM $src WHERE vec_id % 5 = 0 AND vec_id < 5000),
      sp AS (SELECT unnest(range(8)) AS sub),
      cb AS (SELECT b.code, s.sub,
                    list_transform(range(8), i -> b.embedding[s.sub*8 + i + 1]::DOUBLE) AS cw
             FROM cb0 b, sp s),
      d AS (SELECT e.vec_id, c.sub, c.code,
              round(list_sum(list_transform(range(8),
                i -> (e.embedding[c.sub*8 + i + 1]::DOUBLE - c.cw[i+1]) *
                     (e.embedding[c.sub*8 + i + 1]::DOUBLE - c.cw[i+1]))), 9) AS dist
            FROM $src e, cb c),
      enc AS (SELECT vec_id, sub, code FROM (
                SELECT vec_id, sub, code,
                       row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
                FROM d) WHERE rn = 1),
      rec AS (SELECT e.vec_id, flatten(list(c.cw ORDER BY e.sub)) AS embedding
              FROM enc e JOIN cb c ON c.sub = e.sub AND c.code = e.code
              GROUP BY e.vec_id)"""

  /** Product-quantization search (ADC): corpus encoded to m=8 dense
    * codeword indices (8 bytes/vector vs 256 — the canonical
    * memory-bound compression), reconstructed from the codebook
    * literals scan-side, ranked asymmetrically against full-precision
    * queries. Codebook = sub-slices of every 5th vector under id 5000 (a SCALE-FIXED model input: corpus growth must not grow the codebook)
    * (dense codes, so reconstruction is element_at in both engines).
    * L2 codeword assignment, ascending-fold summation, 9 dp — the same
    * determinism recipe as k-means/IVF.
    */
  val annPq = Q(
    "ann_pq_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.pqTopK(s, emb, emb.filter(col("vec_id") % 100 === 0),
          emb.filter(col("vec_id") % 5 === 0 && col("vec_id") < 5000),
          "vec_id", "embedding", m = 8, k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH ${pqRecCtes()},
      q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
      p AS (SELECT query_id, rec.vec_id AS neighbor_id, ${sqlCos("qv", "rec.embedding")} AS sim
            FROM q, rec WHERE query_id <> rec.vec_id)
      SELECT query_id, neighbor_id, rank, sim FROM (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  /** IVF-PQ — both scale levers composed, the architecture a 100 TB
    * vector index actually runs (FAISS IVFPQ): lists assigned on the
    * original vectors at index build (assignment precedes quantization),
    * m-byte PQ codes stored, full-precision queries probe nprobe lists
    * and rank against the reconstruction. Per-query cost is nprobe/c of
    * an index 32× smaller than float32. Codes encode the RESIDUAL
    * (vector − assigned centroid), so the codebook budget spends on the
    * within-list variation only — the recall lift over raw-vector codes
    * is pinned in Round7Spec.
    */
  /** Shared oracle for the IVF-PQ pair (`ann_ivfpq_topk` builds the
    * index inside the query, `ann_ivfpq_serve` probes the persisted
    * artifact): identical knobs → identical results, which is the
    * point — the build/serve split changes WHERE the encode cost is
    * paid, never the answer.
    */
  private def ivfPqOracleSql(corpus: String = "embeddings", pre: String = ""): String = s"""
      WITH ${ivfPqCandidateCtes(corpus, pre)}
      SELECT query_id, neighbor_id, rank, sim FROM (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim

  /** The IVF-PQ candidate chain up to `p` = (query_id, neighbor_id,
    * compressed-domain sim) — shared by the top-k oracles above, the
    * exact re-rank oracle below (which consumes `p` as its shortlist),
    * and the incremental-merge oracle (which swaps the indexed corpus
    * for the merged one via `corpus`/`pre` while queries, centroids,
    * and codebook training rows stay fixed — the model is frozen).
    */
  private def ivfPqCandidateCtes(corpus: String = "embeddings",
      pre: String = ""): String = s"""
      $pre$sqlTrainedCentCtes,
      corp_a AS (
        SELECT vec_id, cid, rn FROM (
          SELECT e.vec_id, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM $corpus e, cent t)
        WHERE rn <= $ServingSpill),
      resid AS (SELECT e.vec_id, a.cid, a.rn,
                  list_transform(range(len(e.embedding)),
                    i -> e.embedding[i+1]::DOUBLE - t.cv[i+1]::DOUBLE) AS r
                FROM $corpus e JOIN corp_a a USING (vec_id)
                JOIN cent t ON t.cid = a.cid),
      cb0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, r
              FROM resid WHERE vec_id % 5 = 0 AND vec_id < 5000 AND rn = 1),
      sp AS (SELECT unnest(range(16)) AS sub),
      cb AS (SELECT b.code, s.sub,
                    list_transform(range(4), i -> b.r[s.sub*4 + i + 1]) AS cw
             FROM cb0 b, sp s),
      d AS (SELECT e.vec_id, e.cid, c.sub, c.code,
              round(list_sum(list_transform(range(4),
                i -> (e.r[c.sub*4 + i + 1] - c.cw[i+1]) *
                     (e.r[c.sub*4 + i + 1] - c.cw[i+1]))), 9) AS dist
            FROM resid e, cb c),
      enc AS (SELECT vec_id, cid, sub, code FROM (
                SELECT vec_id, cid, sub, code,
                       row_number() OVER (PARTITION BY vec_id, cid, sub ORDER BY dist, code) AS rn
                FROM d) WHERE rn = 1),
      recr AS (SELECT e.vec_id, e.cid, flatten(list(c.cw ORDER BY e.sub)) AS rr
               FROM enc e JOIN cb c ON c.sub = e.sub AND c.code = e.code
               GROUP BY e.vec_id, e.cid),
      corp AS (SELECT r.vec_id, r.cid,
                 list_transform(range(len(r.rr)), i -> t.cv[i+1]::DOUBLE + r.rr[i+1]) AS embedding
               FROM recr r JOIN cent t ON t.cid = r.cid),
      q_a AS (
        SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t WHERE e.vec_id % 100 = 0)
        WHERE rn <= $ServingNprobe),
      p0 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    ${sqlCos("q.embedding", "c.embedding")} AS sim
             FROM q_a q JOIN corp c ON q.cid = c.cid AND q.vec_id <> c.vec_id),
      p AS (SELECT query_id, neighbor_id, max(sim) AS sim
            FROM p0 GROUP BY query_id, neighbor_id)""".trim

  val annIvfPq = Q(
    "ann_ivfpq_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfPqTopK(s, emb, emb.filter(col("vec_id") % 100 === 0),
          servingCentroids(s, dir),
          emb.filter(col("vec_id") % 5 === 0 && col("vec_id") < 5000),
          "vec_id", "embedding", "cid", "cv", m = 16, k = 5, nprobe = ServingNprobe,
          spill = ServingSpill)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(ivfPqOracleSql()))

  /** The compressed-index serving tier end-to-end: residual PQ codes +
    * list ids persisted once (`Similarity.buildIvfPqIndex` through the
    * per-run artifact cache), then probed by a plan that DECODES but
    * never encodes — the FAISS IVFPQ build/serve economics on top of
    * the scalar-code tier `ann_index_serve` already exercises.
    * Round7Spec asserts the no-encode plan shape.
    */
  val annIvfPqServe = Q(
    "ann_ivfpq_serve",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val (idxDir, model) = ensureIvfPqIndex(s, dir)
      Similarity.serveIvfPq(s, s.read.parquet(idxDir),
          emb.filter(col("vec_id") % 100 === 0), servingCentroids(s, dir), model,
          "vec_id", "embedding", "cid", "cv", k = 5, nprobe = ServingNprobe,
          spill = ServingSpill)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(ivfPqOracleSql()))

  /** Two-stage retrieval: the persisted IVF-PQ index recalls a k'=15
    * shortlist per query (compressed-domain ranking), then EXACT cosine
    * over the ORIGINAL vectors re-ranks just those 15 rows down to
    * top-5. This is how every production vector store actually answers
    * queries — the compressed tier buys recall per byte, the exact
    * re-rank restores the ordering quantization blurred, and the
    * full-precision vectors are touched only for n_queries × k' rows
    * (a broadcast-sized id join), never a corpus scan.
    */
  val annRerankExact = Q(
    "ann_rerank_exact",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val (idxDir, model) = ensureIvfPqIndex(s, dir)
      val qs = emb.filter(col("vec_id") % 100 === 0)
      val shortlist = Similarity.serveIvfPq(s, s.read.parquet(idxDir), qs,
        servingCentroids(s, dir), model,
        "vec_id", "embedding", "cid", "cv", k = 15, nprobe = ServingNprobe,
        spill = ServingSpill)
      Similarity.rerankExact(shortlist, emb, qs, "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH ${ivfPqCandidateCtes()},
      sl AS (SELECT query_id, neighbor_id FROM (
               SELECT query_id, neighbor_id,
                      row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
               FROM p) WHERE rank <= 15),
      rr AS (SELECT s.query_id, s.neighbor_id, ${sqlCos("qe.embedding", "ce.embedding")} AS sim
             FROM sl s JOIN embeddings qe ON qe.vec_id = s.query_id
                       JOIN embeddings ce ON ce.vec_id = s.neighbor_id)
      SELECT query_id, neighbor_id, rank, sim FROM (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM rr) WHERE rank <= 5
      ORDER BY query_id, rank
    """.trim))

  /** Incremental ANN index maintenance — the third leg of the
    * incremental-maintenance triangle (near-dup fingerprint index:
    * `dedup_index_probe`; BM25 postings: `text_index_merge`): a delta
    * shard merges into the PERSISTED IVF-PQ index via
    * [[Similarity.mergeIvfPqIndex]] — only the delta coarse-assigns and
    * residual-encodes (with the frozen centroids + codebook), re-crawled
    * ids replace their stored entries through a broadcast-anti filter,
    * fresh ids append — then the standard query set serves from the
    * merged index. The delta here: ids ≡3 (mod 10) below 400 re-crawled
    * with their successor's vector (a changed embedding both engines
    * can derive without float arithmetic), ids ≡7 (mod 10) re-collected
    * under +1000000. The oracle rebuilds the index from the union
    * corpus with the same model — merged-then-served must equal
    * rebuilt-then-served, pinning both the upsert and the model-frozen
    * encode.
    */
  val annIndexMerge = Q(
    "ann_index_merge",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val (idxDir, model) = ensureIvfPqIndex(s, dir)
      val recrawl = emb.as("a")
        .join(emb.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
        .filter(col("a.vec_id") % 10 === 3 && col("a.vec_id") < 400)
        .select(col("a.vec_id").as("vec_id"), col("b.embedding").as("embedding"))
      val fresh = emb.filter(col("vec_id") % 10 === 7)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val merged = Similarity.mergeIvfPqIndex(s, s.read.parquet(idxDir),
        recrawl.unionByName(fresh), servingCentroids(s, dir), model,
        "vec_id", "embedding", "cid", "cv", spill = ServingSpill)
      Similarity.serveIvfPq(s, merged, emb.filter(col("vec_id") % 100 === 0),
          servingCentroids(s, dir), model,
          "vec_id", "embedding", "cid", "cv", k = 5, nprobe = ServingNprobe,
          spill = ServingSpill)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(ivfPqOracleSql(corpus = "mcorp", pre = """mcorp AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE NOT (vec_id % 10 = 3 AND vec_id < 400)
        UNION ALL
        SELECT a.vec_id, b.embedding FROM embeddings a
        JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 10 = 3 AND a.vec_id < 400
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
        WHERE vec_id % 10 = 7),
      """)))

  /** IVF range search — radius-bounded retrieval (every probed-list
    * neighbor with cosine ≥ 0.2) instead of a fixed top-k: the serving
    * mode near-dup harvesting uses, where a k cap would silently
    * truncate dense neighborhoods. No window in the plan at all.
    */
  val annRangeSearch = Q(
    "ann_range_search",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfRangeSearch(s, emb, emb.filter(col("vec_id") % 100 === 0),
          emb.filter(col("vec_id") % 37 === 0 && col("vec_id") < 5000),
          "vec_id", "embedding", "vec_id", "embedding", minSim = 0.2, nprobe = 2)
        .orderBy(col("query_id"), col("neighbor_id"))
    },
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                    WHERE vec_id % 37 = 0 AND vec_id < 5000),
      corp_a AS (
        SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t)
        WHERE rn = 1),
      q_a AS (
        SELECT vec_id, embedding, cid FROM (
          SELECT e.vec_id, e.embedding, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t WHERE e.vec_id % 100 = 0)
        WHERE rn <= 2)
      SELECT query_id, neighbor_id, sim FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ${sqlCos("q.embedding", "c.embedding")} AS sim
        FROM q_a q JOIN corp_a c ON q.cid = c.cid AND q.vec_id <> c.vec_id)
      WHERE sim >= 0.2
      ORDER BY query_id, neighbor_id
    """.trim))

  /** Filtered vector search: per-query top-3 among probed-list
    * neighbors sharing the query's label — the metadata predicate is
    * part of the probe join (filter-during-search), never a post-top-k
    * filter that under-fills k.
    */
  val annFilteredTopk = Q(
    "ann_filtered_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfFilteredTopK(s, emb, emb.filter(col("vec_id") % 100 === 0),
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
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t)
        WHERE rn = 1),
      q_a AS (
        SELECT vec_id, embedding, label, cid FROM (
          SELECT e.vec_id, e.embedding, e.label, t.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${sqlCos("e.embedding", "t.cv")} DESC, t.cid) AS rn
          FROM embeddings e, cent t WHERE e.vec_id % 100 = 0)
        WHERE rn <= 2),
      p AS (SELECT q.vec_id AS query_id, q.label, c.vec_id AS neighbor_id,
                   ${sqlCos("q.embedding", "c.embedding")} AS sim
            FROM q_a q JOIN corp_a c
              ON q.cid = c.cid AND q.label = c.label AND q.vec_id <> c.vec_id)
      SELECT query_id, label, neighbor_id, rank, sim FROM (
        SELECT query_id, label, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        FROM p) WHERE rank <= 3
      ORDER BY query_id, rank
    """.trim))

  /** int8 scalar quantization of the embedding table: per-vector scale,
    * exact codes (pinned via md5 of the code list) and max
    * reconstruction error. floor(x/s + 0.5) keeps the half-case
    * engine-portable where native round() is not.
    */
  val annQuantize = Q(
    "ann_quantize_int8",
    (s, dir) =>
      Similarity.quantizeInt8(Tables(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          md5(array_join(transform(col("codes"), c => c.cast("string")), ",")).as("codes_md5"),
          col("max_abs_err"))
        .orderBy(col("vec_id")),
    Some("""
      WITH q AS (SELECT vec_id, embedding,
                   list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
                 FROM embeddings),
      c AS (SELECT vec_id, embedding, amax, amax / 127.0 AS s,
              CASE WHEN amax = 0
                   THEN list_transform(embedding, x -> 0)
                   ELSE list_transform(embedding,
                          x -> CAST(floor(x::DOUBLE / (amax / 127.0) + 0.5) AS INT))
              END AS codes
            FROM q)
      SELECT vec_id, round(s, 9) AS scale,
             md5(array_to_string(codes, ',')) AS codes_md5,
             round(list_max(list_transform(range(len(embedding)),
               i -> abs(embedding[i+1]::DOUBLE - codes[i+1] * s))), 9) AS max_abs_err
      FROM c ORDER BY vec_id
    """.trim))

  /** Shared by `dedup_embedding_pairs` and `dedup_semantic`: the
    * augmented embedding corpus (planted scaled copies — scaling
    * preserves direction, so cosine ≈ 1 and the copy coarse-assigns to
    * the same list, exercising recall of true near-dups) and its
    * cluster-scoped, cosine-verified near-dup pairs.
    *
    * The propose stage is the actual SemDeDup recipe: every vector
    * coarse-assigns to its nearest list centroid and pairs are proposed
    * only WITHIN a list. The centroid set is a corpus-proportional
    * sample (one per 37 vectors), so list sizes stay bounded and
    * candidate volume stays near-linear in corpus size — unlike a
    * fixed-bucket scheme (e.g. 6 sign bits = 64 buckets), whose
    * candidate count is ~n²/64 at any scale. Assignment rides
    * [[Similarity.coarseAssignJoin]] (broadcast centroids,
    * order-independent argmax): the corpus never reshuffles and the
    * centroid model is never inlined into codegen. Measured in
    * ScaleSmoke: candidate volume grows ~linearly 1×→10×.
    */
  private def embeddingPairs(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    graft.functions.VectorExpressions.register(s)
    val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val aug = emb.unionByName(emb.select(
      (col("vec_id") + 100000L).as("vec_id"),
      expr("transform(embedding, x -> x * cast(1.01 as float))").as("embedding")))
    val cents = emb.filter(col("vec_id") % 37 === 0)
    val asg = Similarity.coarseAssignJoin(s, aug, cents,
      "vec_id", "embedding", "vec_id", "embedding")
    val a = asg.select(col("vec_id").as("doc_a"), col("embedding").as("__ea"),
      col("cluster").as("__ca"))
    val b = asg.select(col("vec_id").as("doc_b"), col("embedding").as("__eb"),
      col("cluster").as("__cb"))
    val pairs = a.join(b, col("__ca") === col("__cb") && col("doc_a") < col("doc_b"))
      .withColumn("sim", round(expr("graft_cosine(__ea, __eb)"), 9))
      .filter(col("sim") >= 0.999)
    (aug, pairs)
  }

  /** DuckDB twin of [[embeddingPairs]]'s aug/cent/wb CTEs: `wb` is the
    * coarse assignment (same 9 dp cosine, same smaller-cid tiebreak).
    */
  private def embeddingPairCtes: String = s"""
      aug AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000, list_transform(embedding, x -> x * 1.01::FLOAT)
        FROM embeddings),
      cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
               WHERE vec_id % 37 = 0),
      wb AS (SELECT vec_id, embedding, cid FROM (
               SELECT a.vec_id, a.embedding, t.cid,
                      row_number() OVER (PARTITION BY a.vec_id
                        ORDER BY ${sqlCos("a.embedding", "t.cv")} DESC, t.cid) AS rn
               FROM aug a, cent t)
             WHERE rn = 1)"""

  val dedupEmbedding = Q(
    "dedup_embedding_pairs",
    (s, dir) => {
      val (_, pairs) = embeddingPairs(s, dir)
      pairs.select(col("doc_a"), col("doc_b"), col("sim"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH $embeddingPairCtes
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             ${sqlCos("a.embedding", "b.embedding")} AS sim
      FROM wb a JOIN wb b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE ${sqlCos("a.embedding", "b.embedding")} >= 0.999
      ORDER BY doc_a, doc_b
    """.trim))

  /** Semantic deduplication (the SemDeDup recipe): embedding near-dup
    * PAIRS become semantic CLUSTERS via connected components, and one
    * canonical document (the min id) survives per cluster. This is the
    * end-to-end shape an LLM corpus pipeline actually applies —
    * cluster-scoped propose → exact-cosine verify → hash-min CC → keep
    * flag — every stage the bounded, never-n² machinery already pinned
    * by dedup_embedding_pairs and dedup_clusters.
    */
  val dedupSemantic = Q(
    "dedup_semantic",
    (s, dir) => {
      val (aug, pairs) = embeddingPairs(s, dir)
      Dedup.clusterAssignment(aug, pairs.select(col("doc_a"), col("doc_b")), "vec_id")
        .withColumn("keep", (col("vec_id") === col("cluster_id")).cast("int"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH RECURSIVE $embeddingPairCtes,
      pairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
                FROM wb a JOIN wb b ON a.cid = b.cid AND a.vec_id < b.vec_id
                WHERE ${sqlCos("a.embedding", "b.embedding")} >= 0.999),
      edges AS (SELECT doc_a AS sv, doc_b AS dv FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(sv, dv) AS (SELECT sv, dv FROM edges
                        UNION SELECT r.sv, e.dv FROM reach r JOIN edges e ON r.dv = e.sv),
      comp AS (SELECT sv AS vec_id, min(dv) AS mn FROM reach GROUP BY sv)
      SELECT a.vec_id,
             coalesce(least(c.mn, a.vec_id), a.vec_id) AS cluster_id,
             CAST(CASE WHEN coalesce(least(c.mn, a.vec_id), a.vec_id) = a.vec_id
                  THEN 1 ELSE 0 END AS INT) AS keep
      FROM aug a LEFT JOIN comp c USING (vec_id)
      ORDER BY vec_id
    """.trim))

  // ---- text analysis -----------------------------------------------------

  private[queries] def sqlList(xs: Seq[String]): String = xs.mkString("['", "', '", "']")
  private[queries] def sqlHits(stops: Seq[String]): String =
    s"len(list_filter(w, x -> list_contains(${sqlList(stops)}, x)))::BIGINT"

  /** Per-language stop-hit count — the DuckDB twin of the broadcast
    * lookup in `TextOps.withQualityByLang`: a CASE over
    * `TextOps.StopByLang` (generated, so adding a language updates
    * both engines from one list), English fallback for unlisted langs.
    */
  private[queries] def sqlHitsByLang(langExpr: String = "lang"): String =
    s"CASE $langExpr " +
      TextOps.StopByLang.map { case (l, st) =>
        s"WHEN '$l' THEN ${sqlHits(st)}" }.mkString(" ") +
      s" ELSE ${sqlHits(TextOps.StopEn)} END"

  /** Per-language DISTINCT stop-word count (the Gopher stop rule's
    * statistic) — same generated CASE, distinct semantics.
    */
  private[queries] def sqlStopDistinctByLang(langExpr: String = "lang"): String = {
    def one(st: Seq[String]): String =
      s"len(list_filter(${sqlList(st)}, s -> list_contains(w, s)))::BIGINT"
    s"CASE $langExpr " +
      TextOps.StopByLang.map { case (l, st) =>
        s"WHEN '$l' THEN ${one(st)}" }.mkString(" ") +
      s" ELSE ${one(TextOps.StopEn)} END"
  }

  val textLangid = Q(
    "text_langid",
    (s, dir) =>
      TextOps.withLangId(Tables(s, dir, "documents"), "text")
        .select(col("doc_id"), col("lang"), col("hits_en"), col("hits_es"),
          col("hits_de"), col("lang_pred"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH n AS (SELECT doc_id, lang, $NormW AS w FROM documents)
      SELECT doc_id, lang,
             ${sqlHits(TextOps.StopEn)} AS hits_en,
             ${sqlHits(TextOps.StopEs)} AS hits_es,
             ${sqlHits(TextOps.StopDe)} AS hits_de,
             CASE WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
                  WHEN hits_es >= hits_de THEN 'es' ELSE 'de' END AS lang_pred
      FROM n ORDER BY doc_id
    """.trim))

  /** Character-trigram language ID (the n-gram heuristic variant of
    * text_langid). Occurrence counts via length differencing — the same
    * arithmetic in both engines; counts are exact multiples of 3 so the
    * double division is exact before the cast.
    */
  val textLangidTrigram = Q(
    "text_langid_trigram",
    (s, dir) =>
      TextOps.withLangIdTrigram(Tables(s, dir, "documents"), "text")
        .select(col("doc_id"), col("lang"), col("tri_en"), col("tri_es"),
          col("tri_de"), col("lang_pred_tri"))
        .orderBy(col("doc_id")),
    Some {
      def score(tris: Seq[String]): String = tris.map { p =>
        val esc = p.replace("'", "''")
        s"(length(t) - length(replace(t, '$esc', ''))) / ${p.length}"
      }.mkString("(", " + ", ")::BIGINT")
      raw"""
      WITH n AS (SELECT doc_id, lang,
                        ' ' || regexp_replace(trim(lower(text)), '\s+', ' ', 'g') || ' ' AS t
                 FROM documents)
      SELECT doc_id, lang,
             ${score(TextOps.TriEn)} AS tri_en,
             ${score(TextOps.TriEs)} AS tri_es,
             ${score(TextOps.TriDe)} AS tri_de,
             CASE WHEN tri_en >= tri_es AND tri_en >= tri_de THEN 'en'
                  WHEN tri_es >= tri_de THEN 'es' ELSE 'de' END AS lang_pred_tri
      FROM n ORDER BY doc_id
    """.trim
    })

  val textQuality = Q(
    "text_quality",
    (s, dir) =>
      TextOps.withQuality(Tables(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_chars_raw"), col("n_words"), col("n_alpha"),
          col("punct_ratio"), col("avg_word_len"), col("stop_ratio"), col("quality"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH n AS (SELECT doc_id, text, $NormW AS w FROM documents),
      m AS (SELECT doc_id,
              length(text)::BIGINT AS n_chars_raw,
              len(w)::BIGINT AS n_words,
              length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::BIGINT AS n_alpha,
              length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio,
              length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE / len(w) AS avg_word_len,
              ${sqlHits(TextOps.StopEn)}::DOUBLE / len(w) AS stop_ratio
            FROM n)
      SELECT doc_id, n_chars_raw, n_words, n_alpha, punct_ratio, avg_word_len, stop_ratio,
             round(least(avg_word_len / 8.0, 1.0) * 0.4
                   + least(stop_ratio * 5.0, 1.0) * 0.4
                   + (1.0 - punct_ratio) * 0.2, 9) AS quality
      FROM m ORDER BY doc_id
    """.trim))

  val textTokens = Q(
    "text_tokens",
    (s, dir) =>
      TextOps.withTokenCounts(Tables(s, dir, "documents"), "text")
        .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"))
        .orderBy(col("doc_id")),
    Some(raw"""
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS ws_tokens,
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS bpe_tokens
      FROM documents ORDER BY doc_id
    """.trim))

  /** Shared oracle fragment: the greedy longest-match recursion. Each
    * word advances one token per step — the longest vocabulary entry
    * matching at `pos` (same-length matches are equal strings, so
    * `ORDER BY length DESC LIMIT 1` is deterministic), else the single
    * character — accumulating count and the '|'-joined token string.
    * The VALUES literal is generated from [[graft.functions
    * .SubwordTokens.Vocab]], the kernel's own table: one source of
    * truth for both engines.
    */
  private def subwordRecCtes: String = {
    val vocabValues =
      graft.functions.SubwordTokens.Vocab.map(t => s"('$t')").mkString(", ")
    s"""vocab(t) AS (SELECT * FROM (VALUES $vocabValues)),
      n AS (SELECT doc_id, $NormW AS w FROM documents),
      wrd AS (SELECT doc_id, wi, wd FROM (
                SELECT doc_id,
                       unnest(list_transform(range(len(w)), i -> {'wi': i, 'wd': w[i+1]}),
                              recursive := true)
                FROM n)
              WHERE wd <> ''),
      rec AS (
        SELECT doc_id, wi, wd, 0 AS pos, 0 AS n_tok, '' AS toks FROM wrd
        UNION ALL
        SELECT doc_id, wi, wd, pos + length(m) AS pos, n_tok + 1 AS n_tok,
               CASE WHEN toks = '' THEN m ELSE toks || '|' || m END AS toks
        FROM (
          SELECT doc_id, wi, wd, pos, n_tok, toks,
                 coalesce((SELECT v.t FROM vocab v
                           WHERE substr(wd, pos + 1, length(v.t)) = v.t
                           ORDER BY length(v.t) DESC LIMIT 1),
                          substr(wd, pos + 1, 1)) AS m
          FROM rec WHERE pos < length(wd))
      ),
      fin AS (SELECT doc_id, wi, n_tok, toks FROM rec WHERE pos >= length(wd)),
      agg AS (SELECT doc_id, sum(n_tok)::BIGINT AS n_subwords,
                     md5(string_agg(toks, '|' ORDER BY wi)) AS tokens_md5
              FROM fin GROUP BY doc_id)"""
  }

  /** Greedy longest-match subword tokenization, oracled on BOTH the
    * count and an md5 pin of the exact token sequence — DuckDB re-runs
    * the same greedy matcher as a recursive CTE over the same literal
    * vocabulary, so a single divergent token anywhere in the corpus
    * hash-fails the query.
    */
  val textSubwordTokens = Q(
    "text_subword_tokens",
    (s, dir) =>
      TextOps.subwordTokens(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE $subwordRecCtes
      SELECT d.doc_id, coalesce(a.n_subwords, 0)::BIGINT AS n_subwords,
             coalesce(a.tokens_md5, md5('')) AS tokens_md5
      FROM documents d LEFT JOIN agg a USING (doc_id)
      ORDER BY doc_id
    """.trim))

  /** Temperature-flattened language-mixture weights (alpha = 0.3, the
    * mT5 setting): per-language corpus share p, flattened sampling
    * weight w ∝ p^0.3, and the up/down-sampling boost w/p a mixing step
    * applies. One corpus-scale count; the normalization runs on the
    * per-language frame via broadcast 1-row totals, double sums folded
    * in sorted order so the result is partition-order-independent.
    */
  val textMixtureTemperature = Q(
    "text_mixture_temperature",
    (s, dir) =>
      graft.etl.SampleOps.temperatureWeights(
          Tables(s, dir, "documents"), "lang", alpha = 0.3)
        .orderBy(col("lang")),
    Some("""
      WITH g AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang),
      n AS (SELECT sum(n_docs)::DOUBLE AS nt FROM g),
      p AS (SELECT lang, n_docs, n_docs::DOUBLE / nt AS p,
                   pow(n_docs::DOUBLE / nt, 0.3) AS wr
            FROM g, n),
      t AS (SELECT list_sum(list_sort(list(wr))) AS wt FROM p)
      SELECT lang, n_docs, round(p, 9) AS p, round(wr / wt, 9) AS w,
             round((wr / wt) / p, 9) AS boost
      FROM p, t ORDER BY lang
    """.trim))

  /** Tokenizer fertility accounting: subword tokens per character by
    * language — the compression-ratio signal pipelines use to budget
    * mixtures in TOKENS (what training consumes) rather than bytes, and
    * to spot languages the vocabulary serves poorly (high fertility =
    * the tokenizer shatters that language). Integer sums over the
    * per-doc token counts from the same greedy tokenizer kernel; the
    * oracle re-runs the tokenizer as a recursive CTE and re-aggregates.
    */
  val textTokenFertility = Q(
    "text_token_fertility",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      TextOps.subwordTokens(d, "doc_id", "text")
        .join(d.select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_subwords")).as("total_subwords"),
          sum(col("n_chars")).as("total_chars"),
          round(sum(col("n_subwords")).cast("double") /
            sum(col("n_chars")), 9).as("fertility"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH RECURSIVE $subwordRecCtes,
      cnt AS (SELECT d.doc_id, d.lang, d.n_chars,
                     coalesce(a.n_subwords, 0)::BIGINT AS n_subwords
              FROM documents d LEFT JOIN agg a USING (doc_id))
      SELECT lang, count(*)::BIGINT AS n_docs,
             sum(n_subwords)::BIGINT AS total_subwords,
             sum(n_chars)::BIGINT AS total_chars,
             round(sum(n_subwords)::DOUBLE / sum(n_chars)::DOUBLE, 9) AS fertility
      FROM cnt GROUP BY lang ORDER BY lang
    """.trim))

  /** Context packing metered by SUBWORD tokens — what a pretraining
    * pipeline actually budgets (whitespace words undercount by the
    * subword blow-up factor). Same distributed prefix-sum cut as
    * text_pack_windows, counts from the tokenizer kernel.
    */
  val textPackSubword = Q(
    "text_pack_subword",
    (s, dir) =>
      TextOps.packWindowsByCount(
        TextOps.subwordTokens(Tables(s, dir, "documents"), "doc_id", "text")
          .select(col("doc_id"), col("n_subwords").as("n_tokens")),
        "doc_id", windowTokens = 512)
        .orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE $subwordRecCtes,
      cnt AS (SELECT d.doc_id, coalesce(a.n_subwords, 0)::BIGINT AS n_tokens
              FROM documents d LEFT JOIN agg a USING (doc_id)),
      srt AS (SELECT doc_id, n_tokens,
                (sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)::BIGINT AS start_pos
              FROM cnt)
      SELECT doc_id, n_tokens, start_pos,
             (start_pos // 512)::BIGINT AS first_window,
             ((start_pos + n_tokens - 1) // 512)::BIGINT AS last_window
      FROM srt ORDER BY doc_id
    """.trim))

  val textFingerprint = Q(
    "text_fingerprint",
    (s, dir) =>
      TextOps.withFingerprint(Tables(s, dir, "documents"), "text")
        .select(col("doc_id"), col("fingerprint"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH n AS (SELECT doc_id, $NormW AS w FROM documents),
      h AS (SELECT doc_id, list_transform(w, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs FROM n)
      SELECT doc_id,
             list_reduce(list_prepend(0::BIGINT, hs), (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
      FROM h ORDER BY doc_id
    """.trim))

  // ---- multimodal --------------------------------------------------------

  val mediaMeta = Q(
    "media_meta",
    (s, dir) => {
      val media = graft.ext.Multimodal.toMediaTable(Tables(s, dir, "documents"))
      media.select(col("doc_id"),
          length(col("media")).cast("long").as("byte_len"),
          upper(substring(hex(col("media")), 1, 16)).as("header_hex"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len,
             upper(substr(hex(encode(text)), 1, 16)) AS header_hex
      FROM documents ORDER BY doc_id
    """.trim))

  /** Perceptual-hash near-duplicate pairs over the media payloads: the
    * byte-grid aHash (8×8 cells of the byte stream, bit = cell mean
    * above stream mean, exact integer cross-product compare) banded by
    * [[graft.ext.Dedup.hammingPairs64]]'s 8×8-bit pigeonhole — every
    * pair within Hamming ≤ 7 shares a band, bit_count(xor) verifies.
    * The REAL image path (decoded PNGs, same grid/compare rule, plus
    * dHash) is [[graft.ext.Multimodal.imagePerceptualHashes]],
    * spec-pinned in Round7Spec on a deterministic PNG corpus — decode
    * can't run in the oracle, the banding/verify machinery is shared
    * and IS oracled here. Note the hit set is honest aHash behavior:
    * the perturbed copies PREPEND bytes, and aHash is
    * translation-sensitive by construction (a shifted image hashes
    * differently too), so only pairs whose cell means survive the
    * 3-byte shift land within Hamming 7 — the propose machinery, not a
    * planted-pair guarantee, is what this query pins.
    */
  /** Shared oracle chain: byte-grid pHash (hi/lo halves) → 8×8-bit
    * pigeonhole band join → verified pairs within Hamming ≤ 7, ending
    * at `ppairs(doc_a, doc_b, hamming)`.
    */
  private def phashPairsCtes: String = s"""${augCte(perturb = true)},
      d AS (SELECT doc_id, text AS t, length(text)::BIGINT AS n,
                   CAST(ceil(length(text) / 64.0) AS INT) AS c
            FROM aug WHERE length(text) >= 1),
      b AS (SELECT doc_id, n, c,
                   list_transform(range(1, n + 1), i -> ascii(substr(t, i, 1))) AS bytes
            FROM d),
      s AS (SELECT doc_id, n, c, bytes, list_sum(bytes)::BIGINT AS total FROM b),
      bits AS (SELECT doc_id,
                 list_transform(range(0, 64), k ->
                   CASE WHEN coalesce(list_sum(list_slice(bytes, k * c + 1, k * c + c)), 0)::BIGINT * n
                           > total * len(list_slice(bytes, k * c + 1, k * c + c))
                        THEN 1::BIGINT ELSE 0::BIGINT END) AS bt
               FROM s),
      h AS (SELECT doc_id,
              list_sum(list_transform(range(0, 32), k -> bt[k + 1] * (1::BIGINT << k)))::BIGINT AS lo,
              list_sum(list_transform(range(0, 32), k -> bt[k + 33] * (1::BIGINT << k)))::BIGINT AS hi
            FROM bits),
      bands AS (SELECT doc_id, hi, lo, unnest(range(8)) AS bnd FROM h),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
               FROM bands a JOIN bands b
                 ON a.bnd = b.bnd
                AND (CASE WHEN a.bnd < 4 THEN (a.lo >> (a.bnd * 8)) & 255
                          ELSE (a.hi >> ((a.bnd - 4) * 8)) & 255 END)
                  = (CASE WHEN b.bnd < 4 THEN (b.lo >> (b.bnd * 8)) & 255
                          ELSE (b.hi >> ((b.bnd - 4) * 8)) & 255 END)
                AND a.doc_id < b.doc_id),
      ppairs AS (SELECT doc_a, doc_b,
                   (bit_count(xor(ha, hb)) + bit_count(xor(la, lb)))::BIGINT AS hamming
                 FROM cand
                 WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 7)"""

  val mediaPhashPairs = Q(
    "media_phash_pairs",
    (s, dir) =>
      graft.ext.Dedup.hammingPairs64(
          graft.ext.Multimodal.bytePHash(
            augmentedDocs(s, dir, perturb = true), "doc_id", "text"),
          "doc_id", maxHamming = 7)
        .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH $phashPairsCtes
      SELECT doc_a, doc_b, hamming FROM ppairs ORDER BY doc_a, doc_b
    """.trim))

  /** Multimodal dedup end-to-end: perceptual-hash propose → connected
    * components → per-doc cluster assignment, the same propose→CC→keep
    * pipeline the text family runs (dedup_clusters), driven by the
    * byte-grid pHash pairs. The STAR-contraction components, not
    * hash-min: hamming-ball graphs are chains (A~B~C with A,C twice as
    * far), so component diameter grows with corpus size and one-hop
    * label propagation needs diameter rounds — at sf0.1 a 28+-hop chain
    * already outran hash-min's budget (caught by this oracle). Star
    * contraction halves long paths every round, O(log n) total. The
    * recursive-CTE oracle recomputes the exact transitive closure, so
    * component assignment — not just the pair set — is pinned.
    */
  /** Build-if-absent the persisted phash cluster assignment (and its
    * per-cluster size table): hash + pigeonhole pairs + star-contraction
    * CC run ONCE per corpus at ingest — the same build/serve split the
    * ANN and BM25 tiers use. Benched three rounds as the slowest query
    * precisely because it recomputed this chain per call.
    */
  def ensurePhashClusters(s: SparkSession, dir: String): (String, String) = {
    val assign = graft.etl.LayoutOps.ensureRunDir(s, dir, "media_phash_clusters") { d =>
      val docs = augmentedDocs(s, dir, perturb = true)
      val pairs = graft.ext.Dedup.hammingPairs64(
        graft.ext.Multimodal.bytePHash(docs, "doc_id", "text"),
        "doc_id", maxHamming = 7)
      Dedup.clusterAssignmentStar(docs, pairs, "doc_id").write.parquet(d)
    }
    val sizes = graft.etl.LayoutOps.ensureRunDir(s, dir, "media_phash_sizes") { d =>
      s.read.parquet(assign).groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members")).write.parquet(d)
    }
    (assign, sizes)
  }

  val mediaPhashClusters = Q(
    "media_phash_clusters",
    (s, dir) => {
      val (assignDir, _) = ensurePhashClusters(s, dir)
      s.read.parquet(assignDir).orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE $phashPairsCtes,
      edges AS (SELECT doc_a AS es, doc_b AS ed FROM ppairs
                UNION SELECT doc_b, doc_a FROM ppairs),
      reach(es, ed) AS (SELECT es, ed FROM edges
                        UNION SELECT r.es, e.ed FROM reach r JOIN edges e ON r.ed = e.es),
      comp AS (SELECT es AS doc_id, min(ed) AS mn FROM reach GROUP BY es)
      SELECT a.doc_id, coalesce(least(c.mn, a.doc_id), a.doc_id) AS cluster_id
      FROM aug a LEFT JOIN comp c USING (doc_id)
      ORDER BY doc_id
    """.trim))

  /** Fixed probe set for the phash serving path: ten originals plus
    * their ten perturbed copies.
    */
  private val PhashProbeIds: Seq[Long] = (0L to 9L) ++ (100000L to 100009L)

  /** Phash cluster SERVING: point lookups against the two persisted
    * ingest artifacts — each probe doc's cluster plus that cluster's
    * member count ("how many near-duplicates does this image have").
    * The probe IN-filter pushes to the assignment parquet scan and the
    * k-row size table joins broadcast: no hashing, no pair join, no CC
    * round ever runs at serve time (the plan touches only the stored
    * tables — Round9Spec asserts no phash kernel in the plan). The
    * oracle replays the full build chain restricted to the probes, so
    * the persisted artifact's CONTENT — not just the lookup — is pinned.
    */
  val mediaPhashServe = Q(
    "media_phash_serve",
    (s, dir) => {
      val (assignDir, sizesDir) = ensurePhashClusters(s, dir)
      s.read.parquet(assignDir)
        .filter(col("doc_id").isInCollection(PhashProbeIds))
        .join(broadcast(s.read.parquet(sizesDir)), "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("n_members"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE $phashPairsCtes,
      edges AS (SELECT doc_a AS es, doc_b AS ed FROM ppairs
                UNION SELECT doc_b, doc_a FROM ppairs),
      reach(es, ed) AS (SELECT es, ed FROM edges
                        UNION SELECT r.es, e.ed FROM reach r JOIN edges e ON r.ed = e.es),
      comp AS (SELECT es AS doc_id, min(ed) AS mn FROM reach GROUP BY es),
      assign AS (SELECT a.doc_id, coalesce(least(c.mn, a.doc_id), a.doc_id) AS cluster_id
                 FROM aug a LEFT JOIN comp c USING (doc_id)),
      sizes AS (SELECT cluster_id, count(*)::BIGINT AS n_members
                FROM assign GROUP BY cluster_id)
      SELECT doc_id, cluster_id, n_members
      FROM assign JOIN sizes USING (cluster_id)
      WHERE doc_id IN (${PhashProbeIds.mkString(", ")})
      ORDER BY doc_id
    """.trim))

  /** Frame sampling over the binary media column: every 128-byte stride
    * keeps its first 64 bytes (Multimodal.sampleFrames — scan-side byte
    * slicing, one row per frame). DuckDB has no blob substring, so the
    * oracle slices the VARCHAR — byte==char because the corpus is pure
    * ASCII at every SF (asserted in ExtOpsSpec); frame md5s then agree.
    */
  val mediaFrames = Q(
    "media_frames",
    (s, dir) => {
      val media = graft.ext.Multimodal.toMediaTable(Tables(s, dir, "documents"))
      graft.ext.Multimodal.sampleFrames(media)
        .select(col("doc_id"), col("frame_no"),
          md5(col("frame")).as("frame_md5"),
          length(col("frame")).cast("long").as("frame_len"))
        .orderBy(col("doc_id"), col("frame_no"))
    },
    Some("""
      WITH f AS (SELECT doc_id, text,
                        unnest(range((length(text) + 127) // 128)) AS frame_no
                 FROM documents WHERE length(text) > 0)
      SELECT doc_id, frame_no,
             md5(substring(text, (frame_no * 128 + 1)::INT, 64)) AS frame_md5,
             length(substring(text, (frame_no * 128 + 1)::INT, 64))::BIGINT AS frame_len
      FROM f ORDER BY doc_id, frame_no
    """.trim))

  /** Capstone training-data pipeline: quality-score the (augmented)
    * corpus, keep only each near-dup cluster's canonical doc, apply
    * quality/length thresholds, and count tokens — the end-to-end
    * corpus-cleaning composition every stage of which is an
    * oracle-checked operator above. Canonical selection reads the
    * ingest-staged cluster assignment (`ensureAugClusters` — the
    * dedup_canonical_quality pattern; r16: the live re-shingle + CC
    * rounds were ~35 of this query's 43 measured jobs, and a production
    * clean consumes the ingest dedup pass's output rather than
    * re-clustering per run); `pipeline_dedup_cascade` keeps pricing the
    * live exact→minhash→CC pipeline. Quality/token scoring stays
    * scan-side — one corpus text scan plus a semi join. The oracle
    * still replays the FULL chain (minhash CTEs + recursive-CTE
    * components), so a stale staged assignment hash-reds here.
    */
  val pipelineCorpusClean = Q(
    "pipeline_corpus_clean",
    (s, dir) => {
      val docs = augmentedDocs(s, dir, perturb = true)
      val canonical = s.read.parquet(Breadth20.ensureAugClusters(s, dir))
        .filter(col("doc_id") === col("cluster_id")).select("doc_id")
      val scored = TextOps.withTokenCounts(TextOps.withQuality(docs, "text"), "text")
      scored.join(canonical, Seq("doc_id"), "left_semi")
        .filter(col("quality") >= 0.5 && col("n_words") >= 10)
        .select(col("doc_id"), col("n_words"), col("quality"), col("bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE $minhashPairsCtes,
      edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(s, d) AS (SELECT s, d FROM edges
                      UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
      comp AS (SELECT s AS doc_id, min(d) AS mn FROM reach GROUP BY s),
      canon AS (SELECT a.doc_id FROM aug a LEFT JOIN comp c USING (doc_id)
                WHERE coalesce(least(c.mn, a.doc_id), a.doc_id) = a.doc_id),
      nq AS (SELECT doc_id, text, $NormW AS w FROM aug),
      m AS (SELECT doc_id, text,
              len(w)::BIGINT AS n_words,
              length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE / len(w) AS avg_word_len,
              length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio,
              ${sqlHits(TextOps.StopEn)}::DOUBLE / len(w) AS stop_ratio
            FROM nq),
      sc AS (SELECT doc_id, n_words,
               round(least(avg_word_len / 8.0, 1.0) * 0.4
                     + least(stop_ratio * 5.0, 1.0) * 0.4
                     + (1.0 - punct_ratio) * 0.2, 9) AS quality,
               len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS bpe_tokens
             FROM m)
      SELECT sc.doc_id, sc.n_words, sc.quality, sc.bpe_tokens
      FROM sc JOIN canon USING (doc_id)
      WHERE sc.quality >= 0.5 AND sc.n_words >= 10
      ORDER BY doc_id
    """.trim))

  /** TF-IDF keyword extraction, top-3 terms per doc. Integer-only
    * ranking (tf desc, term asc); the score rounds once to 9 dp.
    */
  val textTfidf = Q(
    "text_tfidf",
    (s, dir) =>
      graft.ext.TextOps.tfIdfTopK(Tables(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rn")),
    Some(s"""
      WITH norm AS (SELECT doc_id, $NormW AS w FROM documents),
      t AS (SELECT doc_id, unnest(w) AS term FROM norm),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
      dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df_docs,
               round(tf.tf * ln((n.n_docs + 1)::DOUBLE / (dfq.df_docs + 1)), 9) AS tfidf,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf DESC, tf.term) AS rn
             FROM tf JOIN dfq USING (term) CROSS JOIN n)
      SELECT doc_id, rn, term, tf, df_docs, tfidf FROM sc WHERE rn <= 3
      ORDER BY doc_id, rn
    """.trim))

  /** Per-cluster rollup shared by the two k-means queries: exact
    * decimal mean of the (already 9 dp) similarity, one double division.
    */
  private def kmeansRollup(assigned: org.apache.spark.sql.DataFrame) =
    assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        (sum(col("sim").cast(org.apache.spark.sql.types.DecimalType(15, 9)))
          .cast("double") / count(lit(1))).as("avg_sim"))
      .orderBy(col("cluster"))

  /** K-means assignment step (coarse quantization as a first-class op):
    * every embedding goes to its most cosine-similar seed centroid
    * (seeds = every 250th vector — deterministic, model-input-like).
    * Reported as per-cluster size + exact-decimal mean similarity.
    */
  val annKmeansAssign = Q(
    "ann_kmeans_assign",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cent = emb.filter(col("vec_id") % 250 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      kmeansRollup(Similarity.kmeansAssign(s, emb, cent,
        "vec_id", "embedding", "cid", "cv"))
    },
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 250 = 0 AND vec_id < 5000),
      a AS (SELECT vec_id, cid, sim,
                   row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
            FROM (SELECT e.vec_id, c.cid, ${sqlCos("e.embedding", "c.cv")} AS sim
                  FROM embeddings e, cent c))
      SELECT cid AS cluster, count(*) AS n,
             CAST(sum(CAST(sim AS DECIMAL(15,9))) AS DOUBLE) / count(*) AS avg_sim
      FROM a WHERE rn = 1 GROUP BY 1 ORDER BY 1
    """.trim))

  /** One Lloyd iteration on top of the seed assignment: centroids
    * recompute as element-wise means (9 dp elements summed as exact
    * DECIMAL — double summation order would diverge between engines and
    * partitionings — then one double division), and vectors reassign
    * against the new centroids. The full iterative k-means is this
    * round driver-looped to convergence; one round exercises the whole
    * dataflow (assign shuffle → k×dims aggregate → broadcast reassign).
    */
  val annKmeansIter = Q(
    "ann_kmeans_iter",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cent = emb.filter(col("vec_id") % 250 === 0 && col("vec_id") < 5000)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      kmeansRollup(Similarity.kmeansLloydRound(s, emb, "vec_id", "embedding",
        cent, "cid", "cv"))
    },
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 250 = 0 AND vec_id < 5000),
      a0 AS (SELECT vec_id, embedding, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             FROM (SELECT e.vec_id, e.embedding, c.cid, ${sqlCos("e.embedding", "c.cv")} AS sim
                   FROM embeddings e, cent c)),
      asg AS (SELECT vec_id, embedding, cid FROM a0 WHERE rn = 1),
      el AS (SELECT cid, unnest(embedding)::DOUBLE AS x,
                    unnest(range(len(embedding))) AS dim
             FROM asg),
      cm AS (SELECT cid, dim,
                    CAST(sum(CAST(round(x, 9) AS DECIMAL(27,9))) AS DOUBLE) / count(*) AS v
             FROM el GROUP BY cid, dim),
      c1 AS (SELECT cid, list(v ORDER BY dim) AS cv FROM cm GROUP BY cid),
      a1 AS (SELECT vec_id, cid, sim,
                    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
             FROM (SELECT e.vec_id, c.cid, ${sqlCos("e.embedding", "c.cv")} AS sim
                   FROM embeddings e, c1 c))
      SELECT cid AS cluster, count(*) AS n,
             CAST(sum(CAST(sim AS DECIMAL(15,9))) AS DOUBLE) / count(*) AS avg_sim
      FROM a1 WHERE rn = 1 GROUP BY 1 ORDER BY 1
    """.trim))

  /** PII redaction audit over a corpus with synthetic injected contact
    * spans (the raw corpus is clean; the injection is the deterministic
    * test vector, identical in both engines).
    */
  val textPiiRedact = Q(
    "text_pii_redact",
    (s, dir) => {
      val aug = Tables(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail.example.com or +1-555-"),
          lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0")).as("text"))
      graft.ext.TextOps.redactPii(aug, "doc_id", "text")
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH aug AS (SELECT doc_id,
                          text || ' contact user' || doc_id || '@mail.example.com or +1-555-' ||
                          lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') AS text
                   FROM documents),
      r AS (SELECT doc_id, lower(text) AS t FROM aug)
      SELECT doc_id,
             len(regexp_extract_all(t, '${graft.ext.TextOps.EmailRe}'))::BIGINT AS n_emails,
             len(regexp_extract_all(t, '${graft.ext.TextOps.PhoneRe}'))::BIGINT AS n_phones,
             md5(regexp_replace(regexp_replace(t, '${graft.ext.TextOps.EmailRe}', '<EMAIL>', 'g'),
                 '${graft.ext.TextOps.PhoneRe}', '<PHONE>', 'g')) AS redacted_md5
      FROM r ORDER BY doc_id
    """.trim))

  /** Cross-corpus boilerplate share: 4-word chunk digests counted
    * corpus-wide; per doc the fraction of chunks duplicated elsewhere
    * (the repetition signal crawl-data filters cut on).
    */
  val textChunkDedup = Q(
    "text_chunk_dedup",
    (s, dir) =>
      graft.ext.TextOps.chunkDupStats(Tables(s, dir, "documents"),
          "doc_id", "text", chunkWords = 4)
        .orderBy(col("doc_id")),
    Some(s"""
      WITH norm AS (SELECT doc_id, $NormW AS w FROM documents),
      ch AS (SELECT doc_id,
                    md5(array_to_string(w[c*4+1 : c*4+4], ' ')) AS chunk_md5
             FROM (SELECT doc_id, w, unnest(range(len(w) // 4)) AS c FROM norm
                   WHERE len(w) // 4 >= 1)),
      freq AS (SELECT chunk_md5, count(*) AS corpus_n FROM ch GROUP BY chunk_md5)
      SELECT doc_id, count(*) AS n_chunks,
             sum(CASE WHEN corpus_n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
             sum(CASE WHEN corpus_n > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*) AS dup_ratio
      FROM ch JOIN freq USING (chunk_md5)
      GROUP BY doc_id ORDER BY doc_id
    """.trim))

  /** CCNet-style unigram LM quality score: per-doc mean −ln p(w) under
    * add-1-smoothed corpus counts. Per-term ln rounds to 9 dp, the mean
    * sums DECIMAL(27,9) (order-independent), one double division,
    * round 6 — so the oracle matches despite the transcendental.
    */
  val textLmScore = Q(
    "text_lm_score",
    (s, dir) =>
      graft.ext.TextOps.lmScore(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some(s"""
      WITH norm AS (SELECT doc_id, $NormW AS w FROM documents),
      t AS (SELECT doc_id, unnest(w) AS term FROM norm),
      f AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
      g AS (SELECT sum(cnt) + count(*) AS denom FROM f)
      SELECT doc_id, count(*) AS n_words,
             round(CAST(sum(CAST(round(-ln((cnt + 1)::DOUBLE / denom), 9)
                              AS DECIMAL(27,9))) AS DOUBLE) / count(*), 6) AS avg_nll
      FROM t JOIN f USING (term) CROSS JOIN g
      GROUP BY doc_id ORDER BY doc_id
    """.trim))

  /** Gopher-style repetition filter input: per-doc duplicate-trigram
    * fraction, pure scan-side.
    */
  val textRepetition = Q(
    "text_repetition",
    (s, dir) =>
      graft.ext.TextOps.withRepetition(Tables(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_ngrams"), col("n_distinct"), col("rep_ratio"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH norm AS (SELECT doc_id, $NormW AS w FROM documents),
      g AS (SELECT doc_id,
              CASE WHEN len(w) >= 3
                   THEN list_transform(range(len(w) - 2),
                          i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
                   ELSE []::VARCHAR[] END AS sh
            FROM norm)
      SELECT doc_id, len(sh)::BIGINT AS n_ngrams,
             len(list_distinct(sh))::BIGINT AS n_distinct,
             CASE WHEN len(sh) > 0
                  THEN round(1.0 - len(list_distinct(sh))::DOUBLE / len(sh), 9)
                  ELSE 0.0 END AS rep_ratio
      FROM g ORDER BY doc_id
    """.trim))

  /** Benchmark decontamination over a synthetic leak: the corpus is the
    * perturbed copy of every document, the "benchmark" is every 97th
    * original — each benchmark doc's copy must surface as a
    * contaminated pair (≥10 shared 8-grams despite the "xx " prefix
    * shifting the leading shingles). Oracle replays the same set math
    * over shingle strings.
    */
  val textDecontaminate = Q(
    "text_decontaminate",
    (s, dir) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = d.filter(col("doc_id") % 97 === 0)
      val corpus = d.select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("xx "), col("text")).as("text"))
      graft.ext.TextOps.contaminationPairs(corpus, bench, "doc_id", "text",
          n = 8, minOverlap = 10)
        .orderBy(col("doc_id"), col("bench_id"))
    },
    Some(s"""
      WITH norm AS (SELECT doc_id, $NormW AS w FROM documents),
      bench AS (SELECT doc_id AS bench_id,
                  list_distinct(list_transform(range(len(w) - 7),
                    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] ||
                         ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] || ' ' || w[i+8])) AS s
                FROM norm WHERE len(w) >= 8 AND doc_id % 97 = 0),
      corpn AS (SELECT doc_id + 100000 AS doc_id,
                  string_split(regexp_replace(trim(lower('xx ' || text)), '\\s+', ' ', 'g'), ' ') AS w
                FROM documents),
      corp AS (SELECT doc_id,
                 list_distinct(list_transform(range(len(w) - 7),
                   i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] ||
                        ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] || ' ' || w[i+8])) AS s
               FROM corpn WHERE len(w) >= 8),
      p AS (SELECT c.doc_id, b.bench_id,
              len(list_filter(c.s, x -> list_contains(b.s, x)))::BIGINT AS n_shared
            FROM corp c CROSS JOIN bench b)
      SELECT doc_id, bench_id, n_shared FROM p
      WHERE n_shared >= 10 ORDER BY doc_id, bench_id
    """.trim))

  /** The bloom-pre-filtered twin of `text_decontaminate`: same synthetic
    * leak, same exact answer (the oracle is literally the exact SQL),
    * but candidacy is decided by a scan-side bloom probe instead of
    * joining every corpus shingle — at 100 TB the difference between
    * probing a literal bitset and streaming the whole corpus's postings
    * through a broadcast hash join. The no-false-negative prune and the
    * frame equality with the exact operator are pinned in ExtOpsSpec.
    */
  val textBloomDecontaminate = Q(
    "text_bloom_decontaminate",
    (s, dir) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = d.filter(col("doc_id") % 97 === 0)
      val corpus = d.select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("xx "), col("text")).as("text"))
      graft.ext.TextOps.bloomContaminationPairs(corpus, bench, "doc_id", "text",
          n = 8, minOverlap = 10)
        .orderBy(col("doc_id"), col("bench_id"))
    },
    Some(s"""
      WITH norm AS (SELECT doc_id, $NormW AS w FROM documents),
      bench AS (SELECT doc_id AS bench_id,
                  list_distinct(list_transform(range(len(w) - 7),
                    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] ||
                         ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] || ' ' || w[i+8])) AS s
                FROM norm WHERE len(w) >= 8 AND doc_id % 97 = 0),
      corpn AS (SELECT doc_id + 100000 AS doc_id,
                  string_split(regexp_replace(trim(lower('xx ' || text)), '\\s+', ' ', 'g'), ' ') AS w
                FROM documents),
      corp AS (SELECT doc_id,
                 list_distinct(list_transform(range(len(w) - 7),
                   i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] ||
                        ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] || ' ' || w[i+8])) AS s
               FROM corpn WHERE len(w) >= 8),
      p AS (SELECT c.doc_id, b.bench_id,
              len(list_filter(c.s, x -> list_contains(b.s, x)))::BIGINT AS n_shared
            FROM corp c CROSS JOIN bench b)
      SELECT doc_id, bench_id, n_shared FROM p
      WHERE n_shared >= 10 ORDER BY doc_id, bench_id
    """.trim))

  /** Corpus-global line dedup over a deterministically "lined" corpus:
    * the raw documents carry no newlines, so the test vector injects the
    * crawl-boilerplate shape — a cookie banner above every 7th doc, a
    * rights footer below every 3rd, a newsletter line below every 5th
    * (each appearing in far more than `minDocs`=10 documents, while
    * every doc's own text line stays rare). The op must drop exactly
    * the injected boilerplate and reassemble each document's surviving
    * lines in order — pinned by the cleaned-text md5.
    */
  val textLineDedup = Q(
    "text_line_dedup",
    (s, dir) => {
      val lined = Tables(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 7 === 0, lit("cookie consent banner text\n"))
            .otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 3 === 0, lit("\nall rights reserved site footer"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("\nsubscribe to the newsletter today"))
            .otherwise(lit(""))).as("text"))
      graft.ext.TextOps.lineDedupGlobal(lined, "doc_id", "text", minDocs = 10)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH lined AS (SELECT doc_id,
             (CASE WHEN doc_id % 7 = 0 THEN 'cookie consent banner text' || chr(10) ELSE '' END) ||
             text ||
             (CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'all rights reserved site footer' ELSE '' END) ||
             (CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'subscribe to the newsletter today' ELSE '' END) AS text
           FROM documents),
      ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM lined),
      l AS (SELECT doc_id, i AS pos,
              regexp_replace(trim(lower(a[i+1])), '\\s+', ' ', 'g') AS norm
            FROM (SELECT doc_id, a, unnest(range(len(a))) AS i FROM ls)),
      f AS (SELECT md5(norm) AS h, count(*) AS n FROM l GROUP BY 1),
      k AS (SELECT doc_id, pos, norm, (n < 10) AS kept
            FROM l JOIN f ON md5(l.norm) = f.h)
      SELECT doc_id, count(*)::BIGINT AS n_lines,
             sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
             md5(array_to_string(list(norm ORDER BY pos) FILTER (WHERE kept),
                 chr(10))) AS cleaned_md5
      FROM k GROUP BY doc_id ORDER BY doc_id
    """.trim))

  /** Gopher-family document quality rules with per-rule audit flags;
    * thresholds tuned so each rule actually discriminates on this
    * corpus (minWords=30 splits the word-count distribution, the
    * stop-word rule splits English from the other languages).
    */
  val textGopherRules = Q(
    "text_gopher_rules",
    (s, dir) =>
      graft.ext.TextOps.gopherRules(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some {
      val stops = TextOps.StopEn.map(w => s"'$w'").mkString(", ")
      s"""
      WITH n AS (SELECT doc_id, $NormW AS w,
                   len(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS nc
                 FROM documents),
      b AS (SELECT doc_id, len(w)::BIGINT AS n_words,
              (nc - (len(w) - 1))::BIGINT AS n_word_chars,
              len(list_filter([$stops], s -> list_contains(w, s)))::BIGINT AS n_stop_distinct
            FROM n)
      SELECT doc_id, n_words, n_word_chars,
             round(n_word_chars::DOUBLE / n_words, 9) AS mean_wlen,
             n_stop_distinct,
             (CASE WHEN n_words >= 30 AND n_words <= 100000 THEN 1 ELSE 0 END)::BIGINT AS flag_words,
             (CASE WHEN n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words THEN 1 ELSE 0 END)::BIGINT AS flag_wlen,
             (CASE WHEN n_stop_distinct >= 2 THEN 1 ELSE 0 END)::BIGINT AS flag_stop,
             (CASE WHEN n_words >= 30 AND n_words <= 100000 THEN 1 ELSE 0 END)::BIGINT *
             (CASE WHEN n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words THEN 1 ELSE 0 END)::BIGINT *
             (CASE WHEN n_stop_distinct >= 2 THEN 1 ELSE 0 END)::BIGINT AS keep
      FROM b ORDER BY doc_id
    """.trim
    })

  /** Exact-substring duplicate spans at n=5 (the probe showed 71/500
    * docs carry a repeated 5-gram at sf0.01 — real discrimination, not
    * a constant column). The oracle replays gram STRINGS where the
    * Spark path hashes scan-side (the decontaminate precedent: the
    * 64-bit shingle kernel is collision-free at these corpus sizes, and
    * the ExtOpsSpec equality test pins kernel-vs-string agreement).
    */
  val textRepeatedSpans = Q(
    "text_repeated_spans",
    (s, dir) =>
      graft.ext.TextOps.repeatedSpans(Tables(s, dir, "documents"),
          "doc_id", "text", n = 5)
        .orderBy(col("doc_id")),
    Some(s"""
      WITH norm AS (SELECT doc_id, $NormW AS w FROM documents),
      g AS (SELECT doc_id, i AS pos,
              w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] AS gram
            FROM (SELECT doc_id, w, unnest(range(len(w) - 4)) AS i FROM norm
                  WHERE len(w) >= 5)),
      f AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      fl AS (SELECT doc_id, count(*)::BIGINT AS n_dup_grams,
               list_sort(list(pos)) AS ps
             FROM g JOIN f USING (gram) GROUP BY doc_id),
      sp AS (SELECT doc_id, n_dup_grams,
               (len(list_filter(list_transform(range(1, len(ps)),
                    i -> ps[i+1] - ps[i]), d -> d > 5)) + 1)::BIGINT AS n_spans,
               (coalesce(list_sum(list_transform(list_transform(range(1, len(ps)),
                    i -> ps[i+1] - ps[i]), d -> least(d, 5))), 0) + 5)::BIGINT AS dup_words
             FROM fl),
      base AS (SELECT doc_id, len(w)::BIGINT AS n_words,
                 greatest(len(w) - 4, 0)::BIGINT AS n_grams FROM norm)
      SELECT doc_id, n_words, n_grams,
             coalesce(n_dup_grams, 0)::BIGINT AS n_dup_grams,
             coalesce(n_spans, 0)::BIGINT AS n_spans,
             coalesce(dup_words, 0)::BIGINT AS dup_words,
             round(coalesce(dup_words, 0)::DOUBLE / n_words, 9) AS dup_ratio
      FROM base LEFT JOIN sp USING (doc_id) ORDER BY doc_id
    """.trim))

  /** DSIR importance weights with English as the target distribution —
    * the oracle replays the hashed-bucket counts, the add-1 smoothing,
    * and the 9-dp/DECIMAL transcendental contract end to end.
    */
  val textDsirWeights = Q(
    "text_dsir_weights",
    (s, dir) =>
      graft.ext.TextOps.dsirWeights(Tables(s, dir, "documents"),
          "doc_id", "text", col("lang") === "en", buckets = 1024)
        .orderBy(col("doc_id")),
    Some(s"""
      WITH t AS (SELECT doc_id, (lang = 'en') AS tf, unnest($NormW) AS term
                 FROM documents),
      b AS (SELECT doc_id, tf,
              ('0x' || substr(md5(term), 1, 8))::BIGINT % 1024 AS bk
            FROM t),
      c AS (SELECT bk, count(*)::BIGINT AS cr,
              sum(CASE WHEN tf THEN 1 ELSE 0 END)::BIGINT AS ct
            FROM b GROUP BY bk),
      g AS (SELECT (sum(cr) + 1024)::DOUBLE AS dr,
                   (sum(ct) + 1024)::DOUBLE AS dt FROM c),
      lam AS (SELECT bk,
                CAST(round(ln((ct + 1)::DOUBLE / dt), 9) AS DECIMAL(27,9)) -
                CAST(round(ln((cr + 1)::DOUBLE / dr), 9) AS DECIMAL(27,9)) AS l
              FROM c CROSS JOIN g)
      SELECT doc_id, count(*)::BIGINT AS n_words,
             round(CAST(sum(l) AS DOUBLE), 6) AS dsir_logw
      FROM b JOIN lam USING (bk) GROUP BY doc_id ORDER BY doc_id
    """.trim))

  /** Dataset card: the one-row corpus summary a data release ships with
    * — sizes, language spread, exact-dup mass, token stats, short-doc
    * share. One scan, one aggregate (the multi-distinct plans a single
    * Expand); every ratio is an exact integer sum with one double
    * division, the median is interpolated identically in both engines.
    */
  val pipelineDatasetCard = Q(
    "pipeline_dataset_card",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val base = d.select(col("lang"), col("n_chars"),
        size(graft.ext.TextOps.words(col("text"))).cast("long").as("__nw"),
        md5(graft.ext.Dedup.normText(col("text"))).as("__h"))
      base.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("__h"))).as("n_exact_dups"),
        sum(col("__nw")).as("total_words"),
        round(sum(col("__nw")).cast("double") / count(lit(1)), 9).as("avg_words"),
        expr("percentile(__nw, 0.5)").as("p50_words"),
        round(sum(when(col("__nw") < 20, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 9).as("short_share"),
        sum(col("n_chars")).as("total_chars"))
    },
    Some(s"""
      WITH b AS (SELECT lang, n_chars, len($NormW) AS nw,
                        md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
                 FROM documents)
      SELECT count(*)::BIGINT AS n_docs,
             count(DISTINCT lang)::BIGINT AS n_langs,
             (count(*) - count(DISTINCT h))::BIGINT AS n_exact_dups,
             sum(nw)::BIGINT AS total_words,
             round(sum(nw) / count(*), 9) AS avg_words,
             quantile_cont(nw, 0.5) AS p50_words,
             round(sum(CASE WHEN nw < 20 THEN 1 ELSE 0 END) / count(*), 9) AS short_share,
             sum(n_chars)::BIGINT AS total_chars
      FROM b ORDER BY n_docs
    """.trim))

  def all: Seq[Q] = Seq(
    dedupExact, dedupMinhash, dedupStreamPairs, dedupClusters, dedupClustersStar,
    dedupSimhash, dedupSimhashPairs,
    dedupJaccard, dedupJaccardLsh, dedupIndexProbe, dedupIndexAttach,
    dedupEmbedding, dedupSemantic, dedupFuzzy,
    annBrute, annLsh, annIvf, annIvfQuantized, annIndexServe, annPq, annIvfPq,
    annIvfPqServe, annRerankExact, annIndexMerge, annRangeSearch,
    annFilteredTopk, annKmeansAssign, annKmeansIter, annQuantize,
    annQuantizedTopk,
    textLangid, textLangidTrigram, textQuality, textTokens, textSubwordTokens,
    textMixtureTemperature, textTokenFertility,
    textPackSubword, textFingerprint, textTfidf,
    textPiiRedact, textChunkDedup, textRepetition, textDecontaminate,
    textBloomDecontaminate, textLmScore,
    textLineDedup, textGopherRules, textDsirWeights, textRepeatedSpans,
    mediaMeta, mediaFrames, mediaPhashPairs, mediaPhashClusters, mediaPhashServe,
    pipelineCorpusClean, pipelineDatasetCard)
}
