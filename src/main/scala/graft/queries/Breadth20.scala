package graft.queries

import graft.etl.Tables
import org.apache.spark.sql.functions._

/** Round-12 wave: multi-pass ER blocking as a first-class verified-pairs
  * product, plus the round's breadth additions.
  */
object Breadth20 {

  /** Verified pairs from the TWO-PASS capped blocking propose
    * ([[graft.ext.EntityOps.multiPassNamePairs]]) over the full
    * three-typo-class fixture — the production record-linkage propose
    * `eval_er_quality` measures. Pass 1 is the suffix key (covers the
    * prefix typo classes: deletion, transposition); pass 2 is the
    * all-but-last-char key (covers exactly the suffix-substitution
    * class pass 1 is structurally blind to — the r11 eval measured it
    * at recall 0 AND precision 0). Proposals union + distinct BEFORE
    * the levenshtein, so a pair proposed by both passes is verified
    * once; each pass keeps its own loud 64-record block cap, so total
    * kept-pair volume is bounded by the SUM of the per-pass
    * n·(cap−1)/2 bounds — linear in corpus size. The output includes
    * the corpus-forced serial-neighbor pairs (names one substitution
    * apart genuinely exist within each last-char-blind block); the
    * eval's base_pair row prices that trade explicitly.
    */
  val erMultipassPairs = Q(
    "er_multipass_pairs",
    (s, dir) =>
      graft.ext.EntityOps.multiPassNamePairs(
          Breadth11.erRecordsD3(s, dir), "c_custkey", "c_name",
          Seq(expr("right(c_name, 5)"),
            expr("substring(c_name, 1, length(c_name) - 1)")),
          maxDist = 2, maxBlock = 64)
        .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH ${Breadth11.erRecordsD3Ctes},
      ${Breadth11.erMultiPassCandCtes}
      SELECT id_a, id_b, na AS name_a, nb AS name_b,
             levenshtein(na, nb)::BIGINT AS dist
      FROM cand WHERE levenshtein(na, nb) <= 2
      ORDER BY id_a, id_b
    """.trim))

  /** Incremental near-dup twin — the MinHash family joins the
    * exact-dedup keep-state recipe ([[graft.ext.Dedup.minhashPairsOfBatch]]):
    * the corpus arrives as two deterministic batches (md5-hash split),
    * each batch is fingerprinted ONCE into the standing band-index
    * state, and each landing emits exactly the candidate pairs it
    * completes (delta×state + delta×delta). The ORACLE replays the
    * ONE-SHOT batch LSH pipeline over the full corpus — so the driver's
    * hash gate re-proves march == one-shot (the mergeable-state
    * theorem) on every round, the same contract `u2_merge_upsert` and
    * the CMS/k-means merges pin. The delta batch never re-shingles old
    * docs: batch 2's text is the only text read at step 2; batch 1
    * contributes band keys from its state rows alone.
    */
  val dedupIncrementalPairs = Q(
    "dedup_incremental_pairs",
    (s, dir) => {
      import graft.ext.Dedup
      val docs = Extensions.augmentedDocs(s, dir, perturb = true)
      val split = Dedup.hash32(col("doc_id").cast("string")) % 2
      val s1 = Dedup.buildBandIndex(docs.filter(split === 0), "doc_id", "text")
        .localCheckpoint()
      val s2 = Dedup.buildBandIndex(docs.filter(split =!= 0), "doc_id", "text")
        .localCheckpoint()
      val batch1 = Dedup.minhashPairsOfBatch(s1.limit(0), s1, "doc_id")
      val batch2 = Dedup.minhashPairsOfBatch(s1, s2, "doc_id")
      batch1.unionByName(batch2).distinct()
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH ${Extensions.minhashPairsCtes}
      SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
    """.trim))

  val all: Seq[Q] = Seq(erMultipassPairs, dedupIncrementalPairs)
}
