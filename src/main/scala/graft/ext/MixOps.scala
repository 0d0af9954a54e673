package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental twin of the training-mix capstone
  * (`pipeline_training_mix`): a daily pipeline does not re-scan the
  * whole corpus — it gates and hashes TODAY'S delta, merges it into a
  * compact standing state, and re-derives the manifest from that state.
  *
  * The state is the exact-dedup keep set: one row per distinct content
  * hash carrying the kept representative `(doc_id, lang, n_words)` —
  * the min-doc-id survivor, which is a MERGEABLE aggregate (min of
  * mins), so batch-by-batch folding provably equals the one-shot
  * computation (the CMS/k-means/PSI merge-is-addition argument, pinned
  * bit-equal in Round11Spec). Everything downstream of the state —
  * per-lang sufficient statistics, temperature weights, epoch explode,
  * shard manifest — is a deterministic pure function of the keep set,
  * so it re-derives identically however the corpus arrived.
  *
  * Scale economics: the corpus-scale work (Gopher gating + content
  * hashing, the only TEXT scans) runs on the delta alone; the state
  * holds no text — ~40 bytes per DISTINCT kept document — and the
  * manifest rebuild is one aggregate pass over it. At 100 TB/day of
  * raw crawl the delta scan is the bill; the state march is the
  * standing dedup index every ingest already maintains.
  */
object MixOps {

  /** Gate + hash one batch into keep-state rows:
    * (content_hash, doc_id, lang, n_words) for each batch-local
    * minimal survivor. `docs` needs (doc_id, lang, text). The gate is
    * the per-language Gopher rule set (round 11), identical to the
    * batch capstone's.
    */
  def mixStateOfBatch(docs: DataFrame): DataFrame = {
    val gated = TextOps.gopherRulesByLang(docs, "doc_id", "text", "lang")
      .filter(col("keep") === 1)
      .select(col("doc_id"), col("n_words"))
    docs.select(col("doc_id"), col("lang"), col("text"))
      .join(gated, "doc_id")
      .select(md5(Dedup.normText(col("text"))).as("content_hash"),
        col("doc_id"), col("lang"), col("n_words"))
      .groupBy(col("content_hash"))
      .agg(min(struct(col("doc_id"), col("lang"), col("n_words"))).as("__r"))
      .select(col("content_hash"), col("__r.doc_id").as("doc_id"),
        col("__r.lang").as("lang"), col("__r.n_words").as("n_words"))
  }

  /** Merge two keep-states: per content hash, the min-doc-id
    * representative wins (associative + commutative, so any batch
    * arrival order folds to the same state). One hash-keyed shuffle
    * over state rows — no text, no re-scan.
    */
  def mergeMixState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("content_hash"))
      .agg(min(struct(col("doc_id"), col("lang"), col("n_words"))).as("__r"))
      .select(col("content_hash"), col("__r.doc_id").as("doc_id"),
        col("__r.lang").as("lang"), col("__r.n_words").as("n_words"))

  /** Re-derive the per-(lang, shard) manifest from a keep-state —
    * temperature mixture (α), epoch materialization (cap), 16-way
    * (doc, epoch)-hashed shards, exactly the batch capstone's tail.
    * Weights re-solve on every call because a delta changes the
    * per-lang shares GLOBALLY (every doc's boost can move); that
    * re-solve costs one aggregate over the compact state, not a corpus
    * scan — which is the entire point of keeping sufficient state.
    */
  def mixManifest(state: DataFrame, alpha: Double = 0.3,
      maxEpochs: Int = 4): DataFrame = {
    val kept = state.select(col("doc_id"), col("lang"), col("n_words"))
    val wts = graft.etl.SampleOps.temperatureWeights(kept, "lang", alpha)
      .select(col("lang"), col("boost"))
    graft.etl.SampleOps.epochMaterialize(
        kept.join(broadcast(wts), "lang"), "doc_id", "boost", maxEpochs)
      .withColumn("shard",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("epoch").cast("string"))), 1, 8), 16, 10).cast("long") % 16)
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_words")).as("n_tokens"))
  }
}
