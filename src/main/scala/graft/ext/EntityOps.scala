package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution — the record-linkage product: blocking-key
  * propose (with a LOUD block-size cap), edit-distance verify, and the
  * mastered entity table (pairs → connected components → quality
  * canonical). Extends the dedup propose-then-verify family from
  * near-duplicate TEXT to dirty RECORDS; the scale rules are
  * identical: never all-pairs, every propose stage carries an explicit
  * bound, dropped coverage is reported, not silent.
  */
object EntityOps {

  /** Candidate pairs from a blocking key, verified by exact
    * levenshtein ≤ `maxDist` — run ONLY on block-local candidates,
    * never the n² space.
    *
    * The blocking self-join is quadratic WITHIN a block, so a skewed
    * blocking key (a common surname suffix, a null-ish name) makes one
    * block corpus-sized at web scale. `maxBlock` is the loud bound:
    * blocks holding more than `maxBlock` records are EXCLUDED from the
    * propose entirely (the same explicit-coverage contract as
    * [[Dedup.containmentPairs]]'s df cap — a too-common blocking key
    * carries no linkage signal, exactly as a too-common shingle carries
    * no containment signal) and surface via [[oversizedBlocks]], the
    * dropped-coverage report a production run logs and alarms on.
    * Kept-pair volume is then ≤ n·(maxBlock−1)/2 — linear in corpus
    * size with a maxBlock constant, measured at the ScaleSmoke pair
    * tier.
    *
    * Records with a NULL blocking key never pair (a null block is the
    * classic corpus-sized skew bucket); they surface as singleton
    * entities downstream. One shuffle on the block key serves the
    * size-count join AND the self-join — the partitioning is reused.
    */
  def blockedNamePairs(records: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int, maxBlock: Int = 64): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    verify(blockedCandidates(records, idCol, nameCol, blockKey, maxBlock),
      maxDist)
  }

  /** One capped blocking pass: the UNVERIFIED candidate pairs. Factored
    * out of [[blockedNamePairs]] so [[multiPassNamePairs]] can union
    * several independent passes and dedup BEFORE the (per-candidate
    * priced) levenshtein verify.
    */
  private def blockedCandidates(records: DataFrame, idCol: String,
      nameCol: String, blockKey: Column, maxBlock: Int): DataFrame = {
    require(maxBlock >= 2, s"maxBlock must be at least 2, got $maxBlock")
    // blockKey resolves against `records`' own columns, so evaluate it
    // BEFORE the rename
    val recs = records
      .select(col(idCol).as("__id"), col(nameCol).as("__nm"),
        blockKey.as("__blk"))
      .filter(col("__blk").isNotNull)
    val keptBlocks = recs.groupBy(col("__blk"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBlock)
      .select(col("__blk"))
    val bounded = recs.join(keptBlocks, Seq("__blk"))
    val a = bounded.select(col("__blk"), col("__id").as("id_a"),
      col("__nm").as("name_a"))
    val b = bounded.select(col("__blk"), col("__id").as("id_b"),
      col("__nm").as("name_b"))
    a.join(b, Seq("__blk")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
  }

  private def verify(candidates: DataFrame, maxDist: Int): DataFrame =
    candidates
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))

  /** Multi-pass blocking: the UNION of several independent capped
    * blocking passes, deduped, then verified ONCE per unique candidate
    * — the production record-linkage shape. A single blocking key has a
    * structural blind spot (the eval_er_quality finding: a suffix key
    * cannot propose a suffix typo — recall 0 AND precision 0 on that
    * whole class), and edit-distance verification cannot repair
    * candidate generation; the fix is always MORE independent passes,
    * each with its own loud per-pass cap, never a looser verify.
    *
    * Scale shape: each pass is one shuffle on its own key with kept-pair
    * volume ≤ n·(maxBlock−1)/2 (the [[blockedNamePairs]] bound), so the
    * union is bounded by the SUM of per-pass bounds — still linear in n
    * with a passes×maxBlock constant. The distinct runs BEFORE the
    * levenshtein so a pair proposed by k passes is verified once.
    *
    * Honest limit this surfaces on serial-ID corpora (Customer#000…):
    * any key insensitive to the last character — which suffix-typo
    * coverage REQUIRES, since the key must be invariant under a
    * last-char edit — maps `…500` and `…501` to the same block by
    * construction, and their names genuinely ARE one substitution
    * apart, so neighbor false-positives after verify are forced by the
    * corpus, not the scheme. eval_er_quality's base_pair row quantifies
    * exactly that cost; a production deployment weighs it against the
    * suffix-class recall it buys (or verifies on a second field, which
    * this single-field fixture doesn't have).
    */
  def multiPassNamePairs(records: DataFrame, idCol: String, nameCol: String,
      blockKeys: Seq[Column], maxDist: Int, maxBlock: Int = 64): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(blockKeys.nonEmpty, "at least one blocking pass is required")
    val candidates = blockKeys
      .map(k => blockedCandidates(records, idCol, nameCol, k, maxBlock))
      .reduce(_.unionByName(_))
      .distinct()
    verify(candidates, maxDist)
  }

  /** [[multiPassNamePairs]]' candidates WITH their per-pair pass count —
    * the signal the agreement tier filters on. A pair appears at most
    * once per pass (each record sits in exactly one block per key), so
    * the count after the per-pass union is the number of INDEPENDENT
    * passes that proposed the pair.
    */
  private def multiPassCandidatesWithPasses(records: DataFrame, idCol: String,
      nameCol: String, blockKeys: Seq[Column], maxBlock: Int): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking pass is required")
    blockKeys.zipWithIndex
      .map { case (k, i) =>
        blockedCandidates(records, idCol, nameCol, k, maxBlock)
          .withColumn("__pass", lit(i))
      }
      .reduce(_.unionByName(_))
      .groupBy(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
      .agg(count(lit(1)).as("n_passes"))
  }

  /** The AGREEMENT tier of multi-pass linkage — the precision dial
    * VERDICT r12 item 4 asked for: verified pairs (levenshtein ≤
    * `maxDist`) are kept only when the evidence is strong — the edit
    * distance is tight (≤ `tightDist`) OR at least `minPasses`
    * independent blocking passes proposed the pair. Same propose cost
    * as [[multiPassNamePairs]] (the pass count falls out of the union's
    * pair aggregate); the verify still runs once per unique candidate.
    *
    * Honest ceiling this dial cannot move (measured by
    * `eval_er_frontier`, and forced by the corpus, not the scheme): on
    * a SINGLE-FIELD serial-ID corpus the suffix-typo class is
    * information-theoretically stuck — the typo'd name is byte-IDENTICAL
    * to one serial neighbor (dist 0, and co-blocked by every pass, so
    * both signals vote for the wrong candidate) while the true source
    * sits at dist 1 behind a last-char-invariant key that only one pass
    * can propose. No verifier over the name alone can rank the true
    * source above an exact byte match; the frontier is flat on that
    * class (precision ~0.1 at recall 1, or abstention) until a second
    * field exists to verify on. What the tier DOES buy: dist-2
    * single-pass proposals (the loosest evidence class) drop out, which
    * on this fixture prices the transposition class's recall as the
    * explicit cost of the precision stance.
    */
  def agreementNamePairs(records: DataFrame, idCol: String, nameCol: String,
      blockKeys: Seq[Column], maxDist: Int, tightDist: Int,
      minPasses: Int = 2, maxBlock: Int = 64): DataFrame = {
    require(maxDist >= 0 && tightDist >= 0 && tightDist <= maxDist,
      s"need 0 <= tightDist <= maxDist, got ($tightDist, $maxDist)")
    require(minPasses >= 1, s"minPasses must be positive, got $minPasses")
    multiPassCandidatesWithPasses(records, idCol, nameCol, blockKeys, maxBlock)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist &&
        (col("dist") <= tightDist || col("n_passes") >= minPasses))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"), col("n_passes"))
  }

  /** The blocked record INDEX — the ingest artifact of multi-pass
    * linkage (the band-index recipe applied to records): per blocking
    * pass, every record of every block within the `maxBlock` cap as
    * (__pass, __blk, __id, __nm) rows. A production linkage pipeline
    * persists exactly this at ingest (blocking keys are a pure record
    * projection; the cap is data-dependent but ingest-stable); every
    * downstream propose then self-joins the index instead of re-keying
    * and re-counting the record table per query. Null blocking keys
    * are excluded exactly as in [[blockedNamePairs]].
    */
  def blockedRecordIndex(records: DataFrame, idCol: String, nameCol: String,
      blockKeys: Seq[Column], maxBlock: Int = 64): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking pass is required")
    require(maxBlock >= 2, s"maxBlock must be at least 2, got $maxBlock")
    blockKeys.zipWithIndex.map { case (k, i) =>
      val recs = records
        .select(col(idCol).as("__id"), col(nameCol).as("__nm"), k.as("__blk"))
        .filter(col("__blk").isNotNull)
      val kept = recs.groupBy(col("__blk"))
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBlock)
        .select(col("__blk"))
      recs.join(kept, Seq("__blk"))
        .select(lit(i).as("__pass"), col("__blk"), col("__id"), col("__nm"))
    }.reduce(_.unionByName(_))
  }

  /** UNVERIFIED candidate pairs from a [[blockedRecordIndex]] frame:
    * ONE pass-and-block-keyed self-join over the tagged union replaces
    * the per-pass self-joins of the live propose — same pairs, fewer
    * exchanges. A pair appears at most once per pass (each record sits
    * in exactly one block per key).
    */
  private def indexCandidates(idx: DataFrame): DataFrame = {
    val a = idx.select(col("__pass"), col("__blk"),
      col("__id").as("id_a"), col("__nm").as("name_a"))
    val b = idx.select(col("__pass").as("__pass2"), col("__blk").as("__blk2"),
      col("__id").as("id_b"), col("__nm").as("name_b"))
    a.join(b, col("__pass") === col("__pass2") &&
        col("__blk") === col("__blk2") && col("id_a") < col("id_b"))
      .select(col("__pass"), col("id_a"), col("id_b"),
        col("name_a"), col("name_b"))
  }

  /** [[multiPassNamePairs]] from a pre-built [[blockedRecordIndex]]
    * frame (typically an ingest-time parquet artifact): distinct
    * candidates across passes, verified once each — pair-for-pair the
    * live op (Round17Spec-pinned).
    */
  def multiPassPairsFromIndex(idx: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    verify(indexCandidates(idx).drop("__pass").distinct(), maxDist)
  }

  /** Verified candidate pairs WITH their independent-pass count from a
    * [[blockedRecordIndex]] frame — the agreement tier's input, and the
    * shared stem of BOTH frontier tiers: the recall-first tier is this
    * frame's (id, name, dist) columns, the agreement tier a filter on
    * it, so one propose serves both.
    */
  def pairsWithPassesFromIndex(idx: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    indexCandidates(idx)
      .groupBy(col("id_a"), col("id_b"), col("name_a"), col("name_b"))
      .agg(count(lit(1)).as("n_passes"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"), col("n_passes"))
  }

  /** [[agreementNamePairs]] from a pre-built [[blockedRecordIndex]]
    * frame (Round17Spec-pinned equal to the live op).
    */
  def agreementPairsFromIndex(idx: DataFrame, maxDist: Int, tightDist: Int,
      minPasses: Int = 2): DataFrame = {
    require(tightDist >= 0 && tightDist <= maxDist,
      s"need 0 <= tightDist <= maxDist, got ($tightDist, $maxDist)")
    require(minPasses >= 1, s"minPasses must be positive, got $minPasses")
    pairsWithPassesFromIndex(idx, maxDist)
      .filter(col("dist") <= tightDist || col("n_passes") >= minPasses)
  }

  /** The dropped-coverage report for [[blockedNamePairs]]: every block
    * past the cap, with its size — what a production linkage job logs
    * (and a spike in alarms on: a sudden oversized block usually means
    * an upstream default value flooded the blocking key). One
    * aggregate pass; null blocking keys are reported under a null key
    * row (they are dropped from the propose too).
    */
  def oversizedBlocks(records: DataFrame, blockKey: Column,
      maxBlock: Int = 64): DataFrame =
    records.withColumn("__blk", blockKey)
      .groupBy(col("__blk").as("block_key"))
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > maxBlock || col("block_key").isNull)

  /** The mastered entity table — what a record-linkage user actually
    * wants from ER (matched pairs are an intermediate): every record
    * mapped to an entity (connected component over the verified pairs;
    * singletons are their own entity), one canonical record per entity
    * by (quality DESC, md5(id) ASC) — the same O(1)-state min-struct
    * argmax as quality-ranked dedup canonicals, map-side combinable,
    * so a pathological mega-entity costs nothing extra.
    *
    * `quality` is caller-supplied (format conformance, source trust,
    * recency — whatever the domain ranks survivors by), evaluated
    * against `records`' columns. Output: one row per entity with the
    * canonical member and the member count.
    */
  def entityTable(records: DataFrame, pairs: DataFrame, idCol: String,
      nameCol: String, quality: Column): DataFrame = {
    // internal rename: clusterAssignment's component frame exposes an
    // `id` column, so a caller whose id column is literally named "id"
    // would otherwise hit an ambiguous reference
    val ids = records.select(col(idCol).as("__eid"))
    val cl = Dedup.clusterAssignment(ids, pairs
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")), "__eid")
      .select(col("__eid").as(idCol), col("cluster_id"))
    entityTableFromAssignment(records, cl, idCol, nameCol, quality)
  }

  /** [[entityTable]] from a pre-resolved (id, cluster_id) assignment —
    * the mastered-table query over an ingest-persisted linkage result
    * (the staged-cluster recipe of the dedup family): the canonical
    * argmax and the membership count stay in the query; only the
    * propose + connected components ride the ingest artifact.
    */
  def entityTableFromAssignment(records: DataFrame, assignment: DataFrame,
      idCol: String, nameCol: String, quality: Column): DataFrame = {
    val scored = records.select(col(idCol).as("__eid"),
      col(nameCol).as("__nm"), quality.cast("double").as("__q"))
    assignment.select(col(idCol).as("__eid"), col("cluster_id"))
      .join(scored, "__eid")
      .groupBy(col("cluster_id").as("entity_id"))
      .agg(min(struct((-col("__q")).as("nq"),
          md5(col("__eid").cast("string")).as("m"),
          col("__eid").as("id"), col("__nm").as("nm"),
          col("__q").as("q"))).as("__b"),
        count(lit(1)).as("n_members"))
      .select(col("entity_id"), col("__b.id").as("canonical_id"),
        col("__b.nm").as("canonical_name"),
        col("__b.q").as("canonical_quality"), col("n_members"))
  }
}
