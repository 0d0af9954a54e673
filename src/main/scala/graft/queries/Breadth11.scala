package graft.queries

import graft.etl.Tables
import org.apache.spark.sql.functions._

/** Round-11 wave: the full entity-resolution product (pairs → connected
  * components → quality canonical — the mastered record table), plus
  * round-11 generalization and quality follow-ups.
  */
object Breadth11 {

  /** The mastered entity table — ER carried to the product a
    * record-linkage user actually wants (matched pairs are an
    * intermediate): every record maps to an entity (connected component
    * over the capped-blocking verified pairs; unmatched records are
    * singleton entities), and each entity keeps ONE canonical record by
    * (quality DESC, md5(id) ASC). Quality here is format conformance —
    * a record whose name parses as `Customer#<digits>` beats a
    * typo-damaged one, the "prefer the record that passes validation"
    * survivorship rule of master-data management. The argmax is the
    * O(1)-state min-struct aggregate (map-side combinable; a
    * pathological mega-entity costs nothing extra), the CC is the
    * hash-min propagation both dedup canonical queries ride, and the
    * propose inherits `blockedNamePairs`' loud block cap — nothing in
    * the chain is quadratic past the bounded blocks.
    */
  val erEntityTable = Q(
    "er_entity_table",
    (s, dir) => {
      import graft.ext.EntityOps
      val recs = Breadth10.erRecords(s, dir)
      val pairs = EntityOps.blockedNamePairs(recs, "c_custkey", "c_name",
        expr("right(c_name, 5)"), maxDist = 2, maxBlock = 64)
      EntityOps.entityTable(recs, pairs, "c_custkey", "c_name",
          when(col("c_name").rlike("^Customer#[0-9]+$"), 1.0).otherwise(0.0))
        .orderBy(col("entity_id"))
    },
    Some(s"""
      WITH RECURSIVE ${Breadth10.erRecordsCtes},
      p AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
            FROM recb a JOIN recb b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 2),
      edges AS (SELECT id_a AS s, id_b AS d FROM p
                UNION SELECT id_b, id_a FROM p),
      reach(s, d) AS (SELECT s, d FROM edges
                      UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
      comp AS (SELECT s AS c_custkey, min(d) AS mn FROM reach GROUP BY s),
      cl AS (SELECT r.c_custkey,
                    coalesce(least(c.mn, r.c_custkey), r.c_custkey) AS entity_id
             FROM rec r LEFT JOIN comp c USING (c_custkey)),
      q AS (SELECT cl.entity_id, rec.c_custkey, rec.c_name,
                   CASE WHEN regexp_matches(rec.c_name, '^Customer#[0-9]+$$')
                        THEN 1.0 ELSE 0.0 END AS quality,
                   row_number() OVER (PARTITION BY cl.entity_id
                     ORDER BY quality DESC, md5(rec.c_custkey::VARCHAR)) AS rn
            FROM cl JOIN rec USING (c_custkey)),
      sz AS (SELECT entity_id, count(*)::BIGINT AS n_members FROM cl GROUP BY 1)
      SELECT q.entity_id, q.c_custkey AS canonical_id,
             q.c_name AS canonical_name, quality AS canonical_quality,
             n_members
      FROM q JOIN sz USING (entity_id) WHERE rn = 1 ORDER BY entity_id
    """.trim))

  /** PQ-distortion recall eval in the OPQ-rotated space — the
    * compressed-tier complement of `eval_ann_recall` (which measures
    * coarse-quantizer COVERAGE on full-precision vectors): corpus,
    * queries and codebook all live in the md5-derived
    * Hadamard-rotation space ([[graft.ext.Similarity.opqRotate]] —
    * exactly orthogonal, so the exact ground truth computed on the
    * ORIGINAL vectors is the right truth for the rotated ranking; the
    * oracle replays the rotation from md5+bit_count, proving the
    * derivation engine-portable), and recall@5 of the m=8 ADC scan
    * against that truth is the per-query row. Honest finding, measured
    * at both scales: on THIS corpus rotation moves PQ recall ≤ +0.01
    * (the synthetic embeddings are isotropic — energy is already
    * spread, which is exactly when a rotation is a no-op); the op
    * exists for the anisotropic real-embedding case (CLIP/LLM vectors
    * concentrate energy in few directions), where sign-diagonal +
    * Hadamard is the standard cheap OPQ stand-in.
    */
  val evalPqRecall = Q(
    "eval_pq_recall",
    (s, dir) => {
      import graft.ext.Similarity
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
      val exact = Similarity.bruteForceTopK(s, emb, queries,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val remb = emb.select(col("vec_id"),
        Similarity.opqRotate(col("embedding"), 64).as("embedding"))
      val approx = Similarity.pqTopK(s, remb,
          remb.filter(col("vec_id") % 100 === 0),
          remb.filter(col("vec_id") % 5 === 0 && col("vec_id") < 5000),
          "vec_id", "embedding", m = 8, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      exact
        .join(approx.withColumn("__hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
        .withColumn("recall", round(col("n_hit").cast("double") / 5, 9))
        .orderBy(col("query_id"))
    },
    Some(s"""
      WITH rsgn AS (SELECT list(CASE WHEN substr(md5('opq:' || j::VARCHAR), 1, 1) <= '7'
                                     THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END ORDER BY j) AS ds
                    FROM range(64) t(j)),
      remb AS (SELECT vec_id,
                 list_transform(range(64), i ->
                   round(list_sum(list_transform(range(64), j ->
                     (CASE WHEN bit_count(i & j) % 2 = 0
                           THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)
                     * ds[j+1] * embedding[j+1]::DOUBLE)) * 0.125::DOUBLE, 9)) AS embedding
               FROM embeddings, rsgn),
      q0 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
             WHERE vec_id % 100 = 0),
      c0 AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      ep AS (SELECT query_id, neighbor_id, ${Extensions.sqlCos("qv", "cv")} AS sim
             FROM q0, c0 WHERE query_id <> neighbor_id),
      exact AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id
                           ORDER BY sim DESC, neighbor_id) AS rank
                  FROM ep) WHERE rank <= 5),
      ${Extensions.pqRecCtes("remb")},
      rq AS (SELECT vec_id AS query_id, embedding AS qv FROM remb
             WHERE vec_id % 100 = 0),
      ap AS (SELECT query_id, rec.vec_id AS neighbor_id,
                    ${Extensions.sqlCos("qv", "rec.embedding")} AS sim
             FROM rq, rec WHERE query_id <> rec.vec_id),
      approx AS (SELECT query_id, neighbor_id FROM (
                   SELECT query_id, neighbor_id,
                          row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
                   FROM ap) WHERE rank <= 5)
      SELECT e.query_id,
             sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit,
             round(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / 5, 9) AS recall
      FROM exact e LEFT JOIN approx a USING (query_id, neighbor_id)
      GROUP BY e.query_id ORDER BY e.query_id
    """.trim))

  /** PII scrub — the redaction pass every training-data pipeline runs
    * before text leaves quarantine (emails, NANP-style phone numbers,
    * IPv4 addresses → typed placeholder tokens), with per-doc match
    * counts so the scrub is auditable (a domain whose PII density
    * spikes is an ingest alarm, not just a redaction). The synthetic
    * corpus carries no PII, so the fixture INJECTS it
    * deterministically (id-derived email/phone/IP appended for
    * doc_id % 7 / % 11 / % 13 — both engines construct the identical
    * dirty corpus, the er-fixture pattern): the rule set is then
    * exercised against known-positive rows and known-clean rows in
    * one output. Counting + redaction are scan-side regex projections
    * — codegen'd, shuffle-free, 100 TB = one read+write pass.
    */
  val textPiiScrub = Q(
    "text_pii_scrub",
    (s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val dirty = docs
        .withColumn("text", concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-01"), format_string("%02d", col("doc_id") % 100),
              lit("-"), format_string("%04d", col("doc_id") % 10000)))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
              lit("."), ((col("doc_id") * 7) % 256).cast("string")))
            .otherwise(lit(""))))
      val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phone = "[0-9]{3}-[0-9]{4}-[0-9]{4}"
      val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      dirty
        .withColumn("n_emails", regexp_count(col("text"), lit(email)).cast("long"))
        .withColumn("n_phones", regexp_count(col("text"), lit(phone)).cast("long"))
        .withColumn("n_ips", regexp_count(col("text"), lit(ip)).cast("long"))
        .withColumn("clean",
          regexp_replace(regexp_replace(regexp_replace(col("text"),
            email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>"))
        .filter(col("n_emails") + col("n_phones") + col("n_ips") > 0)
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
          expr("right(clean, 40)").as("tail_redacted"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH dirty AS (SELECT doc_id, text ||
          (CASE WHEN doc_id % 7 = 0
                THEN ' contact user' || doc_id || '@example.com' ELSE '' END) ||
          (CASE WHEN doc_id % 11 = 0
                THEN ' call 555-01' || lpad((doc_id % 100)::VARCHAR, 2, '0')
                     || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END) ||
          (CASE WHEN doc_id % 13 = 0
                THEN ' host 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                ELSE '' END) AS text
        FROM documents),
      m AS (SELECT doc_id, text,
              len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::BIGINT AS n_emails,
              len(regexp_extract_all(text, '[0-9]{3}-[0-9]{4}-[0-9]{4}'))::BIGINT AS n_phones,
              len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))::BIGINT AS n_ips
            FROM dirty),
      r AS (SELECT doc_id, n_emails, n_phones, n_ips,
              regexp_replace(regexp_replace(regexp_replace(text,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                '[0-9]{3}-[0-9]{4}-[0-9]{4}', '<PHONE>', 'g'),
                '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS clean
            FROM m WHERE n_emails + n_phones + n_ips > 0)
      SELECT doc_id, n_emails, n_phones, n_ips,
             right(clean, 40) AS tail_redacted
      FROM r ORDER BY doc_id
    """.trim))

  val all: Seq[Q] = Seq(erEntityTable, evalPqRecall, textPiiScrub)
}
