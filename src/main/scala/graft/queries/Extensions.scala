package graft.queries

import graft.etl.Tables
import graft.ext.Dedup
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

  private def augmentedDocs(s: SparkSession, dir: String, perturb: Boolean): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
    val copies = d
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", if (perturb) concat(lit("xx "), col("text")) else col("text"))
    d.unionByName(copies)
  }

  private def augCte(perturb: Boolean): String = {
    val t = if (perturb) "'xx ' || text" else "text"
    s"""aug AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 100000, $t, lang FROM documents)"""
  }

  /** DuckDB mirror of Dedup.normText + word split. */
  private val NormW = raw"string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')"

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

  val dedupMinhash = Q(
    "dedup_minhash_pairs",
    (s, dir) =>
      Dedup.minhashCandidatePairs(augmentedDocs(s, dir, perturb = true), "doc_id", "text")
        .orderBy(col("doc_a"), col("doc_b")),
    Some {
      val sigs = Dedup.SeedsA.zip(Dedup.SeedsB).map { case (a, b) =>
        s"list_min(list_transform(hs, h -> ($a * h + $b) % ${Dedup.HashPrime}))"
      }.mkString(",\n               ")
      val bands = (0 until 4).map { j =>
        s"'$j:' || sig[${2 * j + 1}]::VARCHAR || '_' || sig[${2 * j + 2}]::VARCHAR"
      }.mkString(",\n               ")
      s"""
      WITH ${augCte(perturb = true)},
      norm AS (SELECT doc_id, $NormW AS w FROM aug),
      sh AS (SELECT doc_id, w FROM norm WHERE len(w) >= 3),
      hs AS (SELECT doc_id,
               list_transform(range(len(w) - 2),
                 i -> ('0x' || substr(md5(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]), 1, 8))::BIGINT) AS hs
             FROM sh),
      sig AS (SELECT doc_id, [$sigs] AS sig FROM hs),
      bands AS (SELECT doc_id, unnest([$bands]) AS band FROM sig)
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
      ORDER BY doc_a, doc_b
    """.trim
    })

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

  val dedupJaccard = Q(
    "dedup_ngram_jaccard",
    (s, dir) =>
      Dedup.ngramJaccardPairs(augmentedDocs(s, dir, perturb = true),
          "doc_id", "text", "lang", threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH ${augCte(perturb = true)},
      norm AS (SELECT doc_id, lang, $NormW AS w FROM aug),
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

  def all: Seq[Q] = Seq(dedupExact, dedupMinhash, dedupSimhash, dedupJaccard)
}
