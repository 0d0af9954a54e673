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

  val all: Seq[Q] = Seq(erMultipassPairs)
}
