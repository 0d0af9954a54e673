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

  val all: Seq[Q] = Seq(erEntityTable)
}
