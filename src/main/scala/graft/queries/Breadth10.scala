package graft.queries

import graft.etl.{LayoutOps, Tables}
import org.apache.spark.sql.functions._

/** Round-10 wave: storage-maintenance operators for the versioned
  * parquet sinks (vacuum/retention — the compact-and-expire op a
  * 100 TB deployment schedules daily), plus round-10 quality and
  * robustness follow-ups.
  */
object Breadth10 {

  /** Vacuum/retention over a versioned sink root — the maintenance op
    * that keeps the `mergeSink`/`cdcSink` `v<batchId>` layout from
    * accumulating one full table copy per micro-batch forever (at
    * 100 TB the dominant storage line within a day; every table format
    * ships this as VACUUM / expire_snapshots).
    *
    * The fixture builds a four-version history of a deterministic
    * orders slice (vN = orderkeys with key mod 5 ≤ N), strips v2's
    * commit marker to stage the crash-debris case (batch 2 died and
    * re-ran as v3), then vacuums with keep=2. Expected actions:
    * v0 expired (old committed), v1 kept, v2 debris (uncommitted below
    * the newest committed version), v3 kept. The report carries each
    * pre-vacuum version's row count — the reclaimed-space line a
    * maintenance job logs; per-version file/byte footprints are
    * engine-specific and pinned in Round10Spec instead. All vacuum
    * work is FS metadata; the only scans are the four footer-only
    * row counts.
    */
  val q63LayoutVacuum = Q(
    "layout_vacuum",
    (s, dir) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_vacuum_").toString
      val orders = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      (0 to 3).foreach { n =>
        orders.filter(col("o_orderkey") % 5 <= n)
          .write.mode("overwrite").parquet(s"$root/v$n")
      }
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v2/_SUCCESS"), false)
      // pre-vacuum row counts (parquet footer metadata, no data read)
      val counts = (0 to 3).map { n =>
        n.toLong -> s.read.parquet(s"$root/v$n").count()
      }.toMap
      val report = LayoutOps.vacuumVersions(s, root, keep = 2)
        .select(col("version"), col("committed"), col("action")).collect()
        .map(r => (r.getLong(0), counts(r.getLong(0)), r.getBoolean(1), r.getString(2)))
        .toSeq
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      report.toDF("version", "n_rows", "committed", "action")
        .orderBy(col("version"))
    },
    Some("""
      WITH m AS (SELECT o_orderkey % 5 AS md FROM orders),
      v AS (SELECT unnest(range(4))::BIGINT AS version),
      c AS (SELECT v.version, count(*)::BIGINT AS n_rows
            FROM v JOIN m ON m.md <= v.version GROUP BY v.version)
      SELECT version, n_rows,
             version <> 2 AS committed,
             CASE version WHEN 0 THEN 'expired' WHEN 2 THEN 'debris'
                          ELSE 'kept' END AS action
      FROM c ORDER BY version
    """.trim))

  /** Epoch materialization of the temperature mixture — the step
    * between mixture WEIGHTS (text_mixture_temperature) and what a
    * data loader actually reads: each doc repeats floor(boost) times
    * plus one hash-decided extra (expected multiplicity = boost,
    * deterministic, no rand()), capped at 4 epochs (repeating data
    * past ~4 passes stops buying model quality, so a huge up-weight on
    * a tiny language saturates instead of exploding the output). The
    * per-lang boost frame is a broadcast; the repeats generate
    * scan-side via explode — output volume IS the solved token budget.
    */
  val sampleEpochMaterialize = Q(
    "sample_epoch_materialize",
    (s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
      val w = graft.etl.SampleOps.temperatureWeights(
          Tables(s, dir, "documents"), "lang", alpha = 0.3)
        .select(col("lang"), col("boost"))
      graft.etl.SampleOps.epochMaterialize(
          docs.join(broadcast(w), "lang"), "doc_id", "boost", maxEpochs = 4)
        .select(col("doc_id"), col("lang"), col("n_epochs"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    },
    Some("""
      WITH g AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang),
      n AS (SELECT sum(n_docs)::DOUBLE AS nt FROM g),
      p AS (SELECT lang, n_docs::DOUBLE / nt AS p,
                   pow(n_docs::DOUBLE / nt, 0.3) AS wr FROM g, n),
      t AS (SELECT list_sum(list_sort(list(wr))) AS wt FROM p),
      bz AS (SELECT lang, round((wr / wt) / p, 9) AS boost FROM p, t),
      d AS (SELECT doc_id, dd.lang, least(boost, 4.0) AS b,
              ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
            FROM documents dd JOIN bz USING (lang)),
      e AS (SELECT doc_id, lang,
              (floor(b)::INT + CASE WHEN h % 1000000 < floor((b - floor(b)) * 1000000.0)
                                    THEN 1 ELSE 0 END) AS n_epochs
            FROM d)
      SELECT doc_id, lang, n_epochs,
             unnest(range(1, n_epochs + 1))::INT AS epoch
      FROM e WHERE n_epochs >= 1 ORDER BY doc_id, epoch
    """.trim))

  /** The training-mix capstone — the end-to-end flow a training-data
    * job runs between a raw corpus and a data loader, each stage an
    * already-oracled operator composed in its production order:
    * Gopher-rule quality gate → exact-dedup keep (min doc id per
    * content hash AMONG survivors — filter before dedup, the cheap
    * stage first) → temperature mixture solved on the kept corpus
    * (α = 0.3) → epoch materialization (cap 4) → 16-way shard
    * assignment hashed on (doc, epoch) so a doc's repeats spread
    * across shards (hashing on the doc alone would pin all epochs of a
    * hot doc to one trainer). Output is the per-(lang, shard) row and
    * token manifest — the numbers that ARE the training job's data
    * plan. Scale shape: two corpus scans (gopher flags, content hash),
    * one content-hash aggregate, broadcast lang weights, scan-side
    * epoch explode, 80-group final aggregate — nothing quadratic,
    * nothing driver-side.
    */
  val pipelineTrainingMix = Q(
    "pipeline_training_mix",
    (s, dir) => {
      import graft.ext.{Dedup, TextOps}
      val docs = Tables(s, dir, "documents")
      val q = TextOps.gopherRules(docs, "doc_id", "text")
        .filter(col("keep") === 1)
        .select(col("doc_id"), col("n_words"))
      val surv = docs.select(col("doc_id"), col("lang"), col("text"))
        .join(q, "doc_id")
      val keepIds = surv
        .groupBy(md5(Dedup.normText(col("text"))).as("__h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val kept = surv.join(keepIds, "doc_id")
        .select(col("doc_id"), col("lang"), col("n_words"))
      val wts = graft.etl.SampleOps.temperatureWeights(kept, "lang", alpha = 0.3)
        .select(col("lang"), col("boost"))
      val epochs = graft.etl.SampleOps.epochMaterialize(
        kept.join(broadcast(wts), "lang"), "doc_id", "boost", maxEpochs = 4)
      epochs
        .withColumn("shard",
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            col("epoch").cast("string"))), 1, 8), 16, 10).cast("long") % 16)
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_rows"), sum(col("n_words")).as("n_tokens"))
        .orderBy(col("lang"), col("shard"))
    },
    Some {
      val stops = graft.ext.TextOps.StopEn.map(w => s"'$w'").mkString(", ")
      s"""
      WITH n AS (SELECT doc_id, lang, text, ${Extensions.NormW} AS w,
                   len(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS nc
                 FROM documents),
      b AS (SELECT doc_id, lang, text, len(w)::BIGINT AS n_words,
              (nc - (len(w) - 1))::BIGINT AS n_word_chars,
              len(list_filter([$stops], s -> list_contains(w, s)))::BIGINT AS n_stop
            FROM n),
      surv AS (SELECT doc_id, lang, text, n_words FROM b
               WHERE n_words >= 30 AND n_words <= 100000
                 AND n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words
                 AND n_stop >= 2),
      keepid AS (SELECT min(doc_id) AS doc_id FROM surv
                 GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))),
      kept AS (SELECT s.doc_id, s.lang, s.n_words FROM surv s JOIN keepid USING (doc_id)),
      g AS (SELECT lang, count(*)::BIGINT AS n_docs FROM kept GROUP BY lang),
      nt AS (SELECT sum(n_docs)::DOUBLE AS nt FROM g),
      p AS (SELECT lang, n_docs::DOUBLE / nt AS p,
                   pow(n_docs::DOUBLE / nt, 0.3) AS wr FROM g, nt),
      t AS (SELECT list_sum(list_sort(list(wr))) AS wt FROM p),
      bz AS (SELECT lang, round((wr / wt) / p, 9) AS boost FROM p, t),
      d AS (SELECT k.doc_id, k.lang, k.n_words, least(boost, 4.0) AS bb,
              ('0x' || substr(md5(k.doc_id::VARCHAR), 1, 8))::BIGINT AS h
            FROM kept k JOIN bz USING (lang)),
      e AS (SELECT doc_id, lang, n_words,
              (floor(bb)::INT + CASE WHEN h % 1000000 < floor((bb - floor(bb)) * 1000000.0)
                                     THEN 1 ELSE 0 END) AS ne
            FROM d),
      m AS (SELECT doc_id, lang, n_words, unnest(range(1, ne + 1))::INT AS epoch
            FROM e WHERE ne >= 1),
      sh AS (SELECT lang, n_words,
               ('0x' || substr(md5(doc_id::VARCHAR || ':' || epoch::VARCHAR), 1, 8))::BIGINT % 16 AS shard
             FROM m)
      SELECT lang, shard, count(*)::BIGINT AS n_rows, sum(n_words)::BIGINT AS n_tokens
      FROM sh GROUP BY lang, shard ORDER BY lang, shard
      """.trim
    })

  val all: Seq[Q] = Seq(q63LayoutVacuum, sampleEpochMaterialize, pipelineTrainingMix)
}
