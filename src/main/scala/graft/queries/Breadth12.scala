package graft.queries

import graft.etl.Tables
import org.apache.spark.sql.functions._

/** Round-11 third wave: forensic data quality (Benford), behavioral
  * path mining, bloom-prefiltered semi joins, and mergeable uniform
  * sampling — each a shape the registry lacked.
  */
object Breadth12 {

  /** Benford expected first-digit frequencies log10(1 + 1/d), generated
    * ONCE in Scala and spliced as literals into both engines (the
    * seed-constant discipline of the MinHash family) — neither engine's
    * libm log10 is trusted at runtime.
    */
  private val benfordExp: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** Benford's-law first-digit audit over order totals — the forensic
    * DQ axis (fabricated or truncated monetary data deviates from the
    * log-digit law long before a range or drift check fires). Digits
    * come from exact integer cents (`floor(price·100)` → BIGINT →
    * first character), never from float formatting; expected
    * frequencies are Scala-generated literals shared by both engines;
    * the chi-square contribution per digit is the audit column a
    * forensic reviewer ranks by. The synthetic uniform-ish prices do
    * NOT follow Benford — the report SHOWS that (large chi2), which is
    * the point of an audit op: it reports conformance, it does not
    * assume it. One map-side-combined 9-group aggregate + a one-row
    * broadcast total: scan-shaped at any corpus size.
    */
  val dq10Benford = Q(
    "dq10_benford",
    (s, dir) => {
      val cents = Tables(s, dir, "orders")
        .select(floor(col("o_totalprice") * 100).cast("long").as("__c"))
        .filter(col("__c") > 0)
        .select(substring(col("__c").cast("string"), 1, 1).cast("int").as("digit"))
      val counts = cents.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("__tot"))
      val expCol = benfordExp.tail.foldLeft(
        when(col("digit") === benfordExp.head._1, lit(benfordExp.head._2))) {
        case (acc, (d, e)) => acc.when(col("digit") === d, lit(e))
      }
      counts.crossJoin(broadcast(total))
        .withColumn("exp_freq", round(expCol, 9))
        .withColumn("obs_freq", round(col("n").cast("double") / col("__tot"), 9))
        .withColumn("chi2_term", round(
          (col("n") - col("exp_freq") * col("__tot")) *
            (col("n") - col("exp_freq") * col("__tot")) /
            (col("exp_freq") * col("__tot")), 9))
        .select(col("digit").cast("long").as("digit"), col("n"),
          col("obs_freq"), col("exp_freq"), col("chi2_term"))
        .orderBy(col("digit"))
    },
    Some {
      val cases = benfordExp.map { case (d, e) =>
        s"WHEN digit = $d THEN $e" }.mkString(" ")
      s"""
      WITH c AS (SELECT substr((floor(o_totalprice * 100)::BIGINT)::VARCHAR, 1, 1)::INT AS digit
                 FROM orders WHERE floor(o_totalprice * 100)::BIGINT > 0),
      g AS (SELECT digit, count(*)::BIGINT AS n FROM c GROUP BY digit),
      t AS (SELECT sum(n)::BIGINT AS tot FROM g),
      e AS (SELECT digit, n, tot,
              round((CASE $cases END)::DOUBLE, 9) AS exp_freq FROM g, t)
      SELECT digit::BIGINT AS digit, n,
             round(n::DOUBLE / tot, 9) AS obs_freq, exp_freq,
             round((n - exp_freq * tot) * (n - exp_freq * tot)
                   / (exp_freq * tot), 9) AS chi2_term
      FROM e ORDER BY digit
      """.trim
    })

  /** Top behavioral paths: every 3-step event-type sequence per user
    * (the exploratory complement of the prescribed-path funnel and the
    * 1st-order transition matrix — 2nd-order structure shows up here
    * first), with global counts and rates. One user-keyed window pass
    * (two leads under the same tie-broken ordering as
    * `q63_event_transitions`) then a k³-bounded aggregate — the path
    * alphabet is event types, so the aggregated frame never scales
    * with the corpus and the rate normalization is a one-row broadcast.
    */
  val q65PathTrigrams = Q(
    "q65_path_trigrams",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tri = Tables(s, dir, "events")
        .withColumn("__e2", lead(col("event_type"), 1).over(w))
        .withColumn("__e3", lead(col("event_type"), 2).over(w))
        .filter(col("__e3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("__e2").as("step2"),
          col("__e3").as("step3"))
        .agg(count(lit(1)).as("n"))
      val total = tri.agg(sum(col("n")).as("__tot"))
      tri.crossJoin(broadcast(total))
        .withColumn("rate", round(col("n").cast("double") / col("__tot"), 9))
        .select(col("step1"), col("step2"), col("step3"), col("n"), col("rate"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
    },
    Some("""
      WITH s AS (SELECT user_id, event_type AS step1,
                   lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step2,
                   lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step3
                 FROM events),
      g AS (SELECT step1, step2, step3, count(*)::BIGINT AS n
            FROM s WHERE step3 IS NOT NULL GROUP BY 1, 2, 3),
      t AS (SELECT sum(n)::BIGINT AS tot FROM g)
      SELECT step1, step2, step3, n, round(n::DOUBLE / tot, 9) AS rate
      FROM g, t ORDER BY n DESC, step1, step2, step3
    """.trim))

  /** Bloom-prefiltered semi join — THE shuffle reducer for a selective
    * fact-to-fact semi join at 100 TB: the build side (big orders)
    * aggregates into one bloom filter (`bloom_filter_agg`, a mergeable
    * map-side-combinable sketch), which broadcasts and prunes the probe
    * scan BEFORE the shuffle — only `might_contain` survivors (true
    * matches + the bloom's false-positive rate) pay the exchange, and
    * the exact semi join afterwards removes the false positives, so
    * the RESULT is bit-identical to the plain semi join the oracle
    * runs while the shuffled volume drops to ~selectivity·corpus.
    * (Spark's own runtime bloom injection targets the same shape; this
    * op makes the technique explicit and testable.) The final
    * aggregate rides the engine-wide exact-decimal money discipline.
    */
  val j14BloomSemi = Q(
    "j14_bloom_semi",
    (s, dir) => {
      graft.functions.VectorExpressions.register(s)
      // might_contain requires its bloom side to be a CONSTANT or a
      // scalar subquery (checked at analysis) — the same contract
      // Spark's own runtime-filter rewrite emits — so the op is
      // expressed in SQL where the scalar subquery exists
      Tables(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey")).createOrReplaceTempView("__j14_big")
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice")).createOrReplaceTempView("__j14_li")
      s.sql("""
        SELECT l_returnflag, count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM __j14_li
        WHERE graft_might_contain(
                (SELECT graft_bloom_agg(xxhash64(o_orderkey), 100000L, 800000L)
                 FROM __j14_big),
                xxhash64(l_orderkey))
          AND l_orderkey IN (SELECT o_orderkey FROM __j14_big)
        GROUP BY l_returnflag ORDER BY l_returnflag
      """)
    },
    Some("""
      SELECT l_returnflag, count(*)::BIGINT AS n_items,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
      GROUP BY l_returnflag ORDER BY l_returnflag
    """.trim))

  /** Mergeable bottom-k uniform sample — the distributed, deterministic
    * replacement for reservoir sampling: the k records with the
    * smallest md5(id) ARE a uniform k-sample (the hash is the random
    * tape), and bottom-k is a MERGEABLE statistic — per-shard bottom-k
    * sets union-then-truncate to the exact global answer (the
    * CMS/HLL/k-means merge-is-cheap argument, spec-pinned), so a
    * 100 TB corpus samples with one TakeOrdered tree-reduction and no
    * global sort. The md5 key ships in the output so downstream merges
    * need no rehash.
    */
  val sampleBottomkMerge = Q(
    "sample_bottomk_merge",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("sample_key"))
        .orderBy(col("sample_key"))
        .limit(64),
    Some("""
      SELECT doc_id, md5(doc_id::VARCHAR) AS sample_key
      FROM documents ORDER BY sample_key LIMIT 64
    """.trim))

  val all: Seq[Q] = Seq(dq10Benford, q65PathTrigrams, j14BloomSemi,
    sampleBottomkMerge)
}
