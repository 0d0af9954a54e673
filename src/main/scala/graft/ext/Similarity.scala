package graft.ext

import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star extension surface, SURVEY.md §7.5).
  *
  * Two paths:
  *  - brute force: broadcast the (small) query set against the full
  *    corpus — the exact baseline; one scan, no shuffle of the corpus;
  *  - sign-LSH bucketed: corpus and queries are bucketed by the sign
  *    pattern of leading dimensions (axis-aligned random-hyperplane LSH);
  *    candidates are only same-bucket rows, cutting the scanned fraction
  *    by 2^bits. This is the 100 TB path: the bucket id becomes the
  *    shuffle/partition key and each bucket is a tractable scan.
  */
object Similarity {

  /** Reference formulation via higher-order functions (CodegenFallback;
    * used in tests to cross-check the codegen'd expression).
    */
  def cosineHof(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    val dot = aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(d(a), x => x * x), lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(d(b), x => x * x), lit(0.0), (acc, x) => acc + x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact top-k: broadcast queries × corpus, rank per query.
    * `sim` is rounded to 9 decimals so cross-engine comparison is stable
    * at the last ulp.
    */
  def bruteForceTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    VectorExpressions.register(spark)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(expr("graft_cosine(__qv, __cv)"), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Sign-pattern bucket key over the first `bits` dimensions. */
  def signBucket(vecCol: Column, bits: Int): Column =
    concat((0 until bits).map(i => when(element_at(vecCol, i + 1) > 0f, "1").otherwise("0")): _*)

  /** IVF (inverted-file) ANN: corpus and queries are coarse-quantized to
    * their nearest centroid (broadcast cross + deterministic rank-1), and
    * only the query's list is searched. With c centroids the scanned
    * fraction drops to ~1/c; recall is recovered at scale by probing the
    * p nearest lists instead of 1 (nprobe). Centroids are a small model
    * input — at production scale the argmin would move scan-side over a
    * centroid array literal to avoid the assignment shuffle entirely.
    */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      centIdCol: String, centVecCol: String, k: Int): DataFrame = {
    VectorExpressions.register(spark)
    val cent = centroids.select(col(centIdCol).as("__cid"), col(centVecCol).as("__cv"))
    def assign(df: DataFrame, outId: String, outVec: String): DataFrame = {
      val w = Window.partitionBy(col(outId))
        .orderBy(col("__csim").desc, col("__cid"))
      df.select(col(idCol).as(outId), col(vecCol).as(outVec))
        .crossJoin(broadcast(cent))
        .withColumn("__csim", round(expr(s"graft_cosine($outVec, __cv)"), 9))
        .withColumn("__crn", row_number().over(w))
        .filter(col("__crn") === 1)
        .select(col(outId), col(outVec), col("__cid").as(s"${outId}_list"))
    }
    val q = assign(queries, "query_id", "__qv")
    val c = assign(corpus, "neighbor_id", "__cv2")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q),
        col("query_id_list") === col("neighbor_id_list") &&
          col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(expr("graft_cosine(__qv, __cv2)"), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /** Bucketed ANN: only same-bucket pairs are scored. Misses neighbors
    * across bucket boundaries (that's the approximation); multi-probe or
    * repeated tables recover recall at scale.
    */
  def lshTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int = 4): DataFrame = {
    VectorExpressions.register(spark)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      signBucket(col(vecCol), bits).as("__qb"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      signBucket(col(vecCol), bits).as("__cb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("__qb") === col("__cb") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(expr("graft_cosine(__qv, __cv)"), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }
}
