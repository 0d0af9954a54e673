package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised feature encodings for training-set preparation — the
  * step between the cleaned corpus and the model: turning high-card
  * categoricals into leakage-free numeric features. Both ops are one
  * map-side-combinable aggregate over the fact table plus arithmetic
  * on the tiny (category × fold) frame, so the 100 TB cost is the one
  * scan — the same shape as the dq audits.
  */
object FeatureOps {

  /** K-fold OUT-OF-FOLD target encoding with additive smoothing — the
    * leakage-free form (Micci-Barreca 2001's empirical-Bayes smoothing
    * crossed with CV folding): a row in fold f is encoded from every
    * fold EXCEPT f,
    *
    *   enc(c, f) = (Σ_{¬f} y_c + m · prior_{¬f}) / (n_{¬f,c} + m),
    *   prior_{¬f} = global mean target excluding fold f,
    *
    * so no row's own target ever reaches its own feature — the classic
    * target-leak (encode-then-split overfits exactly the rows that
    * made the mean) is structurally impossible, fold assignment is the
    * caller's md5-deterministic hash, and the (category, fold) table is
    * what a training job broadcast-joins back onto the rows.
    *
    * `targetCol` must be integer-valued (0/1 labels, counts): all
    * sufficient statistics are then exact longs and the encoding is
    * one double division on identical operands in any engine. Output
    * per (category, fold): the OOF count, the excluded-fold prior, and
    * the smoothed encoding (9 dp).
    */
  def targetEncodeOof(df: DataFrame, catCol: String, targetCol: Column,
      foldCol: Column, smoothing: Double = 20.0): DataFrame = {
    val base = df.select(col(catCol).as("cat"),
      targetCol.cast("long").as("__y"), foldCol.cast("long").as("fold"))
    val cf = base.groupBy(col("cat"), col("fold"))
      .agg(count(lit(1)).as("__ncf"), sum(col("__y")).as("__scf"))
    val ct = cf.groupBy(col("cat"))
      .agg(sum(col("__ncf")).as("__nc"), sum(col("__scf")).as("__sc"))
    val ft = cf.groupBy(col("fold"))
      .agg(sum(col("__ncf")).as("__nf"), sum(col("__scf")).as("__sf"))
    val g = cf.agg(sum(col("__ncf")).as("__n"), sum(col("__scf")).as("__s"))
    val prior = (col("__s") - col("__sf")).cast("double") /
      (col("__n") - col("__nf")).cast("double")
    cf.join(broadcast(ct), Seq("cat"))
      .join(broadcast(ft), Seq("fold"))
      .crossJoin(broadcast(g))
      .select(col("cat"), col("fold"),
        (col("__nc") - col("__ncf")).as("n_oof"),
        round(prior, 9).as("prior"),
        round(((col("__sc") - col("__scf")).cast("double") +
          lit(smoothing) * prior) /
          ((col("__nc") - col("__ncf")).cast("double") + lit(smoothing)), 9)
          .as("enc"))
  }

  /** Weight of evidence + information-value terms per category — the
    * credit-scoring-lineage readout of how much a categorical separates
    * a binary target:
    *
    *   woe(c) = ln( ((good_c + ½) / G) / ((bad_c + ½) / B) ),
    *   iv(c)  = ((good_c + ½) / G − (bad_c + ½) / B) · woe(c),
    *
    * with the standard +½ adjustment so empty cells stay finite. Counts
    * are exact longs; the ratios and the ln are IEEE double ops on
    * identical operands, rounded to 9 dp (the `text_dsir_weights` log
    * discipline — engine libm disagreement lives beyond the round).
    */
  def woeIv(df: DataFrame, catCol: String, targetCol: Column): DataFrame = {
    val base = df.select(col(catCol).as("cat"),
      targetCol.cast("long").as("__y"))
    val c = base.groupBy(col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("good"))
      .withColumn("bad", col("n") - col("good"))
    val g = c.agg(sum(col("good")).as("__g"), sum(col("bad")).as("__b"))
    val gr = (col("good").cast("double") + lit(0.5)) / col("__g").cast("double")
    val br = (col("bad").cast("double") + lit(0.5)) / col("__b").cast("double")
    c.crossJoin(broadcast(g))
      .withColumn("woe", round(log(gr / br), 9))
      .select(col("cat"), col("n"), col("good"), col("bad"), col("woe"),
        round((gr - br) * col("woe"), 9).as("iv_term"))
  }
}
