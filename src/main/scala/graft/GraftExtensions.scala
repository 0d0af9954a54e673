package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, Md5Hash32}

/** Session extension wiring for the engine's custom expressions, for use
  * via `spark.sql.extensions=graft.GraftExtensions` (production path) —
  * equivalent to [[graft.functions.VectorExpressions.register]] which
  * registers per-session at call sites.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hash32"),
      new ExpressionInfo(classOf[Md5Hash32].getName, "graft_hash32"),
      (exprs: Seq[Expression]) => Md5Hash32(exprs.head)))
  }
}
