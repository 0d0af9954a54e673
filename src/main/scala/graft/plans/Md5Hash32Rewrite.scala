package graft.plans

import graft.functions.Md5Hash32
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Optimizer rewrite: recognizes the portable md5-hash formulation
  *
  *   cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)
  *
  * (the cross-engine spelling documented in SURVEY §7 and used by the
  * DuckDB oracles) and replaces it with the fused codegen'd
  * [[graft.functions.Md5Hash32]] — one digest, no hex-string
  * round-trips. Values are bit-identical (pinned by ExtOpsSpec), so the
  * rewrite is a pure physical win: users who write the documented
  * portable SQL get the fast kernel automatically.
  *
  * Registered through GraftExtensions (injectOptimizerRule — the
  * production `spark.sql.extensions` path) and available for
  * per-session installation via [[Md5Hash32Rewrite.install]]
  * (experimentalMethods), since `spark.sql.extensions` is a static conf.
  */
object Md5Hash32Rewrite extends Rule[LogicalPlan] {

  private object PortableMd5Chain {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(Conv(Substring(Md5(strInput), Literal(1, _), Literal(8, _)),
            Literal(from, _), Literal(to, _), _), LongType, _, _)
          if from == 16 && to == 10 =>
        strInput match {
          // md5 over an explicit string→binary cast: hash the string
          case Cast(s, BinaryType, _, _) if s.dataType == StringType => Some(s)
          case s if s.dataType == StringType => Some(s)
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case PortableMd5Chain(s) => Md5Hash32(s)
    }

  /** Installs the rule into an already-built session (extraOptimizations
    * run after the main optimizer batch — sufficient for this rewrite).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.contains(this))
      em.extraOptimizations = em.extraOptimizations :+ this
  }
}
