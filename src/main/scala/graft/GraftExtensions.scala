package graft

import graft.functions.VectorExpressions.{CosineSim, DotProduct, L2Sq}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Session-extension entry point — deploy-time registration of the engine's
 * native functions (ladder step (c) registration surface):
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * }}}
 *
 * or programmatically: `SparkSession.builder().withExtensions(new GraftExtensions)`.
 * No resolution rules or planner strategies are injected: every operator in
 * this engine composes from built-in plans (SURVEY §7.3's prediction, borne
 * out in round 1) — the extension point stays minimal on purpose.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2Sq].getName, "graft_l2sq"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2Sq(exprs.head, exprs(1))))
  }
}
