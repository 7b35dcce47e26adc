package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{DotProductF, ShingleExpr}

/** Spark-native integration point: inject graft's custom Catalyst
  * expressions into any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`), making them
  * available to pure-SQL users:
  *
  *   SELECT graft_dot_f(a.embedding, b.embedding) FROM ...
  *   SELECT explode(graft_shingles(text, 3)) FROM docs
  *
  * Column-API callers don't need this — graft.functions.* builds the same
  * expressions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    ext.injectFunction((
      FunctionIdentifier("graft_dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot_f"),
      (children: Seq[Expression]) => DotProductF(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleExpr].getName, "graft_shingles"),
      (children: Seq[Expression]) => children(1) match {
        case e if e.foldable =>
          ShingleExpr(children.head, e.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException("graft_shingles(text, n): n must be a literal")
      }))
  }
}
