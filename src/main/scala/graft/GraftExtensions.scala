package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{DotProductExpr, LinearScoreExpr, LshBandsExpr, MinhashSigExpr, ShinglesExpr, SimhashExpr, TokenStatsExpr, UrlResolveExpr, WinnowExpr}

/** Session extension registering the engine's custom SQL functions
  * (SURVEY.md §4.3). Use either:
  *   - `SparkSession.builder().withExtensions(new GraftExtensions)` /
  *     `--conf spark.sql.extensions=graft.GraftExtensions`, or
  *   - [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private[graft] val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (UrlResolveExpr.identifier, UrlResolveExpr.info, UrlResolveExpr.builder _),
      (ShinglesExpr.identifier, ShinglesExpr.info, ShinglesExpr.builder _),
      (MinhashSigExpr.identifier, MinhashSigExpr.info, MinhashSigExpr.builder _),
      (LshBandsExpr.identifier, LshBandsExpr.info, LshBandsExpr.builder _),
      (SimhashExpr.identifier, SimhashExpr.info, SimhashExpr.builder _),
      (WinnowExpr.identifier, WinnowExpr.info, WinnowExpr.builder _),
      (DotProductExpr.identifier, DotProductExpr.info, DotProductExpr.builder _),
      (TokenStatsExpr.identifier, TokenStatsExpr.info, TokenStatsExpr.builder _),
      (LinearScoreExpr.identifier, LinearScoreExpr.info, LinearScoreExpr.builder _))

  /** Imperative registration for an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "scala_udf")
    }
}
