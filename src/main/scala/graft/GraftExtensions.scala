package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.expressions.{DotProductExpr, MinhashSigExpr, UrlResolveExpr}

/** Session extension registering the engine's custom SQL functions
  * (SURVEY.md §4.3). Use either:
  *   - `SparkSession.builder().withExtensions(new GraftExtensions)` /
  *     `--conf spark.sql.extensions=graft.GraftExtensions`, or
  *   - [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((UrlResolveExpr.identifier, UrlResolveExpr.info,
      UrlResolveExpr.builder _))
    ext.injectFunction((MinhashSigExpr.identifier, MinhashSigExpr.info,
      MinhashSigExpr.builder _))
    ext.injectFunction((DotProductExpr.identifier, DotProductExpr.info,
      DotProductExpr.builder _))
  }
}

object GraftExtensions {
  /** Imperative registration for an already-built session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      UrlResolveExpr.identifier.funcName, UrlResolveExpr.builder _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinhashSigExpr.identifier.funcName, MinhashSigExpr.builder _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotProductExpr.identifier.funcName, DotProductExpr.builder _, "scala_udf")
  }
}
