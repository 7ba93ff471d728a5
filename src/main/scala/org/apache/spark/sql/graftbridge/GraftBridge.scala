package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` access bridge for the graft engine's custom
  * Catalyst expressions (the standard pattern for Spark extension
  * libraries): Column ⇄ Expression conversion and the input-type
  * alias, nothing else. Lives in the org.apache.spark.sql namespace
  * solely for visibility; keep this file tiny.
  */
object GraftBridge {

  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  /** `TypeCollection` is `private[sql]`; expression input-type lists that
    * accept several concrete types (e.g. array<float> natively, no
    * per-row implicit cast) need it. */
  def typeCollection(ts: AbstractDataType*): AbstractDataType =
    org.apache.spark.sql.types.TypeCollection(ts: _*)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
