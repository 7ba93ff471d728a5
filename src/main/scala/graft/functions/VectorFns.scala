package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, backed by the
  * native [[graft.functions.expressions.DotProductExpr]] (SURVEY.md §2.3
  * EX6) — the earlier HOF (`aggregate`/`zip_with`) forms were
  * `CodegenFallback`-interpreted, ~128 tree nodes per dim-64 row. All
  * arithmetic is widened to double *before* accumulation (the expression's
  * implicit input cast) so results are reproducible against the DuckDB
  * oracle; summation order is the same sequential left-to-right fold.
  */
object VectorFns {

  import graft.functions.expressions.DotProductExpr.dotNative

  /** Sequential-fold dot product (deterministic summation order). */
  def dot(a: Column, b: Column): Column = dotNative(a, b)

  def norm(a: Column): Column = sqrt(dotNative(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
