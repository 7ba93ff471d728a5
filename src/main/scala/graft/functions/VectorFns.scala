package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns via higher-order
  * functions — no UDF, stays in codegen (SURVEY.md §2.3 EX6). All
  * arithmetic is widened to double *before* accumulation so results are
  * reproducible against the DuckDB oracle.
  */
object VectorFns {

  private def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product (deterministic summation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
