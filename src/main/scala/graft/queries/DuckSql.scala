package graft.queries

/** DuckDB SQL snippet builders mirroring graft.functions.TextFns /
  * VectorFns semantics exactly (same tokenization regex, same md5 hashing,
  * same double-widening) so generated oracles can't drift from the Spark
  * implementations.
  */
object DuckSql {

  /** Mirrors TextFns.tokens. */
  def tokens(textExpr: String): String =
    s"list_filter(string_split_regex(lower($textExpr), '[^a-z0-9]+'), t -> len(t) > 0)"

  /** Mirrors TextFns.wordShingles(n=3) over a token-list expression. */
  def shingles3(toksExpr: String): String =
    s"""CASE WHEN len($toksExpr) >= 3
       | THEN list_transform(range(1, len($toksExpr) - 1),
       |   i -> ($toksExpr)[i] || ' ' || ($toksExpr)[i+1] || ' ' || ($toksExpr)[i+2])
       | ELSE [] END""".stripMargin

  /** Mirrors TextFns.minhash(seed). */
  def minhash(shinglesExpr: String, seed: Int): String =
    s"list_min(list_transform($shinglesExpr, sh -> md5('$seed|' || sh)))"

  /** Double-widened list for vector math (mirrors VectorFns.asDouble). */
  def vecDouble(embExpr: String): String =
    s"list_transform($embExpr, x -> CAST(x AS DOUBLE))"

  /** Mirrors VectorFns.cosine over double lists. */
  def cosine(a: String, b: String): String =
    s"(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))))"

  /** A DuckDB list literal of doubles, e.g. [1.0, -1.0, ...]. */
  def doubleList(xs: Seq[Double]): String =
    xs.map(x => if (x == x.floor) f"$x%.1f" else x.toString).mkString("[", ", ", "]")
}
