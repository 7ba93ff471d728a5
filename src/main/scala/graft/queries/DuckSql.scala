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
  def shingles3(toksExpr: String): String = shingles(toksExpr, 3)

  /** Mirrors TextFns.wordShingles(n) / ShinglesExpr for any n. */
  def shingles(toksExpr: String, n: Int): String = {
    val joined = (0 until n).map(j => s"($toksExpr)[i+$j]").mkString(" || ' ' || ")
    s"""CASE WHEN len($toksExpr) >= $n
       | THEN list_transform(range(1, len($toksExpr) - ${n - 2}),
       |   i -> $joined)
       | ELSE [] END""".stripMargin
  }

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

  /** The full minhash-LSH CTE chain over any relation with (doc_id, text):
    * shingled → sigs → banded → candidate pairs → rounded exact-Jaccard
    * (`verified`). Thresholds compare against the ROUNDED jaccard,
    * matching Dedup.jaccardVerify exactly. Empty-shingle docs produce
    * all-NULL band hashes, which the equality self-join drops — the same
    * "token-poor docs never pair" outcome as LshBandsExpr's empty array.
    *
    * @param candsWhere predicate over banded sides `x` (pair column `a`)
    *                   and `y` (pair column `b`); the default replays the
    *                   self-join's ordered-pair form, and cross-batch
    *                   oracles substitute side-membership predicates
    *                   (replaying Dedup.incrementalNearDups).
    */
  def lshChain(src: String, n: Int, k: Int, bands: Int,
      candsWhere: String = "x.doc_id < y.doc_id"): String = {
    val mins = (0 until k).map(i => minhash("shingles", i)).mkString(",\n    ")
    val bandHashes = (0 until bands).map { b =>
      val parts = (0 until k / bands).map(r => s"sig[${b * (k / bands) + r + 1}]")
      s"md5(${parts.mkString(" || '|' || ")})"
    }.mkString(",\n    ")
    s"""shingled AS (
       |  SELECT doc_id, ${shingles("toks", n)} AS shingles
       |  FROM (SELECT doc_id, ${tokens("text")} AS toks FROM $src)),
       |sigs AS (
       |  SELECT doc_id, shingles, [
       |    $mins] AS sig
       |  FROM shingled),
       |banded AS (
       |  SELECT doc_id, generate_subscripts(bh, 1) - 1 AS band_id, unnest(bh) AS band_hash
       |  FROM (SELECT doc_id, [
       |    $bandHashes] AS bh FROM sigs)),
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM banded x JOIN banded y
       |    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
       |  WHERE $candsWhere),
       |dsets AS (SELECT doc_id, list_distinct(shingles) AS sh FROM sigs),
       |verified AS (
       |  SELECT c.a, c.b,
       |    (floor((CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE) /
       |      (len(sa.sh) + len(sb.sh) - len(list_filter(sa.sh, x -> list_contains(sb.sh, x))))) * 1e6 + 0.5) / 1e6) AS jaccard
       |  FROM cands c JOIN dsets sa ON c.a = sa.doc_id JOIN dsets sb ON c.b = sb.doc_id)""".stripMargin
  }

  /** Connected components over `verified` pairs at a threshold: recursive
    * min-label reachability (requires WITH RECURSIVE in the outer query).
    */
  def componentCtes(threshold: Double): String =
    s"""pairs AS (SELECT a, b FROM verified WHERE jaccard >= $threshold),
       |edges AS (SELECT a AS src, b AS dst FROM pairs
       |          UNION ALL SELECT b, a FROM pairs),
       |reach AS (
       |  SELECT src AS v, src AS l FROM edges
       |  UNION
       |  SELECT e.src, r.l FROM edges e JOIN reach r ON e.dst = r.v),
       |comp AS (SELECT v AS doc_id, min(l) AS cluster_rep FROM reach GROUP BY v)""".stripMargin
}
