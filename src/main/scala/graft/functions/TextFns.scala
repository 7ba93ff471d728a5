package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (dedup, quality, lang-id,
  * fingerprinting). All built-ins (codegen'd); the cross-engine hash is
  * `md5` — identical in Spark and DuckDB, which keeps every hash-based
  * operator (minhash, simhash, winnowing) oracle-checkable.
  */
object TextFns {

  /** Lowercased word tokens (non-empty). Backed by the native
    * [[graft.functions.expressions.ShinglesExpr]] with n = 1, which is
    * exactly this formula (`filter(split(lower(text), "[^a-z0-9]+"),
    * length > 0)` — parity-tested in TextVectorNativeSpec) without the
    * interpreted `filter` HOF per row.
    */
  def tokens(text: Column): Column =
    graft.functions.expressions.ShinglesExpr.shinglesNative(text, 1)

  /** BPE-ish sub-word split: letter runs, digit runs, single punctuation.
    * A cheap stand-in for tokenizer-true counts at 100 TB scan cost.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Word n-gram shingles straight from text: tokenize (same formula as
    * [[tokens]]) + n-gram build fused into the native
    * [[graft.functions.expressions.ShinglesExpr]] — use this on hot
    * paths; `wordShingles(tokens(text), n)` is the declarative
    * equivalent (kept for composition over precomputed token arrays).
    */
  def textShingles(text: Column, n: Int): Column =
    graft.functions.expressions.ShinglesExpr.shinglesNative(text, n)

  /** Word n-gram shingles: n consecutive tokens joined by a space. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
    .otherwise(array().cast("array<string>"))

  /** One minhash value: lexicographic min of `md5(seed || '|' || shingle)`
    * over the shingle set. Min-of-md5-hex is a valid minwise hash family
    * and is bit-identical across engines.
    */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, sh => md5(concat(lit(s"$seed|"), sh))))

  /** Full minhash signature (k values): `sig[i] = min md5(i + "|" + sh)`
    * over the shingle set, computed by the native
    * [[graft.functions.expressions.MinhashSigExpr]] in one traversal.
    * (History: the naive k × `array_min(transform(...))` form re-tokenized
    * the document k times via CollapseProject — 16× slower; the HOF
    * single-fold replacement was still `CodegenFallback`-interpreted at
    * ~6-14 ms/doc. The native loop is µs/doc with identical semantics.)
    * Empty shingle sets yield all-null entries (matching `array_min([])`).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    graft.functions.expressions.MinhashSigExpr.minhashSigNative(shingles, k)
}
