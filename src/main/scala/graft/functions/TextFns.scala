package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (dedup, quality, lang-id,
  * fingerprinting). All built-ins (codegen'd); the cross-engine hash is
  * `md5` — identical in Spark and DuckDB, which keeps every hash-based
  * operator (minhash, simhash, winnowing) oracle-checkable.
  */
object TextFns {

  /** Lowercased word tokens (non-empty). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** BPE-ish sub-word split: letter runs, digit runs, single punctuation.
    * A cheap stand-in for tokenizer-true counts at 100 TB scan cost.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

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

  /** Sorts above every md5 hex char — the "no shingles seen" sentinel. */
  private val minhashSentinel = "￿"

  /** Full minhash signature (k values), computed in ONE traversal of the
    * shingle array: fold with a k-vector of running minima. The naive
    * k × `array_min(transform(...))` form is 16× slower — Catalyst's
    * CollapseProject inlines the (expensive) shingle-building expression
    * into every one of the k transforms, re-tokenizing the document k
    * times. Empty shingle sets yield nulls (matching `array_min([])`).
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val folded = aggregate(
      shingles,
      array_repeat(lit(minhashSentinel), k),
      (acc, sh) => zip_with(
        acc,
        transform(sequence(lit(0), lit(k - 1)),
          i => md5(concat(i.cast("string"), lit("|"), sh))),
        (a, b) => least(a, b)))
    transform(folded, v => when(v === minhashSentinel, lit(null)).otherwise(v))
  }
}
