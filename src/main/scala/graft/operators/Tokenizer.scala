package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Iterate.MaterializeOps

/** Tokenizer INDUCTION over the corpus — byte-pair-encoding merge
  * learning (Sennrich et al. 2016), the step that turns a raw corpus
  * into a subword vocabulary before any LLM training run.
  *
  * Scale shape: the corpus is scanned EXACTLY ONCE, into the weighted
  * word-count table (the classic BPE reduction — merge learning never
  * looks at documents again, only at the vocabulary, which is zipf-
  * bounded: ~millions of rows at 100 TB, not corpus-sized). Every merge
  * round is then (1) a partial-aggregable pair-count groupBy over the
  * vocab, (2) a single-row argmax action, (3) a narrow string rewrite of
  * the symbol sequences — driver-looped like PageRank's power
  * iterations, with a localCheckpoint every [[MergeCutEvery]] rounds to
  * truncate lineage.
  */
object Tokenizer {

  /** Symbol sequences are space-joined with a DOUBLE separator ("h  i"),
    * so applying a merge is a plain left-to-right `replace` of
    * "a  b" → "ab": each boundary owns its two spaces, which makes the
    * non-regex replace consume exactly one boundary per occurrence —
    * reproducing BPE's greedy non-overlapping merge ("a a a" → "aa a")
    * with no lookaround regex (which DuckDB's RE2 oracle could not run).
    */
  private val SEP = "  "

  /** Merge rounds between lineage cuts (r20): rounds chain their symbol
    * rewrites as nested replace() projections over the last cut frame —
    * one Spark job per round instead of two. Eight nested narrow string
    * rewrites over the zipf-bounded vocab are cheaper than a checkpoint
    * write+read each round; the periodic cut keeps 10k-round trainings
    * plan-bounded.
    */
  private val MergeCutEvery = 8

  /** Adjacent symbol pairs of a double-space-joined sequence, each pair
    * itself double-space-joined. Words of one symbol yield no pairs.
    */
  private def pairsOf(seqStr: org.apache.spark.sql.Column) = {
    val syms = split(seqStr, SEP)
    val n = size(syms)
    zip_with(slice(syms, lit(1), greatest(n - 1, lit(0))),
      slice(syms, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(SEP), b))
  }

  /** The weighted word-count table: one corpus scan, then vocab-sized. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Learn the first `rounds` BPE merges. Returns one row per merge:
    * (merge_rank, pair, merged, pair_count) — `pair` single-space-joined
    * for display, `pair_count` the weighted adjacency count that won the
    * round. Ties break to the lexicographically smallest pair, making
    * the merge sequence a pure function of the corpus.
    */
  def bpeMerges(docs: DataFrame, rounds: Int, textCol: String = "text",
      wc0: Option[DataFrame] = None): DataFrame = {
    // wc0 (r20): a caller that ALSO needs the word-count table (the
    // segment queries decode the top-k words) passes its materialized
    // copy, so the corpus is tokenized once per query, not once per use
    val wc = wc0.getOrElse(wordCounts(docs, textCol))
    // Char-level initial symbol sequence. Spark's split(-1 limit) keeps a
    // trailing empty string — filter it (DuckDB's string_split does not).
    var seqs = wc.select(col("cnt"),
      array_join(filter(split(col("word"), ""), s => length(s) > 0), SEP).as("s"))
      .materialized
    // r20 (guide §1.2 fewer actions): a merge round no longer cuts the
    // re-written sequences — each round's pick scans the ONE
    // materialized vocab frame with the applied merges CHAINED as
    // nested replace() (Catalyst collapses the projections; replace on
    // a short symbol string is narrow, vocab-bounded work), halving the
    // loop's Spark jobs (2/round → 1/round). Lineage is re-cut every
    // [[MergeCutEvery]] rounds so long trainings stay plan-bounded.
    var sinceCut = 0

    val picks = (1 to rounds).map { r =>
      val Row(pair: String, cnt: Long) = seqs
        .select(col("cnt"), explode(pairsOf(col("s"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("c"))
        .agg(min_by(struct(col("pair"), col("c")),
          struct((-col("c")).as("neg"), col("pair"))).as("best"))
        .select(col("best.pair"), col("best.c")).head()
      val merged = pair.replace(SEP, "")
      seqs = seqs.select(col("cnt"),
        replace(col("s"), lit(pair), lit(merged)).as("s"))
      sinceCut += 1
      if (sinceCut >= MergeCutEvery) { seqs = seqs.materialized; sinceCut = 0 }
      (r, pair.replace(SEP, " "), merged, cnt)
    }

    val spark = docs.sparkSession
    import spark.implicits._
    picks.toDF("merge_rank", "pair", "merged", "pair_count")
  }

  /** Segment words with a learned merge list: apply each merge in rank
    * order to the char sequence — the inference half of BPE. Returns
    * (word, segmented) with segments single-space-joined.
    */
  def bpeSegment(words: DataFrame, merges: Seq[String],
      wordCol: String = "word"): DataFrame = {
    val init = array_join(
      filter(split(col(wordCol), ""), s => length(s) > 0), SEP)
    val seg = merges.foldLeft(init) { (s, pair) =>
      val p = pair.replace(" ", SEP)
      replace(s, lit(p), lit(p.replace(SEP, "")))
    }
    words.withColumn("segmented", regexp_replace(seg, SEP, " "))
  }

  /** Unigram-LM piece inventory (the SentencePiece unigram model's
    * closed-form core): candidate pieces are every substring of length
    * 1..`maxPieceLen` of every corpus word, weighted by word count; the
    * kept vocabulary is EVERY single character (full coverage — any word
    * stays segmentable) plus the `topPieces` multi-char pieces by
    * weighted count; each kept piece gets cost −ln(cnt/total) over the
    * kept set. This is the trained artifact [[unigramSegment]]'s Viterbi
    * decoder consumes.
    *
    * Scale shape: one corpus scan into the zipf-bounded word-count
    * table; candidate fan-out is ≤ `maxWordLen`·`maxPieceLen` per
    * VOCAB row (narrow HOF, never corpus-sized); piece counts are a
    * partial-aggregable groupBy and the multi-char cut is
    * TakeOrderedAndProject. Piece starts are capped at `maxWordLen` so
    * the fan-out has a hard bound on pathological tokens.
    */
  def unigramPieces(docs: DataFrame, maxPieceLen: Int = 4,
      topPieces: Int = 40, maxWordLen: Int = 64,
      textCol: String = "text", wc0: Option[DataFrame] = None): DataFrame = {
    val wc = wc0.getOrElse(wordCounts(docs, textCol)) // see bpeMerges.wc0
    val subs = wc.select(col("cnt"), explode(
      flatten(transform(
        sequence(lit(0), least(length(col("word")), lit(maxWordLen)) - 1),
        i => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - i)),
          l => col("word").substr(i + lit(1), l))))).as("piece"))
    val counts = subs.groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
      .materialized // vocab-bounded; feeds both branches + the total
    val singles = counts.filter(length(col("piece")) === 1)
    val multis = counts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(topPieces)
    val kept = singles.unionByName(multis).materialized
    val tot = kept.agg(sum(col("cnt")).cast("double").as("total"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        (floor((-log(col("cnt") / col("total"))) * 1e6 + 0.5) / 1e6).as("nlp"))
  }

  /** Viterbi segmentation of a bounded word list under the
    * [[unigramPieces]] cost table: best[j] = min over splits of
    * best[i] + cost(word[i..j)), each partial sum rounded to 6 places,
    * ties → smallest split point i — so the decode is a pure function
    * of (word, piece table) that a SQL oracle replays by unrolling the
    * DP one position per CTE. Driver-side by design: both inputs are
    * model artifacts (top-k words, charset+topPieces costs), the
    * [[bpeSegment]]/k-center-refine precedent.
    *
    * @return (word, cnt, segmented, vit_cost) per input word.
    */
  def unigramSegment(topWords: Seq[(String, Long)],
      pieces: Map[String, Double], maxPieceLen: Int = 4)
      : Seq[(String, Long, String, Double)] = {
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    topWords.map { case (w, cnt) =>
      val n = w.length
      val cost = Array.fill(n + 1)(Double.NaN)
      val seg = Array.fill(n + 1)("")
      cost(0) = 0.0
      for (j <- 1 to n) {
        var bestCost = Double.NaN
        var bestI = -1
        var bestPiece = ""
        for (i <- math.max(0, j - maxPieceLen) until j) {
          if (!cost(i).isNaN) {
            val p = w.substring(i, j)
            pieces.get(p).foreach { nlp =>
              val c = r6(cost(i) + nlp)
              if (bestI < 0 || c < bestCost) {
                bestCost = c; bestI = i; bestPiece = p
              }
            }
          }
        }
        if (bestI >= 0) {
          cost(j) = bestCost
          seg(j) = if (seg(bestI).isEmpty) bestPiece
            else seg(bestI) + " " + bestPiece
        }
      }
      (w, cnt, seg(n), cost(n))
    }
  }

  /** WordPiece merge learning (Schuster & Nakajima 2012; the trainer
    * behind BERT's tokenizer) — the THIRD induction family next to BPE
    * and unigram-LM. Identical loop shape to [[bpeMerges]] but the round
    * winner maximizes the likelihood gain
    * `score = count(pair) / (count(left) · count(right))` instead of raw
    * adjacency count, which prefers pairs whose parts rarely occur
    * apart. Ties break on (score desc, pair asc); scores are rounded to
    * 9 places so the argmax is a pure function of the corpus that a SQL
    * oracle replays exactly.
    *
    * Scale shape: same as BPE — one corpus scan into the zipf-bounded
    * word-count table, then per round one pair-count groupBy, one
    * symbol-count groupBy (both partial-aggregable over the VOCAB, never
    * the corpus), a shuffle join of pair→symbol counts (vocab-sized both
    * sides), a single-row argmax action, and a narrow rewrite.
    *
    * @return one row per merge:
    *   (merge_rank, pair, merged, pair_count, left_count, right_count,
    *    score).
    */
  def wordpieceMerges(docs: DataFrame, rounds: Int,
      textCol: String = "text", wc0: Option[DataFrame] = None): DataFrame = {
    val wc = wc0.getOrElse(wordCounts(docs, textCol)) // see bpeMerges.wc0
    var seqs = wc.select(col("cnt"),
      array_join(filter(split(col("word"), ""), s => length(s) > 0), SEP).as("s"))
      .materialized
    // merges chain as nested replace() between cuts — see [[bpeMerges]]
    var sinceCut = 0

    val picks = (1 to rounds).map { r =>
      val syms = seqs
        .select(col("cnt"), explode(split(col("s"), SEP)).as("sym"))
        .groupBy(col("sym")).agg(sum(col("cnt")).as("sc"))
      val pairs = seqs
        .select(col("cnt"), explode(pairsOf(col("s"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("pc"))
        .withColumn("l", split(col("pair"), SEP).getItem(0))
        .withColumn("r", split(col("pair"), SEP).getItem(1))
      // Counts to double BEFORE the product: two vocab counts multiplied
      // as longs can overflow at corpus scale.
      val scored = pairs
        .join(syms.withColumnRenamed("sym", "l")
          .withColumnRenamed("sc", "lc"), Seq("l"))
        .join(syms.withColumnRenamed("sym", "r")
          .withColumnRenamed("sc", "rc"), Seq("r"))
        .withColumn("score", (floor((col("pc") / (col("lc").cast("double") * col("rc"))) * 1e9 + 0.5) / 1e9))
      val Row(pair: String, pc: Long, lc: Long, rc: Long, score: Double) =
        scored.agg(min_by(
            struct(col("pair"), col("pc"), col("lc"), col("rc"), col("score")),
            struct((-col("score")).as("neg"), col("pair"))).as("best"))
          .select(col("best.pair"), col("best.pc"), col("best.lc"),
            col("best.rc"), col("best.score")).head()
      val merged = pair.replace(SEP, "")
      seqs = seqs.select(col("cnt"),
        replace(col("s"), lit(pair), lit(merged)).as("s"))
      sinceCut += 1
      if (sinceCut >= MergeCutEvery) { seqs = seqs.materialized; sinceCut = 0 }
      (r, pair.replace(SEP, " "), merged, pc, lc, rc, score)
    }

    val spark = docs.sparkSession
    import spark.implicits._
    picks.toDF("merge_rank", "pair", "merged", "pair_count",
      "left_count", "right_count", "score")
  }

  /** WordPiece greedy longest-match-first segmentation (BERT's
    * `tokenize()`): at each position take the LONGEST vocabulary piece
    * that matches, advance, repeat; non-initial pieces are rendered with
    * the `##` continuation prefix. Driver-side over a bounded word list,
    * the [[unigramSegment]] precedent — both inputs are model artifacts.
    * Single characters are always in the vocab (full coverage), so the
    * greedy walk never strands. This simplified form keeps one
    * position-agnostic vocabulary (real WordPiece trains separate
    * initial/continuation inventories — a display-prefix difference
    * here, not a matching difference).
    *
    * @return (word, cnt, segmented) per input word.
    */
  def wordpieceSegment(topWords: Seq[(String, Long)], vocab: Set[String],
      maxPieceLen: Int): Seq[(String, Long, String)] =
    topWords.map { case (w, cnt) =>
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        var l = math.min(maxPieceLen, w.length - i)
        while (l > 1 && !vocab.contains(w.substring(i, i + l))) l -= 1
        val piece = w.substring(i, i + l)
        parts += (if (i == 0) piece else "##" + piece)
        i += l
      }
      (w, cnt, parts.mkString(" "))
    }

  /** Character-coverage table — SentencePiece's alphabet-selection
    * preprocessing (its `character_coverage` knob): corpus character
    * frequencies, each character's cumulative share in frequency order,
    * and whether it makes the alphabet at the requested coverage (chars
    * are admitted most-frequent-first until the running total passes
    * `coverage`; everything after maps to <unk>/byte fallback).
    *
    * Scale shape: one explode pass into a groupBy whose key space is the
    * CHARSET — bounded by unicode, in practice a few thousand rows — so
    * the global (unpartitioned) ranking window that follows runs over an
    * alphabet-sized frame, never the corpus. Ties rank deterministically
    * (count desc, codepoint asc).
    *
    * @return (ch, cnt, cum_share, in_alphabet) ordered by rank.
    */
  def charCoverage(docs: DataFrame, coverage: Double = 0.9995,
      textCol: String = "text"): DataFrame = {
    val freq = docs
      .select(explode(split(lower(col(textCol)), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("ch")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).cast("double").as("total"))
    val byRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("ch").asc)
    freq.crossJoin(broadcast(tot))
      .withColumn("cum", sum(col("cnt")).over(byRank))
      .select(col("ch"), col("cnt"),
        (floor((col("cum") / col("total")) * 1e6 + 0.5) / 1e6).as("cum_share"),
        ((col("cum") - col("cnt")) < col("total") * lit(coverage))
          .as("in_alphabet"))
      .orderBy(col("cnt").desc, col("ch").asc)
  }
}
