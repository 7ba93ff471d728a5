package graft.operators

import graft.SparkSpec

class TokenizerSpec extends SparkSpec {

  // Corpus: "aaab" ×3, "ab" ×2. Round 1 adjacencies: (a,a) 2·3 = 6
  // (overlapping pairs both count, per standard BPE), (a,b) 3+2 = 5 →
  // merge 1 = "a a"→"aa" (6); greedy left-to-right application turns
  // "a a a b" into "aa a b" (ONE merge, not two). Round 2: (aa,a) 3,
  // (a,b) 3+2 = 5 → merge 2 = "a b"→"ab" (5) → "aa ab" ×3, "ab" ×2.
  // Round 3: (aa,ab) 3 → merge 3 = "aa ab"→"aaab" (3).
  private def docsDF = {
    import spark.implicits._
    Seq(
      (1L, "aaab aaab aaab"),
      (2L, "ab ab")
    ).toDF("doc_id", "text")
  }

  test("bpeMerges learns greedy non-overlapping merges with exact counts") {
    val got = Tokenizer.bpeMerges(docsDF, rounds = 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1, "a a", "aa", 6L),
      (2, "a b", "ab", 5L),
      (3, "aa ab", "aaab", 3L)))
  }

  test("bpeSegment applies merges in rank order") {
    import spark.implicits._
    val words = Seq("aaab", "ab", "ba", "aaa").toDF("word")
    val got = Tokenizer.bpeSegment(words, Seq("a a", "a b", "aa ab"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("aaab") === "aaab") // aa + ab, then merged whole
    assert(got("ab") === "ab")
    assert(got("ba") === "b a")    // no merge applies across b-a
    assert(got("aaa") === "aa a")  // greedy non-overlapping first merge
  }

  // WordPiece on the SAME corpus picks a DIFFERENT first merge than BPE:
  // round 1 symbols a=11, b=5; score(a,a) = 6/121 ≈ 0.0496 loses to
  // score(a,b) = 5/55 ≈ 0.0909 even though (a,a)'s raw count 6 > 5 —
  // the likelihood denominator penalizes pairs of frequent parts.
  // Round 2 ("a a ab"×3, "ab"×2): a=6, ab=5; (a,ab) 3/30 = 0.1 beats
  // (a,a) 3/36. Round 3 ("a aab"×3): (a,aab) 3/9.
  test("wordpieceMerges maximizes likelihood score, not raw count") {
    val got = Tokenizer.wordpieceMerges(docsDF, rounds = 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got === Seq(
      (1, "a b", "ab", 5L, 11L, 5L, 0.090909091),
      (2, "a ab", "aab", 3L, 6L, 5L, 0.1),
      (3, "a aab", "aaab", 3L, 3L, 3L, 0.333333333)))
  }

  test("wordpieceSegment takes the longest vocab piece, ## continuation") {
    val got = Tokenizer.wordpieceSegment(
      Seq(("aaab", 3L), ("ab", 2L), ("ba", 1L), ("aaa", 1L)),
      Set("ab", "aab", "aaab"), maxPieceLen = 4)
    assert(got === Seq(
      ("aaab", 3L, "aaab"),          // whole word is a piece
      ("ab", 2L, "ab"),
      ("ba", 1L, "b ##a"),           // no match -> single chars
      ("aaa", 1L, "a ##a ##a")))     // "aa" not in vocab, no greedy skip
  }

  test("charCoverage admits frequent chars and cuts the tail at coverage") {
    import spark.implicits._
    // 'a' ×8, 'b' ×1, 'z' ×1 → at 80% coverage only 'a' makes the
    // alphabet ('b' would start at cum 0.8, the exact boundary).
    val docsDF = Seq("aaaa", "aaaa", "b", "z").toDF("text")
    val rows = Tokenizer.charCoverage(docsDF, coverage = 0.8).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Double]("cum_share"), r.getAs[Boolean]("in_alphabet"))))
      .toMap
    assert(rows("a") == ((8L, 0.8, true)))
    assert(rows("b") == ((1L, 0.9, false)))
    assert(rows("z") == ((1L, 1.0, false)))
    // full coverage admits everything
    val all = Tokenizer.charCoverage(docsDF, coverage = 1.0).collect()
    assert(all.forall(_.getAs[Boolean]("in_alphabet")))
  }
}
