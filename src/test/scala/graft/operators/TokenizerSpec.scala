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
