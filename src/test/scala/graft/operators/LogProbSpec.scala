package graft.operators

import graft.SparkSpec

/** Hand-computed LM-proxy values (the oracle proves cross-engine equality
  * at corpus scale; these prove the math is the math we claim).
  */
class LogProbSpec extends SparkSpec {

  test("unigramLogProb: corpus MLE over all token occurrences") {
    import spark.implicits._
    // corpus tokens: a ×2, b ×1 → total 3
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramLogProb(docs).collect().head
    assert(r.getLong(1) === 3L)
    val want = (2 * math.log(2.0 / 3) + math.log(1.0 / 3)) / 3
    assert(math.abs(r.getDouble(2) - want) < 1e-6)
  }

  test("sourceDivergence: zero for a lone source, symmetric for mirrored skew") {
    import spark.implicits._
    // single source: its distribution IS the corpus → KL exactly 0
    val lone = Seq((1L, "a", "x y z")).toDF("doc_id", "source", "text")
    val r0 = TextAnalysis.sourceDivergence(lone).collect().head
    assert(r0.getString(0) === "a")
    assert(r0.getLong(1) === 3L)
    assert(r0.getDouble(2) === 0.0)
    // two mirrored sources (all-x vs all-y, equal mass): symmetric KL > 0
    val skewed = Seq((1L, "a", "x x x x"), (2L, "b", "y y y y"))
      .toDF("doc_id", "source", "text")
    val rows = TextAnalysis.sourceDivergence(skewed).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("a") === rows("b"))
    assert(rows("a") > 0.0)
  }

  test("bigramLogProb: conditional on the shared prefix across docs") {
    import spark.implicits._
    // d1 = "a b", d2 = "a c": prefix 'a' occurs twice, each bigram once
    // → P(b|a) = P(c|a) = 1/2 → both docs average ln(0.5)
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.bigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(1L)._1 === 1L && rows(2L)._1 === 1L)
    assert(math.abs(rows(1L)._2 - math.log(0.5)) < 1e-6)
    assert(math.abs(rows(2L)._2 - math.log(0.5)) < 1e-6)
  }

  test("bigramLogProb: single-token docs emit no row") {
    import spark.implicits._
    val docs = Seq((1L, "lonely"), (2L, "a b")).toDF("doc_id", "text")
    val ids = TextAnalysis.bigramLogProb(docs).collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }

  test("trigramBackoffScore: all three backoff branches hand-checked") {
    import spark.implicits._
    // reference: one doc "a b c a b d". Counts:
    //   uni: a2 b2 c1 d1 (N=6, V=4); bi: "a b"2 "b c"1 "c a"1 "b d"1;
    //   tri: "a b c"1 "b c a"1 "c a b"1 "a b d"1
    val ref = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    // scored doc exercises each branch once:
    //   "a b c": seen trigram → 1/2  (tri=1, bi12("a b")=2)
    //   "b c x": unseen tri, seen bi23? w23="c x" unseen, w2="c" →
    //            terminal on x: α²·(0+1)/(6+4+1)
    //   "c x a": unseen tri, unseen bi23("x a") → terminal on a:
    //            α²·(2+1)/11 — wait, branch 2 checks bi23 = "x a" unseen
    //            → terminal α²·(uni(a)+1)/(N+V+1) = α²·3/11
    val doc = Seq((1L, "a b c x a")).toDF("doc_id", "text")
    // trigrams of scored doc: "a b c", "b c x", "c x a"
    val a = 0.4
    val want = (math.log(1.0 / 2) +
      math.log(a * a * 1.0 / 11) +
      math.log(a * a * 3.0 / 11)) / 3
    val r = TextAnalysis.trigramBackoffScore(doc, ref, alpha = a)
      .collect().head
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - want) < 1e-6)
    assert(math.abs(r.getDouble(3) - math.exp(-want)) < 1e-4)
  }

  test("trigramBackoffScore: bigram-backoff branch uses bi23/uni2") {
    import spark.implicits._
    // reference has bigram "b c" but no trigram "x b c":
    //   S(c | x b) = α · bi("b c")/uni(b) = 0.4 · 1/2
    val ref = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val doc = Seq((1L, "x b c")).toDF("doc_id", "text")
    val want = math.log(0.4 * 1.0 / 2)
    val r = TextAnalysis.trigramBackoffScore(doc, ref).collect().head
    assert(r.getLong(1) === 1L)
    assert(math.abs(r.getDouble(2) - want) < 1e-6)
  }

  test("trigramBackoffScore: repeated trigrams weight the mean by occurrence") {
    import spark.implicits._
    val ref = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    // doc "a b c a b c a b c": trigram stream has "a b c"×3 plus the
    // bridge trigrams; engine reduces to distinct trigrams with n_occ
    // and must weight by n_occ — compare against a per-occurrence mean.
    val doc = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.trigramBackoffScore(doc, ref).collect().head
    assert(r.getLong(1) === 7L) // 9 tokens → 7 trigrams
    // independent per-occurrence recomputation in scala
    val uni = Map("a" -> 2L, "b" -> 2L, "c" -> 2L)
    val bi = Map("a b" -> 2L, "b c" -> 2L, "c a" -> 1L)
    val tri = Map("a b c" -> 2L, "b c a" -> 1L, "c a b" -> 1L)
    val n = 6.0; val v = 3.0; val al = 0.4
    def s(t: String): Double = {
      val p = t.split(" ")
      tri.get(t).map(_.toDouble / bi(p(0) + " " + p(1)))
        .orElse(bi.get(p(1) + " " + p(2)).map(al * _.toDouble / uni(p(1))))
        .getOrElse(al * al * (uni.getOrElse(p(2), 0L) + 1.0) / (n + v + 1))
    }
    val stream = Seq("a b c", "b c a", "c a b", "a b c", "b c a", "c a b", "a b c")
    val want = stream.map(t => math.log(s(t))).sum / stream.size
    assert(math.abs(r.getDouble(2) - want) < 1e-6)
  }

  test("perplexityGate: keeps low-ppl docs and reports per-source shares") {
    import spark.implicits._
    val ref = Seq((100L, "src0", "a b c a b c a b c a b c"))
      .toDF("doc_id", "source", "text")
    val docs = Seq(
      (1L, "src0", "a b c a b c"),   // in-domain → low ppl
      (2L, "srcX", "q r s t u v"),   // all-OOV → high ppl
      (3L, "srcX", "a b c a b c")    // in-domain text under srcX
    ).toDF("doc_id", "source", "text")
    val all = ref.union(docs)
    val gate = TextAnalysis.perplexityGate(
      all, all.filter($"source" === "src0"), maxPpl = 50.0)
    val rows = gate.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("src0")._1 === 2L && rows("src0")._2 === 2L)
    assert(rows("srcX") === ((2L, 1L))) // doc 3 kept, doc 2 dropped
  }
}
