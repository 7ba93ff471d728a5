package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** piiRedact branch coverage on PII-bearing literals — the driver corpus
  * is clean, so the oracle comparison alone can't prove the patterns —
  * plus packing/sentence-dedup invariants.
  */
class PiiSpec extends SparkSpec {

  private def redact(s: String): (String, Long, Long, Long) = {
    import spark.implicits._
    val r = Seq((1L, s)).toDF("doc_id", "text")
      .select(TextAnalysis.piiRedactText(col("text")).as("t"),
        size(regexp_extract_all(col("text"), lit(TextAnalysis.piiEmailRe), lit(0))).cast("long"),
        size(regexp_extract_all(col("text"), lit(TextAnalysis.piiIpv4Re), lit(0))).cast("long"),
        size(regexp_extract_all(col("text"), lit(TextAnalysis.piiPhoneRe), lit(0))).cast("long"))
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("e-mail addresses are masked and counted") {
    assert(redact("mail a.b+tag@ex-ample.co.uk now") === ("mail <EMAIL> now", 1L, 0L, 0L))
  }

  test("IPv4 addresses are masked and counted") {
    assert(redact("host 192.168.0.1 and 10.0.0.255.") === ("host <IP> and <IP>.", 0L, 2L, 0L))
  }

  test("phone numbers: E.164 and US dashed forms") {
    assert(redact("call +442071234567 or 415-555-0199 x2")
      === ("call <PHONE> or <PHONE> x2", 0L, 0L, 2L))
  }

  test("mixed PII redacts in email->ip->phone order without re-matching") {
    val (t, e, i, p) = redact("a@b.com at 1.2.3.4 tel +12345678")
    assert(t === "<EMAIL> at <IP> tel <PHONE>")
    assert((e, i, p) === (1L, 1L, 1L))
  }

  test("clean text is unchanged with zero counts") {
    assert(redact("no secrets here") === ("no secrets here", 0L, 0L, 0L))
  }

  test("sentence dedup keeps first occurrence and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta. gamma delta. unique one"),
      (2L, "gamma delta. second own text"),
      (3L, "alpha beta. gamma delta")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSentences(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 owns all 3 of its sentences; doc 2 loses "gamma delta" but
    // keeps its own; doc 3 owns nothing and vanishes
    assert(got === Map(1L -> 3L, 2L -> 1L))
  }

  test("within-doc sentence dedup keeps first occurrences, doc-local only") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    val docs = Seq(
      (1L, "a b. c d. a b. e f. c d"),   // repeats stripped, order kept
      (2L, "a b. x y"),                  // duplicates doc 1 — must NOT matter
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"), split(col("text"), "\\Q. \\E").as("sents"))
      .select(col("doc_id"), TextAnalysis.dedupSentencesInDoc(col("sents")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a b. c d. e f", 2L -> "a b. x y", 3L -> "solo"))
  }

  test("sequence packing: budgets respected at bucket granularity, totals preserved") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, ("tok " * ((i % 7).toInt + 1)).trim)).toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(docs, budgetTokens = 10, nBuckets = 4).collect()
    val totalTokens = packed.map(_.getLong(3)).sum
    assert(totalTokens === (1L to 40L).map(_ % 7 + 1).sum, "no tokens lost or duplicated")
    // every sequence starts below the budget boundary by construction:
    // n_docs >= 1 and all but the last doc of a sequence fit the budget
    assert(packed.forall(_.getLong(2) >= 1L))
    // deterministic: same input → identical packing
    val again = TextAnalysis.packSequences(docs, budgetTokens = 10, nBuckets = 4).collect()
    assert(packed.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }
}
