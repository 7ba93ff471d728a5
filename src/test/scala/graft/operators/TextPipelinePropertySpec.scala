package graft.operators

import java.security.MessageDigest

import scala.util.Random

import graft.SparkSpec

/** Seeded-random property tests for the newest pipeline operators,
  * against independent plain-Scala models (same style as GlobsSpec):
  * sentence dedup must keep exactly the first occurrence of every
  * sentence and reassemble in order; sequence packing must never lose or
  * duplicate tokens and must honor the hash-bucket cumsum rule.
  */
class TextPipelinePropertySpec extends SparkSpec {

  private val rnd = new Random(20260812)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("dedupSentences matches the first-occurrence model on random corpora") {
    import spark.implicits._
    val vocab = Seq("alpha beta", "gamma", "delta epsilon zeta", "eta", "")
    val docs = (1L to 60L).map { id =>
      val n = rnd.nextInt(5)
      val text = (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(". ")
      (id, text)
    }
    // model: first occurrence of each sentence by (doc_id, pos) over
    // split(text, ". ", -1) — same limit -1 semantics as Spark's split
    val owned = scala.collection.mutable.Map[String, (Long, Int)]()
    for ((id, text) <- docs; (s, pos) <- text.split("\\Q. \\E", -1).zipWithIndex)
      if (!owned.contains(s)) owned(s) = (id, pos)
    val expected = docs.flatMap { case (id, text) =>
      val kept = text.split("\\Q. \\E", -1).zipWithIndex
        .filter { case (s, pos) => owned(s) == ((id, pos)) }
      if (kept.isEmpty) None
      else Some(id -> ((kept.length.toLong, md5hex(kept.map(_._1).mkString(". ")))))
    }.toMap

    val got = Dedup.dedupSentences(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === expected)
  }

  test("packSequences preserves totals and honors the bucket-cumsum rule on random corpora") {
    import spark.implicits._
    val docs = (1L to 80L).map { id =>
      (id, Seq.fill(rnd.nextInt(9))("w" + rnd.nextInt(5)).mkString(" "))
    }
    for (budget <- Seq(1, 7, 64); nBuckets <- Seq(1, 8)) {
      // model: bucket = first-8-hex-digits-of-md5(id) % nBuckets; docs in
      // id order per bucket; seq = floor(start_token / budget)
      val modeled = docs.map { case (id, text) =>
        val toks = text.split("[^a-z0-9]+").count(_.nonEmpty).toLong
        val bucket = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % nBuckets
        (bucket, id, toks)
      }.groupBy(_._1).toSeq.flatMap { case (bucket, ds) =>
        var cum = 0L
        ds.sortBy(_._2).map { case (_, _, t) =>
          val seq = cum / budget; cum += t; (bucket, seq, t)
        }
      }
      val expected = modeled.groupBy(p => (p._1, p._2))
        .map { case ((b, s), xs) => (b, s) -> ((xs.size.toLong, xs.map(_._3).sum)) }

      val got = TextAnalysis.packSequences(docs.toDF("doc_id", "text"), budget, nBuckets)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
      assert(got === expected, s"budget=$budget nBuckets=$nBuckets")
    }
  }
}
