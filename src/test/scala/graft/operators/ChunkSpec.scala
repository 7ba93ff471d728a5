package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sliding-window chunking: full coverage (every token in ≥1 chunk), no
  * chunk past the end, tail anchoring, overlap arithmetic, degenerate
  * docs.
  */
class ChunkSpec extends SparkSpec {

  private def doc(id: Long, nTokens: Int) = {
    import spark.implicits._
    Seq((id, (1 to nTokens).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
  }

  private def chunks(nTokens: Int, window: Int, stride: Int) =
    TextAnalysis.chunkOverlap(doc(1L, nTokens), window, stride)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("chunk_start"),
        r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text")))

  test("on-grid doc: full windows only, stride-spaced, tail exact") {
    // n=80, w=32, s=24: starts 0,24,48 — 48+32=80 covers the tail on-grid.
    val cs = chunks(80, 32, 24)
    assert(cs.map(_._2).toSeq === Seq(0L, 24L, 48L))
    assert(cs.forall(_._3 === 32L), "all full windows")
    assert(cs.head._4.startsWith("t1 t2 ") && cs.last._4.endsWith(" t80"))
  }

  test("off-grid doc: anchored tail chunk, never past the end") {
    // n=90: grid starts 0,24,48 then anchored 58 (=90−32).
    val cs = chunks(90, 32, 24)
    assert(cs.map(_._2).toSeq === Seq(0L, 24L, 48L, 58L))
    assert(cs.forall(_._3 === 32L))
    assert(cs.last._4 === (59 to 90).map(i => s"t$i").mkString(" "))
    // coverage: token 57 (between grid window end 80 and tail) appears
    assert(cs.exists(_._4.contains(" t57 ")))
  }

  test("short doc yields exactly one whole-doc chunk") {
    val cs = chunks(10, 32, 24)
    assert(cs.toSeq === Seq((0L, 0L, 10L, (1 to 10).map(i => s"t$i").mkString(" "))))
  }

  test("empty doc emits nothing; stride=window means zero overlap") {
    import spark.implicits._
    val empty = Seq((1L, "  ...  ")).toDF("doc_id", "text")
    assert(TextAnalysis.chunkOverlap(empty).count() === 0)
    val cs = chunks(64, 32, 32)
    assert(cs.map(_._2).toSeq === Seq(0L, 32L))
    assert(cs.map(_._4).mkString(" ") === (1 to 64).map(i => s"t$i").mkString(" "))
  }

  test("every token of every doc is covered at least once") {
    import spark.implicits._
    val docs = Seq(10, 31, 32, 33, 55, 56, 57, 80, 99).zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(j => s"w$j").mkString(" ")) }
      .toDF("doc_id", "text")
    val covered = TextAnalysis.chunkOverlap(docs, 32, 24)
      .select(col("doc_id"), explode(split(col("chunk_text"), " ")).as("tok"))
      .distinct().groupBy("doc_id").agg(count(lit(1)).as("n_covered"))
    val expected = docs.select(col("doc_id"),
      size(graft.functions.TextFns.tokens(col("text"))).as("n"))
    val mismatch = covered.join(expected, "doc_id")
      .filter(col("n_covered") =!= col("n")).count()
    assert(mismatch === 0)
  }
}
