package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic data-mixture resampling: copies = floor(w) + stable
  * fractional selection; zero weight drops; re-evaluation is identical.
  */
class MixtureSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (1L to 400L).map(i =>
      (i, Seq("en", "de", "fr", "es")(((i - 1) % 4).toInt), s"doc $i text"))
      .toDF("doc_id", "lang", "text")
  }

  test("copies = floor(w) + hash-fraction; zero weight drops the stratum") {
    val weights = Map("en" -> 2.5, "fr" -> 0.25, "es" -> 0.0)
    val copies = TextAnalysis.mixtureCopies(corpus, weights)
      .groupBy("lang").agg(
        count(lit(1)).as("n_in"),
        sum(col("copies")).as("n_out"),
        min(col("copies")).as("min_c"),
        max(col("copies")).as("max_c"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap

    val (enIn, enOut, enMin, enMax) = copies("en")
    assert(enMin === 2 && enMax === 3, "w=2.5 → every row 2 or 3 copies")
    assert(enOut > enIn * 2 && enOut < enIn * 3, s"~2.5× expected, got $enOut/$enIn")
    val (deIn, deOut, _, _) = copies("de")
    assert(deOut === deIn, "default weight 1.0 keeps rows as-is")
    val (frIn, frOut, frMin, frMax) = copies("fr")
    assert(frMin === 0 && frMax === 1 && frOut < frIn / 2,
      s"w=0.25 → ~quarter kept, got $frOut/$frIn")
    val (_, esOut, _, _) = copies("es")
    assert(esOut === 0, "w=0 drops the stratum")
  }

  test("resampleMixture expands to exactly sum(copies) rows, deterministically") {
    val weights = Map("en" -> 2.5, "fr" -> 0.25, "es" -> 0.0)
    val expected = TextAnalysis.mixtureCopies(corpus, weights)
      .agg(sum(col("copies"))).head().getLong(0)
    val r1 = TextAnalysis.resampleMixture(corpus, weights)
    assert(r1.count() === expected)
    // per-row copy indices are dense 1..copies
    val bad = r1.groupBy("doc_id").agg(max(col("copy_idx")).as("mx"),
        count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad === 0)
    // deterministic: a second evaluation produces the identical multiset
    val r2 = TextAnalysis.resampleMixture(corpus, weights)
    assert(r1.select("doc_id", "copy_idx").except(r2.select("doc_id", "copy_idx")).count() === 0)
  }
}
