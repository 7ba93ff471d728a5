package graft.operators

import graft.SparkSpec

/** Dedup-operator behavior on constructed near-duplicates (the driver
  * documents table has no real dups, so recall is proven here).
  */
class DedupSpec extends SparkSpec {

  private def docsDF = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark forest tonight"
    Seq(
      (1L, base),
      (2L, base),                                     // exact dup of 1
      (3L, base.replace("quick", "swift")),           // near-dup of 1
      (4L, "completely different content about spark catalyst optimizer rules and physical planning strategies for large scale joins"),
      (5L, "yet another unrelated document mentioning parquet files partition pruning and adaptive query execution at runtime today")
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest-id survivor per content digest") {
    val survivors = Dedup.exact(docsDF).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 3L, 4L, 5L))
  }

  test("minhash-LSH finds the exact and near dup, not the unrelated docs") {
    val pairs = Dedup.nearDupPairs(docsDF, n = 3, k = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)), s"exact dup pair missing: ${keys.mkString(",")}")
    val dup = pairs.find(p => p._1 == 1L && p._2 == 2L).get
    assert(dup._3 === 1.0)
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("nearDupSurvivors keeps one doc per cluster plus all unpaired docs") {
    val survivors = Dedup.nearDupSurvivors(docsDF)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // {1,2,3} cluster → keep 1; 4 and 5 unpaired → kept
    assert(survivors === Set(1L, 4L, 5L))
  }

  test("incrementalNearDups matches batch docs to the corpus, flags novel ones") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then runs far away into the deep dark forest tonight"
    val corpus = Seq(
      (1L, base),
      (4L, "completely different content about spark catalyst optimizer rules and physical planning strategies for large scale joins")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, base),                             // exact copy of corpus doc 1
      (102L, base.replace("quick", "swift")),   // near-dup of corpus doc 1
      (103L, "a wholly novel document on structured streaming watermarks and stateful aggregation semantics in long running jobs")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(corpus, batch, n = 3, k = 16, bands = 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(101L) === ((false, 1L, 1.0)))
    assert(!got(102L)._1 && got(102L)._2 === 1L && got(102L)._3 >= 0.5)
    assert(got(103L) === ((true, -1L, -1.0)))
  }

  test("bloomDupGuard == plain anti-join on random overlapping key sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val existing = (0 until 2000).map(_ => s"k${rnd.nextInt(3000)}").distinct.toDF("key")
    val candidates = (0 until 1000).map(_ => s"k${rnd.nextInt(4000)}").toDF("key")
    val viaBloom = Dedup.bloomDupGuard(candidates, existing, "key",
        expectedKeys = 2000, fpp = 0.05)
      .collect().map(_.getString(0)).sorted
    val viaAnti = candidates
      .join(existing.withColumnRenamed("key", "k2"), $"key" === $"k2", "left_anti")
      .collect().map(_.getString(0)).sorted
    assert(viaBloom.toSeq === viaAnti.toSeq)
  }

  test("connected components label transitive clusters with the min doc id") {
    import spark.implicits._
    // two clusters: {1,2,3} connected only transitively (1-2, 2-3), {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connected components converge on a long chain (propagation, not one hop)") {
    import spark.implicits._
    // path graph 10-11-12-...-17: min label must travel the full diameter
    val pairs = (10L until 17L).map(i => (i, i + 1)).toDF("a", "b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.toSet === Set(10L))
    assert(comps.keySet === (10L to 17L).toSet)
  }

  test("LSH candidates are a superset of high-jaccard pairs (recall)") {
    import org.apache.spark.sql.functions.col
    val shingled = docsDF.select(col("doc_id"),
      graft.functions.TextFns.textShingles(col("text"), 3).as("shingles"))
    // threshold 0 keeps every banded candidate that survives verification
    val cands = Dedup.nearDupPairsFromShingles(shingled, k = 16, bands = 4,
        threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(cands.contains((1L, 3L)) || cands.contains((2L, 3L)),
      s"near-dup shares no band: $cands")
  }

  test("bestSurvivors: highest score wins, ties break to lowest id, string ids work") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_rep")
    val docs = Seq((1L, 10.0), (2L, 30.0), (3L, 30.0), (4L, 7.0), (5L, 7.0))
      .toDF("doc_id", "score")
    val got = Dedup.bestSurvivors(clusters, docs, scoreCol = "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 4L -> 4L))  // 2 beats 3 on tie; 4 beats 5 on tie

    val sClusters = Seq(("a", "a"), ("b", "a")).toDF("doc_id", "cluster_rep")
    val sDocs = Seq(("a", 1L), ("b", 2L)).toDF("doc_id", "score")
    val sGot = Dedup.bestSurvivors(sClusters, sDocs, scoreCol = "score")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sGot === Map("a" -> "b"))
  }

  test("containment flags a subset pair that jaccard scores low") {
    import spark.implicits._
    val quoted = "alpha beta gamma delta epsilon zeta"
    val long = quoted + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, quoted, "en", "web"), (2L, long, "en", "web"),
      (3L, "totally different text here now", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = Dedup.containmentTopK(df, n = 3,
      blockCols = Seq("lang", "source"), topK = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // doc 1's shingles are all inside doc 2 ⇒ max-containment 1.0,
    // though jaccard is ~4/43.
    assert(rows((1L, 2L)) == 1.0)
    assert(!rows.contains((1L, 3L))) // no shared shingle ⇒ no pair at all
  }

  test("simhash: identical docs agree, unrelated docs differ") {
    val fp = Dedup.simhash(docsDF).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L).length === 16)
    assert(fp(1L).forall(c => c == '0' || c == '1'))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(fp(1L), fp(3L)) < hamming(fp(1L), fp(4L)),
      s"near-dup should be closer than unrelated: ${fp.toSeq.sortBy(_._1)}")
  }
}
