package graft.operators

import graft.SparkSpec

class SketchSpec extends SparkSpec {

  test("CMS estimates dominate exact counts and the cell relation is bounded") {
    import spark.implicits._
    // 1000 tokens over a 50-term vocabulary with a skewed head.
    val toks = (0 until 1000).map { i =>
      if (i % 2 == 0) "hot" else s"t${i % 50}"
    }.toDF("term")

    val sketch = Sketch.cmsBuild(toks, depth = 4, width = 64)
    assert(sketch.count() <= 4L * 64)

    val exact = toks.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketch.cmsEstimate(sketch, toks.distinct(), depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(est.keySet === exact.keySet)
    // CMS never under-counts.
    exact.foreach { case (t, c) => assert(est(t) >= c, s"under-count for $t") }
    // min-over-depth keeps the hot key's estimate exact-ish even at width
    // 64: its own mass dwarfs any colliding tail term.
    assert(est("hot") < exact("hot") + 1000 / 4)
  }

  test("heavyHittersChecked emits top-N by exact count with a true contract") {
    import spark.implicits._
    val toks = (Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c") ++
      (0 until 40).map(i => s"u$i")).toDF("term")
    val rows = Sketch.heavyHittersChecked(toks, topN = 3, width = 512).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    assert(rows.map(_.getLong(1)).toSeq === Seq(30L, 20L, 10L))
    assert(rows.forall(_.getBoolean(2)))
  }

  test("joinSizeChecked overestimates within the contract; exact on no collisions") {
    import spark.implicits._
    // keys 1..5 × multiplicities: |A ⋈ B| = Σ ca·cb = 2·3 + 1·1 = 7
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 1L, 1L, 2L, 9L).toDF("k")
    val row = Sketch.joinSizeChecked(a, "k", b, "k", width = 512).head()
    val (est, exact) = (row.getAs[Long]("est"), row.getAs[Long]("exact_size"))
    assert(exact == 7L)
    assert(est >= exact && row.getAs[Boolean]("within_contract"))
    // 5 distinct keys in 512 buckets: no collisions, estimate is exact
    assert(est == 7L)
    // disjoint keys → empty join, estimate still within contract
    val d = Sketch.joinSizeChecked(Seq(1L).toDF("k"), "k",
      Seq(2L).toDF("k"), "k", width = 512).head()
    assert(d.getAs[Long]("exact_size") == 0L && d.getAs[Boolean]("within_contract"))
  }

  test("KMV: small scopes are exact, the (all) scope merges, estimates land near truth") {
    import spark.implicits._
    // scope a: 40 distinct keys (< k=64 → exact); scope b: 30 distinct,
    // overlapping a by 10 → 60 global distinct
    val rows = (1L to 40L).map(k => ("a", k)) ++
      (31L to 60L).map(k => ("b", k)) ++
      (1L to 20L).map(k => ("a", k)) // duplicates must not inflate
    val got = Sketch.kmvDistinct(rows.toDF("grp", "key"), "key", "grp", k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("a") === ((40L, 40.0, 0.0))) // n_kept < k ⇒ exact
    assert(got("b") === ((30L, 30.0, 0.0)))
    assert(got("(all)") === ((60L, 60.0, 0.0)))
  }

  test("KMV k-minimum cut plans as WindowGroupLimit (map-side top-k before the shuffle)") {
    import spark.implicits._
    val rows = (1L to 2000L).map(k => ("g", k))
    val plan = Sketch.kmvDistinct(rows.toDF("grp", "key"), "key", "grp", k = 64)
      .queryExecution.executedPlan.toString
    // the rank window must push a partial top-k to the map side — the
    // '(all)' scope's single partition then receives <= k·numPartitions
    // rows, not every distinct hash in the corpus
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    assert("Partial.*WindowGroupLimit|WindowGroupLimit.*Partial".r
      .findFirstIn(plan).isDefined, "expected a Partial mode WindowGroupLimit")
  }

  test("KMV estimate kicks in above k and stays within a loose band") {
    import spark.implicits._
    val rows = (1L to 5000L).map(k => ("g", k))
    val got = Sketch.kmvDistinct(rows.toDF("grp", "key"), "key", "grp", k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // KMV std error ~ 1/sqrt(k-2) ≈ 13%; assert a generous 3-sigma band
    assert(got("g") > 3000 && got("g") < 7000, s"est=${got("g")}")
    assert(got("g") === got("(all)")) // single scope ⇒ merge is identity
  }

  test("HLL slice sketches merge to the cross-slice distinct count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group g: keys 1..60 in slice 1, 31..90 in slice 2 → 90 distinct
    // (30 shared keys must NOT double count through the union).
    val rows = ((1L to 60L).map(k => ("g", 1, k)) ++
      (31L to 90L).map(k => ("g", 2, k)) ++
      (1L to 10L).map(k => ("h", 1, k))).toList
    val df = rows.toDF("grp", "slice", "key")
    val got = Sketch.hllMergedDistinct(df, "key", "grp", col("slice"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("g") == (90L, true))
    assert(got("h") == (10L, true))
  }
}
