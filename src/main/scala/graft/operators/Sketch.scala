package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream, DataFrame-native.
  *
  * The sketch is not an opaque binary blob but a bounded relation of
  * (row, bucket, cnt) cells — at most depth × width rows regardless of
  * input size. Building it is one groupBy over the hashed token stream,
  * so Catalyst's partial aggregation caps the shuffle at depth × width
  * rows PER MAP PARTITION (the full stream never shuffles), and the
  * result broadcasts to any estimator join. Build and probe use the same
  * codegen'd Murmur3 `hash(row, term)` expression, so bucket assignment
  * cannot drift between the two sides.
  *
  * Standard CMS guarantees: estimate ≥ true count; estimate ≤ true count
  * + ε·N with probability ≥ 1 − (1/e')^depth for ε = e'/width — the
  * accuracy-contract boolean emitted by [[heavyHittersChecked]] asserts
  * exactly this (with e' = 4). The depth hash rows are the four 8-hex-
  * digit chunks of ONE md5 per term (the repo's shared replayable hash
  * family), so the DuckDB oracle recomputes the estimates themselves and
  * DERIVES the contract boolean — the compare stays green under any data
  * refresh or width change, instead of asserting a literal `true` that a
  * legitimate (probabilistic) contract miss would break.
  */
object Sketch {

  private def bucketCols(term: org.apache.spark.sql.Column, depth: Int, width: Int) = {
    require(depth <= 4, s"md5 yields 4 independent 32-bit chunks, got depth=$depth")
    val hex = md5(term.cast("binary"))
    array((0 until depth).map(i =>
      pmod(conv(substring(hex, 1 + 8 * i, 8), 16, 10).cast("long"), lit(width))): _*)
  }

  /** Build the (row, bucket, cnt) sketch cells for a token column. */
  def cmsBuild(tokens: DataFrame, termCol: String = "term",
      depth: Int = 4, width: Int = 512): DataFrame =
    tokens
      .select(posexplode(bucketCols(col(termCol), depth, width)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate each probe term against a built sketch: min over the
    * depth cells the term hashes to (absent cell = 0).
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, termCol: String = "term",
      depth: Int = 4, width: Int = 512): DataFrame =
    probes
      .select(col(termCol), posexplode(bucketCols(col(termCol), depth, width))
        .as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Top-N exact heavy hitters with the CMS accuracy contract checked in
    * the engine: emits (term, exact count, within_contract) where the
    * boolean is `est ≥ exact AND est ≤ exact + 4·N/width`. Exact counts
    * and N come from the same token stream, so an oracle recomputing the
    * exact side asserts the boolean true.
    */
  def heavyHittersChecked(tokens: DataFrame, termCol: String = "term",
      topN: Int = 10, depth: Int = 4, width: Int = 512): DataFrame = {
    val sketch = cmsBuild(tokens, termCol, depth, width)
    val exact = tokens.groupBy(col(termCol)).agg(count(lit(1)).as("exact_cnt"))
    val top = exact.orderBy(col("exact_cnt").desc, col(termCol)).limit(topN)
    val total = tokens.agg(count(lit(1)).cast("double").as("n_total"))
    cmsEstimate(sketch, top.select(col(termCol)), termCol, depth, width)
      .join(broadcast(top), termCol)
      .crossJoin(broadcast(total))
      .select(col(termCol), col("exact_cnt"),
        (col("est") >= col("exact_cnt") &&
          col("est") <= col("exact_cnt") + lit(4.0) * col("n_total") / lit(width))
          .as("within_contract"))
      .orderBy(col("exact_cnt").desc, col(termCol))
  }

  /** CMS join-cardinality estimation — the CBO primitive: |A ⋈ₖ B|
    * estimated from the two sketches' inner product,
    * est = min_d Σ_b cmsA[d,b]·cmsB[d,b], WITHOUT executing the join.
    * The classic bound (Cormode-Muthukrishnan): est ≥ true and
    * E[est_d − true] ≤ |A|·|B|/width per row, so by Markov the contract
    * est ≤ true + 4·|A|·|B|/width fails all depth rows with probability
    * ≤ (1/4)^depth — derived in-engine like [[heavyHittersChecked]], so
    * the oracle recomputes rather than asserting a literal.
    *
    * Scale shape: each side reduces to a depth×width cell relation
    * (bounded) before anything joins; the exact count (for the contract)
    * comes from per-key count products, never a materialized join. All
    * arithmetic on the estimate is integral — bit-identical replay.
    *
    * @return one row: (est, exact_size, within_contract).
    */
  def joinSizeChecked(a: DataFrame, keyColA: String, b: DataFrame,
      keyColB: String, depth: Int = 4, width: Int = 512): DataFrame = {
    val ka = a.select(col(keyColA).cast("string").as("term"))
    val kb = b.select(col(keyColB).cast("string").as("term"))
    // A depth-row with NO colliding buckets drops out of the inner join —
    // its inner product is 0, which must win the min (it is the tightest
    // estimate), so rows missing from the join force est = 0.
    val est = cmsBuild(ka, "term", depth, width)
      .withColumnRenamed("cnt", "cnt_a")
      .join(cmsBuild(kb, "term", depth, width).withColumnRenamed("cnt", "cnt_b"),
        Seq("row", "bucket"))
      .groupBy(col("row")).agg(sum(col("cnt_a") * col("cnt_b")).as("ip"))
      .agg(when(count(lit(1)) < depth, lit(0L))
        .otherwise(min(col("ip"))).as("est"))
    val exact = ka.groupBy(col("term")).agg(count(lit(1)).as("ca"))
      .join(kb.groupBy(col("term")).agg(count(lit(1)).as("cb")), "term")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_size"))
    val sizes = ka.agg(count(lit(1)).cast("double").as("na"))
      .crossJoin(kb.agg(count(lit(1)).cast("double").as("nb")))
    est.crossJoin(exact).crossJoin(sizes)
      .select(col("est"), col("exact_size"),
        (col("est") >= col("exact_size") &&
          col("est") <= col("exact_size") +
            lit(4.0) * col("na") * col("nb") / lit(width))
          .as("within_contract"))
  }

  /** Mergeable distinct-count rollup via Datasketches HLL (the Spark 4
    * `hll_sketch_agg` / `hll_union_agg` built-ins): build one sketch per
    * (group, slice) — e.g. per day — then UNION the per-slice sketches up
    * to the group grain and estimate, never rescanning rows. This is the
    * property that matters at 100 TB: daily sketches are a few KB each,
    * so any coarser rollup (weekly, all-time, cross-region) is an
    * algebraic merge of stored state rather than a second pass over the
    * corpus — exactly how approx-distinct tiles in a warehouse work.
    * `countDistinct` would need the full key stream shuffled per regroup.
    *
    * The estimate is NOT replayable in another engine (HLL internals),
    * so the readout follows the repo's accuracy-contract pattern: emit
    * the exact count plus a boolean asserting the merged estimate lands
    * within `tol` (default 5% ≫ the ~1.6% standard error at the default
    * lgConfigK=12, so the contract holds with overwhelming margin).
    */
  def hllMergedDistinct(df: DataFrame, keyCol: String, groupCol: String,
      slice: org.apache.spark.sql.Column, tol: Double = 0.05): DataFrame = {
    val perSlice = df.groupBy(col(groupCol), slice.as("slice"))
      .agg(hll_sketch_agg(col(keyCol)).as("sk"))
    val merged = perSlice.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_exact"))
    merged.join(exact, groupCol)
      .select(col(groupCol), col("n_exact"),
        (abs(col("est") - col("n_exact")).cast("double") / col("n_exact")
          <= tol).as("merge_ok"))
  }

  /** KMV (k-minimum-values) distinct-count sketch — the mergeable
    * order-statistics sibling of [[hllMergedDistinct]], chosen here
    * because its estimate IS cross-engine replayable: the key hashes to
    * a 60-bit value via md5 (the repo's shared hash family), each scope
    * keeps its k smallest DISTINCT hash values, and
    * est = (k−1)·2⁶⁰ / h₍ₖ₎ (Bar-Yossef et al. 2002). Merging two
    * scopes = union the value sets and re-take the k smallest —
    * demonstrated by the `(all)` scope, computed from the per-scope
    * union, never from rescanning rows.
    *
    * Scale shape: the per-scope k-minimum cut is a rank window that
    * Spark plans with partial WindowGroupLimit (each map task forwards
    * at most k rows per scope), so shuffle volume is |scopes|·k, not
    * |rows|; the distinct-hash pre-pass is the only full shuffle, keyed
    * by the high-cardinality hash itself.
    *
    * @return (scope, n_exact, est_kmv, rel_err) per group plus `(all)`.
    */
  def kmvDistinct(df: DataFrame, keyCol: String, groupCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val twoPow60 = 1152921504606846976.0 // 2^60 as an exact double
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val perScope = df.select(col(groupCol).cast("string").as("scope"),
        h.as("h")).distinct()
    val hashes = perScope.unionByName(
      perScope.select(lit("(all)").as("scope"), col("h")).distinct())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("scope")).orderBy(col("h"))
    val mins = hashes.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("scope"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
    val est = when(col("n_kept") < k, col("n_kept").cast("double"))
      .otherwise(lit(k - 1) * lit(twoPow60) / col("hk"))
    val exact = df.select(col(groupCol).cast("string").as("scope"),
        col(keyCol).as("key"))
      .groupBy(col("scope")).agg(countDistinct(col("key")).as("n_exact"))
      .unionByName(df.agg(countDistinct(col(keyCol)).as("n_exact"))
        .select(lit("(all)").as("scope"), col("n_exact")))
    mins.join(exact, "scope")
      .select(col("scope"), col("n_exact"),
        (floor((est) * 1e2 + 0.5) / 1e2).as("est_kmv"),
        (floor((abs(est - col("n_exact")) / col("n_exact")) * 1e4 + 0.5) / 1e4).as("rel_err"))
  }
}
