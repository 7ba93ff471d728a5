package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.Iterate.MaterializeOps

/** Corpus SELECTION under a budget — the operators that turn scored
  * documents into a training set: weighted sampling (which documents,
  * proportional to quality/importance weight), token-budget truncation
  * (how many, under a hard token ceiling) and MMR diverse top-k (which
  * exemplars, trading relevance against redundancy). All three are
  * deterministic (hash-derived randomness, fixed tie-breaks) so a SQL
  * oracle can replay them exactly.
  */
object Selection {

  /** Deterministic uniform in (0,1) from an id column: the first 8 hex
    * chars of md5(id) as a u32, shifted off the lattice by +0.5 so u is
    * never 0 or 1 (ln(u) stays finite). Exactly mirrored by the DuckDB
    * oracle's ('0x' || substring(md5(...)))::UBIGINT form.
    */
  def hashUniform(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)

  /** Weighted sampling WITHOUT replacement, k items, inclusion odds
    * proportional to `weightCol` — Efraimidis–Spirakis A-Res with
    * deterministic hash-derived uniforms: key_i = ln(u_i)/w_i, keep the
    * k largest keys. One-pass, no state: the classic way to draw a
    * quality-weighted corpus sample in a single scan.
    *
    * Scale shape: keys are a narrow per-row projection; the top-k is
    * `orderBy(...).limit(k)`, which Spark plans as TakeOrderedAndProject
    * — each task keeps its local k, the driver merges k·tasks rows —
    * never a global sort. Non-positive weights are excluded (A-Res is
    * undefined there), matching the oracle's WHERE.
    *
    * Keys are rounded to 9 places before ranking (ties → lowest id):
    * coarse enough to absorb cross-engine ln() ulp noise, fine enough
    * that the weighting stays effectively exact.
    */
  def weightedSample(docs: DataFrame, k: Int, weightCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val key = (floor((log(hashUniform(col(idCol))) / col(weightCol)) * 1e9 + 0.5) / 1e9)
    docs.filter(col(weightCol) > 0)
      .withColumn("ares_key", key)
      .orderBy(col("ares_key").desc, col(idCol))
      .limit(k)
  }

  /** Greedy token-budget selection: walk documents in (scoreCol DESC,
    * idCol ASC) order and keep each while the running token total stays
    * ≤ `budget` — the "best docs until the token ceiling" truncation
    * every fixed-compute training run applies. Semantics are exactly a
    * global inclusive running sum ≤ budget; the implementation never
    * runs that unbounded single-partition window.
    *
    * Scale shape (two-phase histogram threshold): phase 1 buckets scores
    * to milli-units and aggregates per-bucket token totals — a partial-
    * aggregable groupBy whose result is ≤ |distinct milli-scores| rows,
    * collected to the driver (bounded by construction, like AQE's
    * per-partition stats). The driver walks the histogram to find the
    * boundary bucket; every higher bucket is kept wholesale with a
    * narrow filter. Phase 2 runs the exact running sum ONLY inside the
    * boundary bucket — a window partitioned by that one bucket key,
    * bounded by its member count, not the corpus. (A pathological corpus
    * with one giant tied score-bucket would need one more histogram
    * level on a secondary key; one level suffices for real score
    * distributions.)
    */
  def tokenBudgetSelect(docs: DataFrame, budget: Long, scoreCol: String,
      tokenCol: String, idCol: String = "doc_id"): DataFrame = {
    val bucketed = docs
      .withColumn("score_bucket", floor(col(scoreCol) * 1000).cast("long"))
    val hist = bucketed.groupBy(col("score_bucket"))
      .agg(sum(col(tokenCol)).as("bucket_tokens"))
      .orderBy(col("score_bucket").desc)
      .collect()

    // Driver walk over ≤ |distinct milli-scores| rows: find the first
    // bucket whose inclusion would overflow the budget.
    var cum = 0L
    var boundary = Long.MinValue // all buckets fit
    var before = 0L // tokens in buckets strictly above the boundary
    val it = hist.iterator
    while (it.hasNext && boundary == Long.MinValue) {
      val r = it.next()
      val b = r.getLong(0); val t = r.getLong(1)
      if (cum + t > budget) { boundary = b; before = cum }
      cum += t
    }

    if (boundary == Long.MinValue) bucketed.drop("score_bucket")
    else {
      val keepWhole = bucketed.filter(col("score_bucket") > boundary)
      val w = Window.partitionBy(col("score_bucket"))
        .orderBy(col(scoreCol).desc, col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val boundaryKept = bucketed.filter(col("score_bucket") === boundary)
        .withColumn("_run", sum(col(tokenCol)).over(w))
        .filter(col("_run") <= budget - before)
        .drop("_run")
      keepWhole.unionByName(boundaryKept).drop("score_bucket")
    }
  }

  /** Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    * 1998) against the query vector `vec_id = queryId`: greedily pick
    * the candidate maximizing λ·rel(c) − (1−λ)·max_{s∈S} cos(c, s),
    * where rel is cosine-to-query and S the already-picked set (empty-S
    * max-sim is 0, so pick 1 is just λ·rel). The standard redundancy-
    * free exemplar selection for few-shot prompts and eval suites.
    *
    * Scale shape: candidates are first shortlisted to the `m` most
    * query-relevant vectors via TakeOrderedAndProject (per-task top-m,
    * no global sort) and checkpointed — the greedy loop then runs k−1
    * rounds over this BOUNDED m-row frame, each round one broadcast of
    * the ≤k picked rows, one narrow max-sim projection and one min_by
    * argmax action. The corpus is scanned exactly once.
    *
    * All cosines and scores are rounded to 6 places before any argmax
    * (ties → lowest vec_id), making the pick sequence engine-exact.
    */
  def mmrSelect(embeddings: DataFrame, queryId: Long, k: Int,
      lambda: Double = 0.7, m: Int = 64): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val shortlist = embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"),
        (floor((VectorFns.cosine(col("embedding"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(m)
      .materialized

    var picked: Seq[(Long, Double)] = Nil // (vec_id, score), in pick order
    var pickedDf: DataFrame = null
    for (i <- 1 to k) {
      val scored =
        if (i == 1)
          shortlist.select(col("vec_id"),
            (floor((col("rel") * lambda) * 1e6 + 0.5) / 1e6).as("mmr_score"))
        else {
          val sel = broadcast(pickedDf.select(col("embedding").as("s_emb")))
          shortlist
            .filter(!col("vec_id").isInCollection(picked.map(_._1)))
            .crossJoin(sel)
            .groupBy(col("vec_id"), col("rel"))
            .agg(max((floor((VectorFns.cosine(col("embedding"), col("s_emb"))) * 1e6 + 0.5) / 1e6))
              .as("max_sim"))
            .select(col("vec_id"),
              (floor((col("rel") * lambda - col("max_sim") * (1 - lambda)) * 1e6 + 0.5) / 1e6)
                .as("mmr_score"))
        }
      val Row(vid: Long, score: Double) = scored
        .agg(min_by(struct(col("vec_id"), col("mmr_score")),
          struct((-col("mmr_score")).as("neg"), col("vec_id"))).as("best"))
        .select(col("best.vec_id"), col("best.mmr_score")).head()
      picked = picked :+ (vid -> score)
      pickedDf = shortlist.filter(col("vec_id").isInCollection(picked.map(_._1)))
    }

    val spark = embeddings.sparkSession
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((vid, s), idx) => (idx + 1, vid, s) }
      .toDF("pick_order", "vec_id", "mmr_score")
  }

  /** Greedy k-center coreset (farthest-point traversal, Gonzalez 1985):
    * seed with the lowest vec_id, then repeatedly pick the vector whose
    * cosine distance to its NEAREST already-picked center is largest —
    * the classic 2-approximation cover that selects maximally-spread
    * exemplars (the diversity-only counterpart of [[mmrSelect]], which
    * trades diversity against a query relevance).
    *
    * Scale shape: k rounds, each ONE full narrow scan of the (norm-
    * hoisted, checkpointed) corpus against a broadcast of the ≤k picked
    * centers, reduced by a partial-aggregable min-distance groupBy and a
    * single-row argmax — the textbook k·N cost with nothing corpus-sized
    * ever broadcast or sorted. Distances are rounded to 6 places before
    * the argmax (ties → lowest vec_id) so the traversal is engine-exact.
    *
    * @return (pick_order, vec_id, min_dist): the distance that won the
    *         round; −1.0 for the seed (which has no earlier center).
    */
  /** Oversampled k-center: the scale form of [[kCenterSelect]]. Exact
    * greedy farthest-point traversal is inherently k sequential passes;
    * at 100 TB you take the k-means‖-style cure — ONE corpus pass selects
    * a bounded candidate frame (per-IVF-cell outliers: each cell's
    * `oversample` members least similar to their cell centroid, plus the
    * seed — greedy k-center picks are far points, and far points are cell
    * extremes), then the sequential greedy runs over the ≤
    * `nCells`·`oversample`+1 collected candidates on the driver, a
    * model-artifact-sized loop like the k-means refine step.
    *
    * Same arithmetic as [[kCenterSelect]] (round-6 cosine distances,
    * sequential-fold dot product, ties → lowest vec_id), so picks are
    * identical whenever the candidate set contains the exact traversal's
    * picks — `oversample` is the fidelity dial (see SelectionSpec).
    *
    * Scale shape: one cell-assign pass over the (norm-hoisted,
    * checkpointed) corpus — map-side-collapsible argmax against the
    * nCells-row broadcast — then a per-cell WindowGroupLimit top-m;
    * nothing corpus-sized is collected, broadcast, or iterated.
    */
  def kCenterSelectOversampled(embeddings: DataFrame, k: Int,
      oversample: Int = 8, nCells: Int = 16): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", VectorFns.norm(col("embedding")))
      .materialized
    val seedId = base.agg(min(col("vec_id"))).head().getLong(0)
    val cents = base.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    val assigned = base.crossJoin(broadcast(cents))
      .withColumn("sim",
        (floor((VectorFns.dot(col("embedding"), col("c_emb")) /
          (col("nrm") * col("c_nrm"))) * 1e6 + 0.5) / 1e6))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("embedding"), col("nrm"), col("cell"), col("sim")),
        struct((-col("sim")).as("neg_sim"), col("cell"))).as("b"))
      .select(col("vec_id"), col("b.embedding").as("embedding"),
        col("b.nrm").as("nrm"), col("b.cell").as("cell"), col("b.sim").as("sim"))
    // Candidates per cell: the `oversample` members LEAST similar to the
    // centroid (greedy picks are far points, far points are cell
    // extremes) plus the single MOST similar member (the medoid — the
    // pick greedy makes for a cluster it hasn't touched yet), plus the
    // seed. Both ranks come from the same sorted window pass.
    val wAsc = Window.partitionBy(col("cell")).orderBy(col("sim").asc, col("vec_id"))
    val wDesc = Window.partitionBy(col("cell")).orderBy(col("sim").desc, col("vec_id"))
    val cand = assigned
      .withColumn("rk_out", row_number().over(wAsc))
      .withColumn("rk_med", row_number().over(wDesc))
      .filter(col("rk_out") <= oversample || col("rk_med") === 1 ||
        col("vec_id") === seedId)
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .collect() // bounded: ≤ nCells·(oversample+1) + 1 candidate rows
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(_._1)

    // driver greedy over the candidate frame — DotProductExpr's exact
    // sequential-fold double arithmetic and round-6 HALF_UP
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    require(k <= cand.length,
      s"k=$k exceeds the ${cand.length}-row candidate cut " +
        s"(nCells=$nCells × (oversample=$oversample + 1) + seed); " +
        "raise oversample or nCells, or use the exact kCenterSelect")
    var picked = Vector(seedId -> -1.0)
    var pickedVecs = cand.filter(_._1 == seedId).toVector
    for (_ <- 2 to k) {
      val best = cand.iterator
        .filter(c => !picked.exists(_._1 == c._1))
        .map { case (vid, emb, nrm) =>
          val d = pickedVecs.map { case (_, sEmb, sNrm) =>
            round6(1.0 - dot(emb, sEmb) / (nrm * sNrm))
          }.min
          (vid, d)
        }
        .minBy { case (vid, d) => (-d, vid) }
      picked = picked :+ best
      pickedVecs = pickedVecs ++ cand.filter(_._1 == best._1)
    }

    val spark = embeddings.sparkSession
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((vid, d), idx) => (idx + 1, vid, d) }
      .toDF("pick_order", "vec_id", "min_dist")
  }

  def kCenterSelect(embeddings: DataFrame, k: Int): DataFrame = {
    // Exact-fidelity form: k SEQUENTIAL corpus-wide Spark jobs (one per
    // pick) — viable only at coreset k. Registered queries route through
    // [[kCenterSelectOversampled]] (one corpus pass); this guard keeps an
    // accidental large-k call from launching thousands of driver-
    // sequential jobs.
    require(k <= 64,
      s"exact kCenterSelect runs k sequential corpus passes; k=$k > 64 — " +
        "use kCenterSelectOversampled")
    val base = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", VectorFns.norm(col("embedding")))
      .materialized
    val seed = base.agg(min(col("vec_id"))).head().getLong(0)

    var picked: Seq[(Long, Double)] = Seq(seed -> -1.0)
    for (_ <- 2 to k) {
      val sel = broadcast(base
        .filter(col("vec_id").isInCollection(picked.map(_._1)))
        .select(col("embedding").as("s_emb"), col("nrm").as("s_nrm")))
      val Row(vid: Long, dist: Double) = base
        .filter(!col("vec_id").isInCollection(picked.map(_._1)))
        .crossJoin(sel)
        .groupBy(col("vec_id"))
        .agg(min((floor((lit(1.0) -
          VectorFns.dot(col("embedding"), col("s_emb")) /
            (col("nrm") * col("s_nrm"))) * 1e6 + 0.5) / 1e6)).as("d"))
        .agg(min_by(struct(col("vec_id"), col("d")),
          struct((-col("d")).as("neg"), col("vec_id"))).as("best"))
        .select(col("best.vec_id"), col("best.d")).head()
      picked = picked :+ (vid -> dist)
    }

    val spark = embeddings.sparkSession
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((vid, d), idx) => (idx + 1, vid, d) }
      .toDF("pick_order", "vec_id", "min_dist")
  }
}
