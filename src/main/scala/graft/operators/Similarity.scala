package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.Iterate.MaterializeOps

/** Similarity search over embedding columns (EX6 + north-star ANN).
  *
  * Brute-force cosine top-k is the correctness baseline (one scan, no
  * shuffle until the final TakeOrdered). The scale path is LSH bucketing
  * with deterministic random-hyperplane signatures: vectors hash to
  * sign-pattern buckets, the probe only scans its own bucket — at 100 TB
  * the bucket join replaces an all-pairs scan with a hash-shuffle on
  * (signature) whose fan-in is |bucket| ≈ N / 2^planes.
  *
  * Hyperplane components are ±1 derived from md5(plane:dim) — fully
  * deterministic and replayable in the DuckDB oracle (no RNG state).
  */
object Similarity {

  /** Deterministic ±1 hyperplanes: sign = parity of the first hex nibble
    * of md5("p:d").
    */
  def planes(nPlanes: Int, dim: Int): Seq[Seq[Int]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        val h = digest.digest(s"$p:$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }
  }

  /** Sign-pattern signature of an embedding against the given planes,
    * as a '0'/'1' string (bucket key).
    */
  def signature(emb: Column, ps: Seq[Seq[Int]]): Column =
    concat(ps.map { plane =>
      val planeLit = typedLit(plane.map(_.toDouble))
      when(VectorFns.dot(planeLit, emb) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions using
    * the SAME deterministic ±1 hyperplanes as the LSH signature ([[planes]],
    * Rademacher entries, scaled by 1/√outDim) — sign-LSH is literally the
    * sign bit of this projection, so the two share one replayable matrix.
    * Use it to shrink 100 TB of embeddings before distance-heavy work:
    * pairwise inner products are preserved within the JL bound while
    * per-vector cost drops dim/outDim-fold.
    *
    * Scale shape: narrow per-row map — `outDim` native codegen dot
    * products against literal plane vectors, no shuffle, no state.
    */
  def randomProject(embeddings: DataFrame, outDim: Int, dim: Int): DataFrame = {
    val ps = planes(outDim, dim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    embeddings.select(col("vec_id"), col("label"),
      array(ps.map { p =>
        (floor((VectorFns.dot(typedLit(p.map(_.toDouble)), col("embedding")) * scale) * 1e6 + 0.5) / 1e6)
      }: _*).as("proj"))
  }

  /** One row per (vector, subspace): the j-th contiguous `subDim`-slice of
    * the embedding. Shared by the PQ encoder and the ADC probe. */
  private def subvectors(df: DataFrame, m: Int, subDim: Int): DataFrame =
    df.select(col("vec_id"),
      posexplode(array((0 until m).map(j =>
        slice(col("embedding"), j * subDim + 1, subDim)): _*))
        .as(Seq("sub_j", "sub_vec")))

  /** The per-subspace PQ codebooks: the subvectors of the lowest `ksub`
    * vec_ids (the same data-derived deterministic convention as
    * [[assignCells]] — reproducible, no RNG, oracle-replayable). m·ksub
    * rows — a bounded broadcast regardless of corpus size. */
  private def pqCodebooks(embeddings: DataFrame, m: Int, ksub: Int, subDim: Int): DataFrame =
    subvectors(embeddings.filter(col("vec_id") < ksub), m, subDim)
      .select(col("vec_id").as("code"), col("sub_j"), col("sub_vec").as("cw_vec"))

  /** Product-quantization assignment, exploded: each vector's embedding is
    * split into `m` contiguous subvectors and each subvector gets the id
    * of its nearest (squared-L2, ties → lowest id) codeword — one
    * `(vec_id, sub_j, code)` row per subspace. Squared L2 is computed as
    * ‖a‖² + ‖b‖² − 2a·b from the native dot product and rounded before
    * the argmin so the oracle's independently-computed doubles order
    * identically.
    *
    * Scale shape: the codebook join is a bounded (m·ksub-row) broadcast
    * onto the narrow subvector stream, and the argmin is a `min_by`
    * partial aggregate on (vec_id, sub_j) — map-side collapse, one
    * shuffle row per subvector, no window sort, nothing corpus-sized
    * broadcast.
    */
  def pqEncodeExploded(embeddings: DataFrame, m: Int, ksub: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    def d2(a: Column, b: Column) =
      (floor((VectorFns.dot(a, a) + VectorFns.dot(b, b)
        - lit(2.0) * VectorFns.dot(a, b)) * 1e6 + 0.5) / 1e6)
    subvectors(embeddings, m, subDim)
      .join(broadcast(pqCodebooks(embeddings, m, ksub, subDim)), Seq("sub_j"))
      .withColumn("d2", d2(col("sub_vec"), col("cw_vec")))
      .groupBy(col("vec_id"), col("sub_j"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
  }

  /** PQ codes assembled per vector, subspace order, as a comma string —
    * m·log₂(ksub) bits per vector (dim 64 float32 → 4 nibbles is 128×
    * compression), the storage form IVF-PQ indexes ship to disk. */
  def pqEncode(embeddings: DataFrame, m: Int = 4, ksub: Int = 16,
      dim: Int = 64): DataFrame =
    pqEncodeExploded(embeddings, m, ksub, dim)
      .groupBy(col("vec_id"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("sub_j"), col("code")))),
          x => x.getField("code").cast("string"))).as("codes"))

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query builds an
    * m×ksub lookup table of exact squared-L2 distances from its
    * subvectors to every codeword; each database vector's distance is
    * then the SUM of m table lookups on its codes — the probe never
    * touches raw database vectors. The LUT is a bounded broadcast; the
    * per-vector sum is a partial aggregate; the top-k is
    * TakeOrderedAndProject (no global sort). This is exactly the
    * IVF-PQ/Faiss search contract re-expressed relationally.
    */
  def pqAdcTopK(embeddings: DataFrame, queryId: Long, k: Int, m: Int = 4,
      ksub: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val q = subvectors(embeddings.filter(col("vec_id") === queryId), m, subDim)
      .select(col("sub_j"), col("sub_vec").as("q_vec"))
    val lut = pqCodebooks(embeddings, m, ksub, subDim)
      .join(broadcast(q), Seq("sub_j"))
      .select(col("sub_j"), col("code"),
        (floor((VectorFns.dot(col("q_vec"), col("q_vec"))
          + VectorFns.dot(col("cw_vec"), col("cw_vec"))
          - lit(2.0) * VectorFns.dot(col("q_vec"), col("cw_vec"))) * 1e6 + 0.5) / 1e6).as("d2"))
    pqEncodeExploded(embeddings, m, ksub, dim)
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(lut), Seq("sub_j", "code"))
      .groupBy(col("vec_id"))
      .agg((floor(sum(col("d2")) * 1e6 + 0.5) / 1e6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-PQ search — the full Faiss-style composite: the coarse quantizer
    * ([[assignCells]]) restricts the search to the query's `nProbe`
    * nearest cells, and within them distance is the PQ asymmetric lookup
    * ([[pqAdcTopK]]'s LUT) over stored codes. At 100 TB this is THE
    * standard trillion-vector layout: cells are partition pruning (read
    * nProbe/nCells of the index), codes are ~100× smaller than raw
    * vectors, and the probe plan touches no raw database vector at all —
    * only the bounded LUT and centroid tables are broadcast.
    */
  def ivfPqTopK(embeddings: DataFrame, queryId: Long, k: Int, m: Int = 4,
      ksub: Int = 16, dim: Int = 64, nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val cents = refinedCentroids(embeddings, nCells)
    val cells = assignCellsTo(embeddings, cents)
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    // nProbe cells whose refined centroids are nearest the query (cosine —
    // the same selection as [[ivfTopKProbe]], so the oracles share a CTE)
    val probed = cents
      .crossJoin(broadcast(q))
      .select(col("cell"),
        (floor((VectorFns.cosine(col("c_emb"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("sim"))
      .orderBy(col("sim").desc, col("cell")).limit(nProbe)
      .select(col("cell"))
    val qsub = subvectors(embeddings.filter(col("vec_id") === queryId), m, subDim)
      .select(col("sub_j"), col("sub_vec").as("q_vec"))
    val lut = pqCodebooks(embeddings, m, ksub, subDim)
      .join(broadcast(qsub), Seq("sub_j"))
      .select(col("sub_j"), col("code"),
        (floor((VectorFns.dot(col("q_vec"), col("q_vec"))
          + VectorFns.dot(col("cw_vec"), col("cw_vec"))
          - lit(2.0) * VectorFns.dot(col("q_vec"), col("cw_vec"))) * 1e6 + 0.5) / 1e6).as("d2"))
    pqEncodeExploded(embeddings, m, ksub, dim)
      .join(cells.select(col("vec_id"), col("cell")), "vec_id")
      .join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(lut), Seq("sub_j", "code"))
      .groupBy(col("vec_id"), col("cell"))
      .agg((floor(sum(col("d2")) * 1e6 + 0.5) / 1e6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Brute-force cosine top-k against one query vector (vec_id = queryId).
    * The query side is a 1-row broadcast; the scan stays narrow and the
    * top-k is TakeOrderedAndProject (no full sort).
    */
  def topKCosine(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        (floor((VectorFns.cosine(col("embedding"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** LSH-bucketed ANN: probe scans only the query's bucket. */
  def lshTopK(embeddings: DataFrame, queryId: Long, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val ps = planes(nPlanes, dim)
    val signed = embeddings.withColumn("sig", signature(col("embedding"), ps))
    val q = signed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("sig").as("q_sig"))
    signed.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), col("sig") === col("q_sig"))
      .select(col("vec_id"), col("sig"),
        (floor((VectorFns.cosine(col("embedding"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Default Lloyd refinement depth for the coarse quantizer and the cap
    * on its training sample. Two iterations from the deterministic seeds
    * is where measured recall plateaus on the driver corpora
    * (recall@10 at nProbe=4: 0.45 seeds → 0.58 after 2 iters; iters 3-5
    * gain < 0.01); the train cap bounds quantizer training cost at
    * corpus scale — the Faiss convention of training the coarse
    * quantizer on a sample, then assigning the full corpus.
    */
  val LLOYD_ITERS = 2
  val LLOYD_TRAIN_CAP = 4096L

  /** Lloyd-refined coarse-quantizer centroids: start from the `nCells`
    * deterministic seeds (lowest vec_ids), then run `iters` k-means
    * steps — assign the (capped) training sample to its nearest centroid
    * (rounded cosine, ties → lowest cell, exactly [[assignCells]]'s
    * argmax) and recompute each cell's centroid as the member mean,
    * ROUNDED to 6 per component so a SQL oracle replays every iteration
    * bit-for-bit. A cell that loses all members drops out (its id simply
    * stops existing — deterministic on both engines).
    *
    * Scale shape: per iteration, one narrow pass over the bounded
    * training sample (crossJoin against the ≤ nCells-row broadcast) and
    * a partial-aggregable typed-Aggregator mean. The trained centroids
    * are then COLLECTED into a literal LocalRelation frame — a
    * documented bounded-model collect (≤ nCells rows of dim doubles,
    * the quantizer codebook Faiss would persist with the index), so (a)
    * a query referencing the centroids N times trains ONCE instead of N
    * times, and (b) the plan auditor proves every forced broadcast of
    * them bounded from the LocalRelation leaf itself.
    */
  def refinedCentroids(embeddings: DataFrame, nCells: Int,
      iters: Int = LLOYD_ITERS, trainCap: Long = LLOYD_TRAIN_CAP): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // r19 optimization (guide §1.2 "the distributed algorithm" + §5
    // driver rules): the training sample is BOUNDED BY CONSTRUCTION
    // (vec_id < trainCap, i.e. ≤4096 rows of dim floats — ~1 MB at dim
    // 64), so the whole Lloyd refinement is model-sized work. The
    // previous form ran it as `iters` crossJoin+two-aggregation rounds —
    // 4+ exchanges, 2 broadcast builds and ~2.5 s of pure scheduling at
    // ANY scale factor, because the frames involved never exceed the
    // train cap. Collecting the capped sample once (the same documented
    // bounded-model collect class as the trained-centroid collect below)
    // and refining on the driver computes THE SAME doubles: per-element
    // float→double widening, sequential index-order dot folds, the
    // floor-snap before every argmax, min_by's (−sim, cell) lexicographic
    // tie-break via java.lang.Double.compare (Spark's double ordering),
    // and the member mean in ascending vec_id order — order differences
    // are absorbed by the same 1e-6 floor-snap the DuckDB oracle already
    // relies on when it replays the iteration with ITS OWN summation
    // order. The oracle gate at 3 SFs pins the equivalence.
    // r19 ADVICE hardening: (a) nCells beyond the train cap no longer
    // throws — the effective cap rises with nCells (seeds must lie in
    // the sample; the collect stays codebook-sized, ~sqrt(N) rows);
    // (b) the collect WIDENS to array<double> in the projection
    // (float→double is exact, so float inputs are bit-identical to the
    // old Array[Float] path) instead of hard-requiring array<float>.
    val cap = math.max(trainCap, nCells.toLong)
    val train: Array[(Long, Array[Double])] =
      embeddings.filter(col("vec_id") < cap)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect().sortBy(_._1)

    def dotFD(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length && i < b.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def dotFF(a: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * a(i); i += 1 }
      acc
    }
    def dotDD(a: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * a(i); i += 1 }
      acc
    }
    // r19 ADVICE: match the ENGINE's floor→long semantics exactly —
    // floor(NaN) casts to 0 there (a zero-norm vector's NaN cosine
    // assigns as sim 0.0), and long division can never yield -0.0; the
    // driver twin must agree or degenerate vectors assign differently.
    def snap(x: Double): Double = {
      val f = math.floor(x * 1e6 + 0.5)
      val v = (if (java.lang.Double.isNaN(f)) 0.0 else f) / 1e6
      if (v == 0.0) 0.0 else v // -0.0 → 0.0 (engine longs have no -0.0)
    }

    var cents: Seq[(Long, Array[Double])] = train
      .filter(_._1 < nCells)
      .map { case (id, e) => (id, e.clone()) }.toSeq
    for (_ <- 1 to iters) {
      val cNorm = cents.map { case (_, c) => math.sqrt(dotDD(c)) }
      // per-cell (component sums, member count), members folded in
      // ascending vec_id order (train is sorted)
      val sums = scala.collection.mutable.LinkedHashMap.empty[Long, (Array[Double], Long)]
      train.foreach { case (_, e) =>
        val eNorm = math.sqrt(dotFF(e))
        var bestCell = -1L; var bestNeg = 0.0; var first = true
        var ci = 0
        while (ci < cents.length) {
          val (cell, c) = cents(ci)
          val neg = -snap(dotFD(e, c) / (eNorm * cNorm(ci)))
          val cmp = java.lang.Double.compare(neg, bestNeg)
          if (first || cmp < 0 || (cmp == 0 && cell < bestCell)) {
            bestCell = cell; bestNeg = neg; first = false
          }
          ci += 1
        }
        val (acc, n) = sums.getOrElseUpdate(bestCell,
          (new Array[Double](e.length), 0L))
        var i = 0
        while (i < e.length) { acc(i) += e(i).toDouble; i += 1 }
        sums(bestCell) = (acc, n + 1)
      }
      cents = sums.toSeq.sortBy(_._1).map { case (cell, (acc, n)) =>
        (cell, acc.map(v => snap(v / n)))
      }
    }
    cents.map { case (cell, c) => (cell, c.toSeq) }
      .toDF("cell", "c_emb")
  }

  /** IVF-style ANN coarse assignment against a GIVEN centroid frame
    * (`cents`: (cell, c_emb), ≤ nCells rows): each vector goes to its
    * nearest centroid cell. At 100 TB: centroids broadcast (K rows),
    * assignment is one narrow pass, and a probe reads 1/K of the data —
    * the same contract as IVF-Flat. The output is reusable for
    * cell-partitioned storage layout (write.partitionBy("cell")).
    */
  /** How many centroids the narrow-projection assignment path inlines as
    * expression literals before falling back to the broadcast join. 64
    * cells × dim 64 doubles is a few KB of plan — far below codegen
    * limits — while a corpus-scaled quantizer (nCells ~ √N) takes the
    * join path exactly as before. */
  val ASSIGN_INLINE_MAX_CELLS = 64

  def assignCellsTo(embeddings: DataFrame, cents: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // r19 optimization: when the quantizer frame is already LOCAL (the
    // refinedCentroids LocalRelation) and small, the per-row argmax is a
    // pure NARROW projection — sims against centroid literals, argmin by
    // array_min over (−sim, cell) structs, which is the SAME lexicographic
    // (incl. NaN) ordering min_by used — so the whole assignment needs no
    // crossJoin, no broadcast build and no aggregation exchange. Input
    // vec_ids are unique by table contract (the groupBy previously only
    // re-asserted that), so row set and values are unchanged. Large or
    // non-local quantizers (e.g. a persisted index codebook) keep the
    // broadcast-join + map-side min_by path, which is the right shape
    // when nCells grows with the corpus.
    val localCents: Option[Seq[(Long, Seq[Double])]] =
      if (cents.isLocal) {
        val rows = cents.as[(Long, Seq[Double])].collect()
        if (rows.length <= ASSIGN_INLINE_MAX_CELLS) Some(rows.sortBy(_._1).toSeq)
        else None
      } else None
    localCents match {
      case Some(cs) if cs.nonEmpty =>
        def sqDot(c: Seq[Double]): Double = {
          var acc = 0.0; var i = 0
          while (i < c.length) { acc += c(i) * c(i); i += 1 }
          acc
        }
        val best = array_min(array(cs.map { case (cell, c) =>
          val cLit = typedLit(c)
          // same evaluation as VectorFns.cosine(embedding, c_emb) with
          // the row-constant norms hoisted: dot/(norm(a)*norm(b)), then
          // the 1e-6 floor-snap, then (−sim, cell) for the argmin
          val sim = (floor((VectorFns.dot(col("embedding"), cLit) /
            (col("_nrm_a") * lit(math.sqrt(sqDot(c))))) * 1e6 + 0.5) / 1e6)
          struct((-sim).as("neg_sim"), lit(cell).as("cell"))
        }: _*))
        embeddings
          .withColumn("_nrm_a", VectorFns.norm(col("embedding")))
          .withColumn("cell", best.getField("cell"))
          .select(col("vec_id"), col("label"), col("embedding"), col("cell"))
      case _ =>
        embeddings
          .crossJoin(broadcast(cents))
          // round(6) before the argmax so the oracle's independently-
          // computed doubles order identically (ties broken by lowest
          // cell id). The argmax is a min_by over (−sim, cell), NOT a
          // row_number window: partial aggregation collapses each
          // vector's nCells candidate rows (each dragging the embedding
          // payload) to ONE map-side, so the shuffle carries ~1/nCells
          // the bytes and no per-key sort happens.
          .withColumn("sim", (floor((VectorFns.cosine(col("embedding"), col("c_emb"))) * 1e6 + 0.5) / 1e6))
          .groupBy(col("vec_id"))
          .agg(min_by(struct(col("label"), col("embedding"), col("cell")),
            struct((-col("sim")).as("neg_sim"), col("cell"))).as("_best"))
          .select(col("vec_id"), col("_best.label").as("label"),
            col("_best.embedding").as("embedding"), col("_best.cell").as("cell"))
    }
  }

  /** [[assignCellsTo]] against the [[refinedCentroids]] quantizer — THE
    * cell assignment every cell-blocked operator here uses (r8 verdict
    * ask #5: seed-only cells measured recall@10 ≈ 0.21 single-probe; the
    * refined quantizer lifts the whole family).
    */
  def assignCells(embeddings: DataFrame, nCells: Int): DataFrame =
    assignCellsTo(embeddings, refinedCentroids(embeddings, nCells))

  /** The materialized IVF cell layout shared by every candidate-pair
    * operator ([[semanticDedup]], [[nearestWithinLabel]],
    * [[Graph.knnEdges]]): cell assignment plus the hoisted L2 norm
    * (cosine(a,b) = dot/(‖a‖·‖b‖), so storing ‖·‖ with the layout does
    * one norm per VECTOR instead of two per PAIR on the quadratic path).
    * Checkpointed once — the in-session equivalent of the cell-partitioned
    * parquet layout those operators would read at scale — so pair
    * self-joins don't recompute assignment per side.
    */
  def cellLayout(embeddings: DataFrame, nCells: Int): DataFrame =
    assignCells(embeddings, nCells)
      .withColumn("nrm", VectorFns.norm(col("embedding")))
      .materializedLazy

  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int, nCells: Int): DataFrame = {
    val cells = assignCells(embeddings, nCells)
    val q = cells.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("cell").as("q_cell"))
    cells.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), col("cell") === col("q_cell"))
      .select(col("vec_id"), col("cell"),
        (floor((VectorFns.cosine(col("embedding"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Multi-probe IVF: scan the `nProbe` cells whose centroids are nearest
    * the QUERY vector (not just the query's own cell) — the standard
    * recall/latency dial: nProbe/nCells of the data is read instead of
    * 1/nCells. Probe-cell selection is a K-row broadcast-side sort; the
    * scan side still prunes to the probed cells before any distance work.
    */
  def ivfTopKProbe(embeddings: DataFrame, queryId: Long, k: Int,
      nCells: Int, nProbe: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val cents = refinedCentroids(embeddings, nCells)
    val probed = cents.crossJoin(broadcast(q))
      .select(col("cell"),
        (floor((VectorFns.cosine(col("c_emb"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("q_sim"))
      .orderBy(col("q_sim").desc, col("cell"))
      .limit(nProbe)
      .select(col("cell"))
    assignCellsTo(embeddings, cents)
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(probed), Seq("cell"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        (floor((VectorFns.cosine(col("embedding"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Batched multi-probe IVF search — [[ivfTopKProbe]] for a whole
    * retrieval-eval batch in ONE pass instead of |Q| driver-looped jobs.
    *
    * `assigned` is the cell layout ((vec_id, label, embedding, cell) —
    * [[assignCellsTo]] output or persisted index postings), `cents` the
    * ≤ nCells quantizer, `queries` the batch as (query_id, q_emb).
    *
    * Shape, stage by stage: probe-cell selection is one |Q| × nCells
    * pass against the BROADCAST quantizer (bounded — the codebook, never
    * the corpus), cut to nProbe cells per query by a per-query-partitioned
    * rank. The candidate join touches the postings ONCE for the whole
    * batch — (cell) equi-join against the |Q| × nProbe probe list — so
    * the corpus-sized side is scanned exactly once however many queries
    * ride along (vs |Q| scans for the looped form). No broadcast is
    * forced on the probe list: Catalyst/AQE picks broadcast at eval-batch
    * sizes and a shuffle join on cell when |Q| grows, and cell cardinality
    * scales with the corpus (nCells ≈ √n), so the shuffle key never
    * degenerates (PLANS.md hazard #5). Per-query top-k is a rank-filter
    * window, which plans as Partial+Final WindowGroupLimit — each map
    * task keeps its own top-k per query BEFORE the shuffle, O(|Q| × k)
    * shuffled rows, not O(candidates).
    *
    * Tie semantics match the single-query form exactly ((cosine DESC,
    * vec_id), probe cells by (sim DESC, cell)), so batch output ≡ the
    * union of |Q| [[ivfTopKProbe]] runs — IvfIndexSpec pins that law
    * against the persisted index via [[IvfIndex.topKBatch]].
    */
  /** The DISTINCT cells a query batch probes — ivfBatchTopK's
    * probe-selection stage alone, exposed as the dynamic-file-pruning
    * key frame for the batched serving path ([[IvfIndex.topKBatch]]):
    * the union of per-query probe sets is a conservative superset of
    * every cell the batch join touches, so restricting the postings
    * scan to files whose committed cell stats admit it never drops a
    * candidate. Stays a FRAME (never collected) — the bounded-collect
    * and bloom tiers inside readPrunedByKeys handle cardinality.
    */
  def batchProbedCells(cents: DataFrame, queries: DataFrame,
      nProbe: Int): DataFrame = {
    val centRank = Window.partitionBy(col("query_id"))
      .orderBy(col("q_sim").desc, col("cell"))
    queries.select(col("query_id"), col("q_emb"))
      .crossJoin(broadcast(cents))
      .withColumn("q_sim", (floor((VectorFns.cosine(col("c_emb"), col("q_emb"))) * 1e6 + 0.5) / 1e6))
      .withColumn("_rn", row_number().over(centRank))
      .filter(col("_rn") <= nProbe)
      .select(col("cell")).distinct()
  }

  def ivfBatchTopK(assigned: DataFrame, cents: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int, excludeSelf: Boolean): DataFrame = {
    val centRank = Window.partitionBy(col("query_id"))
      .orderBy(col("q_sim").desc, col("cell"))
    val probed = queries.select(col("query_id"), col("q_emb"))
      .crossJoin(broadcast(cents))
      .withColumn("q_sim", (floor((VectorFns.cosine(col("c_emb"), col("q_emb"))) * 1e6 + 0.5) / 1e6))
      .withColumn("_rn", row_number().over(centRank))
      .filter(col("_rn") <= nProbe)
      .select(col("query_id"), col("cell"), col("q_emb"))
    val cand = assigned.join(probed, Seq("cell"))
    val scored =
      (if (excludeSelf) cand.filter(col("vec_id") =!= col("query_id")) else cand)
        .withColumn("cosine",
          (floor((VectorFns.cosine(col("embedding"), col("q_emb"))) * 1e6 + 0.5) / 1e6))
    val simRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id"), col("cell"), col("cosine")) // narrow
      .withColumn("_rn", row_number().over(simRank))
      .filter(col("_rn") <= k)
      .select(col("query_id"), col("vec_id"), col("cell"), col("cosine"))
      .orderBy(col("query_id"), col("cosine").desc, col("vec_id"))
  }

  /** Embedding preprocessing for ANN storage: L2-normalize (so dot ==
    * cosine downstream) and symmetric int8 quantization (x/‖x‖ × 127) —
    * 4× smaller vectors with bounded error.
    *
    * The zero-norm guard is load-bearing twice over: (a) semantics — an
    * all-zero vector quantizes to an empty array instead of NaN → int
    * (Spark casts NaN to 0; DuckDB errors, so the unguarded form
    * diverges cross-engine); (b) plan shape — the guard makes the q8
    * projection reference `nrm` MORE THAN ONCE, which stops
    * CollapseProject from inlining the O(d) norm into the per-element
    * lambda (a single reference gets inlined → O(d²) per row — observed
    * in the plan; PLANS.md hazard #2).
    */
  def normalizeQuantize(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("nrm", VectorFns.norm(col("embedding")))
      .withColumn("q8", when(col("nrm") === 0, array().cast("array<int>"))
        .otherwise(transform(col("embedding"),
          x => (floor((x.cast("double") / col("nrm") * 127) + 0.5)).cast("int"))))
      .drop("nrm")

  /** One further Lloyd (k-means) refinement step over the committed IVF
    * quantizer: assign every vector to its nearest [[refinedCentroids]]
    * centroid (cosine, exactly [[assignCells]]), then recompute each
    * cell's centroid as the member mean — the building block of a
    * semantic-dedup / clustering pass over a 100 TB embedding corpus.
    *
    * Scale shape: seeds broadcast (K rows), assignment is one narrow
    * pass, and the mean is a typed Aggregator (array-valued partial
    * aggregation — per-partition sums shuffle, never member vectors).
    * Emitted per (cell, dim) for exact cross-engine comparison.
    */
  def kmeansRefine(embeddings: DataFrame, nCells: Int): DataFrame = {
    val centroid = udaf(graft.functions.CentroidAgg)
    assignCells(embeddings, nCells)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), centroid(col("embedding")).as("centroid"))
      .select(col("cell"), col("n"), posexplode(col("centroid")).as(Seq("dim", "v")))
      // v is a mean of doubles (order-dependent ulps) — floor-snap,
      // never round() (BASELINE.md hash rule)
      .select(col("cell"), col("n"), col("dim"),
        (floor(col("v") * 1e6 + 0.5) / 1e6).as("v"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * corpus with the coarse quantizer, find within-cell pairs above a
    * cosine threshold, connected-components them, keep one survivor per
    * cluster (min vec_id) — duplicates-in-meaning are removed without an
    * all-pairs scan, because pairs are only generated inside a cell
    * (1/nCells of the corpus each; at 100 TB cells would be sub-bucketed
    * by LSH signature before pairing, same contract). The cell layout is
    * materialized once (it IS the IVF storage layout at scale — a
    * parquet write, localCheckpoint in-session) so the pair self-join
    * doesn't recompute assignment per side.
    */
  def semanticDedup(embeddings: DataFrame, nCells: Int,
      threshold: Double): DataFrame = {
    val cells = cellLayout(embeddings, nCells)
    val a = cells.select(col("cell"), col("vec_id").as("a"),
      col("embedding").as("e_a"), col("nrm").as("n_a"))
    val b = cells.select(col("cell"), col("vec_id").as("b"),
      col("embedding").as("e_b"), col("nrm").as("n_b"))
    // plain shuffle join on the cell key — nCells grows with the corpus,
    // so within-cell pair work stays ~linear and no corpus-sized side is
    // ever broadcast; at local test scale the ≤ nCells-way spread is
    // still microseconds of dot products per task
    val pairs = a.join(b, Seq("cell"))
      .filter(col("a") < col("b"))
      .filter((floor((VectorFns.dot(col("e_a"), col("e_b")) /
        (col("n_a") * col("n_b"))) * 1e6 + 0.5) / 1e6) >= threshold)
      .select(col("a"), col("b"))
    val dropped = Dedup.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id").as("_drop_id"))
    // dropped is a corpus fraction at real dup rates — leave the anti-join
    // side planner-chosen (AQE broadcasts when runtime-small, shuffles at
    // scale) instead of forcing it through the broadcast hard limit
    embeddings.join(dropped, col("vec_id") === col("_drop_id"), "left_anti")
  }

  /** Measured PAIR recall of the cell-blocked near-duplicate pass — the
    * accuracy contract for [[semanticDedup]]'s blocking at the √N
    * operating point (r15 VERDICT task #3: the dynamic-width rescale
    * traded recall silently at sf10; this makes the trade measured and
    * floor-gated wherever it runs). For each anchor, TRUE matches are
    * every other vector with rounded cosine ≥ `threshold` (exact brute
    * force); a match is RECOVERED iff the quantizer puts it in the
    * anchor's cell — exactly when [[semanticDedup]]'s within-cell pair
    * join can see it. The measured quantity is ANCHOR-INCIDENT match
    * recall: the hit ratio over directed (anchor → match) edges. When
    * every vector is an anchor (the gate corpora fit inside the default
    * cap) both directions of each pair are counted and the ratio equals
    * unordered pair recall exactly; when anchors are a strict SUBSET
    * (the sf10 sample), anchor↔anchor pairs contribute both directions
    * while anchor↔non-anchor pairs contribute one — cell membership is
    * symmetric, so each pair's per-direction hit value is identical and
    * the subset estimate is the match-edge-weighted recall of the same
    * blocking, not a differently-defined metric. One row out:
    * (n_true_pairs, pair_recall, recall_ok); no true pairs → vacuous
    * recall 1.0 (nothing was droppable).
    *
    * Scale shape: `anchorStride` × `maxAnchors` bound the anchor side
    * by construction (vec_id % stride = 0 ∧ vec_id < stride·max ⇒
    * ≤ `maxAnchors` rows — the [[ivfRecall]] sampling contract), so
    * |S|·N dot products, a sampled diagnostic — NOT the N² all-pairs —
    * and the anchor frame broadcasts legally onto the corpus scan. The
    * gate corpora (≤2000 vectors) sit entirely inside the default cap,
    * so they measure over every anchor.
    */
  def blockingPairRecall(embeddings: DataFrame, nCells: Int,
      threshold: Double, anchorStride: Long = 1, maxAnchors: Int = 2048,
      minPairRecall: Double = 0.5): DataFrame = {
    val cells = cellLayout(embeddings, nCells)
    val anch = cells.filter(col("vec_id") % anchorStride === 0 &&
        col("vec_id") < anchorStride * maxAnchors)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("nrm").as("a_nrm"), col("cell").as("a_cell"))
    cells.crossJoin(broadcast(anch))
      .filter(col("vec_id") =!= col("a_id"))
      .filter((floor((VectorFns.dot(col("embedding"), col("a_emb")) /
        (col("nrm") * col("a_nrm"))) * 1e6 + 0.5) / 1e6) >= threshold)
      .select((col("cell") === col("a_cell")).cast("double").as("hit"))
      .agg(count(lit(1)).as("n_true_pairs"),
        coalesce(floor(avg(col("hit")) * 1e4 + 0.5) / 1e4, lit(1.0))
          .as("pair_recall"))
      .select(col("n_true_pairs"), col("pair_recall"),
        (col("pair_recall") >= minPairRecall).as("recall_ok"))
  }

  /** k-NN label classification over the cell layout: each vector's
    * predicted label is the majority vote of its k nearest same-cell
    * neighbours (ties → most votes, then lowest label; cosine ties →
    * lowest vec_id) — the standard semi-supervised labeling / label-noise
    * detection pass over an embedded corpus (prediction ≠ stored label
    * flags a suspect label; an unlabeled batch gets labels from the
    * labeled corpus it shares cells with).
    *
    * Scale shape: same candidate generation as [[nearestWithinLabel]] —
    * shuffle join on the cell key over the materialized [[cellLayout]],
    * nothing corpus-sized broadcast; the top-k is a rank window planned
    * as Partial+Final WindowGroupLimit, and the vote is two partial-
    * aggregable groupBys (votes per (vec_id, nn_label), then struct-max).
    */
  def knnClassify(embeddings: DataFrame, k: Int, nCells: Int = 16): DataFrame = {
    val cells = cellLayout(embeddings, nCells)
    val a = cells.select(col("cell"), col("vec_id"), col("label"),
      col("embedding").as("e_a"), col("nrm").as("n_a"))
    val b = cells.select(col("cell"), col("vec_id").as("nn_vec_id"),
      col("label").as("nn_label"), col("embedding").as("e_b"), col("nrm").as("n_b"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("nn_vec_id").asc)
    a.join(b, Seq("cell"))
      .filter(col("vec_id") =!= col("nn_vec_id"))
      .withColumn("cosine",
        (floor((VectorFns.dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b"))) * 1e6 + 0.5) / 1e6))
      // narrow pre-window (guide §2.3): drop both embedding payloads
      .select(col("vec_id"), col("label"), col("nn_vec_id"),
        col("nn_label"), col("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("vec_id"), col("label"), col("nn_label"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("votes"), (-col("nn_label")).as("neg_label"),
        col("nn_label"))).as("best"),
        sum(col("votes")).as("n_neighbors"))
      .select(col("vec_id"), col("label"),
        col("best.nn_label").as("pred_label"), col("best.votes").as("votes"),
        col("n_neighbors"))
  }

  /** Contrastive-training triplet mining over the IVF cell layout: for
    * each anchor, the positive is its nearest same-cell neighbour (hard
    * positive — highest cosine, ties → lowest id) and the negative is a
    * deterministic pseudo-random pick from the NEXT cell (md5(anchor|cand)
    * rank 1 — the relational stand-in for in-batch random negatives,
    * RNG-free so the oracle replays it). Anchors whose cell or successor
    * cell is otherwise empty drop out (no pair to form).
    *
    * Scale shape: both the positive and the negative side are cell-keyed
    * shuffle joins against the materialized [[cellLayout]] — pair work is
    * Σ|cell|² like every other cell-blocked operator here (cells grow
    * with nCells, not corpus²), the argmax/argmin are partial-aggregable
    * `max_by`/`min_by`, and nothing corpus-sized is broadcast.
    */
  def contrastiveTriplets(embeddings: DataFrame, nCells: Int = 16): DataFrame = {
    val cells = cellLayout(embeddings, nCells)
    val a = cells.select(col("cell"), col("vec_id"),
      col("embedding").as("e_a"), col("nrm").as("n_a"))
    val cand = cells.select(col("cell").as("c_cell"), col("vec_id").as("cand_id"),
      col("embedding").as("e_c"), col("nrm").as("n_c"))
    val cos = (floor((VectorFns.dot(col("e_a"), col("e_c")) / (col("n_a") * col("n_c"))) * 1e6 + 0.5) / 1e6)
    val pos = a.join(cand, col("cell") === col("c_cell"))
      .filter(col("vec_id") =!= col("cand_id"))
      .withColumn("cos", cos)
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cand_id"), col("cos")),
        struct((-col("cos")).as("neg_cos"), col("cand_id"))).as("_p"))
      .select(col("vec_id"), col("_p.cand_id").as("pos_id"),
        col("_p.cos").as("pos_cos"))
    val neg = a.join(cand,
        col("cell") === pmod(col("c_cell") - 1 + lit(nCells), lit(nCells)))
      .withColumn("cos", cos)
      .withColumn("h", md5(concat_ws("|",
        col("vec_id").cast("string"), col("cand_id").cast("string")).cast("binary")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cand_id"), col("cos")),
        struct(col("h"), col("cand_id"))).as("_n"))
      .select(col("vec_id"), col("_n.cand_id").as("neg_id"),
        col("_n.cos").as("neg_cos"))
    pos.join(neg, Seq("vec_id"))
      .select(col("vec_id").as("anchor_id"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"))
  }

  /** Centroid-distance prototypicality / outlier scoring over the IVF
    * cell layout (the SemDeDup-prototypes / CCS pruning signal): each
    * vector's cosine to its cell's mean centroid, plus the within-cell
    * z-score of that cosine. High `centroid_cos` = prototypical (safe to
    * downsample), strongly negative `cell_z` = cluster outlier (novel or
    * noise — route to review instead of training).
    *
    * Scale shape: the cell layout is one corpus pass ([[assignCells]]);
    * centroids are a partial-aggregable typed Aggregator whose output is
    * `nCells` rows (bounded broadcast back onto the layout), and the
    * per-cell moment stats are another `nCells`-row broadcast — nothing
    * corpus-sized is ever broadcast or sorted. `centroid_cos` is rounded
    * BEFORE the moment stats so both engines aggregate identical inputs.
    */
  def cellOutlierScores(embeddings: DataFrame, nCells: Int = 16): DataFrame = {
    val centroid = udaf(graft.functions.CentroidAgg)
    // Reuse the shared checkpointed IVF layout (dropping its norm column)
    // so the assignment pass is computed once when composed with other
    // cell-blocked operators in the same job.
    val cells = cellLayout(embeddings, nCells).drop("nrm")
    val cents = cells.groupBy(col("cell")).agg(centroid(col("embedding")).as("c_emb"))
    val scored = cells.join(broadcast(cents), "cell")
      .select(col("vec_id"), col("label"), col("cell"),
        (floor((VectorFns.cosine(col("embedding"), col("c_emb"))) * 1e6 + 0.5) / 1e6).as("centroid_cos"))
    val stats = scored.groupBy(col("cell"))
      .agg(avg(col("centroid_cos")).as("mu"), stddev_pop(col("centroid_cos")).as("sd"))
    scored.join(broadcast(stats), "cell")
      .select(col("vec_id"), col("label"), col("cell"), col("centroid_cos"),
        when(col("sd") > 0, (floor(((col("centroid_cos") - col("mu")) / col("sd")) * 1e6 + 0.5) / 1e6))
          .otherwise(lit(0.0)).as("cell_z"))
  }

  /** Measured ANN recall@k: overlap between the IVF answer (candidates
    * restricted to the query's `nProbe` nearest refined cells —
    * [[ivfTopK]] semantics at nProbe=1, [[ivfTopKProbe]] beyond) and the
    * exact brute-force top-k, over a FIXED deterministic query sample — the
    * accuracy-contract companion to the ANN operators, quantifying the
    * `nCells` recall dial the cell-blocked family documents in prose.
    * Emits one row: (n_queries, mean_recall, recall_ok) with recall_ok =
    * mean_recall ≥ `minMeanRecall`, the assertable contract.
    *
    * Scale shape: the query set is bounded by construction (vec_id <
    * `queryStride`·`maxQueries` ⇒ ≤ `maxQueries` rows), so it broadcasts
    * legally onto both sides; the exact pass is |Q|·N dot products — a
    * sampled diagnostic, linear in the corpus for fixed |Q|, NOT the N²
    * full brute force. Per-query top-k is a rank window planned as
    * Partial+Final WindowGroupLimit; cosines are rounded to 6 before
    * ranking (ties → lowest id) so both engines select identical sets.
    */
  def ivfRecall(embeddings: DataFrame, k: Int = 10, nCells: Int = 16,
      queryStride: Long = 25, maxQueries: Int = 20,
      minMeanRecall: Double = 0.2, nProbe: Int = 1): DataFrame = {
    val cents = refinedCentroids(embeddings, nCells)
    val cells = assignCellsTo(embeddings, cents)
      .withColumn("nrm", VectorFns.norm(col("embedding")))
      .materializedLazy
    val q = cells.filter(col("vec_id") % queryStride === 0 &&
        col("vec_id") < queryStride * maxQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    // per-query probe set: the nProbe cells whose refined centroids are
    // nearest the query (nProbe=1 reduces to the query's own cell — the
    // assignment argmax and this ranking share the rounded cosine and
    // lowest-cell tie-break)
    val wq = Window.partitionBy(col("pr_q"))
      .orderBy(col("q_sim").desc, col("pr_cell"))
    val probeRank = cents.crossJoin(broadcast(q))
      .select(col("q_id").as("pr_q"), col("cell").as("pr_cell"),
        (floor((VectorFns.cosine(col("c_emb"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("q_sim"))
      .withColumn("cell_rank", row_number().over(wq))
      .filter(col("cell_rank") <= nProbe)
      .select(col("pr_q"), col("pr_cell"))
    val cand = cells.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), col("nrm").as("c_nrm"),
      col("cell").as("c_cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    def topK(pairs: DataFrame): DataFrame = pairs
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cos", (floor((VectorFns.dot(col("q_emb"), col("c_emb")) /
          (col("q_nrm") * col("c_nrm"))) * 1e6 + 0.5) / 1e6))
      .select(col("q_id"), col("c_id"), col("cos")) // narrow pre-window
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"))
    val exactTop = topK(cand.crossJoin(broadcast(q)))
    val ivfTop = topK(cand.crossJoin(broadcast(q))
      .join(probeRank,
        col("q_id") === col("pr_q") && col("c_cell") === col("pr_cell")))
    val overlap = exactTop.join(ivfTop, Seq("q_id", "c_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    q.select(col("q_id"))
      .join(overlap, Seq("q_id"), "left")
      .select(coalesce(col("n_overlap"), lit(0L)).cast("double")
        .divide(lit(k)).as("recall"))
      .agg(count(lit(1)).as("n_queries"),
        (floor(avg(col("recall")) * 1e4 + 0.5) / 1e4).as("mean_recall"))
      .select(col("n_queries"), col("mean_recall"),
        (col("mean_recall") >= minMeanRecall).as("recall_ok"))
  }

  /** Recall/cost curve for multi-probe IVF ([[ivfTopKProbe]] semantics):
    * mean recall@k vs exact brute force at each probe width in `nProbes`,
    * over the same bounded query sample as [[ivfRecall]] — the measured
    * form of "nProbe is the dial that buys recall back", one row per
    * probe level.
    *
    * Scale shape: probe-cell ranking is a (|Q| × nCells) bounded frame;
    * the scored-pair lineage (|Q|·N, linear for fixed |Q|) feeds the
    * exact top-k once and each probe level's rank-filtered top-k; the
    * probe-level grid is a driver-built literal relation. Nothing
    * corpus-sized is broadcast; per-(query, level) top-k is
    * WindowGroupLimit.
    */
  def ivfRecallCurve(embeddings: DataFrame, k: Int = 10, nCells: Int = 16,
      nProbes: Seq[Int] = Seq(1, 2, 4), queryStride: Long = 25,
      maxQueries: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents0 = refinedCentroids(embeddings, nCells)
    val cells = assignCellsTo(embeddings, cents0)
      .withColumn("nrm", VectorFns.norm(col("embedding")))
      .materializedLazy
    val q = cells.filter(col("vec_id") % queryStride === 0 &&
        col("vec_id") < queryStride * maxQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val cents = cents0
      .select(col("cell").as("pr_cell"), col("c_emb").as("cent_emb"))
    val wq = Window.partitionBy(col("pr_q"))
      .orderBy(col("q_sim").desc, col("pr_cell"))
    val probeRank = cents.crossJoin(broadcast(q))
      .withColumn("q_sim",
        (floor((VectorFns.cosine(col("cent_emb"), col("q_emb"))) * 1e6 + 0.5) / 1e6))
      .select(col("q_id").as("pr_q"), col("pr_cell"), col("q_sim"))
      .withColumn("cell_rank", row_number().over(wq))
      .drop("q_sim")
    val pairs = cells
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"), col("cell").as("c_cell"))
      .crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cos", (floor((VectorFns.dot(col("q_emb"), col("c_emb")) /
          (col("q_nrm") * col("c_nrm"))) * 1e6 + 0.5) / 1e6))
    val wke = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    val exactTop = pairs
      .select(col("q_id"), col("c_id"), col("cos")) // narrow pre-window
      .withColumn("rk", row_number().over(wke))
      .filter(col("rk") <= k).select(col("q_id"), col("c_id"))
      .materializedLazy // bounded |Q|·k rows, reused per probe level
    val probes = nProbes.toDF("n_probe")
    val wkp = Window.partitionBy(col("q_id"), col("n_probe"))
      .orderBy(col("cos").desc, col("c_id"))
    val probedTop = pairs
      .join(probeRank,
        col("q_id") === col("pr_q") && col("c_cell") === col("pr_cell"))
      .crossJoin(broadcast(probes))
      .filter(col("cell_rank") <= col("n_probe"))
      .select(col("q_id"), col("n_probe"), col("c_id"), col("cos")) // narrow
      .withColumn("rk", row_number().over(wkp))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_probe"), col("c_id"))
    val overlap = exactTop.join(probedTop, Seq("q_id", "c_id"))
      .groupBy(col("n_probe"), col("q_id"))
      .agg(count(lit(1)).as("n_overlap"))
    q.select(col("q_id")).crossJoin(broadcast(probes))
      .join(overlap, Seq("n_probe", "q_id"), "left")
      .select(col("n_probe"),
        coalesce(col("n_overlap"), lit(0L)).cast("double")
          .divide(lit(k)).as("recall"))
      .groupBy(col("n_probe"))
      .agg(count(lit(1)).as("n_queries"),
        (floor(avg(col("recall")) * 1e4 + 0.5) / 1e4).as("mean_recall"))
      .orderBy("n_probe")
  }

  /** Dimension-truncation recall curve (the matryoshka/MRL question):
    * mean recall@k of exact search over only the FIRST `d` embedding
    * components vs the full-dimension exact answer, for each `d` in
    * `dims` — how much ANN budget a narrower stored vector costs. The
    * full dimension should appear in `dims` as the 1.0-recall sanity row.
    *
    * Scale shape: one scored-pair lineage over the bounded query sample
    * (|Q|·N·|dims| rows, linear for fixed |Q| and |dims|); truncated
    * cosines slice the SAME array column (no re-store), per-(query, d)
    * top-k is WindowGroupLimit, and the dims grid is a driver literal.
    */
  def dimRecallCurve(embeddings: DataFrame, k: Int = 10,
      dims: Seq[Int] = Seq(16, 32, 64), fullDim: Int = 64,
      queryStride: Long = 25, maxQueries: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.select(col("vec_id"), col("embedding"))
    val q = base.filter(col("vec_id") % queryStride === 0 &&
        col("vec_id") < queryStride * maxQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val pairs = base
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
    def cosAt(d: Column): Column = {
      val a = slice(col("q_emb"), lit(1), d)
      val b = slice(col("c_emb"), lit(1), d)
      (floor((VectorFns.cosine(a, b)) * 1e6 + 0.5) / 1e6)
    }
    val dimsDf = dims.toDF("n_dims")
    val wf = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    val fullTop = pairs.withColumn("cos", cosAt(lit(fullDim)))
      .select(col("q_id"), col("c_id"), col("cos")) // narrow pre-window
      .withColumn("rk", row_number().over(wf))
      .filter(col("rk") <= k).select(col("q_id"), col("c_id"))
      .materializedLazy // bounded |Q|·k baseline, reused per dims level
    val wd = Window.partitionBy(col("q_id"), col("n_dims"))
      .orderBy(col("cos").desc, col("c_id"))
    val truncTop = pairs.crossJoin(broadcast(dimsDf))
      .withColumn("cos", cosAt(col("n_dims")))
      .select(col("q_id"), col("n_dims"), col("c_id"), col("cos")) // narrow
      .withColumn("rk", row_number().over(wd))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("n_dims"), col("c_id"))
    val overlap = fullTop.join(truncTop, Seq("q_id", "c_id"))
      .groupBy(col("n_dims"), col("q_id"))
      .agg(count(lit(1)).as("n_overlap"))
    q.select(col("q_id")).crossJoin(broadcast(dimsDf))
      .join(overlap, Seq("n_dims", "q_id"), "left")
      .select(col("n_dims"),
        coalesce(col("n_overlap"), lit(0L)).cast("double")
          .divide(lit(k)).as("recall"))
      .groupBy(col("n_dims"))
      .agg(count(lit(1)).as("n_queries"),
        (floor(avg(col("recall")) * 1e4 + 0.5) / 1e4).as("mean_recall"))
      .orderBy("n_dims")
  }

  /** Embedding-cosine near-dup: each vector's nearest neighbour within its
    * label, with candidates restricted to the vector's IVF cell — the
    * (label × cell) block bounds pair work without broadcasting anything
    * corpus-sized (the label key alone has O(10) values, so exact
    * within-label NN is inherently Σ|label|² — quadratic at any scale;
    * the cell sub-block is the standard ANN cure, with `nCells` the
    * recall/cost dial). A vector alone in its (label, cell) block emits
    * no row — the documented ANN recall trade.
    *
    * Scale shape: pairs come from a shuffle join on (label, cell) over
    * the materialized [[cellLayout]] (norms hoisted — one per vector, not
    * two per pair), and the arg-max is a partial-aggregable struct-max
    * (ties → lowest nn_vec_id via the negated-id field), never a window
    * sort.
    */
  def nearestWithinLabel(embeddings: DataFrame, nCells: Int = 16): DataFrame = {
    val cells = cellLayout(embeddings, nCells)
    val a = cells.select(col("label"), col("cell"), col("vec_id"),
      col("embedding").as("e_a"), col("nrm").as("n_a"))
    val b = cells.select(col("label"), col("cell"), col("vec_id").as("nn_vec_id"),
      col("embedding").as("e_b"), col("nrm").as("n_b"))
    a.join(b, Seq("label", "cell"))
      .filter(col("vec_id") =!= col("nn_vec_id"))
      .withColumn("cosine",
        (floor((VectorFns.dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b"))) * 1e6 + 0.5) / 1e6))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(struct(col("cosine"), (-col("nn_vec_id")).as("neg_id"),
        col("nn_vec_id"))).as("best"))
      .select(col("vec_id"), col("label"),
        col("best.nn_vec_id").as("nn_vec_id"), col("best.cosine").as("cosine"))
  }
}
