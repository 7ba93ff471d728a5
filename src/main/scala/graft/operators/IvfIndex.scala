package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.sinks.{FileStats, Generations, Layout}

/** Persistent IVF index — the ANN layout [[Similarity.ivfTopKProbe]]
  * computes in-plan, made a durable artifact so the quantizer trains
  * ONCE and queries/upserts amortize it (the Faiss build-once
  * query-many lifecycle, on lakehouse storage):
  *
  *  - `<dir>/centroids` — snapshot [[graft.sinks.Generations]] table of
  *    the Lloyd-refined coarse quantizer (≤ nCells rows; the codebook
  *    Faiss serializes with an index).
  *  - `<dir>/postings`  — LOG Generations table of (vec_id, label,
  *    embedding, cell), written CELL-CLUSTERED (range-partitioned +
  *    sorted by cell via [[Layout.zOrdered]] — 1-D Z-order = plain
  *    cluster-by), so a probe's cell predicate prunes files and row
  *    groups instead of scanning the corpus.
  *
  * Scale story, piece by piece: build is one quantizer train (sample-
  * capped) + one corpus assignment + one range shuffle; a query reads
  * nProbe/nCells of the postings (file-level min/max pruning on the
  * cell column does the skipping); incremental UPSERT assigns only the
  * new batch against the persisted centroids and appends it as an
  * idempotent tagged delta commit (exactly-once under foreachBatch
  * replay, like any Generations log); [[optimize]] re-clusters the
  * accumulated deltas back into one cell-sorted generation with the
  * usual optimistic-concurrency commit. Readers are snapshot-isolated
  * throughout; no maintenance op disturbs a running query.
  *
  * IndexSpec proves build+query ≡ the in-plan [[Similarity.ivfTopKProbe]]
  * (same quantizer, same data ⇒ same top-k), upsert visibility +
  * replay idempotence, and optimize invariance; the pure assignment
  * math is under the DuckDB oracle gate as `sim_index_upsert_assign`.
  */
object IvfIndex {

  def centroidsTable(dir: String): String = s"$dir/centroids"
  def postingsTable(dir: String): String = s"$dir/postings"

  /** Train the quantizer on `embeddings` and materialize both index
    * tables. `numFiles` dials postings granularity: at corpus scale use
    * ~bytes/128MB so cell pruning is file-level first.
    */
  def build(spark: SparkSession, embeddings: DataFrame, nCells: Int,
      dir: String, numFiles: Int = 4): Unit = {
    val cents = Similarity.refinedCentroids(embeddings, nCells)
    Generations.writeAndCommit(spark, cents, centroidsTable(dir))
    // declare cell as a data-skipping column BEFORE the first commit:
    // every postings write from here on (base build, upsert deltas,
    // optimize folds) carries per-file cell min/max, which
    // [[topKVecPruned]] plans its file list from
    Generations.setStatsCols(spark, postingsTable(dir), Seq("cell"))
    Generations.writeAndCommit(spark,
      Layout.zOrdered(Similarity.assignCellsTo(embeddings, cents),
        Seq("cell"), numFiles),
      postingsTable(dir))
  }

  /** The persisted quantizer (None: index never built). */
  def centroids(spark: SparkSession, dir: String): Option[DataFrame] =
    Generations.read(spark, centroidsTable(dir))

  /** The postings log view: base generation ∪ upsert deltas. */
  def postings(spark: SparkSession, dir: String): Option[DataFrame] =
    Generations.readLog(spark, postingsTable(dir))

  /** Incremental maintenance: assign ONLY the new vectors against the
    * persisted centroids (no retrain, no corpus touch) and append them
    * as an idempotent tagged delta — a replayed batch is a no-op.
    * Returns None on replay, like [[Generations.appendCommitted]].
    */
  def upsert(spark: SparkSession, dir: String, newVectors: DataFrame,
      tag: String): Option[Generations.Commit] = {
    val cents = centroids(spark, dir).getOrElse(
      throw new IllegalStateException(s"no index at $dir — build first"))
    Generations.appendCommitted(spark,
      Similarity.assignCellsTo(newVectors, cents), postingsTable(dir), tag)
  }

  /** Fold accumulated upsert deltas back into one cell-clustered
    * generation at an explicit file width (restores the file-level cell
    * pruning the deltas dilute). Same optimistic commit loop as
    * [[Layout.optimizeZOrder]] — a concurrent upsert aborts-and-redoes
    * the fold rather than being folded away.
    */
  def optimize(spark: SparkSession, dir: String, numFiles: Int = 4,
      maxRetries: Int = 5): Option[Generations.Commit] = {
    val table = postingsTable(dir)
    var attempt = 0
    while (true) {
      val base = Generations.latest(spark, table)
        .map(_.version).getOrElse(return None)
      val clustered = Layout.zOrdered(
        Generations.readLog(spark, table).get, Seq("cell"), numFiles)
      try {
        val c = Generations.writeAndCommit(spark, clustered, table,
          expectedBase = Some(base))
        Generations.gc(spark, table, keep = 2)
        return Some(c)
      } catch {
        case _: Generations.CommitConflictException if attempt < maxRetries - 1 =>
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Index lifecycle dial (the OPTIMIZE auto-trigger): fold the
    * accumulated upsert deltas back into one cell-clustered generation
    * once the committed postings span exceeds `maxSpanCommits` — every
    * un-optimized delta has a wide cell range and conservatively keeps
    * its files, so a delta pile-up steadily dilutes the file-level skip
    * [[topKVecPruned]] plans from; a bounded span is also bounded
    * commit-listing metadata. No-op (None) while the span is within
    * bounds; otherwise the usual optimistic [[optimize]] + gc.
    */
  def maintain(spark: SparkSession, dir: String, maxSpanCommits: Int = 8,
      numFiles: Int = 4): Option[Generations.Commit] =
    if (Generations.logCommits(spark,
        postingsTable(dir)).size > maxSpanCommits)
      optimize(spark, dir, numFiles)
    else None

  /** Multi-probe top-k against the PERSISTED index: rank the stored
    * centroids by the query vector (bounded broadcast), read only the
    * nProbe probed cells of the postings (pruned scan), score, top-k.
    * Identical math to [[Similarity.ivfTopKProbe]] — the only
    * difference is WHERE the quantizer/assignments come from.
    */
  def topK(spark: SparkSession, dir: String, queryId: Long, k: Int,
      nProbe: Int): DataFrame = {
    val post = postings(spark, dir).getOrElse(
      throw new IllegalStateException(s"no postings at $dir"))
    search(spark, dir,
      post.filter(col("vec_id") === queryId)
        .select(col("embedding").as("q_emb")),
      k, nProbe, excludeId = Some(queryId))
  }

  /** [[topK]] for an EXTERNAL query vector (the common serving shape —
    * the query embeds fresh text/images, it is not an indexed row).
    */
  def topKVec(spark: SparkSession, dir: String, queryVec: Seq[Float],
      k: Int, nProbe: Int): DataFrame = {
    import spark.implicits._
    search(spark, dir, Seq(queryVec).toDF("q_emb"), k, nProbe,
      excludeId = None)
  }

  /** [[topKVec]] with FILE-LEVEL postings skipping: the centroid
    * ranking collapses to a driver-side sort over ≤ nCells rows (the
    * serving pattern — the codebook is the small side by construction),
    * and the probed cell list then plans the postings scan from the
    * committed per-file cell stats ([[Generations.readPrunedByKeys]]):
    * once postings are cell-clustered ([[build]]/[[optimize]]), only
    * ~nProbe/nCells of the FILES are opened — the in-plan `topKVec`
    * filter prunes rows but still reads every footer, which at
    * object-store postings is the serving-latency floor. Un-optimized
    * upsert deltas have wide cell ranges and conservatively keep their
    * files; an optimize fold restores the skip (stats re-collect
    * automatically). Result ≡ [[topKVec]] (IvfIndexSpec).
    */
  def topKVecPruned(spark: SparkSession, dir: String, queryVec: Seq[Float],
      k: Int, nProbe: Int): DataFrame = {
    import spark.implicits._
    val q = Seq(queryVec).toDF("q_emb")
    val probed = probeCells(spark, dir, queryVec, nProbe)
    val post = Generations.readPrunedByKeys(spark, postingsTable(dir),
      "cell", probed.toDF("cell")).getOrElse(
        throw new IllegalStateException(s"no postings at $dir"))
    post.filter(col("cell").isin(probed: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        (floor((VectorFns.cosine(col("embedding"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** The nProbe cells a query vector probes: the centroid ranking of
    * [[topKVecPruned]], a driver-side sort over ≤ nCells rows (the
    * codebook is bounded-small by construction — the serving pattern).
    */
  def probeCells(spark: SparkSession, dir: String, queryVec: Seq[Float],
      nProbe: Int): Seq[Long] = {
    import spark.implicits._
    val cents = centroids(spark, dir).getOrElse(
      throw new IllegalStateException(s"no index at $dir — build first"))
    val q = Seq(queryVec).toDF("q_emb")
    cents.crossJoin(broadcast(q))
      .select(col("cell"),
        (floor((VectorFns.cosine(col("c_emb"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("q_sim"))
      .orderBy(col("q_sim").desc, col("cell"))
      .limit(nProbe)
      .select(col("cell")).as[Long].collect().toSeq
  }

  /** (kept, total) postings FILES the committed cell stats admit for a
    * probed cell set — the measurable skip contract of
    * [[topKVecPruned]]. Assertions belong HERE, on the prune plan: a
    * distinct-input_file_name count over the post-filter result is
    * vacuous (the cell filter already restricts rows to the probed
    * cells, so it passes even when every file was kept).
    */
  def prunedPostingsPlan(spark: SparkSession, dir: String,
      cells: Seq[Long]): (Int, Int) = {
    require(cells.nonEmpty, "no probed cells")
    val preds = Seq(FileStats.Between("cell", cells.min, cells.max),
      FileStats.In("cell", cells))
    val (kept, total) = Generations.prunePlan(spark, postingsTable(dir),
      preds).getOrElse(throw new IllegalStateException(s"no postings at $dir"))
    (kept.length, total)
  }

  /** The serving dial: stats-pruned scan only when the committed
    * postings span enough files for file skipping to pay — below
    * ~page-cache index sizes the driver-side stats planning costs more
    * than the full in-plan scan it saves (measured at 2k vectors,
    * SCALING.md r16), and with few files there is little to skip.
    * Threshold: pruned when files > minFilesPerProbe × nProbe.
    */
  def usePrunedServing(spark: SparkSession, dir: String, nProbe: Int,
      minFilesPerProbe: Int = 2): Boolean = {
    val (_, total) = Generations.prunePlan(spark, postingsTable(dir), Nil)
      .getOrElse(throw new IllegalStateException(s"no postings at $dir"))
    total > minFilesPerProbe * nProbe
  }

  /** ONE external-vector serving entrypoint: [[topKVecPruned]] when the
    * index is large enough for file skipping to win, [[topKVec]] below
    * that ([[usePrunedServing]] is the dial; IvfIndexSpec asserts the
    * choice at both scales and value-equality either way).
    */
  def serveTopKVec(spark: SparkSession, dir: String, queryVec: Seq[Float],
      k: Int, nProbe: Int, minFilesPerProbe: Int = 2): DataFrame =
    if (usePrunedServing(spark, dir, nProbe, minFilesPerProbe))
      topKVecPruned(spark, dir, queryVec, k, nProbe)
    else topKVec(spark, dir, queryVec, k, nProbe)

  /** Batched multi-query search against the PERSISTED index — the
    * retrieval-eval shape ([[search]] for one query is N driver-looped
    * jobs for a batch of N; this is one). `queries`: (query_id, q_emb).
    * Probe selection ranks the stored centroids per query (one
    * |Q| × nCells pass against the broadcast codebook), the postings are
    * read ONCE for the whole batch via a (cell) equi-join, and per-query
    * top-k is a WindowGroupLimit rank filter — all in
    * [[Similarity.ivfBatchTopK]], which IvfIndexSpec proves equal to the
    * union of per-query [[topK]] results. `excludeSelf` drops the row
    * whose vec_id equals the query_id (the internal-query convention of
    * [[topK]]); external query batches pass false.
    */
  def topKBatch(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int, nProbe: Int, excludeSelf: Boolean = false,
      minFilesPerProbe: Int = 2): DataFrame = {
    val cents = centroids(spark, dir).getOrElse(
      throw new IllegalStateException(s"no index at $dir — build first"))
    // the same dial as [[serveTopKVec]], composed with the batch shape:
    // past the threshold the postings scan is FILE-pruned by the union
    // of the batch's probed cells (a conservative superset of every
    // cell the batch join touches — [[Similarity.batchProbedCells]]),
    // so a large committed index opens ~|probed cells|/nCells of its
    // files once for the WHOLE batch; below it the in-plan scan wins.
    val post =
      if (usePrunedServing(spark, dir, nProbe, minFilesPerProbe))
        Generations.readPrunedByKeys(spark, postingsTable(dir), "cell",
          Similarity.batchProbedCells(cents, queries, nProbe))
          .getOrElse(throw new IllegalStateException(s"no postings at $dir"))
      else postings(spark, dir).getOrElse(
        throw new IllegalStateException(s"no postings at $dir"))
    Similarity.ivfBatchTopK(post, cents, queries, k, nProbe, excludeSelf)
  }

  private def search(spark: SparkSession, dir: String, q: DataFrame,
      k: Int, nProbe: Int, excludeId: Option[Long]): DataFrame = {
    val cents = centroids(spark, dir).getOrElse(
      throw new IllegalStateException(s"no index at $dir — build first"))
    val post = postings(spark, dir).getOrElse(
      throw new IllegalStateException(s"no postings at $dir"))
    val probed = cents.crossJoin(broadcast(q))
      .select(col("cell"),
        (floor((VectorFns.cosine(col("c_emb"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("q_sim"))
      .orderBy(col("q_sim").desc, col("cell"))
      .limit(nProbe)
      .select(col("cell"))
    excludeId.map(id => post.filter(col("vec_id") =!= id)).getOrElse(post)
      .join(broadcast(probed), Seq("cell"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        (floor((VectorFns.cosine(col("embedding"), col("q_emb"))) * 1e6 + 0.5) / 1e6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
