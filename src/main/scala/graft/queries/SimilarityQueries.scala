package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.Similarity

/** Similarity-search registrations (EX6 + ANN scale path) over the
  * `embeddings` table. The LSH oracle replays the deterministic
  * md5-derived hyperplanes (Similarity.planes) as SQL literals.
  */
object SimilarityQueries extends QueryPack {

  // Single-file parquet tables scan as ONE partition; repartition so the
  // narrow per-document work parallelizes (at real scale the table is
  // many files and this is a no-op cost).
  private def emb(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/embeddings.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  // Raw scan for DRIVER-SIDED uses — size counts (graphCells/nnCells),
  // seed-id projections, query-vector lookups. These don't feed the
  // parallel pair work, so paying emb()'s repartition exchange for them
  // was a per-query job with no consumer (r19; guide §2.4).
  private def rawEmb(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/embeddings.parquet")

  private val QUERY_ID = 0L
  // Retrieval-eval batch for the batched index search (arbitrary but
  // deterministic internal vec_ids; spread so they probe distinct cells).
  private val BATCH_IDS = Seq(0L, 11L, 23L)
  private val TOP_K = 10
  private val N_PLANES = 4
  private val DIM = 64
  private val PCA_ITERS = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // EX6: brute-force cosine top-k vs the vec_id=0 query vector.
    "sim_topk_cosine" -> ((s, dir) =>
      Similarity.topKCosine(emb(s, dir), QUERY_ID, TOP_K)),

    // ANN scale path: LSH sign-bucket probe (scans 1/2^4 of the data).
    "sim_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(emb(s, dir), QUERY_ID, TOP_K, N_PLANES, DIM)),

    // Embedding-cosine near-dup: nearest neighbour within label, with
    // candidates restricted to the vector's IVF cell (shuffle join on the
    // (label, cell) block — nothing corpus-sized broadcasts). 4 cells ×
    // 10 labels leaves no singleton block at any driver SF, so every
    // vector still gets a neighbour (the recall dial documented on the
    // operator).
    "sim_nn_within_label" -> ((s, dir) =>
      Similarity.nearestWithinLabel(emb(s, dir), nCells = nnCells(s, dir))
        .orderBy("vec_id")),

    // JL random projection 64→16 dims on the shared deterministic
    // Rademacher planes (the LSH signature's sign source); long format
    // (vec_id, dim, value) because the compare harness sorts scalar rows.
    "sim_random_projection" -> ((s, dir) =>
      Similarity.randomProject(emb(s, dir), outDim = 16, dim = DIM)
        .select(col("vec_id"), col("label"),
          posexplode(col("proj")).as(Seq("dim", "value")))
        .select(col("vec_id"), col("label"),
          col("dim").cast("long").as("dim"), col("value"))
        .orderBy("vec_id", "dim")),

    // Graph-based data selection: PageRank centrality over the
    // symmetrized within-IVF-cell 4-NN cosine graph, 5 power iterations
    // (high rank = prototypical, low = outlier). Candidate edges come
    // from the materialized cell layout via a shuffle join on the cell
    // key — no corpus-sized broadcast anywhere in the plan.
    "graph_knn_pagerank" -> ((s, dir) =>
      graft.operators.Graph.pageRank(
          graft.operators.Graph.knnEdges(emb(s, dir), k = 4,
            nCells = graphCells(s, dir)))
        .select(col("v").as("vec_id"), col("rank_norm"))
        .orderBy("vec_id")),

    // Durable-checkpoint twin of graph_knn_pagerank (r15 VERDICT task
    // #6): the SAME computation and oracle, run under
    // spark.graft.checkpoint.durable=true with a reliable checkpoint dir
    // allocated from the conf-routable scratch root — so the cluster
    // fault-tolerance path (Dataset.checkpoint at every
    // Iterate.materialize cut, survivable across executor loss) is
    // driver-gate-proven equal to the localCheckpoint path, not just
    // spec-proven (IterateSpec). The iteration runs EAGERLY inside the
    // lambda, so the dial is restored before returning.
    "graph_pagerank_durable" -> ((s, dir) => {
      val prev = s.conf.getOption(graft.operators.Iterate.DurableKey)
      val prevCkpt = s.sparkContext.getCheckpointDir
      s.conf.set(graft.operators.Iterate.DurableKey, "true")
      // the returned frame reads the reliable-checkpoint files, so this
      // run's scratch cannot self-clean — each run sweeps its
      // PREDECESSORS' dirs instead, bounding the leak to one footprint
      graft.sinks.Scratch.sweep(s, "graft-ckpt")
      s.sparkContext.setCheckpointDir(
        graft.sinks.Scratch.dir(s, "graft-ckpt"))
      try
        graft.operators.Graph.pageRank(
            graft.operators.Graph.knnEdges(emb(s, dir), k = 4,
              nCells = graphCells(s, dir)))
          .select(col("v").as("vec_id"), col("rank_norm"))
          .orderBy("vec_id")
      finally {
        prev match {
          case Some(v) => s.conf.set(graft.operators.Iterate.DurableKey, v)
          case None => s.conf.unset(graft.operators.Iterate.DurableKey)
        }
        // un-hijack the global checkpoint root for any later caller
        prevCkpt.foreach(s.sparkContext.setCheckpointDir)
      }
    }),

    // Personalized PageRank from the vec_id%10==0 seed set over the same
    // kNN graph — graph-walk proximity to a trusted seed corpus (the
    // selection counterpart of DSIR weights).
    "graph_personalized_pagerank" -> ((s, dir) =>
      graft.operators.Graph.personalizedPageRank(
          graft.operators.Graph.knnEdges(emb(s, dir), k = 4,
            nCells = graphCells(s, dir)),
          seeds = rawEmb(s, dir).select(col("vec_id").as("v"))
            .filter(col("v") % 10 === 0))
        .select(col("v").as("vec_id"), col("ppr_norm"))
        .orderBy("vec_id")),

    // Synchronous label-propagation communities over the same kNN graph
    // (4 rounds, majority label, ties → lowest) — density-sensitive
    // clustering vs. connectedComponents' merge-anything.
    "graph_label_communities" -> ((s, dir) =>
      graft.operators.Graph.labelPropagation(
          graft.operators.Graph.knnEdges(emb(s, dir), k = 4,
            nCells = graphCells(s, dir)), iters = 4)
        .select(col("v").as("vec_id"), col("community"))
        .orderBy("vec_id")),

    // Multi-source BFS hop distance from the vec_id%25==0 seed set over
    // the same kNN graph (4 synchronous relaxation rounds) — discrete
    // graph proximity to a trusted seed corpus; vectors unreached within
    // 4 hops (e.g. whole cells holding no seed) drop out.
    "graph_bfs_hops" -> ((s, dir) =>
      graft.operators.Graph.bfsHops(
          graft.operators.Graph.knnEdges(emb(s, dir), k = 4,
            nCells = graphCells(s, dir)),
          seeds = rawEmb(s, dir).select(col("vec_id").as("v"))
            .filter(col("v") % 25 === 0),
          maxHops = 4)
        .select(col("v").as("vec_id"), col("hops"))
        .orderBy("vec_id")),

    // Measured ANN recall contract at the COMMITTED operating point:
    // Lloyd-refined quantizer (2 iterations), nProbe = 6 of 16 cells —
    // mean overlap@10 vs the exact brute-force top-k over the 20 fixed
    // query vectors (vec_id % 25 == 0, < 500). The oracle replays both
    // sides (including the quantizer refinement) and asserts the 0.6
    // floor as a boolean.
    "sim_ivf_recall" -> ((s, dir) =>
      Similarity.ivfRecall(emb(s, dir), k = TOP_K, nCells = N_CELLS,
        queryStride = 25, maxQueries = 20,
        minMeanRecall = IVF_RECALL_FLOOR, nProbe = IVF_N_PROBE)),

    // Same contract for the kNN graph builder: fraction of each sampled
    // anchor's true top-4 neighbours present among its knnEdges graph
    // neighbours.
    "graph_knn_recall" -> ((s, dir) =>
      graft.operators.Graph.knnRecall(emb(s, dir), k = 4,
        nCells = graphCells(s, dir),
        anchorStride = 25, maxAnchors = 20, minMeanRecall = RECALL_FLOOR)),

    // The measured recall/cost curve: mean recall@10 at nProbe = 1/2/4
    // over the same query sample — quantifies the multi-probe dial
    // (nProbe/nCells of the corpus scanned buys recall back).
    "sim_recall_curve" -> ((s, dir) =>
      Similarity.ivfRecallCurve(emb(s, dir), k = TOP_K, nCells = N_CELLS,
        nProbes = Seq(1, 2, 4), queryStride = 25, maxQueries = 20)),

    // Dimension-truncation recall: exact search over the first 16/32/64
    // components vs the full 64-dim answer — what a narrower stored
    // vector costs (64 = sanity row, recall 1.0).
    "sim_dim_recall_curve" -> ((s, dir) =>
      Similarity.dimRecallCurve(emb(s, dir), k = TOP_K,
        dims = Seq(16, 32, 64), fullDim = DIM,
        queryStride = 25, maxQueries = 20)),

    // Centroid-distance prototypicality / outlier scoring over the IVF
    // cells (SemDeDup-prototypes / CCS signal): cosine to the cell's mean
    // centroid + its within-cell z-score. Both centroid and moment
    // tables are nCells-row bounded broadcasts.
    "sim_cell_outliers" -> ((s, dir) =>
      Similarity.cellOutlierScores(emb(s, dir), nCells = N_CELLS)
        .orderBy("vec_id")),

    // PCA fit: top principal component of the embedding cloud by 8 fixed
    // power iterations over the covariance matrix (one fused MomentsAgg
    // corpus pass; every iteration runs on the dim²-row model frame).
    "sim_pca_component" -> ((s, dir) =>
      graft.operators.Learn.pcaTopComponent(emb(s, dir), DIM, iters = PCA_ITERS)
        .select(col("i").as("dim"), (floor((col("loading")) * 1e6 + 0.5) / 1e6).as("loading"),
          (floor((col("mu")) * 1e6 + 0.5) / 1e6).as("mu"))
        .orderBy("dim")),

    // Top-2 components via Hotelling deflation — the multi-component
    // fit (same single corpus pass; deflation is model-sized work).
    "sim_pca_components2" -> ((s, dir) =>
      graft.operators.Learn.pcaComponents(emb(s, dir), DIM, k = 2,
          iters = PCA_ITERS)
        .select(col("comp"), col("i").as("dim"),
          (floor((col("loading")) * 1e6 + 0.5) / 1e6).as("loading"))
        .orderBy("comp", "dim")),

    // Centered projection of every vector onto that component — the
    // 1-D whitening/compression view (fit → transform composite).
    "sim_pca_project" -> ((s, dir) => {
      val e = emb(s, dir)
      graft.operators.Learn.pcaProject(e,
          graft.operators.Learn.pcaTopComponent(e, DIM, iters = PCA_ITERS))
        .select(col("vec_id"), (floor((col("pc1")) * 1e6 + 0.5) / 1e6).as("pc1"))
        .orderBy("vec_id")
    }),

    // Neighbourhood density over the same kNN graph: per-vertex triangle
    // count + local clustering coefficient (graph-based redundancy/novelty
    // signal). Degree-ordered edge orientation bounds wedge fan-out.
    "graph_triangle_coeff" -> ((s, dir) =>
      graft.operators.Graph.triangleStats(
          graft.operators.Graph.knnEdges(emb(s, dir), k = 4,
            nCells = graphCells(s, dir)))
        .select(col("v").as("vec_id"), col("triangles"), col("clustering_coeff"))
        .orderBy("vec_id")),

    // Common-neighbor / Jaccard link prediction over the same kNN graph:
    // top non-adjacent pairs by neighborhood overlap — "should-be-
    // neighbor" pairs the cell blocking missed and near-dup communities
    // one hop before they merge (operators/Graph.linkPredict).
    "graph_link_predict" -> ((s, dir) =>
      graft.operators.Graph.linkPredict(
          graft.operators.Graph.knnEdges(emb(s, dir), k = 4,
            nCells = graphCells(s, dir)),
          minCommon = 2L, topK = 50)
        .select(col("a"), col("b"), col("common"), col("jaccard"))),

    // ANN scale path #2: IVF coarse quantizer (16 deterministic centroid
    // cells), probe scans only the query's cell.
    "sim_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(emb(s, dir), QUERY_ID, TOP_K, nCells = N_CELLS)),

    // ANN scale path #3: multi-probe IVF — scan the 2 cells nearest the
    // query vector (recall/latency dial: nProbe/nCells of the data read).
    "sim_ivf_nprobe_topk" -> ((s, dir) =>
      Similarity.ivfTopKProbe(emb(s, dir), QUERY_ID, TOP_K,
        nCells = N_CELLS, nProbe = 2)),

    // Persistent-index incremental maintenance, pure form (operators/
    // IvfIndex.upsert is the committing twin, IvfIndexSpec-gated): the
    // quantizer trains on the BASE corpus only, and the arriving batch
    // (every vec_id ending in 9) is assigned against those frozen
    // centroids — no retrain, no base-corpus touch. The oracle replays
    // the base-trained quantizer and the batch-only assignment.
    "sim_index_upsert_assign" -> ((s, dir) => {
      val e = emb(s, dir)
      val base = e.filter(col("vec_id") % 10 =!= 9)
      val fresh = e.filter(col("vec_id") % 10 === 9)
      Similarity.assignCellsTo(fresh,
          Similarity.refinedCentroids(base, N_CELLS))
        .select(col("vec_id"), col("cell"))
        .orderBy("vec_id")
    }),

    // Batched multi-probe index search: the whole 3-query eval batch in
    // ONE postings pass (probe cells ranked per query against the
    // broadcast quantizer, single (cell) equi-join, WindowGroupLimit
    // per-query top-k) — vs |Q| driver-looped single-query jobs. Same
    // math as sim_ivf_nprobe_topk per query; IvfIndexSpec pins batch ≡
    // union-of-singles against the persisted index.
    "sim_index_batch_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val cents = Similarity.refinedCentroids(e, N_CELLS)
      Similarity.ivfBatchTopK(Similarity.assignCellsTo(e, cents), cents,
        e.filter(col("vec_id").isin(BATCH_IDS: _*))
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
        TOP_K, nProbe = 2, excludeSelf = true)
    }),

    // Stats-pruned index SERVING (r16): the persisted index's postings
    // scan planned from committed per-file cell stats — the probed
    // 2-of-16 cells open only their own files (REQUIRED below; build
    // declares the stats, the 8 cluster-sorted files make <8 structural
    // at any SF), where the in-plan filter reads every footer. The
    // oracle replays quantizer + probe + scoring over the full corpus,
    // so the hash compare proves the file-skipped serving path loses
    // nothing. The query vector is the indexed QUERY_ID row served as
    // an external vector, so its own copy ranks first at cosine 1.0.
    "sim_index_pruned_topk" -> ((s, dir) => {
      import s.implicits._
      val base = graft.sinks.Scratch.dir(s, "graft-ivfidx")
      val idx = s"$base/idx"
      val e = emb(s, dir)
      graft.operators.IvfIndex.build(s, e, N_CELLS, idx, numFiles = 8)
      val qv = e.filter(col("vec_id") === QUERY_ID)
        .select(col("embedding")).as[Seq[Float]].collect().head
      // the skip REQUIRE reads the PRUNE PLAN, not the post-filter
      // result (whose distinct-file count is already restricted to the
      // probed cells even on an unpruned scan): 2 probed cells over 8
      // cluster-sorted files keep a strict subset at any SF
      val cells = graft.operators.IvfIndex.probeCells(s, idx, qv, nProbe = 2)
      val (kept, total) =
        graft.operators.IvfIndex.prunedPostingsPlan(s, idx, cells)
      require(kept < total,
        s"pruned serving plan must skip postings files ($kept/$total)")
      graft.operators.IvfIndex.topKVecPruned(s, idx, qv, TOP_K, nProbe = 2)
    }),

    // ONE serving entrypoint (r17): serveTopKVec auto-dials stats-pruned
    // vs in-plan scanning by committed postings file count — here 8
    // cluster-sorted files > 2×nProbe, so the dial must pick the pruned
    // path (REQUIRED: the oracle then gates exactly what a serving user
    // gets, dial included). Below the threshold the same entrypoint
    // serves in-plan (IvfIndexSpec pins the choice at both scales).
    "sim_index_serve_topk" -> ((s, dir) => {
      import s.implicits._
      val base = graft.sinks.Scratch.dir(s, "graft-ivfserve")
      val idx = s"$base/idx"
      val e = emb(s, dir)
      graft.operators.IvfIndex.build(s, e, N_CELLS, idx, numFiles = 8)
      val qv = e.filter(col("vec_id") === QUERY_ID)
        .select(col("embedding")).as[Seq[Float]].collect().head
      require(graft.operators.IvfIndex.usePrunedServing(s, idx, nProbe = 2),
        "8 committed postings files must dial to the pruned path")
      graft.operators.IvfIndex.serveTopKVec(s, idx, qv, TOP_K, nProbe = 2)
    }),

    // k-NN label classification (semi-supervised labeling / label-noise
    // detection): majority vote of the 8 nearest same-cell neighbours.
    "sim_knn_classify" -> ((s, dir) =>
      Similarity.knnClassify(emb(s, dir), k = 8,
        nCells = graphCells(s, dir))
        .orderBy("vec_id")),

    // Product-quantization codes (m=4 subspaces × 16 codewords): the
    // compressed storage form an IVF-PQ index ships to disk.
    "sim_pq_codes" -> ((s, dir) =>
      Similarity.pqEncode(emb(s, dir), m = 4, ksub = 16, dim = DIM)
        .orderBy("vec_id")),

    // ADC search over the PQ codes: query-side m×ksub LUT, distance =
    // sum of m lookups — the probe never touches raw database vectors.
    "sim_pq_adc_topk" -> ((s, dir) =>
      Similarity.pqAdcTopK(emb(s, dir), QUERY_ID, TOP_K, m = 4, ksub = 16, dim = DIM)),

    // IVF-PQ composite: coarse cells prune the index to 2 probe cells,
    // PQ asymmetric distance ranks the survivors — no raw vector touched.
    "sim_ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfPqTopK(emb(s, dir), QUERY_ID, TOP_K,
        m = 4, ksub = 16, dim = DIM, nCells = N_CELLS, nProbe = 2)),

    // Contrastive triplet mining: hard same-cell positive + deterministic
    // hash-picked negative from the successor cell, per anchor.
    "sim_triplets" -> ((s, dir) =>
      Similarity.contrastiveTriplets(emb(s, dir),
        nCells = graphCells(s, dir))
        .orderBy("anchor_id")),

    // ANN storage preprocessing: L2 norm + symmetric int8 quantization.
    "sim_normalize_quantize" -> ((s, dir) =>
      Similarity.normalizeQuantize(emb(s, dir))
        .select(col("vec_id"),
          (floor((VectorFns.norm(col("embedding"))) * 1e6 + 0.5) / 1e6).as("norm"),
          array_join(col("q8"), ",").as("q8"))
        .orderBy("vec_id")),

    // SemDeDup composition: cells → within-cell cosine pairs → connected
    // components → one survivor per semantic cluster. The driver corpus
    // has no true semantic duplicates (cosines top out ≈ 0.48), so the
    // threshold sits inside the observed range to exercise the full
    // drop path deterministically.
    "sim_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(emb(s, dir),
        nCells = graphCells(s, dir), threshold = 0.45)
        .select(col("vec_id"), col("label"))
        .orderBy("vec_id")),

    // The recall contract FOR the √N operating point above (r15 VERDICT
    // task #3): fraction of true ≥0.45-cosine pairs the dynamic-width
    // cell blocking recovers — the quantity the sf10 rescale traded
    // silently (2733→1706 members). mean recall is hash-exact against
    // the quantizer-replaying oracle at EVERY gate SF (C=23 at
    // sf0.001/0.01 — already above the 16 floor, so the dynamic law is
    // what's measured); recall_ok asserts BLOCKING_RECALL_FLOOR, and
    // RecallFloorSpec re-asserts it at sf0.1 where C=45.
    "sim_dedup_blocking_recall" -> ((s, dir) =>
      Similarity.blockingPairRecall(emb(s, dir),
        nCells = graphCells(s, dir), threshold = 0.45,
        minPairRecall = BLOCKING_RECALL_FLOOR)),

    // Semantic-clustering building block: one FURTHER Lloyd (k-means)
    // step over the committed refined quantizer — assign to nearest
    // refined centroid, per-cell mean via the typed Aggregator (partial
    // array sums, not member vectors, cross the shuffle).
    "sim_kmeans_refine" -> ((s, dir) =>
      Similarity.kmeansRefine(emb(s, dir), nCells = N_CELLS)
        .orderBy("cell", "dim")),

    // Custom typed Aggregator: per-label embedding centroids, emitted as
    // (label, dim, value) rows for exact cross-engine comparison.
    "sim_label_centroids" -> ((s, dir) => {
      import s.implicits._
      // untyped groupBy needs the udaf() wrapper (toColumn is for typed
      // KeyValueGroupedDataset aggregation)
      val centroid = udaf(graft.functions.CentroidAgg)
      emb(s, dir)
        .groupBy(col("label"))
        .agg(centroid(col("embedding")).as("centroid"))
        .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "v")))
        .select(col("label"), col("dim"),
          (floor(col("v") * 1e6 + 0.5) / 1e6).as("v"))
        .orderBy("label", "dim")
    })
  )

  private val N_CELLS = 16
  private val NN_CELLS = 4  // coarser blocking for all-vector NN (no singleton (label, cell) block)
  // Floor asserted by the graph_knn_recall contract (within-cell 4-NN
  // graph coverage of the true top-4). The refined quantizer lifted the
  // measurement; the floor stays conservative so the boolean only flips
  // on a real quantizer/blocking regression, not SF noise; the exact
  // mean_recall value is hash-verified regardless.
  private val RECALL_FLOOR = 0.1
  // The committed ANN search operating point and its asserted floor
  // (r8 verdict ask #5): Lloyd-2 refined quantizer + 6-of-16-cell
  // multi-probe measures recall@10 ≈ 0.70/0.73/0.70 at sf0.001/0.01/0.1
  // — floor 0.6 leaves ~0.1 margin at the weakest SF.
  private val IVF_N_PROBE = 6
  private val IVF_RECALL_FLOOR = 0.6
  // Floor for the cell-blocked near-dup PAIR recall at the dynamic √N
  // width (sim_dedup_blocking_recall; r15 VERDICT task #3). Measured
  // pair_recall: 0.1429 / 0.4286 / 0.25 at sf0.001/0.01/0.1
  // (C=23/23/45; 14/28/288 true pairs). The driver corpus has NO true
  // semantic duplicates (cosines top out ≈0.48), so the ≥0.45 pairs are
  // moderate-similarity — the HARD regime for single-cell blocking; on
  // a real near-dup corpus (cos ≥0.9, SemDeDup's own regime) same-cell
  // recall is far higher. The exact value is hash-pinned by the oracle
  // at every SF regardless; this boolean is the CRATER guard — 0.07
  // (≥1 recovered pair at the 14-pair SF) only flips when a width/dial
  // change collapses recovery, with 2.0×/6×/3.5× measured margin.
  // RecallFloorSpec asserts the stronger 0.2 operating-point floor at
  // sf0.1, where C=45 is well above the 16 floor and the 288-pair
  // sample is stable.
  private val BLOCKING_RECALL_FLOOR = 0.07
  private[queries] val BLOCKING_RECALL_FLOOR_SF01 = 0.2

  private def cosSql(a: String, b: String) = DuckSql.cosine(a, b)

  private val embsCte =
    s"""embs AS (SELECT vec_id, label, ${DuckSql.vecDouble("embedding")} AS de
       |  FROM embeddings)""".stripMargin

  /** Oracle twin of Similarity.assignCells (+ label carried through) —
    * shared by every cell-blocked oracle below so the quantizer replay
    * cannot drift between them. Replays the FULL committed quantizer:
    * seed centroids (lowest vec_ids), then LLOYD_ITERS unrolled k-means
    * steps — capped-sample assignment (rounded-cosine argmax, ties →
    * lowest cell), per-dim mean rounded to 6 — exactly
    * Similarity.refinedCentroids, then the final full-corpus assignment.
    * The final centroid set keeps the name `cents` so probe-ranking
    * oracles (nprobe/ivfpq/recall) read refined centroids unchanged.
    *
    * `baseWhere` restricts which vectors TRAIN the quantizer (seeds and
    * Lloyd sample), `assignWhere` restricts which vectors the final
    * `assigned` CTE assigns — both default to everything, which is the
    * shape every pre-r11 caller uses; the persistent-index oracle
    * trains on the base corpus and assigns only the upsert batch.
    */
  /** Quantizer width of the PAIR-GENERATING kNN-graph family, on both
    * sides of the gate: C = ⌈√N⌉, floored at the fixed 16 every gate SF
    * lands on (sf0.001/0.01 have ≤2000 vectors → unchanged results
    * there). A FIXED C makes the within-cell candidate join N²/C —
    * measured 1210 s for graph_knn_pagerank at sf10 (200k vectors,
    * C=16) — while √N balances assignment (N·√N) against pair work
    * (N^1.5), the standard IVF sizing. The IVF PROBE queries keep the
    * fixed C=16 dial: with constant C their assignment and 1/C cell
    * scans are linear in N, and C there is the documented recall knob,
    * not a blow-up. */
  private def graphCells(s: SparkSession, dir: String): Int =
    // row count from parquet footers (Tables.parquetRowCount) — exact,
    // driver-side metadata, no per-query count job (r19)
    math.max(N_CELLS, math.ceil(math.sqrt(
      graft.Tables.parquetRowCount(s, s"$dir/embeddings.parquet")
        .toDouble)).toInt)

  /** Oracle twin of [[graphCells]], as a scalar subquery over embs —
    * sqrt of a perfect square is IEEE-exact, so ceil agrees cross-engine
    * at every boundary. */
  private val graphCellsSql: String =
    s"(SELECT greatest($N_CELLS, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM embs)"

  /** [[graphCells]] for the LABEL-BLOCKED nearest-neighbour pass: blocks
    * are (label, cell), so the width targets √(N/L)-sized blocks —
    * pair work N·√(N/L) instead of the fixed-width N²/(L·C). Both
    * engines compute the same double (one IEEE division + sqrt + ceil),
    * so the widths agree at every boundary. */
  private def nnCells(s: SparkSession, dir: String): Int = {
    val n = graft.Tables.parquetRowCount(s,
      s"$dir/embeddings.parquet").toDouble
    val e = rawEmb(s, dir)
    // na.drop first: SQL count(DISTINCT label) ignores NULLs while
    // Spark's distinct().count() counts a NULL group — an off-by-one L
    // could shift ceil(√(N/L)) across a boundary vs nnCellsSql (r15
    // ADVICE)
    val l = math.max(1L,
      e.select(col("label")).na.drop().distinct().count()).toDouble
    math.max(NN_CELLS, math.ceil(math.sqrt(n / l)).toInt)
  }

  private val nnCellsSql: String =
    s"(SELECT greatest($NN_CELLS, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE) / " +
      "greatest(1, count(DISTINCT label)))) AS BIGINT)) FROM embs)"

  private def assignedCtes(nCellsSql: String = N_CELLS.toString,
      baseWhere: String = "true",
      assignWhere: String = "true") = {
    val iters = Similarity.LLOYD_ITERS
    val cap = Similarity.LLOYD_TRAIN_CAP
    val lloyd = (0 until iters).map { i =>
      s"""asg$i AS (
         |  SELECT e.vec_id, e.de, c.cell
         |  FROM embs e CROSS JOIN cents$i c
         |  WHERE e.vec_id < $cap AND ($baseWhere)
         |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY (floor((${cosSql("e.de", "c.c_emb")}) * 1e6 + 0.5) / 1e6) DESC, c.cell) = 1),
         |cents${i + 1} AS (
         |  SELECT cell, list((floor((av) * 1e6 + 0.5) / 1e6) ORDER BY dim) AS c_emb FROM (
         |    SELECT cell, d.range AS dim, avg(de[d.range + 1]) AS av
         |    FROM asg$i, range(0, $DIM) d GROUP BY cell, d.range)
         |  GROUP BY cell)""".stripMargin
    }.mkString(",\n")
    s"""cents0 AS (SELECT vec_id AS cell, de AS c_emb FROM embs
       |  WHERE vec_id < $nCellsSql AND ($baseWhere)),
       |$lloyd,
       |cents AS (SELECT cell, c_emb FROM cents$iters),
       |assigned AS (
       |  SELECT e.vec_id, e.label, e.de, c.cell
       |  FROM embs e CROSS JOIN cents c
       |  WHERE ($assignWhere)
       |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY (floor((${cosSql("e.de", "c.c_emb")}) * 1e6 + 0.5) / 1e6) DESC, c.cell) = 1)""".stripMargin
  }

  /** Oracle twin of Similarity.pqEncodeExploded: subvector split →
    * lowest-ksub codebooks → rounded squared-L2 argmin (`best`). */
  private val pqCtes = {
    val (m, ksub, subDim) = (4, 16, DIM / 4)
    s"""sub AS (SELECT vec_id, j.range AS sub_j,
       |    list_slice(de, j.range * $subDim + 1, j.range * $subDim + $subDim) AS sv
       |  FROM embs, range(0, $m) j),
       |cw AS (SELECT vec_id AS code, sub_j, sv AS cv FROM sub WHERE vec_id < $ksub),
       |pqd AS (SELECT s.vec_id, s.sub_j, c.code,
       |    (floor((list_dot_product(s.sv, s.sv) + list_dot_product(c.cv, c.cv)
       |      - 2 * list_dot_product(s.sv, c.cv)) * 1e6 + 0.5) / 1e6) AS d2
       |  FROM sub s JOIN cw c USING (sub_j)),
       |best AS (SELECT vec_id, sub_j, code FROM pqd
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub_j ORDER BY d2, code) = 1)""".stripMargin
  }

  private def sigSql(deExpr: String): String =
    Similarity.planes(N_PLANES, DIM).map { plane =>
      val lit = DuckSql.doubleList(plane.map(_.toDouble))
      s"(CASE WHEN list_dot_product($deExpr, $lit) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** Oracle twin of Graph.knnEdges (k=4 over the shared cell assignment):
    * within-cell top-4 cosine neighbours, symmetrized (`ed`). Shared by
    * the PageRank and label-propagation oracles. */
  private val knnEdgeCtes =
    s"""pr AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |    (floor((${cosSql("a.de", "b.de")}) * 1e6 + 0.5) / 1e6) AS cosine
       |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
       |tk AS (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY cosine DESC, dst) AS rn FROM pr) WHERE rn <= 4),
       |ed AS (SELECT DISTINCT src, dst FROM
       |    (SELECT src, dst FROM tk UNION ALL SELECT dst, src FROM tk))""".stripMargin

  // Label-propagation oracle: the same synchronous rounds unrolled as
  // CTEs l1..l4 — vote count per (node, neighbour label), argmax with
  // (votes DESC, label) tie-break, exactly the operator's min_by.
  private lazy val labelPropSql: String = {
    val iterCtes = (1 to 4).map { i =>
      s"""l$i AS (
         |  SELECT src AS v, nbr_lbl AS lbl FROM (
         |    SELECT e.src, l.lbl AS nbr_lbl, count(*) AS votes
         |    FROM ed e JOIN l${i - 1} l ON l.v = e.dst
         |    GROUP BY e.src, l.lbl)
         |  QUALIFY row_number() OVER (PARTITION BY src
         |    ORDER BY votes DESC, nbr_lbl) = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embsCte,
       |${assignedCtes(graphCellsSql)},
       |$knnEdgeCtes,
       |l0 AS (SELECT DISTINCT src AS v, src AS lbl FROM ed),
       |$iterCtes
       |SELECT v AS vec_id, lbl AS community FROM l4 ORDER BY v""".stripMargin
  }

  // PageRank oracle: the same fixed power iterations unrolled as CTEs
  // r1..r5 over the same within-cell 4-NN edge list. Each iteration
  // LEFT-joins the contribution sums back onto the full node set (dg) —
  // mirroring the operator's no-in-edge retention. (1−d) is rendered from
  // the same Scala double the operator uses, so both engines divide
  // identical IEEE values; damping contracts any summation-order noise.
  private lazy val pagerankSql: String = {
    val d = 0.85
    val oneMinus = 1 - d
    val iterCtes = (1 to 5).map { i =>
      s"""r$i AS (SELECT dg.src AS v,
         |  $oneMinus / (SELECT n FROM nn) + $d * coalesce(c.s, 0) AS r
         |  FROM dg LEFT JOIN (
         |    SELECT ed.dst AS v, sum(r.r / g.outdeg) AS s
         |    FROM ed JOIN dg g USING (src) JOIN r${i - 1} r ON r.v = ed.src
         |    GROUP BY ed.dst) c ON c.v = dg.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embsCte,
       |${assignedCtes(graphCellsSql)},
       |$knnEdgeCtes,
       |dg AS (SELECT src, count(*) AS outdeg FROM ed GROUP BY src),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dg),
       |r0 AS (SELECT src AS v, 1.0 / (SELECT n FROM nn) AS r FROM dg),
       |$iterCtes
       |SELECT v AS vec_id, floor(r * (SELECT n FROM nn) * 1e6 + 0.5) / 1e6 AS rank_norm
       |FROM r5 ORDER BY v""".stripMargin
  }

  // PPR oracle: same unrolled-iteration shape as pagerankSql, with the
  // teleport term conditioned on the seed indicator instead of uniform.
  // Seed membership is evaluated over GRAPH nodes (dg), matching the
  // operator's verts⋈seeds intersection.
  private lazy val pprSql: String = {
    val d = 0.85
    val oneMinus = 1 - d
    val iterCtes = (1 to 5).map { i =>
      s"""p$i AS (SELECT s0.v,
         |  $oneMinus * s0.s + $d * coalesce(c.cs, 0) AS r
         |  FROM s0 LEFT JOIN (
         |    SELECT ed.dst AS v, sum(r.r / g.outdeg) AS cs
         |    FROM ed JOIN dg g USING (src) JOIN p${i - 1} r ON r.v = ed.src
         |    GROUP BY ed.dst) c ON c.v = s0.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embsCte,
       |${assignedCtes(graphCellsSql)},
       |$knnEdgeCtes,
       |dg AS (SELECT src, count(*) AS outdeg FROM ed GROUP BY src),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dg),
       |sd AS (SELECT src AS v,
       |  CASE WHEN src % 10 = 0 THEN 1.0 ELSE 0.0 END AS flag FROM dg),
       |ns AS (SELECT sum(flag) AS ns FROM sd),
       |s0 AS (SELECT v, flag / (SELECT ns FROM ns) AS s FROM sd),
       |p0 AS (SELECT v, s AS r FROM s0),
       |$iterCtes
       |SELECT v AS vec_id, floor(r * (SELECT n FROM nn) * 1e6 + 0.5) / 1e6 AS ppr_norm
       |FROM p5 ORDER BY v""".stripMargin
  }

  // BFS oracle: the same synchronous relaxation rounds unrolled as CTEs
  // d1..d4 — each round min-merges the previous distances with every
  // in-neighbour's distance + 1, exactly the operator's union + min agg.
  private lazy val bfsSql: String = {
    val iterCtes = (1 to 4).map { i =>
      s"""d$i AS (SELECT v, min(hops) AS hops FROM (
         |    SELECT v, hops FROM d${i - 1} UNION ALL
         |    SELECT ed.dst AS v, d.hops + 1 AS hops
         |    FROM ed JOIN d${i - 1} d ON d.v = ed.src) GROUP BY v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embsCte,
       |${assignedCtes(graphCellsSql)},
       |$knnEdgeCtes,
       |d0 AS (SELECT v, CAST(0 AS BIGINT) AS hops FROM (
       |       SELECT src AS v FROM ed UNION SELECT dst FROM ed)
       |       WHERE v % 25 = 0),
       |$iterCtes
       |SELECT v AS vec_id, hops FROM d4 ORDER BY v""".stripMargin
  }

  // JL projection oracle: the same 16 plane literals, list_dot_product
  // each, × 1/√16 (= exactly 0.25 in binary), rounded like the operator.
  private val randomProjSql: String = {
    val elems = Similarity.planes(16, DIM).map { p =>
      s"(floor((list_dot_product(de, ${DuckSql.doubleList(p.map(_.toDouble))}) * 0.25) * 1e6 + 0.5) / 1e6)"
    }.mkString(",\n  ")
    s"""WITH $embsCte
       |SELECT vec_id, label, unnest(range(0, 16)) AS dim,
       |  unnest([$elems]) AS value
       |FROM embs ORDER BY vec_id, dim""".stripMargin
  }

  // Triangle oracle: id-ordered orientation (a<b<c) — same triangle set
  // as the operator's degree-ordered orientation, each found exactly once
  // at its lowest vertex; closure via the canonical (src<dst) edge set.
  private lazy val triangleSql: String =
    s"""WITH $embsCte,
       |${assignedCtes(graphCellsSql)},
       |$knnEdgeCtes,
       |cn AS (SELECT src AS p, dst AS q FROM ed WHERE src < dst),
       |wd AS (SELECT x.p AS a, x.q AS b, y.q AS c
       |       FROM cn x JOIN cn y ON x.p = y.p AND x.q < y.q),
       |tr AS (SELECT a, b, c FROM wd JOIN cn ON b = p AND c = q),
       |dg AS (SELECT src AS v, count(*) AS deg FROM ed GROUP BY 1),
       |tc AS (SELECT v, count(*) AS t FROM (
       |         SELECT a AS v FROM tr UNION ALL
       |         SELECT b FROM tr UNION ALL
       |         SELECT c FROM tr) GROUP BY 1)
       |SELECT dg.v AS vec_id, coalesce(t, 0) AS triangles,
       |  (floor((CASE WHEN deg > 1
       |    THEN 2.0 * coalesce(t, 0) / (deg * (deg - 1)) ELSE 0.0 END) * 1e6 + 0.5) / 1e6)
       |    AS clustering_coeff
       |FROM dg LEFT JOIN tc ON dg.v = tc.v ORDER BY vec_id""".stripMargin

  /** PCA oracle CTEs: raw moments via a zipped-unnest pair join, the
    * covariance with the OPERATOR'S exact parenthesization
    * (sxy/n − (sᵢ/n)·(sⱼ/n)), then PCA_ITERS unrolled power-iteration
    * rounds (the PageRank strategy). The uniform seed renders the same
    * Scala double the operator uses. */
  private lazy val pcaCtes: String = {
    val seed = 1.0 / math.sqrt(DIM.toDouble)
    val iterCtes = (1 to PCA_ITERS).map { t =>
      s"""cv$t AS MATERIALIZED (SELECT cov.i, sum(c * loading) AS cv
         |         FROM cov JOIN v${t - 1} v ON cov.j = v.i GROUP BY 1),
         |nr$t AS (SELECT sqrt(sum(cv * cv)) AS nrm FROM cv$t),
         |v$t AS MATERIALIZED (SELECT i, cv / nrm AS loading FROM cv$t CROSS JOIN nr$t)"""
        .stripMargin
    }.mkString(",\n")
    s"""$embsCte,
       |cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM embs),
       |el AS MATERIALIZED (SELECT vec_id, unnest(range(0, $DIM)) AS i, unnest(de) AS x
       |       FROM embs),
       |sv AS MATERIALIZED (SELECT i, sum(x) AS s FROM el GROUP BY 1),
       |pr AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
       |       FROM el a JOIN el b USING (vec_id) GROUP BY 1, 2),
       |cov AS MATERIALIZED (SELECT pr.i, pr.j,
       |          sxy / cnt.n - (si.s / cnt.n) * (sj.s / cnt.n) AS c
       |        FROM pr CROSS JOIN cnt
       |        JOIN sv si ON pr.i = si.i JOIN sv sj ON pr.j = sj.i),
       |mu AS MATERIALIZED (SELECT i, s / cnt.n AS mu FROM sv CROSS JOIN cnt),
       |v0 AS (SELECT unnest(range(0, $DIM)) AS i, $seed AS loading),
       |$iterCtes""".stripMargin
  }

  /** Deflation oracle: λ₁ = vᵀCv over the converged first component,
    * cov2 = C − λ₁·v vᵀ (operator parenthesization), then a second
    * unrolled power-iteration chain b0 → b$PCA_ITERS. */
  private lazy val pca2Ctes: String = {
    val seed = 1.0 / math.sqrt(DIM.toDouble)
    val iterCtes = (1 to PCA_ITERS).map { t =>
      s"""bv$t AS MATERIALIZED (SELECT cov2.i, sum(c * loading) AS cv
         |         FROM cov2 JOIN b${t - 1} v ON cov2.j = v.i GROUP BY 1),
         |bn$t AS (SELECT sqrt(sum(cv * cv)) AS nrm FROM bv$t),
         |b$t AS MATERIALIZED (SELECT i, cv / nrm AS loading
         |        FROM bv$t CROSS JOIN bn$t)""".stripMargin
    }.mkString(",\n")
    s"""$pcaCtes,
       |lam1 AS MATERIALIZED (SELECT sum(vi.loading * c * vj.loading) AS lam
       |        FROM cov JOIN v$PCA_ITERS vi ON cov.i = vi.i
       |        JOIN v$PCA_ITERS vj ON cov.j = vj.i),
       |cov2 AS MATERIALIZED (SELECT cov.i, cov.j,
       |          c - lam * (vi.loading * vj.loading) AS c
       |        FROM cov CROSS JOIN lam1
       |        JOIN v$PCA_ITERS vi ON cov.i = vi.i
       |        JOIN v$PCA_ITERS vj ON cov.j = vj.i),
       |b0 AS (SELECT unnest(range(0, $DIM)) AS i, $seed AS loading),
       |$iterCtes""".stripMargin
  }

  // Link-prediction oracle: wedge self-join on the shared vertex, minus
  // the adjacency, Jaccard from degrees — same tie-break chain.
  private lazy val linkPredictSql: String =
    s"""WITH $embsCte,
       |${assignedCtes(graphCellsSql)},
       |$knnEdgeCtes,
       |deg AS (SELECT src AS v, count(*) AS deg FROM ed GROUP BY src),
       |cn AS (SELECT e1.dst AS a, e2.dst AS b, count(*) AS common
       |  FROM ed e1 JOIN ed e2
       |    ON e1.src = e2.src AND e1.dst < e2.dst
       |  GROUP BY e1.dst, e2.dst
       |  HAVING count(*) >= 2),
       |nonadj AS (SELECT c.a, c.b, c.common FROM cn c
       |  LEFT JOIN (SELECT src, dst FROM ed WHERE src < dst) x
       |    ON c.a = x.src AND c.b = x.dst
       |  WHERE x.src IS NULL)
       |SELECT n.a, n.b, n.common,
       |  (floor((n.common / (da.deg + db.deg - n.common)) * 1e6 + 0.5) / 1e6) AS jaccard
       |FROM nonadj n
       |JOIN deg da ON da.v = n.a
       |JOIN deg db ON db.v = n.b
       |ORDER BY jaccard DESC, n.common DESC, n.a, n.b LIMIT 50""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_knn_pagerank" -> pagerankSql,
    // identical law: durability of the lineage cut must not change values
    "graph_pagerank_durable" -> pagerankSql,
    "graph_link_predict" -> linkPredictSql,
    "graph_personalized_pagerank" -> pprSql,
    "graph_label_communities" -> labelPropSql,
    "graph_triangle_coeff" -> triangleSql,
    "graph_bfs_hops" -> bfsSql,

    // Recall contracts: both sides of the overlap (exact brute-force
    // top-k over the sampled queries, cell-restricted/graph answer) are
    // replayed in SQL, so mean_recall is hash-exact; recall_ok is the
    // asserted floor — a literal `true` here, so a Spark-side recall
    // collapse flips the boolean and fails the compare.
    // replays the committed operating point: refined cents (from the
    // shared Lloyd chain) probe-ranked per query, top IVF_N_PROBE cells
    "sim_ivf_recall" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |q AS (SELECT vec_id AS q_id, de AS q_de
         |  FROM assigned WHERE vec_id % 25 = 0 AND vec_id < 500),
         |pr AS (SELECT q_id, cell FROM (
         |    SELECT q.q_id, c.cell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY (floor((${cosSql("c.c_emb", "q.q_de")}) * 1e6 + 0.5) / 1e6) DESC, c.cell)
         |        AS cell_rank
         |    FROM cents c CROSS JOIN q)
         |  WHERE cell_rank <= $IVF_N_PROBE),
         |pairs AS (SELECT q.q_id, a.vec_id AS c_id, a.cell AS c_cell,
         |    (floor((${cosSql("a.de", "q.q_de")}) * 1e6 + 0.5) / 1e6) AS cos
         |  FROM assigned a CROSS JOIN q WHERE a.vec_id <> q.q_id),
         |ext AS (SELECT q_id, c_id FROM pairs
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id) <= $TOP_K),
         |ivt AS (SELECT q_id, c_id FROM (
         |    SELECT p.q_id, p.c_id, p.cos FROM pairs p
         |    JOIN pr ON pr.q_id = p.q_id AND pr.cell = p.c_cell)
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id) <= $TOP_K),
         |ov AS (SELECT e.q_id, count(*) AS n_overlap
         |  FROM ext e JOIN ivt USING (q_id, c_id) GROUP BY 1),
         |rec AS (SELECT q.q_id,
         |    coalesce(ov.n_overlap, 0)::DOUBLE / $TOP_K AS recall
         |  FROM q LEFT JOIN ov USING (q_id))
         |SELECT count(*) AS n_queries, floor(avg(recall) * 1e4 + 0.5) / 1e4 AS mean_recall,
         |  true AS recall_ok
         |FROM rec""".stripMargin,

    // blocking-pair recall at the dynamic √N width: true pairs are the
    // exact brute-force ≥threshold cosines (ordered), recovered iff
    // same final quantizer cell; empty true-pair set → vacuous 1.0 on
    // both sides. recall_ok replays as a literal true — a Spark-side
    // recall collapse below the floor flips the boolean and hash-fails.
    "sim_dedup_blocking_recall" ->
      s"""WITH $embsCte,
         |${assignedCtes(graphCellsSql)},
         |tp AS (SELECT a.cell AS a_cell, x.cell AS x_cell
         |  FROM assigned a JOIN assigned x ON x.vec_id <> a.vec_id
         |  WHERE a.vec_id < 2048
         |    AND (floor((${cosSql("x.de", "a.de")}) * 1e6 + 0.5) / 1e6) >= 0.45)
         |SELECT count(*) AS n_true_pairs,
         |  coalesce(floor(avg(CASE WHEN a_cell = x_cell THEN 1.0
         |    ELSE 0.0 END) * 1e4 + 0.5) / 1e4, 1.0) AS pair_recall,
         |  true AS recall_ok
         |FROM tp""".stripMargin,

    "graph_knn_recall" ->
      s"""WITH $embsCte,
         |${assignedCtes(graphCellsSql)},
         |$knnEdgeCtes,
         |q AS (SELECT vec_id AS q_id, de AS q_de
         |  FROM assigned WHERE vec_id % 25 = 0 AND vec_id < 500),
         |pairs AS (SELECT q.q_id, a.vec_id AS c_id,
         |    (floor((${cosSql("a.de", "q.q_de")}) * 1e6 + 0.5) / 1e6) AS cos
         |  FROM assigned a CROSS JOIN q WHERE a.vec_id <> q.q_id),
         |ext AS (SELECT q_id, c_id FROM pairs
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id) <= 4),
         |ov AS (SELECT e.q_id, count(*) AS n_overlap
         |  FROM ext e JOIN ed ON ed.src = e.q_id AND ed.dst = e.c_id
         |  GROUP BY 1),
         |rec AS (SELECT q.q_id,
         |    coalesce(ov.n_overlap, 0)::DOUBLE / 4 AS recall
         |  FROM q LEFT JOIN ov USING (q_id))
         |SELECT count(*) AS n_anchors, floor(avg(recall) * 1e4 + 0.5) / 1e4 AS mean_recall,
         |  true AS recall_ok
         |FROM rec""".stripMargin,

    "sim_recall_curve" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |q AS (SELECT vec_id AS q_id, de AS q_de
         |  FROM assigned WHERE vec_id % 25 = 0 AND vec_id < 500),
         |pr AS (SELECT q.q_id, c.cell,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY (floor((${cosSql("c.c_emb", "q.q_de")}) * 1e6 + 0.5) / 1e6) DESC, c.cell)
         |      AS cell_rank
         |  FROM cents c CROSS JOIN q),
         |pairs AS (SELECT q.q_id, a.vec_id AS c_id, a.cell AS c_cell,
         |    (floor((${cosSql("a.de", "q.q_de")}) * 1e6 + 0.5) / 1e6) AS cos
         |  FROM assigned a CROSS JOIN q WHERE a.vec_id <> q.q_id),
         |ext AS (SELECT q_id, c_id FROM pairs
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id) <= $TOP_K),
         |np AS (SELECT unnest([1, 2, 4]) AS n_probe),
         |ppk AS (SELECT q_id, n_probe, c_id FROM (
         |    SELECT p.q_id, n.n_probe, p.c_id,
         |      row_number() OVER (PARTITION BY p.q_id, n.n_probe
         |        ORDER BY p.cos DESC, p.c_id) AS rk
         |    FROM pairs p
         |    JOIN pr ON pr.q_id = p.q_id AND pr.cell = p.c_cell
         |    CROSS JOIN np n
         |    WHERE pr.cell_rank <= n.n_probe)
         |  WHERE rk <= $TOP_K),
         |ov AS (SELECT n_probe, q_id, count(*) AS n_overlap
         |  FROM ext JOIN ppk USING (q_id, c_id) GROUP BY 1, 2),
         |grid AS (SELECT q_id, n_probe FROM q CROSS JOIN np),
         |rec AS (SELECT g.n_probe,
         |    coalesce(o.n_overlap, 0)::DOUBLE / $TOP_K AS recall
         |  FROM grid g LEFT JOIN ov o
         |    ON o.q_id = g.q_id AND o.n_probe = g.n_probe)
         |SELECT n_probe, count(*) AS n_queries,
         |  floor(avg(recall) * 1e4 + 0.5) / 1e4 AS mean_recall
         |FROM rec GROUP BY n_probe ORDER BY n_probe""".stripMargin,

    "sim_dim_recall_curve" ->
      s"""WITH $embsCte,
         |q AS (SELECT vec_id AS q_id, de AS q_de
         |  FROM embs WHERE vec_id % 25 = 0 AND vec_id < 500),
         |pairs AS (SELECT q.q_id, e.vec_id AS c_id, e.de, q.q_de
         |  FROM embs e CROSS JOIN q WHERE e.vec_id <> q.q_id),
         |ext AS (SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |      (floor((${cosSql("de", "q_de")}) * 1e6 + 0.5) / 1e6) AS cos
         |    FROM pairs)
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id) <= $TOP_K),
         |nd AS (SELECT unnest([16, 32, 64]) AS n_dims),
         |ppk AS (SELECT q_id, n_dims, c_id FROM (
         |    SELECT p.q_id, n.n_dims, p.c_id,
         |      row_number() OVER (PARTITION BY p.q_id, n.n_dims
         |        ORDER BY (floor((${cosSql(
                   "list_slice(p.de, 1, n.n_dims)",
                   "list_slice(p.q_de, 1, n.n_dims)")}) * 1e6 + 0.5) / 1e6) DESC,
         |        p.c_id) AS rk
         |    FROM pairs p CROSS JOIN nd n)
         |  WHERE rk <= $TOP_K),
         |ov AS (SELECT n_dims, q_id, count(*) AS n_overlap
         |  FROM ext JOIN ppk USING (q_id, c_id) GROUP BY 1, 2),
         |grid AS (SELECT q_id, n_dims FROM q CROSS JOIN nd),
         |rec AS (SELECT g.n_dims,
         |    coalesce(o.n_overlap, 0)::DOUBLE / $TOP_K AS recall
         |  FROM grid g LEFT JOIN ov o
         |    ON o.q_id = g.q_id AND o.n_dims = g.n_dims)
         |SELECT n_dims, count(*) AS n_queries,
         |  floor(avg(recall) * 1e4 + 0.5) / 1e4 AS mean_recall
         |FROM rec GROUP BY n_dims ORDER BY n_dims""".stripMargin,

    // Per-dim cell means rebuilt into an ordered list, cosine to each
    // member (rounded BEFORE the moment stats, like the operator), then
    // within-cell z via avg/stddev_pop over those rounded cosines.
    "sim_cell_outliers" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |cm AS (SELECT cell, generate_subscripts(de, 1) - 1 AS dim,
         |    unnest(de) AS e FROM assigned),
         |cent AS (SELECT cell, list(ae ORDER BY dim) AS ce FROM (
         |    SELECT cell, dim, avg(e) AS ae FROM cm GROUP BY 1, 2) GROUP BY cell),
         |scored AS (SELECT a.vec_id, a.label, a.cell,
         |    (floor((${cosSql("a.de", "ce")}) * 1e6 + 0.5) / 1e6) AS centroid_cos
         |  FROM assigned a JOIN cent USING (cell)),
         |st AS (SELECT cell, avg(centroid_cos) AS mu,
         |    stddev_pop(centroid_cos) AS sd FROM scored GROUP BY cell)
         |SELECT vec_id, label, cell, centroid_cos,
         |  CASE WHEN sd > 0 THEN (floor(((centroid_cos - mu) / sd) * 1e6 + 0.5) / 1e6)
         |    ELSE 0.0 END AS cell_z
         |FROM scored JOIN st USING (cell) ORDER BY vec_id""".stripMargin,

    "sim_pca_components2" ->
      s"""WITH $pca2Ctes
         |SELECT CAST(1 AS BIGINT) AS comp, i AS dim,
         |  (floor((loading) * 1e6 + 0.5) / 1e6) AS loading FROM v$PCA_ITERS
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), i, (floor((loading) * 1e6 + 0.5) / 1e6) FROM b$PCA_ITERS
         |ORDER BY comp, dim""".stripMargin,

    "sim_pca_component" ->
      s"""WITH $pcaCtes
         |SELECT v.i AS dim, (floor((loading) * 1e6 + 0.5) / 1e6) AS loading,
         |  (floor((mu) * 1e6 + 0.5) / 1e6) AS mu
         |FROM v$PCA_ITERS v JOIN mu ON v.i = mu.i ORDER BY dim""".stripMargin,

    "sim_pca_project" ->
      s"""WITH $pcaCtes,
         |md AS (SELECT sum(mu * loading) AS mu_dot
         |       FROM mu JOIN v$PCA_ITERS USING (i)),
         |xd AS (SELECT vec_id, sum(x * loading) AS x_dot
         |       FROM el JOIN v$PCA_ITERS USING (i) GROUP BY 1)
         |SELECT vec_id, (floor((x_dot - mu_dot) * 1e6 + 0.5) / 1e6) AS pc1
         |FROM xd CROSS JOIN md ORDER BY vec_id""".stripMargin,
    "sim_random_projection" -> randomProjSql,

    "sim_topk_cosine" ->
      s"""WITH $embsCte,
         |q AS (SELECT de AS qe FROM embs WHERE vec_id = $QUERY_ID)
         |SELECT vec_id, label, (floor((${cosSql("de", "qe")}) * 1e6 + 0.5) / 1e6) AS cosine
         |FROM embs, q WHERE vec_id <> $QUERY_ID
         |ORDER BY cosine DESC, vec_id LIMIT $TOP_K""".stripMargin,

    "sim_lsh_topk" ->
      s"""WITH $embsCte,
         |signed AS (SELECT vec_id, de, ${sigSql("de")} AS sig FROM embs),
         |q AS (SELECT de AS qe, sig AS q_sig FROM signed WHERE vec_id = $QUERY_ID)
         |SELECT vec_id, sig, (floor((${cosSql("de", "qe")}) * 1e6 + 0.5) / 1e6) AS cosine
         |FROM signed, q WHERE vec_id <> $QUERY_ID AND sig = q_sig
         |ORDER BY cosine DESC, vec_id LIMIT $TOP_K""".stripMargin,

    "sim_ivf_topk" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |q AS (SELECT de AS qe, cell AS q_cell FROM assigned WHERE vec_id = $QUERY_ID)
         |SELECT a.vec_id, a.cell, (floor((${cosSql("a.de", "qe")}) * 1e6 + 0.5) / 1e6) AS cosine
         |FROM assigned a, q WHERE a.vec_id <> $QUERY_ID AND a.cell = q_cell
         |ORDER BY cosine DESC, a.vec_id LIMIT $TOP_K""".stripMargin,

    "sim_ivf_nprobe_topk" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |q AS (SELECT de AS qe FROM embs WHERE vec_id = $QUERY_ID),
         |probed AS (
         |  SELECT cell FROM cents, q
         |  ORDER BY (floor((${cosSql("c_emb", "qe")}) * 1e6 + 0.5) / 1e6) DESC, cell LIMIT 2)
         |SELECT a.vec_id, a.cell, (floor((${cosSql("a.de", "qe")}) * 1e6 + 0.5) / 1e6) AS cosine
         |FROM assigned a JOIN probed p ON a.cell = p.cell, q
         |WHERE a.vec_id <> $QUERY_ID
         |ORDER BY cosine DESC, a.vec_id LIMIT $TOP_K""".stripMargin,

    "sim_index_upsert_assign" ->
      s"""WITH $embsCte,
         |${assignedCtes(N_CELLS.toString, baseWhere = "vec_id % 10 <> 9",
             assignWhere = "e.vec_id % 10 = 9")}
         |SELECT vec_id, cell FROM assigned ORDER BY vec_id""".stripMargin,

    "sim_index_batch_topk" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |q AS (SELECT vec_id AS query_id, de AS qe FROM embs
         |  WHERE vec_id IN (${BATCH_IDS.mkString(", ")})),
         |probed AS (
         |  SELECT q.query_id, c.cell, q.qe
         |  FROM cents c CROSS JOIN q
         |  QUALIFY row_number() OVER (PARTITION BY q.query_id
         |    ORDER BY (floor((${cosSql("c.c_emb", "q.qe")}) * 1e6 + 0.5) / 1e6) DESC, c.cell) <= 2)
         |SELECT query_id, vec_id, cell, cosine FROM (
         |  SELECT p.query_id, a.vec_id, a.cell,
         |    (floor((${cosSql("a.de", "p.qe")}) * 1e6 + 0.5) / 1e6) AS cosine
         |  FROM assigned a JOIN probed p ON a.cell = p.cell
         |  WHERE a.vec_id <> p.query_id
         |  QUALIFY row_number() OVER (PARTITION BY p.query_id
         |    ORDER BY (floor((${cosSql("a.de", "p.qe")}) * 1e6 + 0.5) / 1e6) DESC, a.vec_id) <= $TOP_K)
         |ORDER BY query_id, cosine DESC, vec_id""".stripMargin,

    // the pruned serving path scores the SAME probed cells as
    // sim_ivf_nprobe_topk but serves the query as an external vector —
    // no self-exclusion, so its indexed copy leads at cosine 1.0
    "sim_index_pruned_topk" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |q AS (SELECT de AS qe FROM embs WHERE vec_id = $QUERY_ID),
         |probed AS (
         |  SELECT cell FROM cents, q
         |  ORDER BY (floor((${cosSql("c_emb", "qe")}) * 1e6 + 0.5) / 1e6) DESC, cell LIMIT 2)
         |SELECT a.vec_id, a.cell, (floor((${cosSql("a.de", "qe")}) * 1e6 + 0.5) / 1e6) AS cosine
         |FROM assigned a JOIN probed p ON a.cell = p.cell, q
         |ORDER BY cosine DESC, a.vec_id LIMIT $TOP_K""".stripMargin,

    // the auto-dialed entrypoint serves the same math as the pruned
    // path it dials to at this index size
    "sim_index_serve_topk" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |q AS (SELECT de AS qe FROM embs WHERE vec_id = $QUERY_ID),
         |probed AS (
         |  SELECT cell FROM cents, q
         |  ORDER BY (floor((${cosSql("c_emb", "qe")}) * 1e6 + 0.5) / 1e6) DESC, cell LIMIT 2)
         |SELECT a.vec_id, a.cell, (floor((${cosSql("a.de", "qe")}) * 1e6 + 0.5) / 1e6) AS cosine
         |FROM assigned a JOIN probed p ON a.cell = p.cell, q
         |ORDER BY cosine DESC, a.vec_id LIMIT $TOP_K""".stripMargin,

    "sim_normalize_quantize" ->
      s"""WITH $embsCte
         |SELECT vec_id, (floor((sqrt(list_dot_product(de, de))) * 1e6 + 0.5) / 1e6) AS norm,
         |  CASE WHEN list_dot_product(de, de) = 0 THEN ''
         |    ELSE array_to_string(list_transform(de,
         |      x -> CAST((floor((x / sqrt(list_dot_product(de, de)) * 127) + 0.5)) AS INTEGER)), ',')
         |  END AS q8
         |FROM embs ORDER BY vec_id""".stripMargin,

    // `verified(a, b, jaccard)` is the generic pair-similarity shape the
    // shared componentCtes builder consumes — here "jaccard" carries the
    // rounded cosine.
    "sim_semantic_dedup" ->
      s"""WITH RECURSIVE $embsCte,
         |${assignedCtes(graphCellsSql)},
         |verified AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b,
         |    (floor((${cosSql("x.de", "y.de")}) * 1e6 + 0.5) / 1e6) AS jaccard
         |  FROM assigned x JOIN assigned y
         |    ON x.cell = y.cell AND x.vec_id < y.vec_id),
         |${DuckSql.componentCtes(0.45)}
         |SELECT e.vec_id, e.label FROM embeddings e
         |WHERE NOT EXISTS (SELECT 1 FROM comp c
         |  WHERE c.doc_id = e.vec_id AND c.doc_id <> c.cluster_rep)
         |ORDER BY vec_id""".stripMargin,

    "sim_kmeans_refine" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |flat AS (
         |  SELECT cell, generate_subscripts(de, 1) - 1 AS dim, unnest(de) AS e
         |  FROM assigned)
         |SELECT cell, count(*) AS n, dim, floor(avg(e) * 1e6 + 0.5) / 1e6 AS v
         |FROM flat GROUP BY cell, dim ORDER BY cell, dim""".stripMargin,

    "sim_label_centroids" ->
      """WITH flat AS (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS e
        |  FROM embeddings)
        |SELECT label, dim, floor(avg(e) * 1e6 + 0.5) / 1e6 AS v
        |FROM flat GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "sim_knn_classify" ->
      s"""WITH $embsCte,
         |${assignedCtes(graphCellsSql)},
         |pr AS (SELECT a.vec_id, a.label, b.vec_id AS nn_vec_id,
         |    b.label AS nn_label,
         |    (floor((${cosSql("a.de", "b.de")}) * 1e6 + 0.5) / 1e6) AS cosine
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         |tk AS (SELECT vec_id, label, nn_label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cosine DESC, nn_vec_id) AS rn FROM pr) WHERE rn <= 8),
         |votes AS (SELECT vec_id, label, nn_label, count(*) AS votes
         |  FROM tk GROUP BY vec_id, label, nn_label)
         |SELECT vec_id, label, nn_label AS pred_label, votes,
         |  CAST(sum(votes) OVER (PARTITION BY vec_id) AS BIGINT) AS n_neighbors
         |FROM votes
         |QUALIFY row_number() OVER (PARTITION BY vec_id
         |  ORDER BY votes DESC, nn_label) = 1
         |ORDER BY vec_id""".stripMargin,

    "sim_ivfpq_topk" ->
      s"""WITH $embsCte,
         |${assignedCtes()},
         |$pqCtes,
         |q AS (SELECT de AS qe FROM embs WHERE vec_id = $QUERY_ID),
         |probed AS (
         |  SELECT cell FROM cents, q
         |  ORDER BY (floor((${cosSql("c_emb", "qe")}) * 1e6 + 0.5) / 1e6) DESC, cell LIMIT 2),
         |lut AS (SELECT c.sub_j, c.code,
         |    (floor((list_dot_product(qs.sv, qs.sv) + list_dot_product(c.cv, c.cv)
         |      - 2 * list_dot_product(qs.sv, c.cv)) * 1e6 + 0.5) / 1e6) AS d2
         |  FROM cw c JOIN (SELECT sub_j, sv FROM sub WHERE vec_id = $QUERY_ID) qs
         |    USING (sub_j))
         |SELECT b.vec_id, a.cell, floor(sum(l.d2) * 1e6 + 0.5) / 1e6 AS adc_dist
         |FROM best b JOIN assigned a USING (vec_id)
         |  JOIN probed p ON a.cell = p.cell
         |  JOIN lut l USING (sub_j, code)
         |WHERE b.vec_id <> $QUERY_ID
         |GROUP BY b.vec_id, a.cell
         |ORDER BY adc_dist, b.vec_id LIMIT $TOP_K""".stripMargin,

    "sim_triplets" ->
      s"""WITH $embsCte,
         |${assignedCtes(graphCellsSql)},
         |posc AS (SELECT a.vec_id, b.vec_id AS pos_id,
         |    (floor((${cosSql("a.de", "b.de")}) * 1e6 + 0.5) / 1e6) AS pos_cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         |pos AS (SELECT vec_id, pos_id, pos_cos FROM posc
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY pos_cos DESC, pos_id) = 1),
         |negc AS (SELECT a.vec_id, b.vec_id AS neg_id,
         |    (floor((${cosSql("a.de", "b.de")}) * 1e6 + 0.5) / 1e6) AS neg_cos,
         |    md5(CAST(a.vec_id AS VARCHAR) || '|' || CAST(b.vec_id AS VARCHAR)) AS h
         |  FROM assigned a JOIN assigned b
         |    ON b.cell = (a.cell + 1) % $graphCellsSql),
         |neg AS (SELECT vec_id, neg_id, neg_cos FROM negc
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY h, neg_id) = 1)
         |SELECT vec_id AS anchor_id, pos_id, pos_cos, neg_id, neg_cos
         |FROM pos JOIN neg USING (vec_id) ORDER BY anchor_id""".stripMargin,

    "sim_pq_codes" ->
      s"""WITH $embsCte,
         |$pqCtes
         |SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub_j) AS codes
         |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "sim_pq_adc_topk" ->
      s"""WITH $embsCte,
         |$pqCtes,
         |lut AS (SELECT c.sub_j, c.code,
         |    (floor((list_dot_product(q.sv, q.sv) + list_dot_product(c.cv, c.cv)
         |      - 2 * list_dot_product(q.sv, c.cv)) * 1e6 + 0.5) / 1e6) AS d2
         |  FROM cw c JOIN (SELECT sub_j, sv FROM sub WHERE vec_id = $QUERY_ID) q
         |    USING (sub_j))
         |SELECT b.vec_id, floor(sum(l.d2) * 1e6 + 0.5) / 1e6 AS adc_dist
         |FROM best b JOIN lut l USING (sub_j, code)
         |WHERE b.vec_id <> $QUERY_ID
         |GROUP BY b.vec_id
         |ORDER BY adc_dist, vec_id LIMIT $TOP_K""".stripMargin,

    "sim_nn_within_label" ->
      s"""WITH $embsCte,
         |${assignedCtes(nnCellsSql)}
         |SELECT a.vec_id AS vec_id, a.label AS label, b.vec_id AS nn_vec_id,
         |  (floor((${cosSql("a.de", "b.de")}) * 1e6 + 0.5) / 1e6) AS cosine
         |FROM assigned a JOIN assigned b
         |  ON a.label = b.label AND a.cell = b.cell AND a.vec_id <> b.vec_id
         |QUALIFY row_number() OVER (PARTITION BY a.vec_id
         |  ORDER BY (floor((${cosSql("a.de", "b.de")}) * 1e6 + 0.5) / 1e6) DESC, b.vec_id) = 1
         |ORDER BY vec_id""".stripMargin
  )
}
