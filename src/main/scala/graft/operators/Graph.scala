package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Graph analytics over DataFrame edge lists — the data-selection
  * complement to [[Dedup.connectedComponents]]: PageRank centrality over
  * a k-nearest-neighbour similarity graph ranks documents/embeddings by
  * how "central" they are in the corpus, the standard graph-based
  * diversity/representativeness signal for training-data selection
  * (high-rank = prototypical, low-rank = outlier).
  */
object Graph {

  /** Symmetrized k-NN edge list over the embeddings table: each vector's
    * top-k cosine neighbours within its label block (blocking bounds the
    * candidate pairs exactly as in [[Similarity.nearestWithinLabel]]; at
    * scale the block key would be an LSH bucket / IVF cell), mirrored so
    * the graph is undirected — every node then has outdegree ≥ k, so
    * PageRank sees no dangling mass.
    *
    * Scale shape: the label join broadcasts the (MB-sized) right side so
    * pair generation parallelizes over the left's partitions; the top-k
    * is a rank window that Spark 4 plans as Partial+Final
    * `WindowGroupLimit` — each map task keeps only k rows per vec_id
    * BEFORE the shuffle. Cosines are rounded to 6 places before ranking
    * so the neighbour choice (ties → lowest id) is engine-independent.
    */
  def knnEdges(embeddings: DataFrame, k: Int): DataFrame = {
    val a = embeddings.select(col("label"), col("vec_id"), col("embedding"))
    val b = embeddings.select(col("label"), col("vec_id").as("nn_vec_id"),
      col("embedding").as("nn_emb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("nn_vec_id").asc)
    val topk = a.join(broadcast(b), Seq("label"))
      .filter(col("vec_id") =!= col("nn_vec_id"))
      .withColumn("cosine",
        round(VectorFns.cosine(col("embedding"), col("nn_emb")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("vec_id").as("src"), col("nn_vec_id").as("dst"))
    topk.unionByName(topk.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** PageRank with `iters` fixed power iterations at damping `d`:
    * rank'(v) = (1−d)/N + d · Σ_{u→v} rank(u)/outdeg(u), ranks seeded
    * uniform. Fixed iteration count (not convergence-tested) keeps the
    * result a pure function of the edge list, so a SQL oracle can replay
    * it by unrolling the same `iters` joins.
    *
    * Requires every node to have at least one out-edge (true for any
    * symmetrized graph, e.g. [[knnEdges]]) — dangling nodes would leak
    * rank mass and silently deflate totals, so they are rejected here.
    *
    * Scale shape: each iteration is one join of the (checkpointed,
    * edge-count-partitioned) edge list against the current rank vector
    * plus a partial-aggregable sum — the classic Pregel shape expressed
    * declaratively. Lineage is truncated every round; damping makes the
    * iteration a contraction, so cross-engine float divergence stays at
    * rounding noise instead of compounding.
    *
    * @return (v, rank_norm) where rank_norm = rank × N (mean 1.0),
    *         rounded to 6 places.
    */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // One edge-frame reused every iteration: checkpoint once, partitioned
    // by the join side's key and sized to the edge count (same rationale
    // as connectedComponents — pair graphs are tiny next to the corpus).
    val eRaw = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg")).localCheckpoint()
    val nEdges = eRaw.count()
    val parts = math.max(1, (nEdges / 2000000L).toInt)
    val e = eRaw.repartition(parts, col("src")).localCheckpoint()

    val nodes = e.select(col("src").as("v")).distinct()
      .repartition(parts, col("v")).localCheckpoint()
    val n = nodes.count().toDouble
    val dangling = edges.select(col("dst")).distinct()
      .join(nodes, col("dst") === col("v"), "left_anti").count()
    require(dangling == 0,
      s"$dangling dangling node(s) (in-edges but no out-edges) would leak rank mass")

    var ranks = nodes.withColumn("r", lit(1.0 / n))
    for (i <- 1 to iters) {
      ranks = e.join(ranks, e("src") === ranks("v"))
        .select(col("dst"), (col("r") / col("outdeg")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("v"),
          (lit((1 - damping) / n) + lit(damping) * col("s")).as("r"))
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("v"), round(col("r") * n, 6).as("rank_norm"))
  }
}
