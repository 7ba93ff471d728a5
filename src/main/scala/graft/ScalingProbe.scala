package graft

import org.apache.spark.sql.SparkSession

/** Measured scaling evidence: run a representative query subset at
  * sf0.001 / sf0.01 / sf0.1 (10× data per step) and report each query's
  * scaling exponent between the two largest SFs —
  * slope = log10(t(0.1) / t(0.01)), so 1.0 = linear in data, < 1 =
  * sub-linear (fixed overhead still amortizing), > 1 = super-linear (a
  * shape that would NOT survive a 100× scale-up and needs a plan fix).
  * The committed table lives in SCALING.md.
  *
  * `runMain graft.ScalingProbe [reps]` — min of `reps` (default 2) per
  * (query, sf); one warm-up of the whole subset at the smallest SF.
  */
object ScalingProbe {

  /** One query per major family, biased to the shapes whose scaling is
    * least obvious from the plan (self-joins, iterative, codegen'd HOF
    * replacements, window-heavy).
    */
  val Subset: Seq[String] = Seq(
    "agg_pricing_summary",    // TPC-H scan+agg
    "join_revenue_by_nation", // multi-join
    "window_topk_per_group",  // rank window
    "dedup_exact",            // digest groupBy
    "dedup_lsh_pairs",        // banded self-join + verify
    "sim_ivf_topk",           // cell-blocked ANN
    "text_tfidf_keywords",    // tokenize + per-term stats
    "tok_bpe_segment",        // vocab-bounded segmentation
    "learn_kfold_cv",         // one-pass CV (this round's collapse)
    "search_eval_ndcg",       // batched retrieval eval (ditto)
    "graph_bfs_hops",         // iterative frontier
    "merge_upsert_orders")    // MERGE anti-join + union

  private val SfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up (JIT, codegen caches) at the smallest SF
    Subset.foreach(q => SparkEntry.queries(q)(spark, SfDirs.head).count())

    val times: Map[(String, String), Double] = (for {
      sf <- SfDirs; q <- Subset
    } yield {
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (q, sf) -> t
    }).toMap

    println("query,t_sf0001,t_sf001,t_sf01,slope_001_to_01")
    Subset.foreach { q =>
      val Seq(a, b, c) = SfDirs.map(sf => times((q, sf)))
      val slope = math.log10(c / b)
      println(f"$q,$a%.3f,$b%.3f,$c%.3f,$slope%.3f")
    }
    spark.stop()
  }
}
