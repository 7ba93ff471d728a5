package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.{Bucketed, FileStats, Generations}

/** Scale evidence for the r16 lakehouse layers, at the synthesized big
  * SFs ([[ScaleData]]): file-level data skipping and bucketed
  * co-located joins — measured, not argued (SCALING.md).
  *
  *  - SKIPPING: commit the events table ts-range-clustered with
  *    declared stats columns, then time the 3-of-30-day windowed
  *    aggregate as (a) the full-scan plan and (b) the
  *    [[Generations.readPruned]] plan. Reports kept/total files and the
  *    wall-clock ratio — at 100 TB the ratio IS the fraction of the
  *    table the predicate admits.
  *  - CO-LOCATED JOIN: persist orders ⋈ lineitem's two sides bucketed
  *    by the order key, then time the join+agg as (a) the plain
  *    shuffling join over raw parquet and (b) the bucketed sort-merge
  *    join, printing each plan's exchange count. The bucketed write is
  *    timed too — the once-paid cost the per-run saving amortizes.
  *
  *  - BLOOM DFP (r17): the >maxKeys dynamic-pruning regime — a
  *    two-clump high-cardinality dim key set whose [min, max] spans
  *    every file of the clustered fact; reports range-tier vs
  *    bloom-tier kept files and the join wall-clock ratio.
  *  - GENERATIONS-BUCKETED JOIN (r17): the co-located layout composed
  *    into the commit protocol — a 2-commit (base + append) registered
  *    span must still plan ZERO exchanges and match the plain join.
  *
  * `runMain graft.LakeScaleProbe [sfDir] [reps]` (default var/sf10, 3).
  * Probe tables live under `<sfDir>/_lakeprobe` and are deleted at the
  * end (the probe is re-runnable, not a fixture).
  */
object LakeScaleProbe {

  private def time[A](reps: Int)(f: => A): (Double, A) = {
    var best = Double.MaxValue
    var last: A = null.asInstanceOf[A]
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      last = f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    (best, last)
  }

  // decimal sums: the cross-plan equality check must be order-
  // independent (a double sum over 60M rows differs in the last cents
  // digit between two join orders — measured here at sf10)
  private def agg3(df: DataFrame): Array[org.apache.spark.sql.Row] =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("sv"))
      .orderBy("event_type").collect()

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("var/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-lp-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = s"$sfDir/_lakeprobe"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // ---------------------------------------------------- skipping
      val ev = Tables.load(spark, sfDir, "events")
      val nEvents = ev.count()
      // file width at pruning granularity: ~160k events per file puts
      // ~half a day in each file at sf10 (62 files over 30 days), the
      // grain a time-partitioned fact table would have
      val nFiles = math.max(16, (nEvents / 160000L).toInt)
      val tab = s"$root/events_by_ts"
      Generations.setStatsCols(spark, tab, Seq("ts", "value"))
      val (tWrite, _) = time(1) {
        Generations.writeAndCommit(spark, ev.repartitionByRange(nFiles,
          col("ts")).sortWithinPartitions("ts"), tab)
      }
      println(f"INFO,skipping,$nEvents events,$nFiles files,clustered write $tWrite%.1f s")
      val preds = Seq(FileStats.Between("ts",
        FileStats.tsMicros("2024-01-10T00:00:00"),
        FileStats.tsMicros("2024-01-13T00:00:00")))
      val (kept, total) = Generations.prunePlan(spark, tab, preds).get
      val realFilter = col("ts") >= lit("2024-01-10 00:00:00") &&
        col("ts") < lit("2024-01-13 00:00:00")
      val (tFull, rFull) = time(reps)(
        agg3(Generations.readLog(spark, tab).get.filter(realFilter)))
      val (tPruned, rPruned) = time(reps)(
        agg3(Generations.readPruned(spark, tab, preds).get.filter(realFilter)))
      val same = rFull.sameElements(rPruned)
      println(f"RESULT,skipping_files,kept ${kept.size}/$total")
      println(f"RESULT,skipping_scan,full $tFull%.2f s,pruned $tPruned%.2f s," +
        f"x${tFull / tPruned}%.1f,values_equal=$same")
      require(same, "pruned scan diverged from full scan")

      // ----------------------------------------------- bucketed join
      val orders = Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val items = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount"))
      val nItems = items.count()
      val buckets = math.max(8, (nItems / 2000000L).toInt)
      def joinAgg(j: DataFrame): Array[org.apache.spark.sql.Row] =
        j.groupBy(col("o_orderpriority"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(28,6)")).as("rev"), count(lit(1)).as("n"))
          .orderBy("o_orderpriority").collect()
      val sfx = java.util.UUID.randomUUID.toString.take(8)
      val (to, tl) = (s"lp_orders_$sfx", s"lp_items_$sfx")
      val (tBWrite, _) = time(1) {
        Bucketed.writeBucketed(orders, to, s"$root/bo", "o_orderkey", buckets)
        Bucketed.writeBucketed(items, tl, s"$root/bl", "o_orderkey", buckets)
      }
      println(f"INFO,bucketed,$nItems items,$buckets buckets,write $tBWrite%.1f s")
      val plain = items.join(orders.hint("merge"), "o_orderkey")
      val coloc = Bucketed.colocatedJoin(spark, tl, to, "o_orderkey")
      val (tPlain, rPlain) = time(reps)(joinAgg(plain))
      val (tColoc, rColoc) = time(reps)(joinAgg(coloc))
      val jSame = rPlain.sameElements(rColoc)
      println(f"RESULT,bucketed_join,plain $tPlain%.2f s " +
        f"(${Bucketed.exchangeCount(plain)} exchanges)," +
        f"colocated $tColoc%.2f s (${Bucketed.exchangeCount(coloc)} " +
        f"exchanges),x${tPlain / tColoc}%.1f,values_equal=$jSame")
      require(jSame, "co-located join diverged from plain join")

      // ------------------------------------------ pruned IVF serving
      // the ANN serving path: in-plan probe filter (opens every
      // postings footer) vs the stats-planned file list — per-query
      // serving latency, the metric an online index lives and dies by
      val embs = Tables.load(spark, sfDir, "embeddings")
      val nVecs = embs.count()
      val nCells = math.max(16, math.round(math.sqrt(nVecs.toDouble)).toInt)
      val idx = s"$root/ivf"
      val (tBuild, _) = time(1)(graft.operators.IvfIndex.build(
        spark, embs, nCells, idx, numFiles = math.max(8, nCells / 8)))
      println(f"INFO,ivf,$nVecs vectors,$nCells cells,build $tBuild%.1f s")
      import spark.implicits._
      val qv = embs.filter(col("vec_id") === 7L)
        .select(col("embedding")).as[Seq[Float]].collect().head
      val (tFullServe, rF) = time(reps)(graft.operators.IvfIndex
        .topKVec(spark, idx, qv, k = 10, nProbe = 4).collect())
      val (tPrunedServe, rP) = time(reps)(graft.operators.IvfIndex
        .topKVecPruned(spark, idx, qv, k = 10, nProbe = 4).collect())
      val sSame = rF.map(r => (r.getLong(0), r.getDouble(2))).sameElements(
        rP.map(r => (r.getLong(0), r.getDouble(2))))
      println(f"RESULT,ivf_serving,inplan $tFullServe%.2f s," +
        f"pruned $tPrunedServe%.2f s,x${tFullServe / tPrunedServe}%.1f," +
        f"values_equal=$sSame")
      require(sSame, "pruned serving diverged from in-plan serving")

      // ------------------------------------------------ bloom-tier DFP
      // the >maxKeys regime the range tier cannot touch: a dim key set
      // of two clumps at OPPOSITE ends of the clustered fact keyspace —
      // [min, max] spans every file, the exact-key tier is past the
      // collect bound, only the committed per-file blooms prune. fpp is
      // per-probe: a file with none of the K keys survives ≈ K·fpp, so
      // 1e-6 holds ~15k-key probes ≈1.5%; larger K ⇒ declare smaller
      // fpp (bits/elem ∝ −ln fpp).
      val liTab = s"$root/items_by_okey"
      Generations.setStatsCols(spark, liTab, Seq("l_orderkey"))
      Generations.setBloomCols(spark, liTab, Seq("l_orderkey"), fpp = 1e-6)
      val liKeyed = Tables.load(spark, sfDir, "lineitem").select(
        col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val (tBloomWrite, _) = time(1) {
        Generations.writeAndCommit(spark, liKeyed
          .repartitionByRange(32, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"), liTab)
      }
      val mx = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      val (cLo, cHi) = (mx / 200, mx - mx / 200)
      val dimB = orders
        .filter(col("o_orderkey") <= cLo || col("o_orderkey") >= cHi)
      val dimKeys = dimB.select(col("o_orderkey"))
      val nProbeKeys = dimKeys.distinct().count()
      println(f"INFO,bloom_dfp,write+blooms $tBloomWrite%.1f s," +
        f"$nProbeKeys probe keys (two 0.5%% clumps)")
      def dfpAgg(fact: DataFrame): Array[org.apache.spark.sql.Row] =
        fact.join(dimB, fact("l_orderkey") === dimB("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(28,6)")).as("rev"), count(lit(1)).as("n"))
          .orderBy("o_orderpriority").collect()
      // range-only plan (what the >maxKeys regime got before the tier)
      val rangeOnly = Seq(FileStats.Between("l_orderkey", 1L, mx))
      val (keptR, totalR) = Generations.prunePlan(spark, liTab, rangeOnly).get
      val (keptB, totalB) = Generations.prunePlanByKeys(spark, liTab,
        "l_orderkey", dimKeys, maxKeys = 16).get
      println(f"RESULT,bloom_dfp_files,range keeps ${keptR.size}/$totalR," +
        f"bloom keeps ${keptB.size}/$totalB")
      val (tRangeJ, rRangeJ) = time(reps)(dfpAgg(
        Generations.readPruned(spark, liTab, rangeOnly).get))
      val (tBloomJ, rBloomJ) = time(reps)(dfpAgg(
        Generations.readPrunedByKeys(spark, liTab, "l_orderkey",
          dimKeys, maxKeys = 16).get))
      val bSame = rRangeJ.sameElements(rBloomJ)
      println(f"RESULT,bloom_dfp_join,range-only $tRangeJ%.2f s," +
        f"bloom $tBloomJ%.2f s,x${tRangeJ / tBloomJ}%.1f,values_equal=$bSame")
      require(bSame, "bloom-pruned join diverged from range-only join")
      require(keptB.size * 2 < totalB, "bloom tier failed to prune")

      // --------------------------- Generations-composed bucketed join
      // the same co-located join as the bucketed section, but the
      // layout lives INSIDE the commit protocol: two commits (base +
      // append), registered span, zero exchanges — one mutable table of
      // record that is also exchange-free joinable
      val (gfTab, gdTab) = (s"$root/genb_fact", s"$root/genb_dim")
      Generations.setBucketing(spark, gfTab, "o_orderkey", buckets)
      Generations.setBucketing(spark, gdTab, "o_orderkey", buckets)
      val (tGWrite, _) = time(1) {
        Generations.writeAndCommit(spark,
          items.filter(col("o_orderkey") % 10 =!= 0), gfTab)
        Generations.appendCommitted(spark,
          items.filter(col("o_orderkey") % 10 === 0), gfTab, "batch=1")
        Generations.writeAndCommit(spark, orders, gdTab)
      }
      println(f"INFO,gen_bucketed,$buckets buckets,commits write $tGWrite%.1f s")
      val gjF = Bucketed.readGenerations(spark, gfTab, s"lp_genb_f_$sfx")
      val gjD = Bucketed.readGenerations(spark, gdTab, s"lp_genb_d_$sfx")
      val gj = gjF.join(gjD.hint("merge"), "o_orderkey")
      val gEx = Bucketed.exchangeCount(gj)
      val (tGenJ, rGenJ) = time(reps)(joinAgg(gj))
      val gSame = rGenJ.sameElements(rPlain)
      println(f"RESULT,gen_bucketed_join,plain $tPlain%.2f s," +
        f"generations-colocated $tGenJ%.2f s ($gEx exchanges over a " +
        f"2-commit span),x${tPlain / tGenJ}%.1f,values_equal=$gSame")
      require(gEx == 0, "generations-bucketed join planned exchanges")
      require(gSame, "generations-bucketed join diverged from plain join")
      println("LAKE PROBE DONE")
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      spark.stop()
    }
  }
}
