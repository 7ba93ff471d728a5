package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.Generations
import graft.streaming.{ChangeFeed, StreamingIvm}

/** Offline probe for the stream⋈stream BAND-HORIZON FOLD claim (r18
  * VERDICT #2): drive 12+ ticks of the maintained attribution view with
  * the fold dial on and off, reporting per-tick wall seconds, the
  * retained RAW row count each tick (the structural metric — wall times
  * are host-weather), and final view equality. The claim under test:
  * with folding, the per-tick raw scan size goes FLAT once the history
  * outgrows the band horizon, while the unfolded run's grows linearly
  * with age — the difference between O(delta ⋈ horizon) and
  * O(delta ⋈ full-history) maintenance at 100 TB retention.
  *
  * Usage: runMain graft.StreamFoldProbe [workDir] [ticks] [rowsPerTick]
  */
object StreamFoldProbe {
  def main(args: Array[String]): Unit = {
    val work = if (args.length > 0) args(0) else "var/sfoldprobe"
    val ticks = if (args.length > 1) args(1).toInt else 12
    val rows = if (args.length > 2) args(2).toLong else 200000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nUsers = 50000L
    val baseUs = 1767225600000000L // 2026-01-01T00:00:00Z in micros

    // one tick's events: timestamps spread across the tick's hour, so
    // marks advance ~1h per tick and rows age past the 3h horizon
    // (lateness 2h + window 1h) after ~4 ticks
    def batch(tick: Int, salt: Long): DataFrame =
      spark.range(rows)
        .select(((col("id") * 2654435761L + salt) % nUsers).as("user_id"),
          timestamp_micros(lit(baseUs) + lit(tick.toLong * 3600000000L) +
            (col("id") % 3600L) * 1000000L).as("ts"),
          ((col("id") % 100L).cast("double") / 10.0).as("value"))

    def run(dial: Int): (Seq[Double], Seq[Long], Int,
        Map[Long, (Long, java.math.BigDecimal)]) = {
      val tag = s"d$dial"
      val lc = s"$work/${tag}_c${System.nanoTime()}"
      val lp = s"$work/${tag}_p${System.nanoTime()}"
      val mv = s"$work/${tag}_m${System.nanoTime()}"
      val times = Seq.newBuilder[Double]
      val rawRows = Seq.newBuilder[Long]
      var incr = 0
      (0 until ticks).foreach { i =>
        val t0 = System.nanoTime()
        StreamingIvm.ingestAttributionBatch(spark, batch(i, 17L),
          batch(i, 71L), i.toLong, lc, lp, mv, foldAfterCommits = dial,
          foldMinPrefix = math.max(1, dial))
        times += (System.nanoTime() - t0) / 1e9
        if (ChangeFeed.lastMaintainIncremental.get) incr += 1
        val cLog = Generations.readLog(spark, lc).get
        rawRows += (if (cLog.columns.contains(ChangeFeed.GsumCol))
          cLog.filter(coalesce(col(ChangeFeed.GsumCol), lit(false)) ===
            false).count()
        else cLog.count())
      }
      val st = Generations.read(spark, mv).get
        .select(col("user_id"), col("n_pairs"), col("sum_value"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDecimal(2))))
        .toMap
      (times.result(), rawRows.result(), incr, st)
    }

    val (tRaw, rRaw, _, sRaw) = run(dial = 0)
    val (tFold, rFold, iFold, sFold) = run(dial = 3)
    // fold-per-tick (r19 stacked-fold generalization): many SMALL folds
    // — each lost-pair aggregation touches only the newly-dead slice —
    // with EVERY post-warmup tick still on the incremental path (a
    // stacked quiescent fold no longer costs the next tick a recompute)
    val (tF1, rF1, iF1, sF1) = run(dial = 1)
    def eq(a: Map[Long, (Long, java.math.BigDecimal)],
        b: Map[Long, (Long, java.math.BigDecimal)]): Boolean =
      a.size == b.size && a.forall { case (k, v) =>
        b.get(k).exists(w => w._1 == v._1 && w._2.compareTo(v._2) == 0)
      }
    val equal = eq(sRaw, sFold) && eq(sRaw, sF1)
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    def arrL(xs: Seq[Long]) = xs.mkString("[", ",", "]")
    // structural flatness: the folded run's retained raw rows must stop
    // growing (last tick ≈ the horizon's worth), while the raw run's
    // grow linearly to ticks × rows
    val foldTail = rFold.last
    val rawTail = rRaw.last
    println(
      s"""{"metric":"stream_fold_probe","ticks":$ticks,"rows_per_tick":$rows,""" +
      s""""tick_s_raw":${arr(tRaw)},"tick_s_fold":${arr(tFold)},""" +
      s""""tick_s_fold1":${arr(tF1)},""" +
      s""""raw_rows_unfolded":${arrL(rRaw)},"raw_rows_folded":${arrL(rFold)},""" +
      s""""raw_rows_fold1":${arrL(rF1)},""" +
      s""""incremental_ticks_fold":$iFold,"incremental_ticks_fold1":$iF1,""" +
      s""""final_raw_unfolded":$rawTail,"final_raw_folded":$foldTail,""" +
      s""""final_raw_fold1":${rF1.last},"views_equal":$equal}""")
    require(equal, "folded and unfolded views must be identical")
    require(foldTail.toDouble < rawTail.toDouble / 2.0,
      s"folded retention must be bounded ($foldTail vs $rawTail rows)")
    require(rF1.last.toDouble < rawTail.toDouble / 2.0,
      s"fold-per-tick retention must be bounded (${rF1.last} vs $rawTail)")
    require(iF1 >= ticks - 1,
      s"fold-per-tick must stay incremental after bootstrap ($iF1/$ticks)")
    spark.stop()
  }
}
