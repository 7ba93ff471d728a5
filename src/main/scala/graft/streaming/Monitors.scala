package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Streaming forms of the two monitors a production pipeline runs
  * continuously: the per-entity rolling z-score anomaly detector
  * ([[graft.operators.Anomaly.rollingZ]]) and the per-source KL drift
  * monitor ([[TextAnalysis.sourceDivergence]]).
  *
  * Both reuse the batch operators' exact arithmetic so stream output is
  * verifiable against the batch answer on the same events (the
  * StreamScoringSpec pattern): the z-score keeps the explicit
  * (Σx² − (Σx)²/n)/(n−1) form summed in event-time order, and the drift
  * monitor re-finalizes the SAME closed-form KL over incrementally merged
  * counts.
  */
object Monitors {

  // ---------------------------------------------------------------- zscore

  case class ZPoint(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, value: Double) {
    // exact micros (Spark timestamps are micro-resolution internally);
    // floorDiv, because plain Long division truncates toward zero and
    // would mis-place pre-epoch timestamps by up to a second
    def tsMicros: Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  }
  case class ZOut(event_id: Long, user_id: Long,
      z: Option[Double], is_anomaly: Option[Boolean])
  /** Per-key trailing window buffer: event-time-ascending (ts, value)
    * points within `windowMicros` of the newest — the ONLY state kept, so
    * state per key is bounded by the densest trailing window, never the
    * stream's history.
    */
  case class ZBuf(ts: Seq[Long], vs: Seq[Double])

  /** Streaming rolling z-score via flatMapGroupsWithState: each arriving
    * event is scored against its own key's trailing `windowMicros`
    * baseline, exactly like the batch window form — same explicit
    * variance expression, same n ≥ 3 / positive-variance guard, same
    * round-6 and |z| > `zThresh` flag.
    *
    * Batch equivalence holds for per-key event-time-ordered arrival
    * (micro-batch boundaries don't matter for DISTINCT timestamps — the
    * buffer carries the trailing window across batches; within a batch
    * rows are sorted by event time first), with one caveat: a TIE GROUP
    * (same-timestamp peers for one key, RANGE-frame peers in the batch
    * form) split across micro-batch boundaries scores its earlier
    * members without the later ones, even though such arrival is still
    * event-time-ordered — peers are only processed as one group when
    * they share a micro-batch. A row arriving LATE (older than its key's
    * newest processed point) is similarly scored against the points
    * currently in the buffer — already-emitted verdicts are never
    * revised. Both are the standard monitor trade, not silent wrongness,
    * and are the only divergences from the batch answer.
    *
    * TOTAL state is bounded two ways: per key, only the trailing window
    * of points; across keys, an event-time timeout evicts any key idle
    * past its buffer's reach once the `watermark` passes it — without
    * this, every entity ever seen would hold a buffer forever on an
    * unbounded ingest.
    */
  def rollingZStream(events: DataFrame, windowMicros: Long = 86400000000L,
      zThresh: Double = 3.0, watermark: String = "1 day"): Dataset[ZOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked timestamp column must SURVIVE into the stateful
    // operator's input, or the event-time timeout is rejected — so ts
    // rides in the typed row and converts to micros inside the function
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", watermark)
      .as[ZPoint]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ZBuf, ZOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[ZPoint], state: GroupState[ZBuf]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty } else {
          var ts = state.getOption.map(_.ts.toVector).getOrElse(Vector.empty)
          var vs = state.getOption.map(_.vs.toVector).getOrElse(Vector.empty)
          // Events sharing a timestamp are RANGE-frame PEERS in the batch
          // form (each one's frame includes the others), so process them
          // as one group: insert the whole tie group, then score each
          // member against the full buffer.
          val sorted = rows.toVector.sortBy(p => (p.tsMicros, p.event_id))
          val groups = sorted.foldLeft(Vector.empty[Vector[ZPoint]]) {
            (acc, p) =>
              if (acc.nonEmpty && acc.last.head.tsMicros == p.tsMicros)
                acc.init :+ (acc.last :+ p)
              else acc :+ Vector(p)
          }
          val out = groups.flatMap { grp =>
            grp.foreach { p =>
              // insert in event-time order (late rows land mid-buffer)
              val at = ts.lastIndexWhere(_ <= p.tsMicros) + 1
              ts = (ts.take(at) :+ p.tsMicros) ++ ts.drop(at)
              vs = (vs.take(at) :+ p.value) ++ vs.drop(at)
            }
            // evict everything older than the NEWEST point's window reach
            val cut = ts.last - windowMicros
            val drop = ts.indexWhere(_ >= cut) match {
              case -1 => ts.length - 1
              case i => i
            }
            ts = ts.drop(drop); vs = vs.drop(drop)
            grp.map { p =>
              // this event's trailing frame [p.ts - window, p.ts], summed
              // in event-time order — the batch RANGE frame's member set
              val lo = p.tsMicros - windowMicros
              var s = 0.0; var ss = 0.0; var n = 0
              var i = 0
              while (i < ts.length) {
                if (ts(i) >= lo && ts(i) <= p.tsMicros) {
                  s += vs(i); ss += vs(i) * vs(i); n += 1
                }
                i += 1
              }
              val variance = (ss - s * s / n) / (n - 1)
              if (n >= 3 && variance > 0.0) {
                val z = (p.value - s / n) / math.sqrt(variance)
                ZOut(p.event_id, uid,
                  Some(BigDecimal(z)
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble),
                  Some(math.abs(z) > zThresh))
              } else ZOut(p.event_id, uid, None, None)
            }
          }
          state.update(ZBuf(ts, vs))
          // evict this key once no in-order event can still need the
          // buffer: watermark past (newest point + window)
          state.setTimeoutTimestamp(math.max(
            state.getCurrentWatermarkMs() + 1,
            ts.last / 1000L + windowMicros / 1000L + 1))
          out.iterator
          }
      }
  }

  // ----------------------------------------------------------------- drift

  /** Streaming per-source KL drift monitor: foreachBatch incremental
    * maintenance of the hashed (source, bucket) count state (a mergeable
    * monoid — union + sum), then the closed-form KL re-finalized over the
    * merged state after every batch. Emits the monitor table to
    * `outDir/kl` and keeps state in `outDir/state`.
    *
    * Scale shape: each micro-batch costs one partial-aggregable groupBy
    * over the DELTA plus a merge with the ≤ |sources|·dims-row state
    * table; the KL finalization runs entirely on bounded frames. The
    * history is never re-scanned — the property that lets the monitor
    * run forever on an unbounded ingest.
    */
  def divergenceMonitor(docs: DataFrame, outDir: String, dims: Int = 1024,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeDivergenceBatch(batch, outDir, dims, batchId)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _))
      .start()
  }

  /** One micro-batch of [[divergenceMonitor]], callable from tests and
    * batch backfills: merge the batch's counts into the state table and
    * rewrite the KL monitor output.
    *
    * The count merge is NOT idempotent per se, so state is VERSIONED by
    * batchId (`state_v<id>` directories): merging batch N always reads
    * the newest version BELOW N and overwrites `state_v<N>` — so a
    * foreachBatch retry or post-restart replay of batch N rebuilds the
    * same state from the same base instead of double-counting, and a
    * crash mid-write leaves only a version that the replay fully
    * rewrites. Versions older than the merge base are pruned. Pair with
    * `checkpointDir` on the query so restarts resume from committed
    * offsets.
    */
  def mergeDivergenceBatch(batch: DataFrame, outDir: String,
      dims: Int = 1024, batchId: Long = Long.MinValue): Unit = {
    val delta = TextAnalysis.unigramBucketCounts(batch, dims)
    val merged = versionedStateMerge(batch.sparkSession, outDir, batchId) {
      baseDf =>
        baseDf.map(_.unionByName(delta)
          .groupBy(col("source"), col("bucket"))
          .agg(sum(col("s_cnt")).as("s_cnt"))
        ).getOrElse(delta)
    }
    TextAnalysis.divergenceFromCounts(merged, dims)
      .write.mode("overwrite").parquet(s"$outDir/kl")
  }

  /** The versioned-state plumbing shared by every foreachBatch monitor:
    * read the newest state version BELOW `batchId`, apply `merge`,
    * overwrite `state_v<batchId>` — so a retry or post-restart replay of
    * batch N rebuilds identical state from the same base instead of
    * double-counting, and a crash mid-write leaves only a version the
    * replay fully rewrites. Prunes versions older than the consumed base
    * and — when the batch id is known — abandoned-FUTURE versions above
    * it: after an un-checkpointed restart batch ids reset to 0, and stale
    * higher-versioned state from the prior run would otherwise shadow
    * this run's state in [[latestStateDir]] until its id is re-reached.
    *
    * @return the merged (checkpointed) state frame
    */
  private def versionedStateMerge(spark: SparkSession, outDir: String,
      batchId: Long)(merge: Option[DataFrame] => DataFrame): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions: Seq[Long] =
      if (fs.exists(root))
        fs.listStatus(root).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("state_v")).map(_.stripPrefix("state_v").toLong)
      else Nil
    // replaying batch N must ignore any (possibly partial) state_vN
    val base = versions.filter(v => batchId == Long.MinValue || v < batchId)
      .sorted.lastOption
    val newVersion = if (batchId != Long.MinValue) batchId
      else base.map(_ + 1).getOrElse(0L)
    val merged =
      merge(base.map(v => spark.read.parquet(s"$outDir/state_v$v")))
        .localCheckpoint() // sever lineage before overwriting files below
    merged.write.mode("overwrite").parquet(s"$outDir/state_v$newVersion")
    versions.filter(v => base.exists(v < _) ||
        (batchId != Long.MinValue && v > newVersion)).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$outDir/state_v$v"), true)
    }
    merged
  }

  // ------------------------------------------------------- span hotspots

  /** Streaming repeated-span (boilerplate hotspot) monitor — the
    * incremental form of [[TextAnalysis.spanHotspots]]: foreachBatch
    * maintenance of a per-span (n_docs, n_occ) count state, re-ranking
    * the top-`topN` hotspot report after every batch.
    *
    * The additive merge is EXACT under the ingest contract that each
    * document arrives in exactly one micro-batch (an append-only corpus
    * feed): a span's per-batch distinct-doc counts then partition its
    * corpus-wide distinct-doc count, so no cross-batch doc tracking is
    * needed. State is bounded at `maxSpans` rows by a SpaceSaving-style
    * heavy-hitter cut — after each merge only the top `maxSpans` spans
    * by (n_docs, n_occ, span) survive; an evicted span that returns
    * re-counts from zero, so tail counts are lower bounds while the
    * report head (spans comfortably above the eviction floor, which is
    * what a hotspot table publishes) matches the batch answer —
    * MonitorStreamSpec proves stream ≡ batch with eviction active.
    */
  def spanHotspotMonitor(docs: DataFrame, outDir: String, n: Int = 5,
      minDocs: Int = 2, topN: Int = 20, maxSpans: Int = 4096,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeSpanBatch(batch, outDir, n, minDocs, topN, maxSpans, batchId)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _))
      .start()
  }

  /** One micro-batch of [[spanHotspotMonitor]], callable from tests and
    * batch backfills: exact within-batch (span, n_docs, n_occ) delta —
    * the same two partial-aggregable groupBys as the batch operator —
    * merged additively into the capped state, then the hotspot report
    * rewritten to `outDir/hot`.
    */
  def mergeSpanBatch(batch: DataFrame, outDir: String, n: Int = 5,
      minDocs: Int = 2, topN: Int = 20, maxSpans: Int = 4096,
      batchId: Long = Long.MinValue): Unit = {
    val delta = batch
      .select(col("doc_id"),
        explode(graft.functions.TextFns.textShingles(col("text"), n)).as("span"))
      .groupBy(col("span"), col("doc_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("n_occ"))
    val merged = versionedStateMerge(batch.sparkSession, outDir, batchId) {
      baseDf =>
        baseDf.map(_.unionByName(delta)
            .groupBy(col("span"))
            .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_occ")).as("n_occ"))
          ).getOrElse(delta)
          // the heavy-hitter cut that bounds state: TakeOrderedAndProject
          // over the merged frame, never a global sort
          .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
          .limit(maxSpans)
    }
    merged.filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span"))
      .limit(topN)
      .write.mode("overwrite").parquet(s"$outDir/hot")
  }

  // ------------------------------------------------------------ PSI drift

  /** Frozen reference profile for the PSI monitor: bounds + per-bin
    * rates, computed ONCE from the reference snapshot and carried as
    * plain numbers (nBuckets+3 doubles — driver-safe by construction).
    */
  case class PsiRef(mn: Double, mx: Double, nTotal: Double,
      binCounts: Array[Long], nBuckets: Int)

  /** Build the frozen reference profile from a reference frame — same
    * fixed-parenthesization bucket arithmetic as
    * [[graft.operators.Profile.psiDrift]].
    */
  def psiReference(ref: DataFrame, valCol: String, nBuckets: Int = 10): PsiRef = {
    val v = col(valCol).cast("double")
    val head = ref.agg(min(v), max(v), count(v)).head()
    require(head.getLong(2) > 0, "PSI reference frame is empty")
    val (mn, mx, n) = (head.getDouble(0), head.getDouble(1),
      head.getLong(2).toDouble)
    val counts = binCounts(ref, valCol, mn, mx, nBuckets)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    PsiRef(mn, mx, n, Array.tabulate(nBuckets)(i => counts.getOrElse(i, 0L)),
      nBuckets)
  }

  private def binCounts(df: DataFrame, valCol: String, mn: Double,
      mx: Double, nBuckets: Int): DataFrame = {
    val v = col(valCol).cast("double")
    val width = (lit(mx) - lit(mn)) / nBuckets
    val bucket = if (mx > mn)
      greatest(lit(0L), least(floor((v - lit(mn)) / width),
        lit(nBuckets - 1L))).cast("int")
    else lit(0)
    // Null values must not bucket (least/greatest skip nulls → top bin)
    // while count(v) excludes them from the totals — same population for
    // bins and totals, matching Profile.psiDrift.
    df.filter(v.isNotNull)
      .select(bucket.as("bucket")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_cur"))
  }

  /** Streaming PSI drift monitor — the incremental form of
    * [[graft.operators.Profile.psiDrift]]: each micro-batch's values
    * bucket on the FROZEN reference bounds and merge additively into a
    * per-bin count state. Unlike the hotspot monitor there is no
    * eviction trade at all: state is ≤ nBuckets rows by construction
    * and bin counts are additive under ANY batch split, so the stream
    * report equals the batch PSI over all rows seen — exactly.
    * The report (per-bin psi_term vs the reference rates) rewrites to
    * `outDir/psi` after every batch.
    */
  def psiDriftMonitor(values: DataFrame, ref: PsiRef, valCol: String,
      outDir: String, eps: Double = 1e-6,
      checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = values.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergePsiBatch(batch, ref, valCol, outDir, eps, batchId)
        ()
      }
    checkpointDir.fold(writer)(writer.option("checkpointLocation", _))
      .start()
  }

  /** One micro-batch of [[psiDriftMonitor]], callable from tests and
    * batch backfills. */
  def mergePsiBatch(batch: DataFrame, ref: PsiRef, valCol: String,
      outDir: String, eps: Double = 1e-6,
      batchId: Long = Long.MinValue): Unit = {
    val spark = batch.sparkSession
    val delta = binCounts(batch, valCol, ref.mn, ref.mx, ref.nBuckets)
    val merged = versionedStateMerge(spark, outDir, batchId) { baseDf =>
      baseDf.map(_.unionByName(delta)
        .groupBy(col("bucket")).agg(sum(col("n_cur")).as("n_cur"))
      ).getOrElse(delta)
    }
    import spark.implicits._
    val refDf = ref.binCounts.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("bucket", "n_ref")
    val nCurTotal = merged.agg(coalesce(sum(col("n_cur")), lit(0L)))
      .head().getLong(0).toDouble.max(1.0)
    val pRef = greatest(col("n_ref") / ref.nTotal, lit(eps))
    val pCur = greatest(coalesce(col("n_cur"), lit(0L)) / nCurTotal, lit(eps))
    refDf.join(merged, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        (floor(((pCur - pRef) * log(pCur / pRef)) * 1e6 + 0.5) / 1e6).as("psi_term"))
      .orderBy("bucket")
      .write.mode("overwrite").parquet(s"$outDir/psi")
  }

  /** Path of the newest committed state version (for tests/inspection). */
  def latestStateDir(spark: SparkSession, outDir: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("state_v")).map(_.stripPrefix("state_v").toLong)
      .sorted.lastOption.map(v => s"$outDir/state_v$v")
  }

  // ----------------------------------------------------- decontamination

  /** Streaming decontamination gate: flags any arriving document that
    * shares a word n-gram with the probe (benchmark/eval) set. The probe
    * grams are an EVAL SUITE — bounded by construction, a model artifact
    * like the compiled NB weights — so they compile into a narrow
    * membership expression (the model-as-expression shape of
    * StreamScoringSpec): zero state, append mode, and the stream verdict
    * is definitionally the batch [[TextAnalysis.contamination]] > 0 flag.
    */
  def contaminationGate(docs: DataFrame, probeGrams: Seq[String],
      n: Int = 4, textCol: String = "text"): DataFrame =
    docs.withColumn("contaminated",
      arrays_overlap(
        graft.functions.TextFns.textShingles(col(textCol), n),
        typedLit(probeGrams)))

  /** Collect the bounded probe-gram artifact from the probe documents —
    * driver-side by design (the eval suite is small); the corpus side
    * never collects.
    */
  def probeGramSet(probes: DataFrame, n: Int = 4,
      textCol: String = "text"): Seq[String] =
    probes.select(explode(array_distinct(
        graft.functions.TextFns.textShingles(col(textCol), n))).as("g"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted

}
