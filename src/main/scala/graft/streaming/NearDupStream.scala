package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFns

/** Streaming near-duplicate detection — the in-flight form of the batch
  * MinHash-LSH pipeline (`Dedup.nearDupPairs`), closing the gap
  * `Curation.curateStream` documents: near-dup needs a corpus self-join
  * in batch, but WITHIN the ingest window it is streaming-legal with
  * bounded state, because LSH banding already partitions the problem —
  * two docs can only be candidates if they share a band bucket, so
  * per-bucket state (the signatures of the bucket's docs in the trailing
  * window) is all a streaming detector needs. Cross-window near-dup
  * remains the periodic batch compaction (the lambda split stands); this
  * catches the high-value case of bursts and crawls re-ingesting the
  * same content within the window.
  *
  * Verification: batch `nearDupPairs` verifies candidates with EXACT
  * shingle-set Jaccard — but shingle sets are document-sized, which is
  * exactly what streaming state must not hold. The streaming form
  * verifies with the standard MinHash ESTIMATOR instead (matching
  * signature components / k — unbiased for true Jaccard), so state per
  * doc per band is k strings, bounded regardless of document length.
  *
  * State bounds, both axes (the [[Monitors.rollingZStream]] posture):
  * per band bucket only the trailing `windowMicros` of (id, sig, ts)
  * entries survive; across buckets an event-time timeout evicts any
  * bucket idle past its window once the watermark passes it.
  *
  * Emits one [[NearDupStream.NdPair]] per (band, matching earlier doc):
  * the same true pair surfacing via two bands emits twice (distinct
  * stateful groups cannot coordinate) — consumers dedup on
  * (doc_id, dup_of), exactly like the batch candidate stage before its
  * `.distinct()`. A doc is a near-dup iff it emits ≥ 1 pair.
  */
object NearDupStream {

  case class NdIn(doc_id: Long, ts: java.sql.Timestamp, band_key: String,
      sig: Seq[String]) {
    def tsMicros: Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  }
  case class NdState(ids: Seq[Long], ts: Seq[Long], sigs: Seq[Seq[String]])
  case class NdPair(doc_id: Long, dup_of: Long, sig_sim: Double)

  /** Candidate near-dup pairs of a streaming `(doc_id, ts, text)` frame:
    * each arriving doc against the earlier docs of its band buckets
    * within the trailing window, verified by the signature estimator.
    * `dup_of` is always the EARLIER doc (first-seen-wins orientation).
    */
  def candidatePairs(docs: DataFrame, n: Int = 3, k: Int = 16,
      bands: Int = 4, threshold: Double = 0.5, watermark: String = "1 hour",
      windowMicros: Long = 3600000000L): Dataset[NdPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.expressions.LshBandsExpr
    val shingled = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        TextFns.textShingles(col("text"), n).as("sh"))
    shingled
      .select(col("doc_id"), col("ts"),
        TextFns.minhashSignature(col("sh"), k).as("sig"),
        posexplode(LshBandsExpr.lshBandsNative(col("sh"), k, bands))
          .as(Seq("band_id", "band_hash")))
      .select(col("doc_id"), col("ts"),
        concat_ws(":", col("band_id"), col("band_hash")).as("band_key"),
        col("sig"))
      .as[NdIn]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[NdState, NdPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[NdIn], state: GroupState[NdState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var ids = state.getOption.map(_.ids.toVector).getOrElse(Vector.empty)
            var tss = state.getOption.map(_.ts.toVector).getOrElse(Vector.empty)
            var sigs = state.getOption.map(_.sigs.toVector).getOrElse(Vector.empty)
            val sorted = rows.toVector.sortBy(r => (r.tsMicros, r.doc_id))
            val out = Vector.newBuilder[NdPair]
            sorted.foreach { r =>
              // score against the retained EARLIER docs of this bucket
              // inside THIS doc's trailing window — retention eviction
              // below is keyed to the newest arrival, so an entry can
              // survive in state yet sit outside an older/newer doc's
              // own window and must not match it. (A late row only sees
              // entries at-or-before its own event time — first-seen
              // orientation, the standard monitor trade.)
              val lo = r.tsMicros - windowMicros
              var i = 0
              while (i < ids.length) {
                if (ids(i) != r.doc_id &&
                    tss(i) >= lo && tss(i) <= r.tsMicros) {
                  var same = 0; var j = 0
                  val s = sigs(i)
                  while (j < r.sig.length) {
                    if (j < s.length && s(j) == r.sig(j)) same += 1
                    j += 1
                  }
                  val sim = same.toDouble / r.sig.length
                  if (sim >= threshold)
                    out += NdPair(r.doc_id, ids(i),
                      BigDecimal(sim).setScale(6,
                        BigDecimal.RoundingMode.HALF_UP).toDouble)
                }
                i += 1
              }
              // insert in event-time order, then evict the expired tail
              val at = tss.lastIndexWhere(_ <= r.tsMicros) + 1
              ids = (ids.take(at) :+ r.doc_id) ++ ids.drop(at)
              tss = (tss.take(at) :+ r.tsMicros) ++ tss.drop(at)
              sigs = (sigs.take(at) :+ r.sig) ++ sigs.drop(at)
              val cut = tss.last - windowMicros
              val drop = tss.indexWhere(_ >= cut) match {
                case -1 => tss.length - 1
                case i2 => i2
              }
              ids = ids.drop(drop); tss = tss.drop(drop); sigs = sigs.drop(drop)
            }
            state.update(NdState(ids, tss, sigs))
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              tss.last / 1000L + windowMicros / 1000L + 1))
            out.result().iterator
          }
      }
  }
}
