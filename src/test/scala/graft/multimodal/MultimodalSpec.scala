package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plumbing tests for the multimodal operators: binary schema, partition
  * budgeting, kernel batch shapes. Codec values are the deterministic
  * stub (no media libs in this environment).
  */
class MultimodalSpec extends SparkSpec {

  private def mediaDF = {
    import spark.implicits._
    // binary payloads synthesized from the documents table shape
    (1L to 20L).map(i => (i, s"blob-payload-$i".getBytes("UTF-8") ++ Array.fill(i.toInt * 10)(i.toByte)))
      .toDF("media_id", "bytes")
  }

  test("decode: one DecodedMedia per blob, deterministic metadata + features") {
    val out = Multimodal.decode(mediaDF, kind = "image", featureDim = 8).collect()
    assert(out.length === 20)
    val m = out.find(_.media_id == 3L).get
    assert(m.meta.kind === "image")
    assert(m.meta.sizeBytes === ("blob-payload-3".length + 30))
    assert(m.features.length === 8)
    assert(m.features.forall(f => f >= -1.0f && f <= 1.0f))
    // determinism: re-decoding yields identical values
    val again = Multimodal.decode(mediaDF, "image", 8).collect()
      .find(_.media_id == 3L).get
    assert(again.meta === m.meta)
    assert(again.features.toSeq === m.features.toSeq)
  }

  test("video frame sampling is a 1:N generator with stable indices") {
    val frames = Multimodal.sampleFrames(mediaDF, n = 4).collect()
    assert(frames.groupBy(_.media_id).forall(_._2.length <= 4))
    val f3 = frames.filter(_.media_id == 3L).sortBy(_.frame_idx)
    assert(f3.map(_.frame_idx).toSeq === (0 until f3.length))
    // frames partition the prefix of the blob in order
    val orig = mediaDF.filter(col("media_id") === 3L).head().getAs[Array[Byte]]("bytes")
    assert(f3.flatMap(_.frame).sameElements(orig.take(f3.flatMap(_.frame).length)))
  }

  test("phash: identical blobs collide at Hamming 0 ahead of random pairs") {
    import spark.implicits._
    val blobs = Seq(
      (1L, "identical bytes payload"),
      (2L, "identical bytes payload"), // exact dup of 1
      (3L, "a completely different media blob"),
      (4L, "yet another unrelated binary body")
    ).toDF("media_id", "txt")
      .select(col("media_id"), col("txt").cast("binary").as("bytes"))
    val rows = Multimodal.phashCandidates(blobs, topK = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(rows((1L, 2L)) == 0) // same fingerprint → all 4 bands collide
    // any other surviving candidate has a strictly larger distance
    assert(rows.filterKeys(_ != ((1L, 2L))).values.forall(_ > 0))
  }

  test("repartitionBySize sizes partitions by byte budget, not row count") {
    val total = mediaDF.agg(sum(length(col("bytes")))).head().getLong(0)
    val parts = Multimodal.repartitionBySize(mediaDF, budgetBytes = total / 5)
      .rdd.getNumPartitions
    assert(parts === 5)
    assert(Multimodal.repartitionBySize(mediaDF, budgetBytes = Long.MaxValue)
      .rdd.getNumPartitions === 1)
  }
}
