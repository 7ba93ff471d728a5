package graft.multimodal

import graft.SparkSpec

/** Real motion-picture path (GifCodec over javax.imageio multi-frame
  * GIF): frame count from the actual container bitstream, true
  * frame-by-frame extraction with each frame re-encoded as a standalone
  * decodable PNG, and first-frame features/aHash from decoded rasters —
  * the GIF→PNG round trip is something a byte-slicing stub can never
  * produce.
  */
class GifCodecSpec extends SparkSpec {

  test("decodeMeta reads dims and frame count from the container bitstream") {
    val gif = Multimodal.fixtureGif(7L)
    val meta = Multimodal.GifCodec.decodeMeta("video", gif)
    assert(meta.format === "gif")
    assert(meta.width === Multimodal.fixtureWidth(7L))
    assert(meta.height === Multimodal.fixtureHeight(7L))
    assert(meta.durationMs === 100L * Multimodal.fixtureVideoFrames(7L))
    assert(meta.sizeBytes === gif.length.toLong)
  }

  test("sampleFrames extracts every frame as a standalone decodable PNG") {
    val id = 12L
    val gif = Multimodal.fixtureGif(id)
    val n = Multimodal.fixtureVideoFrames(id)
    val frames = Multimodal.GifCodec.sampleFrames(gif, 8)
    assert(frames.length === n) // n <= 5 < 8: every frame, once, in order
    frames.foreach { f =>
      val m = Multimodal.ImageIoCodec.decodeMeta("image", f)
      assert(m.format === "png")
      assert(m.width === Multimodal.fixtureWidth(id))
      assert(m.height === Multimodal.fixtureHeight(id))
    }
    // frames differ (the pattern key shifts per frame) — real extraction,
    // not the same image repeated
    val digests = frames.map(f =>
      java.util.Arrays.hashCode(f)).distinct
    assert(digests.length === n)
  }

  test("even-stride sampling caps the frame count when n < total") {
    val id = 3L // 5 frames
    assert(Multimodal.fixtureVideoFrames(id) === 5)
    val frames = Multimodal.GifCodec.sampleFrames(Multimodal.fixtureGif(id), 2)
    assert(frames.length === 2)
    assert(Multimodal.GifCodec.sampleFrames(Multimodal.fixtureGif(id), 0).isEmpty)
  }

  test("frame-sampling kernel runs distributed and dims survive GIF→PNG") {
    import spark.implicits._
    val ids = Seq(3L, 7L, 12L, 53L)
    val gifs = ids.toDF("media_id").as[Long]
      .mapPartitions(_.map(id => (id, Multimodal.fixtureGif(id))))
      .toDF("media_id", "bytes")
    val out = Multimodal.sampleFrames(gifs, 8, codec = Multimodal.GifCodec)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    val byId = out.groupBy(_.media_id)
    ids.foreach { id =>
      val fs = byId(id)
      assert(fs.length === Multimodal.fixtureVideoFrames(id))
      assert(fs.map(_.frame_idx).toSeq === (0 until fs.length))
      fs.foreach { f =>
        val m = Multimodal.ImageIoCodec.decodeMeta("image", f.frame)
        assert(m.width === Multimodal.fixtureWidth(id))
        assert(m.height === Multimodal.fixtureHeight(id))
      }
    }
  }

  test("first-frame aHash is content-based and deterministic") {
    val a = Multimodal.GifCodec.phash64(Multimodal.fixtureGif(3L))
    assert(a === Multimodal.GifCodec.phash64(Multimodal.fixtureGif(3L)))
    assert(a !== Multimodal.GifCodec.phash64(Multimodal.fixtureGif(4L)))
    val f = Multimodal.GifCodec.extractFeatures(Multimodal.fixtureGif(3L), 8)
    assert(f.length === 8)
    assert(f.forall(v => v >= -1.0f && v <= 1.0f))
  }
}
