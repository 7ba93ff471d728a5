package graft.multimodal

import graft.SparkSpec

/** Real compressed-video path #2 (AviMjpegCodec): the RIFF/AVI container
  * is hand-parsed, every frame is a standalone JPEG decoded by
  * javax.imageio — dims/frame-count/duration off the real avih header,
  * frame payloads that ARE decodable JPEGs, and rasters whose aHash sits
  * within JPEG-loss distance of the lossless GIF render of the same
  * pattern (something a byte-slicing stub can never produce).
  */
class AviCodecSpec extends SparkSpec {

  test("decodeMeta reads dims, frame count, and 25fps timing from avih") {
    val id = 7L
    val avi = Multimodal.fixtureAvi(id)
    val meta = AviMjpegCodec.decodeMeta("video", avi)
    assert(meta.format === "avi")
    assert(meta.width === Multimodal.fixtureWidth(id))
    assert(meta.height === Multimodal.fixtureHeight(id))
    assert(meta.durationMs === 40L * Multimodal.fixtureVideoFrames(id))
    assert(meta.sizeBytes === avi.length.toLong)
  }

  test("sniffFormat recognizes the RIFF/AVI magic and rejects others") {
    assert(AviMjpegCodec.sniffFormat(Multimodal.fixtureAvi(3L)) === "avi")
    assert(AviMjpegCodec.sniffFormat(Multimodal.fixturePng(3L)) === "bin")
    assert(AviMjpegCodec.sniffFormat(Array[Byte](1, 2, 3)) === "bin")
  }

  test("parse round-trips write: frame payloads survive byte-for-byte") {
    val jpegs = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7, 8))
    val avi = AviMjpeg.write(jpegs, 16, 12, 40000L)
    val parsed = AviMjpeg.parse(avi)
    assert(parsed.width === 16 && parsed.height === 12)
    assert(parsed.totalFrames === 2 && parsed.microSecPerFrame === 40000L)
    assert(parsed.frames.length === 2)
    // odd-length chunk must pad without corrupting the payload or the walk
    assert(parsed.frames(0).toSeq === jpegs(0).toSeq)
    assert(parsed.frames(1).toSeq === jpegs(1).toSeq)
  }

  test("sampleFrames hands out standalone decodable JPEGs, no re-encode") {
    val id = 12L
    val avi = Multimodal.fixtureAvi(id)
    val n = Multimodal.fixtureVideoFrames(id)
    val frames = AviMjpegCodec.sampleFrames(avi, 8)
    assert(frames.length === n)
    frames.foreach { f =>
      val m = Multimodal.ImageIoCodec.decodeMeta("image", f)
      assert(m.format === "jpeg")
      assert(m.width === Multimodal.fixtureWidth(id))
      assert(m.height === Multimodal.fixtureHeight(id))
    }
    // frames differ (pattern key shifts per frame) — real extraction
    assert(frames.map(f => java.util.Arrays.hashCode(f)).distinct.length === n)
    // even-stride cap + empty sample
    assert(AviMjpegCodec.sampleFrames(avi, 2).length === 2)
    assert(AviMjpegCodec.sampleFrames(avi, 0).isEmpty)
  }

  test("sampleFrameFeatures reads dims+aHash off each decoded raster") {
    val id = 53L // same pattern as id=3 (mod 50)
    val avi = Multimodal.fixtureAvi(id)
    val n = Multimodal.fixtureVideoFrames(id)
    val feats = AviMjpegCodec.sampleFrameFeatures(avi, 8)
    assert(feats.length === n)
    feats.foreach { case (_, w, h, _) =>
      assert(w === Multimodal.fixtureWidth(id))
      assert(h === Multimodal.fixtureHeight(id))
    }
    assert(feats.map(_._1) === (0 until n))
    // deterministic across calls
    assert(AviMjpegCodec.sampleFrameFeatures(avi, 8) === feats)
  }

  test("JPEG-decoded rasters stay aHash-close to the lossless GIF render") {
    // Same pattern family, same frame count: frame i of the AVI and of
    // the GIF render the identical source raster; JPEG loss may flip a
    // few near-mean bits of the 64-bit aHash but must stay close, and
    // identical pattern ids must produce identical fingerprints.
    val id = 9L
    val gifFeats = Multimodal.GifCodec
      .sampleFrameFeatures(Multimodal.fixtureGif(id), 8)
    val aviFeats = AviMjpegCodec
      .sampleFrameFeatures(Multimodal.fixtureAvi(id), 8)
    assert(gifFeats.length === aviFeats.length)
    gifFeats.zip(aviFeats).foreach { case ((_, gw, gh, gp), (_, aw, ah, ap)) =>
      assert(gw === aw && gh === ah)
      val hamming = java.lang.Long.bitCount(gp ^ ap)
      assert(hamming <= 16, s"aHash drifted $hamming bits from lossless render")
    }
    // pattern congruence mod 50 ⇒ identical bytes ⇒ identical phash64
    assert(AviMjpegCodec.phash64(Multimodal.fixtureAvi(9L)) ===
      AviMjpegCodec.phash64(Multimodal.fixtureAvi(59L)))
  }

  test("transcodeGifToAvi: every GIF frame survives into a decodable AVI") {
    import spark.implicits._
    val ids = Seq(3L, 9L, 12L)
    val gifs = ids.toDF("media_id").as[Long]
      .mapPartitions(_.map(id => (id, Multimodal.fixtureGif(id))))
      .toDF("media_id", "bytes")
    val avis = Multimodal.transcodeGifToAvi(gifs)
      .as[(Long, Array[Byte])].collect().toMap
    ids.foreach { id =>
      val meta = AviMjpegCodec.decodeMeta("video", avis(id))
      assert(meta.format === "avi")
      assert(meta.width === Multimodal.fixtureWidth(id))
      assert(meta.height === Multimodal.fixtureHeight(id))
      assert(meta.durationMs === 40L * Multimodal.fixtureVideoFrames(id))
      // each transcoded frame raster stays aHash-close to the source GIF
      val gifFeats = Multimodal.GifCodec
        .sampleFrameFeatures(Multimodal.fixtureGif(id), 8)
      val aviFeats = AviMjpegCodec.sampleFrameFeatures(avis(id), 8)
      assert(gifFeats.length === aviFeats.length)
      gifFeats.zip(aviFeats).foreach { case ((_, _, _, gp), (_, _, _, ap)) =>
        assert(java.lang.Long.bitCount(gp ^ ap) <= 16)
      }
    }
  }

  test("distributed kernel: decode + frame features over a partitioned frame") {
    import spark.implicits._
    val ids = Seq(3L, 7L, 12L, 53L)
    val avis = ids.toDF("media_id").as[Long]
      .mapPartitions(_.map(id => (id, Multimodal.fixtureAvi(id))))
      .toDF("media_id", "bytes")
    val metas = Multimodal.decode(avis, kind = "video", codec = AviMjpegCodec)
      .collect().map(d => d.media_id -> d.meta).toMap
    ids.foreach { id =>
      assert(metas(id).width === Multimodal.fixtureWidth(id))
      assert(metas(id).durationMs === 40L * Multimodal.fixtureVideoFrames(id))
    }
    val feats = Multimodal.sampleFrameFeatures(avis, 8, codec = AviMjpegCodec)
      .collect()
    assert(feats.length === ids.map(Multimodal.fixtureVideoFrames(_)).sum)
  }
}
