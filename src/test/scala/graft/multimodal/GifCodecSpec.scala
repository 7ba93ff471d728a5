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

  test("sampleFrameFeatures reads dims + aHash off each raster without re-encode") {
    val id = 12L
    val gif = Multimodal.fixtureGif(id)
    val feats = Multimodal.GifCodec.sampleFrameFeatures(gif, 8)
    assert(feats.length === Multimodal.fixtureVideoFrames(id))
    assert(feats.map(_._1) === (0 until feats.length))
    feats.foreach { case (_, w, h, _) =>
      assert(w === Multimodal.fixtureWidth(id))
      assert(h === Multimodal.fixtureHeight(id))
    }
    // the raster-direct aHash must equal the PNG-round-trip aHash frame
    // by frame (PNG is lossless, aHash is over the decoded raster), and
    // frames differ in content so hashes are not all identical
    val viaPng = Multimodal.GifCodec.sampleFrames(gif, 8)
      .map(Multimodal.ImageIoCodec.phash64)
    assert(feats.map(_._4) === viaPng)
    assert(feats.map(_._4).distinct.length > 1)
  }

  test("frame delays come from real GraphicControlExtension metadata") {
    // a GIF written WITH explicit per-frame delays (25 cs = 250 ms)
    val gif = gifWithDelay(frames = 3, delayCs = 25, w = 8, h = 8)
    assert(Multimodal.GifCodec.frameDelaysCs(gif) === Seq(25, 25, 25))
    val meta = Multimodal.GifCodec.decodeMeta("video", gif)
    assert(meta.durationMs === 3L * 250L) // NOT the nominal 100 ms/frame
    // metadata-less fixtures render at the nominal 10 cs per frame
    assert(Multimodal.GifCodec.frameDelaysCs(Multimodal.fixtureGif(7L))
      .forall(_ == 10))
  }

  private def gifWithDelay(frames: Int, delayCs: Int, w: Int, h: Int): Array[Byte] = {
    import javax.imageio.{ImageIO, ImageTypeSpecifier, IIOImage}
    import javax.imageio.metadata.IIOMetadataNode
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until frames).foreach { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, (f * 40 + x * 8 + y) & 0xffffff)))
      val itype = ImageTypeSpecifier.createFromBufferedImageType(
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val md = writer.getDefaultImageMetadata(itype, writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val existing = root.getElementsByTagName("GraphicControlExtension")
      val gce =
        if (existing.getLength > 0) existing.item(0).asInstanceOf[IIOMetadataNode]
        else {
          val n = new IIOMetadataNode("GraphicControlExtension")
          root.appendChild(n); n
        }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("transparentColorIndex", "0")
      gce.setAttribute("delayTime", delayCs.toString)
      md.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, md), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
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
