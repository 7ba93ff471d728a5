package graft.multimodal

import graft.SparkSpec

/** Real-pixel image path (ImageIoCodec over javax.imageio): metadata from
  * the actual PNG bitstream, aHash from the decoded raster, and the
  * banded phash pipeline finding true content duplicates — including a
  * re-encode (BMP) of the same pixels, which the md5-head stub
  * fingerprint can never match.
  */
class ImageCodecSpec extends SparkSpec {

  private def reEncode(png: Array[Byte], format: String): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("decodeMeta reads real dimensions and format from the bitstream") {
    val png = Multimodal.fixturePng(7L)
    val meta = Multimodal.ImageIoCodec.decodeMeta("image", png)
    assert(meta.format === "png")
    assert(meta.width === Multimodal.fixtureWidth(7L))
    assert(meta.height === Multimodal.fixtureHeight(7L))
    assert(meta.durationMs === 0L)
    assert(meta.sizeBytes === png.length.toLong)
  }

  test("aHash is content-based: identical pixels collide across encodings") {
    val png = Multimodal.fixturePng(3L)
    val bmp = reEncode(png, "bmp") // same raster, different bytes
    assert(!png.sameElements(bmp))
    val hPng = Multimodal.ImageIoCodec.phash64(png)
    val hBmp = Multimodal.ImageIoCodec.phash64(bmp)
    assert(hPng === hBmp) // byte-hash stubs cannot do this
    // same pattern id (mod 50) renders identical content
    assert(Multimodal.ImageIoCodec.phash64(Multimodal.fixturePng(53L)) ===
      Multimodal.ImageIoCodec.phash64(Multimodal.fixturePng(3L)))
    // a different pattern lands on a different hash
    assert(Multimodal.ImageIoCodec.phash64(Multimodal.fixturePng(4L)) !== hPng)
  }

  test("features come from decoded luminance, bounded and deterministic") {
    val png = Multimodal.fixturePng(11L)
    val f1 = Multimodal.ImageIoCodec.extractFeatures(png, 16)
    val f2 = Multimodal.ImageIoCodec.extractFeatures(png, 16)
    assert(f1.length === 16)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(v => v >= -1.0f && v <= 1.0f))
    assert(f1.distinct.length > 1) // a real gradient, not a constant fill
  }

  test("banded phash pipeline surfaces real content duplicates first") {
    import spark.implicits._
    val blobs = Seq(
      1L -> Multimodal.fixturePng(3L),
      2L -> reEncode(Multimodal.fixturePng(3L), "bmp"), // content dup of 1
      3L -> Multimodal.fixturePng(4L),
      4L -> Multimodal.fixturePng(17L)
    ).toDF("media_id", "bytes")
    val bits = Multimodal.imagePhashBits(blobs)
    val rows = Multimodal.bandedPhashCandidates(bits, topK = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(rows((1L, 2L)) === 0) // cross-encoding duplicate: Hamming 0
    assert(rows.filter(_._1 != ((1L, 2L))).values.forall(_ > 0))
  }
}
