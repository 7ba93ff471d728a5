package graft.multimodal

import Multimodal.{Codec, MediaMeta}

/** REAL compressed-video codec #2: MJPEG-in-AVI, pure JDK. The AVI/RIFF
  * container is parsed byte-for-byte by [[AviMjpeg.parse]] and each video
  * frame is a standalone JPEG decoded by `javax.imageio`'s built-in JPEG
  * reader — genuinely decoded motion pictures from a non-GIF container,
  * still with zero external libraries. (H.264/VP9 remain the documented
  * stub: no in-JDK entropy decoder exists for them.)
  *
  * Container layout handled (the canonical MJPEG AVI shape):
  * {{{
  * RIFF <size> "AVI "
  *   LIST "hdrl" { "avih" <56-byte main header>, LIST "strl" { strh strf } }
  *   LIST "movi" { "00dc"/"00db" <jpeg bytes> ... }
  *   [ "idx1" ... ]   // optional, not needed for sequential decode
  * }}}
  * All sizes little-endian, chunks padded to even offsets (RIFF rule).
  *
  * Frame timing comes from the main header's `dwMicroSecPerFrame` — the
  * AVI analog of the GIF GraphicControlExtension delay; duration is
  * frames × that, integer math in MICROseconds then floored to ms, so an
  * oracle replays it exactly.
  */
object AviMjpeg {

  // see Multimodal: ImageIO's disk-backed stream cache serializes
  // concurrent in-memory decodes on temp-file churn — force memory
  javax.imageio.ImageIO.setUseCache(false)

  /** Parsed container: dims/timing from the real `avih` header plus the
    * raw per-frame JPEG payloads in stream order. */
  case class Avi(width: Int, height: Int, microSecPerFrame: Long,
      totalFrames: Int, frames: IndexedSeq[Array[Byte]]) {
    def durationMs: Long = totalFrames.toLong * microSecPerFrame / 1000L
  }

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Strict RIFF walk: top-level form must be RIFF/"AVI "; `avih` is read
    * for dims/timing, every `??dc`/`??db` chunk inside the `movi` LIST
    * (directly or inside `rec ` sub-LISTs) is a frame payload. */
  def parse(bytes: Array[Byte]): Avi = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "AVI ", "bytes are not a RIFF/AVI container")
    var width = 0; var height = 0
    var uspf = 0L; var total = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "dc" || id.substring(2) == "db")
    def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= until) {
        val id = fourcc(bytes, off)
        val sz = u32(bytes, off + 4).toInt
        val body = off + 8
        // A corrupt size field must ERROR, not hang: sz < 0 (u32 past
        // Int.MaxValue) would walk the cursor backward or hold it still
        // forever, and an overrun would zero-pad frame payloads.
        require(sz >= 0 && body + sz <= until,
          s"corrupt RIFF chunk '$id' at $off: size $sz exceeds container")
        if (id == "LIST" && sz >= 4) {
          val listType = fourcc(bytes, body)
          walk(body + 4, body + sz,
            inMovi || listType == "movi" || listType == "rec ")
        } else if (id == "avih" && sz >= 40) {
          uspf = u32(bytes, body)
          total = u32(bytes, body + 16).toInt
          width = u32(bytes, body + 32).toInt
          height = u32(bytes, body + 36).toInt
        } else if (inMovi && isFrameChunk(id) && sz > 0) {
          frames += java.util.Arrays.copyOfRange(bytes, body, body + sz)
        }
        off = body + sz + (sz & 1) // chunks pad to even
      }
    }
    walk(12, bytes.length, inMovi = false)
    require(uspf > 0 && total > 0, "AVI missing a usable avih header")
    Avi(width, height, uspf, total, frames.toIndexedSeq)
  }

  // ------------------------------------------------------------- writer

  private def putU32(bos: java.io.ByteArrayOutputStream, v: Long): Unit = {
    bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
    bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
  }
  private def putCc(bos: java.io.ByteArrayOutputStream, s: String): Unit =
    bos.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    putCc(bos, id); putU32(bos, body.length.toLong); bos.write(body)
    if ((body.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }
  private def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
    val inner = new java.io.ByteArrayOutputStream()
    putCc(inner, listType)
    bodies.foreach(inner.write)
    chunk("LIST", inner.toByteArray)
  }

  /** Assemble a spec-conformant single-video-stream MJPEG AVI from
    * pre-encoded JPEG frames. Pure byte assembly — the encode side of
    * [[parse]], used by the fixture generator and usable as a real sink.
    */
  def write(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      microSecPerFrame: Long): Array[Byte] = {
    require(jpegFrames.nonEmpty, "need at least one frame")
    val n = jpegFrames.length
    val maxFrame = jpegFrames.map(_.length).max
    def u32s(vs: Long*): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); vs.foreach(putU32(b, _)); b.toByteArray
    }
    val avih = chunk("avih", u32s(
      microSecPerFrame, 0L, 0L, 0x10L /* AVIF_HASINDEX off; flags=0x10 interleaved */,
      n.toLong, 0L, 1L, maxFrame.toLong, width.toLong, height.toLong,
      0L, 0L, 0L, 0L))
    val strh = {
      val b = new java.io.ByteArrayOutputStream()
      putCc(b, "vids"); putCc(b, "MJPG")
      // dwFlags, wPriority|wLanguage, dwInitialFrames
      putU32(b, 0L); putU32(b, 0L); putU32(b, 0L)
      // dwScale/dwRate: rate/scale = fps; scale = uspf, rate = 1e6
      putU32(b, microSecPerFrame); putU32(b, 1000000L)
      putU32(b, 0L); putU32(b, n.toLong) // dwStart, dwLength (frames)
      putU32(b, maxFrame.toLong); putU32(b, 0xffffffffL) // buf, quality
      putU32(b, 0L) // dwSampleSize (0 = variable)
      // rcFrame: left top right bottom as 4×u16
      b.write(0); b.write(0); b.write(0); b.write(0)
      b.write((width & 0xff)); b.write((width >> 8) & 0xff)
      b.write((height & 0xff)); b.write((height >> 8) & 0xff)
      chunk("strh", b.toByteArray)
    }
    val strf = {
      val b = new java.io.ByteArrayOutputStream()
      putU32(b, 40L); putU32(b, width.toLong); putU32(b, height.toLong)
      putU32(b, 1L | (24L << 16)) // biPlanes=1, biBitCount=24
      putCc(b, "MJPG")
      putU32(b, (width * height * 3).toLong)
      putU32(b, 0L); putU32(b, 0L); putU32(b, 0L); putU32(b, 0L)
      chunk("strf", b.toByteArray)
    }
    val hdrl = list("hdrl", Seq(avih, list("strl", Seq(strh, strf))))
    val movi = list("movi", jpegFrames.map(chunk("00dc", _)))
    val form = new java.io.ByteArrayOutputStream()
    putCc(form, "AVI "); form.write(hdrl); form.write(movi)
    val body = form.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    putCc(out, "RIFF"); putU32(out, body.length.toLong); out.write(body)
    out.toByteArray
  }
}

/** [[Multimodal.Codec]] over [[AviMjpeg]]: every video operator (metadata,
  * frame sampling, per-frame features, perceptual hashing) against
  * genuinely decoded MJPEG frames. `sampleFrames` returns each frame's
  * JPEG payload AS-IS — in MJPEG the stored frame already IS a standalone
  * image, so real frame extraction costs zero re-encode (the GIF codec
  * must re-encode because its frames only exist as decoded rasters).
  */
object AviMjpegCodec extends Codec {

  private def decodeJpeg(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "frame payload is not a decodable JPEG")
    img
  }

  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 12 &&
      new String(bytes, 0, 4, java.nio.charset.StandardCharsets.US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, java.nio.charset.StandardCharsets.US_ASCII) == "AVI ")
      "avi"
    else "bin"

  def decodeMeta(kind: String, bytes: Array[Byte]): MediaMeta = {
    val avi = AviMjpeg.parse(bytes)
    MediaMeta(kind, "avi", avi.width, avi.height, avi.durationMs,
      bytes.length.toLong)
  }

  /** Luminance-grid features of the first decoded frame (the GifCodec
    * thumbnail-features convention). */
  def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val img = decodeJpeg(AviMjpeg.parse(bytes).frames.head)
    val g = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
    val grid = Multimodal.ImageIoCodec.lumaGrid(img, g)
    Array.tabulate(dim)(i => (grid(i % grid.length) / 127.5 - 1.0).toFloat)
  }

  /** Up to `n` frames evenly strided across the container — each already
    * a standalone JPEG, handed out without any decode or re-encode. */
  def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val fs = AviMjpeg.parse(bytes).frames
    val total = fs.length
    if (n <= 0 || total == 0) Nil
    else {
      val k = math.min(n, total)
      (0 until k).map(i => fs((i.toLong * total / k).toInt))
    }
  }

  /** Per-frame (idx, width, height, aHash) off each decoded raster. */
  override def sampleFrameFeatures(bytes: Array[Byte], n: Int): Seq[(Int, Int, Int, Long)] = {
    val fs = AviMjpeg.parse(bytes).frames
    val total = fs.length
    if (n <= 0 || total == 0) Nil
    else {
      val k = math.min(n, total)
      (0 until k).map { i =>
        val img = decodeJpeg(fs((i.toLong * total / k).toInt))
        (i, img.getWidth, img.getHeight, aHash(img))
      }
    }
  }

  private def aHash(img: java.awt.image.BufferedImage): Long = {
    val grid = Multimodal.ImageIoCodec.lumaGrid(img, 8)
    val mean = grid.sum / grid.length
    var acc = 0L
    var i = 0
    while (i < 64) {
      if (grid(i) >= mean) acc |= 1L << (63 - i)
      i += 1
    }
    acc
  }

  /** aHash of the first decoded frame. */
  def phash64(bytes: Array[Byte]): Long =
    aHash(decodeJpeg(AviMjpeg.parse(bytes).frames.head))
}
