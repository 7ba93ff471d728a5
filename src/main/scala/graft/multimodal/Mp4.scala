package graft.multimodal

/** ISO-BMFF (MP4) CONTAINER metadata, pure JVM — the moov box walk.
  *
  * H.264/VP9 frame DECODE remains this library's one documented stub
  * (no in-JDK entropy decoder exists), but the container around those
  * bitstreams is plain structured bytes: dimensions, duration, codec
  * id, and the full sample table (sizes/timing) live in `moov`, not in
  * the compressed payload. Parsing them needs no codec — this shrinks
  * the stub's blast radius to the bitstream itself, exactly the split
  * real pipelines use (probe metadata everywhere, decode only where a
  * codec is deployed). Reference: the downloader treats fetched
  * artifacts as opaque objects (`data_downloader.py:29-38`); media
  * metadata extraction is part of the mandated multimodal extension.
  *
  * Box model (ISO/IEC 14496-12, public spec): every box is
  * `u32 size + fourcc`, BIG-endian (unlike RIFF), children nested by
  * size; `size == 1` switches to a u64 largesize, `size == 0` means
  * "to end of enclosing box". The walk SKIPS `mdat` by size — container
  * metadata parse cost is O(moov bytes), independent of media bytes,
  * which is what makes it viable over 100 TB of video: a scan task
  * reads a few KB of each object's head/tail, never the payload
  * (pair with parquet/object-store range reads in a real deployment).
  *
  * Handled boxes: `ftyp` (brand), `mvhd` v0/v1 (movie timescale +
  * duration), per-`trak`: `tkhd` v0/v1 (track id, presentation WxH as
  * 16.16 fixed), `mdia/mdhd` v0/v1 (media timescale + duration),
  * `mdia/hdlr` (handler: vide/soun/...), `stbl/stsd` (first sample
  * entry's fourcc = codec id, plus the VisualSampleEntry's coded WxH),
  * `stbl/stts` (decode deltas), `stbl/stsz` (per-sample sizes).
  */
object Mp4 {

  /** One track's container metadata. `sampleSizes`/`sttsRuns` are the
    * REAL sample table — bounded by sample COUNT (≈ KB per hour of
    * video), never by media bytes.
    */
  final case class Track(trackId: Long, handler: String, codec: String,
      width: Int, height: Int, mediaTimescale: Long, mediaDuration: Long,
      sampleSizes: IndexedSeq[Long], sttsRuns: IndexedSeq[(Long, Long)]) {
    def nSamples: Long = sampleSizes.length.toLong
    def totalSampleBytes: Long = sampleSizes.sum
    /** Decode timestamps in ms, expanded from the stts run-lengths. */
    def sampleDtsMs: IndexedSeq[Long] = {
      val out = IndexedSeq.newBuilder[Long]
      var dts = 0L
      sttsRuns.foreach { case (count, delta) =>
        var i = 0L
        while (i < count) {
          out += dts * 1000L / math.max(mediaTimescale, 1L)
          dts += delta; i += 1
        }
      }
      out.result()
    }
  }

  final case class Meta(brand: String, timescale: Long, duration: Long,
      tracks: IndexedSeq[Track]) {
    def durationMs: Long = duration * 1000L / math.max(timescale, 1L)
    def videoTrack: Option[Track] = tracks.find(_.handler == "vide")
  }

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (bodyStart, boxEnd) of the box headed at `off`, honoring largesize
    * and to-end sizes; errors on corrupt sizes rather than hanging or
    * overrunning (same contract as [[AviMjpeg.parse]]).
    */
  private def boxBounds(b: Array[Byte], off: Int, until: Int): (Int, Int) = {
    require(off + 8 <= until, s"truncated box header at $off")
    val sz32 = u32(b, off)
    val (body, end) =
      if (sz32 == 1L) {
        require(off + 16 <= until, s"truncated largesize at $off")
        (off + 16, off + u64(b, off + 8))
      }
      else if (sz32 == 0L) (off + 8, until.toLong)
      else (off + 8, off + sz32)
    require(end >= body && end <= until,
      s"corrupt box '${fourcc(b, off + 4)}' at $off: end $end exceeds $until")
    (body, end.toInt)
  }

  /** Walk the container and return its metadata. mdat (and any unknown
    * box) is skipped by size — never materialized, never scanned.
    */
  def parseMeta(bytes: Array[Byte]): Meta = {
    var brand = ""
    var timescale = 0L
    var duration = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]

    // per-trak accumulator, reset at each trak box
    object cur {
      var trackId = 0L; var handler = ""; var codec = ""
      var width = 0; var height = 0
      var mTimescale = 0L; var mDuration = 0L
      var sizes: IndexedSeq[Long] = IndexedSeq.empty
      var stts: IndexedSeq[(Long, Long)] = IndexedSeq.empty
      def reset(): Unit = {
        trackId = 0L; handler = ""; codec = ""; width = 0; height = 0
        mTimescale = 0L; mDuration = 0L
        sizes = IndexedSeq.empty; stts = IndexedSeq.empty
      }
      def toTrack: Track = Track(trackId, handler, codec, width, height,
        mTimescale, mDuration, sizes, stts)
    }

    def walk(from: Int, until: Int): Unit = {
      var off = from
      while (off + 8 <= until) {
        val id = fourcc(bytes, off + 4)
        val (body, end) = boxBounds(bytes, off, until)
        id match {
          case "ftyp" if end - body >= 4 => brand = fourcc(bytes, body)
          case "moov" | "mdia" | "minf" | "stbl" => walk(body, end)
          case "trak" =>
            cur.reset(); walk(body, end); tracks += cur.toTrack
          case "mvhd" =>
            val v = bytes(body) & 0xff
            if (v == 1) { timescale = u32(bytes, body + 20)
              duration = u64(bytes, body + 24) }
            else { timescale = u32(bytes, body + 12)
              duration = u32(bytes, body + 16) }
          case "tkhd" =>
            val v = bytes(body) & 0xff
            cur.trackId = if (v == 1) u32(bytes, body + 20) else u32(bytes, body + 12)
            // presentation size: 16.16 fixed point, last 8 body bytes
            cur.width = (u32(bytes, end - 8) >> 16).toInt
            cur.height = (u32(bytes, end - 4) >> 16).toInt
          case "mdhd" =>
            val v = bytes(body) & 0xff
            if (v == 1) { cur.mTimescale = u32(bytes, body + 20)
              cur.mDuration = u64(bytes, body + 24) }
            else { cur.mTimescale = u32(bytes, body + 12)
              cur.mDuration = u32(bytes, body + 16) }
          case "hdlr" if end - body >= 12 =>
            cur.handler = fourcc(bytes, body + 8)
          case "stsd" if end - body >= 16 =>
            // first sample entry: u32 size + fourcc = the codec id; for
            // visual entries the coded dims sit at fixed offsets 24/26
            // past the entry header (ISO 14496-12 §12.1.3)
            val entry = body + 8
            cur.codec = fourcc(bytes, entry + 4)
            if (cur.handler == "vide" && end - entry >= 36) {
              cur.width = u16(bytes, entry + 32)
              cur.height = u16(bytes, entry + 34)
            }
          case "stts" =>
            val n = u32(bytes, body + 4).toInt
            require(body + 8 + n * 8 <= end, s"corrupt stts: $n entries")
            cur.stts = (0 until n).map(i =>
              (u32(bytes, body + 8 + i * 8), u32(bytes, body + 12 + i * 8)))
          case "stsz" =>
            val fixed = u32(bytes, body + 4)
            val n = u32(bytes, body + 8).toInt
            cur.sizes =
              if (fixed != 0L) IndexedSeq.fill(n)(fixed)
              else {
                require(body + 12 + n * 4 <= end, s"corrupt stsz: $n entries")
                (0 until n).map(i => u32(bytes, body + 12 + i * 4))
              }
          case _ => () // mdat, free, unknown: skipped by size
        }
        off = end
      }
    }
    walk(0, bytes.length)
    require(timescale > 0, "not an ISO-BMFF container (no mvhd)")
    Meta(brand, timescale, duration, tracks.toIndexedSeq)
  }

  // ------------------------------------------------------------- writer

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(id: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    be32(8L + body.length) ++
      id.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
  }
  private def fullBox(id: String, version: Int, flags: Int,
      parts: Array[Byte]*): Array[Byte] =
    box(id, (be32(((version & 0xff).toLong << 24) | flags) +: parts): _*)

  /** Assemble a minimal, spec-shaped one-video-track MP4: ftyp + mdat +
    * moov (trailing moov, the recorded-file layout — forces a real
    * top-level walk past the payload). The samples are OPAQUE bytes
    * (this library does not encode H.264 — see the stub note); the
    * container around them is honest: stsz/stts/stsc/stco describe the
    * mdat payload exactly. The encode side of [[parseMeta]].
    */
  def write(sampleBytes: Seq[Array[Byte]], width: Int, height: Int,
      codec: String, msPerSample: Long, movieTimescale: Long = 1000L,
      mediaTimescale: Long = 90000L): Array[Byte] = {
    require(sampleBytes.nonEmpty, "need at least one sample")
    require(codec.length == 4, s"codec must be a fourcc: '$codec'")
    val n = sampleBytes.length
    val durMovie = n * msPerSample * movieTimescale / 1000L
    val delta = mediaTimescale * msPerSample / 1000L
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200L),
      "isom".getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))
    val mdatPayload = sampleBytes.flatten.toArray
    val mdat = box("mdat", mdatPayload)
    val chunkOffset = ftyp.length + 8L // first sample byte in the file
    val mvhd = fullBox("mvhd", 0, 0,
      be32(0L), be32(0L), // creation/modification (epoch-fixed: deterministic)
      be32(movieTimescale), be32(durMovie),
      be32(0x00010000L), be16(0x0100), be16(0), be32(0L), be32(0L), // rate/volume
      be32(0x00010000L), be32(0L), be32(0L), be32(0L), be32(0x00010000L),
      be32(0L), be32(0L), be32(0L), be32(0x40000000L), // unity matrix
      Array.fill(24)(0.toByte), // pre_defined
      be32(2L)) // next_track_ID
    val tkhd = fullBox("tkhd", 0, 7, // enabled | in movie | in preview
      be32(0L), be32(0L), be32(1L) /* track_ID */, be32(0L), be32(durMovie),
      be32(0L), be32(0L), be16(0), be16(0), be16(0), be16(0),
      be32(0x00010000L), be32(0L), be32(0L), be32(0L), be32(0x00010000L),
      be32(0L), be32(0L), be32(0L), be32(0x40000000L),
      be32(width.toLong << 16), be32(height.toLong << 16)) // 16.16 fixed
    val mdhd = fullBox("mdhd", 0, 0,
      be32(0L), be32(0L), be32(mediaTimescale), be32(n * delta),
      be16(0x55c4) /* und */, be16(0))
    val hdlr = fullBox("hdlr", 0, 0,
      be32(0L), "vide".getBytes("US-ASCII"), be32(0L), be32(0L), be32(0L),
      "GraftVideoHandler ".getBytes("US-ASCII"))
    // VisualSampleEntry + a codec-config child of the matching family
    // (opaque here — real files carry SPS/PPS etc. inside it)
    val configId = codec match {
      case "avc1" => "avcC"; case "hev1" | "hvc1" => "hvcC"
      case "vp09" => "vpcC"; case _ => "btrt"
    }
    val sampleEntry = {
      val cfg = box(configId, Array[Byte](1, 0, 0, 0))
      val body = Array.fill(6)(0.toByte) ++ be16(1) ++ // data_ref_index
        Array.fill(16)(0.toByte) ++ // pre_defined/reserved
        be16(width) ++ be16(height) ++
        be32(0x00480000L) ++ be32(0x00480000L) ++ be32(0L) ++ be16(1) ++
        Array.fill(32)(0.toByte) ++ // compressorname
        be16(24) ++ be16(0xffff) ++ cfg
      be32(8L + body.length) ++ codec.getBytes("US-ASCII") ++ body
    }
    val stsd = fullBox("stsd", 0, 0, be32(1L), sampleEntry)
    val stts = fullBox("stts", 0, 0, be32(1L), be32(n.toLong), be32(delta))
    val stsc = fullBox("stsc", 0, 0, be32(1L),
      be32(1L), be32(n.toLong), be32(1L))
    val stsz = fullBox("stsz", 0, 0, be32(0L), be32(n.toLong),
      sampleBytes.toArray.flatMap(s => be32(s.length.toLong)))
    val stco = fullBox("stco", 0, 0, be32(1L), be32(chunkOffset))
    val dref = fullBox("dref", 0, 0, be32(1L), fullBox("url ", 0, 1))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf",
      fullBox("vmhd", 0, 1, be16(0), be16(0), be16(0), be16(0)),
      box("dinf", dref), stbl)
    val moov = box("moov", mvhd,
      box("trak", tkhd, box("mdia", mdhd, hdlr, minf)))
    ftyp ++ mdat ++ moov
  }
}
