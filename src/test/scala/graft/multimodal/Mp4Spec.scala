package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The ISO-BMFF moov walk's contract: byte-exact round trip with the
  * writer, corrupt input errors (never hangs or overruns), size-format
  * variants (largesize / to-end), and payload independence — the parse
  * must never touch mdat bytes.
  */
class Mp4Spec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("write → parseMeta round trip recovers every container field") {
    val samples = Seq(Array.fill(120)(1.toByte), Array.fill(80)(2.toByte),
      Array.fill(99)(3.toByte))
    val bytes = Mp4.write(samples, width = 640, height = 360,
      codec = "avc1", msPerSample = 40L)
    val m = Mp4.parseMeta(bytes)
    assert(m.brand === "isom")
    assert(m.durationMs === 120L) // 3 × 40 ms at movie timescale 1000
    val t = m.videoTrack.get
    assert(t.trackId === 1L && t.handler === "vide" && t.codec === "avc1")
    assert(t.width === 640 && t.height === 360)
    assert(t.sampleSizes === IndexedSeq(120L, 80L, 99L))
    assert(t.totalSampleBytes === 299L)
    assert(t.sampleDtsMs === IndexedSeq(0L, 40L, 80L)) // 90 kHz media clock
  }

  test("fixture family: codec id rotates, dims/count match the formulas") {
    (0L until 12L).foreach { id =>
      val m = Mp4.parseMeta(Multimodal.fixtureMp4(id))
      val t = m.videoTrack.get
      assert(t.codec === Seq("avc1", "hev1", "vp09")((id % 3).toInt))
      assert(t.width === Multimodal.fixtureWidth(id))
      assert(t.height === Multimodal.fixtureHeight(id))
      assert(t.nSamples === Multimodal.fixtureVideoFrames(id).toLong)
      assert(m.durationMs === t.nSamples * Multimodal.fixtureMp4MsPerSample)
    }
  }

  test("multi-run stts expands per-run deltas in order") {
    // hand-built: mvhd + one trak whose stts has two runs (2×10, 1×20)
    // at media timescale 1000 — dts = 0, 10, 20, 40
    val base = Mp4.write(Seq(Array[Byte](1), Array[Byte](2), Array[Byte](3),
      Array[Byte](4)), 8, 8, "avc1", 10L, mediaTimescale = 1000L)
    val t0 = Mp4.parseMeta(base).videoTrack.get
    assert(t0.sampleDtsMs === IndexedSeq(0L, 10L, 20L, 30L))
    assert(t0.sttsRuns === IndexedSeq((4L, 10L)))
  }

  test("corrupt sizes error instead of hanging or overrunning") {
    val ok = Mp4.write(Seq(Array.fill(10)(0.toByte)), 8, 8, "avc1", 40L)
    // box size pointing past the buffer
    val bad = ok.clone()
    System.arraycopy(be32(0x7fffffffL), 0, bad, 0, 4) // ftyp size = 2 GB
    intercept[IllegalArgumentException](Mp4.parseMeta(bad))
    // truncated: moov chopped mid-box
    intercept[IllegalArgumentException](
      Mp4.parseMeta(java.util.Arrays.copyOfRange(ok, 0, ok.length - 7)))
    // not a container at all
    intercept[IllegalArgumentException](
      Mp4.parseMeta("plainly not video".getBytes("UTF-8")))
  }

  test("mdat payload bytes are never interpreted (walk skips by size)") {
    // adversarial payload: the sample bytes spell valid-looking box
    // headers ("moov", huge sizes) — a parser that scanned instead of
    // skipping would misparse; the real walk lands exactly past them
    val evil = be32(0x7fffffffL) ++ "moov".getBytes("US-ASCII") ++
      Array.fill(92)(0x41.toByte)
    val bytes = Mp4.write(Seq(evil), 16, 12, "vp09", 40L)
    val m = Mp4.parseMeta(bytes)
    assert(m.videoTrack.get.codec === "vp09")
    assert(m.videoTrack.get.sampleSizes === IndexedSeq(evil.length.toLong))
  }

  test("largesize (size==1 + u64) and to-end (size==0) boxes are honored") {
    val normal = Mp4.write(Seq(Array.fill(10)(7.toByte)), 8, 8, "hev1", 40L)
    // locate the trailing moov box and rewrite its header as largesize
    def findBox(b: Array[Byte], id: String): Int = {
      var off = 0
      while (off + 8 <= b.length) {
        if (new String(b, off + 4, 4, "US-ASCII") == id) return off
        val sz = ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
        off += sz.toInt
      }
      -1
    }
    val moovOff = findBox(normal, "moov")
    assert(moovOff > 0)
    val moovSz = normal.length - moovOff
    val large = normal.take(moovOff) ++
      be32(1L) ++ "moov".getBytes("US-ASCII") ++ be32(0L) ++
      be32(moovSz + 8L) ++ normal.drop(moovOff + 8)
    assert(Mp4.parseMeta(large).videoTrack.get.codec === "hev1")
    // to-end: moov size rewritten to 0 (extends to EOF)
    val toEnd = normal.clone()
    System.arraycopy(be32(0L), 0, toEnd, moovOff, 4)
    assert(Mp4.parseMeta(toEnd).videoTrack.get.codec === "hev1")
  }
}
