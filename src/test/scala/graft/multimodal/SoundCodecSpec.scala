package graft.multimodal

import graft.SparkSpec

/** Real-PCM audio path (SoundCodec over javax.sound.sampled): metadata
  * from the decoded WAV stream (frame count by READING the PCM, not the
  * header), envelope features/aHash from decoded samples — including a
  * cross-container collision (same PCM as WAV and AU), which a byte-hash
  * stub fingerprint can never produce.
  */
class SoundCodecSpec extends SparkSpec {

  test("decodeMeta reads real rate/channels/duration from decoded PCM") {
    val wav = Multimodal.fixtureWav(7L)
    val meta = Multimodal.SoundCodec.decodeMeta("audio", wav)
    assert(meta.format === "wav")
    assert(meta.width === Multimodal.fixtureSampleRate(7L))
    assert(meta.height === Multimodal.fixtureChannels(7L))
    assert(meta.durationMs === Multimodal.fixtureFrames(7L).toLong * 1000L /
      Multimodal.fixtureSampleRate(7L))
    assert(meta.sizeBytes === wav.length.toLong)
  }

  test("decodeAudio kernel: frames counted from fully reading the PCM stream") {
    import spark.implicits._
    val df = Seq(3L, 7L, 12L, 53L).toDF("media_id").as[Long]
      .mapPartitions(_.map(id => (id, Multimodal.fixtureWav(id))))
      .toDF("media_id", "bytes")
    val out = Multimodal.decodeAudio(df).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(3L, 7L, 12L, 53L))
    out.foreach { m =>
      assert(m.format === "wav")
      assert(m.sample_rate === Multimodal.fixtureSampleRate(m.media_id))
      assert(m.channels === Multimodal.fixtureChannels(m.media_id))
      assert(m.n_frames === Multimodal.fixtureFrames(m.media_id).toLong)
      assert(m.duration_ms === m.n_frames * 1000L / m.sample_rate)
    }
  }

  test("envelope aHash is content-based: same PCM collides across containers") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val wav = Multimodal.fixtureWav(3L)
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    val raw = try in.readAllBytes() finally in.close()
    // the same samples, big-endian, in an AU container
    val swapped = new Array[Byte](raw.length)
    var i = 0
    while (i < raw.length - 1) {
      swapped(i) = raw(i + 1); swapped(i + 1) = raw(i); i += 2
    }
    val beFmt = new AudioFormat(fmt.getSampleRate, 16, fmt.getChannels, true, true)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(swapped), beFmt,
        raw.length.toLong / fmt.getFrameSize),
      AudioFileFormat.Type.AU, bos)
    val au = bos.toByteArray
    assert(!wav.sameElements(au))
    assert(Multimodal.SoundCodec.sniffFormat(au) === "au")
    assert(Multimodal.SoundCodec.phash64(wav) ===
      Multimodal.SoundCodec.phash64(au)) // byte-hash stubs cannot do this
    // a different pattern lands on a different envelope hash
    assert(Multimodal.SoundCodec.phash64(Multimodal.fixtureWav(4L)) !==
      Multimodal.SoundCodec.phash64(wav))
  }

  test("windowFeatures replays the generator's integer PCM exactly") {
    val id = 7L
    val p = (id % 50L).toInt
    val ch = Multimodal.fixtureChannels(id)
    val frames = Multimodal.fixtureFrames(id)
    val window = 160
    val got = Multimodal.SoundCodec.windowFeatures(Multimodal.fixtureWav(id), window)
    assert(got.length === (frames + window - 1) / window)
    assert(got.map(_._2).sum === frames)
    def v(f: Int, c: Int): Long = (((f * (p + 3) + c * 97) % 2048) - 1024).toLong * 16
    got.foreach { case (w, n, ssq, zc) =>
      val start = w * window
      val expSsq = (start until start + n).flatMap(f =>
        (0 until ch).map(c => v(f, c) * v(f, c))).sum
      assert(ssq === expSsq, s"window $w energy")
      val expZc = (start + 1 until start + n).count(f =>
        (v(f - 1, 0) < 0) != (v(f, 0) < 0))
      assert(zc === expZc, s"window $w zero crossings")
    }
    // a real sawtooth crosses zero: features are not degenerate
    assert(got.map(_._4).sum > 0)
  }

  test("features come from decoded amplitude, bounded and deterministic") {
    val wav = Multimodal.fixtureWav(11L)
    val f1 = Multimodal.SoundCodec.extractFeatures(wav, 16)
    val f2 = Multimodal.SoundCodec.extractFeatures(wav, 16)
    assert(f1.length === 16)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(v => v >= 0.0f && v <= 1.0f)) // mean |amplitude|
    assert(f1.exists(_ > 0.0f)) // a real signal, not silence
  }

  /** Mono little-endian 16-bit WAV from explicit samples. */
  private def wavOf(samples: Array[Int], rate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      raw(2 * i) = (v & 0xff).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("spectralFeatures: constant signal is pure DC") {
    val wav = wavOf(Array.fill(8)(100))
    val Seq((w, n, pdc, pq, pn)) =
      Multimodal.SoundCodec.spectralFeatures(wav, window = 8).toList
    assert((w, n) === ((0, 8)))
    assert(pdc === 800L * 800L)
    // quarter-band basis sums cancel over full periods; Nyquist alternates
    assert(pq === 0L)
    assert(pn === 0L)
  }

  test("spectralFeatures: alternating signal is pure Nyquist") {
    val wav = wavOf(Array.tabulate(8)(i => if (i % 2 == 0) 100 else -100))
    val Seq((_, _, pdc, pq, pn)) =
      Multimodal.SoundCodec.spectralFeatures(wav, window = 8).toList
    assert(pdc === 0L)
    assert(pq === 0L)
    assert(pn === 800L * 800L)
  }

  test("spectralFeatures: period-4 square wave is pure quarter band") {
    // +,+,-,- repeating: re = Σ cos-basis = s0 - s2 per period = 200,
    // im = s1 - s3 = 200 → power = (4·200)²·2 over 16 samples? — compute
    // directly: per 4: re += (100 - (-100)) = 200, im += (100 - (-100)) = 200
    val wav = wavOf(Array.tabulate(16)(i => if ((i / 2) % 2 == 0) 100 else -100))
    val Seq((_, _, pdc, pq, pn)) =
      Multimodal.SoundCodec.spectralFeatures(wav, window = 16).toList
    assert(pdc === 0L)
    assert(pn === 0L)
    val re = 4L * 200L; val im = 4L * 200L
    assert(pq === re * re + im * im)
  }

  test("spectralFeatures: multi-channel input reads channel 0 only") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // stereo: ch0 constant 50, ch1 loud alternating junk
    val frames = 8
    val raw = new Array[Byte](frames * 2 * 2)
    (0 until frames).foreach { f =>
      val v0 = 50; val v1 = if (f % 2 == 0) 3000 else -3000
      raw(4 * f) = (v0 & 0xff).toByte; raw(4 * f + 1) = ((v0 >> 8) & 0xff).toByte
      raw(4 * f + 2) = (v1 & 0xff).toByte; raw(4 * f + 3) = ((v1 >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val Seq((_, n, pdc, _, pn)) =
      Multimodal.SoundCodec.spectralFeatures(bos.toByteArray, window = 8).toList
    assert(n === 8)
    assert(pdc === 400L * 400L) // 8 × 50
    assert(pn === 0L)           // ch1's Nyquist energy must not leak in
  }
}
