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
}
