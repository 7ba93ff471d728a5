package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column registrations (north-star set): binary blobs with
  * typed metadata, the per-partition decode kernel, and the 1:N
  * frame-sampling kernel — driven end-to-end through the driver's DuckDB
  * gate on their codec-independent outputs.
  *
  * The "media" table is synthesized from `documents` (media_id = doc_id,
  * bytes = UTF-8 of text) so the oracle can reason about the same blobs:
  * the corpus is pure ASCII at every SF, so DuckDB VARCHAR substrings and
  * md5(VARCHAR) replay Spark's binary slices and md5(BINARY) exactly.
  * Stub-codec-derived values (fake width/height/format) are deliberately
  * NOT emitted — only fields a real codec would agree on (sizes, slices,
  * digests, counts) are oracle-checked; MultimodalSpec covers the rest.
  */
object MultimodalQueries extends QueryPack {

  /** Opaque-binary media table synthesized from `documents`. */
  private def media(s: SparkSession, dir: String): DataFrame =
    graft.Tables.read(s, s"$dir/documents.parquet")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .select(col("doc_id").as("media_id"), col("lang"),
        col("text").cast("binary").as("bytes"))

  private val FRAMES = 4

  // 40 ms/frame derived from the one fixture constant — no magic 40s
  private val AVI_MS_PER_FRAME: Long = Multimodal.fixtureAviUsPerFrame / 1000L

  /** One fixture blob per doc via a per-partition render kernel. */
  private def fixtureBlobs(s: SparkSession, dir: String)(
      render: Long => Array[Byte]): DataFrame = {
    import s.implicits._
    media(s, dir).select(col("media_id")).as[Long]
      .mapPartitions(_.map(id => (id, render(id))))
      .toDF("media_id", "bytes")
  }

  /** Shared motion-container meta projection: decode through `codec`,
    * emit format/dims and the frame count recovered from the container
    * duration at `msPerFrame` timing. */
  private def videoMetaQuery(blobs: DataFrame, codec: Multimodal.Codec,
      msPerFrame: Long): DataFrame =
    Multimodal.decode(blobs, kind = "video", codec = codec).toDF()
      .select(col("media_id"), col("meta.format").as("format"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        (col("meta.durationMs") / msPerFrame).cast("long").as("n_frames"),
        col("meta.durationMs").as("duration_ms"))
      .orderBy("media_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Binary-column handling + aggregation: per-lang blob stats over the
    // opaque bytes (no decode). One hash-shuffle on lang.
    "mm_blob_stats" -> ((s, dir) =>
      media(s, dir).groupBy("lang").agg(
        count(lit(1)).as("n_blobs"),
        sum(length(col("bytes"))).as("total_bytes"),
        countDistinct(md5(col("bytes"))).as("distinct_digests"))
        .orderBy("lang")),

    // The mapPartitions decode kernel end-to-end (StubCodec), checked on
    // its codec-independent fields.
    "mm_decode_meta" -> ((s, dir) =>
      Multimodal.decode(media(s, dir), kind = "image").toDF()
        .select(col("media_id"), col("meta.kind").as("kind"),
          col("meta.sizeBytes").as("size_bytes"))
        .orderBy("media_id")),

    // The 1:N frame-sampling generator kernel: deterministic byte slices,
    // verified by per-frame length + digest.
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(media(s, dir), FRAMES).toDF()
        .select(col("media_id"), col("frame_idx"),
          length(col("frame")).cast("long").as("frame_bytes"),
          md5(col("frame")).as("frame_md5"))
        .orderBy("media_id", "frame_idx")),

    // Perceptual-hash banded near-dup candidates (stub fingerprint =
    // md5 head per the codec-stub convention; banding/collision-join/
    // Hamming-verify plumbing is the real image-dedup shape).
    "mm_phash_candidates" -> ((s, dir) =>
      Multimodal.phashCandidates(media(s, dir), topK = 20)),

    // REAL codec round-trip: render a deterministic fixture PNG per doc
    // (JDK PNG writer), decode it back through javax.imageio
    // (ImageIoCodec), and emit the fields the oracle can recompute from
    // the generator formulas — the image half of the multimodal surface
    // running on genuine pixel data, not the stub.
    "mm_image_decode" -> ((s, dir) => {
      import s.implicits._
      val pngs = media(s, dir).select(col("media_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.fixturePng(id))))
        .toDF("media_id", "bytes")
      Multimodal.decode(pngs, kind = "image",
          codec = Multimodal.ImageIoCodec).toDF()
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.width").cast("long").as("width"),
          col("meta.height").cast("long").as("height"),
          col("meta.durationMs").as("duration_ms"))
        .orderBy("media_id")
    }),

    // REAL audio codec round-trip: render a deterministic fixture WAV per
    // doc (JDK WAV writer), decode it back through javax.sound.sampled
    // (SoundCodec kernel — the frame count comes from fully READING the
    // PCM stream, not the header), and emit the fields the oracle
    // recomputes from the generator formulas.
    "mm_audio_decode" -> ((s, dir) => {
      import s.implicits._
      val wavs = media(s, dir).select(col("media_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.fixtureWav(id))))
        .toDF("media_id", "bytes")
      Multimodal.decodeAudio(wavs).toDF()
        .select(col("media_id"), col("format"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("n_frames"), col("duration_ms"))
        .orderBy("media_id")
    }),

    // REAL motion codec round-trip: render a deterministic multi-frame
    // animated GIF per doc (JDK GIF writer), decode the container back
    // through javax.imageio (GifCodec) — frame count from the actual
    // bitstream, not the generator. The video half of the multimodal
    // surface running on genuinely decoded frames.
    "mm_video_decode" -> ((s, dir) =>
      videoMetaQuery(fixtureBlobs(s, dir)(Multimodal.fixtureGif(_)),
        Multimodal.GifCodec, msPerFrame = 100L)),

    // PIXEL-EXACT image processing end-to-end: fixture PNG → real
    // javax.imageio decode → integer per-pixel luma → 4×4 area-average
    // grid. Every cell is integer-sum/integer-count, so the oracle
    // recomputes all 16 cells per image from the generator pattern —
    // one mangled pixel anywhere in the PNG round trip shifts a cell.
    "mm_image_luma_grid" -> ((s, dir) => {
      import s.implicits._
      val pngs = media(s, dir).select(col("media_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.fixturePng(id))))
        .toDF("media_id", "bytes")
      Multimodal.imageLumaGrid(pngs, g = 4).toDF()
        .select(col("media_id"), col("cell"),
          (floor(col("luma") * 1e6 + 0.5) / 1e6).as("luma"))
        .orderBy("media_id", "cell")
    }),

    // REAL audio analysis end-to-end: fixture WAV → SoundCodec windowed
    // features off the fully-decoded PCM — per-160-frame energy (exact
    // integer Σ sample²) and channel-0 zero crossings. Integer sums are
    // the representation the oracle can replay bit-for-bit from the
    // sawtooth generator formula. 1:N kernel; blobs stay in executors.
    "mm_audio_features" -> ((s, dir) => {
      import s.implicits._
      val wavs = media(s, dir).select(col("media_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.fixtureWav(id))))
        .toDF("media_id", "bytes")
      Multimodal.audioWindowFeatures(wavs, window = 160).toDF()
        .select(col("media_id"), col("win"),
          col("n_frames").cast("long").as("n_frames"),
          col("ssq"), col("zero_crossings").cast("long").as("zero_crossings"))
        .orderBy("media_id", "win")
    }),

    // Integer-exact spectral analysis on genuinely decoded PCM: DC /
    // quarter-band / Nyquist DFT power per 160-frame window, all in
    // exact Long arithmetic so the oracle replays every bin from the
    // sawtooth formula — one mangled sample anywhere shifts a power.
    "mm_audio_spectral" -> ((s, dir) => {
      import s.implicits._
      val wavs = media(s, dir).select(col("media_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.fixtureWav(id))))
        .toDF("media_id", "bytes")
      Multimodal.audioSpectralFeatures(wavs, window = 160).toDF()
        .select(col("media_id"), col("win").cast("long").as("win"),
          col("n_frames").cast("long").as("n_frames"),
          col("p_dc"), col("p_quarter"), col("p_nyquist"))
        .orderBy("media_id", "win")
    }),

    // REAL compressed-video codec #2: deterministic MJPEG AVI per doc
    // (JDK JPEG encoder + hand-assembled RIFF container), parsed back
    // byte-for-byte by AviMjpegCodec — dims/frame-count/duration off the
    // real avih header and chunk walk, at 25 fps (40 ms/frame).
    "mm_mjpeg_decode" -> ((s, dir) =>
      videoMetaQuery(fixtureBlobs(s, dir)(Multimodal.fixtureAvi(_)),
        graft.multimodal.AviMjpegCodec, AVI_MS_PER_FRAME)),

    // MJPEG frame features: every sampled frame decoded from its JPEG
    // payload, dims read off the raster (proving genuine decode — JPEG
    // is lossy but dimension-exact). Same shape as mm_video_frames.
    "mm_mjpeg_frames" -> ((s, dir) =>
      Multimodal.sampleFrameFeatures(fixtureBlobs(s, dir)(Multimodal.fixtureAvi(_)),
          n = 8, codec = graft.multimodal.AviMjpegCodec)
        .toDF()
        .select(col("media_id"), col("frame_idx"),
          col("frame_w").cast("long").as("frame_w"),
          col("frame_h").cast("long").as("frame_h"))
        .orderBy("media_id", "frame_idx")),

    // REAL video transcode end-to-end: fixture GIF → per-frame decode →
    // JPEG re-encode → RIFF/AVI remux (Multimodal.transcodeGifToAvi) →
    // re-decode through AviMjpegCodec. Dims and frame count surviving
    // the GIF→JPEG→AVI round trip prove every stage ran on real frames.
    "mm_transcode_gif_avi" -> ((s, dir) =>
      videoMetaQuery(
        Multimodal.transcodeGifToAvi(fixtureBlobs(s, dir)(Multimodal.fixtureGif(_))),
        graft.multimodal.AviMjpegCodec, AVI_MS_PER_FRAME)),

    // REAL ISO-BMFF container metadata, no frame decode: fixture MP4 →
    // Mp4.parseMeta moov walk — brand, codec id (stsd), dims (sample
    // entry), movie duration (mvhd), sample count + total payload bytes
    // (stsz). This is the metadata half of the H.264/VP9 surface: the
    // bitstream decode stays the one documented stub, but the container
    // around it parses for real, at O(moov bytes) cost per object —
    // payload-size-independent, the property that matters at 100 TB.
    "mm_mp4_metadata" -> ((s, dir) => {
      import s.implicits._
      media(s, dir).select(col("media_id")).as[Long]
        .mapPartitions(_.map { id =>
          val m = graft.multimodal.Mp4.parseMeta(Multimodal.fixtureMp4(id))
          val t = m.videoTrack.get
          (id, m.brand, t.codec, t.width.toLong, t.height.toLong,
            t.nSamples, m.durationMs, t.totalSampleBytes)
        })
        .toDF("media_id", "brand", "codec", "width", "height",
          "n_samples", "duration_ms", "sample_bytes")
        .orderBy("media_id")
    }),

    // The sample-table walk (stts × stsz): one row per sample with its
    // byte size and decode timestamp — the 1:N shape a seek index /
    // partial-fetch planner reads, again without touching the payload.
    "mm_mp4_samples" -> ((s, dir) => {
      import s.implicits._
      media(s, dir).select(col("media_id")).as[Long]
        .mapPartitions(_.flatMap { id =>
          val t = graft.multimodal.Mp4.parseMeta(Multimodal.fixtureMp4(id))
            .videoTrack.get
          t.sampleSizes.zip(t.sampleDtsMs).zipWithIndex.map {
            case ((sz, dts), i) => (id, i, sz, dts)
          }
        })
        .toDF("media_id", "sample_idx", "sample_bytes", "dts_ms")
        .orderBy("media_id", "sample_idx")
    }),

    // REAL frame extraction end-to-end: GIF container → GifCodec
    // sampleFrameFeatures — each frame's dims + perceptual hash read
    // straight off the decoded raster (one decode per frame, no PNG
    // re-encode; the r7 bench's single biggest line was this query's
    // per-frame re-encode). Dimensions matching the generator formulas
    // prove the frames are genuine decoded rasters; full-frame PNG
    // extraction stays available via Multimodal.sampleFrames. 1:N
    // generator kernel; blobs never leave the executors.
    "mm_video_frames" -> ((s, dir) => {
      import s.implicits._
      val gifs = media(s, dir).select(col("media_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.fixtureGif(id))))
        .toDF("media_id", "bytes")
      Multimodal.sampleFrameFeatures(gifs, n = 8, codec = Multimodal.GifCodec)
        .toDF()
        .select(col("media_id"), col("frame_idx"),
          col("frame_w").cast("long").as("frame_w"),
          col("frame_h").cast("long").as("frame_h"))
        .orderBy("media_id", "frame_idx")
    })
  )

  /** Shared oracle for the motion-container meta queries: generator
    * dims/frame-count with `msPerFrame` timing — one body, three
    * containers, so the fixture formulas live in one place. */
  private def videoMetaOracle(format: String, msPerFrame: Long): String =
    s"""WITH p AS (SELECT doc_id AS media_id, doc_id % 50 AS pk FROM documents)
       |SELECT media_id, '$format' AS format,
       |  CAST(8 + (pk % 5) * 4 AS BIGINT) AS width,
       |  CAST(8 + (pk % 3) * 4 AS BIGINT) AS height,
       |  CAST(2 + pk % 4 AS BIGINT) AS n_frames,
       |  CAST((2 + pk % 4) * $msPerFrame AS BIGINT) AS duration_ms
       |FROM p ORDER BY media_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_blob_stats" ->
      """SELECT lang, count(*) AS n_blobs,
        |  sum(length(text))::BIGINT AS total_bytes,
        |  count(DISTINCT md5(text)) AS distinct_digests
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "mm_decode_meta" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  length(text) AS size_bytes
        |FROM documents ORDER BY media_id""".stripMargin,

    // step = max(1, len/4); frame i = bytes[i*step, min(i*step+step, len));
    // ASCII corpus → VARCHAR substring == byte slice.
    "mm_frame_sample" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, text, length(text) AS len,
         |    greatest(1, length(text) // $FRAMES) AS step
         |  FROM documents),
         |f AS (
         |  SELECT media_id, i.range AS frame_idx,
         |    substring(text, (i.range * step)::INTEGER + 1, step::INTEGER) AS frame
         |  FROM m, range(0, $FRAMES) i
         |  WHERE i.range < least($FRAMES, len))
         |SELECT media_id, frame_idx::INTEGER AS frame_idx,
         |  length(frame) AS frame_bytes, md5(frame) AS frame_md5
         |FROM f ORDER BY media_id, frame_idx""".stripMargin,

    // The decoded dimensions must equal the generator formulas (pattern
    // key = doc_id % 50): a lossy or misread bitstream would shift them.
    "mm_image_decode" ->
      """SELECT doc_id AS media_id, 'png' AS format,
        |  CAST(8 + ((doc_id % 50) % 5) * 4 AS BIGINT) AS width,
        |  CAST(8 + ((doc_id % 50) % 3) * 4 AS BIGINT) AS height,
        |  CAST(0 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,

    // The decoded rate/channels/frames must equal the generator formulas
    // (pattern key = doc_id % 50); a misparsed RIFF header or truncated
    // PCM read would shift frames/duration. duration_ms = frames * 1000
    // integer-divided by the rate in both engines.
    "mm_audio_decode" ->
      """WITH p AS (SELECT doc_id AS media_id, doc_id % 50 AS pk FROM documents),
        |f AS (SELECT media_id,
        |    CASE pk % 4 WHEN 0 THEN 8000 WHEN 1 THEN 11025
        |      WHEN 2 THEN 16000 ELSE 22050 END AS sample_rate,
        |    1 + pk % 2 AS channels, 400 + pk * 8 AS n_frames
        |  FROM p)
        |SELECT media_id, 'wav' AS format,
        |  CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(channels AS BIGINT) AS channels,
        |  CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms
        |FROM f ORDER BY media_id""".stripMargin,

    // The decoded dims/frame-count must equal the generator formulas
    // (pattern key = doc_id % 50; frames = 2 + pk % 4); a misparsed GIF
    // logical screen or a reader that stops at the first image would
    // shift n_frames/duration.
    "mm_video_decode" -> videoMetaOracle("gif", msPerFrame = 100L),

    // Full pixel replay: pattern v = (pk·7 + x·31 + y·17) % 256 with
    // channels (v, 3v%256, 5v%256); integer luma, integer cell sums —
    // the one division per cell is the only double.
    "mm_image_luma_grid" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id, (doc_id % 50)::BIGINT AS pk
        |  FROM documents),
        |dims AS (SELECT media_id, pk,
        |    8 + (pk % 5) * 4 AS w, 8 + (pk % 3) * 4 AS h FROM p),
        |px AS (SELECT media_id, pk, w, h, x.range AS x, y.range AS y
        |  FROM dims, range(0, 24) x, range(0, 16) y
        |  WHERE x.range < w AND y.range < h),
        |lm AS (SELECT media_id,
        |    (least(3, (y * 4) // h) * 4 + least(3, (x * 4) // w))::INTEGER
        |      AS cell,
        |    (v * 299 + ((v * 3) % 256) * 587 + ((v * 5) % 256) * 114) // 1000
        |      AS lum
        |  FROM (SELECT media_id, w, h, x, y,
        |          (pk * 7 + x * 31 + y * 17) % 256 AS v FROM px))
        |SELECT media_id, cell,
        |  floor(sum(lum)::DOUBLE / count(*) * 1e6 + 0.5) / 1e6 AS luma
        |FROM lm GROUP BY media_id, cell
        |ORDER BY media_id, cell""".stripMargin,

    // The PCM samples replay from the integer-sawtooth generator
    // (v = (((f·(pk+3) + c·97) % 2048) − 1024)·16), so energy and
    // zero-crossing sums are exact-integer comparisons — a misdecoded
    // byte order, channel count, or frame boundary shifts them.
    "mm_audio_features" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id, (doc_id % 50)::INTEGER AS pk
        |  FROM documents),
        |m AS (SELECT media_id, pk, 1 + pk % 2 AS ch,
        |    400 + pk * 8 AS frames FROM p),
        |fr AS (SELECT media_id, pk, ch, frames, f.range AS f
        |  FROM m, range(0, 800) f WHERE f.range < frames),
        |sv AS (SELECT media_id, (f // 160)::INTEGER AS win, f, pk, ch,
        |    c.range AS c,
        |    ((((f * (pk + 3) + c.range * 97) % 2048) - 1024) * 16)::BIGINT AS v
        |  FROM fr, range(0, 2) c WHERE c.range < ch),
        |en AS (SELECT media_id, win,
        |    count(DISTINCT f) AS n_frames, sum(v * v)::BIGINT AS ssq
        |  FROM sv GROUP BY media_id, win),
        |c0 AS (SELECT media_id, win, f, v,
        |    lag(v) OVER (PARTITION BY media_id ORDER BY f) AS pv
        |  FROM sv WHERE c = 0),
        |zc AS (SELECT media_id, win,
        |    sum(CASE WHEN f % 160 <> 0 AND ((pv < 0) <> (v < 0))
        |      THEN 1 ELSE 0 END)::BIGINT AS zero_crossings
        |  FROM c0 GROUP BY media_id, win)
        |SELECT media_id, win, n_frames, ssq, zero_crossings
        |FROM en JOIN zc USING (media_id, win)
        |ORDER BY media_id, win""".stripMargin,

    // Every spectral power must equal the integer DFT of the channel-0
    // sawtooth: basis weights replayed via n mod 4 / n mod 2, powers in
    // exact integer arithmetic end-to-end.
    "mm_audio_spectral" ->
      """WITH p AS (
        |  SELECT doc_id AS media_id, (doc_id % 50)::INTEGER AS pk
        |  FROM documents),
        |m AS (SELECT media_id, pk, 400 + pk * 8 AS frames FROM p),
        |fr AS (SELECT media_id, pk, f.range AS f
        |  FROM m, range(0, 800) f WHERE f.range < frames),
        |sv AS (SELECT media_id, (f // 160)::BIGINT AS win, f % 160 AS n,
        |    ((((f * (pk + 3)) % 2048) - 1024) * 16)::BIGINT AS v
        |  FROM fr),
        |agg AS (SELECT media_id, win, count(*) AS n_frames,
        |    sum(v)::BIGINT AS dc,
        |    sum(CASE WHEN n % 4 = 0 THEN v WHEN n % 4 = 2 THEN -v ELSE 0 END)::BIGINT AS req,
        |    sum(CASE WHEN n % 4 = 1 THEN v WHEN n % 4 = 3 THEN -v ELSE 0 END)::BIGINT AS imq,
        |    sum(CASE WHEN n % 2 = 0 THEN v ELSE -v END)::BIGINT AS ren
        |  FROM sv GROUP BY media_id, win)
        |SELECT media_id, win, n_frames::BIGINT AS n_frames,
        |  dc * dc AS p_dc, req * req + imq * imq AS p_quarter,
        |  ren * ren AS p_nyquist
        |FROM agg ORDER BY media_id, win""".stripMargin,

    // The decoded dims/frame-count must equal the generator formulas
    // (pattern key = doc_id % 50; frames = 2 + pk % 4, 40 ms/frame): a
    // misparsed RIFF size chain, avih header, or chunk walk shifts them.
    "mm_mjpeg_decode" -> videoMetaOracle("avi", AVI_MS_PER_FRAME),

    // Every moov-walk field must equal the generator formulas: a wrong
    // box offset (stsd entry, 16.16 tkhd dims, mvhd duration, stsz
    // sizes) shifts a value. duration_ms = n·40 exactly (movie
    // timescale 1000); sample_bytes replays the per-sample size formula.
    "mm_mp4_metadata" ->
      """WITH p AS (SELECT doc_id AS media_id, (doc_id % 50)::BIGINT AS pk
        |  FROM documents),
        |f AS (SELECT media_id, pk, 2 + pk % 4 AS n,
        |    8 + (pk % 5) * 4 AS w, 8 + (pk % 3) * 4 AS h FROM p),
        |sb AS (SELECT media_id,
        |    sum(100 + ((pk * 31 + i.range * 17) % 50))::BIGINT AS sample_bytes
        |  FROM f, range(0, 8) i WHERE i.range < n GROUP BY media_id)
        |SELECT media_id, 'isom' AS brand,
        |  CASE pk % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
        |    ELSE 'vp09' END AS codec,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(n * 40 AS BIGINT) AS duration_ms, sb.sample_bytes
        |FROM f JOIN sb USING (media_id) ORDER BY media_id""".stripMargin,

    // The stts×stsz expansion: per-sample size from the size formula,
    // dts = i·40 ms exactly (delta 3600 at media timescale 90000).
    "mm_mp4_samples" ->
      """WITH p AS (SELECT doc_id AS media_id, (doc_id % 50)::BIGINT AS pk
        |  FROM documents),
        |f AS (SELECT media_id, pk, 2 + pk % 4 AS n FROM p)
        |SELECT media_id, i.range::INTEGER AS sample_idx,
        |  CAST(100 + ((pk * 31 + i.range * 17) % 50) AS BIGINT)
        |    AS sample_bytes,
        |  CAST(i.range * 40 AS BIGINT) AS dts_ms
        |FROM f, range(0, 8) i WHERE i.range < n
        |ORDER BY media_id, sample_idx""".stripMargin,

    // Transcode preserves dims/frame-count/timing: the GIF source's
    // generator formulas must survive decode → JPEG → AVI → re-decode.
    "mm_transcode_gif_avi" -> videoMetaOracle("avi", AVI_MS_PER_FRAME),

    // Every sampled MJPEG frame must carry the generator dimensions read
    // off its decoded JPEG raster; n ≤ 5 < 8 so the even-stride sampler
    // emits every frame exactly once, in order.
    "mm_mjpeg_frames" ->
      """WITH p AS (SELECT doc_id AS media_id, doc_id % 50 AS pk FROM documents),
        |f AS (SELECT media_id, 2 + pk % 4 AS n,
        |    8 + (pk % 5) * 4 AS w, 8 + (pk % 3) * 4 AS h
        |  FROM p)
        |SELECT media_id, i.range::INTEGER AS frame_idx,
        |  CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h
        |FROM f, range(0, 8) i WHERE i.range < n
        |ORDER BY media_id, frame_idx""".stripMargin,

    // Every frame of every container must carry the generator dimensions
    // read off its decoded raster. n ≤ 5 < 8 so the even-stride sampler
    // emits every frame exactly once, in order. (frame_phash is computed
    // too but not oracle-checked — SQL can't replay a pixel hash; its
    // determinism is covered by GifCodecSpec.)
    "mm_video_frames" ->
      """WITH p AS (SELECT doc_id AS media_id, doc_id % 50 AS pk FROM documents),
        |f AS (SELECT media_id, 2 + pk % 4 AS n,
        |    8 + (pk % 5) * 4 AS w, 8 + (pk % 3) * 4 AS h
        |  FROM p)
        |SELECT media_id, i.range::INTEGER AS frame_idx,
        |  CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h
        |FROM f, range(0, 8) i WHERE i.range < n
        |ORDER BY media_id, frame_idx""".stripMargin,

    // ASCII corpus ⇒ md5(VARCHAR) == md5(BINARY); the 64-bit stub
    // fingerprint, 16-bit banding, and Hamming arithmetic replay exactly.
    "mm_phash_candidates" ->
      """WITH bits AS (
        |  SELECT doc_id AS media_id,
        |    CAST(('0x' || substr(md5(text), 1, 8))::UBIGINT AS BIGINT) AS hi,
        |    CAST(('0x' || substr(md5(text), 9, 8))::UBIGINT AS BIGINT) AS lo
        |  FROM documents),
        |bands AS (
        |  SELECT media_id, i.range AS band_idx,
        |    CASE i.range WHEN 0 THEN hi // 65536 WHEN 1 THEN hi % 65536
        |      WHEN 2 THEN lo // 65536 ELSE lo % 65536 END AS band_val
        |  FROM bits, range(0, 4) i),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS a, b.media_id AS b
        |  FROM bands a JOIN bands b
        |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        |   AND a.media_id < b.media_id)
        |SELECT a, b,
        |  CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) AS INTEGER)
        |    AS hamming
        |FROM cand
        |JOIN bits x ON x.media_id = a
        |JOIN bits y ON y.media_id = b
        |ORDER BY hamming, a, b LIMIT 20""".stripMargin
  )
}
