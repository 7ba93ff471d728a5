package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns for the LLM-data-pipeline surface: image/audio/video
  * travel as opaque `binary` columns with typed metadata, processed by
  * per-partition kernels (the JVM port of the `mapInPandas` batch shape:
  * one iterator of rows in, one iterator of rows out, no driver collect).
  *
  * The actual codec work is STUBBED — this container has no image/audio
  * libraries — behind [[StubCodec]], which produces deterministic fake
  * decodes. Everything Spark-side is real and tested: schemas, binary
  * handling, partitioning, kernel signatures, batch shapes. Swapping
  * [[StubCodec]] for a real JNI/opencv-backed codec changes no plumbing.
  *
  * Scale notes: blobs stay in executors end-to-end; `repartition` by blob
  * size budget (not row count) keeps partitions within executor memory at
  * 100 TB — see [[Multimodal.repartitionBySize]].
  */
object Multimodal {

  case class MediaMeta(kind: String, format: String, width: Int, height: Int,
      durationMs: Long, sizeBytes: Long)

  case class DecodedMedia(media_id: Long, meta: MediaMeta, features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** ======= STUB: deterministic fake codec (no media libs available) =====
    * Every value is a pure function of the bytes, so tests are exact and
    * the pipeline is reproducible. A real deployment implements this trait
    * with actual decoders; the operators below are codec-agnostic.
    */
  trait Codec extends Serializable {
    def sniffFormat(bytes: Array[Byte]): String
    def decodeMeta(kind: String, bytes: Array[Byte]): MediaMeta
    def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float]
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  object StubCodec extends Codec {
    private def h(bytes: Array[Byte], salt: Int): Long = {
      var acc = 1125899906842597L + salt
      var i = 0
      while (i < bytes.length) { acc = 31 * acc + bytes(i); i += 1 }
      acc & 0x7fffffffffffffffL
    }
    def sniffFormat(bytes: Array[Byte]): String =
      Seq("png", "jpeg", "wav", "mp4")((h(bytes, 0) % 4).toInt)
    def decodeMeta(kind: String, bytes: Array[Byte]): MediaMeta =
      MediaMeta(kind, sniffFormat(bytes),
        width = 160 + (h(bytes, 1) % 8).toInt * 160,
        height = 90 + (h(bytes, 2) % 8).toInt * 90,
        durationMs = if (kind == "image") 0L else 1000L + h(bytes, 3) % 600000L,
        sizeBytes = bytes.length.toLong)
    def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
      Array.tabulate(dim)(i => ((h(bytes, 100 + i) % 2000L) - 1000L) / 1000.0f)
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val step = math.max(1, bytes.length / math.max(n, 1))
      (0 until math.min(n, bytes.length)).map { i =>
        bytes.slice(i * step, math.min(i * step + step, bytes.length))
      }
    }
  }
  // ======= end stub ======================================================

  /** Decode metadata + features per blob. Kernel shape: one partition in,
    * one partition out; the codec never sees the driver.
    */
  def decode(media: DataFrame, kind: String, featureDim: Int = 16,
      codec: Codec = StubCodec): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          DecodedMedia(id, codec.decodeMeta(kind, bytes),
            codec.extractFeatures(bytes, featureDim))
        }
      }
  }

  /** Sample up to `n` frames per video blob (1:N generator kernel). */
  def sampleFrames(media: DataFrame, n: Int,
      codec: Codec = StubCodec): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          codec.sampleFrames(bytes, n).zipWithIndex.map {
            case (f, i) => Frame(id, i, f)
          }
        }
      }
  }

  /** Partition blobs so each task carries ≈`budgetBytes` of binary data —
    * row-count partitioning breaks when blob sizes are skewed.
    */
  def repartitionBySize(media: DataFrame, budgetBytes: Long): DataFrame = {
    val stats = media.agg(sum(length(col("bytes")))).head()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (total / math.max(budgetBytes, 1L)).toInt)
    media.repartition(parts)
  }

  /** Perceptual-hash near-dup candidates over opaque media blobs: a
    * 64-bit fingerprint per blob, banded into 4×16-bit LSH blocks —
    * pairs colliding on any band are candidates, verified by full
    * Hamming distance. This is image-dedup's standard shape (pHash +
    * multi-index hashing); per the codec-stub convention the fingerprint
    * here is the blob's md5 head (deterministic, oracle-replayable)
    * standing in for a real DCT pHash — swapping in a real codec changes
    * ONE projection, none of the banding/join/verify plumbing.
    *
    * Scale shape: 4 band rows per blob (bounded fan-out), candidate
    * generation is a partial-deduped self-join on the 16-bit band
    * key — colliding pairs only, never all-pairs; the Hamming verify is
    * a narrow bitwise expression over the two 32-bit halves. Top-k by
    * (distance, pair) is TakeOrderedAndProject.
    */
  def phashCandidates(media: DataFrame, topK: Int,
      idCol: String = "media_id", bytesCol: String = "bytes"): DataFrame = {
    val bits = media.select(col(idCol).as("media_id"),
      conv(substring(md5(col(bytesCol)), 1, 8), 16, 10).cast("long").as("hi"),
      conv(substring(md5(col(bytesCol)), 9, 8), 16, 10).cast("long").as("lo"))
      .localCheckpoint() // fingerprint once; banding + both verify sides reuse it
    val bands = bits.select(col("media_id"), col("hi"), col("lo"),
      posexplode(array(
        shiftright(col("hi"), 16), col("hi").bitwiseAND(lit(65535L)),
        shiftright(col("lo"), 16), col("lo").bitwiseAND(lit(65535L))))
        .as(Seq("band_idx", "band_val")))
    val cand = bands.select(col("band_idx"), col("band_val"), col("media_id").as("a"))
      .join(bands.select(col("band_idx"), col("band_val"), col("media_id").as("b")),
        Seq("band_idx", "band_val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    cand
      .join(bits.select(col("media_id").as("a"),
        col("hi").as("hi_a"), col("lo").as("lo_a")), "a")
      .join(bits.select(col("media_id").as("b"),
        col("hi").as("hi_b"), col("lo").as("lo_b")), "b")
      .select(col("a"), col("b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).as("hamming"))
      .orderBy(col("hamming").asc, col("a"), col("b"))
      .limit(topK)
  }
}
