package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * IMAGE decode is REAL: [[decodeImage]] parses genuine PNG/JPEG/GIF/BMP
  * headers through the JDK-builtin `javax.imageio` stack (header-only — no
  * pixel decode), and [[encodeImage]] writes real bytes with the same
  * codecs, giving a round-trip oracle. AUDIO and VIDEO metadata decode are
  * REAL too: [[decodeWav]] parses RIFF/WAVE chunk headers (sample rate,
  * channels, bit depth, duration) and [[decodeMp4]] walks ISO-BMFF boxes
  * (mvhd duration/timescale, tkhd track dims) — pure-JVM byte walks, no
  * codec library ([[graft.functions.MediaExprs]]), with [[encodeWav]] /
  * [[encodeMp4]] as round-trip fixture generators. [[decodeStub]] remains
  * ONLY for genuinely unparseable payloads (exotic containers, codec
  * bitstream internals) — swap for an ffmpeg-over-mapPartitions codec in
  * production.
  */
object Multimodal {

  /** Typed metadata carried next to each binary payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Wrap a string column as a binary payload (test stand-in for real image
    * bytes; production reads `binaryFile` sources instead). */
  def asBinary(df: DataFrame, src: String, as: String = "payload"): DataFrame =
    df.withColumn(as, encode(col(src), "UTF-8"))

  /** Read a directory of opaque files as (path, modificationTime, length,
    * content) — Spark's binaryFile source; the real ingest path for media. */
  def readBinaryFiles(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)

  /** Real image decode: header-only width/height/channels/format from
    * actual PNG/JPEG/GIF/BMP bytes via `javax.imageio`; null for payloads
    * no reader claims. Same struct shape as [[decodeStub]] (plus n_bytes). */
  def decodeImage(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ImageExprs.imageMeta(payload)

  /** Real image encode: deterministic synthetic pixels written through the
    * JDK codec for `format` ("png"/"jpeg"/"bmp"/"gif") — the fixture
    * generator for decode round-trip tests and oracles. */
  def encodeImage(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
                  format: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ImageExprs.encodeImage(width, height, format)

  /** Real image resize: decode with the JDK codec, nearest-neighbor
    * resample with the explicit mapping `src = floor(dst*srcDim/dstDim)`,
    * re-encode as lossless PNG — output pixels are a pure function of
    * input pixels and both dims, so a resize of a deterministic
    * [[encodeImage]] fixture has a closed-form oracle. Null for
    * undecodable payloads or out-of-range targets. */
  def resizeImage(payload: org.apache.spark.sql.Column, width: org.apache.spark.sql.Column,
                  height: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ImageExprs.resizeImage(payload, width, height)

  /** Exact decoded-pixel checksum (Σ r+g+b over all pixels) — the
    * pixel-level proof a transform produced the raster it claimed to;
    * header dims alone can't tell a resize from a scramble. */
  def imagePixelSum(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ImageExprs.imagePixelSum(payload)

  /** Real PCM feature extraction: per-frame energy (exact sum-of-squares
    * over non-overlapping frames of `frameSamples` interleaved 16-bit
    * samples) decoded from actual WAV bytes — the silence/clipping filter
    * input. Null for non-PCM-16 payloads. */
  def wavEnergy(payload: org.apache.spark.sql.Column,
                frameSamples: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.MediaExprs.wavEnergy(payload, frameSamples)

  /** Real WAV/RIFF header decode: (n_bytes, sample_rate, channels,
    * bits_per_sample, n_samples, duration_ms) from actual RIFF chunk
    * headers; null for payloads that aren't parseable RIFF/WAVE. */
  def decodeWav(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.MediaExprs.wavMeta(payload)

  /** Minimal spec-conformant PCM WAV encoder (deterministic samples) —
    * the decode round-trip fixture generator. */
  def encodeWav(sampleRate: org.apache.spark.sql.Column, channels: org.apache.spark.sql.Column,
                nSamples: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.MediaExprs.encodeWav(sampleRate, channels, nSamples)

  /** Real MP4/ISO-BMFF header decode: (n_bytes, duration_ms, timescale,
    * width, height, brand) from the box tree; null for non-BMFF payloads. */
  def decodeMp4(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.MediaExprs.mp4Meta(payload)

  /** Minimal spec-conformant MP4 encoder (ftyp + moov/mvhd + trak/tkhd) —
    * the decode round-trip fixture generator. */
  def encodeMp4(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
                durationMs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.MediaExprs.encodeMp4(width, height, durationMs)

  /** STUB "decode" for genuinely unparseable payloads (exotic containers,
    * codec bitstream internals — images/WAV/MP4 have REAL decoders above):
    * deterministic fake metadata derived purely from payload bytes. Replace
    * with a real codec; pure column expressions so it stays in whole-stage
    * codegen. */
  def decodeStub(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nb = length(payload).cast("long")
    struct(
      nb.as("n_bytes"),
      (nb % 640).as("width"),
      ((nb / lit(7)).cast("long") % 480).as("height"),
      lit(3L).as("channels"),
      when(nb % 3 === 0, "png").when(nb % 3 === 1, "jpeg").otherwise("webp").as("format"))
  }

  /** Partition-parallel "frame sampling" stub: emits `n` per-frame rows per
    * payload (explode over a deterministic frame index). Mirrors the shape
    * of a real mapPartitions decoder: one input row → n output rows,
    * partitioning preserved, no shuffle. */
  def sampleFrames(df: DataFrame, payload: String, n: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0L), lit(n.toLong - 1))))
      .withColumn("frame_hash", xxhash64(col(payload), col("frame_idx")))

  /** "Feature extraction" stub over binary payloads via mapPartitions —
    * demonstrates the imperative per-partition escape hatch (real codecs
    * hold per-partition native state: decoder contexts, model sessions).
    * Deterministic fake: 8 doubles folded from payload bytes. */
  def extractFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add("features", ArrayType(DoubleType, containsNull = false))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val feats = Array.tabulate(8) { i =>
          var h = 1125899906842597L + i
          var j = 0
          while (j < bytes.length) { h = 31 * h + bytes(j); j += 1 }
          (h % 10007).toDouble / 10007.0
        }
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
