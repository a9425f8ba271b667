package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM audio/video container-header expressions, the [[ImageExprs]]
  * pattern extended to the two formats a multimodal manifest reads
  * constantly: WAV/RIFF (PCM audio) and MP4/ISO-BMFF (video). Header-only —
  * sample data / media tracks are never materialized; a training pipeline
  * filtering by duration/sample-rate/dims over 100 TB of media touches a
  * few hundred bytes per object.
  *
  * Both decoders parse the PUBLIC container layouts: RIFF chunks
  * (`"RIFF" size "WAVE"` then `fmt `/`data` chunks, little-endian) and
  * ISO-BMFF boxes (`size type` big-endian; `moov/mvhd` for
  * timescale+duration, `moov/trak/tkhd` for track dims as 16.16 fixed
  * point, version 0 and 1 forms). The matching encoders render minimal
  * spec-conformant files from arithmetic inputs, giving decode an
  * encode→decode round-trip oracle (x50 — the x29 story).
  *
  * CodegenFallback by design: per-row work is byte-walk IO, not expression
  * arithmetic, so whole-stage codegen would buy nothing.
  */
object MediaExprs {

  /** Struct returned by [[WavMeta]]. `duration_ms` is floor-rounded. */
  val wavMetaType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("bits_per_sample", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 3) & 0xffL) << 24)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) |
      (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long = (be32(b, o) << 32) | be32(b, o + 4)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Header-only WAV metadata from real RIFF bytes: sample rate, channel
    * count, bit depth, sample count and duration from the `fmt ` and
    * `data` chunk headers. Null for anything that isn't a parseable
    * RIFF/WAVE PCM file (the caller's cue to fall back to a stub or a
    * real codec). */
  case class WavMeta(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = wavMetaType
    override def nullable: Boolean = true
    override def prettyName: String = "wav_meta"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wav_meta needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return null
      var sampleRate = -1L
      var channels = -1L
      var bits = -1L
      var dataSize = -1L
      var off = 12L
      // chunk walk: [id(4) size(4,LE) payload(size, word-aligned)]. The
      // declared size is UNSIGNED 32-bit — kept as Long so a crafted
      // 0xFFFFFFF8 can't truncate to a negative/zero step (untrusted media
      // bytes must never hang an executor); Long arithmetic makes every
      // step advance by >= 8, so the walk always terminates
      while (off + 8 <= b.length && (sampleRate < 0 || dataSize < 0)) {
        val id = tag(b, off.toInt)
        val size = le32(b, off.toInt + 4)
        if (id == "fmt " && size >= 16 && off + 8 + 16 <= b.length) {
          channels = le16(b, off.toInt + 10).toLong
          sampleRate = le32(b, off.toInt + 12)
          bits = le16(b, off.toInt + 22).toLong
        } else if (id == "data") {
          // size may exceed the buffer (truncated upload) — trust the header,
          // it's what the data chunk DECLARES; n_bytes records the actual
          dataSize = size
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (sampleRate <= 0 || channels <= 0 || bits <= 0 || dataSize < 0) return null
      val bytesPerFrame = channels * (bits / 8)
      if (bytesPerFrame <= 0) return null
      val nSamples = dataSize / bytesPerFrame
      val durationMs = nSamples * 1000L / sampleRate
      new GenericInternalRow(Array[Any](
        b.length.toLong, sampleRate, channels, bits, nSamples, durationMs))
    }

    override protected def withNewChildInternal(newChild: Expression): WavMeta =
      copy(child = newChild)
  }

  /** Minimal spec-conformant PCM WAV from arithmetic inputs: 16-bit
    * samples, each a pure function of its index — the round-trip fixture
    * generator for [[WavMeta]]. */
  case class EncodeWav(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "encode_wav"

    /** (sampleRate, channels, nSamples) → RIFF bytes. */
    override protected def nullSafeEval(sr: Any, ch: Any, ns: Any): Any = {
      val sampleRate = sr.asInstanceOf[Int]
      val channels = ch.asInstanceOf[Int]
      val nSamples = ns.asInstanceOf[Int]
      require(sampleRate >= 1 && channels >= 1 && channels <= 8 && nSamples >= 0 &&
        nSamples <= (1 << 20), s"encode_wav out of range: $sampleRate/$channels/$nSamples")
      val dataSize = nSamples * channels * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      buf.put("fmt ".getBytes).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort)  // block align
        .putShort(16)                      // bits per sample
      buf.put("data".getBytes).putInt(dataSize)
      var i = 0
      while (i < nSamples * channels) {
        buf.putShort(((i * 2654435761L) % 65536 - 32768).toShort)
        i += 1
      }
      buf.array()
    }

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): EncodeWav =
      copy(first = f, second = s, third = t)
  }

  /** Struct returned by [[Mp4Meta]]; width/height are the FIRST video
    * track's dims (16.16 fixed point truncated to integers), duration from
    * `mvhd` timescale units floor-converted to ms. */
  val mp4MetaType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("brand", StringType, nullable = false)))

  /** Header-only MP4/ISO-BMFF metadata: walks top-level boxes for `ftyp`
    * (major brand) and `moov`, then `moov`'s children for `mvhd`
    * (timescale + duration, version 0/1) and `trak/tkhd` (track dims).
    * Null when the payload is not a parseable BMFF file. */
  case class Mp4Meta(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = mp4MetaType
    override def nullable: Boolean = true
    override def prettyName: String = "mp4_meta"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mp4_meta needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      if (b.length < 16 || tag(b, 4) != "ftyp") return null
      var brand: String = null
      var timescale = -1L
      var duration = -1L
      var width = -1L
      var height = -1L

      def walk(from: Long, to: Long, visit: (String, Long, Long) => Unit): Unit = {
        var off = from
        while (off + 8 <= to) {
          var size = be32(b, off.toInt)
          var header = 8L
          if (size == 1 && off + 16 <= to) { size = be64(b, off.toInt + 8); header = 16L }
          else if (size == 0) size = to - off // box extends to end
          if (size < header || off + size > to) return // malformed — stop
          visit(tag(b, off.toInt + 4), off + header, off + size)
          off += size
        }
      }

      walk(0, b.length.toLong, { (typ, start, end) =>
        typ match {
          case "ftyp" if end - start >= 4 => brand = tag(b, start.toInt)
          case "moov" =>
            walk(start, end, { (t2, s2, e2) =>
              t2 match {
                case "mvhd" if e2 - s2 >= 20 =>
                  val v = b(s2.toInt) & 0xff
                  if (v == 1) {
                    // a v1 mvhd shorter than its fixed layout is malformed —
                    // leave timescale/duration unset (→ null result) rather
                    // than misreading mtime bytes via the v0 offsets
                    if (e2 - s2 >= 32) {
                      timescale = be32(b, s2.toInt + 20)
                      duration = be64(b, s2.toInt + 24)
                    }
                  } else {
                    timescale = be32(b, s2.toInt + 12)
                    duration = be32(b, s2.toInt + 16)
                  }
                case "trak" =>
                  walk(s2, e2, { (t3, s3, e3) =>
                    // width/height are the LAST 8 bytes of tkhd (16.16
                    // fixed) in BOTH version 0 and version 1 layouts
                    if (t3 == "tkhd" && width < 0 && e3 - s3 >= 8) {
                      val w = be32(b, (e3 - 8).toInt) >> 16
                      val h = be32(b, (e3 - 4).toInt) >> 16
                      if (w > 0 && h > 0) { width = w; height = h }
                    }
                  })
                case _ =>
              }
            })
          case _ =>
        }
      })
      if (brand == null || timescale <= 0 || duration < 0) return null
      val durationMs = duration * 1000L / timescale
      new GenericInternalRow(Array[Any](
        b.length.toLong, durationMs, timescale,
        math.max(width, 0L), math.max(height, 0L), UTF8String.fromString(brand)))
    }

    override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
      copy(child = newChild)
  }

  /** Minimal spec-conformant MP4 from arithmetic inputs: `ftyp(isom)` +
    * `moov(mvhd + trak(tkhd))`, timescale 1000 so mvhd duration IS
    * milliseconds; track dims as 16.16 fixed point. The [[Mp4Meta]]
    * round-trip fixture generator. */
  case class EncodeMp4(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "encode_mp4"

    /** (width, height, durationMs) → BMFF bytes. */
    override protected def nullSafeEval(w: Any, h: Any, d: Any): Any = {
      val width = w.asInstanceOf[Int]
      val height = h.asInstanceOf[Int]
      val durationMs = d.asInstanceOf[Int]
      require(width >= 1 && height >= 1 && width <= 65535 && height <= 65535 &&
        durationMs >= 0, s"encode_mp4 out of range: ${width}x$height/$durationMs")
      val buf = java.nio.ByteBuffer.allocate(16 + 8 + 108 + 8 + 92)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      buf.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      buf.putInt(8 + 108 + 8 + 92).put("moov".getBytes)
      // mvhd v0: vflags ctime mtime timescale duration rate volume+res
      // reserved(8) matrix(36) predefined(24) next_track_id
      buf.putInt(108).put("mvhd".getBytes)
        .putInt(0).putInt(0).putInt(0)
        .putInt(1000).putInt(durationMs)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        .putLong(0L)
      putMatrix(buf)
      var i = 0
      while (i < 6) { buf.putInt(0); i += 1 } // predefined
      buf.putInt(2) // next track id
      buf.putInt(8 + 92).put("trak".getBytes)
      // tkhd v0: vflags ctime mtime trackid reserved duration reserved(8)
      // layer altgroup volume reserved matrix(36) width height (16.16)
      buf.putInt(92).put("tkhd".getBytes)
        .putInt(0x000007) // flags: enabled/in-movie/in-preview
        .putInt(0).putInt(0).putInt(1).putInt(0).putInt(durationMs)
        .putLong(0L).putShort(0).putShort(0).putShort(0).putShort(0)
      putMatrix(buf)
      buf.putInt(width << 16).putInt(height << 16)
      buf.array()
    }

    private def putMatrix(buf: java.nio.ByteBuffer): Unit = {
      // identity display matrix: 0x10000 scale terms, 0x40000000 w term
      buf.putInt(0x00010000).putInt(0).putInt(0)
      buf.putInt(0).putInt(0x00010000).putInt(0)
      buf.putInt(0).putInt(0).putInt(0x40000000)
    }

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): EncodeMp4 =
      copy(first = f, second = s, third = t)
  }

  /** Per-frame PCM energy over a RIFF/WAVE payload: decodes the 16-bit PCM
    * sample stream (channels interleaved) and returns the EXACT
    * sum-of-squares per non-overlapping frame of `frameSamples` interleaved
    * samples, trailing partial frame included. Exact integer output (a
    * 16-bit sample squared is < 2^30, so even million-sample frames fit a
    * long) makes the result oracle-able: for a synthetic [[EncodeWav]]
    * payload the energy has a closed form any engine can recompute.
    *
    * This is the audio-side "feature extract" a training pipeline runs to
    * drop silence/clipped segments before the expensive model pass — the
    * real decode-the-samples step ([[WavMeta]] never touches sample data).
    * Null for anything that isn't PCM-16 WAV (compressed codecs need a
    * real decoder) and for `frameSamples < 1`. A truncated upload clamps
    * to the bytes actually present rather than failing: partial data is
    * still signal for the filter.
    */
  case class WavEnergy(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "wav_energy"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == IntegerType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wav_energy needs (BINARY, INT), got (${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString})")

    override protected def nullSafeEval(p: Any, fs: Any): Any = {
      val b = p.asInstanceOf[Array[Byte]]
      val frame = fs.asInstanceOf[Int]
      if (frame < 1) return null
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return null
      var fmtCode = -1
      var bits = -1L
      var dataOff = -1L
      var dataSize = -1L
      var off = 12L // same unsigned-size Long walk as WavMeta: always terminates
      while (off + 8 <= b.length && (bits < 0 || dataOff < 0)) {
        val id = tag(b, off.toInt)
        val size = le32(b, off.toInt + 4)
        if (id == "fmt " && size >= 16 && off + 8 + 16 <= b.length) {
          fmtCode = le16(b, off.toInt + 8)
          bits = le16(b, off.toInt + 22).toLong
        } else if (id == "data") {
          dataOff = off + 8
          dataSize = size
        }
        off += 8 + size + (size & 1)
      }
      if (fmtCode != 1 || bits != 16 || dataOff < 0 || dataOff > b.length) return null
      val avail = math.min(dataSize, b.length - dataOff)
      val n = (avail / 2).toInt
      val out = new Array[Long](if (n == 0) 0 else (n + frame - 1) / frame)
      var i = 0
      while (i < n) {
        val o = (dataOff + 2L * i).toInt
        val s = (((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)).toShort.toLong
        out(i / frame) += s * s
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): WavEnergy =
      copy(left = l, right = r)
  }

  // Column-level wrappers
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def wavMeta(payload: Column): Column = column(WavMeta(expression(payload)))
  def wavEnergy(payload: Column, frameSamples: Column): Column =
    column(WavEnergy(expression(payload), expression(frameSamples.cast("int"))))
  def encodeWav(sampleRate: Column, channels: Column, nSamples: Column): Column =
    column(EncodeWav(expression(sampleRate.cast("int")), expression(channels.cast("int")),
      expression(nSamples.cast("int"))))
  def mp4Meta(payload: Column): Column = column(Mp4Meta(expression(payload)))
  def encodeMp4(width: Column, height: Column, durationMs: Column): Column =
    column(EncodeMp4(expression(width.cast("int")), expression(height.cast("int")),
      expression(durationMs.cast("int"))))
}
