package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload wrapping, stub decode determinism,
  * frame sampling shape, mapPartitions feature extraction.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "a longer document body here"))
    .toDF("doc_id", "text")

  test("asBinary wraps text as a binary payload") {
    val out = Multimodal.asBinary(docs, "text")
    assert(out.schema("payload").dataType.typeName === "binary")
    val bytes = out.filter($"doc_id" === 1).select("payload").first().getAs[Array[Byte]](0)
    assert(new String(bytes, "UTF-8") === "hello world")
  }

  test("decodeStub yields deterministic metadata from payload bytes") {
    val out = Multimodal.asBinary(docs, "text")
      .withColumn("meta", Multimodal.decodeStub($"payload"))
      .select($"doc_id", $"meta.n_bytes", $"meta.format")
    val r = out.filter($"doc_id" === 1).first()
    assert(r.getLong(1) === 11L) // "hello world".length
    assert(Seq("png", "jpeg", "webp").contains(r.getString(2)))
    // determinism: second evaluation gives identical rows
    assert(out.collect().toSeq === out.collect().toSeq)
  }

  test("sampleFrames emits n rows per payload with distinct hashes") {
    val out = Multimodal.sampleFrames(Multimodal.asBinary(docs, "text"), "payload", 3)
    assert(out.count() === 6)
    val perDoc = out.groupBy("doc_id").agg(
      count(lit(1)).as("n"), count_distinct($"frame_hash").as("nd")).collect()
    perDoc.foreach { r => assert(r.getLong(1) === 3L && r.getLong(2) === 3L) }
  }

  test("decodeImage parses real PNG and JPEG bytes header-exactly") {
    val out = docs.select($"doc_id",
        Multimodal.encodeImage(lit(20) + $"doc_id", lit(17), lit("png")).as("png"),
        Multimodal.encodeImage(lit(33), lit(12) + $"doc_id", lit("jpeg")).as("jpg"))
      .select($"doc_id",
        Multimodal.decodeImage($"png").as("pm"),
        Multimodal.decodeImage($"jpg").as("jm"))
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val pm = r.getStruct(1); val jm = r.getStruct(2)
      assert(pm.getAs[Long]("width") === 20L + id)
      assert(pm.getAs[Long]("height") === 17L)
      assert(pm.getAs[Long]("channels") === 3L)
      assert(pm.getAs[String]("format") === "png")
      assert(jm.getAs[Long]("width") === 33L)
      assert(jm.getAs[Long]("height") === 12L + id)
      assert(jm.getAs[String]("format") === "jpeg")
    }
  }

  test("decodeImage against independently-written ImageIO bytes, not our encoder") {
    // bytes produced OUTSIDE the expression pipeline: prove the decoder
    // parses real codec output, not just its sibling's
    val img = new java.awt.image.BufferedImage(41, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    val r = Seq(Tuple1(bytes)).toDF("payload")
      .select(Multimodal.decodeImage($"payload").as("m"))
      .selectExpr("m.width", "m.height", "m.format", "m.n_bytes").first()
    assert(r.getLong(0) === 41L && r.getLong(1) === 7L)
    assert(r.getString(2) === "png")
    assert(r.getLong(3) === bytes.length.toLong)
  }

  test("decodeImage is null for non-image payloads; stub still covers them") {
    val out = Multimodal.asBinary(docs, "text")
      .select($"doc_id", Multimodal.decodeImage($"payload").as("real"),
        Multimodal.decodeStub($"payload").as("stub"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1), "text bytes must not decode as an image")
      assert(!r.isNullAt(2))
    }
  }

  test("decodeWav round-trips encodeWav header-exactly") {
    val r = docs.select($"doc_id",
        Multimodal.encodeWav(lit(16000), lit(2), lit(8000) + $"doc_id").as("wav"))
      .select($"doc_id", Multimodal.decodeWav($"wav").as("m"))
      .filter($"doc_id" === 2).selectExpr("m.sample_rate", "m.channels",
        "m.bits_per_sample", "m.n_samples", "m.duration_ms", "m.n_bytes").first()
    assert(r.getLong(0) === 16000L)
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 16L)
    assert(r.getLong(3) === 8002L)
    assert(r.getLong(4) === 8002L * 1000 / 16000) // floor ms
    assert(r.getLong(5) === 44L + 8002L * 2 * 2)
  }

  test("decodeWav against independently-written javax.sound bytes, not our encoder") {
    // bytes from the JDK's own WAV writer — proves the parser reads real
    // RIFF output, not just its sibling encoder's
    val fmt = new javax.sound.sampled.AudioFormat(22050f, 16, 2, true, false)
    val frames = 4410L
    val data = new Array[Byte](frames.toInt * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val bytes = bos.toByteArray
    val r = Seq(Tuple1(bytes)).toDF("payload")
      .select(Multimodal.decodeWav($"payload").as("m"))
      .selectExpr("m.sample_rate", "m.channels", "m.bits_per_sample",
        "m.n_samples", "m.duration_ms").first()
    assert(r.getLong(0) === 22050L)
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) === 16L)
    assert(r.getLong(3) === frames)
    assert(r.getLong(4) === frames * 1000 / 22050)
  }

  test("decodeMp4 round-trips encodeMp4 box-exactly") {
    val r = docs.select($"doc_id",
        Multimodal.encodeMp4(lit(1920), lit(1080), lit(90000) + $"doc_id").as("mp4"))
      .select($"doc_id", Multimodal.decodeMp4($"mp4").as("m"))
      .filter($"doc_id" === 1).selectExpr("m.width", "m.height",
        "m.duration_ms", "m.timescale", "m.brand").first()
    assert(r.getLong(0) === 1920L)
    assert(r.getLong(1) === 1080L)
    assert(r.getLong(2) === 90001L)
    assert(r.getLong(3) === 1000L)
    assert(r.getString(4) === "isom")
  }

  test("decodeMp4 parses version-1 mvhd (64-bit times) and 64-bit boxes") {
    // hand-built BMFF: ftyp + moov(mvhd v1) with the mvhd box using a
    // 64-bit largesize header — neither shape is produced by our encoder
    val buf = java.nio.ByteBuffer.allocate(16 + 8 + 16 + 32)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(16).put("ftyp".getBytes).put("mp42".getBytes).putInt(0)
    buf.putInt(8 + 16 + 32).put("moov".getBytes)
    buf.putInt(1).put("mvhd".getBytes).putLong(16 + 32) // largesize form
    buf.put(1.toByte).put(Array[Byte](0, 0, 0))         // version 1
    buf.putLong(0L).putLong(0L)                         // ctime/mtime 64-bit
    buf.putInt(90000)                                   // timescale
    buf.putLong(123456789L)                             // duration 64-bit
    val r = Seq(Tuple1(buf.array())).toDF("payload")
      .select(Multimodal.decodeMp4($"payload").as("m"))
      .selectExpr("m.duration_ms", "m.timescale", "m.width", "m.brand").first()
    assert(r.getLong(1) === 90000L)
    assert(r.getLong(0) === 123456789L * 1000 / 90000)
    assert(r.getLong(2) === 0L) // no trak — dims absent, not garbage
    assert(r.getString(3) === "mp42")
  }

  test("wav/mp4 decoders reject the other container, text, and truncation") {
    val wav = docs.select(Multimodal.encodeWav(lit(8000), lit(1), lit(100)).as("p"))
    val mp4 = docs.select(Multimodal.encodeMp4(lit(64), lit(48), lit(500)).as("p"))
    assert(wav.select(Multimodal.decodeMp4($"p")).collect().forall(_.isNullAt(0)))
    assert(mp4.select(Multimodal.decodeWav($"p")).collect().forall(_.isNullAt(0)))
    val text = Multimodal.asBinary(docs, "text")
    assert(text.select(Multimodal.decodeWav($"payload")).collect().forall(_.isNullAt(0)))
    assert(text.select(Multimodal.decodeMp4($"payload")).collect().forall(_.isNullAt(0)))
    val truncated = wav.select(expr("substring(p, 1, 10)").as("p"))
    assert(truncated.select(Multimodal.decodeWav($"p")).collect().forall(_.isNullAt(0)))
  }

  test("decodeWav terminates and nulls on a crafted near-2^32 chunk size") {
    // declared size 0xFFFFFFF8 truncated to Int is -8: a signed walk would
    // advance by 0 (infinite executor loop). Must return null, promptly.
    val buf = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
    buf.put("junk".getBytes).putInt(0xFFFFFFF8)
    val r = Seq(Tuple1(buf.array())).toDF("payload")
      .select(Multimodal.decodeWav($"payload")).first()
    assert(r.isNullAt(0))
  }

  test("decodeMp4 nulls a version-1 mvhd too short for the v1 layout") {
    // v==1 but only the v0-sized payload present — misreading it via the
    // v0 offsets would return mtime bytes as timescale/duration
    val buf = java.nio.ByteBuffer.allocate(16 + 8 + 8 + 20)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(16).put("ftyp".getBytes).put("mp42".getBytes).putInt(0)
    buf.putInt(8 + 8 + 20).put("moov".getBytes)
    buf.putInt(8 + 20).put("mvhd".getBytes)
    buf.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1, flags
    buf.putInt(0).putInt(0).putInt(90000).putInt(1234) // v0-shaped payload
    val r = Seq(Tuple1(buf.array())).toDF("payload")
      .select(Multimodal.decodeMp4($"payload")).first()
    assert(r.isNullAt(0))
  }

  test("fuzz: decoders never throw or hang on arbitrary and mutated container bytes") {
    // the decoders' contract for untrusted media at scale: ANY byte input
    // either parses or returns null — no exception (kills the task) and
    // no non-terminating walk (hangs the executor). Random blobs exercise
    // the reject paths; mutated VALID containers keep the magic so the
    // chunk/box walk engages and then hits corrupted sizes/offsets.
    val rng = new scala.util.Random(0xC0FFEE)
    def validWav: Array[Byte] = docs
      .select(Multimodal.encodeWav(lit(16000), lit(2), lit(500)).as("b"))
      .first().getAs[Array[Byte]](0)
    def validMp4: Array[Byte] = docs
      .select(Multimodal.encodeMp4(lit(640), lit(360), lit(90000)).as("b"))
      .first().getAs[Array[Byte]](0)
    val blobs = (0 until 150).map(_ => Array.fill(rng.nextInt(256))(rng.nextInt().toByte))
    def mutated(base: Array[Byte], keep: Int): Seq[Array[Byte]] =
      (0 until 150).map { _ =>
        val b = base.clone()
        // corrupt 1-4 bytes anywhere past the magic, sizes included
        (0 until 1 + rng.nextInt(4)).foreach { _ =>
          b(keep + rng.nextInt(b.length - keep)) = rng.nextInt().toByte
        }
        // sometimes truncate mid-structure
        if (rng.nextBoolean()) b.take(keep + rng.nextInt(b.length - keep)) else b
      }
    val payloads = blobs ++ mutated(validWav, 12) ++ mutated(validMp4, 8)
    val df = payloads.map(Tuple1(_)).toDF("payload")
    // one action over all fuzz rows; must COMPLETE (termination) with
    // every result either null or a fully-typed struct (no throw)
    val out = df.select(
      Multimodal.decodeWav($"payload").as("w"),
      Multimodal.decodeMp4($"payload").as("m"),
      Multimodal.decodeImage($"payload").as("i")).collect()
    assert(out.length === payloads.length)
    out.foreach { r =>
      if (!r.isNullAt(0)) assert(r.getStruct(0).getLong(1) > 0) // sample_rate
      if (!r.isNullAt(1)) assert(r.getStruct(1).length > 0)
    }
  }

  test("resizeImage resamples with the exact floor mapping (pixel-level)") {
    // 4x4 deterministic pattern -> 2x2: nearest-neighbor with
    // src = floor(dst*srcDim/dstDim) picks (0,0),(2,0),(0,2),(2,2)
    def pat(x: Int, y: Int): Long =
      (((x * 31 + y * 17) & 0xff) + ((x * 13 + y * 29) & 0xff) +
        ((x * 7 + y * 23) & 0xff)).toLong
    val expected = pat(0, 0) + pat(2, 0) + pat(0, 2) + pat(2, 2)
    val r = docs.limit(1)
      .select(Multimodal.encodeImage(lit(4), lit(4), lit("png")).as("src"))
      .select(Multimodal.resizeImage($"src", lit(2), lit(2)).as("dst"))
      .select(Multimodal.imagePixelSum($"dst").as("sum"),
        Multimodal.decodeImage($"dst").as("m"))
      .selectExpr("sum", "m.width", "m.height", "m.format").first()
    assert(r.getLong(0) === expected)
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getString(3) === "png")
  }

  test("resizeImage upscale repeats pixels exactly; identity resize is lossless") {
    def pat(x: Int, y: Int): Long =
      (((x * 31 + y * 17) & 0xff) + ((x * 13 + y * 29) & 0xff) +
        ((x * 7 + y * 23) & 0xff)).toLong
    val srcSum = (for (x <- 0 until 3; y <- 0 until 2) yield pat(x, y)).sum
    val r = docs.limit(1)
      .select(Multimodal.encodeImage(lit(3), lit(2), lit("png")).as("src"))
      .select(Multimodal.imagePixelSum(Multimodal.resizeImage($"src", lit(3), lit(2))).as("id"),
        Multimodal.imagePixelSum(Multimodal.resizeImage($"src", lit(6), lit(4))).as("up"))
      .first()
    assert(r.getLong(0) === srcSum)
    // 2x upscale with the floor mapping duplicates every pixel 4x
    assert(r.getLong(1) === 4 * srcSum)
  }

  test("resizeImage handles jpeg input and nulls garbage / bad dims") {
    val r = docs.limit(1)
      .select(Multimodal.encodeImage(lit(16), lit(12), lit("jpeg")).as("jpg"),
        encode(lit("not an image"), "UTF-8").as("junk"))
      .select(
        Multimodal.decodeImage(Multimodal.resizeImage($"jpg", lit(8), lit(8))).as("m"),
        Multimodal.resizeImage($"junk", lit(8), lit(8)).as("bad"),
        Multimodal.resizeImage($"jpg", lit(0), lit(8)).as("zero"),
        Multimodal.resizeImage($"jpg", lit(8), lit(5000)).as("huge"),
        Multimodal.imagePixelSum($"junk").as("badsum"))
      .first()
    assert(r.getStruct(0).getAs[Long]("width") === 8L)
    assert(r.getStruct(0).getAs[Long]("height") === 8L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("wavEnergy matches the closed-form sample stream per frame") {
    // EncodeWav sample i = ((i * 2654435761) % 65536) - 32768
    def smp(i: Long): Long = (i * 2654435761L) % 65536 - 32768
    val nSamp = 300 // 1 channel -> frames of 128: [128, 128, 44]
    val expected = (0L until nSamp).groupBy(_ / 128).toSeq.sortBy(_._1)
      .map { case (_, is) => is.map(i => smp(i) * smp(i)).sum }
    val r = docs.limit(1)
      .select(Multimodal.encodeWav(lit(8000), lit(1), lit(nSamp)).as("wav"))
      .select(Multimodal.wavEnergy($"wav", lit(128)).as("e"))
      .first().getSeq[Long](0)
    assert(r === expected)
  }

  test("wavEnergy clamps truncated payloads and nulls non-PCM input") {
    val wav = docs.limit(1)
      .select(Multimodal.encodeWav(lit(8000), lit(2), lit(500)).as("wav"))
      .first().getAs[Array[Byte]](0)
    // cut mid-data: header declares 1000 interleaved samples, only 100 present
    val truncated = wav.take(44 + 200)
    def smp(i: Long): Long = (i * 2654435761L) % 65536 - 32768
    val expected = (0L until 100L).groupBy(_ / 64).toSeq.sortBy(_._1)
      .map { case (_, is) => is.map(i => smp(i) * smp(i)).sum }
    val r = Seq(Tuple1(truncated)).toDF("payload")
      .select(Multimodal.wavEnergy($"payload", lit(64)).as("e"),
        Multimodal.wavEnergy(encode(lit("RIFFxxxxWAVEnope"), "UTF-8"), lit(64)).as("bad"),
        Multimodal.wavEnergy($"payload", lit(0)).as("zeroframe"))
      .first()
    assert(r.getSeq[Long](0) === expected)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("extractFeatures appends an 8-dim deterministic feature vector") {
    val out = Multimodal.extractFeatures(Multimodal.asBinary(docs, "text"), "payload")
    val feats = out.filter($"doc_id" === 1).select("features").first().getSeq[Double](0)
    assert(feats.length === 8)
    assert(feats.forall(f => f >= -1.0 && f <= 1.0))
    val again = Multimodal.extractFeatures(Multimodal.asBinary(docs, "text"), "payload")
      .filter($"doc_id" === 1).select("features").first().getSeq[Double](0)
    assert(feats === again)
  }

  test("imageDHash: identical payloads hash equal; re-encode is invariant") {
    import graft.functions.ImageExprs
    val r = Seq(1).toDF("i")
      .select(Multimodal.encodeImage(lit(33), lit(21), lit("png")).as("a"),
        Multimodal.encodeImage(lit(33), lit(21), lit("png")).as("b"),
        // lossless identity resize = different bytes, same raster
        Multimodal.resizeImage(
          Multimodal.encodeImage(lit(33), lit(21), lit("png")), lit(33), lit(21)).as("c"))
      .select(ImageExprs.imageDHash($"a"), ImageExprs.imageDHash($"b"),
        ImageExprs.imageDHash($"c"))
      .first()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) === r.getLong(2))
  }

  test("imageDHash: smooth-content resize stays within a small hamming ball") {
    import graft.functions.ImageExprs
    // a low-frequency image (the synthetic pattern is high-frequency, so
    // build smoothness by heavy downscale first): hash the 64x40 smooth
    // version and a 60x38 re-resize of it
    val r = Seq(1).toDF("i")
      .select(Multimodal.resizeImage(
          Multimodal.encodeImage(lit(9), lit(8), lit("png")), lit(64), lit(40)).as("a"))
      .select($"a", Multimodal.resizeImage($"a", lit(60), lit(38)).as("b"))
      .select(ImageExprs.imageDHash($"a").as("ha"), ImageExprs.imageDHash($"b").as("hb"))
      .first()
    // nearest-neighbor upscale keeps blocky edges, so a handful of bits
    // sit on block boundaries that shift under the re-resample — the claim
    // is a SMALL ball (uncorrelated hashes average 32 bits apart)
    val hamming = java.lang.Long.bitCount(r.getLong(0) ^ r.getLong(1))
    assert(hamming <= 10, s"smooth resize moved $hamming bits")
  }

  test("imageDHash nulls undecodable payloads") {
    import graft.functions.ImageExprs
    val r = Seq(Array[Byte](1, 2, 3)).toDF("p")
      .select(ImageExprs.imageDHash($"p")).first()
    assert(r.isNullAt(0))
  }
}
