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

  test("extractFeatures appends an 8-dim deterministic feature vector") {
    val out = Multimodal.extractFeatures(Multimodal.asBinary(docs, "text"), "payload")
    val feats = out.filter($"doc_id" === 1).select("features").first().getSeq[Double](0)
    assert(feats.length === 8)
    assert(feats.forall(f => f >= -1.0 && f <= 1.0))
    val again = Multimodal.extractFeatures(Multimodal.asBinary(docs, "text"), "payload")
      .filter($"doc_id" === 1).select("features").first().getSeq[Double](0)
    assert(feats === again)
  }
}
