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
