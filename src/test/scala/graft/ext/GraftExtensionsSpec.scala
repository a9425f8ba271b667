package graft.ext

import graft.SparkSpec

/** The SQL surface of the native expressions (runtime registration path;
  * the config-time path applies the same builders via injectFunction).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("word_shingles / minhash_sig / simhash64 / cosine_sim are SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  word_shingles('the quick brown fox', 2) AS sh,
        |  size(minhash_sig(word_shingles('the quick brown fox', 2), 16)) AS nsig,
        |  simhash64('the quick brown fox') AS sim,
        |  cosine_sim(array(1.0d, 0.0d), array(2.0d, 0.0d)) AS cos
        |""".stripMargin).first()
    assert(r.getSeq[String](0) === Seq("the quick", "quick brown", "brown fox"))
    assert(r.getInt(1) === 16)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
  }

  test("lower_bound_count is SQL-callable (binary search over a sorted array)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT lower_bound_count(2.5d, array(1.0d, 2.0d, 3.0d, 4.0d)) AS c").first()
    assert(r.getInt(0) === 2)
    // int-typed SQL inputs coerce instead of mis-striding the array read
    val coerced = spark.sql(
      "SELECT lower_bound_count(3, array(1, 2, 3, 4)) AS c").first()
    assert(coerced.getInt(0) === 2)
  }

  test("word_ngrams keeps duplicates; SQL matches the Column API") {
    GraftFunctions.register(spark)
    val sql = spark.sql("SELECT word_ngrams('a b a b', 2) AS g").first().getSeq[String](0)
    assert(sql === Seq("a b", "b a", "a b"))
  }

  test("media header decoders are SQL-callable (wav_meta / mp4_meta / image_meta)") {
    GraftFunctions.register(spark)
    spark.range(1).createOrReplaceTempView("one")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Seq(1).toDF("i")
      .select(Multimodal.encodeWav(lit(8000), lit(1), lit(4000)).as("w"),
        Multimodal.encodeMp4(lit(320), lit(240), lit(2500)).as("m"))
      .createOrReplaceTempView("media")
    val r = spark.sql(
      """SELECT wav_meta(w).sample_rate, wav_meta(w).duration_ms,
        |       mp4_meta(m).width, mp4_meta(m).duration_ms,
        |       image_meta(w) IS NULL AS not_an_image
        |FROM media""".stripMargin).first()
    assert(r.getLong(0) === 8000L && r.getLong(1) === 500L)
    assert(r.getLong(2) === 320L && r.getLong(3) === 2500L)
    assert(r.getBoolean(4))
  }

  test("bpe functions are SQL-callable and detok inverts tokens") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT bpe_count('the quick brown fox') AS n,
        |       bpe_detok(bpe_tokens('the quick brown fox')) AS back,
        |       nfc_normalize('café') AS nfc
        |""".stripMargin).first()
    assert(r.getLong(0) > 0L)
    assert(r.getString(1) === "the quick brown fox")
    assert(r.getString(2) === "café")
  }

  test("encoding repair is SQL-callable (mojibake_repair / control_strip)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT mojibake_repair('caf\u00C3\u00A9').text AS fixed,
        |       mojibake_repair('caf\u00C3\u00A9').n_changed AS nf,
        |       control_strip('ab').text AS stripped,
        |       control_strip('ab').n_changed AS ns
        |""".stripMargin).first()
    assert(r.getString(0) === "caf\u00E9" && r.getLong(1) === 1L)
    assert(r.getString(2) === "ab" && r.getLong(3) === 1L)
  }

  test("multi_pattern_counts is SQL-callable with literal patterns") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT multi_pattern_counts('a table is stable', 'table', 'able') AS c")
      .first().getSeq[Long](0)
    assert(r === Seq(2L, 2L))
  }

  test("the SparkSessionExtensions injector applies the same function set") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders shared with register()
  }
}
