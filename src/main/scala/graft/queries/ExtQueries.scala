package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Curation, Multimodal, Packing, Similarity, TextAnalysis, TextDedup}
import graft.incremental.Incremental
import graft.util.Det._

/** North-star extension operators (training-data pipeline): dedup family,
  * similarity search, text analysis, multimodal plumbing, incremental
  * processing — each demonstrated on `documents` / `embeddings` / `events`
  * with a DuckDB oracle where the semantics are SQL-expressible.
  */
object ExtQueries {

  /** ANN corpus: embeddings ∪ planted identical twins of the query batch
    * (ids shifted by 1e5) — every ANN query/verifier shares it. */
  private def annCorpus(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    emb.unionByName(emb.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000L))
  }

  /** Deterministic PQ codebooks per sf dir (see x41). Training is an
    * offline, once-per-corpus-snapshot artifact in production — cached per
    * JVM so the benched x41 times the ADC serve path, not training. */
  private val pqCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()

  /** PQ artifacts for an sf dir: codebooks + a PERSISTED code table
    * (parquet, staged once per JVM) — the 32×-compressed frame the ADC
    * scan serves from. Returns (codebooks, codesPath). */
  private def pqArtifacts(s: SparkSession, d: String): (Array[Array[Array[Double]]], String) = {
    val cb = pqCodebooks.computeIfAbsent(d,
      _ => Similarity.pqTrain(annCorpus(s, d), m = 16, ksub = 16, iters = 4))
    val dir = Staging.dir("pqcodes", d) { tmp =>
      Similarity.pqEncodeDf(annCorpus(s, d), cb).write.parquet(s"$tmp/codes")
    }
    (cb, s"$dir/codes")
  }

  /** Persisted-IVF index per sf dir: trains the coarse quantizer and writes
    * the bucketed inverted file ONCE per JVM (offline index build); the
    * benched x18 then times only the bucket-pruned serve. Table name is
    * dir-keyed so correctness (sf0.01) and bench (sf0.1) JVMs never clash. */
  private val ivfCentroids =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()
  private def ivfTable(d: String): String =
    "graft_ivf_" + java.lang.Integer.toHexString(d.hashCode)
  private def ivfIndex(s: SparkSession, d: String): Array[Array[Double]] =
    ivfCentroids.computeIfAbsent(d, { _ =>
      // cells stay ~5000 vectors at every SF: a FIXED nlist makes the
      // probed-cell scan grow linearly with the corpus (sf100 caught x18
      // at 30× for 10×); nlist=16 up to sf1 preserves the recall-verifier
      // (x52) regime at correctness SFs
      val nlist = math.max(16L, math.min(1024L, annCorpus(s, d).count() / 5000)).toInt
      Similarity.buildIvfIndex(annCorpus(s, d), ivfTable(d), nlist = nlist)
    })

  /** Incremental-IVF artifacts per sf dir (see x56): the BASE index is
    * trained and written on 4/5 of the embeddings only; the delta (the
    * remaining fifth PLUS the planted query twins) is then appended via
    * the maintenance path — assigned to the EXISTING centroids, appended
    * to the bucketed inverted file — with build-time and delta assignment
    * quality recorded for the drift check. Built once per JVM (offline
    * maintenance work); x56 benches the serve, like x18. */
  private val ivfaState = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Array[Double]], Similarity.IvfDrift)]()
  private def ivfaTable(d: String): String =
    "graft_ivfa_" + java.lang.Integer.toHexString(d.hashCode)
  private def ivfaArtifacts(s: SparkSession, d: String): (Array[Array[Double]], Similarity.IvfDrift) =
    ivfaState.computeIfAbsent(d, { _ =>
      val emb = Tables.embeddings(s, d)
      val base = emb.filter(col("vec_id") % 5 =!= 0)
      val delta = emb.filter(col("vec_id") % 5 === 0)
        .unionByName(emb.filter(col("vec_id") < 10)
          .withColumn("vec_id", col("vec_id") + 100000L))
      // k-means trains on base MINUS a calibration slice; the whole base is
      // indexed. The calibration slice — unseen at train time, like every
      // future delta — is the drift reference (see IvfDrift's scaladoc).
      val calib = base.filter(col("vec_id") % 7 === 1)
      val centroids = Similarity.kmeansCentroids(
        base.filter(col("vec_id") % 7 =!= 1), nlist = 16)
      Similarity.writeIvfIndex(base, ivfaTable(d), centroids)
      val refQ = Similarity.ivfAssignQuality(calib, centroids)
      Similarity.appendToIvfIndex(delta, ivfaTable(d), centroids)
      val deltaQ = Similarity.ivfAssignQuality(delta, centroids)
      (centroids, Similarity.IvfDrift(refQ, deltaQ, margin = 0.05))
    })

  /** Incremental-PQ artifacts per sf dir (see x77): codebooks trained on
    * 4/5 of the embeddings (minus a calibration slice — the drift
    * reference, unseen at train time like every future delta); the BASE
    * code table is written once, then the delta (the remaining fifth PLUS
    * the planted query twins) is encoded with the SAME codebooks and
    * appended as NEW FILES beside the base (object-store safe). PQ's
    * append path is pure encode — codes are per-vector, so maintenance is
    * one narrow pass with no re-training and no base re-scan; the drift
    * check (reconstruction quality of the delta vs build-time) is the
    * retrain trigger. Built once per JVM; x77 benches the serve. */
  private val pqaState = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Array[Array[Double]]], String, Similarity.IvfDrift)]()
  private def pqaArtifacts(s: SparkSession, d: String)
      : (Array[Array[Array[Double]]], String, Similarity.IvfDrift) =
    pqaState.computeIfAbsent(d, { _ =>
      val emb = Tables.embeddings(s, d)
      val base = emb.filter(col("vec_id") % 5 =!= 0)
      val delta = emb.filter(col("vec_id") % 5 === 0)
        .unionByName(emb.filter(col("vec_id") < 10)
          .withColumn("vec_id", col("vec_id") + 100000L))
      val calib = base.filter(col("vec_id") % 7 === 1)
      val cb = Similarity.pqTrain(base.filter(col("vec_id") % 7 =!= 1),
        m = 16, ksub = 16, iters = 4)
      val dir = java.nio.file.Files.createTempDirectory("graft_pqa").toString
      Similarity.pqEncodeDf(base, cb).write.parquet(s"$dir/codes/base")
      val refQ = Similarity.pqEncodeQuality(calib, cb)
      Similarity.pqEncodeDf(delta, cb).write.parquet(s"$dir/codes/delta")
      val deltaQ = Similarity.pqEncodeQuality(delta, cb)
      (cb, s"$dir/codes", Similarity.IvfDrift(refQ, deltaQ, margin = 0.05))
    })

  /** documents ∪ exact duplicates (ids shifted by 1e6) — exercises dedup. */
  private def dupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
  }
  private val dupCorpusSql =
    """SELECT * FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars FROM documents""".stripMargin

  /** documents ∪ near-duplicate variants (every 25th doc gets a tail). */
  private def nearDupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val variants = docs.filter(col("doc_id") % 25 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", concat(col("text"), lit(" graft dedup probe tail")))
    docs.unionByName(variants)
  }
  private val nearDupCorpusSql =
    """SELECT doc_id, text, source FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000, text || ' graft dedup probe tail', source
      |FROM documents WHERE doc_id % 25 = 0""".stripMargin

  private val neardupOracle =
    s"""WITH u AS ($nearDupCorpusSql),
       |tok AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM u),
       |sh AS (SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(t) - 1),
       |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |       FROM tok)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       len(list_intersect(a.s, b.s)) / len(list_distinct(list_concat(a.s, b.s))) AS jacc
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.s, b.s)) / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
       |ORDER BY 1, 2""".stripMargin

  /** Same shingle/Jaccard machinery as [[neardupOracle]] but ending in a
    * `pairs` CTE, for oracles that post-process the near-dup graph. */
  private val neardupPairsCtes =
    s"""u AS ($nearDupCorpusSql),
       |tok AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM u),
       |sh AS (SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(t) - 1),
       |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |       FROM tok),
       |pairs AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |          WHERE len(list_intersect(a.s, b.s)) / len(list_distinct(list_concat(a.s, b.s))) >= 0.8)""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // Exact dedup at scale: hash group-by on content digest, keep min id.
    QuerySpec("x01_dedup_exact",
      (s, d) => TextDedup.dedupExact(dupCorpus(s, d), col("text"), col("doc_id"))
        .groupBy("source").agg(n.as("n_docs"))
        .orderBy("source"),
      Some(s"""WITH u AS ($dupCorpusSql),
              |c AS (SELECT * FROM u
              |      QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
              |SELECT source, count(*) AS n_docs FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact n-gram-Jaccard near-dup pairs (global all-pairs at oracle scale;
    // block or LSH at production scale).
    QuerySpec("x02_neardup_jaccard",
      (s, d) => TextDedup.exactNearDups(nearDupCorpus(s, d),
        col("doc_id"), col("text"), lit(1), k = 3, threshold = 0.8)
        .orderBy("id_a", "id_b"),
      Some(neardupOracle)),

    // MinHash+LSH near-dup: banding candidates + exact verification.
    // Same oracle as x02 — LSH recall at j≥0.8 with r=2,b=32 is ≈1-1e-14.
    QuerySpec("x03_minhash_lsh",
      (s, d) => TextDedup.minhashNearDups(nearDupCorpus(s, d),
        col("doc_id"), col("text"), k = 3, numHashes = 64, rowsPerBand = 2,
        threshold = 0.8)
        .orderBy("id_a", "id_b"),
      Some(neardupOracle)),

    // SimHash near-dup sketch: planted-pair detection. The corpus plants a
    // near-duplicate (4-token tail) for every doc_id % 25 == 0; a correct
    // 64-bit simhash puts each planted pair within a small hamming radius
    // (measured max 14 across sf0.001/0.01/0.1; radius 16 gives margin), so
    // the detection scan must recover EVERY planted pair — which the oracle
    // can enumerate exactly. Raw-radius-8 pair semantics stay pinned in
    // SimHashSpec (full output is hash-specific, not SQL-expressible).
    QuerySpec("x04_simhash",
      (s, d) => TextDedup.simhashNearDups(nearDupCorpus(s, d),
        col("doc_id"), col("text"), lit(1), maxDist = 16)
        .filter(col("id_a") % 25 === 0 && col("id_b") === col("id_a") + 1000000L)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b"),
      Some("""SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
             |FROM documents WHERE doc_id % 25 = 0 ORDER BY 1, 2""".stripMargin)),

    // Brute-force cosine top-k (exact ANN baseline).
    QuerySpec("x05_knn_bruteforce",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5)
          .select(col("query_id"), col("rk"), col("neighbor_id"))
          .orderBy("query_id", "rk")
      },
      Some("""WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |           FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |      FROM embeddings)
             |SELECT q.vec_id AS query_id,
             |       CAST(row_number() OVER (PARTITION BY q.vec_id
             |         ORDER BY list_dot_product(q.v, c.v) /
             |                  (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
             |         c.vec_id ASC) AS BIGINT) AS rk,
             |       c.vec_id AS neighbor_id
             |FROM q JOIN c ON c.vec_id <> q.vec_id
             |QUALIFY rk <= 5
             |ORDER BY query_id, rk""".stripMargin)),

    // LSH-bucketed approximate NN (the scale path), verified two ways the
    // oracle CAN check: (1) exact retrieval — every query's planted
    // duplicate (identical vector ⇒ identical signature in every table ⇒
    // guaranteed bucket hit, sim 1.0) must come back at rank 1; (2) recall
    // — total overlap with the exact brute-force top-5 must clear 35/50
    // (0.7; measured ≥ 45 at b=4,t=16 across sf0.001/0.01/0.1). The recall
    // comparison runs INSIDE the plan (semi-join + count), no collect.
    QuerySpec("x06_ann_lsh",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 10)
        val corpus = emb.unionByName(q.withColumn("vec_id", col("vec_id") + 100000L))
        val lsh = Similarity.lshTopK(q, corpus, 5, dim = 64, bits = 4, tables = 16)
        val bf = Similarity.bruteForceTopK(q, corpus, 5)
        val totalOverlap = lsh.select("query_id", "neighbor_id")
          .join(bf.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("__n"))
        lsh.filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .crossJoin(totalOverlap)
          .select(col("query_id"), col("top1_neighbor_id"),
            (col("__n") >= 35).cast("long").as("recall_ok"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id,
             |       CAST(1 AS BIGINT) AS recall_ok
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // Marker-based language ID — confusion matrix vs the labeled lang col.
    QuerySpec("x07_lang_id",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.predictedLang(col("text")).as("predicted"))
        .groupBy("lang", "predicted").agg(n.as("n_docs"))
        .orderBy("lang", "predicted"),
      Some("""WITH sc AS (
             |  SELECT lang,
             |    len(list_filter(string_split(lower(text),' '), x -> x IN ('der','die','das','und','ist'))) AS s_de,
             |    len(list_filter(string_split(lower(text),' '), x -> x IN ('the','a','of','and','is'))) AS s_en,
             |    len(list_filter(string_split(lower(text),' '), x -> x IN ('el','los','las','es','y'))) AS s_es,
             |    len(list_filter(string_split(lower(text),' '), x -> x IN ('le','les','est','et','une'))) AS s_fr,
             |    len(list_filter(string_split(lower(text),' '), x -> x IN ('的','是','了','在','和'))) AS s_zh
             |  FROM documents)
             |SELECT lang,
             |       CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
             |            WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
             |            WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
             |            WHEN s_fr >= s_zh THEN 'fr'
             |            ELSE 'zh' END AS predicted,
             |       count(*) AS n_docs
             |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Quality scoring: length / diversity / alpha-ratio components.
    QuerySpec("x08_quality_score",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") <= 100)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.avgTokenLength(col("text")).as("avg_token_len"),
          round(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"),
          round(TextAnalysis.alphaRatio(col("text")), 4).as("alpha_ratio"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS tk
             |           FROM documents WHERE doc_id <= 100)
             |SELECT doc_id,
             |  CAST(len(tk) AS BIGINT) AS n_tokens,
             |  ((list_sum(list_transform(tk, x -> len(x))) * 100 + len(tk) // 2) // len(tk)) / 100.0 AS avg_token_len,
             |  round(len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in'))) * 1.0 / len(tk), 4) AS stopword_ratio,
             |  round(len(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 / len(text), 4) AS alpha_ratio,
             |  round(least(len(tk) * 1.0 / 100, 1.0) * 0.4
             |      + (len(list_distinct(tk)) * 1.0 / len(tk)) * 0.3
             |      + (len(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 / len(text)) * 0.3, 3) AS quality
             |FROM t ORDER BY doc_id""".stripMargin)),

    // Token counting: whitespace tokens + BPE-ish pieces, per source.
    QuerySpec("x09_token_count",
      (s, d) => Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"),
          sum(TextAnalysis.piecesCount(col("text"))).as("total_pieces"))
        .orderBy("source"),
      Some("""SELECT source,
             |  CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens,
             |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_pieces
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Content fingerprinting (md5-16); rolling-hash variant in TextSpec.
    QuerySpec("x10_fingerprint",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") <= 100)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, substr(md5(lower(text)), 1, 16) AS fingerprint
             |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin)),

    // Multimodal plumbing: binary payload + typed metadata (decode STUBBED).
    QuerySpec("x11_multimodal_meta",
      (s, d) => Multimodal.asBinary(Tables.documents(s, d).filter(col("doc_id") <= 100), "text")
        .withColumn("meta", Multimodal.decodeStub(col("payload")))
        .select(col("doc_id"), col("meta.n_bytes"), col("meta.width"),
          col("meta.height"), col("meta.channels"), col("meta.format"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
             |  CAST((octet_length(encode(text)) // 7) % 480 AS BIGINT) AS height,
             |  CAST(3 AS BIGINT) AS channels,
             |  CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
             |       WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpeg'
             |       ELSE 'webp' END AS format
             |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin)),

    // n-gram profile: top-20 bigrams corpus-wide.
    QuerySpec("x12_top_bigrams",
      (s, d) => Tables.documents(s, d)
        .select(explode(TextAnalysis.ngrams(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(n.as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("bigram").asc)
        .limit(20),
      Some("""SELECT bigram, count(*) AS n_occurrences
             |FROM (SELECT unnest(list_transform(range(1, len(t)),
             |              i -> t[i] || ' ' || t[i+1])) AS bigram
             |      FROM (SELECT string_split(lower(text), ' ') AS t FROM documents))
             |GROUP BY 1 ORDER BY n_occurrences DESC, bigram ASC LIMIT 20""".stripMargin)),

    // Embedding-cosine near-duplicate pairs: exact duplicates planted by
    // copying vec_id < 20 (shifted ids). All-pairs exact verification —
    // the quadratic oracle twin of the LSH scale path (x06).
    QuerySpec("x13_cosine_neardup",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val planted = emb.unionByName(
          emb.filter(col("vec_id") < 20).withColumn("vec_id", col("vec_id") + 100000L))
        Similarity.cosineNearDups(planted, 0.95)
          .select("id_a", "id_b")
          .orderBy("id_a", "id_b")
      },
      Some("""WITH u AS (
             |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings
             |  UNION ALL
             |  SELECT vec_id + 100000, list_transform(embedding, x -> CAST(x AS DOUBLE))
             |  FROM embeddings WHERE vec_id < 20)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b
             |FROM u a JOIN u b ON a.vec_id < b.vec_id
             |WHERE list_dot_product(a.v, b.v) /
             |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.95
             |ORDER BY 1, 2""".stripMargin)),

    // Multimodal frame sampling: one payload row → n deterministic frame
    // rows (explode), partitioning preserved — the shape of a real
    // per-frame decoder; frame hashes are checked for distinctness.
    QuerySpec("x14_frame_sample",
      (s, d) => {
        val docs = Multimodal.asBinary(Tables.documents(s, d).filter(col("doc_id") <= 50), "text")
        Multimodal.sampleFrames(docs, "payload", 4)
          .groupBy("doc_id")
          .agg(n.as("n_frames"),
            count_distinct(col("frame_hash")).as("n_distinct_frames"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(4 AS BIGINT) AS n_frames, CAST(4 AS BIGINT) AS n_distinct_frames
             |FROM documents WHERE doc_id <= 50 ORDER BY doc_id""".stripMargin)),

    // REAL image decode round-trip: dimensions/format picked arithmetically
    // per row, rendered into genuine PNG/JPEG bytes (javax.imageio writer),
    // then parsed back header-only by ImageMeta. The oracle recomputes the
    // same arithmetic in SQL — a wrong encoder OR decoder breaks the match.
    // (JPEG is lossy in pixels but exact in dimensions, which is what the
    // metadata decode asserts.)
    QuerySpec("x29_image_decode",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") <= 64)
        .select(col("doc_id"),
          (col("doc_id") % 32 + 16).as("w"), (col("doc_id") % 24 + 16).as("h"),
          when(col("doc_id") % 2 === 0, "png").otherwise("jpeg").as("fmt"))
        .withColumn("img", Multimodal.encodeImage(col("w"), col("h"), col("fmt")))
        .withColumn("meta", Multimodal.decodeImage(col("img")))
        .select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.channels").as("channels"),
          col("meta.format").as("format"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(doc_id % 32 + 16 AS BIGINT) AS width,
             |  CAST(doc_id % 24 + 16 AS BIGINT) AS height,
             |  CAST(3 AS BIGINT) AS channels,
             |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
             |FROM documents WHERE doc_id <= 64 ORDER BY doc_id""".stripMargin)),

    // REAL audio/video header decode round-trip (the x29 story for WAV and
    // MP4): parameters picked arithmetically per row, rendered into
    // spec-conformant RIFF/BMFF bytes (MediaExprs encoders), parsed back
    // header-only by WavMeta/Mp4Meta. The oracle recomputes the arithmetic
    // — including the derived duration_ms — in SQL; a wrong encoder OR
    // decoder on either container breaks the match. Even rows carry WAV,
    // odd rows MP4, so both parsers also prove they REJECT (null out) the
    // other container's bytes.
    QuerySpec("x50_media_decode",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") <= 64)
        .select(col("doc_id"),
          (col("doc_id") % 3 * 8000 + 8000).as("sr"),      // 8k/16k/24k Hz
          expr("doc_id % 4 DIV 2 + 1").as("nch"), // 1- and 2-channel on even ids
          (col("doc_id") % 50 * 400 + 400).as("nsamp"),
          (col("doc_id") % 64 * 16 + 320).as("vw"),
          (col("doc_id") % 36 * 16 + 240).as("vh"),
          (col("doc_id") % 90 * 1000 + 1000).as("vdur"))
        .withColumn("payload",
          when(col("doc_id") % 2 === 0,
            Multimodal.encodeWav(col("sr"), col("nch"), col("nsamp")))
          .otherwise(Multimodal.encodeMp4(col("vw"), col("vh"), col("vdur"))))
        .withColumn("wav", Multimodal.decodeWav(col("payload")))
        .withColumn("mp4", Multimodal.decodeMp4(col("payload")))
        .select(col("doc_id"),
          coalesce(col("wav.sample_rate"), lit(-1L)).as("sample_rate"),
          coalesce(col("wav.channels"), lit(-1L)).as("channels"),
          coalesce(col("wav.duration_ms"), col("mp4.duration_ms")).as("duration_ms"),
          coalesce(col("mp4.width"), lit(-1L)).as("width"),
          coalesce(col("mp4.height"), lit(-1L)).as("height"),
          coalesce(col("mp4.brand"), lit("wav")).as("container"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 3 * 8000 + 8000
             |            ELSE -1 END AS BIGINT) AS sample_rate,
             |  CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 4 // 2 + 1
             |            ELSE -1 END AS BIGINT) AS channels,
             |  CAST(CASE WHEN doc_id % 2 = 0
             |            THEN (doc_id % 50 * 400 + 400) * 1000
             |                 // (doc_id % 3 * 8000 + 8000)
             |            ELSE doc_id % 90 * 1000 + 1000 END AS BIGINT) AS duration_ms,
             |  CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 64 * 16 + 320
             |            ELSE -1 END AS BIGINT) AS width,
             |  CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 36 * 16 + 240
             |            ELSE -1 END AS BIGINT) AS height,
             |  CASE WHEN doc_id % 2 = 1 THEN 'isom' ELSE 'wav' END AS container
             |FROM documents WHERE doc_id <= 64 ORDER BY doc_id""".stripMargin)),

    // ST5 — Structured-Streaming incremental drain: the file-source
    // checkpoint gives exactly-once file handling (subsumes watermark +
    // tracker); AvailableNow drains the backlog and stops, and a second
    // drain is a no-op — totals must equal the single-shot aggregate.
    QuerySpec("st02_stream_incremental",
      (s, d) => {
        import graft.streaming.IncrementalStream
        val ev = Tables.events(s, d)
        val src = Staging.slicedSource("stream", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(ev.filter(col("event_id") % 3 === i),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_run").toString
        IncrementalStream.drain(s, s"$src/src", ev.schema, s"$tmp/chk", s"$tmp/out")(identity)
        IncrementalStream.drain(s, s"$src/src", ev.schema, s"$tmp/chk", s"$tmp/out")(identity)
        s.read.parquet(s"$tmp/out")
          .groupBy(hour(col("ts")).cast("long").as("h"))
          .agg(n.as("n_events"), sum(col("event_id")).as("id_sum"))
          .orderBy("h")
      },
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS h, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // PII redaction over documents with planted emails/phones; the oracle
    // replays the same regexes in DuckDB (character classes only, so the
    // Java and RE2 dialects agree).
    QuerySpec("x15_redact_pii",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") <= 200)
        .select(col("doc_id"),
          TextAnalysis.redactPii(concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com or 555-123-4567")))
            .as("redacted"))
        .select(col("doc_id"),
          (length(col("redacted")) - length(regexp_replace(col("redacted"), "\\[EMAIL\\]", "")))
            .cast("long").as("email_marks"),
          (length(col("redacted")) - length(regexp_replace(col("redacted"), "\\[NUM\\]", "")))
            .cast("long").as("num_marks"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(r) - len(regexp_replace(r, '\[EMAIL\]', '', 'g')) AS BIGINT) AS email_marks,
             |  CAST(len(r) - len(regexp_replace(r, '\[NUM\]', '', 'g')) AS BIGINT) AS num_marks
             |FROM (
             |  SELECT doc_id,
             |    regexp_replace(
             |      regexp_replace(text || ' contact user' || doc_id || '@example.com or 555-123-4567',
             |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |      '[0-9(][0-9 ()+.-]{7,}[0-9]', '[NUM]', 'g') AS r
             |  FROM documents WHERE doc_id <= 200)
             |ORDER BY doc_id""".stripMargin)),

    // Deterministic hash-based train/test split: md5-hex bucket per doc —
    // stable across engines/partitionings, so the oracle reproduces the
    // exact assignment (the scale-safe alternative to random sampling).
    QuerySpec("x16_hash_split",
      (s, d) => Tables.documents(s, d)
        .select(TextAnalysis.hashSplit(col("doc_id")).as("split"), col("source"))
        .groupBy("split", "source").agg(n.as("n_docs"))
        .orderBy("split", "source"),
      Some("""SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) < 205
             |            THEN 'train' ELSE 'test' END AS split,
             |       source, count(*) AS n_docs
             |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // IVF approximate NN, SERVE PATH ONLY — the second ANN scale path
    // (coarse k-means quantizer + inverted cells; nprobe cells scored
    // exactly per query). The index is a persisted artifact ([[ivfIndex]]:
    // built once per JVM into a bucketed catalog table), so the benched
    // body is exactly what runs per query batch at 100 TB: broadcast probe
    // → bucket-pruned scan (SelectedBucketsCount proof in LayoutSpec) →
    // exact scoring → O(k) top-k. Planted identical twins must return at
    // rank 1 (a twin lands in the query's own nearest cell, always probed
    // first); full recall vs brute force is x52's job (bench-excluded
    // verifier, same Registry pattern as x02/x04/x13).
    QuerySpec("x18_ann_ivf",
      (s, d) => {
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        val centroids = ivfIndex(s, d)
        Similarity.ivfTopKIndexed(s, q, ivfTable(d), centroids, 5, nprobe = 6)
          .filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // x18's RECALL VERIFIER (bench-excluded): serves the same persisted
    // index, then checks total overlap with the exact brute-force top-5 —
    // must clear 40/50 (measured 50/50 at nlist=16, nprobe=6 across
    // sf0.001/0.01/0.1 — spherical k-means, deterministic lowest-id
    // seeds). Brute force is the quadratic oracle twin, not the operator
    // we'd run at scale, so it isn't the operator we benchmark.
    QuerySpec("x52_ann_ivf_verify",
      (s, d) => {
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        val ivf = Similarity.ivfTopKIndexed(s, q, ivfTable(d), ivfIndex(s, d), 5, nprobe = 6)
        val bf = Similarity.bruteForceTopK(q, annCorpus(s, d), 5)
        val totalOverlap = ivf.select("query_id", "neighbor_id")
          .join(bf.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("__n"))
        ivf.filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .crossJoin(totalOverlap)
          .select(col("query_id"), col("top1_neighbor_id"),
            (col("__n") >= 40).cast("long").as("recall_ok"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id,
             |       CAST(1 AS BIGINT) AS recall_ok
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // Sequence packing (concat-and-chunk into fixed context windows — the
    // standard LLM pretraining layout). The distributed prefix sum behind
    // it (graft.ops.PrefixSum: bucketed two-phase cumsum) is exact, so the
    // oracle is DuckDB's global running-total window over the same token
    // counts.
    QuerySpec("x19_seq_pack",
      (s, d) => Packing.packWindows(Tables.documents(s, d), "doc_id",
          TextAnalysis.tokenCount(col("text")), ctxLen = 1024)
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |            CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
             |          FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sog
             |      FROM t)
             |SELECT doc_id, n_tokens, sog AS start_offset_global,
             |       sog // 1024 AS start_window,
             |       sog % 1024 AS start_offset,
             |       (sog + GREATEST(n_tokens, 1) - 1) // 1024 - sog // 1024 + 1 AS windows_spanned
             |FROM c ORDER BY doc_id""".stripMargin)),

    // REAL subword tokenizer, exact-count oracle: byte-level BPE (GPT-2
    // pre-tokenizer + byte alphabet + greedy merges, repo-trained vocab)
    // over fixture strings covering every pre-tokenizer branch. The counts
    // below were precomputed by an INDEPENDENT python reimplementation
    // (scripts/bpe_oracle.py over `runMain graft.BpeExport`'s merge dump)
    // — two codebases agreeing on token sequences, frozen as literals.
    QuerySpec("x30_bpe_fixture",
      (s, d) => {
        import s.implicits._
        BpeFixture.strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("fid", "text")
          .select(col("fid"), TextAnalysis.bpeCount(col("text")).as("n_tokens"))
          .orderBy("fid")
      },
      Some("""SELECT CAST(fid AS BIGINT) AS fid, CAST(n_tokens AS BIGINT) AS n_tokens
             |FROM (VALUES (0,24),(1,33),(2,25),(3,31),(4,31),(5,30),(6,6),(7,1),
             |             (8,0),(9,41),(10,22),(11,28)) AS t(fid, n_tokens)
             |ORDER BY fid""".stripMargin)),

    // PUBLISHED-vocab BPE: the x30 fixture tokenized through a vocabulary
    // LOADED from the GPT-2 file formats (`vocab.bpe` merges text +
    // `encoder.json` token→id map — frozen 100-merge fixture files under
    // src/main/resources/graft/bpe/, parsed by Bpe.vocabFromPublished with
    // a hand-rolled escape-aware scanner). Output pins BOTH halves of the
    // loader: n_tokens proves the merge table drove tokenization (counts
    // differ from x30's default-vocab numbers), id_sum proves the tokens
    // routed through the encoder map. VALUES precomputed independently by
    // scripts/bpe_vocab_oracle.py (python json/split parsers + the
    // bpe_oracle.py reimplementation).
    QuerySpec("x51_bpe_vocab_file",
      (s, d) => {
        import s.implicits._
        val vocab = graft.functions.Bpe.fixtureVocab
        BpeFixture.strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("fid", "text")
          .select(col("fid"),
            graft.functions.GraftBpe.bpeIdsWith(col("text"), vocab).as("ids"))
          .select(col("fid"), size(col("ids")).cast("long").as("n_tokens"),
            aggregate(col("ids"), lit(0L), (acc, x) => acc + x).as("id_sum"))
          .orderBy("fid")
      },
      Some("""SELECT CAST(fid AS BIGINT) AS fid, CAST(n AS BIGINT) AS n_tokens,
             |       CAST(ids AS BIGINT) AS id_sum
             |FROM (VALUES (0,26,5296),(1,35,6061),(2,27,4196),(3,32,4091),
             |             (4,31,5004),(5,33,4390),(6,7,1714),(7,1,97),(8,0,0),
             |             (9,42,7728),(10,22,3166),(11,29,4572)) AS t(fid, n, ids)
             |ORDER BY fid""".stripMargin)),

    // BPE losslessness on REAL data: byte-level BPE partitions the input
    // bytes, so detok(tokens) must equal the text char-exactly for every
    // document, and the count must sit inside the byte bounds
    // (ceil(n_bytes/maxTokenLen) <= n_tokens <= n_bytes). The oracle states
    // those invariants; the exact merge behavior is pinned by x30.
    QuerySpec("x31_bpe_roundtrip",
      (s, d) => {
        val maxTok = graft.functions.Bpe.defaultMaxTokenLen
        Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"),
            TextAnalysis.bpeTokens(col("text")).as("toks"))
          .select(col("doc_id"),
            length(col("text").cast("binary")).cast("long").as("n_bytes"),
            (TextAnalysis.bpeDetok(col("toks")) === col("text"))
              .cast("long").as("roundtrip_ok"),
            (size(col("toks")).cast("long") <= length(col("text").cast("binary")) &&
             size(col("toks")).cast("long") * maxTok >= length(col("text").cast("binary")))
              .cast("long").as("bounds_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CAST(1 AS BIGINT) AS roundtrip_ok, CAST(1 AS BIGINT) AS bounds_ok
             |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin)),

    // x19's real-tokens variant: sequence packing driven by REAL BPE counts
    // instead of the whitespace proxy. The oracle can't run BPE, so the
    // packing coordinates are cross-checked IN-PLAN against a global-window
    // prefix sum (the quarantined verifier shape — production path is the
    // bucketed PrefixSum being verified) and the oracle asserts the
    // invariants; the counts themselves are pinned by x30/x31.
    QuerySpec("x32_pack_bpe",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val packed = Packing.packWindows(Tables.documents(s, d), "doc_id",
          TextAnalysis.bpeCount(col("text")), ctxLen = 1024)
        val w = Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        packed
          .withColumn("__chk", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .select(col("doc_id"),
            (col("windows_spanned") >= 1L).cast("long").as("windows_ok"),
            (col("start_offset") >= 0L && col("start_offset") < 1024L)
              .cast("long").as("offset_ok"),
            (col("start_offset_global") === col("__chk")).cast("long").as("prefix_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(1 AS BIGINT) AS windows_ok,
             |  CAST(1 AS BIGINT) AS offset_ok, CAST(1 AS BIGINT) AS prefix_ok
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination (GPT-3-style k-gram overlap): every 50th
    // doc plays the benchmark; docs sharing any 5-gram with it are flagged
    // with exact hit counts. Broadcast benchmark grams — no corpus shuffle
    // before the per-doc aggregation. Oracle rebuilds the same 5-grams
    // with DuckDB list ops (the x12 bigram pattern generalized).
    QuerySpec("x33_contamination",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bench = docs.filter(col("doc_id") % 50 === 0)
        graft.ext.Contamination.contaminatedDocs(docs, col("doc_id"), col("text"),
            bench, col("text"), k = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
             |g AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
             |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS gram
             |      FROM t),
             |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
             |SELECT doc_id, count(*) AS n_hits, count(DISTINCT gram) AS n_grams
             |FROM g JOIN b USING (gram)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Incremental dedup vs history through a Bloom filter (exact mode):
    // incoming = every doc re-ingested, odd ids modified (genuinely new).
    // The bloom passes definitely-new rows with NO join; only might-contain
    // candidates reach the exact anti-join — result must be bit-identical
    // to the plain anti-join the oracle computes.
    QuerySpec("x34_bloom_dedup",
      (s, d) => {
        val history = Tables.documents(s, d).select(md5(col("text").cast("binary")).as("digest"))
        val incoming = Tables.documents(s, d).select(
            (col("doc_id") + 1000000L).as("doc_id"),
            when(col("doc_id") % 2 === 1, concat(col("text"), lit(" fresh-variant")))
              .otherwise(col("text")).as("text"))
          .withColumn("digest", md5(col("text").cast("binary")))
        val bloom = graft.ext.BloomDedup.historyBloom(history, "digest",
          expectedItems = 100000L)
        graft.ext.BloomDedup.antiJoinExact(incoming, history, "digest", bloom)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH hist AS (SELECT md5(text) AS digest FROM documents),
             |inc AS (SELECT doc_id + 1000000 AS doc_id,
             |               CASE WHEN doc_id % 2 = 1 THEN text || ' fresh-variant' ELSE text END AS text
             |        FROM documents)
             |SELECT doc_id FROM inc
             |WHERE md5(text) NOT IN (SELECT digest FROM hist)
             |ORDER BY doc_id""".stripMargin)),

    // The composed corpus-cleaning chain (FineWeb/Gopher-style): language →
    // quality → repetition → length → content dedup over the duplicated
    // corpus, with per-stage accounting riding as observe() metrics — ONE
    // action flushes all six stage counts. Output is the accounting table;
    // the oracle recomputes every stage's surviving count by composing the
    // x07/x08/x24 predicate SQL.
    QuerySpec("x35_corpus_filter",
      (s, d) => {
        import s.implicits._
        val filtered = graft.ext.CorpusFilter(dupCorpus(s, d), col("doc_id"), col("text"))
        filtered.df.agg(count(lit(1))).collect() // flush all stage observations
        filtered.counts.toDF("stage", "n_rows").orderBy("stage")
      },
      Some(s"""WITH u AS ($dupCorpusSql),
             |t AS (SELECT doc_id AS id, text, string_split(lower(text), ' ') AS tk FROM u),
             |f AS (SELECT id, text, len(text) AS n_chars,
             |        CASE WHEN len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))) >=
             |                  greatest(len(list_filter(tk, x -> x IN ('the','a','of','and','is'))),
             |                           len(list_filter(tk, x -> x IN ('el','los','las','es','y'))),
             |                           len(list_filter(tk, x -> x IN ('le','les','est','et','une'))),
             |                           len(list_filter(tk, x -> x IN ('的','是','了','在','和')))) THEN 'de'
             |             WHEN len(list_filter(tk, x -> x IN ('the','a','of','and','is'))) >=
             |                  greatest(len(list_filter(tk, x -> x IN ('el','los','las','es','y'))),
             |                           len(list_filter(tk, x -> x IN ('le','les','est','et','une'))),
             |                           len(list_filter(tk, x -> x IN ('的','是','了','在','和')))) THEN 'en'
             |             WHEN len(list_filter(tk, x -> x IN ('el','los','las','es','y'))) >=
             |                  greatest(len(list_filter(tk, x -> x IN ('le','les','est','et','une'))),
             |                           len(list_filter(tk, x -> x IN ('的','是','了','在','和')))) THEN 'es'
             |             WHEN len(list_filter(tk, x -> x IN ('le','les','est','et','une'))) >=
             |                  len(list_filter(tk, x -> x IN ('的','是','了','在','和'))) THEN 'fr'
             |             ELSE 'zh' END AS predicted,
             |        round(least(len(tk) * 1.0 / 100, 1.0) * 0.4
             |            + (len(list_distinct(tk)) * 1.0 / len(tk)) * 0.3
             |            + (len(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 / len(text)) * 0.3, 3) AS quality,
             |        CASE WHEN len(tk) - 2 <= 0 THEN 0.0
             |             ELSE round(1.0 - len(list_distinct(list_transform(range(1, len(tk) - 1),
             |                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) * 1.0 /
             |                  (len(tk) - 2), 4) END AS rep3
             |      FROM t),
             |p1 AS (SELECT * FROM f  WHERE predicted = 'en'),
             |p2 AS (SELECT * FROM p1 WHERE quality >= 0.5),
             |p3 AS (SELECT * FROM p2 WHERE rep3 <= 0.2),
             |p4 AS (SELECT * FROM p3 WHERE n_chars BETWEEN 100 AND 20000),
             |counted AS (
             |  SELECT '0_input' AS stage, count(*) AS n_rows FROM f UNION ALL
             |  SELECT '1_lang', count(*) FROM p1 UNION ALL
             |  SELECT '2_quality', count(*) FROM p2 UNION ALL
             |  SELECT '3_repetition', count(*) FROM p3 UNION ALL
             |  SELECT '4_length', count(*) FROM p4 UNION ALL
             |  SELECT '5_dedup', count(DISTINCT text) FROM p4)
             |SELECT stage, n_rows FROM counted ORDER BY stage""".stripMargin)),

    // Near-dup GROUPS: pairwise MinHash-LSH hits → connected components
    // (hash-min label propagation) → canonical doc per group. The oracle
    // recomputes the exact-Jaccard pair graph and its components with a
    // recursive CTE (min reachable id per node).
    QuerySpec("x20_dedup_groups",
      (s, d) => {
        val corpus = nearDupCorpus(s, d)
        val pairs = TextDedup.minhashNearDups(corpus, col("doc_id"), col("text"),
          k = 3, numHashes = 64, rowsPerBand = 2, threshold = 0.8)
        TextDedup.connectedComponents(corpus, col("doc_id"), pairs)
          .select(col("node").as("doc_id"), col("comp").as("group_id"),
            (col("node") === col("comp")).cast("long").as("is_canonical"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $neardupPairsCtes,
              |edges AS (SELECT id_a AS eu, id_b AS ev FROM pairs
              |          UNION SELECT id_b, id_a FROM pairs),
              |reach(node, r) AS (
              |  SELECT doc_id, doc_id FROM u
              |  UNION
              |  SELECT e.ev, reach.r FROM reach JOIN edges e ON e.eu = reach.node)
              |SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS group_id,
              |       CAST(node = MIN(r) AS BIGINT) AS is_canonical
              |FROM reach GROUP BY node ORDER BY 1""".stripMargin)),

    // Line-level boilerplate removal: a "subscribe" line is injected into
    // every 10th doc, so it occurs in ~10% of docs and minDocs=3 must strip
    // it EXACTLY — and nothing else (measured: no organic line is shared by
    // ≥3 docs at any SF; max is 2). The trivial oracle is therefore a
    // complete char-exact check: every clean_text must equal the
    // pre-injection text, which also proves the split/rejoin is lossless.
    QuerySpec("x23_line_dedup",
      (s, d) => {
        val planted = Tables.documents(s, d).withColumn("text",
          when(col("doc_id") % 10 === 0,
            concat(col("text"), lit(". Subscribe to our newsletter for daily updates")))
            .otherwise(col("text")))
        TextDedup.dedupLines(planted, col("doc_id"), col("text"), minDocs = 3)
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, text AS clean_text FROM documents ORDER BY doc_id")),

    // Deterministic data mixing: per-language downsampling quotas as a
    // pure md5-bucket filter (en halved harder than the rest) — stable
    // across runs/engines, no sampling RNG.
    QuerySpec("x21_stratified_sample",
      (s, d) => Curation.stratifiedSample(Tables.documents(s, d),
          col("lang"), col("doc_id"), Map("en" -> 64), defaultQuota = 192)
        .groupBy("lang").agg(n.as("n_docs"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs FROM documents
             |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
             |      < CASE WHEN lang = 'en' THEN 64 ELSE 192 END
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-language quality top-n curation via the bounded top-k aggregate
    // (same quality formula x08 proved bit-exact cross-engine).
    QuerySpec("x22_quality_topn",
      (s, d) => Curation.topNPerGroup(Tables.documents(s, d),
          col("lang"), TextAnalysis.qualityScore(col("text")), col("doc_id"), nTop = 10)
        .select(col("group").as("lang"), col("rk"),
          col("id").as("doc_id"), col("score").as("quality"))
        .orderBy("lang", "rk"),
      Some("""WITH q AS (
             |  SELECT doc_id, lang,
             |    round(least(len(string_split(lower(text), ' ')) * 1.0 / 100, 1.0) * 0.4
             |      + (len(list_distinct(string_split(lower(text), ' '))) * 1.0
             |         / len(string_split(lower(text), ' '))) * 0.3
             |      + (len(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0
             |         / len(text)) * 0.3, 3) AS quality
             |  FROM documents)
             |SELECT lang,
             |       CAST(row_number() OVER (PARTITION BY lang
             |                               ORDER BY quality DESC, doc_id) AS BIGINT) AS rk,
             |       doc_id, quality
             |FROM q
             |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) <= 10
             |ORDER BY lang, rk""".stripMargin)),

    // Repetition-ratio quality signal (Gopher-style duplicate-trigram
    // fraction). A 10×-repeated phrase is stuffed into every 20th doc:
    // planted rep3 ≥ ~0.29 (worst case: the longest 100-token doc),
    // organic max is 0.077 (measured across SFs) — threshold 0.15 has ≥2×
    // margin both ways, so the flag column is deterministic.
    QuerySpec("x24_repetition",
      (s, d) => Tables.documents(s, d)
        .withColumn("text",
          when(col("doc_id") % 20 === 0,
            concat(col("text"), repeat(lit(" click here to win now"), 10)))
            .otherwise(col("text")))
        .select(col("doc_id"),
          TextAnalysis.repetitionRatio(col("text"), 3).as("rep3"))
        .withColumn("is_repetitive", (col("rep3") > 0.15).cast("long"))
        .orderBy("doc_id"),
      Some("""WITH u AS (SELECT doc_id,
             |            CASE WHEN doc_id % 20 = 0
             |                 THEN text || repeat(' click here to win now', 10)
             |                 ELSE text END AS text
             |          FROM documents),
             |g AS (SELECT doc_id, list_transform(range(1, len(t) - 1),
             |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g
             |      FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM u)),
             |r AS (SELECT doc_id,
             |        CASE WHEN len(g) <= 0 THEN 0.0
             |             ELSE round(1.0 - len(list_distinct(g)) * 1.0 / len(g), 4) END AS rep3
             |      FROM g)
             |SELECT doc_id, rep3, CAST(rep3 > 0.15 AS BIGINT) AS is_repetitive
             |FROM r ORDER BY doc_id""".stripMargin)),

    // Embedding outlier detection: each label group's centroid, then rows
    // whose cosine to their own centroid is far negative. Planted: one
    // NEGATED CENTROID per label (sim ≈ −1); organic minimum is −0.38
    // (measured) — threshold −0.7 splits them with ≥0.3 margin on both
    // sides, so ulp-level centroid differences between engines can't flip
    // the detected set, which the oracle enumerates exactly.
    QuerySpec("x25_embedding_outliers",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"), Similarity.toDouble(col("embedding")).as("embedding"))
        val planted = Similarity.groupCentroids(emb, col("label"), col("embedding"))
          .select((lit(20000L) + col("group").cast("long")).as("vec_id"),
            col("group").as("label"),
            transform(col("centroid"), x => -x).as("embedding"))
        Similarity.centroidOutliers(emb.unionByName(planted),
            col("label"), col("vec_id"), col("embedding"), threshold = -0.7)
          .select(col("group").cast("long").as("label"), col("id").as("outlier_id"))
          .orderBy("label", "outlier_id")
      },
      Some("""SELECT DISTINCT CAST(label AS BIGINT) AS label,
             |       20000 + CAST(label AS BIGINT) AS outlier_id
             |FROM embeddings ORDER BY 1, 2""".stripMargin)),

    // Format round-trip: documents → JSONL and ORC sinks → schema-enforced
    // re-read → identical per-source aggregates. The oracle computes the
    // same aggregates straight from the parquet table, so any loss or
    // corruption in either format path (string escaping, type widening)
    // breaks the hash.
    QuerySpec("x26_format_roundtrip",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // one dir per Spark app, overwritten on re-runs within the app: no
        // per-invocation leak, and the applicationId component keeps two
        // concurrent JVMs (e.g. parallel Verify at two SFs) from clobbering
        // each other's files mid-read
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_fmt_${s.sparkContext.applicationId}"
        graft.io.Sinks.jsonl(docs, s"$tmp/docs_jsonl")
        graft.io.Sinks.orc(docs, s"$tmp/docs_orc")
        val back = graft.io.Sources.jsonl(s, docs.schema, s"$tmp/docs_jsonl")
          .withColumn("fmt", lit("jsonl"))
          .unionByName(graft.io.Sources.orc(s, s"$tmp/docs_orc")
            .withColumn("fmt", lit("orc")))
        back.groupBy("fmt", "source")
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"),
            sum(length(col("text"))).cast("long").as("total_text_len"))
          .orderBy("fmt", "source")
      },
      Some("""SELECT fmt, source, count(*) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |       CAST(sum(len(text)) AS BIGINT) AS total_text_len
             |FROM documents
             |CROSS JOIN (SELECT unnest(['jsonl', 'orc']) AS fmt)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Heavy hitters over the token stream via Misra-Gries sketch + exact
    // verification of the ≤k candidates. The threshold is SHARE-BASED
    // (count ≥ 0.2% of the stream, floored at 1000 — the classic φ-HH
    // definition): with k=999 the exactness bound needs threshold >
    // n/(k+1) = 0.1%·n, and a share cut satisfies that at EVERY scale
    // factor where a fixed absolute cut stops qualifying once n grows
    // past minCount×(k+1) (the sf1 scaling run caught exactly that).
    // A planted token (3 per doc) guarantees non-empty output at every SF.
    QuerySpec("x27_heavy_hitters",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .withColumn("text", concat(col("text"), repeat(lit(" graftheavytoken"), 3)))
          .select(explode(graft.ext.TextDedup.tokens(col("text"))).as("token"))
        // persistItems: sketch + exact-verify passes run off ONE tokenized
        // frame instead of re-exploding the corpus (tokenize is the
        // dominant cost of this stream at this scale)
        Curation.heavyHitters(toks, col("token"), k = 999, minCount = 1000L,
            persistItems = true, minShare = Some(0.002))
          .withColumnRenamed("item", "token")
          .orderBy("token")
      },
      Some("""WITH u AS (SELECT text || repeat(' graftheavytoken', 3) AS text FROM documents),
             |tok AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM u),
             |tot AS (SELECT greatest(1000, CAST(ceil(count(*) * 0.002) AS BIGINT)) AS cut
             |        FROM tok)
             |SELECT token, count(*) AS n_occurrences
             |FROM tok GROUP BY 1 HAVING count(*) >= (SELECT cut FROM tot)
             |ORDER BY 1""".stripMargin)),

    // Sliding-window chunking (32-token chunks, stride 16 → 50% overlap),
    // char-exact against DuckDB's list slicing — catches off-by-ones in
    // start positions, end clamping, and join spacing.
    QuerySpec("x28_chunking",
      (s, d) => Packing.chunkTokens(Tables.documents(s, d), "doc_id", col("text"),
          chunkSize = 32, stride = 16)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
             |            CASE WHEN len(string_split(text, ' ')) <= 32 THEN 0
             |                 ELSE ((len(string_split(text, ' ')) - 32 + 15) // 16) * 16
             |            END AS last_start
             |          FROM documents),
             |s AS (SELECT doc_id, tk, unnest(range(0, last_start + 1, 16)) AS cs FROM t)
             |SELECT doc_id, cs // 16 AS chunk_idx,
             |       CAST(len(tk[cs+1:cs+32]) AS BIGINT) AS n_chunk_tokens,
             |       array_to_string(tk[cs+1:cs+32], ' ') AS chunk_text
             |FROM s ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Backward as-of join (absent in the reference and in Spark itself):
    // each purchase matched to the user's latest view at-or-before it.
    // Union+window formulation — one key shuffle, no range-join explosion.
    // DuckDB verifies with its native ASOF JOIN.
    QuerySpec("x17_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
        graft.ops.Temporal.asofBackward(purchases, views,
            key = "user_id", leftTime = "ts", rightTime = "view_ts",
            payload = Seq("view_id"), tieBreak = col("view_id"))
          .select(col("event_id"), coalesce(col("view_id"), lit(-1L)).as("view_id"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, coalesce(r.event_id, -1) AS view_id
             |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
             |      FROM events WHERE event_type = 'purchase') l
             |ASOF LEFT JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
             |                FROM events WHERE event_type = 'view') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    // Gap-based sessionization (absent in the reference; the canonical
    // stateful operator at pipeline scale). Batch shape: lag + running sum
    // over a per-key window — one shuffle; oracle = the same windows in SQL.
    QuerySpec("st03_sessionize",
      (s, d) => {
        import graft.streaming.Sessionize
        Sessionize.sessionSummary(Tables.events(s, d), "user_id", "ts", gapSeconds = 3600)
          .groupBy("user_id")
          .agg(n.as("n_sessions"), sum(col("n_events")).as("n_events"),
            max(col("n_events")).as("max_session_events"))
          .orderBy("user_id")
      },
      Some("""WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |s AS (SELECT user_id, ts,
             |        CASE WHEN lag(ts) OVER w IS NULL THEN 1
             |             WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000 THEN 1
             |             ELSE 0 END AS news
             |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |g AS (SELECT user_id, ts,
             |        sum(news) OVER (PARTITION BY user_id ORDER BY ts
             |                        ROWS UNBOUNDED PRECEDING) - 1 AS sid FROM s),
             |sess AS (SELECT user_id, sid, count(*) AS n FROM g GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
             |       CAST(max(n) AS BIGINT) AS max_session_events
             |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ST1/ST2 — incremental batch processing with watermark + tracker:
    // 3 file batches, run twice (idempotency) — totals must equal the
    // single-shot aggregation, which is exactly what the oracle computes.
    QuerySpec("st01_incremental",
      (s, d) => {
        val ev = Tables.events(s, d)
        val src = Staging.slicedSource("inc", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(ev.filter(col("event_id") % 3 === i),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_inc_run").toString
        Incremental.run(s, s"$src/src", s"$tmp/state", s"$tmp/out")(identity)
        Incremental.run(s, s"$src/src", s"$tmp/state", s"$tmp/out")(identity) // no-op rerun
        s.read.parquet(s"$tmp/out")
          .groupBy(hour(col("ts")).cast("long").as("h"))
          .agg(n.as("n_events"), sum(col("event_id")).as("id_sum"))
          .orderBy("h")
      },
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS h, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Grid-bucketed interval (range) join: each click event paired with
    // every same-user purchase window [ts, ts+6h) containing it. The grid
    // shape (intervals replicated per 1h cell, points mapped to their one
    // cell) turns the range predicate into a shuffle EQUI-join on
    // (user, cell) — the oracle is DuckDB's native inequality join.
    QuerySpec("x36_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val points = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val intervals = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("iv_id"), col("user_id"),
            col("ts").as("s"), (col("ts") + expr("INTERVAL 6 HOURS")).as("e"))
        graft.ops.Temporal.rangeJoin(points, "ts", intervals, "s", "e",
            keys = Seq("user_id"), cellMicros = 3600L * 1000000L)
          .select("event_id", "iv_id")
          .orderBy("event_id", "iv_id")
      },
      Some("""WITH iv AS (SELECT event_id AS iv_id, user_id, CAST(ts AS TIMESTAMP) AS s,
             |                   CAST(ts AS TIMESTAMP) + INTERVAL 6 HOUR AS e
             |            FROM events WHERE event_type = 'purchase'),
             |p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |      FROM events WHERE event_type = 'click')
             |SELECT p.event_id, iv.iv_id
             |FROM p JOIN iv ON p.user_id = iv.user_id AND p.ts >= iv.s AND p.ts < iv.e
             |ORDER BY 1, 2""".stripMargin)),

    // TF-IDF keyword extraction: smoothed tf×idf over the whole corpus,
    // top-5 terms per doc via the bounded-heap aggregate (no per-doc
    // window over the full vocabulary). Ranking runs on the ROUNDED score
    // in both engines, so float ulps can't reorder the cut.
    QuerySpec("x37_tfidf",
      (s, d) => graft.ext.Tfidf.topKeywords(Tables.documents(s, d),
          col("doc_id"), col("text"), nTop = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rk"),
      Some("""WITH t AS (SELECT doc_id,
             |                  unnest(regexp_split_to_array(lower(text), '\s+')) AS term
             |           FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
             |       WHERE term <> '' GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |nd AS (SELECT count(*) AS n FROM documents),
             |sc AS (SELECT doc_id, term,
             |              round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf
             |       FROM tf JOIN df USING (term), nd)
             |SELECT doc_id,
             |       CAST(row_number() OVER (PARTITION BY doc_id
             |                               ORDER BY tfidf DESC, term) AS BIGINT) AS rk,
             |       term, tfidf
             |FROM sc
             |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) <= 5
             |ORDER BY doc_id, rk""".stripMargin)),

    // SCD1 upsert (MERGE semantics): every 3rd customer's balance bumped
    // and segment rewritten, every 10th re-inserted under a new key; the
    // update batch's KEY SET broadcasts so the target is never shuffled.
    // Balances emitted in fixed-point cents (Det convention).
    QuerySpec("x38_upsert",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val updates = cust.filter(col("c_custkey") % 3 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
          .withColumn("c_mktsegment", lit("UPDATED"))
          .unionByName(cust.filter(col("c_custkey") % 10 === 0)
            .withColumn("c_custkey", col("c_custkey") + 1000000L))
        graft.ops.Upsert.merge(cust, updates, Seq("c_custkey"))
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100, 0).cast("long").as("acctbal_cents"),
            col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""WITH upd AS (
             |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
             |         'UPDATED' AS c_mktsegment
             |  FROM customer WHERE c_custkey % 3 = 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 10 = 0),
             |merged AS (
             |  SELECT * FROM upd
             |  UNION ALL
             |  SELECT * FROM customer
             |  WHERE c_custkey NOT IN (SELECT c_custkey FROM upd))
             |SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
             |       c_mktsegment
             |FROM merged ORDER BY c_custkey""".stripMargin)),

    // ST — event-time tumbling windows under a REAL multi-batch stream:
    // three chronological file slices drained one per trigger
    // (AvailableNow), so the watermark genuinely advances between batches;
    // a sentinel row past the data range pushes the final watermark over
    // every real window so append mode emits them all. Values ride as
    // fixed-point cents (long state — streaming sum order can't wobble a
    // double). The oracle is the plain batch hourly aggregation: a correct
    // watermark implementation must produce EXACTLY it.
    QuerySpec("st05_stream_window",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("ts"),
          round(col("value") * 100, 0).cast("long").as("value"))
        val maxTs = ev.agg(max(col("ts"))).first().getTimestamp(0)
        val src = Staging.slicedSource("sw", d) { tmp =>
          // chronological slices → later batches are never behind the watermark
          Seq(dayofmonth(col("ts")) <= 10,
              dayofmonth(col("ts")).between(11, 20),
              dayofmonth(col("ts")) > 20).zipWithIndex.foreach { case (p, i) =>
            Staging.writeSlice(ev.filter(p), s"$tmp/src/slice$i")
          }
          import s.implicits._
          Seq((new java.sql.Timestamp(maxTs.getTime + 12 * 3600 * 1000L), 0L))
            .toDF("ts", "value").coalesce(1).write.mode("overwrite").parquet(s"$tmp/src/slice3_flush")
          Seq("slice0", "slice1", "slice2", "slice3_flush")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_sw_run").toString
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.IncrementalStream.windowedCounts(
              s.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true").parquet(s"$src/src"),
              "ts", "1 hour", lateness = "1 hour")
            .writeStream.format("parquet")
            .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.read.parquet(s"$tmp/out")
          .filter(col("window.start") <= maxTs) // drop the sentinel's window
          .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("h"),
            col("n").as("n_events"), col("total_value").as("total_cents"))
          .orderBy("h")
      },
      Some("""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H') AS h,
             |       count(*) AS n_events,
             |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ST — exactly-once ROWS under a real stream: every 5th event arrives
    // duplicated inside its batch; dropDuplicatesWithinWatermark must
    // restore the unique source exactly (event_id is unique in `events`,
    // so the oracle is the plain batch hourly aggregation — any surviving
    // dup or dropped original shifts a count/id-sum). Rows emit
    // immediately in append mode; the watermark only bounds dedup state,
    // so chronological slices keep every duplicate inside the horizon.
    QuerySpec("st06_stream_dedup",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_id"), col("ts"))
        val src = Staging.slicedSource("sd", d) { tmp =>
          Seq(dayofmonth(col("ts")) <= 10,
              dayofmonth(col("ts")).between(11, 20),
              dayofmonth(col("ts")) > 20).zipWithIndex.foreach { case (p, i) =>
            val slice = ev.filter(p)
            Staging.writeSlice(
              slice.unionByName(slice.filter(col("event_id") % 5 === 0)),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_sd_run").toString
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.IncrementalStream.dedupedStream(
              s.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true").parquet(s"$src/src"),
              Seq("event_id"), "ts", lateness = "1 hour")
            .writeStream.format("parquet")
            .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.read.parquet(s"$tmp/out")
          .groupBy(hour(col("ts")).cast("long").as("h"))
          .agg(n.as("n_events"), sum(col("event_id")).as("id_sum"))
          .orderBy("h")
      },
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS h, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Incremental near-dup at ingest: a new batch (every 25th doc
    // re-arriving with a tail = near-dup of history; every 25th+5 doc
    // char-reversed = genuinely new) LSH-checked against the full corpus
    // as history. Band join is cross-set only — never a self-join of
    // history ∪ batch. The oracle recomputes the exact cross Jaccard.
    QuerySpec("x39_incremental_neardup",
      (s, d) => {
        val hist = Tables.documents(s, d)
        val incoming = hist.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" graft dedup probe tail")).as("text"))
          .unionByName(hist.filter(col("doc_id") % 25 === 5)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              reverse(col("text")).as("text")))
        TextDedup.minhashNearDupsAgainst(incoming, col("doc_id"), col("text"),
            hist, col("doc_id"), col("text"),
            k = 3, numHashes = 64, rowsPerBand = 2, threshold = 0.8)
          .orderBy("new_id", "hist_id")
      },
      Some("""WITH inc AS (
             |  SELECT doc_id + 1000000 AS doc_id, text || ' graft dedup probe tail' AS text
             |  FROM documents WHERE doc_id % 25 = 0
             |  UNION ALL
             |  SELECT doc_id + 2000000, reverse(text) FROM documents WHERE doc_id % 25 = 5),
             |ish AS (SELECT doc_id, list_distinct(list_transform(
             |          range(1, len(string_split(lower(text), ' ')) - 1),
             |          i -> string_split(lower(text), ' ')[i] || ' ' ||
             |               string_split(lower(text), ' ')[i+1] || ' ' ||
             |               string_split(lower(text), ' ')[i+2])) AS s
             |        FROM inc),
             |hsh AS (SELECT doc_id, list_distinct(list_transform(
             |          range(1, len(string_split(lower(text), ' ')) - 1),
             |          i -> string_split(lower(text), ' ')[i] || ' ' ||
             |               string_split(lower(text), ' ')[i+1] || ' ' ||
             |               string_split(lower(text), ' ')[i+2])) AS s
             |        FROM documents)
             |SELECT i.doc_id AS new_id, h.doc_id AS hist_id,
             |       len(list_intersect(i.s, h.s)) / len(list_distinct(list_concat(i.s, h.s))) AS jacc
             |FROM ish i JOIN hsh h
             |  ON len(list_intersect(i.s, h.s)) / len(list_distinct(list_concat(i.s, h.s))) >= 0.8
             |ORDER BY 1, 2""".stripMargin)),

    // Corpus drift gate: per-language PSI between the corpus and a skewed
    // snapshot (half the English docs dropped). Two aggregations + a
    // bucket-table join — the snapshots never join row-to-row. Ratios are
    // rounded BEFORE the log in both engines so the ln() inputs are
    // bit-identical.
    QuerySpec("x40_drift_psi",
      (s, d) => {
        val ref = Tables.documents(s, d)
        val newer = ref.filter(!(col("lang") === "en" && col("doc_id") % 2 === 0))
        graft.ext.Drift.psiByBucket(ref, newer, col("lang"))
          .orderBy("bucket")
      },
      Some("""WITH refc AS (SELECT lang AS bucket, count(*) AS c FROM documents GROUP BY 1),
             |refd AS (SELECT bucket, round(c * 1.0 / (SELECT sum(c) FROM refc), 6) AS p_ref
             |         FROM refc),
             |newc AS (SELECT lang AS bucket, count(*) AS c FROM documents
             |         WHERE NOT (lang = 'en' AND doc_id % 2 = 0) GROUP BY 1),
             |newd AS (SELECT bucket, round(c * 1.0 / (SELECT sum(c) FROM newc), 6) AS p_new
             |         FROM newc),
             |j AS (SELECT coalesce(r.bucket, n.bucket) AS bucket,
             |             coalesce(p_ref, 0.0) AS p_ref, coalesce(p_new, 0.0) AS p_new
             |      FROM refd r FULL OUTER JOIN newd n ON r.bucket = n.bucket)
             |SELECT bucket, p_ref, p_new,
             |       round((greatest(p_new, 0.0001) - greatest(p_ref, 0.0001)) *
             |             ln(greatest(p_new, 0.0001) / greatest(p_ref, 0.0001)), 6) AS psi_term
             |FROM j ORDER BY bucket""".stripMargin)),

    // Product-quantized ANN, SERVE PATH ONLY: 16 codebooks over 4-dim
    // subspaces compress each vector to 16 small ints (16 B as bytes vs
    // 512 B raw); the ADC first pass scans the PERSISTED code table
    // ([[pqArtifacts]]: codebooks trained + corpus encoded once per JVM —
    // production's offline artifacts), then top-80 candidates re-rank
    // exactly. Each query's planted identical twin must return at rank 1
    // (exact rerank puts sim=1.0 first); full recall vs brute force is
    // x53's job (bench-excluded verifier).
    QuerySpec("x41_pq_ann",
      (s, d) => {
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        val (codebooks, codesPath) = pqArtifacts(s, d)
        Similarity.pqTopKFromCodes(q, s.read.parquet(codesPath), annCorpus(s, d),
            5, codebooks, rerank = 16)
          .filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // x41's RECALL VERIFIER (bench-excluded): same persisted PQ artifacts,
    // total overlap with the exact brute-force top-5 must clear 40/50
    // (measured 45-49 across sf0.001/0.01/0.1 — these embeddings are
    // near-random, PQ's worst case; clustered real embeddings quantize far
    // better).
    QuerySpec("x53_pq_ann_verify",
      (s, d) => {
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        val corpus = annCorpus(s, d)
        val (codebooks, codesPath) = pqArtifacts(s, d)
        val pq = Similarity.pqTopKFromCodes(q, s.read.parquet(codesPath), corpus,
          5, codebooks, rerank = 16)
        val bf = Similarity.bruteForceTopK(q, corpus, 5)
        val totalOverlap = pq.select("query_id", "neighbor_id")
          .join(bf.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("__n"))
        pq.filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .crossJoin(totalOverlap)
          .select(col("query_id"), col("top1_neighbor_id"),
            (col("__n") >= 40).cast("long").as("recall_ok"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id,
             |       CAST(1 AS BIGINT) AS recall_ok
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // Temperature-scaled mixing (α = 0.5): quotas derived from exact group
    // counts flatten language shares toward n^α; sampling stays the
    // deterministic md5-bucket filter. Output pins both halves — the
    // computed quota per language and the rows it actually keeps.
    QuerySpec("x42_temperature_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val quotas = Curation.temperatureQuotas(docs, col("lang"), alpha = 0.5)
        docs.join(broadcast(quotas), docs("lang") === quotas("group"))
          .filter(TextAnalysis.hashBucket16(col("doc_id")) < col("quota"))
          .groupBy(col("lang"), col("quota"))
          .agg(n.as("n_kept"))
          .orderBy("lang")
      },
      Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
             |r AS (SELECT max(pow(n, -0.5)) AS rmax FROM c),
             |qt AS (SELECT lang, CAST(greatest(round(round(pow(n, -0.5) / rmax, 6) * 65536), 1) AS BIGINT) AS quota
             |       FROM c, r)
             |SELECT d.lang, qt.quota, count(*) AS n_kept
             |FROM documents d JOIN qt USING (lang)
             |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) < quota
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin)),

    // Snapshot reconciliation: customer vs a mutated next dump (every 7th
    // balance bumped, every 13th record dropped, every 11th re-keyed as
    // new). One full-outer join on the key; per-status counts and key
    // sums pin both the classification and its membership.
    QuerySpec("x43_snapshot_diff",
      (s, d) => {
        val before = Tables.customer(s, d)
        val after = before.filter(col("c_custkey") % 13 =!= 0)
          .select(col("c_custkey"),
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + 5.0)
              .otherwise(col("c_acctbal")).as("c_acctbal"),
            col("c_mktsegment"))
          .unionByName(before.filter(col("c_custkey") % 11 === 0)
            .select((col("c_custkey") + 3000000L).as("c_custkey"),
              col("c_acctbal"), col("c_mktsegment")))
        graft.ops.Reconcile.diff(before, after, Seq("c_custkey"),
            Seq("c_acctbal", "c_mktsegment"))
          .groupBy("status")
          .agg(n.as("n_rows"), sum(col("c_custkey")).as("key_sum"))
          .orderBy("status")
      },
      Some("""WITH a AS (
             |  SELECT c_custkey,
             |         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 5.0 ELSE c_acctbal END AS c_acctbal,
             |         c_mktsegment
             |  FROM customer WHERE c_custkey % 13 <> 0
             |  UNION ALL
             |  SELECT c_custkey + 3000000, c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 11 = 0),
             |j AS (SELECT coalesce(b.c_custkey, a.c_custkey) AS k,
             |             CASE WHEN a.c_custkey IS NULL THEN 'removed'
             |                  WHEN b.c_custkey IS NULL THEN 'added'
             |                  WHEN (b.c_acctbal IS DISTINCT FROM a.c_acctbal)
             |                    OR (b.c_mktsegment IS DISTINCT FROM a.c_mktsegment) THEN 'changed'
             |                  ELSE 'unchanged' END AS status
             |      FROM customer b FULL OUTER JOIN a ON b.c_custkey = a.c_custkey)
             |SELECT status, count(*) AS n_rows, CAST(sum(k) AS BIGINT) AS key_sum
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Per-language percentile-rank normalization of doc length — one
    // grouped boundary aggregation + compiled binary search per row,
    // never a per-group window sort. Exact boundaries here; t-digest is
    // the documented 100 TB flag.
    QuerySpec("x44_quantile_normalize",
      (s, d) => Curation.quantileNormalize(
          Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
          group = col("lang"), score = col("n_chars"), buckets = 20)
        .select(col("doc_id"), col("lang"), col("qrank"))
        .orderBy("doc_id"),
      Some("""WITH q AS (SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS s FROM documents),
             |b AS (SELECT lang,
             |        quantile_cont(s, [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45,
             |                          0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]) AS bs
             |      FROM q GROUP BY 1)
             |SELECT doc_id, lang, len(list_filter(bs, x -> x < s)) / 20.0 AS qrank
             |FROM q JOIN b USING (lang) ORDER BY doc_id""".stripMargin)),

    // ST — stream-static enrichment join: a file stream of events joins a
    // broadcast dimension table (the canonical streaming dimension join —
    // stateless, no watermark, the static side re-resolved per
    // microbatch). Deterministic segment dim derived from user_id; the
    // oracle is the identical batch join.
    QuerySpec("st07_stream_enrich",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
        val src = Staging.slicedSource("se", d) { tmp =>
          Seq(dayofmonth(col("ts")) <= 10,
              dayofmonth(col("ts")).between(11, 20),
              dayofmonth(col("ts")) > 20).zipWithIndex.foreach { case (p, i) =>
            Staging.writeSlice(ev.filter(p), s"$tmp/src/slice$i")
          }
          ev.select(col("user_id")).distinct()
            .withColumn("segment", concat(lit("seg_"), (col("user_id") % 4).cast("string")))
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/dim")
          Seq("slice0", "slice1", "slice2")
        }
        val dim = s.read.parquet(s"$src/dim")
        val tmp = java.nio.file.Files.createTempDirectory("graft_se_run").toString
        val q = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .option("recursiveFileLookup", "true").parquet(s"$src/src")
          .join(broadcast(dim), Seq("user_id"))
          .writeStream.format("parquet")
          .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$tmp/out")
          .groupBy("segment")
          .agg(n.as("n_events"), sum(col("event_id")).as("id_sum"))
          .orderBy("segment")
      },
      Some("""SELECT 'seg_' || CAST(user_id % 4 AS VARCHAR) AS segment,
             |       count(*) AS n_events, CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ST — stream-STREAM interval join (the streaming twin of x36's range
    // join): clicks join purchases of the same user within [purchase,
    // purchase+6h), both sides watermarked. The 12h watermark delay
    // exceeds the 6h join window, so with chronological slices no state
    // needed for a future match is ever evicted — a correct
    // implementation must emit EXACTLY the batch inequality join.
    QuerySpec("st08_stream_stream_join",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        val src = Staging.slicedSource("ss", d) { tmp =>
          Seq(dayofmonth(col("ts")) <= 10,
              dayofmonth(col("ts")).between(11, 20),
              dayofmonth(col("ts")) > 20).zipWithIndex.foreach { case (p, i) =>
            Staging.writeSlice(ev.filter(p), s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        def leg() = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .option("recursiveFileLookup", "true").parquet(s"$src/src")
        val clicks = leg().filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
          .withWatermark("click_ts", "12 hours")
        val purchases = leg().filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
            col("ts").as("purchase_ts"))
          .withWatermark("purchase_ts", "12 hours")
        val tmp = java.nio.file.Files.createTempDirectory("graft_ss_run").toString
        Staging.drainTuning(s, src, 3) {
          val q = clicks.join(purchases,
              col("user_id") === col("p_user") &&
                col("click_ts") >= col("purchase_ts") &&
                col("click_ts") < col("purchase_ts") + expr("INTERVAL 6 HOURS"))
            .select(col("click_id"), col("purchase_id"))
            .writeStream.format("parquet")
            .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.read.parquet(s"$tmp/out").orderBy("click_id", "purchase_id")
      },
      Some("""WITH p AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |           FROM events WHERE event_type = 'click'),
             |iv AS (SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS s,
             |              CAST(ts AS TIMESTAMP) + INTERVAL 6 HOUR AS e
             |       FROM events WHERE event_type = 'purchase')
             |SELECT p.click_id, iv.purchase_id
             |FROM p JOIN iv ON p.user_id = iv.user_id AND p.ts >= iv.s AND p.ts < iv.e
             |ORDER BY 1, 2""".stripMargin)),

    // ST — foreachBatch custom sink maintaining an UPSERTED state table:
    // each microbatch reduces to its latest row per user (argmax dedup)
    // and merges into the versioned state directory (write-new-then-read,
    // never overwrite-in-place — object-store safe). The merge is itself
    // an argmax on (ts, event_id) — NOT last-batch-wins — so the final
    // state equals the batch argmax over all events (the oracle) no
    // matter how events are sliced into batches.
    QuerySpec("st09_stream_upsert",
      (s, d) => {
        import graft.ops.Dedup
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        val src = Staging.slicedSource("su", d) { tmp =>
          Seq(dayofmonth(col("ts")) <= 10,
              dayofmonth(col("ts")).between(11, 20),
              dayofmonth(col("ts")) > 20).zipWithIndex.foreach { case (p, i) =>
            Staging.writeSlice(ev.filter(p), s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_su_run").toString
        // the latest committed state version is derived by LISTING the
        // state root (highest state_v<batchId>), not held in a JVM var —
        // a restart-from-checkpoint in a fresh process (which skips
        // committed batches) still finds the previously merged state
        def latestState: Option[String] = {
          val dirs = Option(new java.io.File(tmp).listFiles()).toSeq.flatten
            .filter(f => f.isDirectory && f.getName.startsWith("state_v"))
          if (dirs.isEmpty) None
          else Some(dirs.maxBy(_.getName.stripPrefix("state_v").toLong).getAbsolutePath)
        }
        val q = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .option("recursiveFileLookup", "true").parquet(s"$src/src")
          .writeStream
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val updates = Dedup.latestPerKey(batch,
              Seq(col("user_id")), ord = col("ts"), col("event_id"))
            // argmax-merge: the state row survives unless the batch has a
            // NEWER row for the key (an unconditional Upsert.merge would
            // be last-BATCH-wins and silently corrupt state if slices
            // ever arrived out of event-time order)
            val merged = latestState match {
              case Some(prev) => Dedup.latestPerKey(
                s.read.parquet(prev).unionByName(updates),
                Seq(col("user_id")), ord = col("ts"), col("event_id"))
              case None => updates
            }
            merged.write.mode("overwrite").parquet(s"$tmp/state_v$id")
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(latestState.get)
          .select(col("user_id"), col("event_id").as("latest_event_id"), col("cents"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id AS latest_event_id,
             |       CAST(round(value * 100) AS BIGINT) AS cents
             |FROM events
             |QUALIFY row_number() OVER (PARTITION BY user_id
             |                           ORDER BY ts DESC, event_id DESC) = 1
             |ORDER BY user_id""".stripMargin)),

    // ST — STREAMING sessionization end-to-end (st03 oracles the batch
    // path; this drives Sessionize.streamingSessions — flatMapGroupsWithState
    // + EventTimeTimeout — through an AvailableNow drain over time-sliced
    // files and must land on the SAME per-user session aggregate). Two
    // far-future sentinel slices push the watermark past every real
    // session's end+gap (timers fire against the PREVIOUS batch's
    // watermark, so one sentinel alone would need a trailing no-data
    // batch); sentinel rows are excluded from the output.
    QuerySpec("st10_stream_sessionize",
      (s, d) => {
        import s.implicits._
        import graft.streaming.Sessionize
        val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
        val src = Staging.slicedSource("sz", d) { tmp =>
          Seq(dayofmonth(col("ts")) <= 10,
              dayofmonth(col("ts")).between(11, 20),
              dayofmonth(col("ts")) > 20).zipWithIndex.foreach { case (p, i) =>
            Staging.writeSlice(ev.filter(p), s"$tmp/src/slice$i")
          }
          Seq((-1L, "2030-01-01 00:00:00"), (-1L, "2030-01-02 00:00:00"))
            .zipWithIndex.foreach { case ((u, t), i) =>
              Seq((u, java.sql.Timestamp.valueOf(t))).toDF("user_id", "ts")
                .coalesce(1).write.mode("overwrite").parquet(s"$tmp/src/sentinel$i")
            }
          Seq("slice0", "slice1", "slice2", "sentinel0", "sentinel1")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_sz_run").toString
        Staging.drainTuning(s, src, 3) {
          val stream = s.readStream.schema("user_id LONG, ts TIMESTAMP")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true").parquet(s"$src/src")
            .as[Sessionize.SessionEvent]
          val q = Sessionize.streamingSessions(stream, gapSeconds = 3600)
            .writeStream
            .option("checkpointLocation", s"$tmp/ckpt")
            .outputMode("update")
            .foreachBatch { (batch: org.apache.spark.sql.Dataset[Sessionize.ClosedSession], _: Long) =>
              batch.write.mode("append").parquet(s"$tmp/out")
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.read.parquet(s"$tmp/out").filter(col("user_id") >= 0)
          .groupBy("user_id")
          .agg(n.as("n_sessions"), sum(col("n_events")).as("n_events"),
            max(col("n_events")).as("max_session_events"))
          .orderBy("user_id")
      },
      Some("""WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |s AS (SELECT user_id, ts,
             |        CASE WHEN lag(ts) OVER w IS NULL THEN 1
             |             WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000 THEN 1
             |             ELSE 0 END AS news
             |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |g AS (SELECT user_id, ts,
             |        sum(news) OVER (PARTITION BY user_id ORDER BY ts
             |                        ROWS UNBOUNDED PRECEDING) - 1 AS sid FROM s),
             |sess AS (SELECT user_id, sid, count(*) AS n FROM g GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
             |       CAST(max(n) AS BIGINT) AS max_session_events
             |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Unicode canonicalization before dedup: every 10th doc gets a
    // DECOMPOSED "café" tail (e + COMBINING ACUTE) plus ragged whitespace;
    // canonicalizeText (NFC + whitespace squeeze + trim) must make it
    // byte-identical to the precomposed spelling — checked through the
    // md5 fingerprint so the oracle compares normalized BYTES, not
    // rendering. DuckDB's nfc_normalize is the cross-engine oracle.
    QuerySpec("x49_normalize",
      (s, d) => {
        // the tail is DECOMPOSED on both sides: 'e' + U+0301 combining
        // acute (DuckDB: || chr(769)) — canonicalization must compose it
        val planted = Tables.documents(s, d).withColumn("text",
          when(col("doc_id") % 10 === 0,
            concat(col("text"), lit("  visit   the café ")))
            .otherwise(col("text")))
        planted
          .withColumn("canon", TextAnalysis.canonicalizeText(col("text")))
          .select(col("doc_id"),
            md5(col("canon").cast("binary")).as("canon_md5"),
            (length(col("text")) - length(col("canon"))).cast("long").as("chars_removed"))
          .orderBy("doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 10 = 0
             |              THEN text || '  visit   the cafe' || chr(769) || ' '
             |              ELSE text END AS text
             |  FROM documents),
             |c AS (SELECT doc_id, text,
             |        trim(regexp_replace(nfc_normalize(text), '[ \t\n\v\f\r]+', ' ', 'g')) AS canon
             |      FROM planted)
             |SELECT doc_id, md5(canon) AS canon_md5,
             |       length(text) - length(canon) AS chars_removed
             |FROM c ORDER BY doc_id""".stripMargin)),

    // N-gram LM quality scoring (the CCNet/KenLM-style perplexity filter,
    // self-trained): per-doc negative log-likelihood under a corpus-trained
    // add-one bigram model. Scores are EXACT integers (micro-nat rounding
    // per bigram, long sums) so the output is order-independent and the
    // DuckDB oracle — same counts, same smoothing, same ln — hashes
    // byte-identically. Train + score is ONE composed plan: two token-key
    // aggregations, a distinct count, two equi-joins; nothing collected.
    QuerySpec("x55_lm_score",
      (s, d) => graft.ext.LmScore.bigramNll(Tables.documents(s, d),
          col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
      Some("""WITH tok AS (SELECT doc_id,
             |         list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                     x -> x <> '') AS t
             |       FROM documents),
             |bg AS (SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
             |       FROM tok WHERE len(t) >= 2),
             |b2 AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bg),
             |c12 AS (SELECT w1, w2, count(*) AS n12 FROM b2 GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS n1 FROM b2 GROUP BY 1),
             |v AS (SELECT count(DISTINCT x) AS v
             |      FROM (SELECT unnest(t) AS x FROM tok)),
             |sc AS (SELECT doc_id,
             |         CAST(round(-ln((n12 + 1.0) / (n1 + v)) * 1000000, 0) AS BIGINT) AS s
             |       FROM b2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v)
             |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(s) AS BIGINT) AS nll_micro
             |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Held-out LM scoring (the production CCNet shape: the LM is trained
    // on a REFERENCE corpus — here every 5th doc — and scores the rest,
    // so the unseen-bigram/unseen-context smoothing path (C=0 fallbacks,
    // p = (0+1)/(0+V)) runs end-to-end in both engines, not just in a
    // unit spec). Same exact micro-nat integer convention as x55.
    QuerySpec("x57_lm_score_heldout",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.ext.LmScore.bigramNll(
            docs.filter(col("doc_id") % 5 =!= 0), col("doc_id"), col("text"),
            train = Some(docs.filter(col("doc_id") % 5 === 0)))
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH tokT AS (SELECT doc_id,
             |         list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                     x -> x <> '') AS t
             |       FROM documents WHERE doc_id % 5 = 0),
             |tokS AS (SELECT doc_id,
             |         list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                     x -> x <> '') AS t
             |       FROM documents WHERE doc_id % 5 <> 0),
             |bgT AS (SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
             |       FROM tokT WHERE len(t) >= 2),
             |bT AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bgT),
             |bgS AS (SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
             |       FROM tokS WHERE len(t) >= 2),
             |bS AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bgS),
             |c12 AS (SELECT w1, w2, count(*) AS n12 FROM bT GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS n1 FROM bT GROUP BY 1),
             |v AS (SELECT count(DISTINCT x) AS v
             |      FROM (SELECT unnest(t) AS x FROM tokT)),
             |sc AS (SELECT doc_id,
             |         CAST(round(-ln((coalesce(n12, 0) + 1.0)
             |                        / (coalesce(n1, 0) + v)) * 1000000, 0) AS BIGINT) AS s
             |       FROM bS LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1), v)
             |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(s) AS BIGINT) AS nll_micro
             |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // URL extraction + domain canonicalization (the web-corpus curation
    // stage: link-density quality signals, per-domain caps, blocklist
    // joins all start here). URLs planted deterministically into every
    // 5th doc — mixed-case www hosts, paths, query strings, a second
    // scheme — and both engines run the same RE2-safe pattern, so the
    // oracle checks extraction AND canonicalization byte-for-byte.
    QuerySpec("x54_url_extract",
      (s, d) => {
        val planted = Tables.documents(s, d).withColumn("text",
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" see https://www.Example"), col("doc_id") % 7,
              lit(".org/p/"), col("doc_id"), lit("?q=1 and http://cdn.example"),
              col("doc_id") % 3, lit(".net/x.js now")))
            .otherwise(col("text")))
        planted
          .withColumn("ls", TextAnalysis.linkStats(col("text")))
          .select(col("doc_id"), col("ls.n_urls").as("n_urls"),
            array_join(col("ls.domains"), ",").as("domains"))
          .orderBy("doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 5 = 0
             |              THEN text || ' see https://www.Example' || (doc_id % 7)
             |                   || '.org/p/' || doc_id || '?q=1 and http://cdn.example'
             |                   || (doc_id % 3) || '.net/x.js now'
             |              ELSE text END AS text
             |  FROM documents),
             |u AS (SELECT doc_id,
             |        regexp_extract_all(text, 'https?://[^ \t\n\r]+') AS urls
             |      FROM planted)
             |SELECT doc_id, CAST(len(urls) AS BIGINT) AS n_urls,
             |       coalesce(array_to_string(list_sort(list_distinct(list_transform(urls,
             |         x -> regexp_replace(lower(regexp_extract(x, '^https?://([^/?#]+)', 1)),
             |                             '^www\.', '')))), ','), '') AS domains
             |FROM u ORDER BY doc_id""".stripMargin)),

    // One-pass dataset profile over events (nulls planted in two columns
    // by the generator): row/null/exact-distinct counts per column from a
    // single aggregation job, never a scan per column.
    QuerySpec("x45_profile",
      (s, d) => graft.ops.Profile.profile(Tables.events(s, d),
          Seq("event_id", "user_id", "event_type", "value", "props"))
        .orderBy("column"),
      Some("""SELECT col AS "column", n_rows, n_nulls, n_distinct FROM (
             |  SELECT 'event_id' AS col, count(*) AS n_rows,
             |         count(*) - count(event_id) AS n_nulls,
             |         count(DISTINCT event_id) AS n_distinct FROM events
             |  UNION ALL
             |  SELECT 'user_id', count(*), count(*) - count(user_id),
             |         count(DISTINCT user_id) FROM events
             |  UNION ALL
             |  SELECT 'event_type', count(*), count(*) - count(event_type),
             |         count(DISTINCT event_type) FROM events
             |  UNION ALL
             |  SELECT 'value', count(*), count(*) - count(value),
             |         count(DISTINCT value) FROM events
             |  UNION ALL
             |  SELECT 'props', count(*), count(*) - count(props),
             |         count(DISTINCT props) FROM events)
             |ORDER BY col""".stripMargin)),

    // Order-independent dataset content digest: per-row 60-bit md5 prefix
    // summed in exact decimal — same number regardless of partitioning or
    // row order, recomputable by any md5-capable engine. The output also
    // proves change DETECTION: the digest of the table minus one row must
    // differ (delta = that row's hash, checked in-plan).
    QuerySpec("x47_dataset_digest",
      (s, d) => {
        import graft.ops.Digest
        val cust = Tables.customer(s, d)
        val fields = Seq(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        val full = Digest.datasetDigest(cust, fields)
        val without = Digest.datasetDigest(cust.filter(col("c_custkey") =!= 7), fields)
        full.crossJoin(without.select(col("n_rows").as("n_rows_b"), col("digest").as("digest_b")))
          .select(col("n_rows"), col("digest").cast("string").as("digest"),
            (col("digest") =!= col("digest_b")).cast("long").as("change_detected"))
      },
      Some("""WITH h AS (SELECT CAST(('0x' || substr(md5(
             |              CAST(c_custkey AS VARCHAR) || chr(31) || c_name || chr(31) || c_mktsegment
             |            ), 1, 15)) AS BIGINT) AS rh, c_custkey
             |        FROM customer)
             |SELECT count(*) AS n_rows,
             |       CAST(sum(rh) AS VARCHAR) AS digest,
             |       CAST(sum(CASE WHEN c_custkey <> 7 THEN rh END) <> sum(rh) AS BIGINT) AS change_detected
             |FROM h""".stripMargin)),

    // Incremental rollup maintenance: pre-2000 orders aggregated once
    // (the "history" metric table), 2000+ aggregated as the delta, merged
    // WITHOUT rescanning history — must equal the from-scratch rollup the
    // oracle computes. Counts merge as sums, money as exact cents, dates
    // as min/max.
    QuerySpec("x48_incremental_agg",
      (s, d) => {
        val orders = Tables.orders(s, d)
        def rollup(part: DataFrame) = part.groupBy("o_orderstatus")
          .agg(n.as("n_orders"),
            centsSum(col("o_totalprice")).as("total_cents"),
            min(col("o_orderdate")).as("first_order"),
            max(col("o_orderdate")).as("last_order"))
        val history = rollup(orders.filter(year(col("o_orderdate")) < 2000))
        val delta = rollup(orders.filter(year(col("o_orderdate")) >= 2000))
        graft.ops.Metrics.mergeAggregates(Seq(history, delta), Seq("o_orderstatus"),
            Seq("n_orders" -> "count", "total_cents" -> "sum",
              "first_order" -> "min", "last_order" -> "max"))
          .select(col("o_orderstatus"), col("n_orders"), col("total_cents"),
            date_format(col("first_order"), "yyyy-MM-dd").as("first_order"),
            date_format(col("last_order"), "yyyy-MM-dd").as("last_order"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             |       strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
             |       strftime(max(o_orderdate), '%Y-%m-%d') AS last_order
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Order-independent Pearson correlation: exact fixed-point moment
    // sums (decimal), floating point only in the final closed form —
    // bit-identical across engines, unlike the builtin double-accumulating
    // corr().
    QuerySpec("x46_corr_exact",
      (s, d) => graft.ops.Metrics.pearsonExact(Tables.lineitem(s, d),
          col("l_quantity"), col("l_extendedprice"), Seq(col("l_returnflag")),
          as = "corr_qty_price")
        .orderBy("l_returnflag"),
      Some("""WITH c AS (SELECT l_returnflag,
             |             CAST(round(l_quantity * 100) AS BIGINT) AS cx,
             |             CAST(round(l_extendedprice * 100) AS BIGINT) AS cy
             |           FROM lineitem
             |           WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
             |a AS (SELECT l_returnflag, count(*) AS nn, sum(cx) AS sx, sum(cy) AS sy,
             |             sum(cx * cy) AS sxy, sum(cx * cx) AS sxx, sum(cy * cy) AS syy
             |      FROM c GROUP BY 1)
             |SELECT l_returnflag,
             |       CASE WHEN CAST(nn * sxx - sx * sx AS DOUBLE) > 0
             |             AND CAST(nn * syy - sy * sy AS DOUBLE) > 0
             |            THEN round(CAST(nn * sxy - sx * sy AS DOUBLE) /
             |                       (sqrt(CAST(nn * sxx - sx * sx AS DOUBLE)) *
             |                        sqrt(CAST(nn * syy - sy * sy AS DOUBLE))), 6)
             |       END AS corr_qty_price
             |FROM a ORDER BY 1""".stripMargin)),

    // PRODUCTION-SIZE vocab tokenization (the throughput claim x51's
    // 100-merge fixture can't make): the full documents table encoded to
    // ids through the deterministic 50k-merge synthetic vocab, loaded via
    // the same published-format parsers (50k vocab.bpe lines + ~1 MB
    // escape-heavy encoder.json) and shipped to executors as a BROADCAST
    // — a megabytes-size vocab must never ride the per-task closure. The
    // oracle states the loss-free invariants (id-level round trip through
    // the inverse encoder map; byte bounds with maxTokenLen=4); the exact
    // merge/id behavior of the big vocab is pinned by x59's frozen VALUES.
    QuerySpec("x58_bpe_big_vocab",
      (s, d) => {
        import graft.functions.{Bpe, GraftBpe}
        val bc = s.sparkContext.broadcast(Bpe.bigVocab)
        val maxTok = Bpe.bigVocab.maxTokenLen
        Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"),
            GraftBpe.bpeIdsBc(col("text"), bc).as("ids"))
          .select(col("doc_id"),
            length(col("text").cast("binary")).cast("long").as("n_bytes"),
            (GraftBpe.bpeDetokIds(col("ids"), bc) === col("text"))
              .cast("long").as("roundtrip_ok"),
            (size(col("ids")).cast("long") <= length(col("text").cast("binary")) &&
             size(col("ids")).cast("long") * maxTok >= length(col("text").cast("binary")))
              .cast("long").as("bounds_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CAST(1 AS BIGINT) AS roundtrip_ok, CAST(1 AS BIGINT) AS bounds_ok
             |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin)),

    // The 50k-merge vocab's EXACT behavior: the x30/x51 fixture strings
    // tokenized through it — token counts prove the production-size merge
    // table drove the greedy matcher (counts differ from both x30's
    // default vocab and x51's 100-merge fixture), id sums prove the
    // ~50k-entry encoder map routed every token. VALUES precomputed by
    // scripts/bpe_big_vocab_oracle.py: an independent python rebuild of
    // the vocab spec plus the independent bpe_oracle.py encoder.
    QuerySpec("x59_bpe_big_fixture",
      (s, d) => {
        import s.implicits._
        import graft.functions.{Bpe, GraftBpe}
        val bc = s.sparkContext.broadcast(Bpe.bigVocab)
        BpeFixture.strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("fid", "text")
          .select(col("fid"), GraftBpe.bpeIdsBc(col("text"), bc).as("ids"))
          .select(col("fid"), size(col("ids")).cast("long").as("n_tokens"),
            aggregate(col("ids"), lit(0L), (acc, x) => acc + x).as("id_sum"))
          .orderBy("fid")
      },
      Some("""SELECT CAST(fid AS BIGINT) AS fid, CAST(n AS BIGINT) AS n_tokens,
             |       CAST(ids AS BIGINT) AS id_sum
             |FROM (VALUES (0,22,28490),(1,29,33194),(2,31,16347),(3,27,13543),
             |             (4,26,19402),(5,39,9174),(6,12,4299),(7,1,97),(8,0,0),
             |             (9,30,36595),(10,17,19473),(11,29,4572)) AS t(fid, n, ids)
             |ORDER BY fid""".stripMargin)),

    // ST — streaming near-dup INGEST GATE (x39's batch shape composed
    // with st09's foreachBatch sink): documents drain in three
    // micro-batches; each batch drops near-dups of the PERSISTED history
    // signature table, then appends its own kept signatures — so the
    // planted dups (slice-0 docs re-arriving with a tail in slice 2)
    // are caught two batches after their originals without re-signing
    // history. The oracle replays the same sequential gate in SQL:
    // kept(0) = b0, kept(i) = b_i minus exact-Jaccard≥0.8 matches of
    // kept(<i).
    QuerySpec("st11_stream_neardup_gate",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val src = Staging.slicedSource("ndg", d) { tmp =>
          val slices = Seq(
            docs.filter(col("doc_id") % 3 === 0),
            docs.filter(col("doc_id") % 3 === 1),
            docs.filter(col("doc_id") % 3 === 2)
              .unionByName(docs.filter(col("doc_id") % 15 === 0)
                .select((col("doc_id") + 1000000L).as("doc_id"),
                  concat(col("text"), lit(" graft stream gate tail")).as("text"))))
          slices.zipWithIndex.foreach { case (df, i) =>
            Staging.writeSlice(df, s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_ndg_run").toString
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.NearDupGate.start(s,
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            "doc_id", "text",
            sigDir = s"$tmp/sigs", outDir = s"$tmp/out",
            checkpoint = s"$tmp/ckpt")
          q.awaitTermination()
        }
        s.read.option("recursiveFileLookup", "true").parquet(s"$tmp/out")
          .select(col("doc_id"),
            when(col("doc_id") >= 1000000L, lit(2L))
              .otherwise(col("doc_id") % 3).cast("long").as("ingest_batch"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, text, doc_id % 3 AS b FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, text || ' graft stream gate tail', 2
             |  FROM documents WHERE doc_id % 15 = 0),
             |sh AS (SELECT doc_id, b, list_distinct(list_transform(
             |         range(1, len(string_split(lower(text), ' ')) - 1),
             |         i -> string_split(lower(text), ' ')[i] || ' ' ||
             |              string_split(lower(text), ' ')[i+1] || ' ' ||
             |              string_split(lower(text), ' ')[i+2])) AS s
             |       FROM base),
             |k0 AS (SELECT doc_id, s FROM sh WHERE b = 0),
             |n1 AS (SELECT doc_id, s FROM sh WHERE b = 1),
             |k1 AS (SELECT doc_id, s FROM n1 WHERE doc_id NOT IN (
             |        SELECT n.doc_id FROM n1 n JOIN k0 h
             |        ON len(list_intersect(n.s, h.s)) * 1.0 /
             |           len(list_distinct(list_concat(n.s, h.s))) >= 0.8)),
             |h1 AS (SELECT doc_id, s FROM k0 UNION ALL SELECT doc_id, s FROM k1),
             |n2 AS (SELECT doc_id, s FROM sh WHERE b = 2),
             |k2 AS (SELECT doc_id FROM n2 WHERE doc_id NOT IN (
             |        SELECT n.doc_id FROM n2 n JOIN h1 h
             |        ON len(list_intersect(n.s, h.s)) * 1.0 /
             |           len(list_distinct(list_concat(n.s, h.s))) >= 0.8))
             |SELECT doc_id,
             |       CAST(CASE WHEN doc_id >= 1000000 THEN 2
             |                 ELSE doc_id % 3 END AS BIGINT) AS ingest_batch
             |FROM (SELECT doc_id FROM k0 UNION ALL SELECT doc_id FROM k1
             |      UNION ALL SELECT doc_id FROM k2)
             |ORDER BY doc_id""".stripMargin)),

    // INCREMENTAL IVF maintenance, serve path ([[ivfaArtifacts]]): the
    // index is trained on 4/5 of the corpus, the delta — including every
    // planted query twin — arrives through the APPEND path (assign to
    // existing centroids, append to the bucketed inverted file, no
    // retrain, no base re-scan). Each query's twin living only in the
    // appended files must still return at rank 1: the serve reads
    // base ∪ delta through the same bucket-pruned scan. Drift stats and
    // the recall bound are x60's job (bench-excluded verifier).
    QuerySpec("x56_ann_ivf_append",
      (s, d) => {
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        val (centroids, _) = ivfaArtifacts(s, d)
        // nprobe 8 vs x18's 6: serving appended data from a STALE quantizer
        // (centroids never saw the delta) costs probe width to hold recall —
        // measured 39/50 overlap at nprobe=6, 42-47/50 at 8 across sf levels
        Similarity.ivfTopKIndexed(s, q, ivfaTable(d), centroids, 5, nprobe = 8)
          .filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // x56's VERIFIER (bench-excluded, x52 pattern): the appended index's
    // top-5 must overlap the exact brute force over base ∪ delta by
    // ≥ 40/50 (centroids saw only 4/5 of the corpus, so this bounds the
    // recall cost of serving appended data from a stale quantizer), and
    // the drift check must report the same-distribution delta as NOT
    // needing a retrain (mean assignment cosine within margin of
    // build-time — the knob that says when append must give way to
    // rebuild).
    QuerySpec("x60_ann_ivf_append_verify",
      (s, d) => {
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        val (centroids, drift) = ivfaArtifacts(s, d)
        val ivf = Similarity.ivfTopKIndexed(s, q, ivfaTable(d), centroids, 5, nprobe = 8)
        val bf = Similarity.bruteForceTopK(q, annCorpus(s, d), 5)
        val totalOverlap = ivf.select("query_id", "neighbor_id")
          .join(bf.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("__n"))
        ivf.filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .crossJoin(totalOverlap)
          .select(col("query_id"), col("top1_neighbor_id"),
            (col("__n") >= 40).cast("long").as("recall_ok"),
            lit(!drift.shouldRetrain).cast("long").as("drift_ok"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id,
             |       CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS drift_ok
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // STORAGE MAINTENANCE: bucketed-table compaction ([[Layout
    // .compactBucketed]] — the knob [[Layout.appendBucketed]]'s contract
    // defers to). A base slice is bucketed, three "daily" appends each
    // lay new files beside every bucket, then compaction rewrites back
    // to exactly one file per bucket through a swap table (original
    // readable until the new layout commits). The oracle pins content
    // through the rewrite — row count, distinct ids, id sum — plus the
    // file-count contract (accreted > buckets before, == buckets after).
    QuerySpec("x61_bucket_compact",
      (s, d) => {
        import graft.io.Layout
        val ids = Tables.embeddings(s, d).select(col("vec_id"))
        val tbl = "graft_x61_compact"
        Layout.writeBucketed(ids.filter(col("vec_id") % 4 === 0), tbl, "vec_id", 8)
        (1 to 3).foreach { r =>
          Layout.appendBucketed(ids.filter(col("vec_id") % 4 === r), tbl, "vec_id", 8)
        }
        val (before, after) = Layout.compactBucketed(s, tbl, "vec_id", 8)
        Layout.table(s, tbl)
          .agg(count(lit(1)).as("n_rows"),
            count_distinct(col("vec_id")).as("n_ids"),
            sum(col("vec_id")).as("id_sum"))
          .select(col("n_rows"), col("n_ids"), col("id_sum"),
            lit(before > 8).cast("long").as("accreted_ok"),
            lit(after == 8).cast("long").as("compact_ok"))
      },
      Some("""SELECT count(*) AS n_rows, count(DISTINCT vec_id) AS n_ids,
             |       CAST(sum(vec_id) AS BIGINT) AS id_sum,
             |       CAST(1 AS BIGINT) AS accreted_ok,
             |       CAST(1 AS BIGINT) AS compact_ok
             |FROM embeddings""".stripMargin)),

    // ST — streaming VECTOR INGEST into the persisted IVF index
    // ([[graft.streaming.VectorIngest]]: x56's append path composed with a
    // micro-batch drain, exactly-once via the two-phase marker tracker).
    // The index is trained and built on base (vec_id % 5 != 0) once;
    // the drain ingests the held-out fifth in two slices plus a twin
    // slice — every query's twin reaches the index only through the
    // stream, and must then serve at rank 1 through the same
    // bucket-pruned scan. Centroids are cached per sf dir (offline
    // maintenance work, the x18/x56 convention); the base write + drain
    // are the benched operator.
    QuerySpec("st12_stream_vector_ingest",
      (s, d) => {
        import graft.streaming.VectorIngest
        val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val src = Staging.slicedSource("vi", d) { tmp =>
          val delta = emb.filter(col("vec_id") % 5 === 0)
          Staging.writeSlice(delta.filter(col("vec_id") % 2 === 0), s"$tmp/src/slice0")
          Staging.writeSlice(delta.filter(col("vec_id") % 2 =!= 0), s"$tmp/src/slice1")
          Staging.writeSlice(emb.filter(col("vec_id") < 10)
            .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")),
            s"$tmp/src/slice2")
          Seq("slice0", "slice1", "slice2")
        }
        val base = emb.filter(col("vec_id") % 5 =!= 0)
        val centroids = st12Centroids(s, d)
        val table = "graft_st12_ivf"
        Similarity.writeIvfIndex(base, table, centroids)
        val tmp = java.nio.file.Files.createTempDirectory("graft_vi_run").toString
        val q = VectorIngest.start(s,
          s.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true").parquet(s"$src/src"),
          table, centroids, s"$tmp/trk", s"$tmp/ckpt")
        q.awaitTermination()
        // stale-quantizer serve over base ∪ ingested: nprobe 8 (x56's knob)
        Similarity.ivfTopKIndexed(s, emb.filter(col("vec_id") < 10), table,
            centroids, 5, nprobe = 8)
          .filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // TRAINING-DATA EXPORT: deterministic global shuffle + exact
    // equal-size shards ([[graft.ext.Export]]). The corpus is permuted by
    // md5(seed ∥ doc_id) WITHOUT a global one-task window (two-phase
    // rank: 256 fixed hash-prefix buckets + a 256-row offset cumsum),
    // cut round-robin into 5 shards (sizes exact to ±1), written as
    // shard=<i> directories with bounded file sizes, and read BACK — so
    // the oracle pins the whole write→read round trip: per-shard counts,
    // id sums, and the rank range every shard must cover. DuckDB rebuilds
    // the identical permutation from its own md5.
    QuerySpec("x62_shuffle_shards",
      (s, d) => {
        import graft.ext.Export
        val docs = Tables.documents(s, d).select(col("doc_id"))
        val sharded = Export.shuffleShards(docs, col("doc_id"), "epoch0", 5)
        val out = java.nio.file.Files.createTempDirectory("graft_x62").toString + "/shards"
        Export.writeShards(sharded, out, 5)
        s.read.parquet(out)
          .groupBy(col("shard").cast("long").as("shard"))
          .agg(n.as("n_docs"), sum(col("doc_id")).as("id_sum"),
            min(col("rank")).as("min_rank"), max(col("rank")).as("max_rank"))
          .orderBy("shard")
      },
      Some("""WITH r AS (
             |  SELECT doc_id,
             |         row_number() OVER (ORDER BY md5('epoch0' || doc_id), doc_id) - 1
             |           AS rank
             |  FROM documents)
             |SELECT CAST(rank % 5 AS BIGINT) AS shard, count(*) AS n_docs,
             |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
             |       CAST(min(rank) AS BIGINT) AS min_rank,
             |       CAST(max(rank) AS BIGINT) AS max_rank
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SEMANTIC DEDUP, scale path (SemDeDup shape — cluster-bucketed
    // embedding near-dup): pairs are compared only within a vector's
    // nprobe nearest k-means cells, so the quadratic term is bounded by
    // the largest cell, not the corpus (x13 is the quarantined all-pairs
    // verifier of the same semantics). Identical twins always share a
    // cell, so every planted dup (vec_id < 20 copied to +100000) is
    // dropped and every original kept — the keep-smaller-id rule
    // collapses each neighborhood deterministically. Cell count scales
    // with the corpus (~500 vectors per cell), cached per sf dir like
    // the other quantizers.
    QuerySpec("x63_semantic_dedup",
      (s, d) => {
        val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val planted = emb.unionByName(emb.filter(col("vec_id") < 20)
          .withColumn("vec_id", col("vec_id") + 100000L))
        Similarity.semanticDedup(planted, x63Centroids(s, d), 0.95, nprobe = 2)
          .select(col("vec_id")).orderBy("vec_id")
      },
      Some("SELECT vec_id FROM embeddings ORDER BY vec_id")),

    // DSIR importance resampling (Xie et al. 2023): tilt the raw corpus
    // toward the en-language target via unigram log-likelihood ratios,
    // then a deterministic Gumbel-top-k weighted sample. Exact micro-nat
    // longs throughout; the Gumbel uniform is an md5-derived dyadic
    // rational, so the sampled set is reproducible across engines.
    QuerySpec("x64_dsir_resample",
      (s, d) => graft.ext.Dsir.resample(Tables.documents(s, d),
          col("doc_id"), col("text"), col("lang") === "en", n = 120)
        .withColumnRenamed("id", "doc_id"),
      Some("""WITH tok AS (SELECT doc_id, lang = 'en' AS tgt,
             |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                            x -> x <> '')) AS w
             |       FROM documents),
             |tot AS (SELECT count(*) AS ns,
             |               count(*) FILTER (WHERE tgt) AS nt,
             |               count(DISTINCT w) AS v FROM tok),
             |wt AS (SELECT w,
             |         CAST(round((ln((count(*) FILTER (WHERE tgt) + 1.0) / (nt + v))
             |                   - ln((count(*) + 1.0) / (ns + v))) * 1000000, 0)
             |              AS BIGINT) AS wm
             |       FROM tok, tot GROUP BY w, nt, ns, v),
             |sc AS (SELECT doc_id, count(*) AS n_tokens,
             |               CAST(sum(wm) AS BIGINT) AS score_micro
             |       FROM tok JOIN wt USING (w) GROUP BY 1)
             |SELECT doc_id, n_tokens, score_micro,
             |       score_micro + CAST(round(-ln(-ln(
             |         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
             |          * 2 + 1) / 131072.0)) * 1000000, 0) AS BIGINT) AS key_micro
             |FROM sc ORDER BY key_micro DESC, doc_id LIMIT 120""".stripMargin)),

    // Gopher rule-based filtering (Rae et al. 2021) with per-rule
    // accounting: integer-only threshold comparisons, first_fail names the
    // first violated rule in published order. Zero-shuffle per-row signals.
    QuerySpec("x65_gopher_rules",
      (s, d) => graft.ext.GopherFilter.gopherRules(Tables.documents(s, d),
          col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS t
             |       FROM documents),
             |g AS (SELECT doc_id, list_transform(range(1, len(t) - 1),
             |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g
             |      FROM t),
             |b AS (SELECT t.doc_id,
             |        CAST(len(t.t) AS BIGINT) AS n_words,
             |        CAST(list_sum(list_transform(t.t, x -> len(x))) AS BIGINT) AS chars,
             |        CAST(len(list_filter(t.t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_words,
             |        CAST(len(list_intersect(list_distinct(t.t),
             |          ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits,
             |        CAST((len(t.text) - len(replace(t.text, '#', ''))) +
             |             (len(t.text) - len(replace(t.text, '...', ''))) // 3 AS BIGINT) AS sym_hits,
             |        CAST(len(g.g) - len(list_distinct(g.g)) AS BIGINT) AS dup3,
             |        CAST(len(g.g) AS BIGINT) AS total3
             |      FROM t JOIN g USING (doc_id))
             |SELECT doc_id, n_words, chars, alpha_words, stop_hits, sym_hits, dup3, total3,
             |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000
             |         AND chars BETWEEN 3 * n_words AND 10 * n_words
             |         AND sym_hits * 10 <= n_words
             |         AND alpha_words * 5 >= 4 * n_words
             |         AND stop_hits >= 2
             |         AND dup3 * 50 <= total3 * 9 THEN 1 ELSE 0 END AS BIGINT) AS keep,
             |  CASE WHEN NOT (n_words BETWEEN 50 AND 100000) THEN 'word_count'
             |       WHEN NOT (chars BETWEEN 3 * n_words AND 10 * n_words) THEN 'word_length'
             |       WHEN NOT (sym_hits * 10 <= n_words) THEN 'symbol_ratio'
             |       WHEN NOT (alpha_words * 5 >= 4 * n_words) THEN 'alpha_words'
             |       WHEN NOT (stop_hits >= 2) THEN 'stopwords'
             |       WHEN NOT (dup3 * 50 <= total3 * 9) THEN 'dup_3gram'
             |       ELSE NULL END AS first_fail
             |FROM b ORDER BY doc_id""".stripMargin)),

    // Exact-substring dedup (Lee et al. 2022): every 8-token span occurring
    // >= 2 times anywhere in the corpus is cut from ALL its occurrences;
    // planted whole-document dups collapse to empty text, partially-shared
    // boilerplate is excised in place. Shingle identity travels as md5.
    QuerySpec("x66_exact_substr",
      (s, d) => graft.ext.ExactSubstr.removeRepeatedSpans(
          Tables.documents(s, d), col("doc_id"), col("text"), k = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
             |       FROM documents),
             |s0 AS (SELECT doc_id, t,
             |         unnest(range(1, greatest(len(t) - 6, CAST(1 AS BIGINT)))) AS i
             |       FROM t),
             |s AS (SELECT doc_id, i - 1 AS p,
             |        md5(array_to_string(t[i:i+7], chr(1))) AS key
             |      FROM s0),
             |d AS (SELECT key FROM s GROUP BY key HAVING count(*) > 1),
             |hit AS (SELECT doc_id, p FROM s JOIN d USING (key)),
             |cov0 AS (SELECT doc_id, p, unnest(range(0, 8)) AS o FROM hit),
             |cov AS (SELECT DISTINCT doc_id, p + o AS pos FROM cov0),
             |tok0 AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM t),
             |tok AS (SELECT doc_id, i - 1 AS pos, t[i] AS w FROM tok0),
             |kept AS (SELECT tok.* FROM tok ANTI JOIN cov USING (doc_id, pos)),
             |reb AS (SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
             |               count(*) AS n_kept
             |        FROM kept GROUP BY 1)
             |SELECT t.doc_id, coalesce(reb.clean_text, '') AS clean_text,
             |       CAST(len(t.t) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
             |FROM t LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // REAL image resize round-trip (the pixel-level x29): deterministic
    // pixels encoded as lossless PNG, nearest-neighbor-resampled with the
    // explicit mapping src = floor(dst*srcDim/dstDim), re-encoded PNG, then
    // proven at the PIXEL level — the oracle recomputes the exact Σ(r+g+b)
    // of the resampled raster from the closed-form pattern. Header dims
    // alone would pass a resize that scrambled content; the checksum won't.
    QuerySpec("x67_image_resize",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") <= 48)
        .select(col("doc_id"),
          (col("doc_id") % 16 + 17).as("sw"), (col("doc_id") % 12 + 13).as("sh"),
          (col("doc_id") % 8 + 8).as("dw"), (col("doc_id") % 6 + 7).as("dh"))
        .withColumn("src", Multimodal.encodeImage(col("sw"), col("sh"), lit("png")))
        .withColumn("dst", Multimodal.resizeImage(col("src"), col("dw"), col("dh")))
        .withColumn("meta", Multimodal.decodeImage(col("dst")))
        .select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"),
          Multimodal.imagePixelSum(col("dst")).as("pixel_sum"))
        .orderBy("doc_id"),
      Some("""WITH p AS (SELECT doc_id,
             |         doc_id % 16 + 17 AS sw, doc_id % 12 + 13 AS sh,
             |         doc_id % 8 + 8 AS dw, doc_id % 6 + 7 AS dh
             |       FROM documents WHERE doc_id <= 48),
             |px AS (SELECT doc_id, sw, sh, dw, dh, unnest(range(0, dw)) AS x FROM p),
             |pxy AS (SELECT doc_id, sw, sh, dw, dh, x, unnest(range(0, dh)) AS y FROM px),
             |m AS (SELECT doc_id, dw, dh,
             |        (x * sw) // dw AS sx, (y * sh) // dh AS sy FROM pxy)
             |SELECT doc_id, CAST(max(dw) AS BIGINT) AS width,
             |       CAST(max(dh) AS BIGINT) AS height,
             |       CAST(sum(((sx*31 + sy*17) % 256) + ((sx*13 + sy*29) % 256)
             |                + ((sx*7 + sy*23) % 256)) AS BIGINT) AS pixel_sum
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // REAL PCM feature extraction: EncodeWav's samples are a pure function
    // of index, WavEnergy decodes the actual little-endian int16 stream and
    // sums squares per 256-sample frame — the oracle replays the sample
    // formula in SQL. Exact integers end-to-end; a one-sample framing or
    // sign error anywhere breaks the match.
    QuerySpec("x68_wav_energy",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") <= 40)
        .select(col("doc_id"),
          (col("doc_id") % 3 * 8000 + 8000).as("sr"),
          expr("doc_id % 4 DIV 2 + 1").as("nch"),
          (col("doc_id") % 20 * 100 + 100).as("nsamp"))
        .withColumn("wav", Multimodal.encodeWav(col("sr"), col("nch"), col("nsamp")))
        .select(col("doc_id"),
          posexplode(Multimodal.wavEnergy(col("wav"), lit(256))))
        .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
          col("col").as("sumsq"))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH p AS (SELECT doc_id, doc_id % 4 // 2 + 1 AS nch,
             |         doc_id % 20 * 100 + 100 AS nsamp
             |       FROM documents WHERE doc_id <= 40),
             |s AS (SELECT doc_id, unnest(range(0, nsamp * nch)) AS i FROM p),
             |v AS (SELECT doc_id, i // 256 AS frame_idx,
             |        (i * 2654435761) % 65536 - 32768 AS smp FROM s)
             |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
             |       CAST(sum(smp * smp) AS BIGINT) AS sumsq
             |FROM v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // HTML → text extraction with link density, the first step of every
    // web-crawl curation stack: pages built deterministically around each
    // document (head/style/script subtrees to drop, a comment, entities to
    // decode, one anchor), parsed by the native single-pass extractor. The
    // oracle reconstructs the exact visible text — including the decoded
    // entities and collapsed whitespace — plus the integer link-density
    // numerator, so tag handling, subtree drops, entity decode, and the
    // anchor counters are all load-bearing.
    QuerySpec("x69_html_extract",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), concat(
          lit("<html><head><title>T</title><style>p{color:#000}</style></head>" +
            "<body><h1>Doc "), col("doc_id"),
          lit("</h1><!-- boilerplate --><p>"), col("text"),
          lit("</p><p>x &amp; y &lt;z&gt;</p><a href=\"https://link.example/a\">link"),
          col("doc_id") % 7,
          lit("</a><script>var i=0;</script></body></html>")).as("html"))
        .withColumn("ex", graft.functions.HtmlExprs.htmlExtract(col("html")))
        .select(col("doc_id"), col("ex.text").as("extracted"),
          col("ex.text_chars").as("text_chars"),
          col("ex.link_chars").as("link_chars"),
          col("ex.n_links").as("n_links"))
        .orderBy("doc_id"),
      Some("""WITH p AS (SELECT doc_id,
             |         trim(regexp_replace('Doc ' || doc_id || ' ' || text ||
             |           ' x & y <z> link' || (doc_id % 7),
             |           '[ \t\n\r]+', ' ', 'g')) AS extracted
             |       FROM documents)
             |SELECT doc_id, extracted,
             |       CAST(length(extracted) AS BIGINT) AS text_chars,
             |       CAST(5 AS BIGINT) AS link_chars,
             |       CAST(1 AS BIGINT) AS n_links
             |FROM p ORDER BY doc_id""".stripMargin)),

    // The WHOLE web-curation lifecycle in one declarative plan — what a
    // crawl-to-corpus run actually executes: raw HTML pages → native
    // html_extract (markup stripped, link-density counters) → C4-style
    // link-density gate on EXACT integer counters → the full CorpusFilter
    // stack (lang → quality → repetition → length → exact dedup), with
    // row-count accounting riding every stage as observe() metrics (zero
    // extra passes; the one collect() is the x35-pattern observation
    // flush). Pages are a pure function of `text` — a replicated doc_id%10
    // slice produces byte-identical pages that must survive to, and die
    // in, the dedup stage. The oracle rebuilds the extracted text in
    // closed form (the x69 law) and replays the filter stack in SQL (the
    // x35 law); every stage count is load-bearing.
    QuerySpec("x70_web_curation",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val u0 = docs.unionByName(
          docs.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        // anchor text length is text-derived so replicas build identical pages
        val pages = u0.select(col("doc_id"), concat(
          lit("<html><head><title>T</title><style>a{x:1}</style></head>" +
            "<body><nav><a href=\"/h\">"),
          expr("repeat('m', CAST(length(text) * 7 % 40 AS INT))"),
          lit("</a></nav><p>"), col("text"),
          lit("</p><!-- footer --></body></html>")).as("html"))
        val parsed = pages
          .withColumn("ex", graft.functions.HtmlExprs.htmlExtract(col("html")))
          .select(col("doc_id"), col("ex.text").as("text"),
            col("ex.text_chars").as("text_chars"),
            col("ex.link_chars").as("link_chars"))
        val (p0, pagesObs) = graft.ops.Accounting.observe(
          parsed, "web_0_pages", "rows" -> count(lit(1)))
        val gated = p0.filter(col("link_chars") * 4 <= col("text_chars"))
          .select(col("doc_id"), col("text"))
        val filtered = graft.ext.CorpusFilter(gated, col("doc_id"), col("text"))
        filtered.df.agg(count(lit(1))).collect() // flush all stage observations
        val rename = Map("0_input" -> "1_link_density", "1_lang" -> "2_lang",
          "2_quality" -> "3_quality", "3_repetition" -> "4_repetition",
          "4_length" -> "5_length", "5_dedup" -> "6_dedup")
        (("0_pages", pagesObs.get("rows").asInstanceOf[Long]) +:
          filtered.counts.map { case (n, c) => (rename(n), c) })
          .toDF("stage", "n_rows").orderBy("stage")
      },
      Some("""WITH u0 AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
             |ex AS (SELECT doc_id, length(text) * 7 % 40 AS k,
             |         trim(regexp_replace(
             |           repeat('m', CAST(length(text) * 7 % 40 AS INT)) || ' ' || text,
             |           '[ \t\n\r]+', ' ', 'g')) AS text
             |       FROM u0),
             |u AS (SELECT doc_id, text FROM ex WHERE k * 4 <= length(text)),
             |t AS (SELECT doc_id AS id, text, string_split(lower(text), ' ') AS tk FROM u),
             |f AS (SELECT id, text, len(text) AS n_chars,
             |        CASE WHEN len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))) >=
             |                  greatest(len(list_filter(tk, x -> x IN ('the','a','of','and','is'))),
             |                           len(list_filter(tk, x -> x IN ('el','los','las','es','y'))),
             |                           len(list_filter(tk, x -> x IN ('le','les','est','et','une'))),
             |                           len(list_filter(tk, x -> x IN ('的','是','了','在','和')))) THEN 'de'
             |             WHEN len(list_filter(tk, x -> x IN ('the','a','of','and','is'))) >=
             |                  greatest(len(list_filter(tk, x -> x IN ('el','los','las','es','y'))),
             |                           len(list_filter(tk, x -> x IN ('le','les','est','et','une'))),
             |                           len(list_filter(tk, x -> x IN ('的','是','了','在','和')))) THEN 'en'
             |             WHEN len(list_filter(tk, x -> x IN ('el','los','las','es','y'))) >=
             |                  greatest(len(list_filter(tk, x -> x IN ('le','les','est','et','une'))),
             |                           len(list_filter(tk, x -> x IN ('的','是','了','在','和')))) THEN 'es'
             |             WHEN len(list_filter(tk, x -> x IN ('le','les','est','et','une'))) >=
             |                  len(list_filter(tk, x -> x IN ('的','是','了','在','和'))) THEN 'fr'
             |             ELSE 'zh' END AS predicted,
             |        round(least(len(tk) * 1.0 / 100, 1.0) * 0.4
             |            + (len(list_distinct(tk)) * 1.0 / len(tk)) * 0.3
             |            + (len(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1.0 / len(text)) * 0.3, 3) AS quality,
             |        CASE WHEN len(tk) - 2 <= 0 THEN 0.0
             |             ELSE round(1.0 - len(list_distinct(list_transform(range(1, len(tk) - 1),
             |                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) * 1.0 /
             |                  (len(tk) - 2), 4) END AS rep3
             |      FROM t),
             |p1 AS (SELECT * FROM f  WHERE predicted = 'en'),
             |p2 AS (SELECT * FROM p1 WHERE quality >= 0.5),
             |p3 AS (SELECT * FROM p2 WHERE rep3 <= 0.2),
             |p4 AS (SELECT * FROM p3 WHERE n_chars BETWEEN 100 AND 20000),
             |counted AS (
             |  SELECT '0_pages' AS stage, count(*) AS n_rows FROM ex UNION ALL
             |  SELECT '1_link_density', count(*) FROM u UNION ALL
             |  SELECT '2_lang', count(*) FROM p1 UNION ALL
             |  SELECT '3_quality', count(*) FROM p2 UNION ALL
             |  SELECT '4_repetition', count(*) FROM p3 UNION ALL
             |  SELECT '5_length', count(*) FROM p4 UNION ALL
             |  SELECT '6_dedup', count(DISTINCT text) FROM p4)
             |SELECT stage, n_rows FROM counted ORDER BY stage""".stripMargin)),

    // WARC/WET container round-trip — the on-disk shape a crawl pipeline
    // actually ingests (Common Crawl WET = text-conversion records back to
    // back in one file). Per-doc records (Content-Length in BYTES — the
    // corpus has multi-byte text, so a char-length walk would corrupt
    // every record after the first non-ASCII payload) are concatenated
    // into multi-record files in deterministic in-file order, then
    // re-parsed by the native length-delimited walk. Any header or offset
    // error corrupts all later payloads in that file; the oracle is the
    // closed-form round-trip identity.
    QuerySpec("x71_warc_parse",
      (s, d) => {
        val files = Tables.documents(s, d)
          .select((col("doc_id") % crawlBuckets(s, d)).as("bucket"), col("doc_id"),
            concat(
              lit("WARC/1.0\r\nWARC-Type: conversion\r\n" +
                "WARC-Target-URI: https://crawl.test/"),
              col("doc_id"),
              lit("\r\nContent-Length: "), octet_length(col("text")),
              lit("\r\n\r\n"), col("text"), lit("\r\n\r\n")).as("rec"))
          .groupBy("bucket")
          .agg(expr("array_join(transform(array_sort(collect_list(" +
            "struct(doc_id, rec))), x -> x.rec), '')").as("file"))
        files
          .select(explode(graft.functions.WarcExprs.warcRecords(col("file"))).as("r"))
          .select(col("r.uri").as("uri"), col("r.rec_type").as("rec_type"),
            col("r.content_length").as("content_length"),
            col("r.payload").as("payload"))
          .orderBy("uri")
      },
      Some("""SELECT 'https://crawl.test/' || doc_id AS uri,
             |       'conversion' AS rec_type,
             |       CAST(strlen(text) AS BIGINT) AS content_length,
             |       text AS payload
             |FROM documents ORDER BY uri""".stripMargin)),

    // The FULL crawl-ingestion front-end, exactly as Common Crawl ships
    // it: one gzip member per WARC record, members concatenated into one
    // file per bucket (deterministic in-file order via a binary-concat
    // fold over the sorted member list), then member-draining gunzip →
    // length-delimited WARC walk → HTML extraction, all native
    // expressions in one declarative plan. The oracle never sees
    // compressed bytes — it rebuilds the extracted text and link counters
    // in closed form, so every stage (member boundaries, record offsets,
    // markup stripping) is load-bearing for the byte-exact match.
    QuerySpec("x72_crawl_ingest",
      (s, d) => {
        val pages = Tables.documents(s, d)
          .select((col("doc_id") % crawlBuckets(s, d)).as("bucket"), col("doc_id"),
            concat(lit("<html><body><p>"), col("text"),
              lit("</p><a href=\"/n\">next page</a></body></html>")).as("page"))
        val recs = pages.select(col("bucket"),
          struct(col("doc_id"), graft.functions.GzipExprs.gzipMember(concat(
            lit("WARC/1.0\r\nWARC-Type: response\r\n" +
              "WARC-Target-URI: https://crawl.test/"),
            col("doc_id"), lit("\r\nContent-Length: "), octet_length(col("page")),
            lit("\r\n\r\n"), col("page"), lit("\r\n\r\n"))).as("gz")).as("m"))
        // one-pass binary_concat: the aggregate(...concat...) fold re-copies
        // the growing accumulator per member — quadratic in per-file record
        // count, which the sf10 curve caught at 73× for 10× rows
        val files = recs.groupBy("bucket")
          .agg(graft.functions.ArrayExprs.binaryConcat(
            expr("transform(array_sort(collect_list(m)), x -> x.gz)")).as("gz_file"))
        files
          .select(explode(graft.functions.WarcExprs.warcRecords(
            graft.functions.GzipExprs.gunzipText(col("gz_file")))).as("r"))
          .select(col("r.uri").as("uri"),
            graft.functions.HtmlExprs.htmlExtract(col("r.payload")).as("ex"))
          .select(col("uri"), col("ex.text").as("extracted"),
            col("ex.link_chars").as("link_chars"), col("ex.n_links").as("n_links"))
          .orderBy("uri")
      },
      Some("""SELECT 'https://crawl.test/' || doc_id AS uri,
             |       trim(regexp_replace(text || ' next page',
             |         '[ \t\n\r]+', ' ', 'g')) AS extracted,
             |       CAST(8 AS BIGINT) AS link_chars,
             |       CAST(1 AS BIGINT) AS n_links
             |FROM documents ORDER BY uri""".stripMargin)),

    // PDF triage + text extraction — the document-side multimodal family
    // (PDF is the dominant non-HTML format in crawled corpora). Real
    // multi-page PDFs built per document (catalog → pages tree → /Length-
    // delimited content streams, alternating pages Flate-compressed so the
    // inflate path is load-bearing), then header-only triage (version,
    // object count, page count via the startxref→xref→trailer walk) and
    // full text extraction ((…) Tj operands with PDF escape decoding). The
    // per-page text is a pure function of (page, nPages, doc_id), so the
    // oracle rebuilds the exact extracted string in closed form.
    QuerySpec("x73_pdf_extract",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), (col("doc_id") % 5 + 1).as("np"))
        .withColumn("pdf", graft.functions.PdfExprs.encodePdf(col("np"), col("doc_id")))
        .withColumn("meta", graft.functions.PdfExprs.pdfMeta(col("pdf")))
        .select(col("doc_id"), col("meta.version").as("version"),
          col("meta.n_objects").as("n_objects"), col("meta.n_pages").as("n_pages"),
          graft.functions.PdfExprs.pdfText(col("pdf")).as("pdf_body"))
        .orderBy("doc_id"),
      Some("""WITH p AS (SELECT doc_id, doc_id % 5 + 1 AS np FROM documents),
             |pg AS (SELECT doc_id, np, unnest(range(1, np + 1)) AS i FROM p),
             |t AS (SELECT doc_id, np,
             |        string_agg('Page ' || i || ' of ' || np || ' #' || doc_id,
             |                   ' ' ORDER BY i) AS pdf_body
             |      FROM pg GROUP BY 1, 2)
             |SELECT doc_id, '1.4' AS version,
             |       CAST(3 + 2 * np AS BIGINT) AS n_objects,
             |       CAST(np AS BIGINT) AS n_pages, pdf_body
             |FROM t ORDER BY doc_id""".stripMargin)),

    // CCNet perplexity bucketing — the published CCNet curation step that
    // follows LM scoring: rank docs by per-bigram score ascending and cut
    // the corpus into head/middle/tail at 1/3 and 2/3 of CUMULATIVE TOKEN
    // MASS (equal token budget per bucket, not equal doc count). Exact
    // integer arithmetic end-to-end (truncating long division for the
    // per-doc score, cum×3 ≤ k×total comparisons for the cuts); the global
    // cumulative order runs through the distributed prefix sum, never a
    // single-partition window.
    QuerySpec("x74_ccnet_buckets",
      (s, d) => graft.ext.LmScore.perplexityBuckets(Tables.documents(s, d),
          col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .select(col("doc_id"), col("n_bigrams"), col("avg_micro"), col("bucket"))
        .orderBy("doc_id"),
      Some("""WITH tok AS (SELECT doc_id,
             |         list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                     x -> x <> '') AS t
             |       FROM documents),
             |bg AS (SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
             |       FROM tok WHERE len(t) >= 2),
             |b2 AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bg),
             |c12 AS (SELECT w1, w2, count(*) AS n12 FROM b2 GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS n1 FROM b2 GROUP BY 1),
             |v AS (SELECT count(DISTINCT x) AS v
             |      FROM (SELECT unnest(t) AS x FROM tok)),
             |sc AS (SELECT doc_id,
             |         CAST(round(-ln((n12 + 1.0) / (n1 + v)) * 1000000, 0) AS BIGINT) AS s
             |       FROM b2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
             |agg AS (SELECT doc_id, count(*) AS n_bigrams,
             |          CAST(sum(s) AS BIGINT) AS nll FROM sc GROUP BY 1),
             |a AS (SELECT doc_id, n_bigrams,
             |        CAST(nll // n_bigrams AS BIGINT) AS avg_micro FROM agg),
             |c AS (SELECT doc_id, n_bigrams, avg_micro,
             |        sum(n_bigrams) OVER (ORDER BY avg_micro, doc_id) AS cum,
             |        sum(n_bigrams) OVER () AS total FROM a)
             |SELECT doc_id, n_bigrams, avg_micro,
             |       CASE WHEN cum * 3 <= total THEN 'head'
             |            WHEN cum * 3 <= 2 * total THEN 'middle'
             |            ELSE 'tail' END AS bucket
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Dolma-shape corpus ingest: `.jsonl.zst` files — the published
    // distribution format of the big open training corpora — rebuilt
    // end-to-end: each doc becomes a JSON line (to_json escapes embedded
    // newlines, so a line IS a record), every line compresses to its own
    // zstd frame, frames concatenate into one file per bucket (RFC 8878
    // streams = frame sequences — the seekable-record layout), then the
    // read side drains frames → splits lines → parses JSON. A
    // first-frame-only reader, a frame-boundary error, or a JSON escaping
    // mismatch each corrupts the round trip; the oracle never sees
    // compressed bytes.
    QuerySpec("x75_dolma_ingest",
      (s, d) => {
        val lines = Tables.documents(s, d)
          .select((col("doc_id") % crawlBuckets(s, d)).as("bucket"), col("doc_id"),
            graft.functions.ZstdExprs.zstdFrame(
              concat(to_json(struct(col("doc_id").as("id"), col("text"))), lit("\n")))
              .as("zline"))
        val files = lines.groupBy("bucket")
          .agg(graft.functions.ArrayExprs.binaryConcat(
            expr("transform(array_sort(collect_list(struct(doc_id, zline))), x -> x.zline)"))
            .as("zst_file"))
        files
          .select(explode(split(graft.functions.ZstdExprs.unzstdText(col("zst_file")),
            "\n")).as("line"))
          .filter(col("line") =!= "")
          .select(from_json(col("line"),
            org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, text STRING")).as("j"))
          .select(col("j.id").as("doc_id"), col("j.text").as("text"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, text FROM documents ORDER BY doc_id")),

    // Streaming compressed-crawl ingest gate: the x75 container format
    // arriving as a live stream — three micro-batches of `.jsonl.zst`
    // containers, each drained (zstd frames → JSON lines → documents) and
    // pushed through the Gopher rule gauntlet at ingest; only keepers are
    // appended. The oracle replays x65's closed-form rule arithmetic over
    // the batch table with the keep predicate inlined — so container
    // framing, JSON escaping, AND every integer rule threshold are
    // load-bearing across the stream/batch boundary.
    QuerySpec("st14_stream_crawl_gate",
      (s, d) => {
        // the synthetic corpus carries no Gopher stopwords, so the raw
        // gauntlet keeps nothing — plant fluent twins (id+1e6, stopword
        // tail) that PASS, st13's planted-row pattern: the kept set is
        // non-empty and every rule still decides who's in it
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
          .unionByName(Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" the be to of and that have with")).as("text")))
        val src = Staging.slicedSource("crawlg", d) { tmp =>
          (0 until 3).foreach { r =>
            val lines = docs.filter(col("doc_id") % 3 === r)
              .select((col("doc_id") % crawlBuckets(s, d)).as("bucket"), col("doc_id"),
                graft.functions.ZstdExprs.zstdFrame(
                  concat(to_json(struct(col("doc_id").as("id"), col("text"))),
                    lit("\n"))).as("zline"))
            val containers = lines.groupBy("bucket")
              .agg(graft.functions.ArrayExprs.binaryConcat(
                expr("transform(array_sort(collect_list(struct(doc_id, zline))), " +
                  "x -> x.zline)")).as("zst_file"))
            Staging.writeSlice(containers, s"$tmp/src/slice$r")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_crawlg_run").toString
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.CrawlGate.start(s,
            s.readStream
              .schema(org.apache.spark.sql.types.StructType.fromDDL(
                "bucket BIGINT, zst_file BINARY"))
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            "zst_file", outDir = s"$tmp/out", checkpoint = s"$tmp/ckpt")
          q.awaitTermination()
        }
        s.read.option("recursiveFileLookup", "true").parquet(s"$tmp/out")
          .select(col("doc_id"), col("n_words"), col("chars"), col("stop_hits"),
            col("dup3"), col("total3"))
          .orderBy("doc_id")
      },
      Some("""WITH src AS (SELECT doc_id, text FROM documents
             |       UNION ALL
             |       SELECT doc_id + 1000000, text || ' the be to of and that have with'
             |       FROM documents WHERE doc_id % 2 = 0),
             |t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS t
             |       FROM src),
             |g AS (SELECT doc_id, list_transform(range(1, len(t) - 1),
             |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g
             |      FROM t),
             |b AS (SELECT t.doc_id,
             |        CAST(len(t.t) AS BIGINT) AS n_words,
             |        CAST(list_sum(list_transform(t.t, x -> len(x))) AS BIGINT) AS chars,
             |        CAST(len(list_filter(t.t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_words,
             |        CAST(len(list_intersect(list_distinct(t.t),
             |          ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits,
             |        CAST((len(t.text) - len(replace(t.text, '#', ''))) +
             |             (len(t.text) - len(replace(t.text, '...', ''))) // 3 AS BIGINT) AS sym_hits,
             |        CAST(len(g.g) - len(list_distinct(g.g)) AS BIGINT) AS dup3,
             |        CAST(len(g.g) AS BIGINT) AS total3
             |      FROM t JOIN g USING (doc_id))
             |SELECT doc_id, n_words, chars, stop_hits, dup3, total3
             |FROM b
             |WHERE n_words BETWEEN 50 AND 100000
             |  AND chars BETWEEN 3 * n_words AND 10 * n_words
             |  AND sym_hits * 10 <= n_words
             |  AND alpha_words * 5 >= 4 * n_words
             |  AND stop_hits >= 2
             |  AND dup3 * 50 <= total3 * 9
             |ORDER BY doc_id""".stripMargin)),

    // Z-order layout clustering: the multi-dimension file-skipping key
    // (Layout.zValue — static shift/mask column arithmetic, no UDF). Every
    // event maps to a point in a 256×256 (user, minute-of-day) grid; the
    // top 4 z-bits partition the grid into 16 quadrant cells. The query
    // emits per-cell row counts, exact z-sums, and the min/max of BOTH
    // dimensions — the locality law a z-clustered file layout delivers
    // (each cell is a bounded rectangle, so parquet stats stay tight in
    // both columns). The oracle replays the bit interleave in SQL.
    QuerySpec("x76_zorder_layout",
      (s, d) => {
        val bits = 8
        val ev = Tables.events(s, d)
          .select((col("user_id") % 256).as("a"),
            ((hour(col("ts")) * 60 + minute(col("ts"))) % 256).cast("long").as("b"))
          .withColumn("z", graft.io.Layout.zValue(col("a"), col("b"), bits))
        ev.withColumn("cell", shiftright(col("z"), 2 * bits - 4))
          .groupBy("cell")
          .agg(count(lit(1)).as("n"), sum(col("z")).as("z_sum"),
            min("a").as("min_a"), max("a").as("max_a"),
            min("b").as("min_b"), max("b").as("max_b"))
          .orderBy("cell")
      },
      Some("""WITH p AS (SELECT user_id % 256 AS a,
             |         (hour(CAST(ts AS TIMESTAMP)) * 60
             |          + minute(CAST(ts AS TIMESTAMP))) % 256 AS b
             |       FROM events),
             |z AS (SELECT a, b,
             |        list_sum(list_transform(range(0, 8), i ->
             |          ((a >> i) & 1) * (1 << (2*i))
             |          + ((b >> i) & 1) * (1 << (2*i + 1)))) AS z
             |      FROM p)
             |SELECT CAST(z >> 12 AS BIGINT) AS cell,
             |       count(*) AS n, CAST(sum(z) AS BIGINT) AS z_sum,
             |       CAST(min(a) AS BIGINT) AS min_a, CAST(max(a) AS BIGINT) AS max_a,
             |       CAST(min(b) AS BIGINT) AS min_b, CAST(max(b) AS BIGINT) AS max_b
             |FROM z GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Incremental PQ maintenance — the x56 story for the compressed index:
    // append new vectors by ENCODING them with the existing codebooks (one
    // narrow pass; no retrain, no base re-scan) and laying their codes as
    // new files beside the base table. Serve = the x41 ADC scan + exact
    // rerank over base ∪ delta; planted twins (all in the delta) must
    // surface as top-1. The drift check that says when append must give
    // way to retrain is pinned in the x78 verifier.
    QuerySpec("x77_pq_append",
      (s, d) => {
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        val (cb, codesDir, _) = pqaArtifacts(s, d)
        val codes = s.read.option("recursiveFileLookup", "true").parquet(codesDir)
        Similarity.pqTopKFromCodes(q, codes, annCorpus(s, d), 5, cb)
          .filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // x77's VERIFIER (bench-excluded, x60 pattern): appended-PQ top-5 must
    // overlap the exact brute force over base ∪ delta by ≥ 40/50 (bounds
    // the recall cost of serving appended data from codebooks that never
    // saw it), and the drift check must report the same-distribution delta
    // as NOT needing a retrain (mean self-reconstruction cosine within
    // margin of the held-out calibration slice's build-time value).
    QuerySpec("x78_pq_append_verify",
      (s, d) => {
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        val (cb, codesDir, drift) = pqaArtifacts(s, d)
        val codes = s.read.option("recursiveFileLookup", "true").parquet(codesDir)
        val pq = Similarity.pqTopKFromCodes(q, codes, annCorpus(s, d), 5, cb)
        val bf = Similarity.bruteForceTopK(q, annCorpus(s, d), 5)
        val totalOverlap = pq.select("query_id", "neighbor_id")
          .join(bf.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("__n"))
        pq.filter(col("rk") === 1)
          .select(col("query_id"), col("neighbor_id").as("top1_neighbor_id"))
          .crossJoin(totalOverlap)
          .select(col("query_id"), col("top1_neighbor_id"),
            (col("__n") >= 40).cast("long").as("recall_ok"),
            lit(!drift.shouldRetrain).cast("long").as("drift_ok"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS top1_neighbor_id,
             |       CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS drift_ok
             |FROM embeddings WHERE vec_id < 10 ORDER BY 1""".stripMargin)),

    // Streaming DSIR quality gate: the x64 model trained ONCE into a
    // parquet weight artifact, then three micro-batches scored against it
    // at ingest — including planted docs carrying an out-of-vocabulary
    // token, so the unseen-floor serve path runs end-to-end in both
    // engines. Kept = mean per-token importance >= 0 micro-nats.
    QuerySpec("st13_stream_dsir_gate",
      (s, d) => {
        val stream = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val weightsDir = Staging.dir("dsirw", d) { tmp =>
          graft.ext.Dsir.weightTable(Tables.documents(s, d),
            col("text"), col("lang") === "en").write.parquet(s"$tmp/w")
        }
        val src = Staging.slicedSource("dsg", d) { tmp =>
          val planted = stream.filter(col("doc_id") % 15 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" zzznovel")).as("text"))
          val slices = Seq(
            stream.filter(col("doc_id") % 3 === 0),
            stream.filter(col("doc_id") % 3 === 1),
            stream.filter(col("doc_id") % 3 === 2).unionByName(planted))
          slices.zipWithIndex.foreach { case (df, i) =>
            Staging.writeSlice(df, s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_dsg_run").toString
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.DsirGate.start(s,
            s.readStream.schema(stream.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            "doc_id", "text",
            weightsPath = s"$weightsDir/w", outDir = s"$tmp/out",
            checkpoint = s"$tmp/ckpt")
          q.awaitTermination()
        }
        s.read.option("recursiveFileLookup", "true").parquet(s"$tmp/out")
          .select(col("doc_id"), col("n_tokens"), col("score_micro"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, lang = 'en' AS tgt,
             |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                            x -> x <> '')) AS w
             |       FROM documents),
             |tot AS (SELECT count(*) AS ns,
             |               count(*) FILTER (WHERE tgt) AS nt,
             |               count(DISTINCT w) AS v FROM tok),
             |wt AS (SELECT w,
             |         CAST(round((ln((count(*) FILTER (WHERE tgt) + 1.0) / (nt + v))
             |                   - ln((count(*) + 1.0) / (ns + v))) * 1000000, 0)
             |              AS BIGINT) AS wm
             |       FROM tok, tot GROUP BY w, nt, ns, v),
             |dflt AS (SELECT CAST(round((ln(1.0 / (nt + v)) - ln(1.0 / (ns + v)))
             |                * 1000000, 0) AS BIGINT) AS dwm FROM tot),
             |stream AS (SELECT doc_id, text FROM documents
             |           UNION ALL
             |           SELECT doc_id + 1000000, text || ' zzznovel'
             |           FROM documents WHERE doc_id % 15 = 0),
             |stok AS (SELECT doc_id,
             |           unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                              x -> x <> '')) AS w
             |         FROM stream),
             |sc AS (SELECT s.doc_id, count(*) AS n_tokens,
             |              CAST(sum(coalesce(wt.wm, dflt.dwm)) AS BIGINT) AS score_micro
             |       FROM stok s LEFT JOIN wt ON s.w = wt.w, dflt GROUP BY 1)
             |SELECT doc_id, n_tokens, score_micro FROM sc
             |WHERE score_micro >= 0 ORDER BY doc_id""".stripMargin)),

    // BM25 lexical retrieval: build the inverted index over documents and
    // serve three fixed queries top-10. The oracle replays the ENTIRE
    // closed form — tokenization, tf/dl/df aggregation, corpus stats,
    // Lucene-idf × saturated-tf in micro-units, rank ties by id — so the
    // index build and the serve join are both load-bearing. Unmatched
    // query terms (q3's 'similarity') must contribute nothing.
    QuerySpec("x79_bm25_search",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val idx = graft.ext.Bm25.index(docs, col("doc_id"), col("text"))
        val qs = Seq((1L, "fast table scan"), (2L, "window agg batch merge"),
          (3L, "vector similarity spark")).toDF("qid", "qtext")
        graft.ext.Bm25.search(idx, qs, col("qid"), col("qtext"), topK = 10)
          .orderBy("qid", "rk")
      },
      Some("""WITH terms AS (SELECT doc_id AS id,
             |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                            x -> x <> '')) AS term
             |       FROM documents WHERE text IS NOT NULL),
             |tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
             |dl AS (SELECT id, count(*) AS dl FROM terms GROUP BY 1),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS s FROM dl),
             |q AS (SELECT * FROM (VALUES (1, 'fast table scan'),
             |                            (2, 'window agg batch merge'),
             |                            (3, 'vector similarity spark')) AS q(qid, qtext)),
             |qt AS (SELECT DISTINCT qid,
             |         unnest(list_filter(regexp_split_to_array(lower(qtext), '\s+'),
             |                            x -> x <> '')) AS term
             |       FROM q),
             |m AS (SELECT qt.qid, tf.id,
             |         CAST(round(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
             |              * ((tf.tf * (1.2 + 1.0))
             |                 / (tf.tf + 1.2 * (1.0 - 0.75
             |                    + 0.75 * dl.dl * stats.n / stats.s)))
             |              * 1000000.0, 0) AS BIGINT) AS sc
             |       FROM qt JOIN tf USING (term) JOIN dfq ON qt.term = dfq.term
             |            JOIN dl ON tf.id = dl.id, stats),
             |agg AS (SELECT qid, id, CAST(sum(sc) AS BIGINT) AS score_micro
             |        FROM m GROUP BY 1, 2),
             |rnk AS (SELECT qid, id, score_micro,
             |          row_number() OVER (PARTITION BY qid
             |                             ORDER BY score_micro DESC, id) AS rk
             |        FROM agg)
             |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS BIGINT) AS rk,
             |       CAST(id AS BIGINT) AS id, score_micro
             |FROM rnk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin)),

    // Unigram-LM (SentencePiece-family) tokenizer, corpus-trained: seed-
    // frequency vocab over the sf dir's documents (cached per JVM — vocab
    // training is an offline artifact like the ANN indexes), then the
    // Viterbi encoder over every document with the id-level decode closing
    // the loop. Byte fallback makes encode total, so roundtrip_ok must be
    // 1 on EVERY doc — including multi-byte unicode the trained vocab
    // never saw.
    QuerySpec("x80_unigram_roundtrip",
      (s, d) => {
        import graft.functions.GraftUnigram
        val bc = s.sparkContext.broadcast(unigramVocab(s, d))
        Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"),
            GraftUnigram.unigramIdsBc(col("text"), bc).as("ids"))
          .select(col("doc_id"),
            length(col("text").cast("binary")).cast("long").as("n_bytes"),
            (GraftUnigram.unigramDetokIds(col("ids"), bc) === col("text"))
              .cast("long").as("roundtrip_ok"),
            (size(col("ids")).cast("long") <= length(col("text").cast("binary")))
              .cast("long").as("bounds_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CAST(1 AS BIGINT) AS roundtrip_ok, CAST(1 AS BIGINT) AS bounds_ok
             |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin)),

    // The Viterbi DP itself, pinned value-by-value: the deterministic
    // corpus-independent synthetic vocab (letter 2/3-grams at scores that
    // force real segmentation choices, incl. the 3+1 ≡ 2+2 tie on four
    // letters) over the fixture strings, against an INDEPENDENT python
    // reimplementation (scripts/unigram_oracle.py) frozen into VALUES.
    QuerySpec("x81_unigram_fixture",
      (s, d) => {
        import s.implicits._
        import graft.functions.{GraftUnigram, Unigram}
        val bc = s.sparkContext.broadcast(Unigram.syntheticVocab)
        BpeFixture.strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("fid", "text")
          .select(col("fid"), GraftUnigram.unigramIdsBc(col("text"), bc).as("ids"))
          .select(col("fid"), size(col("ids")).cast("long").as("n_pieces"),
            aggregate(col("ids"), lit(0L), (acc, x) => acc + x).as("id_sum"))
          .orderBy("fid")
      },
      Some("""SELECT CAST(fid AS BIGINT) AS fid, CAST(n AS BIGINT) AS n_pieces,
             |       CAST(ids AS BIGINT) AS id_sum
             |FROM (VALUES (0,23,104681),(1,29,177763),(2,29,103873),(3,25,95688),
             |             (4,28,351723),(5,38,53548),(6,11,82054),(7,1,97),(8,0,0),
             |             (9,25,171930),(10,16,68207),(11,29,442620)) AS t(fid, n, ids)
             |ORDER BY fid""".stripMargin)),

    // Token-budget epoch mixing: budget = 3× the corpus token mass,
    // weights chosen so the cap binds (src0/src1), full+partial epochs mix
    // (src4/src5), and a sub-availability source emits a partial epoch
    // only (src6). The oracle replays the exact integer plan (ppm×budget
    // div 1e6, epoch cap, md5-order prefix cut) and the per-(source,
    // epoch) doc/token totals pin both the copies and the cut boundary.
    QuerySpec("x82_epoch_mix",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val budget = docs.agg((sum(col("n_chars")) * 3).cast("long").as("__budget"))
        Curation.epochMix(docs, col("source"), col("doc_id"), col("n_chars"),
            Map("src0" -> 400000L, "src1" -> 250000L, "src4" -> 50000L,
              "src5" -> 20000L, "src6" -> 8000L),
            budget, maxEpochs = 4)
          .groupBy("source", "epoch")
          .agg(n.as("n_docs"), sum(col("tokens")).as("tokens_emitted"))
          .orderBy("source", "epoch")
      },
      Some("""WITH base AS (SELECT source, doc_id AS id, n_chars AS tokens,
             |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) AS b
             |       FROM documents WHERE text IS NOT NULL),
             |bud AS (SELECT 3 * sum(tokens) AS budget FROM base),
             |w AS (SELECT * FROM (VALUES ('src0', 400000), ('src1', 250000),
             |                            ('src4', 50000), ('src5', 20000),
             |                            ('src6', 8000)) AS w(source, ppm)),
             |plan AS (SELECT a.source, a.a,
             |           least((w.ppm * bud.budget) // 1000000 // a.a, 4) AS efull,
             |           CASE WHEN (w.ppm * bud.budget) // 1000000 // a.a < 4
             |                THEN (w.ppm * bud.budget) // 1000000
             |                     - ((w.ppm * bud.budget) // 1000000 // a.a) * a.a
             |                ELSE 0 END AS rem
             |         FROM (SELECT source, sum(tokens) AS a FROM base GROUP BY 1) a
             |         JOIN w USING (source), bud),
             |full_e AS (SELECT base.source,
             |             unnest(generate_series(1, CAST(efull AS BIGINT))) AS epoch,
             |             id, tokens
             |           FROM base JOIN plan USING (source) WHERE efull >= 1),
             |part AS (SELECT base.source, id, tokens, efull, rem,
             |           coalesce(sum(tokens) OVER (PARTITION BY base.source
             |             ORDER BY b, id ROWS BETWEEN UNBOUNDED PRECEDING
             |             AND 1 PRECEDING), 0) AS pre
             |         FROM base JOIN plan USING (source) WHERE rem > 0),
             |partial AS (SELECT source, efull + 1 AS epoch, id, tokens
             |            FROM part WHERE pre + tokens <= rem),
             |unioned AS (SELECT * FROM full_e UNION ALL SELECT * FROM partial)
             |SELECT source, CAST(epoch AS BIGINT) AS epoch,
             |       count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS tokens_emitted
             |FROM unioned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Snapshot manifest / time travel: three commits staged once per JVM
    // (append ⅓ of documents, append another ⅓, then a REMOVE commit
    // dropping v1's files) plus a checkpoint — then every version is
    // resolved and aggregated through the manifest. The oracle replays the
    // version algebra directly on the source table: v1 = slice A,
    // v2 = A ∪ B, v3 = B (remove really un-references A; time travel to
    // v1/v2 still sees it).
    QuerySpec("x83_snapshot_timetravel",
      (s, d) => {
        import graft.io.Snapshots
        val t = Staging.dir("snap", d) { tmp =>
          val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
          val tbl = s"$tmp/tbl"
          Snapshots.commitAppend(docs.filter(col("doc_id") % 3 === 0), tbl)
          Snapshots.commitAppend(docs.filter(col("doc_id") % 3 === 1), tbl)
          Snapshots.commit(s, tbl, adds = Nil,
            removes = Snapshots.liveFiles(s, tbl, Some(1)))
          Snapshots.checkpoint(s, tbl)
        } + "/tbl"
        def at(v: Long) = Snapshots.readAt(s, t, Some(v))
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .select(lit(v).as("version"), col("n_docs"), col("sum_chars"))
        at(1).unionByName(at(2)).unionByName(at(3)).orderBy("version")
      },
      Some("""WITH s AS (SELECT doc_id % 3 AS sl, n_chars FROM documents)
             |SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM s WHERE sl = 0
             |UNION ALL
             |SELECT 2, count(*), CAST(sum(n_chars) AS BIGINT) FROM s WHERE sl IN (0, 1)
             |UNION ALL
             |SELECT 3, count(*), CAST(sum(n_chars) AS BIGINT) FROM s WHERE sl = 1
             |ORDER BY version""".stripMargin)),

    // Encoding repair: documents are corrupted IN-PLAN with the three
    // classic crawl defects — CP1252 mojibake ("café déjà" as
    // "cafÃ© dÃ©jÃ ", NBSP continuation included), an em-dash
    // double-encode ("â€”"), and control/zero-width litter — then repaired
    // by the native expressions. The oracle builds the EXPECTED clean text
    // closed-form (chr() codepoints) and compares md5s byte-exactly, so
    // the repair must fix every plant and touch nothing else; exact
    // per-doc fix/strip counts ride along.
    QuerySpec("x84_encoding_repair",
      (s, d) => {
        import graft.functions.EncodingExprs
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val corrupted = docs.select(col("doc_id"), concat(col("text"),
          when(col("doc_id") % 7 === 0,
            lit(" caf\u00C3\u00A9 d\u00C3\u00A9j\u00C3\u00A0")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit("x\u0007y\u200Bz")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\u00E2\u20AC\u201Ddash")).otherwise(lit(""))).as("raw"))
        corrupted
          .withColumn("__m", EncodingExprs.mojibakeRepair(col("raw")))
          .withColumn("__c", EncodingExprs.controlStrip(col("__m.text")))
          .select(col("doc_id"),
            md5(col("__c.text").cast("binary")).as("repaired_md5"),
            col("__m.n_changed").as("n_fixed"),
            col("__c.n_changed").as("n_stripped"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  md5(text
             |    || CASE WHEN doc_id % 7 = 0
             |            THEN ' caf' || chr(233) || ' d' || chr(233) || 'j' || chr(224)
             |            ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0 THEN 'xyz' ELSE '' END
             |    || CASE WHEN doc_id % 11 = 0 THEN chr(8212) || 'dash' ELSE '' END)
             |    AS repaired_md5,
             |  CAST(CASE WHEN doc_id % 7 = 0 THEN 3 ELSE 0 END
             |     + CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_fixed,
             |  CAST(CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 0 END AS BIGINT) AS n_stripped
             |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin)),

    // x79's SERVE-ONLY split (the x18/x41 posture): the inverted index is
    // persisted ONCE per JVM — term-hash-partitioned postings plus a
    // one-row stats sidecar — and the benched query times only the
    // partition-pruned serve. Results must be IDENTICAL to x79 (same
    // oracle SQL): the layout changes the plan, never a score.
    QuerySpec("x85_bm25_serve",
      (s, d) => {
        import s.implicits._
        val idxDir = Staging.dir("bm25idx", d) { tmp =>
          val docs = Tables.documents(s, d).filter(col("text").isNotNull)
          graft.ext.Bm25.writeIndex(
            graft.ext.Bm25.index(docs, col("doc_id"), col("text")), s"$tmp/idx")
        } + "/idx"
        val qs = Seq((1L, "fast table scan"), (2L, "window agg batch merge"),
          (3L, "vector similarity spark")).toDF("qid", "qtext")
        graft.ext.Bm25.searchPersisted(s, idxDir, qs, col("qid"), col("qtext"), topK = 10)
          .orderBy("qid", "rk")
      },
      Some("""WITH terms AS (SELECT doc_id AS id,
             |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                            x -> x <> '')) AS term
             |       FROM documents WHERE text IS NOT NULL),
             |tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
             |dl AS (SELECT id, count(*) AS dl FROM terms GROUP BY 1),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS s FROM dl),
             |q AS (SELECT * FROM (VALUES (1, 'fast table scan'),
             |                            (2, 'window agg batch merge'),
             |                            (3, 'vector similarity spark')) AS q(qid, qtext)),
             |qt AS (SELECT DISTINCT qid,
             |         unnest(list_filter(regexp_split_to_array(lower(qtext), '\s+'),
             |                            x -> x <> '')) AS term
             |       FROM q),
             |m AS (SELECT qt.qid, tf.id,
             |         CAST(round(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
             |              * ((tf.tf * (1.2 + 1.0))
             |                 / (tf.tf + 1.2 * (1.0 - 0.75
             |                    + 0.75 * dl.dl * stats.n / stats.s)))
             |              * 1000000.0, 0) AS BIGINT) AS sc
             |       FROM qt JOIN tf USING (term) JOIN dfq ON qt.term = dfq.term
             |            JOIN dl ON tf.id = dl.id, stats),
             |agg AS (SELECT qid, id, CAST(sum(sc) AS BIGINT) AS score_micro
             |        FROM m GROUP BY 1, 2),
             |rnk AS (SELECT qid, id, score_micro,
             |          row_number() OVER (PARTITION BY qid
             |                             ORDER BY score_micro DESC, id) AS rk
             |        FROM agg)
             |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS BIGINT) AS rk,
             |       CAST(id AS BIGINT) AS id, score_micro
             |FROM rnk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin))
  ) ++ Seq(st15Spec, st16Spec, x86Spec, x87Spec, x88Spec, x89Spec,
    x90Spec, x91Spec, x92Spec, x93Spec, x94Spec, x95Spec, st17Spec,
    x96Spec, x97Spec, st18Spec, x98Spec, x99Spec, x100Spec, st19Spec,
    x101Spec, x102Spec, x103Spec, x104Spec, st20Spec, x105Spec, x106Spec, x107Spec, x108Spec,
    x109Spec, x110Spec, x111Spec, x112Spec, x113Spec, x114Spec,
    x115Spec, x116Spec, x117Spec, x118Spec, x119Spec, st21Spec,
    x120Spec, x121Spec, st22Spec, x122Spec, x123Spec, x124Spec, x125Spec,
    x126Spec, x127Spec, x128Spec, st23Spec, st24Spec,
    x129Spec, x130Spec, st25Spec, x131Spec, x132Spec, st26Spec, x133Spec,
    x134Spec, st27Spec, x135Spec, x136Spec, x137Spec, st28Spec, x138Spec,
    x139Spec, x140Spec, x141Spec, x142Spec, st29Spec, x143Spec, x144Spec,
    x145Spec, x146Spec, st30Spec, x147Spec, x148Spec, x149Spec, x150Spec,
    x151Spec, x152Spec, x153Spec, x154Spec, x155Spec, x156Spec, x157Spec, x158Spec, x159Spec, x160Spec, x161Spec, x162Spec, x163Spec, x164Spec, x165Spec, x166Spec, x167Spec, st31Spec,
    x168Spec, x169Spec, x170Spec, x171Spec, x172Spec, st32Spec, x173Spec,
    x174Spec, x175Spec, x176Spec, x177Spec, x178Spec, x179Spec)

  // robots.txt politeness gate (RFC 9309) over a planted policy: group
  // selection (specific agent beats *), longest-match rules, $ anchors,
  // * wildcards, case-sensitive paths. The oracle states the expected
  // verdict per (agent, path) cell — every rule interaction is a visible
  // hand-derivable case, and 'otherbot' must fall through to the
  // deny-all * group.
  private def x89Spec: QuerySpec =
    QuerySpec("x89_robots_gate",
      (s, d) => {
        val robots = Seq(
          "User-agent: graftbot",
          "Disallow: /private/",
          "Allow: /private/ok/",
          "Disallow: /*.pdf$",
          "Allow: /",
          "",
          "User-agent: *",
          "Disallow: /").mkString("\n")
        val paths = array(Seq("/", "/public/a.html", "/private/x",
          "/private/ok/y", "/doc/a.pdf", "/doc/a.pdfx", "/private",
          "/a/b.PDF").map(lit): _*)
        Tables.documents(s, d).filter(col("doc_id") < 64)
          .select(col("doc_id"),
            when(col("doc_id") % 2 === 0, lit("graftbot"))
              .otherwise(lit("otherbot")).as("agent"),
            element_at(paths, (col("doc_id") % 8 + 1).cast("int")).as("path"))
          .withColumn("allowed",
            graft.functions.RobotsExprs.robotsAllowed(lit(robots), col("agent"),
              col("path")).cast("long"))
          .select(col("doc_id"), col("agent"), col("path"), col("allowed"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |         CASE WHEN doc_id % 2 = 0 THEN 'graftbot'
             |              ELSE 'otherbot' END AS agent,
             |         ['/', '/public/a.html', '/private/x', '/private/ok/y',
             |          '/doc/a.pdf', '/doc/a.pdfx', '/private',
             |          '/a/b.PDF'][CAST(doc_id % 8 + 1 AS INT)] AS path,
             |         doc_id % 8 AS pidx
             |       FROM documents WHERE doc_id < 64)
             |SELECT doc_id, agent, path,
             |       CAST(CASE WHEN agent = 'otherbot' THEN 0
             |                 WHEN pidx IN (2, 4) THEN 0
             |                 ELSE 1 END AS BIGINT) AS allowed
             |FROM p ORDER BY doc_id""".stripMargin))

  /** x88's EM-trained vocab: corpus-INDEPENDENT (trained on the fixture
    * strings), so the frozen python oracle is valid at every sf. Trained
    * once per JVM. */
  private val emState =
    new java.util.concurrent.ConcurrentHashMap[String, graft.functions.Unigram.Vocab]()
  private def emVocab(s: SparkSession): graft.functions.Unigram.Vocab =
    emState.computeIfAbsent("em", { _ =>
      import s.implicits._
      graft.functions.Unigram.trainEm(BpeFixture.strings.toDF("text"), col("text"),
        vocabSize = 160, maxPieceLen = 4, iters = 2)
    })

  // The FULL unigram trainer (seed + distributed EM + prune) pinned end to
  // end: vocab trained on the fixture corpus by the Scala side, fixtures
  // encoded under it, and the (fid, n_pieces, id_sum) triple must equal
  // the independent python retrain+re-encode (scripts/unigram_em_oracle.py
  // — forward/backward float math bit-mirrored, micro-rounding inside the
  // word, same prune rule, same final ln scoring).
  private def x88Spec: QuerySpec =
    QuerySpec("x88_unigram_em",
      (s, d) => {
        import s.implicits._
        import graft.functions.GraftUnigram
        val bc = s.sparkContext.broadcast(emVocab(s))
        BpeFixture.strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("fid", "text")
          .select(col("fid"), GraftUnigram.unigramIdsBc(col("text"), bc).as("ids"))
          .select(col("fid"), size(col("ids")).cast("long").as("n_pieces"),
            aggregate(col("ids"), lit(0L), (acc, x) => acc + x).as("id_sum"))
          .orderBy("fid")
      },
      Some("""SELECT CAST(fid AS BIGINT) AS fid, CAST(n AS BIGINT) AS n_pieces,
             |       CAST(ids AS BIGINT) AS id_sum
             |FROM (VALUES (0,32,4332),(1,37,5039),(2,25,2947),(3,30,3259),
             |             (4,25,4380),(5,34,3121),(6,11,1342),(7,1,112),(8,0,0),
             |             (9,34,5071),(10,18,1978),(11,11,2800)) AS t(fid, n, ids)
             |ORDER BY fid""".stripMargin))

  /** st16: streaming BM25 index maintenance — three micro-batches append
    * postings + partial stats through snapshot manifests; the serve after
    * the drain must produce EXACTLY the batch-built x79 ranking (same
    * oracle SQL: the appendable layout derives df at serve time and sums
    * the stats partials, so scores are identical by construction). */
  private def st16Spec: QuerySpec =
    QuerySpec("st16_stream_bm25_ingest",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"))
        val src = Staging.slicedSource("bm25ing", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(docs.filter(col("doc_id") % 3 === i), s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_bm25ing_run").toString
        val root = s"$tmp/idx"
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.Bm25Ingest.start(s,
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            "doc_id", "text", root, s"$tmp/ckpt")
          q.awaitTermination()
        }
        val qs = Seq((1L, "fast table scan"), (2L, "window agg batch merge"),
          (3L, "vector similarity spark")).toDF("qid", "qtext")
        graft.streaming.Bm25Ingest.search(s, root, qs, col("qid"), col("qtext"), topK = 10)
          .orderBy("qid", "rk")
      },
      Some("""WITH terms AS (SELECT doc_id AS id,
             |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                            x -> x <> '')) AS term
             |       FROM documents WHERE text IS NOT NULL),
             |tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
             |dl AS (SELECT id, count(*) AS dl FROM terms GROUP BY 1),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS s FROM dl),
             |q AS (SELECT * FROM (VALUES (1, 'fast table scan'),
             |                            (2, 'window agg batch merge'),
             |                            (3, 'vector similarity spark')) AS q(qid, qtext)),
             |qt AS (SELECT DISTINCT qid,
             |         unnest(list_filter(regexp_split_to_array(lower(qtext), '\s+'),
             |                            x -> x <> '')) AS term
             |       FROM q),
             |m AS (SELECT qt.qid, tf.id,
             |         CAST(round(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
             |              * ((tf.tf * (1.2 + 1.0))
             |                 / (tf.tf + 1.2 * (1.0 - 0.75
             |                    + 0.75 * dl.dl * stats.n / stats.s)))
             |              * 1000000.0, 0) AS BIGINT) AS sc
             |       FROM qt JOIN tf USING (term) JOIN dfq ON qt.term = dfq.term
             |            JOIN dl ON tf.id = dl.id, stats),
             |agg AS (SELECT qid, id, CAST(sum(sc) AS BIGINT) AS score_micro
             |        FROM m GROUP BY 1, 2),
             |rnk AS (SELECT qid, id, score_micro,
             |          row_number() OVER (PARTITION BY qid
             |                             ORDER BY score_micro DESC, id) AS rk
             |        FROM agg)
             |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS BIGINT) AS rk,
             |       CAST(id AS BIGINT) AS id, score_micro
             |FROM rnk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin))

  /** Planted image corpus for the dHash family (sf-independent ids, so
    * the independent python oracle — `scripts/dhash_oracle.py` — freezes
    * to VALUES): 48 base synthetics (x67's dim convention), a resized
    * variant per 4th, a re-encoded exact copy per 6th. */
  private def dhashCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .filter(col("doc_id") >= 1 && col("doc_id") <= 48)
      .select(col("doc_id").as("i"),
        (col("doc_id") % 16 + 17).as("sw"), (col("doc_id") % 12 + 13).as("sh"))
    val bases = base.select(col("i").as("img_id"),
      Multimodal.encodeImage(col("sw"), col("sh"), lit("png")).as("img"))
    val variants = base.filter(col("i") % 4 === 0)
      .select((col("i") + 1000L).as("img_id"),
        Multimodal.resizeImage(
          Multimodal.encodeImage(col("sw"), col("sh"), lit("png")),
          col("sw") + 2, col("sh") + 1).as("img"))
    val copies = base.filter(col("i") % 6 === 0)
      .select((col("i") + 2000L).as("img_id"),
        Multimodal.encodeImage(col("sw"), col("sh"), lit("png")).as("img"))
    bases.unionByName(variants).unionByName(copies)
  }

  // Perceptual image hashing: real-codec decode → 9×8 floor-mapped
  // downsample → row-major brightness-gradient bits. Pinned value-by-value
  // against an independent python reimplementation that never touches a
  // codec (the synthetic pattern is closed-form and PNG is lossless —
  // itself proven by x29/x67).
  private def x86Spec: QuerySpec =
    QuerySpec("x86_image_dhash",
      (s, d) => dhashCorpus(s, d)
        .select(col("img_id"),
          graft.functions.ImageExprs.imageDHash(col("img")).as("dhash"))
        .orderBy("img_id"),
      Some("""SELECT CAST(img_id AS BIGINT) AS img_id, CAST(h AS BIGINT) AS dhash
             |FROM (VALUES (1,-5846344411411679249),(2,-3576749002030876689),
             |  (3,-1238808978370627729),(4,8560883073970583415),
             |  (1004,8560601673483384695),(5,-5589480705669482569),
             |  (6,-5371021488016345289),(2006,-5371021488016345289),
             |  (7,-7299659701257249993),(8,-7227514146289099977),
             |  (1008,-7227531738466772169),(9,6006032326530947991),
             |  (10,7591620528992508827),(11,7866478647094897563),
             |  (12,-4129338473336583397),(1012,-6579427512510899429),
             |  (2012,-4129338473336583397),(13,-3254778556833379493),
             |  (14,5928656468917308235),(15,6508357406767295307),
             |  (16,-1252641052622852113),(1016,-2423577368523706401),
             |  (17,-1527181150725376017),(18,8497831619935565807),
             |  (2018,8497831619935565807),(19,8532859895201625967),
             |  (20,-7245607501086607497),(1020,-5227890415497676937),
             |  (21,-6073827383745202249),(22,-3227262010738362569),
             |  (23,-3649126920125560009),(24,-7752555221451302089),
             |  (1024,-7752580510217717961),(2024,-7752555221451302089),
             |  (25,-6436377871454069865),(26,-2979499295932425317),
             |  (27,-2691300843736310885),(28,-2682293093652010213),
             |  (1028,-2691299194971661541),(29,6364367824531712859),
             |  (30,2979771969700080459),(2030,2979771969700080459),
             |  (31,-8491446574166987957),(32,8639836722792230895),
             |  (1032,8635192386755489759),(33,6302170150735673327),
             |  (34,3708413424719067119),(35,-7226189640519936145),
             |  (36,-5991533135146567817),(1036,-7145634587866597513),
             |  (2036,-5991533135146567817),(37,5651398351939909559),
             |  (38,7371383091561707319),(39,-5303501566722188489),
             |  (40,-5285487204719404233),(1040,-5285487203746866377),
             |  (41,-3263257425182729321),(42,1862984675772029851),
             |  (2042,1862984675772029851),(43,6510136416707107739),
             |  (44,5429325282696325915),(1044,3123992451176684315),
             |  (45,-8995567767307850917),(46,-6230067874788431029),
             |  (47,-5366839044713667253),(48,6679851392984149999),
             |  (1048,-4849396636810485793),(2048,6679851392984149999))
             |  AS t(img_id, h)
             |ORDER BY img_id""".stripMargin))

  // Banded perceptual near-dup (the SimHash-block shape on image hashes):
  // 4×16-bit bands generate candidates as an equi-join — never all pairs —
  // and exact hamming ≤ 6 confirms. Catches byte-identical re-encodes at
  // distance 0 and close resize variants within the threshold; the pair
  // set (incl. legitimate cross-image near-collisions of the synthetic
  // pattern) is frozen from the same independent reimplementation.
  private def x87Spec: QuerySpec =
    QuerySpec("x87_image_neardup",
      (s, d) => {
        val hashes = dhashCorpus(s, d)
          .select(col("img_id"),
            graft.functions.ImageExprs.imageDHash(col("img")).as("dhash"))
        val bands = hashes.select(col("img_id"), col("dhash"),
          explode(array((0 until 4).map(b => struct(lit(b).as("b"),
            shiftrightunsigned(col("dhash"), 16 * b).bitwiseAND(lit(0xFFFFL))
              .as("v"))): _*)).as("band"))
          .select(col("img_id"), col("dhash"),
            col("band.b").as("b"), col("band.v").as("v"))
        val l = bands.select(col("img_id").as("id_a"), col("dhash").as("ha"),
          col("b"), col("v"))
        val r = bands.select(col("img_id").as("id_b"), col("dhash").as("hb"),
          col("b"), col("v"))
        l.join(r, Seq("b", "v")).filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
          .filter(col("hamming") <= 6)
          .distinct()
          .orderBy("id_a", "id_b")
      },
      Some("""SELECT CAST(a AS BIGINT) AS id_a, CAST(b AS BIGINT) AS id_b,
             |       CAST(hm AS BIGINT) AS hamming
             |FROM (VALUES (6,2006,0),(7,8,4),(8,1008,3),(12,2012,0),(18,2018,0),
             |             (24,2024,0),(30,2030,0),(33,34,6),(36,2036,0),
             |             (39,40,6),(40,1040,6),(42,2042,0),(48,2048,0))
             |  AS t(a, b, hm)
             |ORDER BY id_a, id_b""".stripMargin))

  /** st15: streaming ingest into a VERSIONED table — each micro-batch
    * commits through the snapshot manifest, so the ingest timeline is
    * time-travelable (batch i ≡ version i+1). The oracle replays the
    * cumulative slice algebra; the versions themselves are resolved
    * through checkpoint-less manifest reads. */
  private def st15Spec: QuerySpec =
    QuerySpec("st15_stream_snapshot_ingest",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val src = Staging.slicedSource("snaping", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(docs.filter(col("doc_id") % 3 === i), s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_snaping_run").toString
        val table = s"$tmp/tbl"
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.SnapshotIngest.start(s,
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            table, s"$tmp/ckpt")
          q.awaitTermination()
        }
        def at(v: Long) = Snapshots.readAt(s, table, Some(v))
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .select(lit(v).as("version"), col("n_docs"), col("sum_chars"))
        at(1).unionByName(at(2)).unionByName(at(3)).orderBy("version")
      },
      Some("""WITH s AS (SELECT doc_id % 3 AS sl, n_chars FROM documents)
             |SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM s WHERE sl = 0
             |UNION ALL
             |SELECT 2, count(*), CAST(sum(n_chars) AS BIGINT) FROM s WHERE sl IN (0, 1)
             |UNION ALL
             |SELECT 3, count(*), CAST(sum(n_chars) AS BIGINT) FROM s
             |ORDER BY version""".stripMargin))

  /** st21: streaming CDC upsert through the snapshot manifest — each
    * micro-batch of keyed updates (a doc_id third with corrected
    * n_chars) lands as one copy-on-write MERGE commit, zone-map pruned
    * by the batch's own key bounds; the mutation timeline is
    * time-travelable (initial 4-slice build = versions 1-4, batches =
    * versions 5-7). The oracle replays the cumulative update algebra at
    * every version; exactly-once replay is pinned in MergeGateSpec. */
  private def st21Spec: QuerySpec =
    QuerySpec("st21_stream_merge_gate",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w4 = maxId / 4 + 1
        val w3 = maxId / 3 + 1
        val src = Staging.slicedSource("mergegate", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(
              docs.filter(col("doc_id") >= i * w3 && col("doc_id") < (i + 1) * w3)
                .withColumn("n_chars", col("n_chars") + lit((i + 1) * 1000L)),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_mergegate_run").toString
        val table = s"$tmp/tbl"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w4 && col("doc_id") < (i + 1) * w4)
              .coalesce(1),
            table, recordSchema = true, statsCols = Seq("doc_id"))
        }
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.MergeGate.start(s,
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            table, Seq("doc_id"), s"$tmp/ckpt", pruneOn = Some("doc_id"))
          q.awaitTermination()
        }
        def at(v: Long) = Snapshots.readAt(s, table, Some(v))
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .select(lit(v).as("version"), col("n_docs"), col("sum_chars"))
        at(4).unionByName(at(5)).unionByName(at(6)).unionByName(at(7))
          .orderBy("version")
      },
      Some("""WITH w3 AS (SELECT max(doc_id) // 3 + 1 AS w FROM documents),
             |base AS (SELECT doc_id, n_chars FROM documents)
             |SELECT CAST(4 AS BIGINT) AS version, count(*) AS n_docs,
             |       CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM base
             |UNION ALL
             |SELECT 5, count(*),
             |       CAST(sum(CASE WHEN doc_id < w THEN n_chars + 1000
             |                     ELSE n_chars END) AS BIGINT)
             |FROM base, w3
             |UNION ALL
             |SELECT 6, count(*),
             |       CAST(sum(CASE WHEN doc_id < w THEN n_chars + 1000
             |                     WHEN doc_id < 2 * w THEN n_chars + 2000
             |                     ELSE n_chars END) AS BIGINT)
             |FROM base, w3
             |UNION ALL
             |SELECT 7, count(*),
             |       CAST(sum(n_chars + CASE WHEN doc_id < w THEN 1000
             |                              WHEN doc_id < 2 * w THEN 2000
             |                              ELSE 3000 END) AS BIGINT)
             |FROM base, w3
             |ORDER BY version""".stripMargin))

  /** x63's dedup quantizer: cell count grows with the corpus so cells
    * stay ~500 vectors and the within-cell quadratic term is flat per
    * cell — a FIXED nlist would make cells (and the pair count) grow
    * linearly (quadratically) with the data, the exact trap the scaling
    * curve exists to catch. Cached per sf dir. */
  private val x63State =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()
  private def x63Centroids(s: SparkSession, d: String): Array[Array[Double]] =
    x63State.computeIfAbsent(d, { _ =>
      val emb = Tables.embeddings(s, d)
      // cap high enough that cells stay ~500 vectors through sf100 (2M
      // vectors → 4000 cells); the old 1024 cap re-grew cells linearly
      // past sf10 and the sf100 curve caught the quadratic creep at 52×
      val nlist = math.max(16L, math.min(16384L, emb.count() / 500)).toInt
      Similarity.kmeansCentroids(emb, nlist)
    })

  /** File count for the x71/x72 synthetic crawl containers: scales with the
    * corpus so each container holds ~128 records regardless of SF. A FIXED
    * bucket count would make per-file payload grow linearly with the data —
    * per-row memory for the container walk grows without bound and (before
    * binary_concat) the build fold went quadratic, exactly the class of
    * defect the scaling curve exists to catch. Cached per sf dir (the count
    * is parquet-metadata-only). */
  private val crawlBucketCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def crawlBuckets(s: SparkSession, d: String): Long =
    crawlBucketCounts.computeIfAbsent(d,
      _ => math.max(37L, math.min(65536L, Tables.documents(s, d).count() / 128L)))

  /** st12's quantizer: k-means on the BASE corpus only (the streamed
    * fifth and the twins stay unseen — serving them is the point of the
    * test). Cached per sf dir like [[ivfaArtifacts]]. */
  private val st12State =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()
  private def st12Centroids(s: SparkSession, d: String): Array[Array[Double]] =
    st12State.computeIfAbsent(d, { _ =>
      Similarity.kmeansCentroids(
        Tables.embeddings(s, d).filter(col("vec_id") % 5 =!= 0), nlist = 16)
    })

  /** x80's corpus-trained unigram vocab — seed-frequency training is an
    * offline once-per-corpus artifact (the tokenizer-train analog of the
    * ANN index builds); cached per sf dir so the benched x80 times the
    * Viterbi encode serve, not re-training. */
  private val unigramState =
    new java.util.concurrent.ConcurrentHashMap[String, graft.functions.Unigram.Vocab]()
  private def unigramVocab(s: SparkSession, d: String): graft.functions.Unigram.Vocab =
    unigramState.computeIfAbsent(d, { _ =>
      graft.functions.Unigram.trainSeed(
        Tables.documents(s, d).filter(col("text").isNotNull), col("text"))
    })

  // Hybrid retrieval: BM25 lexical top-20 fused with embedding-cosine
  // top-20 by reciprocal-rank fusion (integer nano-unit contributions, so
  // the fused score is an exact BIGINT). Queries are three corpus docs
  // used as their own anchors — text drives the lexical ranker, the
  // matching embedding drives the dense one; BM25 keeps the self-hit
  // (each ranker fuses ITS OWN list — standard RRF), the dense side
  // excludes self by construction (x05 semantics). The oracle replays
  // both closed forms (x79's BM25 algebra, x05's cosine ranking) plus the
  // fusion arithmetic end to end.
  private def x90Spec: QuerySpec =
    QuerySpec("x90_hybrid_rrf",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val idx = graft.ext.Bm25.index(docs, col("doc_id"), col("text"))
        val qdocs = docs.filter(col("doc_id").isin(1L, 2L, 3L))
          .select(col("doc_id").as("qid"), col("text").as("qtext"))
        val lex = graft.ext.Bm25.search(idx, qdocs, col("qid"), col("qtext"), topK = 20)
          .select(col("qid"), col("id"), col("rk"))
        val emb = Tables.embeddings(s, d)
        val dense = Similarity.bruteForceTopK(
            emb.filter(col("vec_id").isin(1L, 2L, 3L)), emb, 20)
          .select(col("query_id").as("qid"), col("neighbor_id").as("id"), col("rk"))
        graft.ext.Retrieval.rrfFuse(Seq(lex, dense), "qid", "id", "rk",
            kConst = 60, topK = 10)
          .orderBy("qid", "rk")
      },
      Some("""WITH terms AS (SELECT doc_id AS id,
             |         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                            x -> x <> '')) AS term
             |       FROM documents WHERE text IS NOT NULL),
             |tf AS (SELECT id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
             |dl AS (SELECT id, count(*) AS dl FROM terms GROUP BY 1),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS s FROM dl),
             |q AS (SELECT doc_id AS qid, text AS qtext FROM documents
             |      WHERE doc_id IN (1, 2, 3) AND text IS NOT NULL),
             |qt AS (SELECT DISTINCT qid,
             |         unnest(list_filter(regexp_split_to_array(lower(qtext), '\s+'),
             |                            x -> x <> '')) AS term
             |       FROM q),
             |m AS (SELECT qt.qid, tf.id,
             |         CAST(round(ln(1.0 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
             |              * ((tf.tf * (1.2 + 1.0))
             |                 / (tf.tf + 1.2 * (1.0 - 0.75
             |                    + 0.75 * dl.dl * stats.n / stats.s)))
             |              * 1000000.0, 0) AS BIGINT) AS sc
             |       FROM qt JOIN tf USING (term) JOIN dfq ON qt.term = dfq.term
             |            JOIN dl ON tf.id = dl.id, stats),
             |agg AS (SELECT qid, id, CAST(sum(sc) AS BIGINT) AS score_micro
             |        FROM m GROUP BY 1, 2),
             |lex AS (SELECT qid, id,
             |          row_number() OVER (PARTITION BY qid
             |                             ORDER BY score_micro DESC, id) AS rk
             |        FROM agg QUALIFY rk <= 20),
             |qv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |       FROM embeddings WHERE vec_id IN (1, 2, 3)),
             |cv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |       FROM embeddings),
             |den AS (SELECT qv.vec_id AS qid, cv.vec_id AS id,
             |          row_number() OVER (PARTITION BY qv.vec_id
             |            ORDER BY list_dot_product(qv.v, cv.v) /
             |              (sqrt(list_dot_product(qv.v, qv.v))
             |               * sqrt(list_dot_product(cv.v, cv.v))) DESC,
             |            cv.vec_id ASC) AS rk
             |        FROM qv JOIN cv ON cv.vec_id <> qv.vec_id
             |        QUALIFY rk <= 20),
             |u AS (SELECT qid, id, 1000000000 // (60 + rk) AS c FROM lex
             |      UNION ALL
             |      SELECT qid, id, 1000000000 // (60 + rk) FROM den),
             |f AS (SELECT qid, id, CAST(sum(c) AS BIGINT) AS fused_nano,
             |             count(*) AS n_lists
             |      FROM u GROUP BY 1, 2),
             |r AS (SELECT qid, id, fused_nano, n_lists,
             |        row_number() OVER (PARTITION BY qid
             |                           ORDER BY fused_nano DESC, id) AS rk
             |      FROM f)
             |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS BIGINT) AS rk,
             |       CAST(id AS BIGINT) AS id, fused_nano,
             |       CAST(n_lists AS BIGINT) AS n_lists
             |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin))

  // Domain-graph PageRank for crawl curation: a deterministic synthetic
  // link graph is planted over documents (each contributing doc emits two
  // domain→domain links; three domains never link out, exercising the
  // dangling-mass path), then ranked by 8 damped iterations of EXACT
  // INTEGER PageRank (pico-unit ranks, div-truncated flows — see
  // LinkGraph.pageRankPico). The oracle unrolls the identical integer
  // algebra per iteration, so every rank value matches bit-for-bit.
  private def x91Spec: QuerySpec = {
    val edgesCte =
      """docs AS (SELECT doc_id FROM documents
        |         WHERE text IS NOT NULL AND doc_id % 4 <> 3),
        |e0 AS (SELECT 'dom' || (doc_id % 23) AS src,
        |              'dom' || ((doc_id * 7 + 1) % 23) AS dst FROM docs
        |       UNION ALL
        |       SELECT 'dom' || (doc_id % 23), 'dom' || ((doc_id * 3 + 2) % 23)
        |       FROM docs),
        |edges AS (SELECT src, dst FROM e0
        |          WHERE src <> dst AND src NOT IN ('dom20', 'dom21', 'dom22'))""".stripMargin
    QuerySpec("x91_pagerank",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull && col("doc_id") % 4 =!= 3)
          .select("doc_id")
        graft.ext.LinkGraph.pageRankPico(domainEdges(docs), "src", "dst", iters = 8)
          .orderBy(col("rank_pico").desc, col("node"))
      },
      Some(graft.ext.LinkGraph.pageRankOracleSql(edgesCte, iters = 8)))
  }

  // Interpolated Kneser-Ney bigram scoring (the KenLM smoothing): absolute
  // discount D=0.75 with continuation-probability backoff, self-trained on
  // the corpus and scored in exact micro-nat integers. The oracle rebuilds
  // all four count tables (C(w1,w2), C(w1·), N1+(w1·), N1+(·w2)) and the
  // type total, and evaluates p in the identical parenthesization — every
  // per-doc NLL matches bit-for-bit.
  private def x92Spec: QuerySpec =
    QuerySpec("x92_kneser_ney",
      (s, d) => graft.ext.LmScore.knBigramNll(Tables.documents(s, d),
          col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
      Some("""WITH tok AS (SELECT doc_id,
             |         list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                     x -> x <> '') AS t
             |       FROM documents),
             |bg AS (SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
             |       FROM tok WHERE len(t) >= 2),
             |b2 AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM bg),
             |c12 AS (SELECT w1, w2, count(*) AS n12 FROM b2 GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS n1 FROM b2 GROUP BY 1),
             |fw AS (SELECT w1, count(*) AS n1fw FROM c12 GROUP BY 1),
             |pw AS (SELECT w2, count(*) AS n1pw FROM c12 GROUP BY 1),
             |nt AS (SELECT count(*) AS ntypes FROM c12),
             |sc AS (SELECT doc_id,
             |         CAST(round(-ln((greatest(n12 - 0.75, 0)
             |                + 0.75 * n1fw * (n1pw / ntypes)) / n1)
             |              * 1000000, 0) AS BIGINT) AS s
             |       FROM b2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
             |            JOIN fw USING (w1) JOIN pw USING (w2), nt)
             |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(s) AS BIGINT) AS nll_micro
             |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin))

  // Weighted PPS systematic sampling: ~10 docs per source with inclusion
  // probability ∝ n_chars, via the integer step-boundary rule over the
  // md5-ordered cumulative weight line. The oracle lays out the identical
  // line (same md5 order, same prefix sums) and applies the identical
  // `(cum·k) div W` crossings — the kept set matches row-for-row.
  private def x93Spec: QuerySpec =
    QuerySpec("x93_pps_sample",
      (s, d) => Curation.ppsSample(
          Tables.documents(s, d).filter(col("text").isNotNull),
          col("source"), col("doc_id"), col("n_chars"), k = 10)
        .select(col("group").as("source"), col("id").as("doc_id"), col("weight"))
        .orderBy("source", "doc_id"),
      Some("""WITH base AS (SELECT source AS grp, doc_id AS id, n_chars AS w,
             |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) AS b
             |       FROM documents WHERE text IS NOT NULL AND n_chars > 0),
             |tot AS (SELECT grp, sum(w) AS wtot FROM base GROUP BY 1),
             |c AS (SELECT grp, id, w,
             |        coalesce(sum(w) OVER (PARTITION BY grp ORDER BY b, id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
             |      FROM base)
             |SELECT c.grp AS source, CAST(c.id AS BIGINT) AS doc_id,
             |       CAST(c.w AS BIGINT) AS weight
             |FROM c JOIN tot ON c.grp = tot.grp
             |WHERE ((c.pre + c.w) * 10) // tot.wtot > (c.pre * 10) // tot.wtot
             |ORDER BY source, doc_id""".stripMargin))

  // Count-min sketch over the corpus token stream (depth 4 × width 512,
  // md5-derived buckets): probe ten terms — glue words, content words, an
  // absent term — and report estimate vs exact count plus the CMS
  // guarantee bit (est ≥ exact, = 1 everywhere). The oracle rebuilds the
  // sketch cell-for-cell and probes it with the same hashes, so the
  // estimates (overcounts included) match exactly.
  private def x94Spec: QuerySpec = {
    val probeTerms = Seq("the", "a", "table", "spark", "vector",
      "window", "merge", "slow", "customer", "zzz_absent")
    QuerySpec("x94_countmin",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(explode(filter(split(lower(col("text")), "\\s+"),
            x => x =!= "")).as("w"))
        val sketch = graft.ext.Sketches.countMin(toks, col("w"))
        val probes = probeTerms.toDF("term")
        val est = graft.ext.Sketches.countMinEstimate(sketch, probes, col("term"))
          .withColumnRenamed("probe", "term")
        val exact = toks.groupBy(col("w").as("term")).agg(count(lit(1)).as("exact"))
        est.join(exact, Seq("term"), "left")
          .select(col("term"), col("est").cast("long").as("est_count"),
            coalesce(col("exact"), lit(0L)).cast("long").as("exact_count"),
            (col("est") >= coalesce(col("exact"), lit(0L))).cast("long").as("bound_ok"))
          .orderBy("term")
      },
      Some(s"""WITH tok AS (SELECT unnest(list_filter(
             |           regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS w
             |       FROM documents WHERE text IS NOT NULL),
             |d AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS d(r)),
             |cells AS (SELECT r AS row,
             |            CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || w), 1, 8))
             |                 AS BIGINT) % 512 AS bucket,
             |            count(*) AS cnt
             |          FROM tok, d GROUP BY 1, 2),
             |probes AS (SELECT * FROM (VALUES ${probeTerms.map(t => s"('$t')").mkString(", ")})
             |           AS p(term)),
             |pe AS (SELECT term, r AS row,
             |         CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || term), 1, 8))
             |              AS BIGINT) % 512 AS bucket
             |       FROM probes, d),
             |est AS (SELECT term, min(coalesce(cells.cnt, 0)) AS est
             |        FROM pe LEFT JOIN cells USING (row, bucket) GROUP BY 1),
             |ex AS (SELECT w AS term, count(*) AS exact FROM tok GROUP BY 1)
             |SELECT est.term, CAST(est.est AS BIGINT) AS est_count,
             |       CAST(coalesce(ex.exact, 0) AS BIGINT) AS exact_count,
             |       CAST(est.est >= coalesce(ex.exact, 0) AS BIGINT) AS bound_ok
             |FROM est LEFT JOIN ex ON est.term = ex.term
             |ORDER BY 1""".stripMargin))
  }

  // Snapshot SCHEMA EVOLUTION: three schema-stamped commits — v2 widens
  // with `lang`, v3 with `source`. Each version resolves under the schema
  // recorded AS OF it: time travel to v1 sees two columns, the current
  // read null-pads v1's files in the evolved columns (n_lang counts only
  // rows whose file carried the column). The oracle replays the
  // shape-per-version algebra on the source table.
  private def x95Spec: QuerySpec =
    QuerySpec("x95_schema_evolution",
      (s, d) => {
        import graft.io.Snapshots
        val t = Staging.dir("snapevo", d) { tmp =>
          val docs = Tables.documents(s, d)
          val tbl = s"$tmp/tbl"
          Snapshots.commitAppend(docs.filter(col("doc_id") % 3 === 0)
            .select(col("doc_id"), col("n_chars")), tbl, recordSchema = true)
          Snapshots.commitAppend(docs.filter(col("doc_id") % 3 === 1)
            .select(col("doc_id"), col("n_chars"), col("lang")), tbl,
            recordSchema = true)
          Snapshots.commitAppend(docs.filter(col("doc_id") % 3 === 2)
            .select(col("doc_id"), col("n_chars"), col("lang"), col("source")),
            tbl, recordSchema = true)
          ()
        } + "/tbl"
        def at(v: Long) = {
          val df = Snapshots.readAt(s, t, Some(v))
          val nLang = if (df.columns.contains("lang")) count(col("lang")) else lit(0L)
          df.agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"),
              nLang.cast("long").as("n_lang"))
            .select(lit(v).as("version"), lit(df.columns.length.toLong).as("n_cols"),
              col("n_docs"), col("sum_chars"), col("n_lang"))
        }
        at(1).unionByName(at(2)).unionByName(at(3)).orderBy("version")
      },
      Some("""WITH s AS (SELECT doc_id % 3 AS sl, n_chars, lang FROM documents)
             |SELECT CAST(1 AS BIGINT) AS version, CAST(2 AS BIGINT) AS n_cols,
             |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |       CAST(0 AS BIGINT) AS n_lang FROM s WHERE sl = 0
             |UNION ALL
             |SELECT 2, 3, count(*), CAST(sum(n_chars) AS BIGINT),
             |       count(lang) FILTER (WHERE sl = 1) FROM s WHERE sl IN (0, 1)
             |UNION ALL
             |SELECT 3, 4, count(*), CAST(sum(n_chars) AS BIGINT),
             |       count(lang) FILTER (WHERE sl IN (1, 2)) FROM s
             |ORDER BY version""".stripMargin))

  // st17: streaming count-min maintenance — three micro-batches of
  // tokenized documents each append a partial sketch through the
  // manifest; the served merge (cell-wise sum) must estimate EXACTLY what
  // the batch-built x94 sketch estimates (CMS merge is exact), so the
  // oracle is x94's, verbatim by construction.
  private def st17Spec: QuerySpec = {
    val probeTerms = Seq("the", "a", "table", "spark", "vector",
      "window", "merge", "slow", "customer", "zzz_absent")
    QuerySpec("st17_stream_sketch_ingest",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"))
        val src = Staging.slicedSource("cmsing", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(docs.filter(col("doc_id") % 3 === i), s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_cmsing_run").toString
        val table = s"$tmp/sketch"
        Staging.drainTuning(s, src, 3) {
          val stream = s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true").parquet(s"$src/src")
            .select(explode(filter(split(lower(col("text")), "\\s+"),
              x => x =!= "")).as("w"))
          val q = graft.streaming.SketchIngest.start(s, stream, "w", table,
            s"$tmp/ckpt")
          q.awaitTermination()
        }
        val probes = probeTerms.toDF("term")
        val est = graft.streaming.SketchIngest.estimate(s, table, probes, col("term"))
          .withColumnRenamed("probe", "term")
        val exact = docs
          .select(explode(filter(split(lower(col("text")), "\\s+"),
            x => x =!= "")).as("w"))
          .groupBy(col("w").as("term")).agg(count(lit(1)).as("exact"))
        est.join(exact, Seq("term"), "left")
          .select(col("term"), col("est").cast("long").as("est_count"),
            coalesce(col("exact"), lit(0L)).cast("long").as("exact_count"),
            (col("est") >= coalesce(col("exact"), lit(0L))).cast("long").as("bound_ok"))
          .orderBy("term")
      },
      Some(s"""WITH tok AS (SELECT unnest(list_filter(
             |           regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS w
             |       FROM documents WHERE text IS NOT NULL),
             |d AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS d(r)),
             |cells AS (SELECT r AS row,
             |            CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || w), 1, 8))
             |                 AS BIGINT) % 512 AS bucket,
             |            count(*) AS cnt
             |          FROM tok, d GROUP BY 1, 2),
             |probes AS (SELECT * FROM (VALUES ${probeTerms.map(t => s"('$t')").mkString(", ")})
             |           AS p(term)),
             |pe AS (SELECT term, r AS row,
             |         CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || term), 1, 8))
             |              AS BIGINT) % 512 AS bucket
             |       FROM probes, d),
             |est AS (SELECT term, min(coalesce(cells.cnt, 0)) AS est
             |        FROM pe LEFT JOIN cells USING (row, bucket) GROUP BY 1),
             |ex AS (SELECT w AS term, count(*) AS exact FROM tok GROUP BY 1)
             |SELECT est.term, CAST(est.est AS BIGINT) AS est_count,
             |       CAST(coalesce(ex.exact, 0) AS BIGINT) AS exact_count,
             |       CAST(est.est >= coalesce(ex.exact, 0) AS BIGINT) AS bound_ok
             |FROM est LEFT JOIN ex ON est.term = ex.term
             |ORDER BY 1""".stripMargin))
  }

  /** x96/x97's shared oracle prelude: hashed bag-of-words feats (32 bins
    * + bias) and the planted "mentions spark" label. */
  private def clfPrelude: String =
    """tok AS (SELECT doc_id AS id,
      |          unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |                             x -> x <> '')) AS w
      |        FROM documents WHERE text IS NOT NULL),
      |cnt AS (SELECT id,
      |          CAST(('0x' || substr(md5('f:' || w), 1, 8)) AS BIGINT) % 32 AS j,
      |          count(*) AS x
      |        FROM tok GROUP BY 1, 2),
      |feats AS (SELECT id, j, CAST(x AS BIGINT) AS x FROM cnt
      |          UNION ALL
      |          SELECT doc_id, CAST(32 AS BIGINT), CAST(1 AS BIGINT)
      |          FROM documents WHERE text IS NOT NULL),
      |labels AS (SELECT doc_id AS id,
      |             CAST(CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y
      |           FROM documents WHERE text IS NOT NULL)""".stripMargin

  private def clfFeats(s: SparkSession, d: String): DataFrame =
    graft.ext.Classifier.hashedFeatures(
      Tables.documents(s, d).filter(col("text").isNotNull),
      col("doc_id"), col("text"), buckets = 32)

  /** The planted quality label: substantial docs (n_chars ≥ 300) are
    * positives — a roughly balanced 256/244 split at sf0.01 that the
    * hashed-count features genuinely predict (token mass ∝ length), so
    * the served gate is DISCRIMINATING, not a rubber stamp. */
  private def clfLabels(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id").as("id"),
        (col("n_chars") >= 300).cast("double").as("y"))

  /** Trained weights per sf dir — training is an offline artifact (the
    * ANN-index convention); x96 pins the trajectory, x97 benches the
    * stateless scoring gate. The tiny (buckets+1)-row result is collected
    * and rebuilt as a literal frame for serving. */
  private val clfState =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Long)]]()
  private def clfWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    clfState.computeIfAbsent(d, { _ =>
      graft.ext.Classifier.trainLogistic(clfFeats(s, d), clfLabels(s, d),
          buckets = 32, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }).toDF("j", "w_micro")
  }

  // Learned quality classifier, TRAINED DISTRIBUTED (x96): logistic
  // regression over hashed bag-of-words counts, 3 full-batch rounds of
  // exact integer-accumulated gradient descent on a planted "mentions
  // spark" label. The oracle re-trains from scratch with the identical
  // unrolled algebra — all 33 final weights match bit-for-bit, so the
  // whole trajectory (margins, sigmoids, gradient rounding, floor-div
  // updates) is pinned, not just the outcome.
  private def x96Spec: QuerySpec =
    QuerySpec("x96_train_classifier",
      (s, d) => graft.ext.Classifier.trainLogistic(clfFeats(s, d), clfLabels(s, d),
          buckets = 32, iters = 3)
        .orderBy("j"),
      Some(graft.ext.Classifier.trainOracleSql(clfPrelude, buckets = 32, iters = 3)))

  // The trained filter SERVING (x97): stateless scoring of every doc
  // under the x96 weights — one broadcast join + one sum, the gate a
  // model-based corpus filter runs at 100 TB. Oracle: train + score,
  // fully replayed.
  /** The FineWeb-Edu-style calibrated serving threshold: with
    * mean-normalized training the margin distribution is corpus-size
    * stable, and 1.13 units splits the planted quality classes with 10
    * borderline errors out of 500 at sf0.01 (neg p99 ≈ pos p2 ≈ here) —
    * a genuinely discriminating gate, not a rubber stamp. */
  // `def`, not `val`: ExtQueries.all is a val initialized ABOVE this
  // declaration — a val here would still be 0 when the specs capture it
  private def clfGateMicro = 1130000L

  private def x97Spec: QuerySpec =
    QuerySpec("x97_classifier_gate",
      (s, d) => graft.ext.Classifier.score(clfFeats(s, d), clfWeights(s, d))
        .select(col("id").as("doc_id"), col("margin_micro"),
          (col("margin_micro") > clfGateMicro).cast("long").as("gate"))
        .orderBy("doc_id"),
      Some(graft.ext.Classifier.scoreOracleSql(clfPrelude, buckets = 32,
        iters = 3, idAs = "doc_id", gateMicro = clfGateMicro)))

  // st18: the learned filter AT INGEST — the x96 weight artifact gates a
  // 3-batch document stream (stateless model serve per micro-batch, like
  // st13's DSIR gate). Kept set ≡ the batch x97 gate over the same docs;
  // the oracle re-trains and keeps only positive-margin docs.
  private def st18Spec: QuerySpec =
    QuerySpec("st18_stream_classifier_gate",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"))
        val weightsDir = Staging.dir("clfw", d) { tmp =>
          clfWeights(s, d).write.parquet(s"$tmp/w")
        }
        val src = Staging.slicedSource("clfg", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(docs.filter(col("doc_id") % 3 === i), s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_clfg_run").toString
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.ClassifierGate.start(s,
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            "doc_id", "text",
            weightsPath = s"$weightsDir/w", outDir = s"$tmp/out",
            checkpoint = s"$tmp/ckpt", minMarginMicro = clfGateMicro)
          q.awaitTermination()
        }
        s.read.option("recursiveFileLookup", "true").parquet(s"$tmp/out")
          .select(col("doc_id"), col("margin_micro"))
          .orderBy("doc_id")
      },
      Some(graft.ext.Classifier.gateOracleSql(clfPrelude, buckets = 32,
        iters = 3, idAs = "doc_id", gateMicro = clfGateMicro)))

  /** x91's planted domain-graph edges from a docs frame. */
  private def domainEdges(docs: DataFrame): DataFrame = {
    val e0 = docs.select(
        concat(lit("dom"), col("doc_id") % 23).as("src"),
        concat(lit("dom"), (col("doc_id") * 7 + 1) % 23).as("dst"))
      .unionByName(docs.select(
        concat(lit("dom"), col("doc_id") % 23).as("src"),
        concat(lit("dom"), (col("doc_id") * 3 + 2) % 23).as("dst")))
    e0.filter(col("src") =!= col("dst") &&
      !col("src").isin("dom20", "dom21", "dom22"))
  }

  // INCREMENTAL PageRank maintenance (x98): rank the base graph (docs
  // %4 ∈ {0,1}) with the full 8-iteration schedule, append the delta
  // month (%4 = 2), and re-rank the full graph with only 4 WARM-STARTED
  // iterations from the committed base ranks — the maintenance path that
  // avoids the cold-start schedule after every crawl increment. The
  // oracle replays both phases (8 unrolled cold + 4 unrolled warm) in one
  // statement — every warm rank bit-exact. Warm≈cold proximity is pinned
  // in LinkGraphSpec (it's an analytic property, not an algebra identity).
  private def x98Spec: QuerySpec = {
    val prelude =
      """docs AS (SELECT doc_id FROM documents
        |         WHERE text IS NOT NULL AND doc_id % 4 <> 3),
        |e0 AS (SELECT doc_id, 'dom' || (doc_id % 23) AS src,
        |              'dom' || ((doc_id * 7 + 1) % 23) AS dst FROM docs
        |       UNION ALL
        |       SELECT doc_id, 'dom' || (doc_id % 23),
        |              'dom' || ((doc_id * 3 + 2) % 23) FROM docs),
        |eall AS (SELECT doc_id, src, dst FROM e0
        |         WHERE src <> dst AND src NOT IN ('dom20', 'dom21', 'dom22')),
        |bedges AS (SELECT src, dst FROM eall WHERE doc_id % 4 < 2),
        |edges AS (SELECT src, dst FROM eall)""".stripMargin
    QuerySpec("x98_pagerank_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull && col("doc_id") % 4 =!= 3)
          .select("doc_id")
        val base = graft.ext.LinkGraph.pageRankPico(
          domainEdges(docs.filter(col("doc_id") % 4 < 2)), "src", "dst", iters = 8)
        graft.ext.LinkGraph.pageRankPico(domainEdges(docs), "src", "dst",
            iters = 4, init = Some(base), releaseInit = true)
          .orderBy(col("rank_pico").desc, col("node"))
      },
      Some(s"WITH $prelude" +
        graft.ext.LinkGraph.pageRankOracleCtes("b", 8) +
        graft.ext.LinkGraph.pageRankOracleCtes("", 4, initRef = Some("br8")) +
        """
          |SELECT node, CAST(rank AS BIGINT) AS rank_pico FROM r4
          |ORDER BY rank_pico DESC, node""".stripMargin))
  }

  // PERSONALIZED (topic-sensitive) PageRank (x99): teleport and dangling
  // mass land only on a 3-domain seed list — ranking the graph by
  // proximity to curated seeds instead of globally (how a topical crawl
  // corpus prioritizes domains). Same integer algebra, seed-conditional
  // base/dangling terms; oracle unrolls it bit-exact.
  private def x99Spec: QuerySpec = {
    val prelude =
      """docs AS (SELECT doc_id FROM documents
        |         WHERE text IS NOT NULL AND doc_id % 4 <> 3),
        |e0 AS (SELECT 'dom' || (doc_id % 23) AS src,
        |              'dom' || ((doc_id * 7 + 1) % 23) AS dst FROM docs
        |       UNION ALL
        |       SELECT 'dom' || (doc_id % 23), 'dom' || ((doc_id * 3 + 2) % 23)
        |       FROM docs),
        |edges AS (SELECT src, dst FROM e0
        |          WHERE src <> dst AND src NOT IN ('dom20', 'dom21', 'dom22')),
        |seeds AS (SELECT * FROM (VALUES ('dom0'), ('dom1'), ('dom2')) AS s(node))""".stripMargin
    QuerySpec("x99_pagerank_personalized",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull && col("doc_id") % 4 =!= 3)
          .select("doc_id")
        val seeds = Seq("dom0", "dom1", "dom2").toDF("node")
        graft.ext.LinkGraph.pageRankPico(domainEdges(docs), "src", "dst",
            iters = 8, seeds = Some(seeds))
          .orderBy(col("rank_pico").desc, col("node"))
      },
      Some(s"WITH $prelude" +
        graft.ext.LinkGraph.pageRankOracleCtes("", 8, seedsRef = Some("seeds")) +
        """
          |SELECT node, CAST(rank AS BIGINT) AS rank_pico FROM r8
          |ORDER BY rank_pico DESC, node""".stripMargin))
  }

  // KMV distinct-count sketch (x100): per-source distinct-BIGRAM
  // cardinality from the k=64 smallest 48-bit hashes — the mergeable
  // cardinality sketch whose estimate, unlike HLL's, has an exact oracle
  // twin (hash order + integer formula leave no implementation freedom).
  // Exact distinct counts ride along so the estimate's quality is visible
  // in the row itself.
  private def x100Spec: QuerySpec =
    QuerySpec("x100_kmv_distinct",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val toks = docs.select(col("source"),
          filter(split(lower(col("text")), "\\s+"), x => x =!= "").as("__t"))
        val bigrams = toks.select(col("source"), explode(zip_with(
            slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
            slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
            (a, b) => concat(a, lit(" "), b))).as("bg"))
        val sketch = graft.ext.Sketches.kmvSketch(bigrams, col("source"), col("bg"), k = 64)
        val est = graft.ext.Sketches.kmvEstimate(sketch, k = 64)
        val exact = bigrams.groupBy("source")
          .agg(count_distinct(col("bg")).as("exact_distinct"))
        est.withColumnRenamed("group", "source")
          .join(exact, Seq("source"))
          .select(col("source"), col("est_distinct"),
            col("exact_distinct").cast("long").as("exact_distinct"))
          .orderBy("source")
      },
      Some("""WITH tok AS (SELECT source,
             |         list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                     x -> x <> '') AS t
             |       FROM documents WHERE text IS NOT NULL),
             |bg AS (SELECT source, z[1] || ' ' || z[2] AS bg
             |       FROM (SELECT source, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
             |             FROM tok WHERE len(t) >= 2)),
             |h AS (SELECT DISTINCT source,
             |        CAST(('0x' || substr(md5(bg), 1, 12)) AS BIGINT) AS h
             |      FROM bg),
             |topk AS (SELECT source, h,
             |           row_number() OVER (PARTITION BY source ORDER BY h) AS rk
             |         FROM h QUALIFY rk <= 64),
             |agg AS (SELECT source, count(*) AS m, max(h) AS hk FROM topk GROUP BY 1),
             |est AS (SELECT source,
             |          CASE WHEN m < 64 THEN m
             |               ELSE (63 * 281474976710656) // hk END AS est
             |        FROM agg),
             |ex AS (SELECT source, count(DISTINCT bg) AS exact FROM bg GROUP BY 1)
             |SELECT est.source, CAST(est.est AS BIGINT) AS est_distinct,
             |       CAST(ex.exact AS BIGINT) AS exact_distinct
             |FROM est JOIN ex ON est.source = ex.source
             |ORDER BY 1""".stripMargin))

  // st19: the CONTINUOUS domain-ranking pipeline — link batches stream
  // into a versioned edge table (snapshot ingest), and rank maintenance
  // runs between versions: cold full-schedule on v1, then a short
  // warm-started schedule per increment (x98's maintenance path driven by
  // the ingest timeline). The oracle replays all three phases (8 cold +
  // 4 warm + 4 warm) in one statement — final ranks bit-exact.
  private def st19Spec: QuerySpec = {
    val prelude =
      """docs AS (SELECT doc_id FROM documents
        |         WHERE text IS NOT NULL AND doc_id % 4 <> 3),
        |e0 AS (SELECT doc_id, 'dom' || (doc_id % 23) AS src,
        |              'dom' || ((doc_id * 7 + 1) % 23) AS dst FROM docs
        |       UNION ALL
        |       SELECT doc_id, 'dom' || (doc_id % 23),
        |              'dom' || ((doc_id * 3 + 2) % 23) FROM docs),
        |eall AS (SELECT doc_id, src, dst FROM e0
        |         WHERE src <> dst AND src NOT IN ('dom20', 'dom21', 'dom22')),
        |aedges AS (SELECT src, dst FROM eall WHERE doc_id % 3 = 0),
        |bedges AS (SELECT src, dst FROM eall WHERE doc_id % 3 IN (0, 1)),
        |cedges AS (SELECT src, dst FROM eall)""".stripMargin
    QuerySpec("st19_stream_rank_maintenance",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull && col("doc_id") % 4 =!= 3)
          .select("doc_id")
        val src = Staging.slicedSource("rankm", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(domainEdges(docs.filter(col("doc_id") % 3 === i)),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_rankm_run").toString
        val table = s"$tmp/edges"
        val edgeSchema = domainEdges(docs).schema
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.SnapshotIngest.start(s,
            s.readStream.schema(edgeSchema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            table, s"$tmp/ckpt")
          q.awaitTermination()
        }
        def at(v: Long) = Snapshots.readAt(s, table, Some(v))
        val r1 = graft.ext.LinkGraph.pageRankPico(at(1), "src", "dst", iters = 8)
        val r2 = graft.ext.LinkGraph.pageRankPico(at(2), "src", "dst", iters = 4,
          init = Some(r1), releaseInit = true)
        val r3 = graft.ext.LinkGraph.pageRankPico(at(3), "src", "dst", iters = 4,
          init = Some(r2), releaseInit = true)
        r3.orderBy(col("rank_pico").desc, col("node"))
      },
      Some(s"WITH $prelude" +
        graft.ext.LinkGraph.pageRankOracleCtes("a", 8) +
        graft.ext.LinkGraph.pageRankOracleCtes("b", 4, initRef = Some("ar8")) +
        graft.ext.LinkGraph.pageRankOracleCtes("c", 4, initRef = Some("br4")) +
        """
          |SELECT node, CAST(rank AS BIGINT) AS rank_pico FROM cr4
          |ORDER BY rank_pico DESC, node""".stripMargin))
  }

  /** The zone-mapped snapshot layout x101/x102 exercise: documents sliced
    * into 8 range-disjoint files (slice i = doc_ids [i·W, (i+1)·W), one
    * commitAppend each, min/max recorded), W = max_id/8 + 1. The right-
    * to-erasure / targeted-retraction shape: doc ranges map to files, so
    * a range delete or scan touches O(overlapping files), not the table. */
  private def slicedSnapshotTable(s: SparkSession, root: String, d: String): (String, Long) = {
    import graft.io.Snapshots
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
    val tbl = s"$root/tbl"
    (0 until 8).foreach { i =>
      Snapshots.commitAppend(
        docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
        tbl, recordSchema = true, statsCols = Seq("doc_id"))
    }
    (tbl, w)
  }

  /** Recursive file copy for the per-run mutable-table setup (x101): the
    * copied manifest still references the TEMPLATE's data files by
    * absolute path — safe because deleteWhere is copy-on-write (removed
    * files are un-referenced, never touched on disk) and each run's new
    * files land under its own copied root. */
  private def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    val it = Files.walk(from)
    try it.forEach { (p: Path) =>
      val dest = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else Files.copy(p, dest)
    } finally it.close()
  }

  /** Shared oracle prelude: W and the delete/scan bounds derived from it
    * (the range [k·W + W/2, (k+1)·W + W/2 - 1] straddles exactly slices k
    * and k+1, and doc_ids are contiguous so both slices hold matches). */
  private def zoneBoundsSql(k: Int): String =
    s"""w AS (SELECT max(doc_id) // 8 + 1 AS w FROM documents),
       |b AS (SELECT $k * w + w // 2 AS lo, ${k + 1} * w + w // 2 - 1 AS hi FROM w)""".stripMargin

  // COPY-ON-WRITE row-level DELETE through the snapshot manifest (x101):
  // zone maps (per-file doc_id min/max recorded at commit) prune the
  // candidate files BEFORE any data is read, a match check keeps zone-map
  // false positives unrewritten, and the commit swaps exactly the two
  // straddled files — 6 of 8 files stay byte-identical and the pre-delete
  // version still time-travels. The audit columns (files rewritten /
  // untouched, version, pre-delete count) ride in-plan; the oracle
  // replays the surviving-row algebra plus those structural constants.
  private def x101Spec: QuerySpec =
    QuerySpec("x101_snapshot_delete",
      (s, d) => {
        import graft.io.Snapshots
        // the table is MUTATED by the query — the 8-slice layout stages
        // ONCE as an immutable template (Staging.dir), and each run
        // file-copies it to a fresh root (manifest paths are
        // table-relative-safe here because deleteWhere resolves them
        // through the copied manifest). The benched body is the DELETE,
        // not table construction.
        val template = Staging.dir("deltbl", d) { tmp =>
          slicedSnapshotTable(s, tmp, d); ()
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_del_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val w = Tables.documents(s, d).agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
        val lo = 2 * w + w / 2
        val hi = 3 * w + w / 2 - 1
        val res = Snapshots.deleteWhere(s, tbl, col("doc_id").between(lo, hi),
          prune = Some(("doc_id", lo.toString, hi.toString)))
        val audit = Snapshots.readAt(s, tbl, Some(res.version - 1))
          .agg(n.as("n_before"))
          .select(col("n_before"),
            lit(res.rewritten.size.toLong).as("files_rewritten"),
            lit(res.untouched.toLong).as("files_untouched"),
            lit(res.version).as("version"))
        Snapshots.readAt(s, tbl)
          .groupBy("source")
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some(s"""WITH ${zoneBoundsSql(2)},
           |kept AS (SELECT d.* FROM documents d, b
           |         WHERE d.doc_id < b.lo OR d.doc_id > b.hi)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       (SELECT count(*) FROM documents) AS n_before,
           |       CAST(2 AS BIGINT) AS files_rewritten,
           |       CAST(6 AS BIGINT) AS files_untouched,
           |       CAST(9 AS BIGINT) AS version
           |FROM kept GROUP BY source ORDER BY source""".stripMargin))

  // Zone-map FILE PRUNING on the read path (x102): a doc_id range scan
  // over the same 8-slice layout opens only the two files whose recorded
  // [min,max] intersect the range — manifest-level data skipping, the
  // scan-side dividend of recording stats at commit. The read-only table
  // stages once per JVM (bench times the pruned read, not table
  // construction); files_scanned/files_pruned ride in-plan.
  private def x102Spec: QuerySpec =
    QuerySpec("x102_zonemap_scan",
      (s, d) => {
        import graft.io.Snapshots
        val root = Staging.dir("zonemap", d) { tmp => slicedSnapshotTable(s, tmp, d); () }
        val tbl = s"$root/tbl"
        val w = Tables.documents(s, d).agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
        val lo = 5 * w + w / 2
        val hi = 6 * w + w / 2 - 1
        val (scan, pruned) = Snapshots.pruneFiles(s, tbl, "doc_id", lo.toString, hi.toString)
        Snapshots.readPruned(s, tbl, "doc_id", lo.toString, hi.toString)
          .filter(col("doc_id").between(lo, hi))
          .select(col("doc_id"), col("source"),
            lit(scan.size.toLong).as("files_scanned"),
            lit(pruned.size.toLong).as("files_pruned"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${zoneBoundsSql(5)}
           |SELECT doc_id, source,
           |       CAST(2 AS BIGINT) AS files_scanned,
           |       CAST(6 AS BIGINT) AS files_pruned
           |FROM documents, b WHERE doc_id BETWEEN b.lo AND b.hi
           |ORDER BY doc_id""".stripMargin))

  // COPY-ON-WRITE keyed MERGE through the snapshot manifest (x119): a CDC
  // batch (updates to a narrow doc_id range + brand-new doc_ids) lands as
  // ONE transactional commit. The updates' own key bounds drive zone-map
  // pruning; the semi-join match check narrows the rewrite to exactly the
  // two files holding matched keys — 6 of 8 stay byte-identical, the
  // pre-merge version still time-travels, and the insert rows ride in the
  // same new file set. Completes the mutation surface next to x101
  // (DELETE) and x108 (UPDATE WHERE); oracle replays the merge algebra
  // plus the structural constants.
  private def x119Spec: QuerySpec =
    QuerySpec("x119_snapshot_merge",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("mergetbl", d) { tmp =>
          slicedSnapshotTable(s, tmp, d); ()
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_merge_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 8 + 1
        val lo = 2 * w + w / 2
        val hi = 3 * w + w / 2 - 1
        val updates = docs.filter(col("doc_id").between(lo, hi))
            .withColumn("n_chars", col("n_chars") * 2)
          .unionByName(docs.filter(col("doc_id") < 100)
            .select((col("doc_id") + maxId + 1).as("doc_id"),
              lit("src_merge").as("source"), col("n_chars")))
        val res = Snapshots.mergeInto(s, tbl, updates, keys = Seq("doc_id"),
          pruneOn = Some("doc_id"))
        val audit = Snapshots.readAt(s, tbl, Some(res.version - 1))
          .agg(n.as("n_before"))
          .select(col("n_before"),
            lit(res.rewritten.size.toLong).as("files_rewritten"),
            lit(res.untouched.toLong).as("files_untouched"),
            lit(res.version).as("version"))
        Snapshots.readAt(s, tbl)
          .groupBy("source")
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some(s"""WITH ${zoneBoundsSql(2)},
           |mx AS (SELECT max(doc_id) AS m FROM documents),
           |merged AS (
           |  SELECT doc_id, source,
           |         CASE WHEN doc_id BETWEEN b.lo AND b.hi
           |              THEN n_chars * 2 ELSE n_chars END AS n_chars
           |  FROM documents, b
           |  UNION ALL
           |  SELECT doc_id + m + 1, 'src_merge', n_chars
           |  FROM documents, mx WHERE doc_id < 100)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       (SELECT count(*) FROM documents) AS n_before,
           |       CAST(2 AS BIGINT) AS files_rewritten,
           |       CAST(6 AS BIGINT) AS files_untouched,
           |       CAST(9 AS BIGINT) AS version
           |FROM merged GROUP BY source ORDER BY source""".stripMargin))

  // Cross-source OVERLAP audit from KMV sketches (x103): how much do two
  // sources' distinct-bigram vocabularies overlap — union cardinality,
  // Jaccard numerator and intersection estimated purely from the k=64
  // smallest-hash summaries (Beyer et al. 2007 multiset estimators),
  // never re-touching corpus data. Deterministic integer algebra → the
  // oracle replays merge, membership flags and both estimators exactly;
  // the exact intersection rides along so estimate quality is visible
  // per row.
  private def x103Spec: QuerySpec = {
    val srcs = Seq("src0", "src1", "src2", "src3")
    QuerySpec("x103_kmv_overlap",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("text").isNotNull && col("source").isin(srcs: _*))
        val toks = docs.select(col("source"),
          filter(split(lower(col("text")), "\\s+"), x => x =!= "").as("__t"))
        val bigrams = toks.select(col("source"), explode(zip_with(
            slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
            slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
            (a, b) => concat(a, lit(" "), b))).as("bg"))
        val sketch = graft.ext.Sketches.kmvSketch(bigrams, col("source"), col("bg"), k = 64)
        val ov = graft.ext.Sketches.kmvOverlap(sketch, k = 64)
        val distinctBg = bigrams.distinct()
        val exact = distinctBg.as("a").join(distinctBg.as("b"),
            col("a.source") < col("b.source") && col("a.bg") === col("b.bg"))
          .groupBy(col("a.source").as("g_a"), col("b.source").as("g_b"))
          .agg(n.as("exact_intersect"))
        ov.withColumnRenamed("g_a", "source_a").withColumnRenamed("g_b", "source_b")
          .join(exact.withColumnRenamed("g_a", "source_a")
            .withColumnRenamed("g_b", "source_b"), Seq("source_a", "source_b"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH tok AS (SELECT source,
             |         list_filter(regexp_split_to_array(lower(text), '\\s+'),
             |                     x -> x <> '') AS t
             |       FROM documents WHERE text IS NOT NULL
             |         AND source IN (${srcs.map(x => s"'$x'").mkString(", ")})),
             |bg AS (SELECT DISTINCT source, z[1] || ' ' || z[2] AS bg
             |       FROM (SELECT source, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
             |             FROM tok WHERE len(t) >= 2)),
             |h AS (SELECT DISTINCT source,
             |        CAST(('0x' || substr(md5(bg), 1, 12)) AS BIGINT) AS h
             |      FROM bg),
             |topk AS (SELECT source, h,
             |           row_number() OVER (PARTITION BY source ORDER BY h) AS rk
             |         FROM h QUALIFY rk <= 64),
             |pairs AS (SELECT a.source AS sa, b.source AS sb
             |          FROM (SELECT DISTINCT source FROM topk) a
             |          JOIN (SELECT DISTINCT source FROM topk) b ON a.source < b.source),
             |u AS (SELECT sa, sb, h, max(ia) AS ia, max(ib) AS ib FROM (
             |        SELECT p.sa, p.sb, t.h, 1 AS ia, 0 AS ib
             |        FROM pairs p JOIN topk t ON t.source = p.sa
             |        UNION ALL
             |        SELECT p.sa, p.sb, t.h, 0, 1
             |        FROM pairs p JOIN topk t ON t.source = p.sb)
             |      GROUP BY 1, 2, 3),
             |m AS (SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
             |      FROM u QUALIFY rk <= 64),
             |agg AS (SELECT sa, sb, count(*) AS msz, max(h) AS hk,
             |          sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) AS j
             |        FROM m GROUP BY 1, 2),
             |est AS (SELECT sa, sb, j, msz,
             |          CASE WHEN msz < 64 THEN msz
             |               ELSE (63 * 281474976710656) // hk END AS eu
             |        FROM agg),
             |fin AS (SELECT sa, sb, eu, j,
             |          CASE WHEN msz < 64 THEN j ELSE (j * eu) // 64 END AS ei
             |        FROM est),
             |exact AS (SELECT a.source AS sa, b.source AS sb, count(*) AS ex
             |          FROM bg a JOIN bg b ON a.source < b.source AND a.bg = b.bg
             |          GROUP BY 1, 2)
             |SELECT fin.sa AS source_a, fin.sb AS source_b,
             |       CAST(eu AS BIGINT) AS est_union,
             |       CAST(j AS BIGINT) AS overlap_k,
             |       CAST(ei AS BIGINT) AS est_intersect,
             |       CAST(ex AS BIGINT) AS exact_intersect
             |FROM fin JOIN exact ON fin.sa = exact.sa AND fin.sb = exact.sb
             |ORDER BY 1, 2""".stripMargin))
  }

  // Aho–Corasick blocklist screen (x104): per-document OVERLAPPING
  // occurrence counts of a multi-pattern blocklist in ONE linear scan —
  // the C4 dirty-word / policy-phrase filter primitive, where thousands
  // of patterns must not mean thousands of regex passes. The pattern set
  // exercises nesting ("able" inside every "table"), phrase patterns
  // with spaces, self-overlap ("a a" in "a a a"), and a never-matching
  // probe. The oracle brute-forces the position grid (every (doc, pat,
  // offset) cell) in SQL — no automaton on the oracle side, so the fail/
  // output-link machinery is what's being checked.
  private def x104Spec: QuerySpec = {
    val pats = Seq("fast", "table", "able", "a a", "scan slow", "zzzz")
    val cols = Seq("c_fast", "c_table", "c_able", "c_aa", "c_scanslow", "c_zzzz")
    QuerySpec("x104_blocklist_ac",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val withC = docs.select(col("doc_id"),
          graft.functions.TextExprs.multiPatternCounts(col("text"), pats).as("__c"))
        val proj = cols.zipWithIndex.foldLeft(withC) { case (df, (c, i)) =>
          df.withColumn(c, element_at(col("__c"), i + 1))
        }
        proj.withColumn("total_hits", cols.map(col).reduce(_ + _))
          .withColumn("blocked", (col("total_hits") > 0).cast("long"))
          .drop("__c")
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT * FROM (VALUES (1, 'fast'), (2, 'table'), (3, 'able'),
             |            (4, 'a a'), (5, 'scan slow'), (6, 'zzzz')) AS p(pid, pat)),
             |pos AS (SELECT d.doc_id, p.pid,
             |          unnest(range(1, len(d.text) - len(p.pat) + 2)) AS i
             |        FROM documents d, p WHERE d.text IS NOT NULL),
             |hits AS (SELECT pos.doc_id, pos.pid, count(*) AS c
             |         FROM pos JOIN documents d ON pos.doc_id = d.doc_id
             |                  JOIN p ON pos.pid = p.pid
             |         WHERE substr(d.text, CAST(pos.i AS INTEGER), len(p.pat)) = p.pat
             |         GROUP BY 1, 2),
             |piv AS (SELECT b.doc_id,
             |          COALESCE(max(CASE WHEN pid = 1 THEN c END), 0) AS c_fast,
             |          COALESCE(max(CASE WHEN pid = 2 THEN c END), 0) AS c_table,
             |          COALESCE(max(CASE WHEN pid = 3 THEN c END), 0) AS c_able,
             |          COALESCE(max(CASE WHEN pid = 4 THEN c END), 0) AS c_aa,
             |          COALESCE(max(CASE WHEN pid = 5 THEN c END), 0) AS c_scanslow,
             |          COALESCE(max(CASE WHEN pid = 6 THEN c END), 0) AS c_zzzz
             |        FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) b
             |        LEFT JOIN hits h ON b.doc_id = h.doc_id GROUP BY 1)
             |SELECT doc_id, CAST(c_fast AS BIGINT) AS c_fast,
             |       CAST(c_table AS BIGINT) AS c_table,
             |       CAST(c_able AS BIGINT) AS c_able,
             |       CAST(c_aa AS BIGINT) AS c_aa,
             |       CAST(c_scanslow AS BIGINT) AS c_scanslow,
             |       CAST(c_zzzz AS BIGINT) AS c_zzzz,
             |       CAST(c_fast + c_table + c_able + c_aa + c_scanslow + c_zzzz
             |            AS BIGINT) AS total_hits,
             |       CAST((c_fast + c_table + c_able + c_aa + c_scanslow + c_zzzz) > 0
             |            AS BIGINT) AS blocked
             |FROM piv ORDER BY doc_id""".stripMargin))
  }

  // ST — streaming SEMANTIC dedup ingest gate (st20): x63's SemDeDup
  // shape behind the NearDupGate ingest discipline. Embeddings drain in
  // three micro-batches; each batch drops vectors cosine-matching the
  // CELL-PARTITIONED kept history (read pruned to the batch's probed
  // cells), applies the keep-smaller-id rule within the batch, then
  // appends its kept vectors. Planted identical twins (vec_id < 20 →
  // +100000) all arrive in the LAST batch, so originals ingested one/two
  // batches earlier must shadow them through the history path (and the
  // %3==2 originals through the within-batch rule). As in x63, no
  // organic pair reaches 0.95 — the oracle is the closed-form survivor
  // set.
  private def st20Spec: QuerySpec =
    QuerySpec("st20_stream_semdedup_gate",
      (s, d) => {
        val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val src = Staging.slicedSource("sdg", d) { tmp =>
          val slices = Seq(
            emb.filter(col("vec_id") % 3 === 0),
            emb.filter(col("vec_id") % 3 === 1),
            emb.filter(col("vec_id") % 3 === 2)
              .unionByName(emb.filter(col("vec_id") < 20)
                .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))))
          slices.zipWithIndex.foreach { case (df, i) =>
            Staging.writeSlice(df, s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_sdg_run").toString
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.SemDedupGate.start(s,
            s.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            x63Centroids(s, d),
            histDir = s"$tmp/hist", outDir = s"$tmp/out",
            checkpoint = s"$tmp/ckpt", threshold = 0.95, nprobe = 2)
          q.awaitTermination()
        }
        s.read.option("recursiveFileLookup", "true").parquet(s"$tmp/out")
          .select(col("vec_id"), (col("vec_id") % 3).cast("long").as("ingest_batch"))
          .orderBy("vec_id")
      },
      Some("""SELECT vec_id, CAST(vec_id % 3 AS BIGINT) AS ingest_batch
             |FROM embeddings ORDER BY vec_id""".stripMargin))

  /** Corpus-trained WordPiece vocab per sf dir — training is a
    * once-per-corpus offline artifact (same caching discipline as the
    * quantizers/classifiers), so benched x105 times the encode path. */
  private val wpVocabs =
    new java.util.concurrent.ConcurrentHashMap[String, graft.functions.WordPiece.Vocab]()
  private def wpVocab(s: SparkSession, d: String): graft.functions.WordPiece.Vocab =
    wpVocabs.computeIfAbsent(d, { _ =>
      graft.functions.WordPiece.train(
        Tables.documents(s, d).filter(col("text").isNotNull), col("text"))
    })

  // WordPiece corpus roundtrip (x105): the third tokenizer family (BERT's
  // subword scheme next to byte-BPE x31 and unigram x80). The trainer
  // retains every single char in the piece CLASS it occurs in (initial /
  // ##-continuation), so corpus text never hits [UNK] and
  // decode(encode(text)) must byte-equal the canonical single-space form
  // of EVERY document — md5-checked in-plan. Piece
  // counts are bounded by words (≥, one piece covers ≤ a word) and
  // non-space chars (≤, every piece covers ≥ 1 char).
  private def x105Spec: QuerySpec =
    QuerySpec("x105_wordpiece_roundtrip",
      (s, d) => {
        import graft.functions.GraftWordPiece
        val bc = s.sparkContext.broadcast(wpVocab(s, d))
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val words = filter(split(col("text"), "\\s+"), x => x =!= "")
        docs.select(col("doc_id"), col("text"),
            GraftWordPiece.wordpieceIdsBc(col("text"), bc).as("__ids"))
          .select(col("doc_id"),
            (md5(GraftWordPiece.wordpieceDetokIds(col("__ids"), bc).cast("binary")) ===
              md5(array_join(words, " ").cast("binary"))).cast("long").as("roundtrip_ok"),
            (size(col("__ids")).cast("long") >= size(words).cast("long") &&
              size(col("__ids")).cast("long") <=
                length(regexp_replace(col("text"), "\\s", "")).cast("long"))
              .cast("long").as("bounds_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(1 AS BIGINT) AS roundtrip_ok,
             |       CAST(1 AS BIGINT) AS bounds_ok
             |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin))

  // WordPiece EXACT behavior (x106): the synthetic vocab's greedy
  // longest-match walk pinned value-by-value on the fixture strings —
  // token counts, id sums under the canonical [UNK]-first sorted id
  // assignment, and whole-word-UNK counts (case misses, digits, CJK all
  // route through the coverage holes). VALUES precomputed by an
  // INDEPENDENT python reimplementation (scripts/wordpiece_oracle.py).
  private def x106Spec: QuerySpec =
    QuerySpec("x106_wordpiece_fixture",
      (s, d) => {
        import s.implicits._
        import graft.functions.{GraftWordPiece, WordPiece}
        val bc = s.sparkContext.broadcast(WordPiece.syntheticVocab)
        BpeFixture.strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("fid", "text")
          .select(col("fid"), GraftWordPiece.wordpieceIdsBc(col("text"), bc).as("ids"))
          .select(col("fid"), size(col("ids")).cast("long").as("n_tokens"),
            aggregate(col("ids"), lit(0L), (acc, x) => acc + x).as("id_sum"),
            size(filter(col("ids"), x => x === 0)).cast("long").as("n_unk"))
          .orderBy("fid")
      },
      Some("""SELECT CAST(fid AS BIGINT) AS fid, CAST(n AS BIGINT) AS n_tokens,
             |       CAST(ids AS BIGINT) AS id_sum, CAST(u AS BIGINT) AS n_unk
             |FROM (VALUES (0,31,836,1),(1,37,841,2),(2,30,597,3),(3,18,338,2),
             |             (4,7,90,5),(5,16,197,7),(6,6,360,0),(7,1,34,0),(8,0,0,0),
             |             (9,56,1105,0),(10,24,525,0),(11,3,0,3)) AS t(fid, n, ids, u)
             |ORDER BY fid""".stripMargin))

  // Integer log-histogram quantile sketch (x107): mergeable percentiles
  // WITHOUT a sort — the DDSketch idea re-based onto purely integer
  // buckets (bitlen·16 + top-4-bits; log-gamma bucketing would put
  // engine-ulp ln() differences on bucket boundaries). Per-source
  // p50/p90/p99 of doc length answered from ≤ 16·64-bucket summaries
  // with map-side combine; the exact rank value rides along, and
  // err_ok pins the sketch's sub-bucket guarantee (est ≤ exact < est +
  // 2^(bitlen-4), i.e. the true value lies in the estimate's bucket).
  // The oracle rebuilds buckets, cumulative ranks, the first-crossing
  // rule, AND the guarantee flag bit-exactly in SQL.
  private def x107Spec: QuerySpec =
    QuerySpec("x107_loghist_quantiles",
      (s, d) => {
        import graft.ext.Sketches
        val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        val sk = Sketches.logHist(docs, col("source"), col("n_chars"))
        val est = Sketches.logHistQuantiles(sk, Seq(500, 900, 990))
        // exact rank values (same ((N−1)·q) div 1000 rule) — small-group
        // sort via window is the oracle twin riding in-plan, not the
        // scale path (the sketch is)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("n_chars", "doc_id")
        val ranked = docs.select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("__rk", row_number().over(w) - 1)
        val nBy = docs.groupBy("source").agg(n.as("__n"))
        val exact = ranked.join(nBy, "source")
          .withColumn("q", explode(array(lit(500L), lit(900L), lit(990L))))
          .filter(col("__rk") === expr("((__n - 1) * q) div 1000"))
          .select(col("source"), col("q"), col("n_chars").as("exact"))
        est.withColumnRenamed("group", "source")
          .join(exact, Seq("source", "q"))
          .withColumn("err_ok",
            (col("est") <= col("exact") &&
              col("exact") < col("est") + greatest(lit(1L),
                expr("CAST(pow(2, length(conv(exact, 10, 2)) - 4) AS BIGINT)")))
              .cast("long"))
          .select(col("source"), col("q"), col("est"), col("exact"), col("err_ok"))
          .orderBy("source", "q")
      },
      Some("""WITH d AS (SELECT source, doc_id, n_chars FROM documents
             |           WHERE text IS NOT NULL),
             |b AS (SELECT source,
             |        CASE WHEN n_chars <= 0 THEN 0
             |             WHEN len(printf('%b', n_chars)) <= 4
             |               THEN len(printf('%b', n_chars)) * 16 + n_chars
             |             ELSE len(printf('%b', n_chars)) * 16 +
             |                  ((n_chars >> (len(printf('%b', n_chars)) - 4)) & 15)
             |        END AS bucket
             |      FROM d),
             |sk AS (SELECT source, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
             |cum AS (SELECT source, bucket, cnt,
             |          sum(cnt) OVER (PARTITION BY source ORDER BY bucket) AS c,
             |          sum(cnt) OVER (PARTITION BY source) AS n
             |        FROM sk),
             |qs AS (SELECT * FROM (VALUES (500), (900), (990)) AS q(q)),
             |hit AS (SELECT source, q, min(bucket) AS b
             |        FROM cum, qs WHERE c > ((n - 1) * q) // 1000
             |        GROUP BY 1, 2),
             |est AS (SELECT source, q,
             |          CASE WHEN b >> 4 <= 4 THEN b & 15
             |               ELSE (b & 15) << ((b >> 4) - 4) END AS est
             |        FROM hit),
             |rk AS (SELECT source, doc_id, n_chars,
             |         row_number() OVER (PARTITION BY source
             |                            ORDER BY n_chars, doc_id) - 1 AS r,
             |         count(*) OVER (PARTITION BY source) AS n
             |       FROM d),
             |ex AS (SELECT source, q, n_chars AS exact
             |       FROM rk, qs WHERE r = ((n - 1) * q) // 1000)
             |SELECT est.source, CAST(est.q AS BIGINT) AS q,
             |       CAST(est.est AS BIGINT) AS est,
             |       CAST(ex.exact AS BIGINT) AS exact,
             |       CAST(est.est <= ex.exact AND
             |            ex.exact < est.est + GREATEST(1,
             |              CAST(pow(2, len(printf('%b', ex.exact)) - 4) AS BIGINT))
             |            AS BIGINT) AS err_ok
             |FROM est JOIN ex ON est.source = ex.source AND est.q = ex.q
             |ORDER BY 1, 2""".stripMargin))

  // COPY-ON-WRITE row-level UPDATE through the manifest (x108): the
  // "UPDATE WHERE" half of the mutation surface next to x101's DELETE —
  // same zone-map pruning, same match check, same one-commit swap. A
  // doc_id range straddling slices 4 and 5 gets n_chars bumped by 10⁶;
  // exactly those 2 of 8 files are rewritten (non-matching rows in them
  // pass through unchanged), and the pre-update version still sums to
  // the original. The oracle replays the conditional bump and the
  // structural constants.
  private def x108Spec: QuerySpec =
    QuerySpec("x108_snapshot_update",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("deltbl", d) { tmp =>
          slicedSnapshotTable(s, tmp, d); ()
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_upd_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val w = Tables.documents(s, d).agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
        val lo = 4 * w + w / 2
        val hi = 5 * w + w / 2 - 1
        val res = Snapshots.updateWhere(s, tbl, col("doc_id").between(lo, hi),
          Seq("n_chars" -> (col("n_chars") + 1000000L)),
          prune = Some(("doc_id", lo.toString, hi.toString)))
        val audit = Snapshots.readAt(s, tbl, Some(res.version - 1))
          .agg(sum(col("n_chars")).cast("long").as("sum_before"))
          .select(col("sum_before"),
            lit(res.rewritten.size.toLong).as("files_rewritten"),
            lit(res.untouched.toLong).as("files_untouched"),
            lit(res.version).as("version"))
        Snapshots.readAt(s, tbl)
          .groupBy("source")
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some(s"""WITH ${zoneBoundsSql(4)},
           |upd AS (SELECT source,
           |          n_chars + CASE WHEN doc_id BETWEEN b.lo AND b.hi
           |                         THEN 1000000 ELSE 0 END AS n_chars
           |        FROM documents, b)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) AS sum_before,
           |       CAST(2 AS BIGINT) AS files_rewritten,
           |       CAST(6 AS BIGINT) AS files_untouched,
           |       CAST(9 AS BIGINT) AS version
           |FROM upd GROUP BY source ORDER BY source""".stripMargin))

  // PMI collocation mining (x109): corpus-level association scores over
  // the bigram stream with positional marginals, micro-nat integer
  // convention (x55's), min-count floor 5, top-50 by PMI. The oracle
  // replays the identical counts and the one fixed parenthesization of
  // the log-ratio.
  private def x109Spec: QuerySpec =
    QuerySpec("x109_pmi_collocations",
      (s, d) => graft.ext.LmScore.pmiCollocations(
        Tables.documents(s, d), col("doc_id"), col("text"),
        minCount = 5, k = 50),
      Some("""WITH tok AS (SELECT list_filter(
             |         regexp_split_to_array(lower(text), '\s+'),
             |         x -> x <> '') AS t
             |       FROM documents),
             |bg AS (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
             |       FROM tok WHERE len(t) >= 2),
             |b2 AS (SELECT z[1] AS w1, z[2] AS w2 FROM bg),
             |cab AS (SELECT w1, w2, count(*) AS n_pair FROM b2 GROUP BY 1, 2),
             |ca AS (SELECT w1, count(*) AS na FROM b2 GROUP BY 1),
             |cb AS (SELECT w2, count(*) AS nb FROM b2 GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM b2)
             |SELECT w1, w2, n_pair,
             |       CAST(round(ln((CAST(n_pair AS DOUBLE) * n) /
             |                     (CAST(na AS DOUBLE) * nb)) * 1000000, 0)
             |            AS BIGINT) AS pmi_micro
             |FROM cab JOIN ca USING (w1) JOIN cb USING (w2), n
             |WHERE n_pair >= 5
             |ORDER BY pmi_micro DESC, w1 ASC, w2 ASC LIMIT 50""".stripMargin))

  // EXACT set-similarity join via PPJoin prefix filtering (x110): the
  // third near-dup implementation over the same planted corpus, same
  // oracle as x02/x03 — but where x03's recall is 1−ε by LSH sketch
  // probability, x110's is exactly 1 by the prefix-filter theorem, with
  // candidate generation still an equi-join (no all-pairs anywhere).
  private def x110Spec: QuerySpec =
    QuerySpec("x110_ssjoin_prefix",
      (s, d) => TextDedup.prefixFilterNearDups(nearDupCorpus(s, d),
        col("doc_id"), col("text"), k = 3, tauNum = 4, tauDen = 5)
        .orderBy("id_a", "id_b"),
      Some(neardupOracle))

  // Per-user gap fill (x111): the events stream regularized onto an
  // hourly grid, last observation carried forward across empty hours.
  // Values pass through bit-identically (no arithmetic on `value`); the
  // per-(user, hour) survivor rule (greatest (ts, event_id)) and the
  // struct-based forward fill (an observed NULL value is carried, not
  // skipped past) are both replayed in SQL — DuckDB's IGNORE NULLS
  // last_value over a CASE-wrapped struct mirrors Spark's
  // last(ignoreNulls) over the left-join struct.
  private def x111Spec: QuerySpec =
    QuerySpec("x111_gap_fill",
      (s, d) => graft.ops.Temporal.gapFill(
          Tables.events(s, d), "user_id", "ts", 3600L,
          Seq("value"), col("event_id"))
        .orderBy("user_id", "ts_epoch"),
      Some("""WITH b AS (SELECT user_id,
             |         epoch_us(ts) // 3600000000 AS bkt, value, ts, event_id
             |       FROM events WHERE ts IS NOT NULL),
             |obs AS (SELECT user_id, bkt, value FROM (
             |          SELECT user_id, bkt, value,
             |                 row_number() OVER (PARTITION BY user_id, bkt
             |                   ORDER BY ts DESC, event_id DESC) AS rn
             |          FROM b) WHERE rn = 1),
             |bounds AS (SELECT user_id, min(bkt) AS lo, max(bkt) AS hi
             |           FROM b GROUP BY 1),
             |grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS bkt
             |         FROM bounds),
             |j AS (SELECT g.user_id, g.bkt,
             |        CASE WHEN o.user_id IS NOT NULL
             |             THEN {'v': o.value} END AS ov
             |      FROM grid g LEFT JOIN obs o
             |        ON g.user_id = o.user_id AND g.bkt = o.bkt),
             |f AS (SELECT user_id, bkt,
             |        last_value(ov IGNORE NULLS) OVER (PARTITION BY user_id
             |          ORDER BY bkt
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv,
             |        ov IS NOT NULL AS hit
             |      FROM j)
             |SELECT user_id, bkt * 3600 AS ts_epoch, fv.v AS value,
             |       CAST(hit AS BIGINT) AS observed
             |FROM f ORDER BY user_id, ts_epoch""".stripMargin))

  // Cross-corpus k-gram novelty (x112): every 7th document plays the
  // "already ingested" reference corpus; the rest are scored by how many
  // of their distinct 8-grams the reference already contains. Exact
  // integer counts; the planted near-dup variants in the corpus guarantee
  // nonzero n_seen mass.
  private def x112Spec: QuerySpec =
    QuerySpec("x112_ngram_novelty",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.ext.Contamination.noveltyScores(
            docs.filter(col("doc_id") % 7 =!= 0), col("doc_id"), col("text"),
            docs.filter(col("doc_id") % 7 === 0), col("text"), k = 8)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t
             |       FROM documents),
             |g AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 6),
             |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
             |             t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' ||
             |             t[i+6] || ' ' || t[i+7])) AS gram
             |      FROM t),
             |refg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0),
             |dg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 7 <> 0)
             |SELECT dg.doc_id, count(*) AS n_shingles,
             |       CAST(sum(CASE WHEN refg.gram IS NOT NULL THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_seen
             |FROM dg LEFT JOIN refg ON dg.gram = refg.gram
             |GROUP BY dg.doc_id ORDER BY dg.doc_id""".stripMargin))

  // Edit-distance-≤1 fuzzy self-join (x113): FastSS deletion-neighborhood
  // blocking over customer names (id-like strings — one-digit typos are
  // the classic record-linkage case; per-row neighbor count is bounded by
  // digits × alphabet, so output stays linear in rows at every SF). The
  // oracle is the straight ALL-PAIRS levenshtein in SQL — the deletion
  // blocking has recall 1 by theorem, so any missed pair hash-mismatches.
  private def x113Spec: QuerySpec =
    QuerySpec("x113_edit1_fuzzy_join",
      (s, d) => graft.ops.Dedup.editDistanceOnePairs(
          Tables.customer(s, d), col("c_custkey"), col("c_name"))
        .orderBy("id_a", "id_b"),
      Some("""WITH c AS (SELECT c_custkey, c_name FROM customer)
             |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
             |FROM c a JOIN c b ON a.c_custkey < b.c_custkey
             |WHERE levenshtein(a.c_name, b.c_name) <= 1
             |ORDER BY 1, 2""".stripMargin))

  // Semi-structured extraction (x114): the events.props JSON column
  // parsed IN-PLAN (schema-directed from_json — codegen'd struct getter,
  // not a per-row UDF) and aggregated per event type. Malformed/null
  // payloads surface as null fields and are counted, not dropped. At
  // scale this is the "JSON lake column" access path: the parse is a
  // narrow map fused into the scan stage, the aggregation map-side
  // combines, and only referenced fields are materialized.
  private def x114Spec: QuerySpec =
    QuerySpec("x114_json_extract",
      (s, d) => Tables.events(s, d)
        .withColumn("__k",
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k"))
        .groupBy("event_type")
        .agg(n.as("n_events"),
          sum(col("props").isNull.cast("long")).as("n_null_props"),
          sum(col("__k").isNotNull.cast("long")).as("n_k"),
          sum(col("__k")).as("sum_k"),
          min(col("__k")).as("min_k"),
          max(col("__k")).as("max_k"))
        .orderBy("event_type"),
      Some("""WITH e AS (SELECT event_type, props,
             |         CASE WHEN props IS NOT NULL AND json_valid(props)
             |              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
             |         END AS k
             |       FROM events)
             |SELECT event_type, count(*) AS n_events,
             |       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_null_props,
             |       CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_k,
             |       CAST(sum(k) AS BIGINT) AS sum_k,
             |       min(k) AS min_k, max(k) AS max_k
             |FROM e GROUP BY 1 ORDER BY 1""".stripMargin))

  // Rolling time-window anomaly detection (x115): per user, each event's
  // value tested against the trailing 7-day history with an all-integer
  // z-test (graft.ops.Anomaly — the (n·x−s1)²·den > num·(n·s2−s1²) form,
  // z > √(64/25) = 1.6, ≥8 history rows). The RANGE frame excludes the
  // current instant's peers, so a same-second burst never vouches for
  // itself; both engines evaluate the identical integer predicate.
  private def x115Spec: QuerySpec =
    QuerySpec("x115_rolling_anomaly",
      (s, d) => {
        val e = Tables.events(s, d)
          .filter(col("ts").isNotNull && col("value").isNotNull)
          .withColumn("ts_epoch", expr("unix_micros(ts) div 1000000"))
          .withColumn("value_cents", round(col("value") * 100, 0).cast("long"))
        graft.ops.Anomaly.rollingDeviationFlags(e, "user_id", "ts_epoch",
            "value_cents", windowSec = 604800L, minN = 8L,
            thrNum = 64L, thrDen = 25L)
          .select("event_id", "user_id", "ts_epoch", "value_cents",
            "n_win", "dev2", "nvar")
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
             |         epoch_us(ts) // 1000000 AS ts_epoch,
             |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents
             |       FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
             |w AS (SELECT event_id, user_id, ts_epoch, value_cents,
             |        count(*) OVER win AS n_win,
             |        CAST(sum(value_cents) OVER win AS BIGINT) AS s1,
             |        CAST(sum(value_cents * value_cents) OVER win AS BIGINT) AS s2
             |      FROM e
             |      WINDOW win AS (PARTITION BY user_id ORDER BY ts_epoch
             |        RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING))
             |SELECT event_id, user_id, ts_epoch, value_cents, n_win,
             |       (n_win*value_cents - s1)*(n_win*value_cents - s1) AS dev2,
             |       n_win*s2 - s1*s1 AS nvar
             |FROM w
             |WHERE n_win >= 8
             |  AND 25*(n_win*value_cents - s1)*(n_win*value_cents - s1)
             |      > 64*(n_win*s2 - s1*s1)
             |ORDER BY event_id""".stripMargin))

  // 2-D skyline (x116): the Pareto frontier of parts — cheapest price for
  // every attainable size, nothing dominated. The oracle is the quadratic
  // NOT EXISTS over distinct pairs; the Spark plan is the O(n log n) sweep
  // (groupBy-collapse → per-x max → two-phase bucketed exclusive prefix
  // max, graft.ops.Skyline) — same frontier by the sweep theorem.
  private def x116Spec: QuerySpec =
    QuerySpec("x116_skyline",
      (s, d) => graft.ops.Skyline.frontierMinXMaxY(Tables.part(s, d),
          round(col("p_retailprice") * 100, 0).cast("long"),
          col("p_size").cast("long"))
        .select(col("x").as("price_cents"), col("y").as("p_size"),
          col("n").as("n_parts"))
        .orderBy("price_cents"),
      Some("""WITH p AS (SELECT CAST(round(p_retailprice*100, 0) AS BIGINT)
             |           AS price_cents,
             |         CAST(p_size AS BIGINT) AS p_size, count(*) AS n_parts
             |       FROM part GROUP BY 1, 2)
             |SELECT price_cents, p_size, n_parts FROM p a
             |WHERE NOT EXISTS (SELECT 1 FROM p b WHERE
             |   (b.price_cents < a.price_cents AND b.p_size >= a.p_size) OR
             |   (b.price_cents <= a.price_cents AND b.p_size > a.p_size))
             |ORDER BY price_cents""".stripMargin))

  // Grid-bucketed planar radius self-join (x117): customers dropped onto a
  // 65536² integer plane by md5 (deterministic in both engines), all pairs
  // within a density-adaptive radius. The oracle is the all-pairs
  // quadratic join; the Spark plan is the 9-cell-offset EQUI-join
  // (graft.ops.Spatial) whose candidate set — and output — stays linear in
  // points because the radius shrinks as ~1/√n.
  private def x117Spec: QuerySpec =
    QuerySpec("x117_grid_radius_join",
      (s, d) => {
        val h = md5(col("c_custkey").cast("string").cast("binary"))
        val pts = Tables.customer(s, d).select(col("c_custkey").as("id"),
          conv(substring(h, 1, 4), 16, 10).cast("long").as("x"),
          conv(substring(h, 5, 4), 16, 10).cast("long").as("y"))
        graft.ops.Spatial.adaptiveGridRadiusSelfJoin(pts,
            col("id"), col("x"), col("y"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH c AS (SELECT c_custkey AS id,
             |         CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4))
             |              AS BIGINT) AS x,
             |         CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 5, 4))
             |              AS BIGINT) AS y
             |       FROM customer),
             |r AS (SELECT 2*(65536 // CAST(ceil(sqrt(count(*))) AS BIGINT)) AS rad
             |      FROM c)
             |SELECT a.id AS id_a, b.id AS id_b,
             |       (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist2
             |FROM c a, c b, r
             |WHERE a.id < b.id
             |  AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= rad*rad
             |ORDER BY id_a, id_b""".stripMargin))

  // Ordered funnel (x118): view → click → purchase, each step strictly
  // after the previous and within 24 h of it, earliest-qualifying-event
  // semantics (graft.ops.Funnel). Attrition is real at sf0.01
  // (150 → 60 → 25 users), and the per-stage delay totals pin the chosen
  // instants exactly — a wrong min anywhere hash-mismatches.
  private def x118Spec: QuerySpec =
    QuerySpec("x118_funnel",
      (s, d) => graft.ops.Funnel.funnelStages(Tables.events(s, d),
          "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), deadlineSec = 86400L)
        .orderBy("stage_idx"),
      Some("""WITH t1 AS (SELECT user_id, min(ts) AS ts1 FROM events
             |        WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1),
             |t2 AS (SELECT e.user_id, min(e.ts) AS ts2, min(t1.ts1) AS p
             |       FROM events e JOIN t1 USING (user_id)
             |       WHERE e.event_type = 'click' AND e.ts > t1.ts1
             |         AND epoch_us(e.ts) - epoch_us(t1.ts1)
             |             <= CAST(86400 AS BIGINT) * 1000000
             |       GROUP BY 1),
             |t3 AS (SELECT e.user_id, min(e.ts) AS ts3, min(t2.ts2) AS p
             |       FROM events e JOIN t2 USING (user_id)
             |       WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
             |         AND epoch_us(e.ts) - epoch_us(t2.ts2)
             |             <= CAST(86400 AS BIGINT) * 1000000
             |       GROUP BY 1)
             |SELECT * FROM (
             |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
             |         count(*) AS n_users, CAST(0 AS BIGINT) AS sum_delay_s
             |  FROM t1
             |  UNION ALL
             |  SELECT 2, 'click', count(*),
             |         coalesce(CAST(sum((epoch_us(ts2) - epoch_us(p)) // 1000000)
             |                  AS BIGINT), 0)
             |  FROM t2
             |  UNION ALL
             |  SELECT 3, 'purchase', count(*),
             |         coalesce(CAST(sum((epoch_us(ts3) - epoch_us(p)) // 1000000)
             |                  AS BIGINT), 0)
             |  FROM t3
             |) ORDER BY stage_idx""".stripMargin))

  // WebDataset tar-shard export/ingest round trip (x120): the multimodal
  // training-corpus container — each SAMPLE is a run of adjacent tar
  // entries sharing a basename (`<id>.txt`, `<id>.src`), shards are
  // corpus-scaled buckets assembled with ONE tar_pack allocation per
  // shard (the binary_concat discipline — no quadratic accumulator fold),
  // then re-ingested via tar_entries. The oracle never sees tar bytes:
  // entry names, octal size fields, 512-byte block padding, and header
  // checksums are all load-bearing in the round trip, and the per-entry
  // size column must equal the UTF-8 byte length DuckDB computes from the
  // raw text. Companion `.src` entries ride along and are skipped on read
  // — non-matching-entry filtering is part of the ingest contract.
  private def x120Spec: QuerySpec =
    QuerySpec("x120_webdataset_shards",
      (s, d) => {
        val shards = graft.streaming.ShardExport.packShards(
          Tables.documents(s, d), crawlBuckets(s, d))
        shards
          .select(explode(graft.functions.TarExprs.tarEntries(col("tar_file"))).as("e"))
          .filter(col("e.name").endsWith(".txt"))
          .select(
            expr("CAST(substring(e.name, 1, length(e.name) - 4) AS BIGINT)").as("doc_id"),
            col("e.size").as("n_bytes"),
            decode(col("e.payload"), "UTF-8").as("text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, text
             |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin))

  // Triangle census + global clustering coefficient (x121) over a
  // deterministic doc-derived link graph that scales ×N with the corpus:
  // chain edges inside 8-node communities (u—u+1, u—u+2) plus a hub edge
  // per 64-block — the hubs carry degree ~63 so the (degree, id) edge
  // orientation's skew cap is actually exercised. The oracle states the
  // census FROM THE DEFINITION (canonical-edge 3-way self-join), fully
  // independent of the operator's oriented-wedge algorithm.
  /** The doc-derived graph shared by x121/x126: chain edges inside 8-node
    * communities plus a hub edge per 64-block — scales ×N with the corpus
    * and carries genuine hub skew (degree ~63). */
  private def docGraphEdges(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select("doc_id")
    docs.filter(col("doc_id") % 8 =!= 7)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      .unionByName(docs.filter(col("doc_id") % 8 < 6)
        .select(col("doc_id").as("src"), (col("doc_id") + 2).as("dst")))
      .unionByName(docs.filter(col("doc_id") % 64 =!= 0)
        .select(col("doc_id").as("src"),
          expr("(doc_id div 64) * 64").as("dst")))
  }

  /** The matching edge CTEs: defines `docs`, `e0`, and `edges(src, dst)`.
    * A `def`, not a `val`: `all` initializes at the TOP of this object,
    * before later-declared vals (a val here interpolates as null). */
  private def docGraphEdgesCte: String =
    """docs AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
      |e0 AS (SELECT doc_id AS p, doc_id + 1 AS q FROM docs WHERE doc_id % 8 <> 7
      |       UNION ALL
      |       SELECT doc_id, doc_id + 2 FROM docs WHERE doc_id % 8 < 6
      |       UNION ALL
      |       SELECT doc_id, (doc_id // 64) * 64 FROM docs WHERE doc_id % 64 <> 0),
      |edges AS (SELECT p AS src, q AS dst FROM e0 WHERE p <> q)""".stripMargin

  private def x121Spec: QuerySpec =
    QuerySpec("x121_triangle_census",
      (s, d) => graft.ext.LinkGraph.triangleStats(docGraphEdges(s, d), "src", "dst"),
      Some("""WITH docs AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
             |e0 AS (SELECT doc_id AS p, doc_id + 1 AS q FROM docs WHERE doc_id % 8 <> 7
             |       UNION ALL
             |       SELECT doc_id, doc_id + 2 FROM docs WHERE doc_id % 8 < 6
             |       UNION ALL
             |       SELECT doc_id, (doc_id // 64) * 64 FROM docs WHERE doc_id % 64 <> 0),
             |e AS (SELECT DISTINCT least(p, q) AS u, greatest(p, q) AS v
             |      FROM e0 WHERE p <> q),
             |deg AS (SELECT node, count(*) AS d
             |        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
             |        GROUP BY 1),
             |tri AS (SELECT count(*) AS t
             |        FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
             |             JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
             |SELECT (SELECT count(*) FROM deg) AS n_nodes,
             |       (SELECT count(*) FROM e) AS n_edges,
             |       (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) FROM deg) AS n_wedges,
             |       (SELECT t FROM tri) AS n_triangles,
             |       CASE WHEN (SELECT sum((d * (d - 1)) // 2) FROM deg) > 0
             |            THEN CAST(((SELECT t FROM tri) * 3 * 1000000)
             |                 // (SELECT sum((d * (d - 1)) // 2) FROM deg) AS BIGINT)
             |            ELSE 0 END AS cc_micro""".stripMargin))

  // Streaming WebDataset shard export (st22): three micro-batches of
  // documents packed into tar shards, each batch one snapshot-manifest
  // transaction (versioned shard table — a training run pins a version
  // while ingest streams on). Read-back explodes tar_entries over the
  // CURRENT version: container framing (octal sizes, 512-blocks,
  // checksums) and the manifest union across batches are both
  // load-bearing; the oracle is the plain identity over documents.
  // Exactly-once replay is pinned in ShardExportSpec.
  private def st22Spec: QuerySpec =
    QuerySpec("st22_stream_shard_export",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("source"))
        val src = Staging.slicedSource("shardexp", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(docs.filter(col("doc_id") % 3 === i), s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_shardexp_run").toString
        val table = s"$tmp/tbl"
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.ShardExport.start(s,
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            table, s"$tmp/ckpt", buckets = crawlBuckets(s, d))
          q.awaitTermination()
        }
        Snapshots.readAt(s, table)
          .select(explode(graft.functions.TarExprs.tarEntries(col("tar_file"))).as("e"))
          .filter(col("e.name").endsWith(".txt"))
          .select(
            expr("CAST(substring(e.name, 1, length(e.name) - 4) AS BIGINT)").as("doc_id"),
            col("e.size").as("n_bytes"),
            decode(col("e.payload"), "UTF-8").as("text"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, text
             |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin))

  // Transactional OPTIMIZE of a snapshot table (x122): the lakehouse
  // maintenance pass — 4 append-ordered files re-laid as 16 Z-order-
  // clustered files in ONE commit, zone-map stats re-stamped on BOTH
  // clustering dimensions. The output pins (a) row content invariance
  // through the rewrite (count + exact z-sum over the post-optimize
  // read), (b) the band read THROUGH the pruned path losing nothing,
  // (c) the structural constants (files 4→16, version 5), and (d) that
  // manifest pruning now skips files on EITHER dimension — the property
  // the Z-layout exists to buy (a linear sort gives it on one dim only).
  private def x122Spec: QuerySpec =
    QuerySpec("x122_snapshot_optimize",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("zopttbl", d) { tmp =>
          val pts = Tables.events(s, d)
            .select(col("event_id"), (col("user_id") % 256).as("a"),
              ((hour(col("ts")) * 60 + minute(col("ts"))) % 256).cast("long").as("b"))
          (0 until 4).foreach { i =>
            Snapshots.commitAppend(pts.filter(col("event_id") % 4 === i).coalesce(1),
              s"$tmp/tbl", recordSchema = true, statsCols = Seq("a", "b"))
          }
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_zopt_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val res = Snapshots.optimizeZorder(s, tbl, "a", "b", targetFiles = 16, bits = 8)
        val keptA = Snapshots.pruneFiles(s, tbl, "a", "16", "31")._1.size
        val keptB = Snapshots.pruneFiles(s, tbl, "b", "16", "31")._1.size
        val bandRows = Snapshots.readPruned(s, tbl, "a", "16", "31")
          .filter(col("a").between(16, 31)).count()
        Snapshots.readAt(s, tbl)
          .agg(n.as("n_rows"),
            sum(graft.io.Layout.zValue(col("a"), col("b"), 8)).cast("long").as("sum_z"))
          .select(col("n_rows"), col("sum_z"),
            lit(bandRows).as("band_rows"),
            lit(res.filesBefore.toLong).as("files_before"),
            lit(res.filesAfter.toLong).as("files_after"),
            lit(res.version).as("version"),
            lit(if (keptA < res.filesAfter) 1L else 0L).as("skips_a"),
            lit(if (keptB < res.filesAfter) 1L else 0L).as("skips_b"))
      },
      Some("""WITH p AS (SELECT user_id % 256 AS a,
             |         (hour(CAST(ts AS TIMESTAMP)) * 60
             |          + minute(CAST(ts AS TIMESTAMP))) % 256 AS b
             |       FROM events),
             |z AS (SELECT a, b,
             |        list_sum(list_transform(range(0, 8), i ->
             |          ((a >> i) & 1) * (1 << (2*i))
             |          + ((b >> i) & 1) * (1 << (2*i + 1)))) AS z
             |      FROM p)
             |SELECT count(*) AS n_rows, CAST(sum(z) AS BIGINT) AS sum_z,
             |       (SELECT count(*) FROM p WHERE a BETWEEN 16 AND 31) AS band_rows,
             |       CAST(4 AS BIGINT) AS files_before,
             |       CAST(16 AS BIGINT) AS files_after,
             |       CAST(5 AS BIGINT) AS version,
             |       CAST(1 AS BIGINT) AS skips_a,
             |       CAST(1 AS BIGINT) AS skips_b
             |FROM z""".stripMargin))

  // Row-level CDC read across a snapshot MERGE (x123): every key the x119
  // merge inserted or updated, with before/after values — served from the
  // FILE symmetric difference of the two manifests (copy-on-write means a
  // file live in both versions cannot produce a change), so the CDC read
  // costs O(files the merge rewrote), never O(table). Rows the rewrite
  // copied unchanged (same file, different path) land on both sides with
  // equal values and MUST drop out; matched rows whose replacement equals
  // the original (n_chars = 0 doubles to itself) must drop out too — the
  // oracle replays exactly that algebra.
  private def x123Spec: QuerySpec =
    QuerySpec("x123_snapshot_row_diff",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("mergetbl", d) { tmp =>
          slicedSnapshotTable(s, tmp, d); ()
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_rowdiff_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 8 + 1
        val lo = 2 * w + w / 2
        val hi = 3 * w + w / 2 - 1
        val updates = docs.filter(col("doc_id").between(lo, hi))
            .withColumn("n_chars", col("n_chars") * 2)
          .unionByName(docs.filter(col("doc_id") < 100)
            .select((col("doc_id") + maxId + 1).as("doc_id"),
              lit("src_merge").as("source"), col("n_chars")))
        val res = Snapshots.mergeInto(s, tbl, updates, keys = Seq("doc_id"),
          pruneOn = Some("doc_id"))
        Snapshots.rowDiff(s, tbl, res.version - 1, res.version, Seq("doc_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${zoneBoundsSql(2)},
           |mx AS (SELECT max(doc_id) AS m FROM documents),
           |upd AS (SELECT doc_id, 'update' AS change,
           |               source AS source_before, source AS source_after,
           |               n_chars AS n_chars_before, n_chars * 2 AS n_chars_after
           |        FROM documents, b
           |        WHERE doc_id BETWEEN b.lo AND b.hi AND n_chars <> 0),
           |ins AS (SELECT doc_id + m + 1 AS doc_id, 'insert' AS change,
           |               CAST(NULL AS VARCHAR) AS source_before,
           |               'src_merge' AS source_after,
           |               CAST(NULL AS BIGINT) AS n_chars_before,
           |               n_chars AS n_chars_after
           |        FROM documents, mx WHERE doc_id < 100)
           |SELECT * FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
           |ORDER BY doc_id""".stripMargin))

  // Cohort retention over the event stream (x124): users grouped by their
  // first-activity DAY, distinct-user counts per (cohort, day offset) —
  // the standard engagement matrix (the synthetic stream spans one month,
  // so day granularity gives a real 30×30 triangle). Two key-partitioned
  // aggregations + one equi-join back on the user key; the distinct
  // collapses (cohort, offset, user) BEFORE the count so heavy users
  // can't inflate a cell. Day index = Julian-style days since epoch via
  // integer division of the epoch-second: exact integer algebra.
  private def x124Spec: QuerySpec =
    QuerySpec("x124_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val cohort = ev.groupBy("user_id").agg(min("day").as("d0"))
        ev.join(cohort, "user_id")
          .select(col("user_id"), col("d0"), (col("day") - col("d0")).as("day_offset"))
          .distinct()
          .groupBy(col("d0").as("cohort_day"), col("day_offset"))
          .agg(n.as("n_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
             |       FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
             |c AS (SELECT user_id, min(day) AS d0 FROM e GROUP BY 1),
             |a AS (SELECT DISTINCT e.user_id, c.d0, e.day - c.d0 AS off
             |      FROM e JOIN c USING (user_id))
             |SELECT CAST(d0 AS BIGINT) AS cohort_day,
             |       CAST(off AS BIGINT) AS day_offset, count(*) AS n_users
             |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // Exact phrase search from a positional index (x125): the retrieval
  // family's phrase-query path — each phrase term's postings fetched by
  // an equi-filter, the k-term phrase closed by k−1 equi-joins on
  // (doc, pos − offset). The oracle finds the same phrase by walking the
  // token arrays directly in SQL — a completely different mechanism, so
  // position arithmetic, tokenizer parity, and per-doc occurrence counts
  // are all load-bearing.
  private def x125Spec: QuerySpec =
    QuerySpec("x125_phrase_search",
      (s, d) => graft.ext.Bm25.phraseSearch(
          Tables.documents(s, d).filter(col("text").isNotNull),
          col("doc_id"), col("text"), Seq("table", "part"))
        .select(col("id").as("doc_id"), col("n_occurrences"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |         list_filter(string_split_regex(lower(text), '\s+'),
             |                     x -> x <> '') AS w
             |       FROM documents WHERE text IS NOT NULL),
             |m AS (SELECT doc_id,
             |        len(list_filter(range(1, len(w)), i ->
             |          w[i] = 'table' AND w[i+1] = 'part')) AS n
             |      FROM t)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_occurrences
             |FROM m WHERE n > 0 ORDER BY doc_id""".stripMargin))

  // Label-propagation communities (x126) on the same doc-derived graph as
  // the triangle census — synchronous rounds with the total (count desc,
  // label asc) tie-break make order-sensitive LPA bit-deterministic, so
  // the oracle unrolls the identical three rounds in SQL. Per-label
  // min/max node ride along: a membership permuted between equal-size
  // communities hash-mismatches.
  private def x126Spec: QuerySpec =
    QuerySpec("x126_lpa_communities",
      (s, d) => graft.ext.LinkGraph.labelPropagate(docGraphEdges(s, d), "src", "dst",
          iters = 3)
        .groupBy(col("lab").as("label"))
        .agg(n.as("n_members"), min("node").as("min_node"), max("node").as("max_node"))
        .orderBy("label"),
      Some(s"""WITH $docGraphEdgesCte${graft.ext.LinkGraph.labelPropagateOracleCtes(3)}
           |SELECT lab AS label, count(*) AS n_members,
           |       min(v) AS min_node, max(v) AS max_node
           |FROM lpa_l3 GROUP BY 1 ORDER BY 1""".stripMargin))

  // MERGE-ON-READ row-level DELETE through the snapshot manifest (x127) —
  // the deletion-vector path next to x101's copy-on-write: a SCATTERED
  // point delete (one doc_id per slice, so EVERY file is grazed) commits
  // ONE key-tombstone file and rewrites ZERO data files — under CoW the
  // same predicate would rewrite all 8. Reads resolve the tombstones by
  // anti-join; the follow-up MERGE re-upserts two of the deleted keys and
  // FOLDS them out of the dv in its own commit (ghost rows physically
  // rewritten — the resurrection hazard the fold discipline exists for).
  // At 100 TB this is the CDC-economics operator: a point delete costs
  // O(matched keys) write (here: 8 keys, one dv file) instead of
  // O(bytes of every grazed file); the read-side anti-join is a broadcast
  // of the (tiny) tombstone set, and compaction retires it on schedule.
  // The oracle replays the full tombstone algebra — delete, re-insert
  // with updated values, survivor suppression — plus the structural
  // constants (0 delete rewrites, 2 merge rewrites, 6 surviving keys).
  private def x127Spec: QuerySpec =
    QuerySpec("x127_mor_delete",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("deltbl", d) { tmp =>
          slicedSnapshotTable(s, tmp, d); ()
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_mor_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
        // one EXISTING key per slice (the slice's min doc_id) — synthetic
        // positions like k·w + w/2 land in id GAPS on the replica-shifted
        // benchdata and the delete degenerates to a no-op; per-slice mins
        // exist at every SF and replay exactly in SQL. O(8) driver values,
        // same class as w itself.
        val delKeys = docs.groupBy(floor(col("doc_id") / w).cast("long").as("k"))
          .agg(min(col("doc_id")).as("id"))
          .orderBy("k").select("id").collect().map(_.getLong(0)).toSeq
        require(delKeys.size >= 3, s"x127 needs >= 3 populated slices, got ${delKeys.size}")
        val del = Snapshots.deleteWhereMor(s, tbl, col("doc_id").isin(delKeys: _*),
          keys = Seq("doc_id"))
        // re-upsert two tombstoned keys with doubled n_chars: the merge must
        // fold them out of the dv and rewrite their files' ghost rows
        val backKeys = Seq(delKeys(1), delKeys(2))
        val updates = docs.filter(col("doc_id").isin(backKeys: _*))
          .withColumn("n_chars", col("n_chars") * 2)
        val m = Snapshots.mergeInto(s, tbl, updates, keys = Seq("doc_id"),
          pruneOn = Some("doc_id"))
        val dvLeft = Snapshots.liveDvFiles(s, tbl) match {
          case Nil   => 0L
          case files => s.read.parquet(files: _*).count()
        }
        val audit = s.range(1).select(
          lit(del.tombstoned).as("n_tombstoned"),
          lit(del.dataFilesRewritten.toLong).as("del_files_rewritten"),
          lit(m.rewritten.size.toLong).as("merge_files_rewritten"),
          lit(dvLeft).as("dv_keys_left"))
        Snapshots.readAt(s, tbl)
          .groupBy("source")
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 8 + 1 AS w FROM documents),
           |del AS (SELECT min(doc_id) AS id FROM documents, w GROUP BY doc_id // w),
           |back AS (SELECT id FROM del ORDER BY id LIMIT 2 OFFSET 1),
           |kept AS (
           |  SELECT doc_id, source,
           |         CASE WHEN doc_id IN (SELECT id FROM back)
           |              THEN n_chars * 2 ELSE n_chars END AS n_chars
           |  FROM documents
           |  WHERE doc_id NOT IN (SELECT id FROM del)
           |     OR doc_id IN (SELECT id FROM back))
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       (SELECT count(*) FROM del) AS n_tombstoned,
           |       CAST(0 AS BIGINT) AS del_files_rewritten,
           |       CAST(2 AS BIGINT) AS merge_files_rewritten,
           |       (SELECT count(*) - 2 FROM del) AS dv_keys_left
           |FROM kept GROUP BY source ORDER BY source""".stripMargin))

  // 3-DIMENSION Z-order OPTIMIZE (x128) — x122's maintenance pass with a
  // THIRD clustering column (the real-world fact-table shape: tenant ×
  // time × region). Layout.zValueK interleaves bit i of dim j at position
  // 3i+j; after the rewrite each of the 16 files covers a bounded BOX in
  // (a, b, c), so manifest pruning skips files on ANY of the three keys —
  // a linear sort buys this on one dimension, a 2-D z-curve on two; the
  // band read here goes through the pruned path on the THIRD dimension
  // and must lose nothing. Content invariance is pinned by count + exact
  // 3-D z-sum; the oracle replays the 3-way bit interleave in SQL.
  private def x128Spec: QuerySpec =
    QuerySpec("x128_zorder3d",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("zopt3tbl", d) { tmp =>
          // a spreads user_id over the FULL byte (97 coprime to 256): at
          // small SF the raw id range is < 128, which would leave the
          // a-bits of the 3-way interleave too deep to ever form a file
          // boundary — no a-side skipping to demonstrate
          val pts = Tables.events(s, d)
            .select(col("event_id"), ((col("user_id") * 97 + 13) % 256).as("a"),
              ((hour(col("ts")) * 60 + minute(col("ts"))) % 256).cast("long").as("b"),
              (col("event_id") % 256).as("c"))
          (0 until 4).foreach { i =>
            Snapshots.commitAppend(pts.filter(col("event_id") % 4 === i).coalesce(1),
              s"$tmp/tbl", recordSchema = true, statsCols = Seq("a", "b", "c"))
          }
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_zopt3_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val res = Snapshots.optimizeZorder(s, tbl, Seq("a", "b", "c"),
          targetFiles = 16, bits = 8)
        val keptA = Snapshots.pruneFiles(s, tbl, "a", "16", "31")._1.size
        val keptB = Snapshots.pruneFiles(s, tbl, "b", "16", "31")._1.size
        val keptC = Snapshots.pruneFiles(s, tbl, "c", "16", "31")._1.size
        val bandRows = Snapshots.readPruned(s, tbl, "c", "16", "31")
          .filter(col("c").between(16, 31)).count()
        Snapshots.readAt(s, tbl)
          .agg(n.as("n_rows"),
            sum(graft.io.Layout.zValueK(Seq(col("a"), col("b"), col("c")), 8))
              .cast("long").as("sum_z"))
          .select(col("n_rows"), col("sum_z"),
            lit(bandRows).as("band_rows"),
            lit(res.filesBefore.toLong).as("files_before"),
            lit(res.filesAfter.toLong).as("files_after"),
            lit(res.version).as("version"),
            lit(if (keptA < res.filesAfter) 1L else 0L).as("skips_a"),
            lit(if (keptB < res.filesAfter) 1L else 0L).as("skips_b"),
            lit(if (keptC < res.filesAfter) 1L else 0L).as("skips_c"))
      },
      Some("""WITH p AS (SELECT (user_id * 97 + 13) % 256 AS a,
             |         (hour(CAST(ts AS TIMESTAMP)) * 60
             |          + minute(CAST(ts AS TIMESTAMP))) % 256 AS b,
             |         event_id % 256 AS c
             |       FROM events),
             |z AS (SELECT a, b, c,
             |        list_sum(list_transform(range(0, 8), i ->
             |          ((a >> i) & 1) * (1 << (3*i))
             |          + ((b >> i) & 1) * (1 << (3*i + 1))
             |          + ((c >> i) & 1) * (1 << (3*i + 2)))) AS z
             |      FROM p)
             |SELECT count(*) AS n_rows, CAST(sum(z) AS BIGINT) AS sum_z,
             |       (SELECT count(*) FROM p WHERE c BETWEEN 16 AND 31) AS band_rows,
             |       CAST(4 AS BIGINT) AS files_before,
             |       CAST(16 AS BIGINT) AS files_after,
             |       CAST(5 AS BIGINT) AS version,
             |       CAST(1 AS BIGINT) AS skips_a,
             |       CAST(1 AS BIGINT) AS skips_b,
             |       CAST(1 AS BIGINT) AS skips_c
             |FROM z""".stripMargin))

  /** st23: TWO concurrent streaming MERGE writers racing on ONE snapshot
    * table — the multi-writer discipline driven end-to-end, not just the
    * SnapshotsSpec unit pin. Writer A upserts the low doc_id half, writer
    * B the high half, three micro-batches each, BOTH streams running at
    * once against the same manifest: every commit is an optimistic
    * create-exclusive PUT (atomic O_EXCL locally, conditional PUT on S3),
    * the loser's ConcurrentCommitException triggers a full re-read +
    * re-derive retry (MergeGate maxRetries), and per-writer note tags
    * keep the exactly-once ledgers separate. Because the key ranges are
    * disjoint, every serialization of the six commits reaches the SAME
    * final state — which is precisely what the oracle replays (plus the
    * structural constant: 4 base + 6 merge commits = version 10, i.e.
    * every batch committed exactly once, no lost updates, no double
    * applies, regardless of interleaving). */
  private def st23Spec: QuerySpec =
    QuerySpec("st23_concurrent_merge_race",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val wh = maxId / 2 + 1
        val wa = wh / 3 + 1
        val wb = (maxId - wh) / 3 + 1
        val srcA = Staging.slicedSource("racegateA", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(
              docs.filter(col("doc_id") >= i * wa && col("doc_id") < (i + 1) * wa &&
                  col("doc_id") < wh)
                .withColumn("n_chars", col("n_chars") + lit((i + 1) * 1000L)),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val srcB = Staging.slicedSource("racegateB", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(
              docs.filter(col("doc_id") >= wh + i * wb &&
                  col("doc_id") < wh + (i + 1) * wb)
                .withColumn("n_chars", col("n_chars") + lit((i + 1) * 1000L)),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_race_run").toString
        val table = s"$tmp/tbl"
        val w4 = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w4 && col("doc_id") < (i + 1) * w4)
              .coalesce(1),
            table, recordSchema = true, statsCols = Seq("doc_id"))
        }
        def gate(src: String, writer: String) =
          graft.streaming.MergeGate.start(s,
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            table, Seq("doc_id"), s"$tmp/ckpt-$writer", pruneOn = Some("doc_id"),
            writer = writer, maxRetries = 1000)
        Staging.drainTuning(s, srcA, 3) {
          val qa = gate(srcA, "wA")
          val qb = gate(srcB, "wB")
          qa.awaitTermination()
          qb.awaitTermination()
        }
        def at(v: Long) = Snapshots.readAt(s, table, Some(v))
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .select(lit(v).as("version"), col("n_docs"), col("sum_chars"))
        // the final version is read back from the manifest and EMITTED, so
        // the oracle's literal 10 checks the exactly-once constant as data
        // (and on gapped benchdata ids, where a sub-slice could stage
        // empty and commit nothing, the query still resolves instead of
        // requesting a version that never happened)
        val vFinal = Snapshots.currentVersion(s, table)
        at(4).unionByName(at(vFinal)).orderBy("version")
      },
      Some("""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
           |h AS (SELECT m, m // 2 + 1 AS wh FROM mx),
           |p AS (SELECT wh, wh // 3 + 1 AS wa, (m - wh) // 3 + 1 AS wb FROM h),
           |base AS (SELECT doc_id, n_chars FROM documents)
           |SELECT CAST(4 AS BIGINT) AS version, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM base
           |UNION ALL
           |SELECT 10, count(*),
           |       CAST(sum(n_chars +
           |             CASE WHEN doc_id < wh THEN 1000 * (doc_id // wa + 1)
           |                  ELSE 1000 * ((doc_id - wh) // wb + 1) END) AS BIGINT)
           |FROM base, p
           |ORDER BY version""".stripMargin))

  /** st24: the CHANGE FEED consumed end-to-end — a mutation timeline
    * (4 quarter appends → 3 streaming merges → 1 merge-on-read point
    * delete) materialized version-by-version by [[graft.io.ChangeFeed]]
    * into per-version CDC directories with an exactly-once cursor, then
    * read back and aggregated per (version, change). The second sync
    * must be a NO-OP (cursor current → 0 versions) — both sync sizes
    * ride in-plan. The v8 diff is dv-ONLY (no data file changed): it
    * exercises rowDiff's tombstone-delta semi-join path under the
    * oracle, which replays every version's insert/update/delete algebra
    * from the raw documents table. */
  private def st24Spec: QuerySpec =
    QuerySpec("st24_change_feed",
      (s, d) => {
        import graft.io.{ChangeFeed, Snapshots}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w4 = maxId / 4 + 1
        val w3 = maxId / 3 + 1
        // the st21 staging (thirds with +1000/+2000/+3000) — same kind key,
        // so whichever query stages first, both reuse the template
        val src = Staging.slicedSource("mergegate", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(
              docs.filter(col("doc_id") >= i * w3 && col("doc_id") < (i + 1) * w3)
                .withColumn("n_chars", col("n_chars") + lit((i + 1) * 1000L)),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_cf_run").toString
        val table = s"$tmp/tbl"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w4 && col("doc_id") < (i + 1) * w4)
              .coalesce(1),
            table, recordSchema = true, statsCols = Seq("doc_id"))
        }
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.MergeGate.start(s,
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            table, Seq("doc_id"), s"$tmp/ckpt", pruneOn = Some("doc_id"))
          q.awaitTermination()
        }
        // MoR point delete: the min doc_id of each populated quarter (the
        // x127 lesson — positions must EXIST on gapped benchdata ids)
        val delKeys = docs.groupBy(floor(col("doc_id") / w4).cast("long").as("k"))
          .agg(min(col("doc_id")).as("id"))
          .orderBy("k").select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.deleteWhereMor(s, table, col("doc_id").isin(delKeys: _*),
          keys = Seq("doc_id"))
        val first = ChangeFeed.sync(s, table, Seq("doc_id"), s"$tmp/feed")
        val second = ChangeFeed.sync(s, table, Seq("doc_id"), s"$tmp/feed")
        val audit = s.range(1).select(
          lit(first.size.toLong).as("versions_first"),
          lit(second.size.toLong).as("versions_second"))
        ChangeFeed.read(s, s"$tmp/feed")
          .groupBy(col("version"), col("change"))
          .agg(n.as("n"), sum(col("n_chars_after")).cast("long").as("sum_after"))
          .crossJoin(broadcast(audit))
          .orderBy("version")
      },
      Some("""WITH w4 AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents),
           |w3 AS (SELECT max(doc_id) // 3 + 1 AS w FROM documents),
           |ins AS (SELECT CAST(doc_id // w + 1 AS BIGINT) AS version,
           |               'insert' AS change, count(*) AS n,
           |               CAST(sum(n_chars) AS BIGINT) AS sum_after
           |        FROM documents, w4 GROUP BY 1),
           |upd AS (SELECT CAST(doc_id // w + 5 AS BIGINT) AS version,
           |               'update' AS change, count(*) AS n,
           |               CAST(sum(n_chars + (doc_id // w + 1) * 1000) AS BIGINT) AS sum_after
           |        FROM documents, w3 GROUP BY 1),
           |del AS (SELECT CAST(8 AS BIGINT) AS version, 'delete' AS change,
           |               count(DISTINCT doc_id // w) AS n,
           |               CAST(NULL AS BIGINT) AS sum_after
           |        FROM documents, w4)
           |SELECT version, change, n, sum_after,
           |       CAST(8 AS BIGINT) AS versions_first,
           |       CAST(0 AS BIGINT) AS versions_second
           |FROM (SELECT * FROM ins UNION ALL SELECT * FROM upd
           |      UNION ALL SELECT * FROM del)
           |ORDER BY version""".stripMargin))

  // RESTORE + immutable TAGS (x129) — the rollback/reproducibility pair:
  // tag the good ingest, take a bad merge (+7777 on the first slice) and a
  // bad CoW point delete on top of it, then RESTORE to the tag. The restore
  // is METADATA-ONLY (re-references the tag version's immutable files — at
  // 100 TB rolling back a bad ingest writes one manifest, zero data bytes),
  // pinned in-plan by files_match (live set at v11 ≡ live set at v8). The
  // bad versions stay time-travelable — v9's inflated sum and v10's
  // post-delete count ride as audit columns the oracle recomputes; history
  // is append-only, so "undo" never destroys evidence.
  private def x129Spec: QuerySpec =
    QuerySpec("x129_snapshot_restore",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("deltbl", d) { tmp =>
          slicedSnapshotTable(s, tmp, d); ()
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_restore_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
        val tagged = Snapshots.tag(s, tbl, "after-ingest") // pins v8
        // the bad merge: every slice-0 doc inflated by 7777
        Snapshots.mergeInto(s, tbl,
          docs.filter(col("doc_id") < w).withColumn("n_chars", col("n_chars") + 7777L),
          keys = Seq("doc_id"), pruneOn = Some("doc_id"))
        val v9Sum = Snapshots.readAt(s, tbl)
          .agg(sum(col("n_chars"))).first().getLong(0)
        // the bad delete: the first two slices' min doc_ids (exist at every
        // SF on gapped benchdata ids — the x127 lesson)
        val delKeys = docs.groupBy(floor(col("doc_id") / w).cast("long").as("k"))
          .agg(min(col("doc_id")).as("id"))
          .orderBy("k").limit(2).select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.deleteWhere(s, tbl, col("doc_id").isin(delKeys: _*))
        val v10N = Snapshots.readAt(s, tbl).count()
        val vFinal = Snapshots.restore(s, tbl, Snapshots.tagVersion(s, tbl, "after-ingest"),
          note = Some("rollback-bad-ingest"))
        val filesMatch =
          if (Snapshots.liveFiles(s, tbl).toSet ==
              Snapshots.liveFiles(s, tbl, Some(tagged)).toSet) 1L else 0L
        val audit = s.range(1).select(
          lit(tagged).as("tagged_version"),
          lit(vFinal).as("final_version"),
          lit(filesMatch).as("files_match"),
          lit(v9Sum).as("v9_sum_chars"),
          lit(v10N).as("v10_n_docs"))
        Snapshots.readAt(s, tbl)
          .groupBy("source")
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 8 + 1 AS w FROM documents),
           |mins AS (SELECT min(doc_id) AS id FROM documents, w GROUP BY doc_id // w
           |         ORDER BY id LIMIT 2)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(8 AS BIGINT) AS tagged_version,
           |       CAST(11 AS BIGINT) AS final_version,
           |       CAST(1 AS BIGINT) AS files_match,
           |       (SELECT CAST(sum(n_chars) + 7777 * count(*) FILTER (WHERE doc_id < w)
           |               AS BIGINT) FROM documents, w) AS v9_sum_chars,
           |       (SELECT count(*) - 2 FROM documents) AS v10_n_docs
           |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  // Incremental small-file COMPACTION (x130) — the binpack OPTIMIZE a
  // 100 TB table actually schedules: one well-sized file (half the corpus)
  // plus six small per-batch stripes (the streaming-ingest tail), then
  // compactSmall packs ONLY the six stripes into one file and never opens
  // the big one (untouched = 1, pinned in-plan). [[Snapshots.compact]]
  // would rewrite everything — O(table); this pass is O(small tail), the
  // difference between a nightly maintenance job that costs gigabytes and
  // one that costs the whole lake. Zone maps are re-stamped on the packed
  // file, so manifest pruning still skips it for out-of-range predicates
  // (kept_low = 1) and the pruned band read loses nothing.
  private def x130Spec: QuerySpec =
    QuerySpec("x130_compact_small",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("binpacktbl", d) { tmp =>
          val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
          val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 2 + 1
          val tbl = s"$tmp/tbl"
          Snapshots.commitAppend(docs.filter(col("doc_id") < w).coalesce(1),
            tbl, recordSchema = true, statsCols = Seq("doc_id"))
          (0 until 6).foreach { i =>
            Snapshots.commitAppend(
              docs.filter(col("doc_id") >= w && (col("doc_id") - w) % 6 === i).coalesce(1),
              tbl, recordSchema = true, statsCols = Seq("doc_id"))
          }
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_binpack_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 2 + 1
        val f = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
        val bigBytes = Snapshots.liveFiles(s, tbl)
          .map(p => f.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).max
        val r = Snapshots.compactSmall(s, tbl, smallBytes = bigBytes,
          targetBytes = Long.MaxValue, statsCols = Seq("doc_id"))
        // manifest pruning after the re-stamp: a low-band predicate keeps
        // only the big file; the pruned high-band read loses no row
        val keptLow = Snapshots.pruneFiles(s, tbl, "doc_id", "0", (w - 1).toString)._1.size
        val bandRows = Snapshots.readPruned(s, tbl, "doc_id", w.toString, maxId.toString)
          .filter(col("doc_id") >= w).count()
        val audit = s.range(1).select(
          lit(r.packed.toLong).as("packed"),
          lit(r.filesAfter.toLong).as("files_after"),
          lit(r.untouched.toLong).as("untouched"),
          lit(keptLow.toLong).as("kept_low"),
          lit(bandRows).as("band_rows"))
        Snapshots.readAt(s, tbl)
          .groupBy("source")
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 2 + 1 AS w FROM documents)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(6 AS BIGINT) AS packed,
           |       CAST(1 AS BIGINT) AS files_after,
           |       CAST(1 AS BIGINT) AS untouched,
           |       CAST(1 AS BIGINT) AS kept_low,
           |       (SELECT count(*) FROM documents, w WHERE doc_id >= w) AS band_rows
           |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  /** st25: INCREMENTAL VIEW MAINTENANCE driven end-to-end — a per-source
    * (count, sum of chars) aggregate kept current over a 9-version
    * mutation timeline (4 quarter appends → 3 thirds merges → a
    * GROUP-MOVING merge re-sourcing each quarter's min doc to 'moved' →
    * a MoR point delete of each third's max doc) purely from the change
    * feed: [[graft.io.ViewMaintenance]] folds each version's CDC rows as
    * signed deltas into a snapshot-table view, one exactly-once MERGE per
    * version (note ledger — the second maintain() call applies ZERO
    * versions, pinned in-plan). The law the oracle checks is THE
    * maintenance invariant: the incrementally-maintained view equals a
    * direct GROUP BY of the final table state — which at 100 TB you could
    * no longer afford to run. The group-moving update is the step naive
    * re-aggregation gets wrong: id leaves one group (-1, -chars) and
    * enters another (+1, +chars) in the same version. */
  private def st25Spec: QuerySpec =
    QuerySpec("st25_incremental_view",
      (s, d) => {
        import graft.io.{Snapshots, ViewMaintenance}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w4 = maxId / 4 + 1
        val w3 = maxId / 3 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_ivm_run").toString
        val tbl = s"$tmp/tbl"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w4 && col("doc_id") < (i + 1) * w4)
              .coalesce(1),
            tbl, recordSchema = true, statsCols = Seq("doc_id"))
        }
        (0 until 3).foreach { i =>
          Snapshots.mergeInto(s, tbl,
            docs.filter(col("doc_id") >= i * w3 && col("doc_id") < (i + 1) * w3)
              .withColumn("n_chars", col("n_chars") + (i + 1) * 1000L),
            keys = Seq("doc_id"), pruneOn = Some("doc_id"))
        }
        // group-moving merge: each quarter's min doc re-sourced to 'moved'
        // (n_chars already carries its thirds bump — replayed in SQL)
        val movedKeys = docs.groupBy(floor(col("doc_id") / w4).cast("long").as("k"))
          .agg(min(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.mergeInto(s, tbl,
          docs.filter(col("doc_id").isin(movedKeys: _*))
            .withColumn("source", lit("moved"))
            .withColumn("n_chars",
              col("n_chars") + (floor(col("doc_id") / w3).cast("long") + 1L) * 1000L),
          keys = Seq("doc_id"), pruneOn = Some("doc_id"))
        // MoR point delete: each third's max doc
        val deadKeys = docs.groupBy(floor(col("doc_id") / w3).cast("long").as("k"))
          .agg(max(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.deleteWhereMor(s, tbl, col("doc_id").isin(deadKeys: _*),
          keys = Seq("doc_id"))
        val first = ViewMaintenance.maintain(s, tbl, Seq("doc_id"),
          dims = Seq("source"), measures = Seq("n_chars"),
          feedDir = s"$tmp/feed", viewTable = s"$tmp/view")
        val second = ViewMaintenance.maintain(s, tbl, Seq("doc_id"),
          dims = Seq("source"), measures = Seq("n_chars"),
          feedDir = s"$tmp/feed", viewTable = s"$tmp/view")
        val audit = s.range(1).select(
          lit(first.size.toLong).as("applied_first"),
          lit(second.size.toLong).as("applied_second"))
        ViewMaintenance.readView(s, s"$tmp/view")
          .select(col("source"), col("n_rows"),
            col("sum_n_chars").cast("long").as("sum_n_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w4 AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents),
           |w3 AS (SELECT max(doc_id) // 3 + 1 AS w FROM documents),
           |moved AS (SELECT min(doc_id) AS id FROM documents, w4 GROUP BY doc_id // w),
           |dead AS (SELECT max(doc_id) AS id FROM documents, w3 GROUP BY doc_id // w),
           |fin AS (
           |  SELECT CASE WHEN doc_id IN (SELECT id FROM moved) THEN 'moved'
           |              ELSE source END AS source,
           |         n_chars + (doc_id // w + 1) * 1000 AS n_chars
           |  FROM documents, w3
           |  WHERE doc_id NOT IN (SELECT id FROM dead))
           |SELECT source, count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
           |       CAST(9 AS BIGINT) AS applied_first,
           |       CAST(0 AS BIGINT) AS applied_second
           |FROM fin GROUP BY source ORDER BY source""".stripMargin))

  // VERSION EXPIRY (x131) — the retention pass that BOUNDS STORAGE: eight
  // ingest commits compacted into four files (v9) leave the eight original
  // slice files referenced only by history; expiring below the horizon
  // (keepFrom = 9) writes a full-state checkpoint (live set + schema +
  // stats + note ledger), deletes the eight doomed manifests, and the next
  // vacuum reclaims exactly the eight historical files — the step without
  // which a CoW table's storage grows monotonically forever at 100 TB.
  // Reads at/above the horizon stay byte-identical (the content aggregate
  // IS the oracle check), a read below it rejects loudly rather than
  // answering wrong (below_rejects rides in-plan), and the whole pass is
  // metadata-sized: nothing here ever reads a data file.
  private def x131Spec: QuerySpec =
    QuerySpec("x131_version_expiry",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("deltbl", d) { tmp =>
          slicedSnapshotTable(s, tmp, d); ()
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_expire_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        Snapshots.compact(s, tbl, targetFiles = 4) // v9: v1-8's files → history
        val r = Snapshots.expireVersions(s, tbl, keepFrom = 9)
        val vacuumed = Snapshots.vacuum(s, tbl)
        val belowRejects =
          if (scala.util.Try(Snapshots.readAt(s, tbl, Some(2))).isFailure) 1L else 0L
        val audit = s.range(1).select(
          lit(r.expired.size.toLong).as("expired_n"),
          lit(r.checkpointAt).as("horizon"),
          lit(vacuumed.size.toLong).as("vacuumed_n"),
          lit(belowRejects).as("below_rejects"))
        Snapshots.readAt(s, tbl)
          .groupBy("source")
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(8 AS BIGINT) AS expired_n,
           |       CAST(9 AS BIGINT) AS horizon,
           |       CAST(8 AS BIGINT) AS vacuumed_n,
           |       CAST(1 AS BIGINT) AS below_rejects
           |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  // BLOOM FILE INDEX point lookup (x132) — the needle-in-100-TB operator
  // zone maps cannot serve: ukey = md5(doc_id) interleaves across all 8
  // slice files (every file spans the full hex range, so min/max pruning
  // keeps everything), but the per-file bloom sidecars prune a 3-key
  // lookup to ~3 candidate files at fpp 1e-3 — reads O(matching files),
  // not O(table). The index is ONE versioned metadata commit (~1.2
  // bytes/key); bloom_effective pins the pruning (kept ≤ 5 tolerates
  // a false positive or two without flaking), zone_blind pins that the
  // zone maps really were useless on this column (the honest contrast
  // with x102), and the row content pins no-false-negative correctness.
  private def x132Spec: QuerySpec =
    QuerySpec("x132_bloom_point_lookup",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("bloomtbl", d) { tmp =>
          val docs = Tables.documents(s, d)
            .select(col("doc_id"), col("source"), col("n_chars"),
              md5(col("doc_id").cast("string")).as("ukey"))
          val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
          (0 until 8).foreach { i =>
            Snapshots.commitAppend(
              docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
                .coalesce(1),
              s"$tmp/tbl", recordSchema = true, statsCols = Seq("ukey"))
          }
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_bloom_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val docs = Tables.documents(s, d).select(col("doc_id"))
        val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
        val r = Snapshots.buildBloomIndex(s, tbl, "ukey", fpp = 0.001)
        val probeIds = docs.groupBy(floor(col("doc_id") / w).cast("long").as("k"))
          .agg(min(col("doc_id")).as("id"))
          .orderBy("id").limit(3).select("id").collect().map(_.getLong(0)).toSeq
        val md = java.security.MessageDigest.getInstance("MD5")
        val probes = probeIds.map(i =>
          md.digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
        val (kept, skipped) = Snapshots.bloomPrune(s, tbl, "ukey", probes)
        // zone maps are blind here: the probe band [min, max] of 3 random
        // md5s intersects every file's near-full hex range
        val zoneKept = Snapshots.pruneFiles(s, tbl, "ukey",
          probes.min, probes.max)._1.size
        val audit = s.range(1).select(
          lit(r.indexed.toLong).as("files_indexed"),
          lit(if (kept.size <= 5) 1L else 0L).as("bloom_effective"),
          lit(if (skipped.size >= 3) 1L else 0L).as("skipped_ge3"),
          lit(if (zoneKept.toLong == 8L) 1L else 0L).as("zone_blind"))
        Snapshots.readPoint(s, tbl, "ukey", probes)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 8 + 1 AS w FROM documents),
           |probes AS (SELECT min(doc_id) AS id FROM documents, w
           |           GROUP BY doc_id // w ORDER BY id LIMIT 3)
           |SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
           |       CAST(8 AS BIGINT) AS files_indexed,
           |       CAST(1 AS BIGINT) AS bloom_effective,
           |       CAST(1 AS BIGINT) AS skipped_ge3,
           |       CAST(1 AS BIGINT) AS zone_blind
           |FROM documents d JOIN probes p ON d.doc_id = p.id
           |ORDER BY d.doc_id""".stripMargin))

  /** st26: INGEST RACING COMPACTION on one snapshot table — the
    * multi-writer pair every real pipeline actually runs (st23 covered
    * ingest-vs-ingest): a streaming [[graft.streaming.SnapshotIngest]]
    * appends one micro-batch per slice while a maintenance thread
    * repeatedly binpacks the table ([[graft.io.Snapshots.compactSmall]],
    * optimistic commits — the loser of any version race re-resolves and
    * retries; appends are derivation-free so their retry is free,
    * compaction re-derives against the new live set). Under EVERY
    * interleaving the final content is the plain union of the batches —
    * the oracle replays it — and the exactly-once ledger holds (a batch
    * lands once no matter how many compactions interleave). The settled
    * table is ONE file and at least 4 versions committed (3 ingests +
    * ≥1 pack), both pinned in-plan. */
  private def st26Spec: QuerySpec =
    QuerySpec("st26_ingest_compact_race",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w3 = maxId / 3 + 1
        val src = Staging.slicedSource("mergegate", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(
              docs.filter(col("doc_id") >= i * w3 && col("doc_id") < (i + 1) * w3)
                .withColumn("n_chars", col("n_chars") + lit((i + 1) * 1000L)),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_race_run").toString
        val tbl = s"$tmp/tbl"
        @volatile var stop = false
        val compactor = new Thread(() => {
          while (!stop) {
            try Snapshots.compactSmall(s, tbl, Long.MaxValue, Long.MaxValue)
            catch { case _: Snapshots.ConcurrentCommitException => () }
            Thread.sleep(25)
          }
        }, "st26-compactor")
        compactor.start()
        try {
          Staging.drainTuning(s, src, 3) {
            val q = graft.streaming.SnapshotIngest.start(s,
              s.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true").parquet(s"$src/src"),
              tbl, s"$tmp/ckpt")
            q.awaitTermination()
          }
        } finally { stop = true; compactor.join() }
        Snapshots.compactSmall(s, tbl, Long.MaxValue, Long.MaxValue) // settle
        val audit = s.range(1).select(
          lit(if (Snapshots.liveFiles(s, tbl).size == 1) 1L else 0L)
            .as("final_files_one"),
          lit(if (Snapshots.currentVersion(s, tbl) >= 4L) 1L else 0L)
            .as("versions_ge4"))
        Snapshots.readAt(s, tbl)
          .groupBy("source")
          .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w3 AS (SELECT max(doc_id) // 3 + 1 AS w FROM documents)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars + (doc_id // w + 1) * 1000) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS final_files_one,
           |       CAST(1 AS BIGINT) AS versions_ge4
           |FROM documents, w3 GROUP BY source ORDER BY source""".stripMargin))

  // Metadata-only COUNT(*) (x133) — per-file row counts recorded at commit
  // time under the reserved `__rows` stat make fastCount a pure manifest
  // replay: at 100 TB the most common query in any pipeline ("how many
  // docs?") answers from one manifest read, zero data files opened. The
  // staging mixes counted and uncounted commits, so the EXACT-fallback
  // path (scan only the uncounted files) is load-bearing in the same
  // number the oracle checks; time travel counts the past version.
  private def x133Spec: QuerySpec =
    QuerySpec("x133_fast_count",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 4 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_fc_run").toString
        val tbl = s"$tmp/tbl"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = true, recordRowCounts = true)
        }
        // one UNCOUNTED commit: re-append the first quarter's min doc
        val extraId = docs.agg(min(col("doc_id"))).first().getLong(0)
        Snapshots.commitAppend(docs.filter(col("doc_id") === extraId).coalesce(1),
          tbl, recordSchema = true)
        val counted = Snapshots.fileStats(s, tbl)
          .count(_.column == Snapshots.RowsStat).toLong
        val live = Snapshots.liveFiles(s, tbl).size.toLong
        s.range(1).select(
          lit(Snapshots.fastCount(s, tbl)).as("n_rows"),
          lit(Snapshots.fastCount(s, tbl, Some(4))).as("n_rows_v4"),
          lit(counted).as("counted_files"),
          lit(live - counted).as("uncounted_files"))
      },
      Some("""SELECT count(*) + 1 AS n_rows,
           |       count(*) AS n_rows_v4,
           |       CAST(4 AS BIGINT) AS counted_files,
           |       CAST(1 AS BIGINT) AS uncounted_files
           |FROM documents""".stripMargin))

  // STRING-dimension Z-order (x134) — x122/x128 cluster numeric dims; real
  // fact tables cluster on (tenant/source STRING × numeric). A byte-prefix
  // image of the string would collapse under the shared "src" prefix, so
  // optimizeZorder ranks the column's sorted distinct values into
  // [0, 2^bits) (order-preserving dictionary, broadcast join) and
  // interleaves the RANK. Before the rewrite every file holds every
  // source (string pruning keeps 4/4 — the motivating failure, pinned
  // in-plan); after it, equality pruning on the string skips most of the
  // 16 files and the band read through the pruned path loses nothing.
  // Content invariance rides as count + exact sum.
  private def x134Spec: QuerySpec =
    QuerySpec("x134_zorder_string",
      (s, d) => {
        import graft.io.Snapshots
        val template = Staging.dir("zstrtbl", d) { tmp =>
          val docs = Tables.documents(s, d)
            .select(col("doc_id"), col("source"), (col("n_chars") % 256).as("b"))
          (0 until 4).foreach { i =>
            Snapshots.commitAppend(docs.filter(col("doc_id") % 4 === i).coalesce(1),
              s"$tmp/tbl", recordSchema = true, statsCols = Seq("source", "b"))
          }
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_zstr_run").toString
        copyTree(java.nio.file.Paths.get(template), java.nio.file.Paths.get(tmp))
        val tbl = s"$tmp/tbl"
        val preKept = Snapshots.pruneFiles(s, tbl, "source", "src4", "src4")._1.size
        val r = Snapshots.optimizeZorder(s, tbl, Seq("source", "b"),
          targetFiles = 16, bits = 8)
        val keptSrc = Snapshots.pruneFiles(s, tbl, "source", "src4", "src4")._1.size
        val keptB = Snapshots.pruneFiles(s, tbl, "b", "16", "31")._1.size
        val srcRows = Snapshots.readPruned(s, tbl, "source", "src4", "src4")
          .filter(col("source") === "src4").count()
        Snapshots.readAt(s, tbl)
          .agg(n.as("n_rows"), sum(col("doc_id")).cast("long").as("sum_ids"))
          .select(col("n_rows"), col("sum_ids"),
            lit(srcRows).as("src4_rows"),
            lit(preKept.toLong).as("pre_kept"),
            lit(r.filesBefore.toLong).as("files_before"),
            lit(r.filesAfter.toLong).as("files_after"),
            lit(if (keptSrc < 16) 1L else 0L).as("src_skips"),
            lit(if (keptB < 16) 1L else 0L).as("b_skips"))
      },
      Some("""SELECT count(*) AS n_rows,
           |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
           |       (SELECT count(*) FROM documents WHERE source = 'src4') AS src4_rows,
           |       CAST(4 AS BIGINT) AS pre_kept,
           |       CAST(4 AS BIGINT) AS files_before,
           |       CAST(16 AS BIGINT) AS files_after,
           |       CAST(1 AS BIGINT) AS src_skips,
           |       CAST(1 AS BIGINT) AS b_skips
           |FROM documents""".stripMargin))

  /** st27: STREAMING VIEW GATE — st21's CDC-upsert stream with the
    * per-source (count, sum) aggregate maintained IN THE SAME micro-batch
    * ([[graft.streaming.ViewGate]]): 4 quarter appends seed the table,
    * then 3 thirds-bumped upsert batches stream in, each committing one
    * MERGE and folding its own CDC delta into the view — after the drain
    * the view equals a direct GROUP BY of the final table without ever
    * having scanned it (the IVM law, checked by the oracle on the
    * streamed timeline). Both exactly-once ledgers are exercised under
    * the streaming replay machinery; a second maintain() call applies
    * zero versions (pinned in-plan). */
  private def st27Spec: QuerySpec =
    QuerySpec("st27_stream_view_gate",
      (s, d) => {
        import graft.io.{Snapshots, ViewMaintenance}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w4 = maxId / 4 + 1
        val w3 = maxId / 3 + 1
        val src = Staging.slicedSource("mergegate", d) { tmp =>
          (0 until 3).foreach { i =>
            Staging.writeSlice(
              docs.filter(col("doc_id") >= i * w3 && col("doc_id") < (i + 1) * w3)
                .withColumn("n_chars", col("n_chars") + lit((i + 1) * 1000L)),
              s"$tmp/src/slice$i")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val tmp = java.nio.file.Files.createTempDirectory("graft_vg_run").toString
        val tbl = s"$tmp/tbl"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w4 && col("doc_id") < (i + 1) * w4)
              .coalesce(1),
            tbl, recordSchema = true, statsCols = Seq("doc_id"))
        }
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.ViewGate.start(s,
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            tbl, keys = Seq("doc_id"), dims = Seq("source"),
            measures = Seq("n_chars"),
            feedDir = s"$tmp/feed", viewTable = s"$tmp/view",
            checkpoint = s"$tmp/ckpt", pruneOn = Some("doc_id"))
          q.awaitTermination()
        }
        val residual = ViewMaintenance.maintain(s, tbl, Seq("doc_id"),
          Seq("source"), Seq("n_chars"), s"$tmp/feed", s"$tmp/view")
        val audit = s.range(1).select(
          lit(Snapshots.currentVersion(s, tbl)).as("table_versions"),
          lit(residual.size.toLong).as("residual_applied"))
        ViewMaintenance.readView(s, s"$tmp/view")
          .select(col("source"), col("n_rows"),
            col("sum_n_chars").cast("long").as("sum_n_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w3 AS (SELECT max(doc_id) // 3 + 1 AS w FROM documents)
           |SELECT source, count(*) AS n_rows,
           |       CAST(sum(n_chars + (doc_id // w + 1) * 1000) AS BIGINT) AS sum_n_chars,
           |       CAST(7 AS BIGINT) AS table_versions,
           |       CAST(0 AS BIGINT) AS residual_applied
           |FROM documents, w3 GROUP BY source ORDER BY source""".stripMargin))

  // IVM with NON-SELF-MAINTAINABLE aggregates (x135) — min/max under
  // deletion is the textbook boundary of delta maintenance: removing the
  // current bound says nothing about the runner-up. The view follows the
  // two-path rule — inserts fold free (least/greatest), a version whose
  // deletions could have removed a group's stored bound recomputes ONLY
  // the dirty groups from the table AS OF that version (broadcast
  // semi-join filtered read, O(dirty groups' rows), never O(table)). The
  // timeline forces both paths: v5 MoR-deletes every source's argmax doc
  // (all 20 groups dirty on max), v6 bumps every source's min-id doc by
  // +10000 (an update whose -before may evict the min and whose +after
  // folds clean); the oracle replays the final state's count/sum/min/max.
  private def x135Spec: QuerySpec =
    QuerySpec("x135_ivm_minmax",
      (s, d) => {
        import graft.io.{Snapshots, ViewMaintenance}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w4 = maxId / 4 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_mm_run").toString
        val tbl = s"$tmp/tbl"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w4 && col("doc_id") < (i + 1) * w4)
              .coalesce(1),
            tbl, recordSchema = true, statsCols = Seq("doc_id"))
        }
        // v5: each source's argmax-n_chars doc (tie → max doc_id) — every
        // group's stored MAX is evicted, the dirty-recompute path
        val delKeys = docs
          .join(docs.groupBy("source").agg(max(col("n_chars")).as("__mx")), Seq("source"))
          .filter(col("n_chars") === col("__mx"))
          .groupBy("source").agg(max(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.deleteWhereMor(s, tbl, col("doc_id").isin(delKeys: _*),
          keys = Seq("doc_id"))
        // v6: each source's min-id SURVIVOR bumped +10000
        val rem = Snapshots.readAt(s, tbl)
        val minKeys = rem.groupBy("source").agg(min(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.mergeInto(s, tbl,
          rem.filter(col("doc_id").isin(minKeys: _*))
            .withColumn("n_chars", col("n_chars") + 10000L),
          keys = Seq("doc_id"), pruneOn = Some("doc_id"))
        val applied = ViewMaintenance.maintain(s, tbl, Seq("doc_id"),
          dims = Seq("source"), measures = Seq("n_chars"),
          feedDir = s"$tmp/feed", viewTable = s"$tmp/view",
          minMax = Seq("n_chars"))
        val audit = s.range(1).select(lit(applied.size.toLong).as("applied"))
        ViewMaintenance.readView(s, s"$tmp/view")
          .select(col("source"), col("n_rows"),
            col("sum_n_chars").cast("long").as("sum_n_chars"),
            col("min_n_chars").cast("long").as("min_n_chars"),
            col("max_n_chars").cast("long").as("max_n_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH mx AS (SELECT source, max(n_chars) AS mxc FROM documents GROUP BY source),
           |del AS (SELECT d.source, max(d.doc_id) AS id FROM documents d
           |        JOIN mx ON d.source = mx.source AND d.n_chars = mx.mxc
           |        GROUP BY d.source),
           |rem AS (SELECT * FROM documents WHERE doc_id NOT IN (SELECT id FROM del)),
           |mn AS (SELECT source, min(doc_id) AS id FROM rem GROUP BY source),
           |fin AS (SELECT source,
           |          CASE WHEN doc_id IN (SELECT id FROM mn)
           |               THEN n_chars + 10000 ELSE n_chars END AS n_chars
           |        FROM rem)
           |SELECT source, count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
           |       CAST(min(n_chars) AS BIGINT) AS min_n_chars,
           |       CAST(max(n_chars) AS BIGINT) AS max_n_chars,
           |       CAST(6 AS BIGINT) AS applied
           |FROM fin GROUP BY source ORDER BY source""".stripMargin))

  // IVM with APPROX-DISTINCT sketches (x136) — the other non-subtractable
  // aggregate: per-source distinct token-bucket counts maintained as
  // Datasketches HLL. Inserts fold free (hll_union); a value can never be
  // UN-added from a sketch, so any deletion dirties the group and the
  // recompute path rebuilds only the dirty groups' sketches from the table
  // as of that version. The subtle case the timeline forces: v5 deletes
  // ONE copy of values that still exist in other rows — naive sketch
  // maintenance would either leave the count inflated (ignore deletes) or
  // lose surviving values (can't subtract); the recompute gets it right.
  // At this domain size (≤ ~104 distinct per group) the sketch operates
  // in its exact list/set regime, so the DuckDB count(DISTINCT) replay is
  // an EXACT oracle; the fixed sketch size is what scales the operator to
  // 100 TB groups. est_matches_direct pins union-of-deltas ≡ one-shot
  // sketch over the final state (register-state determinism).
  private def x136Spec: QuerySpec =
    QuerySpec("x136_ivm_distinct",
      (s, d) => {
        import graft.io.{Snapshots, ViewMaintenance}
        import org.apache.spark.sql.functions.{hll_sketch_agg, hll_sketch_estimate}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            (col("n_chars") % 97).as("tok"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w4 = maxId / 4 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_hll_run").toString
        val tbl = s"$tmp/tbl"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w4 && col("doc_id") < (i + 1) * w4)
              .coalesce(1),
            tbl, recordSchema = true, statsCols = Seq("doc_id"))
        }
        val delKeys = docs
          .join(docs.groupBy("source").agg(max(col("n_chars")).as("__mx")), Seq("source"))
          .filter(col("n_chars") === col("__mx"))
          .groupBy("source").agg(max(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.deleteWhereMor(s, tbl, col("doc_id").isin(delKeys: _*),
          keys = Seq("doc_id"))
        val rem = Snapshots.readAt(s, tbl)
        val minKeys = rem.groupBy("source").agg(min(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.mergeInto(s, tbl,
          rem.filter(col("doc_id").isin(minKeys: _*))
            .withColumn("tok", lit(1000L) + col("doc_id") % 7),
          keys = Seq("doc_id"), pruneOn = Some("doc_id"))
        val applied = ViewMaintenance.maintain(s, tbl, Seq("doc_id"),
          dims = Seq("source"), measures = Seq("n_chars"),
          feedDir = s"$tmp/feed", viewTable = s"$tmp/view",
          distinct = Seq("tok"))
        // union-of-version-deltas must equal the one-shot sketch over the
        // final state — register-state determinism, checked sketch-for-
        // sketch by ESTIMATE equality per group
        val direct = Snapshots.readAt(s, tbl).groupBy("source")
          .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"))).as("__direct"))
        val matches = ViewMaintenance.readView(s, s"$tmp/view")
          .select(col("source"), hll_sketch_estimate(col("hll_tok")).as("__est"))
          .join(direct, Seq("source"))
          .agg(sum(when(col("__est") === col("__direct"), 0L).otherwise(1L)))
          .first().getLong(0)
        val audit = s.range(1).select(
          lit(applied.size.toLong).as("applied"),
          lit(if (matches == 0L) 1L else 0L).as("est_matches_direct"))
        ViewMaintenance.readView(s, s"$tmp/view")
          .select(col("source"), col("n_rows"),
            col("sum_n_chars").cast("long").as("sum_n_chars"),
            hll_sketch_estimate(col("hll_tok")).as("approx_distinct"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH mx AS (SELECT source, max(n_chars) AS mxc FROM documents GROUP BY source),
           |del AS (SELECT d.source, max(d.doc_id) AS id FROM documents d
           |        JOIN mx ON d.source = mx.source AND d.n_chars = mx.mxc
           |        GROUP BY d.source),
           |rem AS (SELECT * FROM documents WHERE doc_id NOT IN (SELECT id FROM del)),
           |mn AS (SELECT source, min(doc_id) AS id FROM rem GROUP BY source),
           |fin AS (SELECT source, n_chars,
           |          CASE WHEN doc_id IN (SELECT id FROM mn)
           |               THEN 1000 + doc_id % 7 ELSE n_chars % 97 END AS tok
           |        FROM rem)
           |SELECT source, count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
           |       count(DISTINCT tok) AS approx_distinct,
           |       CAST(6 AS BIGINT) AS applied,
           |       CAST(1 AS BIGINT) AS est_matches_direct
           |FROM fin GROUP BY source ORDER BY source""".stripMargin))

  /** x137: the SNAPSHOT LAYER THROUGH SQL — a DataSourceV2 TableCatalog
    * ([[graft.sql.GraftCatalog]]) makes every lakehouse surface reachable
    * from `spark.sql`, the way a real user first touches any table. A
    * 5-version timeline (4 quarter appends, then a REMOVE un-referencing
    * the first quarter) plus a tag at v2 is read back with FOUR pure-SQL
    * legs: `VERSION AS OF 2` (number), `VERSION AS OF 'q12'` (tag), the
    * plain current read (v5 = quarters 2-4), and a `WHERE doc_id`
    * range whose predicate PUSHES DOWN into manifest file pruning —
    * `pruned_ok` pins that the SQL filter really opened 1 of the 3 live
    * files (zone maps, SupportsPushDownFilters), not just filtered rows.
    * The oracle replays the version algebra on the raw documents table
    * (x83's law, now crossing the SQL boundary). */
  private def x137Spec: QuerySpec =
    QuerySpec("x137_sql_catalog",
      (s, d) => {
        import graft.io.Snapshots
        val staged = Staging.dir("sqlcat", d) { tmp =>
          val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
          val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 4 + 1
          val tbl = s"$tmp/tbl"
          (0 until 4).foreach { i =>
            Snapshots.commitAppend(
              docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
                .coalesce(1),
              tbl, recordSchema = true, statsCols = Seq("doc_id"))
          }
          Snapshots.tag(s, tbl, "q12", Some(2L))
          Snapshots.commit(s, tbl, adds = Nil,
            removes = Snapshots.liveFiles(s, tbl, Some(1)))
          Snapshots.checkpoint(s, tbl)
        }
        val w = Tables.documents(s, d).agg(max(col("doc_id")))
          .first().getLong(0) / 4 + 1
        // one catalog name per staged root: Spark caches catalog instances
        // by name after first use, so the root option must never change
        // under a cached name
        val cat = s"graft_${staged.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", staged)
        def leg(name: String, sql: String) =
          s.sql(sql).select(lit(name).as("leg"),
            col("n_docs"), col("sum_chars"))
        // the pruned leg runs first so its scan info is unambiguous
        graft.sql.GraftScanInfo.last = None
        val range = leg("range",
          s"""SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM $cat.tbl WHERE doc_id >= ${2 * w} AND doc_id < ${3 * w}""".stripMargin)
          .collect().head
        val info = graft.sql.GraftScanInfo.last.get
        val prunedOk = if (info.candidates == 1 && info.total == 3) 1L else 0L
        val agg = "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars"
        leg("v2_number", s"SELECT $agg FROM $cat.tbl VERSION AS OF 2")
          .unionByName(leg("v2_tag", s"SELECT $agg FROM $cat.tbl VERSION AS OF 'q12'"))
          .unionByName(leg("current", s"SELECT $agg FROM $cat.tbl"))
          .unionByName(s.range(1).select(lit("range").as("leg"),
            lit(range.getLong(1)).as("n_docs"), lit(range.getLong(2)).as("sum_chars")))
          .withColumn("pruned_ok", lit(prunedOk))
          .orderBy("leg")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents),
           |legs AS (
           |  SELECT 'v2_number' AS leg, count(*) AS n_docs,
           |         CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |  FROM documents, w WHERE doc_id < 2 * w
           |  UNION ALL
           |  SELECT 'v2_tag', count(*), CAST(sum(n_chars) AS BIGINT)
           |  FROM documents, w WHERE doc_id < 2 * w
           |  UNION ALL
           |  SELECT 'current', count(*), CAST(sum(n_chars) AS BIGINT)
           |  FROM documents, w WHERE doc_id >= w
           |  UNION ALL
           |  SELECT 'range', count(*), CAST(sum(n_chars) AS BIGINT)
           |  FROM documents, w WHERE doc_id >= 2 * w AND doc_id < 3 * w)
           |SELECT leg, n_docs, sum_chars, CAST(1 AS BIGINT) AS pruned_ok
           |FROM legs ORDER BY leg""".stripMargin))

  /** st28: the CHANGE FEED AS A STREAM — st25's maintenance law pushed
    * across the `readStream` boundary: a 6-version mutation timeline
    * (4 quarter appends → a GROUP-MOVING merge re-sourcing each quarter's
    * min doc to 'moved' → a MoR delete of each quarter's max doc) is
    * consumed by [[graft.streaming.CdcSourceProvider]] (offsets = table
    * versions, held in the streaming checkpoint) and folded per
    * micro-batch into a snapshot view by
    * [[graft.io.ViewMaintenance.applyDeltaBatch]]. The law: the
    * STREAM-fed view equals a direct GROUP BY of the final state. A
    * second full run against a FRESH checkpoint replays every batch —
    * the view's note ledger refuses all of them (`replay_noop` pins the
    * view version unchanged), so exactly-once holds even when streaming
    * state is lost: checkpoint offsets are the first lock, the ledger is
    * the second. */
  private def st28Spec: QuerySpec =
    QuerySpec("st28_stream_cdc_view",
      (s, d) => {
        import graft.io.{Snapshots, ViewMaintenance}
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 4 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_cdcview_run").toString
        val tbl = s"$tmp/tbl"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
              .coalesce(1),
            tbl, recordSchema = true, statsCols = Seq("doc_id"))
        }
        val quarter = floor(col("doc_id") / w).cast("long")
        val movedKeys = docs.groupBy(quarter.as("k"))
          .agg(min(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.mergeInto(s, tbl,
          docs.filter(col("doc_id").isin(movedKeys: _*))
            .withColumn("source", lit("moved")),
          keys = Seq("doc_id"), pruneOn = Some("doc_id"))
        val deadKeys = docs.groupBy(quarter.as("k"))
          .agg(max(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.deleteWhereMor(s, tbl, col("doc_id").isin(deadKeys: _*),
          keys = Seq("doc_id"))
        def run(ckpt: String): Unit = {
          val q = s.readStream.format("graft.streaming.CdcSourceProvider")
            .option("table", tbl).option("keys", "doc_id")
            .option("feed", s"$tmp/feed").load()
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (batch: DataFrame, _: Long) =>
              ViewMaintenance.applyDeltaBatch(s, tbl, s"$tmp/view", batch,
                keys = Seq("doc_id"), dims = Seq("source"),
                measures = Seq("n_chars"))
              ()
            }.start()
          q.awaitTermination()
        }
        run(s"$tmp/ckpt1")
        val vAfter = Snapshots.currentVersion(s, s"$tmp/view")
        run(s"$tmp/ckpt2") // fresh checkpoint: full replay, ledger-refused
        val replayNoop =
          if (Snapshots.currentVersion(s, s"$tmp/view") == vAfter) 1L else 0L
        val audit = s.range(1).select(lit(replayNoop).as("replay_noop"))
        ViewMaintenance.readView(s, s"$tmp/view")
          .select(col("source"), col("n_rows"),
            col("sum_n_chars").cast("long").as("sum_n_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents),
           |moved AS (SELECT min(doc_id) AS id FROM documents, w GROUP BY doc_id // w),
           |dead AS (SELECT max(doc_id) AS id FROM documents, w GROUP BY doc_id // w),
           |fin AS (
           |  SELECT CASE WHEN doc_id IN (SELECT id FROM moved) THEN 'moved'
           |              ELSE source END AS source, n_chars
           |  FROM documents
           |  WHERE doc_id NOT IN (SELECT id FROM dead))
           |SELECT source, count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
           |       CAST(1 AS BIGINT) AS replay_noop
           |FROM fin GROUP BY source ORDER BY source""".stripMargin))

  /** x138: MULTI-TABLE TRANSACTION — the corpus+index pair moved through
    * FOUR ledger-published cuts ([[graft.io.MultiTable]]): each step
    * appends a fifth of the documents to the data table, re-derives the
    * per-source index as its own snapshot commit, and publishes the
    * (data@vD, index@vI) cut as ONE atomic ledger commit. The pins: a
    * FIFTH data chunk committed WITHOUT a publish stays invisible to
    * consistent reads (`pinned_consistent` — stale-but-consistent, never
    * mixed; the race half is hammer-spec'd in MultiTableSpec), and the
    * FIRST cut still replays exactly (`replay_ok` — cuts are immutable
    * history). Output is the index at the newest cut; the oracle derives
    * it from the raw documents table. */
  private def x138Spec: QuerySpec =
    QuerySpec("x138_pair_commit",
      (s, d) => {
        import graft.io.{MultiTable, Snapshots}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 5 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_pair_run").toString
        val data = s"$tmp/data"; val idx = s"$tmp/idx"; val led = s"$tmp/ledger"
        def step(i: Int): Long = {
          val vD = Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
              .coalesce(1),
            data, recordSchema = i == 0)
          val counts = Snapshots.readAt(s, data, Some(vD)).groupBy("source")
            .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          val vI =
            if (i == 0) Snapshots.commitAppend(counts.coalesce(1), idx,
              recordSchema = true)
            else {
              // the re-derived index replaces the old one as a swap commit
              // (new files in, old files out, one transaction)
              val old = Snapshots.liveFiles(s, idx)
              val dir = s"$idx/data/ix-$i"
              counts.coalesce(1).write.parquet(dir)
              val p = new org.apache.hadoop.fs.Path(dir)
              val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
              val parts = f.listStatus(p).toSeq
                .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
                .map(_.getPath.toString)
              Snapshots.commit(s, idx, adds = parts, removes = old)
            }
          MultiTable.publish(s, led, Map(data -> vD, idx -> vI))
        }
        val cuts = (0 until 4).map(step)
        // a data commit WITHOUT a publish: consistent reads stay pinned
        Snapshots.commitAppend(
          docs.filter(col("doc_id") >= 4 * w).coalesce(1), data)
        val pinned = MultiTable.readConsistent(s, led, data).count()
        val expect4 = docs.filter(col("doc_id") < 4 * w).count()
        val firstCut = MultiTable.resolveAt(s, led, cuts.head)
        val replayOk = Snapshots.readAt(s, data, Some(firstCut(data))).count() ==
          docs.filter(col("doc_id") < w).count()
        val audit = s.range(1).select(
          lit(cuts.size.toLong).as("n_cuts"),
          lit(if (pinned == expect4) 1L else 0L).as("pinned_consistent"),
          lit(if (replayOk) 1L else 0L).as("replay_ok"))
        MultiTable.readConsistent(s, led, idx)
          .select(col("source"), col("n_docs"), col("sum_chars"))
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 5 + 1 AS w FROM documents)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(4 AS BIGINT) AS n_cuts,
           |       CAST(1 AS BIGINT) AS pinned_consistent,
           |       CAST(1 AS BIGINT) AS replay_ok
           |FROM documents, w WHERE doc_id < 4 * w
           |GROUP BY source ORDER BY source""".stripMargin))

  /** x139: the WHOLE TABLE LIFECYCLE IN SQL — every statement a string a
    * SQL-only user would type, nothing but the catalog registration in
    * Scala: CREATE TABLE, INSERT INTO … SELECT (one transactional append
    * commit), DELETE FROM … WHERE (copy-on-write), CALL graft.system.bloom_index, CALL
    * graft.system.optimize (single-key Z-order = range clustering,
    * zone maps re-stamped, the bloom index refreshed IN the same
    * commit — the second bloom_index CALL finding nothing left to
    * index is the pin),
    * a zone-map-pruned range SELECT (`range_pruned` pins that the WHERE
    * really skipped files), a bloom-pruned point SELECT, and the
    * `t$history` / `t$detail` metadata tables as the audit. (The DELETE
    * predicate is deliberately a translatable range — a predicate the
    * catalog cannot express as v1 filters REFUSES, never approximates,
    * which GraftCatalogSpec pins.) The oracle replays the insert+delete
    * algebra on the raw documents table; the audit constants pin the
    * transaction count, the post-OPTIMIZE file count, and both pruning
    * verdicts. */
  private def x139Spec: QuerySpec =
    QuerySpec("x139_sql_lifecycle",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_sqllife_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
          .createOrReplaceTempView("x139_docs_src")
        val w = Tables.documents(s, d).agg(max(col("doc_id")))
          .first().getLong(0) / 4 + 1
        s.sql(s"CREATE TABLE $cat.docs (doc_id BIGINT, source STRING, n_chars BIGINT)")
        s.sql(s"INSERT INTO $cat.docs SELECT doc_id, source, n_chars FROM x139_docs_src")
        s.sql(s"DELETE FROM $cat.docs WHERE doc_id >= ${3 * w}")
        s.sql(s"CALL $cat.system.bloom_index('docs', 'doc_id', CAST(0.001 AS DOUBLE))")
        val opt = s.sql(
          s"CALL $cat.system.optimize('docs', 'doc_id', 4)").collect().head
        // the OPTIMIZE commit refreshed the sidecars itself: a second
        // build finds nothing left to index
        val bi = s.sql(s"CALL $cat.system.bloom_index('docs', 'doc_id', CAST(0.001 AS DOUBLE))")
          .collect().head
        // zone-map pruning through plain SQL: one quarter's range
        graft.sql.GraftScanInfo.last = None
        val range = s.sql(
          s"""SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sc
             |FROM $cat.docs WHERE doc_id >= $w AND doc_id < ${2 * w}""".stripMargin)
          .collect().head
        val rinfo = graft.sql.GraftScanInfo.last.get
        // bloom pruning through plain SQL: a point lookup on doc_id
        graft.sql.GraftScanInfo.last = None
        val pt = s.sql(s"SELECT source FROM $cat.docs WHERE doc_id = 11")
          .collect().map(_.getString(0)).toSeq
        val pinfo = graft.sql.GraftScanInfo.last.get
        val hist = s.sql(s"SELECT count(*) AS n FROM $cat.`docs$$history`")
          .collect().head.getLong(0)
        val files = s.sql(s"SELECT files FROM $cat.`docs$$detail`")
          .collect().head.getInt(0).toLong
        val audit = s.range(1).select(
          lit(opt.getLong(2)).as("files_after_optimize"),
          lit(if (bi.getLong(1) == 0L) 1L else 0L).as("bloom_from_optimize"),
          lit(if (rinfo.candidates < rinfo.total) 1L else 0L).as("range_pruned"),
          lit(if (pinfo.candidates <= 2) 1L else 0L).as("point_pruned"),
          lit(range.getLong(0)).as("range_n"),
          lit(range.getLong(1)).as("range_chars"),
          lit(if (pt == Seq(Tables.documents(s, d).filter(col("doc_id") === 11)
            .select("source").first().getString(0))) 1L else 0L).as("point_exact"),
          lit(hist).as("n_commits"),
          lit(files).as("live_files"))
        s.sql(s"SELECT source, count(*) AS n_docs, " +
            s"CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM $cat.docs GROUP BY source")
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents),
           |kept AS (SELECT d.* FROM documents d, w WHERE d.doc_id < 3 * w)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(4 AS BIGINT) AS files_after_optimize,
           |       CAST(1 AS BIGINT) AS bloom_from_optimize,
           |       CAST(1 AS BIGINT) AS range_pruned,
           |       CAST(1 AS BIGINT) AS point_pruned,
           |       (SELECT count(*) FROM kept k, w WHERE k.doc_id >= w AND k.doc_id < 2 * w) AS range_n,
           |       (SELECT CAST(sum(n_chars) AS BIGINT) FROM kept k, w
           |        WHERE k.doc_id >= w AND k.doc_id < 2 * w) AS range_chars,
           |       CAST(1 AS BIGINT) AS point_exact,
           |       CAST(5 AS BIGINT) AS n_commits,
           |       CAST(4 AS BIGINT) AS live_files
           |FROM kept GROUP BY source ORDER BY source""".stripMargin))

  /** x140: SQL ROW-LEVEL DML — the three statements a SQL user reaches
    * for after x139's lifecycle, each routed through
    * [[graft.sql.GraftExtensions]] onto the library's transactional
    * mutators: `UPDATE … WHERE <range>` (condition-derived zone-map
    * prune — `update_pruned` pins that 3 of the 4 quarter files were
    * NEVER opened or rewritten), `MERGE INTO … USING` (keyed upsert:
    * replaces + inserts in ONE commit, source pre-shaped in a temp
    * view), and `DELETE … WHERE doc_id % 7 = 3` (a predicate v1 filters
    * cannot express — the SupportsDelete path refuses it; the DML rule
    * carries the full Catalyst expression). `n_commits` pins
    * one-commit-per-statement; `asof_ok` pins that every pre-DML version
    * still time-travels. The oracle replays the update→merge→delete
    * algebra over the raw documents table. */
  private def x140Spec: QuerySpec =
    QuerySpec("x140_sql_dml",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_sqldml_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        docs.createOrReplaceTempView("x140_docs")
        val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 4 + 1
        val total = docs.count()
        val tbl = s"$tmp/docs"
        // 4 quarter files with doc_id zone maps: the prunable layout
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
              .coalesce(1),
            tbl, recordSchema = true, statsCols = Seq("doc_id"))
        }
        // UPDATE: the [w, 2w) range bounds the rewrite to ONE file — the
        // other three survive as byte-identical paths (the 100 TB story)
        val preUpdate = Snapshots.liveFiles(s, tbl).toSet
        s.sql(s"UPDATE $cat.docs SET n_chars = n_chars + 1000 " +
          s"WHERE doc_id >= $w AND doc_id < ${2 * w}")
        val untouched = (preUpdate intersect Snapshots.liveFiles(s, tbl).toSet).size
        // MERGE: replace every (doc_id % 10 = 0) key below w with a
        // 'merged' row; insert the same keys shifted above the table
        s.sql(s"""CREATE OR REPLACE TEMP VIEW x140_src AS
                 |SELECT doc_id, 'merged' AS source, CAST(777 AS BIGINT) AS n_chars
                 |FROM x140_docs WHERE doc_id % 10 = 0 AND doc_id < $w
                 |UNION ALL
                 |SELECT doc_id + ${5 * w}, 'merged', CAST(888 AS BIGINT)
                 |FROM x140_docs WHERE doc_id % 10 = 0 AND doc_id < $w""".stripMargin)
        s.sql(s"""MERGE INTO $cat.docs t USING x140_src s ON t.doc_id = s.doc_id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        // DELETE: not v1-translatable — only the extension path runs it
        s.sql(s"DELETE FROM $cat.docs WHERE doc_id % 7 = 3")
        val nCommits = s.sql(s"SELECT count(*) AS n FROM $cat.`docs$$history`")
          .collect().head.getLong(0)
        val asOf = s.sql(s"SELECT count(*) AS n FROM $cat.docs VERSION AS OF 4")
          .collect().head.getLong(0)
        val audit = s.range(1).select(
          lit(if (untouched == 3) 1L else 0L).as("update_pruned"),
          lit(nCommits).as("n_commits"),
          lit(if (asOf == total) 1L else 0L).as("asof_ok"))
        s.sql(s"SELECT source, count(*) AS n_docs, " +
            s"CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM $cat.docs GROUP BY source")
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents),
           |upd AS (SELECT doc_id, source,
           |               CASE WHEN doc_id >= w.w AND doc_id < 2 * w.w
           |                    THEN n_chars + 1000 ELSE n_chars END AS n_chars
           |        FROM documents, w),
           |src AS (SELECT doc_id, 'merged' AS source, CAST(777 AS BIGINT) AS n_chars
           |        FROM documents, w WHERE doc_id % 10 = 0 AND doc_id < w.w
           |        UNION ALL
           |        SELECT doc_id + 5 * w.w, 'merged', CAST(888 AS BIGINT)
           |        FROM documents, w WHERE doc_id % 10 = 0 AND doc_id < w.w),
           |merged AS (SELECT u.* FROM upd u
           |           WHERE u.doc_id NOT IN (SELECT doc_id FROM src)
           |           UNION ALL SELECT * FROM src),
           |fin AS (SELECT * FROM merged WHERE doc_id % 7 <> 3)
           |SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS update_pruned,
           |       CAST(7 AS BIGINT) AS n_commits,
           |       CAST(1 AS BIGINT) AS asof_ok
           |FROM fin GROUP BY source ORDER BY source""".stripMargin))

  /** x141: MERGE-ON-READ DELETE FROM SQL — `write.delete.mode=mor` is a
    * TABLE PROPERTY (manifest-recorded, transactional, time-traveling:
    * [[graft.io.Snapshots.tableProperties]]), so one ALTER TABLE flips
    * the table's delete discipline and the next `DELETE FROM … WHERE
    * doc_id % 3 = 1` — a predicate v1 filters can't even express —
    * commits ONE key-tombstone deletion vector instead of rewriting
    * every grazed file. `mor_zero_rewrites` pins the live data-file set
    * BYTE-IDENTICAL across the delete (the O(matched keys) write cost
    * that makes scattered point deletes affordable at 100 TB);
    * `dv_files` pins the single tombstone in `$detail`; `asof_ok` pins
    * pre-delete time travel. The oracle replays the delete algebra. */
  private def x141Spec: QuerySpec =
    QuerySpec("x141_sql_mor_delete",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_sqlmor_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 4 + 1
        val total = docs.count()
        val tbl = s"$tmp/docs"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
              .coalesce(1),
            tbl, recordSchema = true, statsCols = Seq("doc_id"))
        }
        s.sql(s"""ALTER TABLE $cat.docs SET TBLPROPERTIES
                 |('write.delete.mode' = 'mor', 'write.merge.keys' = 'doc_id')""".stripMargin)
        val preDelete = Snapshots.liveFiles(s, tbl).toSet
        s.sql(s"DELETE FROM $cat.docs WHERE doc_id % 3 = 1")
        val untouched = Snapshots.liveFiles(s, tbl).toSet == preDelete
        val dvFiles = s.sql(s"SELECT dv_files FROM $cat.`docs$$detail`")
          .collect().head.getInt(0)
        val asOf = s.sql(s"SELECT count(*) AS n FROM $cat.docs VERSION AS OF 4")
          .collect().head.getLong(0)
        val audit = s.range(1).select(
          lit(if (untouched) 1L else 0L).as("mor_zero_rewrites"),
          lit(dvFiles.toLong).as("dv_files"),
          lit(if (asOf == total) 1L else 0L).as("asof_ok"))
        s.sql(s"SELECT source, count(*) AS n_docs, " +
            s"CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM $cat.docs GROUP BY source")
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS mor_zero_rewrites,
           |       CAST(1 AS BIGINT) AS dv_files,
           |       CAST(1 AS BIGINT) AS asof_ok
           |FROM documents WHERE doc_id % 3 <> 1
           |GROUP BY source ORDER BY source""".stripMargin))

  /** x142: SCHEMA EVOLUTION FROM SQL — `ALTER TABLE … ADD COLUMNS` is
    * one schema-stamp commit (the x95 machinery behind the catalog):
    * every pre-evolution file reads NULL-padded to the new shape with
    * zero bytes rewritten, `AS OF` below the evolution serves the OLD
    * column set (`old_shape_ok`), and the next INSERT carries the new
    * column. The oracle replays old-rows-null ∪ new-rows-scored. */
  private def x142Spec: QuerySpec =
    QuerySpec("x142_sql_add_column",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_sqlevo_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        docs.createOrReplaceTempView("x142_docs")
        val shift = docs.agg(max(col("doc_id"))).first().getLong(0) + 1
        val tbl = s"$tmp/docs"
        Snapshots.commitAppend(docs.coalesce(2), tbl, recordSchema = true)
        val preEvo = Snapshots.liveFiles(s, tbl).toSet
        s.sql(s"ALTER TABLE $cat.docs ADD COLUMNS (score DOUBLE)")
        // evolution is metadata-only: zero files rewritten
        val zeroRewrites = Snapshots.liveFiles(s, tbl).toSet == preEvo
        val oldShape = s.sql(s"SELECT * FROM $cat.docs VERSION AS OF 1")
          .columns.toSeq == Seq("doc_id", "source", "n_chars")
        s.sql(s"""INSERT INTO $cat.docs
                 |SELECT doc_id + $shift, source, n_chars,
                 |       CAST(n_chars % 100 AS DOUBLE) AS score
                 |FROM x142_docs WHERE doc_id % 20 = 0""".stripMargin)
        val audit = s.range(1).select(
          lit(if (zeroRewrites) 1L else 0L).as("evo_zero_rewrites"),
          lit(if (oldShape) 1L else 0L).as("old_shape_ok"))
        s.sql(s"""SELECT source, count(*) AS n_docs,
                 |       count(score) AS n_scored,
                 |       CAST(sum(score) AS BIGINT) AS sum_score
                 |FROM $cat.docs GROUP BY source""".stripMargin)
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH evolved AS (
           |  SELECT source, CAST(NULL AS DOUBLE) AS score FROM documents
           |  UNION ALL
           |  SELECT source, CAST(n_chars % 100 AS DOUBLE) FROM documents
           |  WHERE doc_id % 20 = 0)
           |SELECT source, count(*) AS n_docs, count(score) AS n_scored,
           |       CAST(sum(score) AS BIGINT) AS sum_score,
           |       CAST(1 AS BIGINT) AS evo_zero_rewrites,
           |       CAST(1 AS BIGINT) AS old_shape_ok
           |FROM evolved GROUP BY source ORDER BY source""".stripMargin))

  /** st29: the MATERIALIZED VIEW AS A SQL OBJECT, maintained by MIXED
    * consumers — x137 (SQL catalog) + st28 (streaming CDC) closed into
    * one user story. `CALL graft.system.create_mv` registers the view
    * (spec persisted as `mv.*` table properties) and folds the staged
    * appends; a GROUP-MOVING merge and a MoR delete then land on the
    * source and a STREAMING consumer ([[graft.streaming
    * .CdcSourceProvider]] → [[graft.io.ViewMaintenance.applyDeltaBatch]])
    * catches the view up — replaying the already-folded versions too,
    * which the view's note ledger refuses row-for-row (the exactly-once
    * contract ACROSS consumer kinds). A final source append is folded by
    * `CALL graft.system.refresh_mv`, whose `versions_applied = 1` pins
    * that the batch consumer saw exactly the one version the stream
    * hadn't (`refresh_one`). The result is read as plain
    * `SELECT … FROM catalog.view` — identity rows filtered by the scan —
    * and the oracle replays the whole timeline as a direct GROUP BY. */
  private def st29Spec: QuerySpec =
    QuerySpec("st29_sql_matview",
      (s, d) => {
        import graft.io.{Snapshots, ViewMaintenance}
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 4 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_sqlmv_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val tbl = s"$tmp/tbl"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
              .coalesce(1),
            tbl, recordSchema = true, statsCols = Seq("doc_id"))
        }
        s.sql(s"CALL $cat.system.create_mv('mv', 'tbl', 'doc_id', 'source', 'n_chars')")
        // batch-era mutations: a group-moving merge + a MoR point delete
        val quarter = floor(col("doc_id") / w).cast("long")
        val movedKeys = docs.groupBy(quarter.as("k"))
          .agg(min(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.mergeInto(s, tbl,
          docs.filter(col("doc_id").isin(movedKeys: _*))
            .withColumn("source", lit("moved")),
          keys = Seq("doc_id"), pruneOn = Some("doc_id"))
        val deadKeys = docs.groupBy(quarter.as("k"))
          .agg(max(col("doc_id")).as("id"))
          .select("id").collect().map(_.getLong(0)).toSeq
        Snapshots.deleteWhereMor(s, tbl, col("doc_id").isin(deadKeys: _*),
          keys = Seq("doc_id"))
        // the STREAM consumer catches the view up — its CDC replay spans
        // the already-folded create_mv versions too (ledger-refused)
        val q = s.readStream.format("graft.streaming.CdcSourceProvider")
          .option("table", tbl).option("keys", "doc_id")
          .option("feed", s"$tmp/stream_feed").load()
          .writeStream.option("checkpointLocation", s"$tmp/ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            ViewMaintenance.applyDeltaBatch(s, tbl, s"$tmp/mv", batch,
              keys = Seq("doc_id"), dims = Seq("source"),
              measures = Seq("n_chars"))
            ()
          }.start()
        q.awaitTermination()
        // one more source append; the BATCH consumer folds exactly it
        Snapshots.commitAppend(
          docs.filter(col("doc_id") % 13 === 0)
            .withColumn("doc_id", col("doc_id") + maxId + 1)
            .withColumn("source", lit("extra")).coalesce(1), tbl)
        val refreshed = s.sql(s"CALL $cat.system.refresh_mv('mv')").collect().head
        val audit = s.range(1).select(
          lit(if (refreshed.getLong(1) == 1L) 1L else 0L).as("refresh_one"))
        s.sql(s"""SELECT source, n_rows,
                 |CAST(sum_n_chars AS BIGINT) AS sum_n_chars FROM $cat.mv""".stripMargin)
          .crossJoin(broadcast(audit))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents),
           |moved AS (SELECT min(doc_id) AS id FROM documents, w GROUP BY doc_id // w),
           |dead AS (SELECT max(doc_id) AS id FROM documents, w GROUP BY doc_id // w),
           |base AS (
           |  SELECT CASE WHEN doc_id IN (SELECT id FROM moved) THEN 'moved'
           |              ELSE source END AS source, n_chars
           |  FROM documents
           |  WHERE doc_id NOT IN (SELECT id FROM dead)),
           |extra AS (SELECT 'extra' AS source, n_chars FROM documents
           |          WHERE doc_id % 13 = 0),
           |fin AS (SELECT * FROM base UNION ALL SELECT * FROM extra)
           |SELECT source, count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
           |       CAST(1 AS BIGINT) AS refresh_one
           |FROM fin GROUP BY source ORDER BY source""".stripMargin))

  /** x143: CONSISTENT CUTS FROM SQL — x138's cross-table guarantee as a
    * session pin: `SET spark.graft.cut.<catalog> = ledger` makes every
    * plain read through the catalog resolve member tables at the
    * ledger's newest published cut. The same 4-cut corpus+index timeline
    * as x138, then a FIFTH data chunk committed WITHOUT a publish: the
    * pinned SQL read of the data table stays at cut 4
    * (`pinned_consistent` — stale-but-consistent, never
    * index-ahead-of-data), `ledger@<v1>` replays the first cut forever
    * (`replay_ok`), a non-member read refuses (`refuse_ok` — serving it
    * "consistently" would be a lie), and explicit VERSION AS OF bypasses
    * the pin (`asof_bypass` — it names its own snapshot). Output is the
    * pinned index read via plain SQL; the oracle derives it from raw
    * documents. */
  private def x143Spec: QuerySpec =
    QuerySpec("x143_sql_cut",
      (s, d) => {
        import graft.io.{MultiTable, Snapshots}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 5 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_sqlcut_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val data = s"$tmp/data"; val idx = s"$tmp/idx"; val led = s"$tmp/ledger"
        def step(i: Int): Long = {
          val vD = Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
              .coalesce(1),
            data, recordSchema = i == 0)
          val counts = Snapshots.readAt(s, data, Some(vD)).groupBy("source")
            .agg(n.as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
          val vI =
            if (i == 0) Snapshots.commitAppend(counts.coalesce(1), idx,
              recordSchema = true)
            else {
              val old = Snapshots.liveFiles(s, idx)
              val dir = s"$idx/data/ix-$i"
              counts.coalesce(1).write.parquet(dir)
              val p = new org.apache.hadoop.fs.Path(dir)
              val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
              val parts = f.listStatus(p).toSeq
                .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
                .map(_.getPath.toString)
              Snapshots.commit(s, idx, adds = parts, removes = old)
            }
          // relative member names: the SQL pin matches catalog identifiers
          MultiTable.publish(s, led, Map("data" -> vD, "idx" -> vI))
        }
        val cuts = (0 until 4).map(step)
        Snapshots.commitAppend(
          docs.filter(col("doc_id") >= 4 * w).coalesce(1), data)
        // a real table that is NOT a cut member (for the refusal pin)
        Snapshots.commitAppend(docs.limit(1).coalesce(1), s"$tmp/lone",
          recordSchema = true)
        def n1(sql: String): Long = s.sql(sql).collect().head.getLong(0)
        s.sql(s"SET spark.graft.cut.$cat = ledger")
        try {
          val pinned = n1(s"SELECT count(*) AS n FROM $cat.data")
          val expect4 = docs.filter(col("doc_id") < 4 * w).count()
          val asofBypass = n1(
            s"SELECT count(*) AS n FROM $cat.data VERSION AS OF 5") == docs.count()
          val refuseOk =
            try { s.sql(s"SELECT * FROM $cat.lone").collect(); false }
            catch { case e: Exception =>
              (e.getMessage != null && e.getMessage.contains("not a member")) ||
                (e.getCause != null && e.getCause.getMessage != null &&
                  e.getCause.getMessage.contains("not a member")) }
          val idxRows = s.sql(
            s"SELECT source, n_docs, sum_chars FROM $cat.idx").collect()
          s.sql(s"SET spark.graft.cut.$cat = ledger@${cuts.head}")
          val replayOk = n1(s"SELECT count(*) AS n FROM $cat.data") ==
            docs.filter(col("doc_id") < w).count()
          val audit = s.range(1).select(
            lit(if (pinned == expect4) 1L else 0L).as("pinned_consistent"),
            lit(if (replayOk) 1L else 0L).as("replay_ok"),
            lit(if (refuseOk) 1L else 0L).as("refuse_ok"),
            lit(if (asofBypass) 1L else 0L).as("asof_bypass"))
          s.createDataFrame(java.util.Arrays.asList(idxRows: _*),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("source",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("n_docs",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("sum_chars",
                org.apache.spark.sql.types.LongType))))
            .crossJoin(broadcast(audit))
            .orderBy("source")
        } finally s.sql(s"RESET spark.graft.cut.$cat")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 5 + 1 AS w FROM documents)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS pinned_consistent,
           |       CAST(1 AS BIGINT) AS replay_ok,
           |       CAST(1 AS BIGINT) AS refuse_ok,
           |       CAST(1 AS BIGINT) AS asof_bypass
           |FROM documents, w WHERE doc_id < 4 * w
           |GROUP BY source ORDER BY source""".stripMargin))

  /** x144: JOIN PLANNING FROM MANIFEST STATISTICS — the missing half of
    * pushdown. Every commit records `__bytes` (and here `__rows`) per
    * data file; the catalog scan reports them through
    * `SupportsReportStatistics`, carried across the V1 pushdown boundary
    * by [[org.apache.spark.sql.graft.StatsV1ScanWrapper]] (without it a
    * DSv2 relation reports defaultSizeInBytes ≈ 8 EiB and NOTHING ever
    * auto-broadcasts). A documents fact table (3 append commits) joins a
    * tiny derived dim through plain SQL with NO hint: `bcast_ok` pins
    * that the planner chose BroadcastHashJoin from the reported sizes,
    * `stats_ok` pins that both optimized leaves carry manifest-sized
    * estimates (< 1 GiB, i.e. not the default). At 100 TB this is the
    * difference between shuffling the fact table and shipping a 26 KB
    * dim to every executor. The oracle replays the join algebra (dim is
    * a function of `source`, so it folds to a GROUP BY). */
  private def x144Spec: QuerySpec =
    QuerySpec("x144_sql_join_stats",
      (s, d) => {
        import graft.io.Snapshots
        val staged = Staging.dir("sqlstats", d) { tmp =>
          val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
          val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 3 + 1
          (0 until 3).foreach { i =>
            Snapshots.commitAppend(
              docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w),
              s"$tmp/fact", recordSchema = i == 0, statsCols = Seq("doc_id"),
              recordRowCounts = true)
          }
          Snapshots.commitAppend(
            docs.select(col("source")).distinct()
              .withColumn("category", concat(lit("cat_"), col("source")))
              .coalesce(1),
            s"$tmp/dim", recordSchema = true)
        }
        val cat = s"graft_${staged.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", staged)
        val q = s.sql(
          s"""SELECT d.category, count(*) AS n_docs,
             |       CAST(sum(f.n_chars) AS BIGINT) AS sum_chars
             |FROM $cat.fact f JOIN $cat.dim d ON f.source = d.source
             |GROUP BY d.category""".stripMargin)
        val leafSizes = q.queryExecution.optimizedPlan.collectLeaves().collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.stats.sizeInBytes
        }
        val statsOk = leafSizes.size == 2 && leafSizes.forall(_ < BigInt(1L << 30))
        val bcastOk = q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
        q.withColumn("bcast_ok", lit(if (bcastOk) 1L else 0L))
          .withColumn("stats_ok", lit(if (statsOk) 1L else 0L))
          .orderBy("category")
      },
      Some("""SELECT concat('cat_', source) AS category, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS bcast_ok, CAST(1 AS BIGINT) AS stats_ok
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** x145: HIDDEN PARTITIONING FROM SQL — `PARTITIONED BY` on a graft
    * table is manifest-native write clustering ([[graft.sql.Clustering]]):
    * CREATE records the spec as a transactional property, INSERT
    * range-clusters rows and zone-maps the cluster columns, and the
    * ordinary scan pruning serves PARTITION pruning with the predicate on
    * the raw column — no directories, no LIST-per-partition, heals with
    * one OPTIMIZE. Lifecycle: CREATE … PARTITIONED BY (source) → INSERT
    * SELECT (clustered) → a one-source read whose `pruned_ok` pins that
    * the SQL filter opened a strict subset of the live files → INSERT
    * OVERWRITE (the layout and stats survive the swap — `ow_pruned_ok`)
    * → final per-source rollup of the overwritten state. AQE file
    * coalescing is disabled around the two writes so range files exist
    * to prune at test scale (at real scale AQE's byte-sized partitions
    * are exactly what you want). The oracle replays both write algebras
    * directly on `documents`. */
  private def x145Spec: QuerySpec =
    QuerySpec("x145_sql_partitioned",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_sqlpart_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        docs.createOrReplaceTempView("x145_docs")
        val half = docs.agg(max(col("doc_id"))).first().getLong(0) / 2
        s.sql(s"""CREATE TABLE $cat.pd (doc_id BIGINT, source STRING, n_chars BIGINT)
                 |PARTITIONED BY (source)""".stripMargin)
        val aqe = "spark.sql.adaptive.coalescePartitions.enabled"
        val prev = s.conf.get(aqe)
        try {
          s.conf.set(aqe, "false")
          s.sql(s"INSERT INTO $cat.pd SELECT doc_id, source, CAST(n_chars AS BIGINT) FROM x145_docs")
          graft.sql.GraftScanInfo.last = None
          val one = s.sql(s"""SELECT count(*) AS n_docs,
                             |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                             |FROM $cat.pd WHERE source = 'src3'""".stripMargin)
            .collect().head
          val i1 = graft.sql.GraftScanInfo.last.get
          val prunedOk = if (i1.candidates < i1.total) 1L else 0L
          s.sql(s"""INSERT OVERWRITE $cat.pd
                   |SELECT doc_id, source, CAST(n_chars AS BIGINT)
                   |FROM x145_docs WHERE doc_id <= $half""".stripMargin)
          graft.sql.GraftScanInfo.last = None
          val two = s.sql(s"""SELECT count(*) AS n_docs,
                             |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                             |FROM $cat.pd WHERE source = 'src3'""".stripMargin)
            .collect().head
          val i2 = graft.sql.GraftScanInfo.last.get
          val owPrunedOk = if (i2.candidates < i2.total) 1L else 0L
          // PARTITION-SPEC EVOLUTION: flip the cluster spec to doc_id —
          // validated at the ALTER, announced in the history notes, and
          // surfaced as the t$detail layout split. New writes cluster by
          // the new spec (a banded id read prunes); the pre-evolution
          // files keep their source stats and count as unclustered until
          // OPTIMIZE would heal them.
          s.sql(s"ALTER TABLE $cat.pd SET TBLPROPERTIES ('write.cluster.by'='doc_id')")
          s.sql(s"""INSERT INTO $cat.pd
                   |SELECT doc_id, source, CAST(n_chars AS BIGINT)
                   |FROM x145_docs WHERE doc_id > $half""".stripMargin)
          val det = s.sql(
            s"SELECT cluster_spec, unclustered_files FROM $cat.`pd$$detail`")
            .collect().head
          val splitOk = if (det.getString(0) == "doc_id" && det.getInt(1) > 0) 1L else 0L
          graft.sql.GraftScanInfo.last = None
          val three = s.sql(s"""SELECT count(*) AS n_docs
                               |FROM $cat.pd WHERE doc_id > $half
                               |AND doc_id <= ${half + half / 4}""".stripMargin)
            .collect().head
          val i3 = graft.sql.GraftScanInfo.last.get
          val evolvePrunedOk = if (i3.candidates < i3.total) 1L else 0L
          s.sql(s"""SELECT source, count(*) AS n_docs,
                   |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                   |FROM $cat.pd GROUP BY source""".stripMargin)
            .withColumn("one_n", lit(one.getLong(0)))
            .withColumn("one_chars", lit(one.getLong(1)))
            .withColumn("ow_n", lit(two.getLong(0)))
            .withColumn("ow_chars", lit(two.getLong(1)))
            .withColumn("band_n", lit(three.getLong(0)))
            .withColumn("pruned_ok", lit(prunedOk))
            .withColumn("ow_pruned_ok", lit(owPrunedOk))
            .withColumn("split_ok", lit(splitOk))
            .withColumn("evolve_pruned_ok", lit(evolvePrunedOk))
            .orderBy("source")
        } finally s.conf.set(aqe, prev)
      },
      Some("""WITH half AS (SELECT max(doc_id) // 2 AS h FROM documents),
           |one AS (SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS c
           |        FROM documents WHERE source = 'src3'),
           |ow AS (SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS c
           |       FROM documents, half WHERE source = 'src3' AND doc_id <= h),
           |band AS (SELECT count(*) AS n FROM documents, half
           |         WHERE doc_id > h AND doc_id <= h + h // 4)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       one.n AS one_n, one.c AS one_chars,
           |       ow.n AS ow_n, ow.c AS ow_chars,
           |       band.n AS band_n,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS ow_pruned_ok,
           |       CAST(1 AS BIGINT) AS split_ok,
           |       CAST(1 AS BIGINT) AS evolve_pruned_ok
           |FROM documents, half, one, ow, band
           |GROUP BY source, one.n, one.c, ow.n, ow.c, band.n
           |ORDER BY source""".stripMargin))

  /** x146: AGGREGATES FROM METADATA, WITH THE EXACTNESS GATE — unfiltered
    * ungrouped MIN/MAX/COUNT push down COMPLETELY to the manifest's
    * per-file zone maps ([[graft.sql.GraftAggScan]]): `SELECT min(doc_id),
    * max(doc_id), count(*)` answers from one manifest replay, zero data
    * files opened, at any table size (`meta_ok` pins the plan routed to
    * the metadata scan). Then a MoR delete tombstones the max doc — a
    * deletion vector can hide the extreme row from metadata, so the SAME
    * query must now DECLINE the shortcut (`declined_ok` pins it planned
    * normally) and still return the exact post-delete extremes. Pruning
    * may be conservative; aggregates may not — the decline IS the
    * feature. The oracle replays both states from raw documents. */
  private def x146Spec: QuerySpec =
    QuerySpec("x146_sql_agg_meta",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d).select(col("doc_id"))
        val tmp = java.nio.file.Files.createTempDirectory("graft_aggmeta_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 3 + 1
        val tbl = s"$tmp/t"
        (0 until 3).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        def metaRouted(q: org.apache.spark.sql.DataFrame): Boolean =
          q.queryExecution.optimizedPlan.collectLeaves().exists {
            case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
              (r.scan match {
                case wr: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper => wr.v1Scan
                case sc => sc
              }).isInstanceOf[graft.sql.GraftAggScan]
            case _ => false
          }
        val sql = s"SELECT CAST(min(doc_id) AS BIGINT) AS mn, " +
          s"CAST(max(doc_id) AS BIGINT) AS mx, count(*) AS n FROM $cat.t"
        val q1 = s.sql(sql)
        val metaOk = metaRouted(q1)
        val r1 = q1.collect().head
        Snapshots.deleteWhereMor(s, tbl, col("doc_id") === maxId, Seq("doc_id"))
        val q2 = s.sql(sql)
        val declinedOk = !metaRouted(q2)
        val r2 = q2.collect().head
        s.range(1).select(
          lit(r1.getLong(0)).as("mn"), lit(r1.getLong(1)).as("mx"),
          lit(r1.getLong(2)).as("n"),
          lit(r2.getLong(0)).as("mn2"), lit(r2.getLong(1)).as("mx2"),
          lit(r2.getLong(2)).as("n2"),
          lit(if (metaOk) 1L else 0L).as("meta_ok"),
          lit(if (declinedOk) 1L else 0L).as("declined_ok"))
      },
      Some("""WITH m AS (SELECT max(doc_id) AS top FROM documents)
           |SELECT CAST(min(doc_id) AS BIGINT) AS mn,
           |       CAST(max(doc_id) AS BIGINT) AS mx,
           |       count(*) AS n,
           |       CAST(min(doc_id) AS BIGINT) AS mn2,
           |       (SELECT CAST(max(doc_id) AS BIGINT) FROM documents, m
           |        WHERE doc_id < top) AS mx2,
           |       count(*) - 1 AS n2,
           |       CAST(1 AS BIGINT) AS meta_ok,
           |       CAST(1 AS BIGINT) AS declined_ok
           |FROM documents""".stripMargin))

  /** st30: STREAMING INGEST INTO A CLUSTERED TABLE — the hidden-
    * partitioning story closed across the stream boundary: a table
    * created with `PARTITIONED BY (source)` receives its rows through
    * the streaming snapshot sink (one manifest transaction per
    * micro-batch, [[graft.streaming.SnapshotSinkProvider]]), and because
    * [[graft.io.Snapshots.commitBatchOnce]] routes every batch through
    * [[graft.io.Clustering.forWrite]], each batch lands range-clustered
    * with zone maps + row counts stamped — streaming ingest is not the
    * path that quietly erodes pruning. Pins: one table version per
    * micro-batch (`versions_ok`), a one-source SQL read opens a strict
    * subset of live files (`pruned_ok`), COUNT(*) stays metadata-only
    * through the catalog's fastCount (`fast_n` equals the rollup total),
    * and a FULL REPLAY from a fresh checkpoint commits nothing — the
    * manifest's deterministic per-batch dirs are the second idempotence
    * lock under streaming-state loss (`replay_noop`). Oracle: the
    * per-source rollup from raw documents. */
  private def st30Spec: QuerySpec =
    QuerySpec("st30_stream_clustered_ingest",
      (s, d) => {
        import graft.io.Snapshots
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 3 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_stclu_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        (0 until 3).foreach { i =>
          docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
            .coalesce(1).write.parquet(s"$tmp/src/s$i")
          new java.io.File(s"$tmp/src/s$i").listFiles()
            .foreach(_.setLastModified(1700000000000L + i * 60000L))
        }
        s.sql(s"""CREATE TABLE $cat.t (doc_id BIGINT, source STRING, n_chars BIGINT)
                 |PARTITIONED BY (source)""".stripMargin)
        val tbl = s"$tmp/t"
        val schema = s.read.option("recursiveFileLookup", "true")
          .parquet(s"$tmp/src").schema
        def drain(ckpt: String): Unit = {
          val q = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
            .parquet(s"$tmp/src")
            .writeStream.format("graft.streaming.SnapshotSinkProvider")
            .option("table", tbl).option("checkpointLocation", s"$tmp/$ckpt")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        val aqe = "spark.sql.adaptive.coalescePartitions.enabled"
        val prev = s.conf.get(aqe)
        try { s.conf.set(aqe, "false"); drain("ckpt1") }
        finally s.conf.set(aqe, prev)
        val vAfter = Snapshots.currentVersion(s, tbl)
        // table existed as v1 (CREATE) + one version per micro-batch
        val versionsOk = if (vAfter == 4L) 1L else 0L
        graft.sql.GraftScanInfo.last = None
        val one = s.sql(s"""SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS c
                           |FROM $cat.t WHERE source = 'src3'""".stripMargin)
          .collect().head
        val info = graft.sql.GraftScanInfo.last.get
        val prunedOk = if (info.candidates < info.total) 1L else 0L
        val fastN = s.sql(s"SELECT count(*) AS n FROM $cat.t").collect().head.getLong(0)
        val files = Snapshots.liveFiles(s, tbl)
        drain("ckpt2") // fresh checkpoint: full replay, ledger-refused
        val replayNoop = if (Snapshots.currentVersion(s, tbl) == vAfter &&
          Snapshots.liveFiles(s, tbl) == files) 1L else 0L
        s.sql(s"""SELECT source, count(*) AS n_docs,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t GROUP BY source""".stripMargin)
          .withColumn("one_n", lit(one.getLong(0)))
          .withColumn("one_chars", lit(one.getLong(1)))
          .withColumn("fast_n", lit(fastN))
          .withColumn("versions_ok", lit(versionsOk))
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("replay_noop", lit(replayNoop))
          .orderBy("source")
      },
      Some("""WITH one AS (SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS c
           |            FROM documents WHERE source = 'src3'),
           |tot AS (SELECT count(*) AS n FROM documents)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       one.n AS one_n, one.c AS one_chars, tot.n AS fast_n,
           |       CAST(1 AS BIGINT) AS versions_ok,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS replay_noop
           |FROM documents, one, tot
           |GROUP BY source, one.n, one.c, tot.n
           |ORDER BY source""".stripMargin))

  /** x147: WRITE-AUDIT-PUBLISH FROM SQL — the staging discipline a
    * production corpus takes risky curation under ([[graft.io.Wap]]):
    * `CALL clone` forks the table as a ZERO-COPY metadata commit (zone
    * maps and row counts carried — the fork prunes from its first read),
    * the staged fork absorbs a CoW DELETE and an INSERT through ordinary
    * SQL while the source keeps serving its unchanged content
    * (`stale_src_ok`), and `CALL publish` lands the audited state as ONE
    * atomic commit (`publish_atomic` pins exactly +1 version) with every
    * fork-created file REHOMED under the source's own data dir
    * (`rehomed_ok` — no staging path in `t$files`). Pre-publish versions
    * keep time-traveling (`travel_ok`). The oracle replays the
    * delete+insert algebra on raw documents. */
  private def x147Spec: QuerySpec =
    QuerySpec("x147_wap",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 4 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_wap_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        docs.createOrReplaceTempView("x147_docs")
        val tbl = s"$tmp/corpus"
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
              .coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val base = Snapshots.currentVersion(s, tbl)
        val n0 = docs.count()
        s.sql(s"CALL $cat.system.clone('corpus', 'stage')")
        // stage the risky change: drop the first quarter, add a re-keyed
        // band — ordinary SQL against the fork
        s.sql(s"DELETE FROM $cat.stage WHERE doc_id < $w")
        s.sql(s"""INSERT INTO $cat.stage
                 |SELECT doc_id + ${maxId + 1} AS doc_id, source, n_chars
                 |FROM x147_docs WHERE doc_id >= $w AND doc_id < ${2 * w}""".stripMargin)
        val staleSrcOk =
          if (s.sql(s"SELECT count(*) AS n FROM $cat.corpus").collect().head.getLong(0) == n0 &&
            Snapshots.currentVersion(s, tbl) == base) 1L else 0L
        val pub = s.sql(s"CALL $cat.system.publish('stage')").collect().head
        val publishAtomic =
          if (pub.getLong(0) == base + 1 &&
            Snapshots.currentVersion(s, tbl) == base + 1) 1L else 0L
        val rehomedOk = if (s.sql(
          s"SELECT count(*) AS n FROM $cat.`corpus$$files` WHERE path LIKE '%/stage/%'")
          .collect().head.getLong(0) == 0L) 1L else 0L
        val travelOk = if (s.sql(
          s"SELECT count(*) AS n FROM $cat.corpus VERSION AS OF $base")
          .collect().head.getLong(0) == n0) 1L else 0L
        s.sql(s"""SELECT source, count(*) AS n_docs,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.corpus GROUP BY source""".stripMargin)
          .withColumn("stale_src_ok", lit(staleSrcOk))
          .withColumn("publish_atomic", lit(publishAtomic))
          .withColumn("rehomed_ok", lit(rehomedOk))
          .withColumn("travel_ok", lit(travelOk))
          .orderBy("source")
      },
      Some("""WITH w AS (SELECT max(doc_id) // 4 + 1 AS w,
           |              max(doc_id) + 1 AS shift FROM documents),
           |final AS (
           |  SELECT source, n_chars FROM documents, w WHERE doc_id >= w
           |  UNION ALL
           |  SELECT source, n_chars FROM documents, w
           |  WHERE doc_id >= w AND doc_id < 2 * w)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS stale_src_ok,
           |       CAST(1 AS BIGINT) AS publish_atomic,
           |       CAST(1 AS BIGINT) AS rehomed_ok,
           |       CAST(1 AS BIGINT) AS travel_ok
           |FROM final GROUP BY source ORDER BY source""".stripMargin))

  /** x148: MULTI-DIMENSION HIDDEN PARTITIONING — `PARTITIONED BY
    * (doc_id, source)` Morton-interleaves the write
    * ([[graft.io.Clustering]] k ≥ 2), so EVERY dimension's zone maps
    * prune alone: the decisive pin is `dim2_pruned_ok` — an equality on
    * `source`, the SECOND dimension, opens a strict subset of files,
    * which the lexicographic layout this replaces cannot do (the second
    * dim spans its whole domain inside every leading-dim range file).
    * `dim1_pruned_ok` pins the leading dim still prunes, and both legs'
    * COUNTS cross the DuckDB oracle, so the z-layout is provably
    * content-preserving, not just well-shaped. */
  private def x148Spec: QuerySpec =
    QuerySpec("x148_sql_zpartition",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_zpart_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        docs.createOrReplaceTempView("x148_docs")
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        s.sql(s"""CREATE TABLE $cat.zp (doc_id BIGINT, source STRING, n_chars BIGINT)
                 |PARTITIONED BY (doc_id, source)""".stripMargin)
        val aqe = "spark.sql.adaptive.coalescePartitions.enabled"
        val prev = s.conf.get(aqe)
        try {
          s.conf.set(aqe, "false")
          s.sql(s"INSERT INTO $cat.zp SELECT * FROM x148_docs")
        } finally s.conf.set(aqe, prev)
        graft.sql.GraftScanInfo.last = None
        val bySrc = s.sql(s"""SELECT count(*) AS n,
                             |CAST(sum(n_chars) AS BIGINT) AS c
                             |FROM $cat.zp WHERE source = 'src3'""".stripMargin)
          .collect().head
        val i2 = graft.sql.GraftScanInfo.last.get
        val dim2Ok = if (i2.candidates < i2.total) 1L else 0L
        graft.sql.GraftScanInfo.last = None
        val byId = s.sql(s"""SELECT count(*) AS n,
                            |CAST(sum(n_chars) AS BIGINT) AS c
                            |FROM $cat.zp WHERE doc_id < ${maxId / 4}""".stripMargin)
          .collect().head
        val i1 = graft.sql.GraftScanInfo.last.get
        val dim1Ok = if (i1.candidates < i1.total) 1L else 0L
        s.range(1).select(
          lit(bySrc.getLong(0)).as("src_n"), lit(bySrc.getLong(1)).as("src_chars"),
          lit(byId.getLong(0)).as("id_n"), lit(byId.getLong(1)).as("id_chars"),
          lit(dim2Ok).as("dim2_pruned_ok"), lit(dim1Ok).as("dim1_pruned_ok"))
      },
      Some("""WITH m AS (SELECT max(doc_id) // 4 AS q FROM documents),
           |s3 AS (SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS c
           |       FROM documents WHERE source = 'src3'),
           |lo AS (SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS c
           |       FROM documents, m WHERE doc_id < q)
           |SELECT s3.n AS src_n, s3.c AS src_chars,
           |       lo.n AS id_n, lo.c AS id_chars,
           |       CAST(1 AS BIGINT) AS dim2_pruned_ok,
           |       CAST(1 AS BIGINT) AS dim1_pruned_ok
           |FROM s3, lo""".stripMargin))

  /** x149: THE NIGHTLY SWEEP FROM SQL — `CALL graft.system.maintain`
    * composes the maintenance a 100 TB table actually runs (binpack the
    * small-file tail → verified checkpoint → opt-in age expiry → vacuum)
    * as ONE statement. A 6-fragment ingest tail binpacks in one
    * transactional commit (`packed_ok`); the rewritten files INHERIT the
    * retired files' stat coverage — zone maps re-stamped, row counts
    * kept — so compaction never turns pruning or metadata COUNT(*) off
    * (`stats_kept_ok` pins doc_id zone maps on every live file, and the
    * post-sweep `fast_n`); with keep_days = 0 nothing expires, so the
    * pre-sweep version still time-travels (`travel_ok`). The oracle is
    * the per-source rollup — compaction must be byte-invisible to
    * queries. */
  private def x149Spec: QuerySpec =
    QuerySpec("x149_sql_maintain",
      (s, d) => {
        import graft.io.Snapshots
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 6 + 1
        val tmp = java.nio.file.Files.createTempDirectory("graft_maint_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val tbl = s"$tmp/t"
        (0 until 6).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
              .coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val n0 = docs.count()
        val preV = Snapshots.currentVersion(s, tbl)
        val m = s.sql(s"CALL $cat.system.maintain('t')").collect().head
        val packedOk = if (m.getLong(1) == 6L) 1L else 0L
        val live = Snapshots.liveFiles(s, tbl).toSet
        val withIdStat = Snapshots.fileStats(s, tbl)
          .filter(st => st.column == "doc_id" && live(st.path)).map(_.path).toSet
        val statsKeptOk = if (withIdStat == live) 1L else 0L
        val fastN = s.sql(s"SELECT count(*) AS n FROM $cat.t").collect().head.getLong(0)
        val travelOk = if (s.sql(
          s"SELECT count(*) AS n FROM $cat.t VERSION AS OF $preV")
          .collect().head.getLong(0) == n0) 1L else 0L
        s.sql(s"""SELECT source, count(*) AS n_docs,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t GROUP BY source""".stripMargin)
          .withColumn("fast_n", lit(fastN))
          .withColumn("packed_ok", lit(packedOk))
          .withColumn("stats_kept_ok", lit(statsKeptOk))
          .withColumn("travel_ok", lit(travelOk))
          .orderBy("source")
      },
      Some("""WITH tot AS (SELECT count(*) AS n FROM documents)
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       tot.n AS fast_n,
           |       CAST(1 AS BIGINT) AS packed_ok,
           |       CAST(1 AS BIGINT) AS stats_kept_ok,
           |       CAST(1 AS BIGINT) AS travel_ok
           |FROM documents, tot GROUP BY source, tot.n ORDER BY source""".stripMargin))

  /** x150: CONDITIONED / MULTI-ACTION / PARTIAL-ROW MERGE — the CDC
    * consumer statement every changefeed writes on day one:
    * `WHEN MATCHED AND s.op = 'D' THEN DELETE / WHEN MATCHED THEN UPDATE
    * SET c = t.c + s.delta / WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT
    * (...)`, routed through [[graft.io.Snapshots.mergeIntoWhen]]'s clause
    * algebra (first applicable clause wins, partial SET reads both the
    * `t.` and `s.` namespaces, unclaimed source rows drop) as ONE
    * transactional commit with the keyed-merge file discipline
    * (`one_commit` pins it; GraftDmlSpec pins precedence and pruning).
    * The batch holds matched deletes, matched updates, fresh inserts, and
    * delete-ops for absent keys (must no-op) in one statement; the oracle
    * replays the clause algebra relationally in DuckDB. */
  private def x150Spec: QuerySpec =
    QuerySpec("x150_sql_merge_when",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_mergewhen_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        // the CDC batch: op/delta derived deterministically from doc_id so
        // the oracle can regenerate the same batch relationally
        val src = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"),
            when(col("doc_id") % 15 === 0, "D").otherwise("U").as("op"),
            (col("doc_id") % 97).as("delta"))
          .unionByName(docs.filter(col("doc_id") % 11 === 0)
            .select((col("doc_id") + maxId + 1).as("doc_id"),
              when(col("doc_id") % 22 === 0, "D").otherwise("U").as("op"),
              (col("doc_id") % 97).as("delta")))
        src.createOrReplaceTempView("x150_src")
        s.sql(s"""MERGE INTO $cat.t t USING x150_src s ON t.doc_id = s.doc_id
                 |WHEN MATCHED AND s.op = 'D' THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET n_chars = t.n_chars + s.delta
                 |WHEN NOT MATCHED AND s.op <> 'D' THEN
                 |  INSERT (doc_id, source, n_chars) VALUES (s.doc_id, 'cdc', s.delta)"""
          .stripMargin)
        val oneCommit = if (Snapshots.currentVersion(s, tbl) == 5L) 1L else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                 |CAST(sum(CASE WHEN source = 'cdc' THEN 1 ELSE 0 END) AS BIGINT)
                 |  AS cdc_rows,
                 |CAST(sum(CASE WHEN doc_id % 15 = 0 AND doc_id <= $maxId
                 |              THEN 1 ELSE 0 END) AS BIGINT) AS ghost_rows
                 |FROM $cat.t""".stripMargin)
          .withColumn("one_commit", lit(oneCommit))
      },
      Some("""WITH mx AS (SELECT max(doc_id) AS m FROM documents),
           |src AS (
           |  SELECT doc_id,
           |         CASE WHEN doc_id % 15 = 0 THEN 'D' ELSE 'U' END AS op,
           |         doc_id % 97 AS delta
           |  FROM documents WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + m + 1,
           |         CASE WHEN doc_id % 22 = 0 THEN 'D' ELSE 'U' END,
           |         doc_id % 97
           |  FROM documents, mx WHERE doc_id % 11 = 0
           |),
           |kept AS (
           |  SELECT t.doc_id, t.source,
           |         CASE WHEN s.doc_id IS NOT NULL
           |              THEN t.n_chars + s.delta ELSE t.n_chars END AS n_chars
           |  FROM documents t LEFT JOIN src s ON t.doc_id = s.doc_id
           |  WHERE s.doc_id IS NULL OR s.op <> 'D'
           |),
           |ins AS (
           |  SELECT s.doc_id, 'cdc' AS source, s.delta AS n_chars
           |  FROM src s LEFT JOIN documents t ON t.doc_id = s.doc_id
           |  WHERE t.doc_id IS NULL AND s.op <> 'D'
           |),
           |final AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(sum(CASE WHEN source = 'cdc' THEN 1 ELSE 0 END) AS BIGINT)
           |         AS cdc_rows,
           |       CAST(sum(CASE WHEN doc_id % 15 = 0
           |                     AND doc_id <= (SELECT m FROM mx)
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS ghost_rows,
           |       CAST(1 AS BIGINT) AS one_commit
           |FROM final""".stripMargin))

  /** x153: NAMED BRANCHES — the experiment workflow over the tag + WAP
    * machinery ([[graft.io.Branches]]): `CALL branch` forks the table
    * zero-copy (the source holds a lifecycle pin at the fork base), the
    * branch takes SQL DML through its own addressable identifier
    * (`cat.t._branches.curate`) while the SOURCE serves production reads
    * untouched AND keeps ingesting (the fast-forward case), the branch
    * head reads through `VERSION AS OF 'curate'`, and `CALL fast_forward`
    * publishes the staged curation as ONE atomic commit that carries the
    * source's append-only advance through. Audit counts pin every
    * intermediate state; the oracle replays the final relation. */
  private def x153Spec: QuerySpec =
    QuerySpec("x153_sql_branch_publish",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_branch_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        val n0 = docs.count()
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"))
        }
        s.sql(s"CALL $cat.system.branch('t', 'curate')")
        // curation stages on the branch…
        s.sql(s"DELETE FROM $cat.t._branches.curate WHERE n_chars % 5 = 0")
        // …while ingest keeps appending to the SOURCE
        s.sql(s"INSERT INTO $cat.t VALUES (${maxId + 1}, 'late', 42)")
        // audit: branch head through the ref; source untouched by staging
        val auditBranch = s.sql(
          s"SELECT count(*) AS n FROM $cat.t VERSION AS OF 'curate'")
          .collect().head.getLong(0)
        val auditSrc = s.sql(s"SELECT count(*) AS n FROM $cat.t")
          .collect().head.getLong(0)
        val srcOk = if (auditSrc == n0 + 1) 1L else 0L
        s.sql(s"CALL $cat.system.fast_forward('t', 'curate')")
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("audit_branch", lit(auditBranch))
          .withColumn("src_ok", lit(srcOk))
      },
      Some("""WITH kept AS (SELECT * FROM documents WHERE n_chars % 5 <> 0)
           |SELECT (SELECT count(*) FROM kept) + 1 AS n_rows,
           |       (SELECT CAST(sum(n_chars) AS BIGINT) FROM kept) + 42 AS sum_chars,
           |       (SELECT count(*) FROM kept) AS audit_branch,
           |       CAST(1 AS BIGINT) AS src_ok""".stripMargin))

  /** x151: METADATA-ONLY COLUMN EVOLUTION — `ALTER TABLE RENAME COLUMN`
    * and `DROP COLUMN` without touching a single data file (the Iceberg
    * name-mapping shape): the rename records logical→physical in the
    * `graft.column.mapping` property, one scan serves files from both
    * sides of it ([[graft.io.Snapshots.schemaRead]] widens the schema
    * and coalesces), old files' zone maps keep pruning under the NEW
    * name (`pruned_ok` pins a banded read still skipping files), `AS OF`
    * below the evolution serves the OLD name (`old_name_ok`), and the
    * drop projects the column away with files unrewritten (`meta_only`
    * pins the live set byte-identical across both ALTERs). The oracle
    * replays the surviving relation on raw documents. */
  private def x151Spec: QuerySpec =
    QuerySpec("x151_sql_alter_rename_drop",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_altrd_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val before = Snapshots.liveFiles(s, tbl).toSet
        val preSkip = Snapshots.pruneFiles(s, tbl, "doc_id", "0", (w - 1).toString)._2.size
        s.sql(s"ALTER TABLE $cat.t RENAME COLUMN doc_id TO doc")
        s.sql(s"ALTER TABLE $cat.t DROP COLUMN source")
        // both ALTERs were metadata-only
        val metaOnly = if (Snapshots.liveFiles(s, tbl).toSet == before) 1L else 0L
        // zone maps recorded under the old physical name prune under the new
        val postSkip = Snapshots.pruneFiles(s, tbl, "doc", "0", (w - 1).toString)._2.size
        val prunedOk = if (postSkip == preSkip && postSkip == 3) 1L else 0L
        // AS OF below the evolution serves the old shape
        val oldShape = s.sql(s"SELECT * FROM $cat.t VERSION AS OF 4").columns.toSeq
        val oldNameOk = if (oldShape == Seq("doc_id", "source", "n_chars")) 1L else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(doc) AS BIGINT) AS sum_ids,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t WHERE doc BETWEEN 0 AND ${w - 1}""".stripMargin)
          .withColumn("meta_only", lit(metaOnly))
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("old_name_ok", lit(oldNameOk))
      },
      Some("""WITH w AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS meta_only,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS old_name_ok
           |FROM documents, w WHERE doc_id BETWEEN 0 AND w - 1""".stripMargin))

  /** x152: SUBQUERY PREDICATES IN DML — `DELETE FROM t WHERE k IN
    * (SELECT …) AND k BETWEEN a AND b` and `UPDATE … WHERE k IN
    * (SELECT …)` rewrite onto the keyed-merge semi-join shape
    * ([[graft.sql.GraftDmlInCommand]]): the subquery's distinct values
    * become the merge source (its own key bounds prune candidates), the
    * plain outer conjuncts ride as the matched clause's condition AND as
    * an extra zone-map bound intersecting the candidate set — `pruned_ok`
    * pins that the banded delete left files outside the band untouched.
    * One transactional commit per statement (`commits_ok`); the oracle
    * replays both statements relationally in DuckDB. */
  private def x152Spec: QuerySpec =
    QuerySpec("x152_sql_dml_subquery",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_dmlsub_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        docs.createOrReplaceTempView("x152_docs")
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val half = maxId / 2
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val before = Snapshots.liveFiles(s, tbl).toSet
        s.sql(s"""DELETE FROM $cat.t
                 |WHERE doc_id IN (SELECT doc_id FROM x152_docs WHERE n_chars % 7 = 0)
                 |  AND doc_id BETWEEN 0 AND $half""".stripMargin)
        // the outer band bound intersects the candidate set: the files
        // wholly above `half` are never rewritten
        val untouched = (before intersect Snapshots.liveFiles(s, tbl).toSet).size
        val prunedOk = if (untouched >= 2) 1L else 0L
        s.sql(s"""UPDATE $cat.t SET n_chars = n_chars + 100000
                 |WHERE doc_id IN (SELECT doc_id FROM x152_docs WHERE source = 'src2')"""
          .stripMargin)
        val commitsOk = if (Snapshots.currentVersion(s, tbl) == 6L) 1L else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("commits_ok", lit(commitsOk))
      },
      Some("""WITH half AS (SELECT max(doc_id) // 2 AS h FROM documents),
           |kept AS (
           |  SELECT doc_id, source, n_chars FROM documents, half
           |  WHERE NOT (n_chars % 7 = 0 AND doc_id BETWEEN 0 AND h)
           |),
           |upd AS (
           |  SELECT doc_id,
           |         n_chars + CASE WHEN source = 'src2'
           |                        THEN 100000 ELSE 0 END AS n_chars
           |  FROM kept
           |)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS commits_ok
           |FROM upd""".stripMargin))

  /** x154: EXISTS / NOT EXISTS / NOT IN PREDICATES IN DML — the full
    * anti-join side of the subquery-DML surface ([[graft.sql
    * .GraftDmlAntiCommand]] / [[graft.io.Snapshots.mutateAnti]]):
    * a correlated `DELETE … WHERE EXISTS (… WHERE s.k = doc_id AND …)`
    * decorrelates onto the x152 semi-join shape; `UPDATE … WHERE NOT
    * EXISTS (…) AND doc_id BETWEEN …` mutates the UNMATCHED keys through
    * one distributed left join (never a collected `isin` literal), with
    * the plain band conjunct still zone-map pruning candidate files
    * (`pruned_ok` pins files wholly above the band untouched); and a
    * `NOT IN (SELECT …)` whose subquery yields a NULL enforces SQL's
    * three-valued rule — the statement is a provable no-op, not a
    * table-clearing bug (`noop_ok` pins the version unchanged). The
    * oracle replays the surviving algebra relationally in DuckDB. */
  private def x154Spec: QuerySpec =
    QuerySpec("x154_sql_dml_exists",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_dmlanti_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        docs.createOrReplaceTempView("x154_docs")
        // distinct column names so the correlation really reaches OUT
        // (an inner `doc_id` would shadow the target's)
        docs.select(col("doc_id").as("k"), col("source").as("src"),
            col("n_chars").as("nc"))
          .createOrReplaceTempView("x154_src")
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val half = maxId / 2
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        // correlated EXISTS with an inner predicate → semi-join delete
        s.sql(s"""DELETE FROM $cat.t WHERE EXISTS (
                 |  SELECT 1 FROM x154_src s
                 |  WHERE s.k = doc_id AND s.nc % 11 = 0)""".stripMargin)
        val before = Snapshots.liveFiles(s, tbl).toSet
        // NOT EXISTS + band: anti-join update, band prunes candidates
        s.sql(s"""UPDATE $cat.t SET n_chars = n_chars + 500000
                 |WHERE NOT EXISTS (
                 |    SELECT 1 FROM x154_src s
                 |    WHERE s.k = doc_id AND s.src = 'src1')
                 |  AND doc_id BETWEEN 0 AND $half""".stripMargin)
        val untouched = (before intersect Snapshots.liveFiles(s, tbl).toSet).size
        val prunedOk = if (untouched >= 2) 1L else 0L
        val vBefore = Snapshots.currentVersion(s, tbl)
        // NOT IN with a NULL in the subquery: three-valued no-op
        s.sql(s"""DELETE FROM $cat.t WHERE doc_id NOT IN (
                 |  SELECT CASE WHEN n_chars % 13 = 0 THEN NULL ELSE doc_id END
                 |  FROM x154_docs)""".stripMargin)
        val noopOk = if (Snapshots.currentVersion(s, tbl) == vBefore) 1L else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("noop_ok", lit(noopOk))
      },
      Some("""WITH half AS (SELECT max(doc_id) // 2 AS h FROM documents),
           |after1 AS (SELECT doc_id, source, n_chars FROM documents
           |           WHERE n_chars % 11 <> 0),
           |after2 AS (
           |  SELECT doc_id,
           |         n_chars + CASE WHEN source <> 'src1'
           |                         AND doc_id BETWEEN 0 AND h
           |                        THEN 500000 ELSE 0 END AS n_chars
           |  FROM after1, half
           |)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS noop_ok
           |FROM after2""".stripMargin))

  /** x155: SEQUENCE PACKING, NO-STRADDLE GREEDY BINS ([[graft.ext
    * .Packing.packGreedy]]) — documents packed whole into 512-token
    * bins, greedy first-fit in id order within 32 deterministic shards
    * (`doc_id % 32`). The fold is shard-local sequential state executed
    * as one partition-local pass per shard — the honest distributed
    * form of an inherently sequential algorithm (every shard packs in
    * parallel; waste is bounded by one open bin per shard). The oracle
    * replays the accumulator with a DuckDB recursive CTE stepping the
    * per-shard row number. */
  private def x155Spec: QuerySpec =
    QuerySpec("x155_pack_greedy",
      (s, d) => graft.ext.Packing.packGreedy(
          Tables.documents(s, d), col("doc_id"),
          size(split(col("text"), " ", -1)), capacity = 512L, shards = 32)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE t AS (
           |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
           |         doc_id % 32 AS shard
           |  FROM documents),
           |r AS (SELECT shard, doc_id, n,
           |        row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           |      FROM t),
           |p AS (
           |  SELECT shard, doc_id, n, rn, CAST(0 AS BIGINT) AS bin, n AS acc
           |  FROM r WHERE rn = 1
           |  UNION ALL
           |  SELECT r.shard, r.doc_id, r.n, r.rn,
           |         CASE WHEN p.acc > 0 AND p.acc + r.n > 512
           |              THEN p.bin + 1 ELSE p.bin END,
           |         CASE WHEN p.acc > 0 AND p.acc + r.n > 512
           |              THEN r.n ELSE p.acc + r.n END
           |  FROM p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
           |SELECT doc_id, n AS n_tokens, shard, bin
           |FROM p ORDER BY doc_id""".stripMargin))

  /** x156: METADATA-ONLY TYPE WIDENING — `ALTER TABLE … ALTER COLUMN c
    * TYPE BIGINT` on int columns (and float→double) without touching a
    * data file: the schema stamp re-records the column wide, Spark 4's
    * parquet readers promote the old INT32 pages at scan time
    * (SPARK-40876), zone maps recorded under the narrow dtype keep
    * pruning banded reads (`pruned_ok` pins the same skip count before
    * and after), an INSERT of a value int could never hold lands
    * (`wide_ok`), and `AS OF` below the evolution serves the narrow
    * shape (`old_shape_ok`). `meta_only` pins the live set
    * byte-identical across both ALTERs. The oracle replays the surviving
    * relation plus the inserted row on raw documents. */
  private def x156Spec: QuerySpec =
    QuerySpec("x156_sql_alter_widen",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_widen_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        // int-ranged ids at ANY SF: benchdata replica-shifts doc_id past
        // 2^31, so the int fixture derives `doc_id % 1e9` (collisions are
        // harmless — widening has no key semantics; the oracle replays
        // the same modulo)
        val docs = Tables.documents(s, d)
          .select((col("doc_id") % 1000000000L).cast("int").as("doc_id"),
            col("n_chars").cast("int").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getInt(0).toLong
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val before = Snapshots.liveFiles(s, tbl).toSet
        val preSkip = Snapshots.pruneFiles(s, tbl, "doc_id", "0", (w - 1).toString)._2.size
        s.sql(s"ALTER TABLE $cat.t ALTER COLUMN doc_id TYPE BIGINT")
        s.sql(s"ALTER TABLE $cat.t ALTER COLUMN n_chars TYPE BIGINT")
        val metaOnly = if (Snapshots.liveFiles(s, tbl).toSet == before) 1L else 0L
        // narrow-dtype zone maps still prune under the wide read
        val postSkip = Snapshots.pruneFiles(s, tbl, "doc_id", "0", (w - 1).toString)._2.size
        val prunedOk = if (postSkip == preSkip && postSkip == 3) 1L else 0L
        // a value int could never hold
        s.sql(s"INSERT INTO $cat.t VALUES (9999999999, 7)")
        val wideOk = if (s.sql(s"SELECT max(doc_id) AS m FROM $cat.t")
          .collect().head.getLong(0) == 9999999999L) 1L else 0L
        val oldShape = s.sql(s"SELECT * FROM $cat.t VERSION AS OF 4").schema
        val oldShapeOk = if (oldShape("doc_id").dataType ==
            org.apache.spark.sql.types.IntegerType &&
          oldShape("n_chars").dataType ==
            org.apache.spark.sql.types.IntegerType) 1L else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(doc_id) AS BIGINT) AS sum_ids,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("meta_only", lit(metaOnly))
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("wide_ok", lit(wideOk))
          .withColumn("old_shape_ok", lit(oldShapeOk))
      },
      Some("""SELECT count(*) + 1 AS n_rows,
           |       CAST(sum(doc_id % 1000000000) + 9999999999 AS BIGINT) AS sum_ids,
           |       CAST(sum(n_chars) + 7 AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS meta_only,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS wide_ok,
           |       CAST(1 AS BIGINT) AS old_shape_ok
           |FROM documents""".stripMargin))

  /** x157: COLUMN DEFAULT VALUES — `ADD COLUMNS (c … DEFAULT v)` backfills
    * the whole table with ZERO rewrites (`meta_only` pins the live set
    * byte-identical): the default rides the schema stamp as the standard
    * CURRENT_DEFAULT/EXISTS_DEFAULT field metadata, Spark's parquet
    * readers fill the column in files that predate it (SPARK-38334
    * existence defaults), INSERTs omitting the column fill
    * CURRENT_DEFAULT while an explicit NULL stays NULL, and `SET
    * DEFAULT` re-points future inserts only — history keeps the frozen
    * fill (the SQL-standard CURRENT/EXISTS split). The oracle replays
    * the fills relationally over raw documents. */
  private def x157Spec: QuerySpec =
    QuerySpec("x157_sql_add_default",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_defs_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val before = Snapshots.liveFiles(s, tbl).toSet
        s.sql(s"""ALTER TABLE $cat.t ADD COLUMNS (
                 |  tier STRING DEFAULT 'bronze',
                 |  weight BIGINT DEFAULT 100)""".stripMargin)
        val metaOnly = if (Snapshots.liveFiles(s, tbl).toSet == before) 1L else 0L
        // omitted columns fill CURRENT_DEFAULT; explicit NULL stays NULL
        s.sql(s"INSERT INTO $cat.t (doc_id, n_chars) VALUES (${maxId + 1}, 11)")
        s.sql(s"INSERT INTO $cat.t VALUES (${maxId + 2}, 22, NULL, 5)")
        // SET DEFAULT re-points future inserts; history keeps 'bronze'
        s.sql(s"ALTER TABLE $cat.t ALTER COLUMN tier SET DEFAULT 'silver'")
        s.sql(s"INSERT INTO $cat.t (doc_id, n_chars) VALUES (${maxId + 3}, 33)")
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                 |CAST(sum(weight) AS BIGINT) AS sum_weight,
                 |CAST(sum(CASE WHEN tier = 'bronze' THEN 1 ELSE 0 END) AS BIGINT) AS n_bronze,
                 |CAST(sum(CASE WHEN tier = 'silver' THEN 1 ELSE 0 END) AS BIGINT) AS n_silver,
                 |CAST(sum(CASE WHEN tier IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulltier
                 |FROM $cat.t""".stripMargin)
          .withColumn("meta_only", lit(metaOnly))
      },
      Some("""SELECT count(*) + 3 AS n_rows,
           |       CAST(sum(n_chars) + 66 AS BIGINT) AS sum_chars,
           |       CAST(count(*) * 100 + 100 + 5 + 100 AS BIGINT) AS sum_weight,
           |       count(*) + 1 AS n_bronze,
           |       CAST(1 AS BIGINT) AS n_silver,
           |       CAST(1 AS BIGINT) AS n_nulltier,
           |       CAST(1 AS BIGINT) AS meta_only
           |FROM documents""".stripMargin))

  /** x158: THREE-WAY BRANCH MERGE — divergent branches merge at file
    * granularity ([[graft.io.Wap.publish]], the git model over the
    * manifest): a branch REWRITE (banded DELETE touching file 0) merges
    * cleanly into a source that itself rewrote a DISJOINT file (banded
    * DELETE on file 3) — both row-level changes land in one atomic
    * commit, files neither side touched stay byte-identical
    * (`untouched_ok`) — while a branch and source rewriting the SAME
    * base file is a detected conflict: the merge refuses loudly naming
    * the double-rewritten files and the branch's staging never leaks
    * into the source (`conflict_ok`). This upgrades x153's
    * fast-forward-or-refuse to Iceberg-style validation: refusals are
    * REAL conflicts only. The oracle replays the surviving row algebra. */
  private def x158Spec: QuerySpec =
    QuerySpec("x158_sql_branch_merge3",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_merge3_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        val h = w / 2
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val before = Snapshots.liveFiles(s, tbl).toSet
        s.sql(s"CALL $cat.system.branch('t', 'exp')")
        // branch rewrites file 0; source rewrites file 3 — disjoint
        s.sql(s"DELETE FROM $cat.t._branches.exp WHERE doc_id BETWEEN 0 AND $h")
        s.sql(s"DELETE FROM $cat.t WHERE doc_id >= ${3 * w} AND n_chars % 3 = 0")
        s.sql(s"CALL $cat.system.fast_forward('t', 'exp')")
        // files neither side touched (1 and 2) survived byte-identical
        val untouchedOk =
          if ((before intersect Snapshots.liveFiles(s, tbl).toSet).size == 2) 1L
          else 0L
        // branch and source rewriting the SAME file: detected conflict.
        // EXISTING ids from file 1's band (benchdata ids are replica-
        // shifted with gaps — synthetic positions would delete nothing
        // and dissolve the conflict, the x127 lesson)
        val b1 = docs.filter(col("doc_id") >= w && col("doc_id") < 2 * w)
          .agg(min(col("doc_id")), max(col("doc_id"))).first()
        val idA = b1.getLong(0); val idB = b1.getLong(1)
        s.sql(s"CALL $cat.system.branch('t', 'exp2')")
        s.sql(s"DELETE FROM $cat.t._branches.exp2 WHERE doc_id = $idA")
        s.sql(s"DELETE FROM $cat.t WHERE doc_id = $idB")
        val conflictOk =
          try { s.sql(s"CALL $cat.system.fast_forward('t', 'exp2')"); 0L }
          catch {
            case e: Exception if e.getMessage != null &&
              e.getMessage.contains("re-clone") => 1L
            case _: Exception => 0L
          }
        s.sql(s"CALL $cat.system.drop_branch('t', 'exp2')")
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("untouched_ok", lit(untouchedOk))
          .withColumn("conflict_ok", lit(conflictOk))
      },
      Some("""WITH p AS (SELECT max(doc_id) // 4 + 1 AS w,
           |              (max(doc_id) // 4 + 1) // 2 AS h FROM documents),
           |kept AS (
           |  SELECT doc_id, n_chars FROM documents, p
           |  WHERE NOT (doc_id BETWEEN 0 AND h)
           |    AND NOT (doc_id >= 3 * w AND n_chars % 3 = 0)
           |    AND doc_id <> (SELECT max(d2.doc_id) FROM documents d2, p
           |                   WHERE d2.doc_id >= p.w AND d2.doc_id < 2 * p.w)
           |)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS untouched_ok,
           |       CAST(1 AS BIGINT) AS conflict_ok
           |FROM kept""".stripMargin))

  /** x159: CHECK CONSTRAINTS — engine-enforced row invariants
    * ([[graft.io.Constraints]]): `ADD CONSTRAINT … CHECK` validates the
    * existing rows once (column-pruned O(table), the declaration cost
    * every engine pays) and refuses when history violates
    * (`bad_add_ok`); after that EVERY write path gates its O(change)
    * slice between data write and manifest commit — a violating INSERT
    * aborts with nothing committed (`ins_blocked_ok` pins the version
    * unchanged), a violating UPDATE likewise (`upd_blocked_ok`), clean
    * writes land, and DROP CONSTRAINT lifts the gate. Validation reads
    * back the freshly written change files in ONE aggregation pass per
    * write — the producing plan is never computed twice, cost is
    * O(change) not O(table). The oracle replays the surviving rows. */
  private def x159Spec: QuerySpec =
    QuerySpec("x159_sql_check_constraint",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_check_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        // declaring a constraint history violates refuses
        val badAdd =
          try { s.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT too_big CHECK (n_chars > 100000)"); 0L }
          catch { case e: Exception
            if e.getMessage.contains("existing rows") => 1L }
        s.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT chars_nonneg CHECK (n_chars >= 0)")
        val v0 = Snapshots.currentVersion(s, tbl)
        val insBlocked =
          try { s.sql(s"INSERT INTO $cat.t VALUES (${maxId + 1}, -1)"); 0L }
          catch { case e: Exception
            if e.getMessage.contains("chars_nonneg") &&
              Snapshots.currentVersion(s, tbl) == v0 => 1L }
        val updBlocked =
          try { s.sql(s"UPDATE $cat.t SET n_chars = -n_chars - 1 WHERE doc_id = 3"); 0L }
          catch { case e: Exception
            if e.getMessage.contains("chars_nonneg") &&
              Snapshots.currentVersion(s, tbl) == v0 => 1L }
        // clean writes land through the gate
        s.sql(s"INSERT INTO $cat.t VALUES (${maxId + 1}, 11)")
        s.sql(s"UPDATE $cat.t SET n_chars = n_chars + 1000 WHERE doc_id = 3")
        s.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT chars_nonneg")
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("bad_add_ok", lit(badAdd))
          .withColumn("ins_blocked_ok", lit(insBlocked))
          .withColumn("upd_blocked_ok", lit(updBlocked))
      },
      Some("""SELECT count(*) + 1 AS n_rows,
           |       CAST(sum(n_chars) + 11 + 1000 AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS bad_add_ok,
           |       CAST(1 AS BIGINT) AS ins_blocked_ok,
           |       CAST(1 AS BIGINT) AS upd_blocked_ok
           |FROM documents""".stripMargin))

  /** x160: IDENTITY COLUMNS — `GENERATED ALWAYS/BY DEFAULT AS IDENTITY`
    * with engine-side assignment ([[graft.sql.GraftWriteBuilder]]): ids
    * mint in the SAME plan that writes the files against a transactional
    * high watermark that advances in the SAME commit — racing writers
    * re-derive, so two inserts can never mint the same id; the contract
    * is uniqueness + direction (gaps allowed, the SQL-standard identity
    * shape), so the oracle pins the INVARIANTS: distinct count equals
    * row count (`unique_ok`), every id at/above START (`min_ok`), the
    * second batch strictly above the first (`order_ok`), and GENERATED
    * ALWAYS refusing an explicit value with nothing committed
    * (`always_ok`). */
  private def x160Spec: QuerySpec =
    QuerySpec("x160_sql_identity",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_ident_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        Tables.documents(s, d)
          .select(col("n_chars").cast("long").as("nc"))
          .createOrReplaceTempView("x160_docs")
        s.sql(s"""CREATE TABLE $cat.t (
                 |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1000),
                 |  batch STRING, n_chars BIGINT)""".stripMargin)
        s.sql(s"INSERT INTO $cat.t (batch, n_chars) SELECT 'b1', nc FROM x160_docs")
        s.sql(s"INSERT INTO $cat.t (batch, n_chars) VALUES ('b2', 1), ('b2', 2), ('b2', 3)")
        val alwaysOk =
          try { s.sql(s"INSERT INTO $cat.t VALUES (9, 'bx', 0)"); 0L }
          catch { case e: Exception
            if e.getMessage != null && e.getMessage.contains("IDENTITY") => 1L }
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                 |CAST(CASE WHEN count(DISTINCT id) = count(*) THEN 1 ELSE 0 END AS BIGINT) AS unique_ok,
                 |CAST(CASE WHEN min(id) >= 1000 THEN 1 ELSE 0 END AS BIGINT) AS min_ok,
                 |CAST(CASE WHEN (SELECT min(id) FROM $cat.t WHERE batch = 'b2') >
                 |          (SELECT max(id) FROM $cat.t WHERE batch = 'b1')
                 |     THEN 1 ELSE 0 END AS BIGINT) AS order_ok
                 |FROM $cat.t""".stripMargin)
          .withColumn("always_ok", lit(alwaysOk))
      },
      Some("""SELECT count(*) + 3 AS n_rows,
           |       CAST(sum(n_chars) + 6 AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS unique_ok,
           |       CAST(1 AS BIGINT) AS min_ok,
           |       CAST(1 AS BIGINT) AS order_ok,
           |       CAST(1 AS BIGINT) AS always_ok
           |FROM documents""".stripMargin))

  /** x161: GENERATED COLUMNS — `GENERATED ALWAYS AS (expr)` computed
    * engine-side in the SAME plan that writes the files
    * ([[graft.sql.GraftWriteBuilder.applyGenerated]], zero extra
    * passes): omitted values compute from the row, an explicit value
    * must MATCH the expression or the write fails per row with nothing
    * committed (`mismatch_ok` pins count unchanged — the Delta
    * validation shape), and downstream queries GROUP BY the generated
    * column exactly as if the user had written the expression. The
    * oracle recomputes the generated values relationally. */
  private def x161Spec: QuerySpec =
    QuerySpec("x161_sql_generated",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_gen_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("nc"))
          .createOrReplaceTempView("x161_docs")
        s.sql(s"""CREATE TABLE $cat.t (
                 |  doc_id BIGINT, n_chars BIGINT,
                 |  bucket BIGINT GENERATED ALWAYS AS (n_chars % 10),
                 |  label STRING GENERATED ALWAYS AS
                 |    (concat('b', CAST(n_chars % 10 AS STRING))))""".stripMargin)
        s.sql(s"""INSERT INTO $cat.t (doc_id, n_chars)
                 |SELECT doc_id, nc FROM x161_docs""".stripMargin)
        val n0 = s.sql(s"SELECT count(*) AS n FROM $cat.t").collect().head.getLong(0)
        val mismatchOk =
          try { s.sql(s"INSERT INTO $cat.t VALUES (-1, 13, 99, 'b3')"); 0L }
          catch { case e: Exception if e.getMessage != null =>
            val n1 = s.sql(s"SELECT count(*) AS n FROM $cat.t")
              .collect().head.getLong(0)
            if (n1 == n0) 1L else 0L }
        // a MATCHING explicit row lands
        s.sql(s"INSERT INTO $cat.t VALUES (-1, 13, 3, 'b3')")
        s.sql(s"""SELECT label, count(*) AS n_docs,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t GROUP BY label""".stripMargin)
          .withColumn("mismatch_ok", lit(mismatchOk))
          .orderBy("label")
      },
      Some("""WITH t AS (
           |  SELECT n_chars FROM documents
           |  UNION ALL SELECT 13
           |)
           |SELECT 'b' || CAST(n_chars % 10 AS VARCHAR) AS label,
           |       count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS mismatch_ok
           |FROM t GROUP BY 1 ORDER BY 1""".stripMargin))

  /** x162: DROP TABLE — the lifecycle's missing end: deletes the table
    * tree (the SQL contract), REFUSING while other consumers still share
    * its files — a live branch (`branch_guard_ok`) or an outstanding WAP
    * clone must merge, publish or drop first, otherwise they would
    * dangle on deleted data. After the guards clear, the drop lands, the
    * name is immediately reusable (`recreate_ok` pins a fresh table
    * under the old name serving only its own rows), and a dropped name
    * resolves as missing, not as ghost-data (`gone_ok`). The oracle
    * replays the surviving second-generation relation. */
  private def x162Spec: QuerySpec =
    QuerySpec("x162_sql_drop_table",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_drop_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("nc"))
          .createOrReplaceTempView("x162_docs")
        s.sql(s"CREATE TABLE $cat.t (doc_id BIGINT, n_chars BIGINT)")
        s.sql(s"INSERT INTO $cat.t SELECT doc_id, nc FROM x162_docs")
        s.sql(s"CALL $cat.system.branch('t', 'exp')")
        val branchGuard =
          try { s.sql(s"DROP TABLE $cat.t"); 0L }
          catch { case e: Exception
            if e.getMessage != null && e.getMessage.contains("branch") => 1L }
        s.sql(s"CALL $cat.system.drop_branch('t', 'exp')")
        s.sql(s"DROP TABLE $cat.t")
        val goneOk =
          try { s.sql(s"SELECT count(*) FROM $cat.t").collect(); 0L }
          catch { case _: Exception => 1L }
        // the name is immediately reusable for a FRESH table
        s.sql(s"CREATE TABLE $cat.t (doc_id BIGINT, n_chars BIGINT)")
        s.sql(s"INSERT INTO $cat.t SELECT doc_id, nc FROM x162_docs WHERE nc % 2 = 0")
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("branch_guard_ok", lit(branchGuard))
          .withColumn("gone_ok", lit(goneOk))
      },
      Some("""SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS branch_guard_ok,
           |       CAST(1 AS BIGINT) AS gone_ok
           |FROM documents WHERE n_chars % 2 = 0""".stripMargin))

  /** x163: ANALYZE → COST-BASED OPTIMIZATION ([[graft.io.ColStats]]) —
    * `CALL analyze('t', 'cols')` records per-column NDV (one HLL
    * aggregation pass, never a distinct shuffle per column), null count
    * and length moments as transactional properties; the scan reports
    * them through DSv2 `columnStats()`, so with `spark.sql.cbo.enabled`
    * the optimizer's attribute stats carry real NDVs (`cbo_ok` pins
    * distinctCount present in the optimized plan) — the input join
    * reordering needs at 100 TB. `ndv_ok` pins the sketch within 10% of
    * the exact count; results never depend on stats. */
  private def x163Spec: QuerySpec =
    QuerySpec("x163_sql_analyze",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_analyze_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("nc"))
          .createOrReplaceTempView("x163_docs")
        s.sql(s"CREATE TABLE $cat.t (doc_id BIGINT, source STRING, n_chars BIGINT)")
        s.sql(s"INSERT INTO $cat.t SELECT * FROM x163_docs")
        s.sql(s"CALL $cat.system.analyze('t', 'doc_id,source')")
        val exactSrc = s.sql(s"SELECT count(DISTINCT source) AS n FROM $cat.t")
          .collect().head.getLong(0)
        val st = graft.io.ColStats.of(s, s"$tmp/t")
        val ndvOk = if (math.abs(st("source")._1 - exactSrc) <=
          math.max(1L, exactSrc / 10)) 1L else 0L
        s.conf.set("spark.sql.cbo.enabled", "true")
        val cboOk = try {
          val stats = s.sql(s"SELECT doc_id, source FROM $cat.t")
            .queryExecution.optimizedPlan.stats.attributeStats
          if (stats.toSeq.exists { case (a, cs) =>
            a.name == "source" && cs.distinctCount.isDefined }) 1L else 0L
        } finally s.conf.set("spark.sql.cbo.enabled", "false")
        s.sql(s"""SELECT count(*) AS n_rows,
                 |count(DISTINCT source) AS n_sources,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("ndv_ok", lit(ndvOk))
          .withColumn("cbo_ok", lit(cboOk))
      },
      Some("""SELECT count(*) AS n_rows,
           |       count(DISTINCT source) AS n_sources,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS ndv_ok,
           |       CAST(1 AS BIGINT) AS cbo_ok
           |FROM documents""".stripMargin))

  /** x164: PREDICATE OVERWRITE ([[graft.io.Snapshots.replaceWhere]], the
    * Delta `replaceWhere` / Iceberg overwrite-filter shape through
    * `df.writeTo(t).overwrite(cond)`) — the backfill primitive:
    * recompute one band and swap it in as ONE transactional commit
    * (`one_commit_ok`); zone maps prune candidate files so the three
    * files outside the band never rewrite (`pruned_ok`); data leaking
    * OUTSIDE the predicate refuses with nothing committed (`leak_ok` —
    * a leaking backfill would double rows on the next run); time travel
    * below the replace serves the old slice. The oracle replays the
    * band swap relationally. */
  private def x164Spec: QuerySpec =
    QuerySpec("x164_sql_replace_where",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_rw_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val before = Snapshots.liveFiles(s, tbl).toSet
        val v0 = Snapshots.currentVersion(s, tbl)
        // the backfill: band 0..w-1 recomputes with doubled n_chars
        docs.filter(col("doc_id") < w)
          .select(col("doc_id"), (col("n_chars") * 2).as("n_chars"))
          .writeTo(s"$cat.t")
          .overwrite(col("doc_id") >= 0 && col("doc_id") <= w - 1)
        val oneCommit = if (Snapshots.currentVersion(s, tbl) == v0 + 1) 1L else 0L
        val prunedOk =
          if ((before intersect Snapshots.liveFiles(s, tbl).toSet).size == 3) 1L
          else 0L
        val leakOk =
          try {
            docs.limit(1)
              .select((col("doc_id") + maxId + 100).as("doc_id"), col("n_chars"))
              .writeTo(s"$cat.t").overwrite(col("doc_id") <= 5)
            0L
          } catch { case e: Exception
            if e.getMessage != null && e.getMessage.contains("OUTSIDE") &&
              Snapshots.currentVersion(s, tbl) == v0 + 1 => 1L }
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("one_commit_ok", lit(oneCommit))
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("leak_ok", lit(leakOk))
      },
      Some("""WITH w AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(CASE WHEN doc_id < w THEN n_chars * 2
           |                     ELSE n_chars END) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS one_commit_ok,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS leak_ok
           |FROM documents, w""".stripMargin))

  /** st31: STREAMING DECONTAMINATION GATE ([[graft.streaming
    * .DecontamGate]]) — eval-set admission control at ingest: documents
    * stream in three micro-batches, any doc sharing ≥2 5-gram
    * occurrences with the STATIC benchmark corpus (docs with doc_id %
    * 37 == 0) drops at the gate, keepers append with their overlap
    * signal. The benchmark gram universe builds once and persists
    * (broadcast per batch — O(batch grams) each, no state store); the
    * stateless verdicts make crash replay idempotent. The oracle
    * replays the gram join and the admission rule over the batch
    * table. */
  private def st31Spec: QuerySpec =
    QuerySpec("st31_stream_decontam_gate",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val src = Staging.slicedSource("decong", d) { tmp =>
          (0 until 3).foreach { r =>
            Staging.writeSlice(docs.filter(col("doc_id") % 3 === r),
              s"$tmp/src/slice$r")
          }
          Seq("slice0", "slice1", "slice2")
        }
        val bench = Tables.documents(s, d).filter(col("doc_id") % 37 === 0)
        val tmp = java.nio.file.Files.createTempDirectory("graft_decong_run").toString
        Staging.drainTuning(s, src, 3) {
          val q = graft.streaming.DecontamGate.start(s,
            s.readStream
              .schema(org.apache.spark.sql.types.StructType.fromDDL(
                "doc_id BIGINT, text STRING"))
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(s"$src/src"),
            bench, col("text"),
            outDir = s"$tmp/out", checkpoint = s"$tmp/ckpt",
            k = 5, minHits = 2)
          q.awaitTermination()
        }
        s.read.option("recursiveFileLookup", "true").parquet(s"$tmp/out")
          .select(col("doc_id"), col("bench_hits"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS t
           |       FROM documents),
           |g AS (SELECT doc_id, list_transform(range(1, len(t) - 3),
           |        i -> array_to_string(t[i:i+4], ' ')) AS g
           |      FROM t),
           |be AS (SELECT DISTINCT unnest(g) AS gram FROM g WHERE doc_id % 37 = 0),
           |tg AS (SELECT doc_id, unnest(g) AS gram FROM g),
           |h AS (SELECT tg.doc_id, count(*) AS bench_hits
           |      FROM tg JOIN be ON tg.gram = be.gram GROUP BY 1)
           |SELECT t.doc_id, CAST(coalesce(h.bench_hits, 0) AS BIGINT) AS bench_hits
           |FROM t LEFT JOIN h USING (doc_id)
           |WHERE coalesce(h.bench_hits, 0) < 2
           |ORDER BY doc_id""".stripMargin))

  /** x165: MERGE WITH SCHEMA EVOLUTION — the CDC day-one wall after
    * conditioned clauses (x150): the source gained a column, and the
    * star merge evolves the table in place ([[graft.sql
    * .GraftMergeCommand]] → [[graft.io.Snapshots.addColumns]]): the new
    * column lands as one nullable metadata commit with the ADD COLUMNS
    * resurrection guards, existing untouched rows read it as NULL (zero
    * rewrites of history), matched and inserted rows carry the source
    * values, and `AS OF` below the evolution serves the old shape
    * (`old_shape_ok`). The oracle replays the upsert + evolution
    * relationally. */
  private def x165Spec: QuerySpec =
    QuerySpec("x165_sql_merge_evolve",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_mevo_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val v0 = Snapshots.currentVersion(s, tbl)
        // the evolved CDC batch: every third doc updated with a new
        // `lang` column, plus one brand-new row
        docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), (col("n_chars") + 1).as("n_chars"),
            concat(lit("l"), (col("doc_id") % 4).cast("string")).as("lang"))
          .unionByName(s.range(1).select((lit(maxId) + 1).as("doc_id"),
            lit(7L).as("n_chars"), lit("new").as("lang")))
          .createOrReplaceTempView("x165_src")
        s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t t USING x165_src s
                 |ON t.doc_id = s.doc_id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        val oldShapeOk =
          if (s.sql(s"SELECT * FROM $cat.t VERSION AS OF $v0").columns.toSeq ==
            Seq("doc_id", "n_chars")) 1L else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                 |CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulllang,
                 |CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
                 |FROM $cat.t""".stripMargin)
          .withColumn("old_shape_ok", lit(oldShapeOk))
      },
      Some("""SELECT count(*) + 1 AS n_rows,
           |       CAST(sum(CASE WHEN doc_id % 3 = 0 THEN n_chars + 1
           |                     ELSE n_chars END) + 7 AS BIGINT) AS sum_chars,
           |       CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END)
           |            AS BIGINT) AS n_nulllang,
           |       CAST((SELECT count(DISTINCT doc_id % 4) FROM documents
           |             WHERE doc_id % 3 = 0) + 1 AS BIGINT) AS n_langs,
           |       CAST(1 AS BIGINT) AS old_shape_ok
           |FROM documents""".stripMargin))

  /** x166: CORPUS-CURATION E2E — the round's features composed as the
    * pipeline a training-data user actually runs, end to end in one
    * query: quality gate (token floor) → benchmark decontamination
    * (5-gram overlap vs the doc_id%37 eval set — [[graft.ext
    * .Contamination]]) → exact dedup (md5, first-id wins) → INSERT into
    * a governed snapshot table (IDENTITY sequence numbers mint
    * engine-side; a CHECK constraint guards the token floor at the
    * storage layer — `blocked_ok` pins a violating insert aborting with
    * nothing committed) → greedy 512-token packing of the admitted set
    * ([[graft.ext.Packing.packGreedy]]). The oracle replays the whole
    * admission algebra plus the packing accumulator relationally. */
  private def x166Spec: QuerySpec =
    QuerySpec("x166_corpus_e2e",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_e2e_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
        // 1. quality gate: token floor
        val quality = docs.filter(col("n_tokens") >= 20)
        // 2. decontamination vs the eval slice (>= 2 shared 5-grams drops)
        val bench = docs.filter(col("doc_id") % 37 === 0)
        val bad = graft.ext.Contamination.contaminatedDocs(
            quality, col("doc_id"), col("text"), bench, col("text"), k = 5)
          .filter(col("n_grams") >= 2).select(col("id").as("__bad"))
        val clean = quality.join(bad, col("doc_id") === col("__bad"), "left_anti")
        // 3. exact dedup: first doc_id per md5(text)
        val deduped = clean
          .withColumn("__rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
          .filter(col("__rk") === 1).drop("__rk")
        deduped.select(col("doc_id"), col("n_tokens"))
          .createOrReplaceTempView("x166_admitted")
        // 4. the governed corpus table: identity sequence + CHECK floor
        s.sql(s"""CREATE TABLE $cat.corpus (
                 |  seq BIGINT GENERATED ALWAYS AS IDENTITY,
                 |  doc_id BIGINT, n_tokens BIGINT)""".stripMargin)
        s.sql(s"ALTER TABLE $cat.corpus ADD CONSTRAINT tok_floor CHECK (n_tokens >= 20)")
        s.sql(s"""INSERT INTO $cat.corpus (doc_id, n_tokens)
                 |SELECT doc_id, n_tokens FROM x166_admitted""".stripMargin)
        val blockedOk =
          try { s.sql(s"INSERT INTO $cat.corpus (doc_id, n_tokens) VALUES (-1, 3)"); 0L }
          catch { case e: Exception
            if e.getMessage != null && e.getMessage.contains("tok_floor") => 1L }
        // 5. greedy packing of the admitted set
        val bins = graft.ext.Packing.packGreedy(
            s.table(s"$cat.corpus"), col("doc_id"), col("n_tokens"),
            capacity = 512L, shards = 32)
          .select((col("shard") * 10000000L + col("bin")).as("gbin"))
          .agg(count_distinct(col("gbin")).as("n_bins")).first().getLong(0)
        s.sql(s"""SELECT count(*) AS n_docs,
                 |CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                 |CAST(CASE WHEN count(DISTINCT seq) = count(*)
                 |          THEN 1 ELSE 0 END AS BIGINT) AS seq_unique_ok
                 |FROM $cat.corpus""".stripMargin)
          .withColumn("n_bins", lit(bins))
          .withColumn("blocked_ok", lit(blockedOk))
      },
      Some("""WITH RECURSIVE d AS (
           |  SELECT doc_id, text,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           |  FROM documents),
           |q AS (SELECT * FROM d WHERE n_tokens >= 20),
           |tq AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM q),
           |g AS (SELECT doc_id, list_transform(range(1, len(t) - 3),
           |        i -> array_to_string(t[i:i+4], ' ')) AS g
           |      FROM tq),
           |tb AS (SELECT doc_id, string_split(lower(text), ' ') AS t
           |       FROM d WHERE doc_id % 37 = 0),
           |gb AS (SELECT DISTINCT unnest(list_transform(range(1, len(t) - 3),
           |         i -> array_to_string(t[i:i+4], ' '))) AS gram FROM tb),
           |th AS (SELECT doc_id, unnest(g) AS gram FROM g),
           |hit AS (SELECT th.doc_id, count(DISTINCT th.gram) AS n
           |        FROM th JOIN gb ON th.gram = gb.gram GROUP BY 1),
           |clean AS (SELECT q.* FROM q LEFT JOIN hit USING (doc_id)
           |          WHERE coalesce(hit.n, 0) < 2),
           |dedup AS (SELECT * FROM clean
           |          QUALIFY row_number() OVER (PARTITION BY md5(text)
           |                                     ORDER BY doc_id) = 1),
           |adm AS (SELECT doc_id, n_tokens, doc_id % 32 AS shard FROM dedup),
           |r AS (SELECT shard, doc_id, n_tokens,
           |        row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           |      FROM adm),
           |p AS (
           |  SELECT shard, doc_id, n_tokens, rn, CAST(0 AS BIGINT) AS bin,
           |         n_tokens AS acc
           |  FROM r WHERE rn = 1
           |  UNION ALL
           |  SELECT r.shard, r.doc_id, r.n_tokens, r.rn,
           |         CASE WHEN p.acc > 0 AND p.acc + r.n_tokens > 512
           |              THEN p.bin + 1 ELSE p.bin END,
           |         CASE WHEN p.acc > 0 AND p.acc + r.n_tokens > 512
           |              THEN r.n_tokens ELSE p.acc + r.n_tokens END
           |  FROM p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
           |SELECT (SELECT count(*) FROM dedup) AS n_docs,
           |       (SELECT CAST(sum(n_tokens) AS BIGINT) FROM dedup) AS sum_tokens,
           |       CAST(1 AS BIGINT) AS seq_unique_ok,
           |       (SELECT count(DISTINCT shard * 10000000 + bin) FROM p) AS n_bins,
           |       CAST(1 AS BIGINT) AS blocked_ok""".stripMargin))

  /** x167: SCALAR SUBQUERIES IN DML — `UPDATE … SET c = (SELECT …)` and
    * `WHERE c > (SELECT …)` with uncorrelated scalars: each evaluates
    * ONCE at run time (SQL's statement-snapshot contract, reused across
    * optimistic retries) and substitutes as a typed literal, so the
    * mutation itself keeps the full zone-map prune + match-checked CoW
    * discipline (`pruned_ok` pins files outside the scalar-derived band
    * untouched — the bound comes from the SUBSTITUTED literal). An empty
    * scalar yields NULL → UNKNOWN → no rows mutate (`noop_ok`). The
    * oracle replays the scalars relationally. */
  private def x167Spec: QuerySpec =
    QuerySpec("x167_sql_dml_scalar",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_scalar_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        docs.createOrReplaceTempView("x167_docs")
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val tbl = s"$tmp/t"
        val w = maxId / 4 + 1
        (0 until 4).foreach { i =>
          Snapshots.commitAppend(
            docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
            tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
            recordRowCounts = true)
        }
        val before = Snapshots.liveFiles(s, tbl).toSet
        // the scalar drives the band: min(doc_id)+half-width
        s.sql(s"""UPDATE $cat.t
                 |SET n_chars = n_chars + (SELECT max(n_chars) FROM x167_docs)
                 |WHERE doc_id <= (SELECT min(doc_id) + ${w / 2} FROM x167_docs)"""
          .stripMargin)
        val prunedOk =
          if ((before intersect Snapshots.liveFiles(s, tbl).toSet).size == 3) 1L
          else 0L
        // DELETE with a scalar threshold
        s.sql(s"""DELETE FROM $cat.t
                 |WHERE n_chars > (SELECT max(n_chars) FROM x167_docs)""".stripMargin)
        // empty scalar: UNKNOWN predicate, provable no-op
        val v0 = Snapshots.currentVersion(s, tbl)
        s.sql(s"""DELETE FROM $cat.t
                 |WHERE n_chars > (SELECT n_chars FROM x167_docs WHERE 1 = 0)"""
          .stripMargin)
        val noopOk = if (Snapshots.currentVersion(s, tbl) == v0) 1L else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("noop_ok", lit(noopOk))
      },
      Some("""WITH p AS (SELECT (max(doc_id) // 4 + 1) // 2 AS hw,
           |              min(doc_id) AS lo, max(n_chars) AS mx FROM documents),
           |upd AS (
           |  SELECT doc_id,
           |         n_chars + CASE WHEN doc_id <= lo + hw THEN mx ELSE 0 END
           |           AS n_chars
           |  FROM documents, p
           |),
           |kept AS (SELECT upd.* FROM upd, p WHERE NOT (upd.n_chars > p.mx))
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS noop_ok
           |FROM kept""".stripMargin))

  /** Stage a 4-file graft catalog table of (doc_id, source, n_chars) from
    * `documents`, zone-mapped on doc_id — the shared fixture of the SQL
    * DML extension queries. Returns (catalog name, table path, maxId). */
  private def dmlFixture(s: SparkSession, d: String, view: String)
      : (String, String, Long) = {
    import graft.io.Snapshots
    val tmp = java.nio.file.Files.createTempDirectory("graft_dml_run").toString
    val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
    docs.createOrReplaceTempView(view)
    val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
    val tbl = s"$tmp/t"
    val w = maxId / 4 + 1
    (0 until 4).foreach { i =>
      Snapshots.commitAppend(
        docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
        tbl, recordSchema = i == 0, statsCols = Seq("doc_id"),
        recordRowCounts = true)
    }
    (cat, tbl, maxId)
  }

  /** x168: MULTI-SUBQUERY CONJUNCTS IN ONE DML WHERE — `DELETE … WHERE k
    * IN (SELECT …) AND NOT EXISTS (…) AND band` and the UPDATE twin with
    * `IN … AND NOT IN …` compose as ONE [[graft.io.Snapshots.mutateKeyed]]
    * gate chain: each conjunct is its own distributed key-set join (semi
    * or anti), the plain band still zone-map-prunes candidate files
    * (`pruned_ok`), and one commit lands per statement. NOT IN's
    * three-valued rule survives composition: a NULL in its subquery makes
    * the conjunct never TRUE, so the whole ANDed statement is a provable
    * no-op (`noop_ok`). Oracle replays the algebra relationally. */
  private def x168Spec: QuerySpec =
    QuerySpec("x168_sql_dml_multi",
      (s, d) => {
        import graft.io.Snapshots
        val (cat, tbl, maxId) = dmlFixture(s, d, "x168_docs")
        val half = maxId / 2
        val before = Snapshots.liveFiles(s, tbl).toSet
        // semi AND anti AND band in one statement: delete banded rows with
        // n_chars % 5 = 0 unless their doc carries source 'src1'
        s.sql(s"""DELETE FROM $cat.t
                 |WHERE doc_id IN (SELECT doc_id FROM x168_docs WHERE n_chars % 5 = 0)
                 |  AND NOT EXISTS (SELECT 1 FROM x168_docs d2
                 |                  WHERE d2.doc_id = t.doc_id AND d2.source = 'src1')
                 |  AND doc_id BETWEEN 0 AND $half""".stripMargin)
        val prunedOk =
          if ((before intersect Snapshots.liveFiles(s, tbl).toSet).size >= 1) 1L
          else 0L
        // IN + NOT IN composed in the UPDATE twin
        s.sql(s"""UPDATE $cat.t SET n_chars = n_chars + 100000
                 |WHERE doc_id IN (SELECT doc_id FROM x168_docs WHERE source = 'src2')
                 |  AND doc_id NOT IN (SELECT doc_id FROM x168_docs WHERE n_chars % 3 = 0)"""
          .stripMargin)
        // NOT IN null-voiding survives composition: provable no-op
        val v0 = Snapshots.currentVersion(s, tbl)
        s.sql(s"""DELETE FROM $cat.t
                 |WHERE doc_id IN (SELECT doc_id FROM x168_docs)
                 |  AND doc_id NOT IN (SELECT CASE WHEN n_chars % 2 = 0 THEN NULL
                 |                            ELSE doc_id END FROM x168_docs)"""
          .stripMargin)
        val noopOk = if (Snapshots.currentVersion(s, tbl) == v0) 1L else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("noop_ok", lit(noopOk))
      },
      Some("""WITH half AS (SELECT max(doc_id) // 2 AS h FROM documents),
           |kept AS (
           |  SELECT * FROM documents, half
           |  WHERE NOT (n_chars % 5 = 0
           |             AND NOT EXISTS (SELECT 1 FROM documents d2
           |                             WHERE d2.doc_id = documents.doc_id
           |                               AND d2.source = 'src1')
           |             AND doc_id BETWEEN 0 AND h)
           |),
           |upd AS (
           |  SELECT doc_id,
           |         n_chars + CASE WHEN source = 'src2'
           |                         AND NOT (n_chars % 3 = 0)
           |                        THEN 100000 ELSE 0 END AS n_chars
           |  FROM kept
           |)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS noop_ok
           |FROM upd""".stripMargin))

  /** x169: CORRELATED SCALAR SUBQUERIES IN UPDATE SET — `SET v = (SELECT
    * agg FROM s WHERE s.k = t.k)` decorrelates into a per-key aggregate
    * left-joined in as a [[graft.io.Snapshots.EnrichGate]] (the standard
    * enrichment update, one distributed join, never per-row re-execution).
    * SQL's empty-group semantics hold by CONSTRUCTION: the aggregate
    * evaluates once over an empty input to learn its unmatched-key value
    * — NULL for max (`nulls_after` pins rows that got it), 0 for count
    * (the classic COUNT bug, `zeros_after`) — and the >1-row-per-key
    * error of the non-aggregate form is enforced (`err_ok`). DuckDB
    * replays the correlated scalars natively. */
  private def x169Spec: QuerySpec =
    QuerySpec("x169_sql_dml_corr_scalar",
      (s, d) => {
        val (cat, tbl, maxId) = dmlFixture(s, d, "x169_docs")
        val half = maxId / 2
        // per-source filtered max; sources with no qualifying doc → NULL
        s.sql("""SELECT source AS src, n_chars AS nc FROM x169_docs""")
          .createOrReplaceTempView("x169_side")
        s.sql(s"""UPDATE $cat.t
                 |SET n_chars = (SELECT max(nc) FROM x169_side s
                 |               WHERE s.src = source AND s.nc % 7 = 0)
                 |WHERE doc_id <= $half""".stripMargin)
        val nullsAfter = s.sql(
          s"SELECT count(*) AS n FROM $cat.t WHERE n_chars IS NULL").first().getLong(0)
        // count form: unmatched keys get 0, not NULL
        s.sql(s"""UPDATE $cat.t
                 |SET n_chars = (SELECT count(*) FROM x169_side s
                 |               WHERE s.src = source AND s.nc > 900)
                 |WHERE doc_id > $half""".stripMargin)
        val zerosAfter = s.sql(
          s"SELECT count(*) AS n FROM $cat.t WHERE doc_id > $half AND n_chars = 0")
          .first().getLong(0)
        // the non-aggregate form errors when a correlation key has >1 row
        val errOk =
          try {
            s.sql(s"""UPDATE $cat.t
                     |SET n_chars = (SELECT nc FROM x169_side s WHERE s.src = source)
                     |WHERE doc_id <= 2""".stripMargin)
            0L
          } catch { case e: Exception
              if e.getMessage != null && e.getMessage.contains("more than one row") => 1L }
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("nulls_after", lit(nullsAfter))
          .withColumn("zeros_after", lit(zerosAfter))
          .withColumn("err_ok", lit(errOk))
      },
      Some("""WITH half AS (SELECT max(doc_id) // 2 AS h FROM documents),
           |u1 AS (
           |  SELECT doc_id, source,
           |         CASE WHEN doc_id <= h THEN
           |           (SELECT max(d2.n_chars) FROM documents d2
           |            WHERE d2.source = documents.source AND d2.n_chars % 7 = 0)
           |         ELSE n_chars END AS n_chars
           |  FROM documents, half
           |),
           |nulls_after AS (SELECT count(*) AS n FROM u1 WHERE n_chars IS NULL),
           |u2 AS (
           |  SELECT u1.doc_id,
           |         CASE WHEN u1.doc_id > h THEN
           |           (SELECT count(*) FROM documents d2
           |            WHERE d2.source = u1.source AND d2.n_chars > 900)
           |         ELSE u1.n_chars END AS n_chars
           |  FROM u1, half
           |),
           |zeros_after AS (
           |  SELECT count(*) AS n FROM u2, half
           |  WHERE u2.doc_id > h AND u2.n_chars = 0)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(u2.n_chars) AS BIGINT) AS sum_chars,
           |       CAST(nulls_after.n AS BIGINT) AS nulls_after,
           |       CAST(zeros_after.n AS BIGINT) AS zeros_after,
           |       CAST(1 AS BIGINT) AS err_ok
           |FROM u2, nulls_after, zeros_after
           |GROUP BY nulls_after.n, zeros_after.n""".stripMargin))

  /** x170: LOGICAL VIEWS (`CREATE [OR REPLACE] VIEW` / `DROP VIEW`) —
    * view text + schema stored as catalog metadata
    * ([[graft.sql.GraftCatalog]]'s ViewCatalog surface), reads expand the
    * text late-bound ([[graft.sql.GraftViewReadRule]]): after a DELETE on
    * the base table the view serves the new state while `VERSION AS OF`
    * reads of the table underneath are unaffected (`asof_ok`). Name
    * collisions with tables refuse both ways (`collision_ok`), DML
    * against a view refuses loudly (`dml_refused_ok`), and CREATE OR
    * REPLACE swaps the definition the next read sees. The oracle replays
    * the final view query relationally. */
  private def x170Spec: QuerySpec =
    QuerySpec("x170_sql_views",
      (s, d) => {
        import graft.io.Snapshots
        val (cat, tbl, _) = dmlFixture(s, d, "x170_docs")
        s.sql(s"""CREATE VIEW $cat.v AS
                 |SELECT source, count(*) AS n_docs,
                 |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t GROUP BY source""".stripMargin)
        val v0 = Snapshots.currentVersion(s, tbl)
        val before = s.sql(s"SELECT CAST(sum(sum_chars) AS BIGINT) FROM $cat.v")
          .first().getLong(0)
        // mutate the base: the view must re-read (late binding), AS OF of
        // the base table must not
        s.sql(s"DELETE FROM $cat.t WHERE n_chars % 2 = 1")
        val asofOk = if (s.sql(
            s"SELECT CAST(sum(n_chars) AS BIGINT) FROM $cat.t VERSION AS OF $v0")
          .first().getLong(0) == before) 1L else 0L
        val collisionOk =
          try { s.sql(s"CREATE VIEW $cat.t AS SELECT 1 AS one"); 0L }
          catch { case e: Exception
              if e.getMessage.contains("already exists") => 1L }
        val dmlRefusedOk =
          try { s.sql(s"DELETE FROM $cat.v WHERE n_docs = 0"); 0L }
          catch { case e: Exception if e.getMessage.contains("VIEW") => 1L }
        s.sql(s"""CREATE OR REPLACE VIEW $cat.v AS
                 |SELECT source, count(*) AS n_docs,
                 |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t WHERE n_chars % 3 = 0 GROUP BY source"""
          .stripMargin)
        s.sql(s"SELECT source, n_docs, sum_chars FROM $cat.v ORDER BY source")
          .withColumn("asof_ok", lit(asofOk))
          .withColumn("collision_ok", lit(collisionOk))
          .withColumn("dml_refused_ok", lit(dmlRefusedOk))
      },
      Some("""SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS asof_ok,
           |       CAST(1 AS BIGINT) AS collision_ok,
           |       CAST(1 AS BIGINT) AS dml_refused_ok
           |FROM documents
           |WHERE NOT (n_chars % 2 = 1) AND n_chars % 3 = 0
           |GROUP BY source ORDER BY source""".stripMargin))

  /** x171: STAGED-SUBQUERY DML FALLBACK — the shapes with no keyed
    * decomposition (tuple `NOT IN` with its per-column null mixing,
    * subqueries under `OR`) auto-materialize: each uncorrelated subquery
    * stages once ([[graft.sql.GraftDmlStagedCommand]]) and the FULL
    * predicate evaluates in place inside the candidate reads. Tuple
    * IN/NOT IN rewrites into its exact three-valued null-pattern
    * expansion of equi ExistenceJoins (GraftStager.decompose) — Spark's
    * native planning of a multi-column null-aware anti join is a
    * BroadcastNestedLoopJoin, a measured 51× cliff at 10× data
    * (ProbeStaged: 790 s → 5.9 s at sf10). The plain band conjunct
    * still prunes candidate files (`pruned_ok`); a NULL inside the
    * tuple subquery makes every potentially-matching comparison
    * UNKNOWN → provable no-op (`noop_ok`). Oracle replays tuple NOT IN
    * as its null-free NOT EXISTS equivalent. */
  private def x171Spec: QuerySpec =
    QuerySpec("x171_sql_dml_staged",
      (s, d) => {
        import graft.io.Snapshots
        val (cat, tbl, maxId) = dmlFixture(s, d, "x171_docs")
        val half = maxId / 2
        val before = Snapshots.liveFiles(s, tbl).toSet
        // tuple NOT IN + band: banded rows whose (source, n_chars) pair is
        // not among the even-length pairs delete (data is null-free, so
        // the NOT EXISTS replay below is exact)
        s.sql(s"""DELETE FROM $cat.t
                 |WHERE (source, n_chars) NOT IN
                 |      (SELECT source, n_chars FROM x171_docs WHERE n_chars % 2 = 0)
                 |  AND doc_id <= $half""".stripMargin)
        val prunedOk =
          if ((before intersect Snapshots.liveFiles(s, tbl).toSet).size >= 1) 1L
          else 0L
        // OR-nested subquery conjunct in the UPDATE twin
        s.sql(s"""UPDATE $cat.t SET n_chars = n_chars + 50000
                 |WHERE doc_id IN (SELECT doc_id FROM x171_docs WHERE source = 'src3')
                 |   OR doc_id > ${maxId - 5}""".stripMargin)
        // a NULL inside the tuple subquery: every row that could match is
        // UNKNOWN, definite non-matches are FALSE → nothing deletes
        val v0 = Snapshots.currentVersion(s, tbl)
        s.sql(s"""DELETE FROM $cat.t
                 |WHERE (doc_id, n_chars) NOT IN
                 |      (SELECT doc_id, NULL FROM x171_docs)""".stripMargin)
        val noopOk = if (Snapshots.currentVersion(s, tbl) == v0) 1L else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("noop_ok", lit(noopOk))
      },
      Some("""WITH half AS (SELECT max(doc_id) // 2 AS h FROM documents),
           |kept AS (
           |  SELECT * FROM documents, half
           |  WHERE NOT (doc_id <= h
           |             AND NOT EXISTS (SELECT 1 FROM documents d2
           |                             WHERE d2.n_chars % 2 = 0
           |                               AND d2.source = documents.source
           |                               AND d2.n_chars = documents.n_chars))
           |),
           |mx AS (SELECT max(doc_id) AS m FROM documents),
           |upd AS (
           |  SELECT doc_id,
           |         n_chars + CASE WHEN source = 'src3' OR doc_id > m - 5
           |                        THEN 50000 ELSE 0 END AS n_chars
           |  FROM kept, mx
           |)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS noop_ok
           |FROM upd""".stripMargin))

  /** x172: EQUI-HEIGHT HISTOGRAMS FOR THE CBO ([[graft.io.ColStats]],
    * `CALL analyze(t, cols, histogram_bins)`) — NDV-uniform estimation
    * prices every value of a skewed column identically (a 95/5 band
    * column: each band "is" 5%), so the optimizer can't tell a rare-band
    * probe from a hot-band scan. `histogram_bins > 1` records per-numeric-
    * column equi-height histograms (one percentile_approx sweep + one
    * range-conditioned HLL pass — two aggregations total, O(rows), no
    * shuffle-per-bin) that ride as transactional properties and feed
    * Spark's own `FilterEstimation` through the DSv2 scan's
    * `columnStats().histogram()`. Pins: `range_ok` — ANALYZE records true
    * numeric min/max (without a range, Catalyst prices EVERY equality as
    * out-of-range = 0 rows, worse than no stats); `hist_ok` — 64 bins
    * recorded; `skew_ok` — under CBO the rare band's row estimate drops
    * ≥3× below the NDV-uniform estimate while the hot band's rises above
    * it; `acc_ok` — the rare-band estimate lands within 3× of the true
    * count. At 100 TB this is the difference between broadcasting a
    * rare-slice probe side and shuffle-joining 5% of the corpus on a
    * uniform guess. Results never depend on stats — the returned
    * aggregates replay relationally in the oracle. */
  private def x172Spec: QuerySpec =
    QuerySpec("x172_sql_histogram",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_hist_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        // skewed band from doc_id: ~95% band 0, bands 1..19 share the rest
        val docs = Tables.documents(s, d).select(col("doc_id"),
          when(pmod(col("doc_id"), lit(20)) =!= 19, lit(0L))
            .otherwise(floor(pmod(col("doc_id"), lit(380)) / 20) + 1)
            .cast("long").as("band"),
          col("n_chars").cast("long").as("n_chars"))
        Snapshots.commitAppend(docs.repartition(2), s"$tmp/t",
          recordSchema = true, recordRowCounts = true)
        def estRows(band: Long): BigInt = {
          val p = s.sql(s"SELECT doc_id FROM $cat.t WHERE band = $band")
            .queryExecution.optimizedPlan
          p.collect {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
              f.stats.rowCount.getOrElse(BigInt(-1))
          }.headOption.getOrElse(BigInt(-1))
        }
        val trueRare = docs.filter(col("band") === 19).count()
        val cboPrev = s.conf.get("spark.sql.cbo.enabled")
        val (rangeOk, histOk, skewOk, accOk) = try {
          s.conf.set("spark.sql.cbo.enabled", "true")
          // NDV-only: min/max must be recorded or the estimate is 0 rows
          s.sql(s"CALL $cat.system.analyze('t', 'doc_id,band,n_chars')")
          val r = graft.io.ColStats.rangeOf(s, s"$tmp/t")
          val rangeOk =
            if (r.get("band").contains((0.0, 19.0)) && estRows(19) > 0) 1L
            else 0L
          val estU = estRows(19) // NDV-uniform: every band prices the same
          s.sql(s"CALL $cat.system.analyze('t', 'doc_id,band,n_chars', 64)")
          val h = graft.io.ColStats.histOf(s, s"$tmp/t")
          val histOk =
            if (h.get("band").exists(_._2.size == 64)) 1L else 0L
          val (estRare, estHot) = (estRows(19), estRows(0))
          val skewOk =
            if (estU > 0 && estRare * 3 <= estU && estHot > estU) 1L else 0L
          val accOk =
            if (estRare <= trueRare * 3 && estRare * 3 >= trueRare) 1L
            else 0L
          (rangeOk, histOk, skewOk, accOk)
        } finally s.conf.set("spark.sql.cbo.enabled", cboPrev)
        s.sql(s"""SELECT count(*) AS n_rows,
                 |count(DISTINCT band) AS n_bands,
                 |CAST(sum(CASE WHEN band = 19 THEN 1 ELSE 0 END) AS BIGINT)
                 |  AS n_rare,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("range_ok", lit(rangeOk))
          .withColumn("hist_ok", lit(histOk))
          .withColumn("skew_ok", lit(skewOk))
          .withColumn("acc_ok", lit(accOk))
      },
      Some("""WITH b AS (
           |  SELECT CASE WHEN doc_id % 20 <> 19 THEN 0
           |              ELSE (doc_id % 380) // 20 + 1 END AS band,
           |         n_chars
           |  FROM documents)
           |SELECT count(*) AS n_rows,
           |       count(DISTINCT band) AS n_bands,
           |       CAST(sum(CASE WHEN band = 19 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_rare,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS range_ok,
           |       CAST(1 AS BIGINT) AS hist_ok,
           |       CAST(1 AS BIGINT) AS skew_ok,
           |       CAST(1 AS BIGINT) AS acc_ok
           |FROM b""".stripMargin))

  /** st32: STREAMING WRITE-AUDIT-PUBLISH ([[graft.streaming
    * .SnapshotSinkProvider]] `.option("branch", …)` composed with
    * [[graft.io.Branches]]) — the audit-then-publish discipline for
    * streaming ingest: each drain lands its micro-batches in a WAP
    * branch forked lazily from the table's current version, the MAIN
    * table stays byte-for-byte untouched while the drain runs and is
    * audited (`frozen_ok` pins version AND content), reads of the branch
    * head go through `VERSION AS OF '<branch>'` (`audit_ok`), and
    * `CALL fast_forward` publishes the whole drain as ONE atomic commit
    * (`publish_atomic` pins exactly +1 version; the branch closes,
    * `closed_ok`). Crash-restart mid-drain resumes on the live branch
    * with no duplicates — checkpoint offsets plus the branch's own
    * batch-dir ledger (`resume_ok`). The NEXT drain on the same
    * checkpoint re-forks from the just-published state automatically and
    * publishes its own increment (`refork_ok`) — fork→ingest→audit→
    * publish per drain, no code between cycles. Oracle: the per-source
    * rollup of all documents. */
  private def st32Spec: QuerySpec =
    QuerySpec("st32_stream_branch_wap",
      (s, d) => {
        import graft.io.{Branches, Snapshots}
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val w = maxId / 4 + 1
        def part(i: Int) =
          docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w)
        val tmp = java.nio.file.Files.createTempDirectory("graft_stwap_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val tbl = s"$tmp/t"
        // part 0 is the table's pre-existing production content
        Snapshots.commitAppend(part(0).coalesce(1), tbl, recordSchema = true,
          statsCols = Seq("doc_id"), recordRowCounts = true)
        val p0 = part(0).count()
        def arrive(i: Int): Unit = {
          part(i).coalesce(1).write.parquet(s"$tmp/src/s$i")
          new java.io.File(s"$tmp/src/s$i").listFiles()
            .foreach(_.setLastModified(1700000000000L + i * 60000L))
        }
        val schema = docs.schema
        def drain(): Unit = {
          val q = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
            .parquet(s"$tmp/src")
            .writeStream.format("graft.streaming.SnapshotSinkProvider")
            .option("table", tbl).option("branch", "ingest")
            .option("checkpointLocation", s"$tmp/ckpt")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        def mainCount() =
          s.sql(s"SELECT count(*) FROM $cat.t").collect().head.getLong(0)
        def branchCount() =
          s.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 'ingest'")
            .collect().head.getLong(0)
        val vMain = Snapshots.currentVersion(s, tbl)
        arrive(1); drain()
        // "crash" between the two file arrivals: the second drain is a
        // restart on the same checkpoint — offsets + the branch's batch
        // ledger resume with no duplicates
        arrive(2); drain()
        val resumeOk =
          if (branchCount() == part(0).unionAll(part(1)).unionAll(part(2)).count())
            1L else 0L
        val frozenOk = if (Snapshots.currentVersion(s, tbl) == vMain &&
          mainCount() == p0) 1L else 0L
        val auditOk = if (branchCount() > mainCount()) 1L else 0L
        s.sql(s"CALL $cat.system.fast_forward('t', 'ingest')")
        val publishAtomic =
          if (Snapshots.currentVersion(s, tbl) == vMain + 1 &&
            mainCount() == part(0).unionAll(part(1)).unionAll(part(2)).count())
            1L else 0L
        val closedOk = if (Branches.list(s, tbl).isEmpty) 1L else 0L
        // next cycle: same checkpoint, new files — the sink re-forks from
        // the published state and the second publish lands the increment
        arrive(3); drain()
        val vPub1 = Snapshots.currentVersion(s, tbl)
        val reforkFrozen = if (mainCount() ==
          part(0).unionAll(part(1)).unionAll(part(2)).count()) 1L else 0L
        s.sql(s"CALL $cat.system.fast_forward('t', 'ingest')")
        val reforkOk = if (reforkFrozen == 1L &&
          Snapshots.currentVersion(s, tbl) == vPub1 + 1) 1L else 0L
        s.sql(s"""SELECT source, count(*) AS n_docs,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t GROUP BY source""".stripMargin)
          .withColumn("frozen_ok", lit(frozenOk))
          .withColumn("resume_ok", lit(resumeOk))
          .withColumn("audit_ok", lit(auditOk))
          .withColumn("publish_atomic", lit(publishAtomic))
          .withColumn("closed_ok", lit(closedOk))
          .withColumn("refork_ok", lit(reforkOk))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS frozen_ok,
           |       CAST(1 AS BIGINT) AS resume_ok,
           |       CAST(1 AS BIGINT) AS audit_ok,
           |       CAST(1 AS BIGINT) AS publish_atomic,
           |       CAST(1 AS BIGINT) AS closed_ok,
           |       CAST(1 AS BIGINT) AS refork_ok
           |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  /** x173: SQL-SURFACE E2E CAPSTONE — the x166 curation workflow driven
    * PURELY through SQL, regression-pinning the whole catalog in one
    * query: `CREATE TABLE` with a column DEFAULT (omitted on seed
    * INSERT, `default_ok`) → engine-enforced `CHECK` constraint →
    * `CREATE VIEW` over the table → `CALL branch` fork → `MERGE INTO`
    * the BRANCH (update + insert arms) → `DELETE` on the branch with a
    * subquery conjunct ANDed to a plain band (the round's composed-DML
    * path) → the CHECK gate holding ON THE FORK (`blocked_ok` — clones
    * carry constraints) → main frozen through all of it (`frozen_ok`) →
    * `CALL fast_forward` publish as ONE commit (`publish_atomic`) → the
    * late-bound view serving the published state (`view_ok`) → `CALL
    * analyze(…, 32)` → CBO attribute stats carrying NDV + min/max + the
    * equi-height histogram (`cbo_ok`). The oracle replays the MERGE and
    * DELETE algebra relationally. */
  private def x173Spec: QuerySpec =
    QuerySpec("x173_sql_e2e",
      (s, d) => {
        import graft.io.{Branches, Snapshots}
        val tmp = java.nio.file.Files.createTempDirectory("graft_sqle2e_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
          .createOrReplaceTempView("x173_docs")
        s.sql(s"""CREATE TABLE $cat.corpus (doc_id BIGINT, source STRING,
                 |n_chars BIGINT, lang STRING DEFAULT 'und')""".stripMargin)
        s.sql(s"ALTER TABLE $cat.corpus ADD CONSTRAINT chars_pos CHECK (n_chars >= 0)")
        s.sql(s"""CREATE VIEW $cat.rollup AS
                 |SELECT source, count(*) AS n_docs,
                 |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.corpus GROUP BY source""".stripMargin)
        // seed omits lang — the DEFAULT fills it
        s.sql(s"""INSERT INTO $cat.corpus (doc_id, source, n_chars)
                 |SELECT * FROM x173_docs WHERE doc_id % 3 = 0""".stripMargin)
        val seedN = s.sql(s"SELECT count(*) FROM $cat.corpus").collect().head.getLong(0)
        val defaultOk = if (s.sql(
          s"SELECT count(*) FROM $cat.corpus WHERE lang = 'und'")
          .collect().head.getLong(0) == seedN) 1L else 0L
        val tbl = s"$tmp/corpus"
        val v0 = Snapshots.currentVersion(s, tbl)
        // curation happens on a branch; main serves reads untouched
        s.sql(s"CALL $cat.system.branch('corpus', 'cur')")
        s.sql(s"""MERGE INTO $cat.corpus._branches.cur t
                 |USING (SELECT * FROM x173_docs WHERE doc_id % 3 <= 1) u
                 |ON t.doc_id = u.doc_id
                 |WHEN MATCHED THEN UPDATE SET n_chars = u.n_chars + 1000
                 |WHEN NOT MATCHED THEN INSERT (doc_id, source, n_chars, lang)
                 |  VALUES (u.doc_id, u.source, u.n_chars, 'new')""".stripMargin)
        s.sql(s"""DELETE FROM $cat.corpus._branches.cur
                 |WHERE doc_id IN (SELECT doc_id FROM x173_docs WHERE source = 'src5')
                 |  AND doc_id % 2 = 0""".stripMargin)
        // the CHECK gate travels with the fork
        val blockedOk =
          try { s.sql(s"""INSERT INTO $cat.corpus._branches.cur
                         |(doc_id, source, n_chars) VALUES (-1, 'x', -5)"""
                  .stripMargin); 0L }
          catch { case e: Exception
            if e.getMessage != null && e.getMessage.contains("chars_pos") => 1L }
        val frozenOk = if (Snapshots.currentVersion(s, tbl) == v0 &&
          s.sql(s"SELECT count(*) FROM $cat.corpus").collect().head.getLong(0)
            == seedN) 1L else 0L
        s.sql(s"CALL $cat.system.fast_forward('corpus', 'cur')")
        val publishAtomic = if (Snapshots.currentVersion(s, tbl) == v0 + 1 &&
          Branches.list(s, tbl).isEmpty) 1L else 0L
        // the view is late-bound: it serves the published state
        val viewN = s.sql(s"SELECT CAST(sum(n_docs) AS BIGINT) FROM $cat.rollup")
          .collect().head.getLong(0)
        val directN = s.sql(s"SELECT count(*) FROM $cat.corpus")
          .collect().head.getLong(0)
        val viewOk = if (viewN == directN && directN != seedN) 1L else 0L
        // stats for the optimizer: NDV + min/max + equi-height histogram
        s.sql(s"CALL $cat.system.analyze('corpus', 'doc_id,n_chars', 32)")
        val cboPrev = s.conf.get("spark.sql.cbo.enabled")
        val cboOk = try {
          s.conf.set("spark.sql.cbo.enabled", "true")
          val as = s.sql(s"SELECT doc_id, n_chars FROM $cat.corpus")
            .queryExecution.optimizedPlan.stats.attributeStats
          if (as.toSeq.exists { case (a, cs) => a.name == "n_chars" &&
            cs.distinctCount.isDefined && cs.min.isDefined &&
            cs.histogram.isDefined }) 1L else 0L
        } finally s.conf.set("spark.sql.cbo.enabled", cboPrev)
        s.sql(s"SELECT * FROM $cat.rollup")
          .withColumn("default_ok", lit(defaultOk))
          .withColumn("blocked_ok", lit(blockedOk))
          .withColumn("frozen_ok", lit(frozenOk))
          .withColumn("publish_atomic", lit(publishAtomic))
          .withColumn("view_ok", lit(viewOk))
          .withColumn("cbo_ok", lit(cboOk))
          .orderBy("source")
      },
      Some("""WITH seed AS (SELECT doc_id, source, n_chars FROM documents
           |              WHERE doc_id % 3 = 0),
           |u AS (SELECT doc_id, source, n_chars FROM documents
           |      WHERE doc_id % 3 <= 1),
           |merged AS (
           |  SELECT s.doc_id, s.source, u.n_chars + 1000 AS n_chars
           |  FROM seed s JOIN u ON s.doc_id = u.doc_id
           |  UNION ALL
           |  SELECT s.doc_id, s.source, s.n_chars FROM seed s
           |  WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.doc_id = s.doc_id)
           |  UNION ALL
           |  SELECT u.doc_id, u.source, u.n_chars FROM u
           |  WHERE NOT EXISTS (SELECT 1 FROM seed s WHERE s.doc_id = u.doc_id)),
           |final AS (
           |  SELECT * FROM merged
           |  WHERE NOT (doc_id IN (SELECT doc_id FROM documents
           |                        WHERE source = 'src5')
           |             AND doc_id % 2 = 0))
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS default_ok,
           |       CAST(1 AS BIGINT) AS blocked_ok,
           |       CAST(1 AS BIGINT) AS frozen_ok,
           |       CAST(1 AS BIGINT) AS publish_atomic,
           |       CAST(1 AS BIGINT) AS view_ok,
           |       CAST(1 AS BIGINT) AS cbo_ok
           |FROM final GROUP BY source ORDER BY source""".stripMargin))

  /** x174: MERGE `WHEN NOT MATCHED BY SOURCE` SWEEPS — the Delta-parity
    * target-side arm of an incremental sync ([[graft.io.Snapshots
    * .mergeIntoWhen]] `bySource`): live target rows with NO source match
    * take the first applicable BY SOURCE clause (conditioned DELETE /
    * UPDATE referencing target columns only — the match gate inverted in
    * the same left-outer rewrite, one transactional commit per
    * statement, `one_commit_ok`). Detection is one dv-resolved anti-join
    * pass over live files (key ABSENCE has no zone-map bound) but only
    * files holding a CLAIMED row rewrite — a narrow sweep leaves the
    * other files byte-identical (`pruned_ok`); a NULL condition claims
    * nothing (three-valued, `noop_ok`). First-applicable ordering across
    * the DELETE-then-UPDATE clause list is replayed relationally by the
    * oracle. */
  private def x174Spec: QuerySpec =
    QuerySpec("x174_sql_merge_by_source",
      (s, d) => {
        import graft.io.Snapshots
        val (cat, tbl, maxId) = dmlFixture(s, d, "x174_docs")
        val w = maxId / 4 + 1
        val before = Snapshots.liveFiles(s, tbl).toSet
        // narrow sweep: claims only top-band rows — the three other
        // files hold unmatched rows but no claimed ones, never rewrite
        s.sql(s"""MERGE INTO $cat.t t
                 |USING (SELECT * FROM x174_docs WHERE doc_id < $w) u
                 |ON t.doc_id = u.doc_id
                 |WHEN NOT MATCHED BY SOURCE
                 |  AND t.doc_id >= ${3 * w} AND t.doc_id % 5 = 0
                 |THEN DELETE""".stripMargin)
        val prunedOk =
          if ((before intersect Snapshots.liveFiles(s, tbl).toSet).size == 3) 1L
          else 0L
        // the full sweep algebra: matched update + BY SOURCE delete +
        // BY SOURCE update, first-applicable
        val v0 = Snapshots.currentVersion(s, tbl)
        s.sql(s"""MERGE INTO $cat.t t
                 |USING (SELECT * FROM x174_docs WHERE doc_id % 3 = 0) u
                 |ON t.doc_id = u.doc_id
                 |WHEN MATCHED THEN UPDATE SET n_chars = u.n_chars + 1000
                 |WHEN NOT MATCHED BY SOURCE AND t.source = 'src7' THEN DELETE
                 |WHEN NOT MATCHED BY SOURCE AND t.n_chars % 2 = 0
                 |  THEN UPDATE SET n_chars = t.n_chars + 7""".stripMargin)
        val oneCommitOk =
          if (Snapshots.currentVersion(s, tbl) == v0 + 1) 1L else 0L
        // NULL BY SOURCE condition: provable no-op, nothing commits
        val v1 = Snapshots.currentVersion(s, tbl)
        s.sql(s"""MERGE INTO $cat.t t USING x174_docs u
                 |ON t.doc_id = u.doc_id
                 |WHEN NOT MATCHED BY SOURCE AND t.n_chars > t.n_chars + NULL
                 |THEN DELETE""".stripMargin)
        val noopOk = if (Snapshots.currentVersion(s, tbl) == v1) 1L else 0L
        s.sql(s"""SELECT source, count(*) AS n_docs,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t GROUP BY source""".stripMargin)
          .withColumn("pruned_ok", lit(prunedOk))
          .withColumn("one_commit_ok", lit(oneCommitOk))
          .withColumn("noop_ok", lit(noopOk))
          .orderBy("source")
      },
      Some("""WITH wv AS (SELECT max(doc_id) // 4 + 1 AS w FROM documents),
           |a AS (SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
           |      FROM documents d, wv
           |      WHERE NOT (d.doc_id >= 3 * wv.w AND d.doc_id % 5 = 0)),
           |b AS (SELECT doc_id, source,
           |             CASE WHEN doc_id % 3 = 0 THEN n_chars + 1000
           |                  WHEN n_chars % 2 = 0 THEN n_chars + 7
           |                  ELSE n_chars END AS n_chars
           |      FROM a
           |      WHERE NOT (doc_id % 3 <> 0 AND source = 'src7'))
           |SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS pruned_ok,
           |       CAST(1 AS BIGINT) AS one_commit_ok,
           |       CAST(1 AS BIGINT) AS noop_ok
           |FROM b GROUP BY source ORDER BY source""".stripMargin))

  /** x175: MERGE INTO GOVERNED TABLES (IDENTITY + GENERATED through the
    * clause algebra — [[graft.io.Snapshots.mergeIntoWhen]] governed
    * fill): the CDC upsert a production corpus table actually takes.
    * Insert arms MINT identity values against the transactional high
    * watermark (advanced in the SAME commit — `mint_above_ok` pins every
    * new seq strictly above the pre-merge max, `seq_unique_ok` pins
    * global uniqueness) and COMPUTE generated columns; update arms keep
    * the row's identity (`kept_seq_ok`) and RECOMPUTE generated columns
    * from the row's new values (the Delta semantic — `gen_ok` pins
    * n2 = n_chars * 2 over every row after the merge, including the
    * updated ones); assigning a governed column in an update arm, or an
    * explicit value to an ALWAYS identity in an insert arm, refuses with
    * nothing committed (`blocked_ok`). The oracle replays the upsert
    * algebra relationally. */
  private def x175Spec: QuerySpec =
    QuerySpec("x175_sql_merge_governed",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_gov_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
          .createOrReplaceTempView("x175_docs")
        s.sql(s"""CREATE TABLE $cat.corpus (
                 |  seq BIGINT GENERATED ALWAYS AS IDENTITY,
                 |  doc_id BIGINT, n_chars BIGINT,
                 |  n2 BIGINT GENERATED ALWAYS AS (n_chars * 2))""".stripMargin)
        s.sql(s"""INSERT INTO $cat.corpus (doc_id, n_chars)
                 |SELECT * FROM x175_docs WHERE doc_id % 3 = 0""".stripMargin)
        val pre = s.sql(s"SELECT doc_id, seq FROM $cat.corpus")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val preMax = pre.values.max
        s.sql(s"""MERGE INTO $cat.corpus t
                 |USING (SELECT * FROM x175_docs WHERE doc_id % 3 <= 1) u
                 |ON t.doc_id = u.doc_id
                 |WHEN MATCHED THEN UPDATE SET n_chars = u.n_chars + 1000
                 |WHEN NOT MATCHED THEN INSERT (doc_id, n_chars)
                 |  VALUES (u.doc_id, u.n_chars)""".stripMargin)
        val post = s.sql(s"SELECT doc_id, seq FROM $cat.corpus")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val seqUniqueOk =
          if (post.values.toSeq.distinct.size == post.size) 1L else 0L
        val keptOk = if (pre.forall { case (k, sq) => post(k) == sq }) 1L else 0L
        val mintAboveOk =
          if (post.filterNot(kv => pre.contains(kv._1)).values
            .forall(_ > preMax)) 1L else 0L
        val genOk = if (s.sql(
          s"SELECT count(*) FROM $cat.corpus WHERE n2 <> n_chars * 2")
          .first().getLong(0) == 0L) 1L else 0L
        val tbl = s"$tmp/corpus"
        val v0 = Snapshots.currentVersion(s, tbl)
        val b1 =
          try { s.sql(s"""MERGE INTO $cat.corpus t USING x175_docs u
                         |ON t.doc_id = u.doc_id
                         |WHEN MATCHED THEN UPDATE SET seq = 0""".stripMargin); 0L }
          catch { case e: Exception
            if e.getMessage != null && e.getMessage.contains("governed") => 1L }
        val b2 =
          try { s.sql(s"""MERGE INTO $cat.corpus t
                         |USING (SELECT CAST(-1 AS BIGINT) AS doc_id,
                         |              CAST(1 AS BIGINT) AS n_chars) u
                         |ON t.doc_id = u.doc_id
                         |WHEN NOT MATCHED THEN INSERT (seq, doc_id, n_chars)
                         |  VALUES (0, u.doc_id, u.n_chars)""".stripMargin); 0L }
          catch { case e: Exception
            if e.getMessage != null &&
              e.getMessage.contains("GENERATED ALWAYS") => 1L }
        val blockedOk =
          if (b1 == 1L && b2 == 1L && Snapshots.currentVersion(s, tbl) == v0) 1L
          else 0L
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                 |CAST(sum(n2) AS BIGINT) AS sum_n2
                 |FROM $cat.corpus""".stripMargin)
          .withColumn("seq_unique_ok", lit(seqUniqueOk))
          .withColumn("kept_seq_ok", lit(keptOk))
          .withColumn("mint_above_ok", lit(mintAboveOk))
          .withColumn("gen_ok", lit(genOk))
          .withColumn("blocked_ok", lit(blockedOk))
      },
      Some("""WITH seed AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
           |              FROM documents WHERE doc_id % 3 = 0),
           |u AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
           |      FROM documents WHERE doc_id % 3 <= 1),
           |m AS (
           |  SELECT s.doc_id, COALESCE(u.n_chars + 1000, s.n_chars) AS n_chars
           |  FROM seed s LEFT JOIN u ON s.doc_id = u.doc_id
           |  UNION ALL
           |  SELECT doc_id, n_chars FROM u WHERE doc_id % 3 = 1)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(sum(n_chars * 2) AS BIGINT) AS sum_n2,
           |       CAST(1 AS BIGINT) AS seq_unique_ok,
           |       CAST(1 AS BIGINT) AS kept_seq_ok,
           |       CAST(1 AS BIGINT) AS mint_above_ok,
           |       CAST(1 AS BIGINT) AS gen_ok,
           |       CAST(1 AS BIGINT) AS blocked_ok
           |FROM m""".stripMargin))

  /** x176: MULTI-TABLE DML — `UPDATE t SET … FROM s WHERE …` and
    * `DELETE FROM t USING s WHERE …` (the Postgres/Delta join-DML
    * surface; Spark's grammar has neither). [[graft.sql.GraftJoinDml]]
    * desugars each into a matched-only merge and
    * [[graft.sql.GraftDmlRule]] decomposes the mixed equality+residual
    * condition onto ONE [[graft.io.Snapshots.mutateKeyed]] gate chain:
    * the cross-name key equality is a compound-key semi join,
    * source-only residuals pre-filter the source, target-only residuals
    * gate per-row and zone-map-prune candidate files, and every source
    * column the SET reads joins in as an enrich gate whose key-uniqueness
    * check enforces the Delta multi-match rule (`err_ok` pins the
    * ambiguous-source error; a multi-match feeding no SET is harmless).
    * Oracle replays both statements relationally. */
  private def x176Spec: QuerySpec =
    QuerySpec("x176_sql_dml_join",
      (s, d) => {
        val (cat, tbl, maxId) = dmlFixture(s, d, "x176_docs")
        val half = maxId / 2
        // the side source: the documents' own (key, value, tag) triple
        s.sql("SELECT doc_id AS k, n_chars AS v, source AS src FROM x176_docs")
          .createOrReplaceTempView("x176_side")
        // UPDATE … FROM: cross-name key + source residual + target band
        s.sql(s"""UPDATE $cat.t SET n_chars = n_chars + s.v
                 |FROM x176_side s
                 |WHERE doc_id = s.k AND s.src = 'src1' AND doc_id <= $half"""
          .stripMargin)
        // DELETE … USING: source residual + target band
        s.sql(s"""DELETE FROM $cat.t USING x176_side s
                 |WHERE doc_id = s.k AND s.v % 7 = 0 AND doc_id > $half"""
          .stripMargin)
        // ambiguous source match (two source rows feed one SET) errors
        s.sql("""SELECT * FROM x176_side UNION ALL SELECT * FROM x176_side""")
          .createOrReplaceTempView("x176_dup")
        val errOk =
          try {
            s.sql(s"UPDATE $cat.t SET n_chars = d.v FROM x176_dup d WHERE doc_id = d.k")
            0L
          } catch { case e: Exception
              if e.getMessage != null &&
                e.getMessage.contains("ambiguous source match") => 1L }
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
          .withColumn("err_ok", lit(errOk))
      },
      Some("""WITH half AS (SELECT max(doc_id) // 2 AS h FROM documents),
           |u1 AS (
           |  SELECT doc_id, n_chars +
           |           CASE WHEN source = 'src1' AND doc_id <= h
           |                THEN n_chars ELSE 0 END AS n_chars,
           |         n_chars AS orig, h
           |  FROM documents, half
           |),
           |kept AS (
           |  SELECT * FROM u1
           |  WHERE NOT (orig % 7 = 0 AND doc_id > h)
           |)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS err_ok
           |FROM kept""".stripMargin))

  /** x177: HISTOGRAM-FED JOIN CARDINALITY — the skewed-key join whose
    * OUTPUT estimate (not just its filter selectivity) prices from the
    * recorded equi-height histograms: Spark's `JoinEstimation` switches
    * from the NDV-uniform formula to per-bin overlap arithmetic when both
    * join attributes carry histograms, and this engine's scans feed them
    * through DSv2 `columnStats().histogram()` ([[graft.sql.GraftScan]]).
    * The fixture joins a 95/5-skewed band fact against a rare-bands dim:
    * NDV-uniform prices the join output as rows×rows/ndv (19× over
    * truth, `ndv_over_ok`), the histogram prices the rare bands at their
    * real share (`hist_est_ok`), and the broadcast threshold is
    * SELF-CALIBRATED between the two output-size estimates so the
    * downstream join against the full fact provably flips: NDV stats →
    * one broadcast (the tiny dim only, `ndv_plan_ok`), histogram stats →
    * two (the join RESULT now fits under the threshold,
    * `hist_plan_ok`). This is the 100 TB decision: whether a skew-probe
    * join's result re-shuffles the big table or rides a broadcast.
    * Oracle replays the data result relationally; estimates never change
    * results (`n_rows`/`sum_chars` identical under both regimes). */
  private def x177Spec: QuerySpec =
    QuerySpec("x177_sql_join_hist",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_jh_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        // fact: documents with a deterministic 95/5-skewed band (95% band
        // 0; bands 1..19 share the rest) — DuckDB re-derives it exactly
        val fact = Tables.documents(s, d).select(
          col("doc_id"),
          when(pmod(col("doc_id"), lit(20)) =!= 19, lit(0L))
            .otherwise(floor(pmod(col("doc_id"), lit(380)) / 20) + 1)
            .cast("long").as("band"),
          col("n_chars").cast("long").as("n_chars"))
        Snapshots.commitAppend(fact.repartition(4), s"$tmp/fact",
          recordSchema = true, recordRowCounts = true)
        Snapshots.commitAppend(
          fact.filter(col("band") >= 10).select(col("band")).distinct().coalesce(1),
          s"$tmp/rdim", recordSchema = true, recordRowCounts = true)
        val trueJ = fact.filter(col("band") >= 10).count()
        val inner = s"""SELECT f.doc_id, f.n_chars
                       |FROM $cat.fact f JOIN $cat.rdim d ON f.band = d.band"""
          .stripMargin
        val full = s"""SELECT count(*) AS n_rows,
                      |CAST(sum(e.n_chars) AS BIGINT) AS sum_chars
                      |FROM ($inner) j JOIN $cat.fact e ON j.doc_id = e.doc_id"""
          .stripMargin
        def jStats(): (BigInt, BigInt) = {
          val st = s.sql(inner).queryExecution.optimizedPlan.stats
          (st.rowCount.getOrElse(BigInt(-1)), st.sizeInBytes)
        }
        def nBcast(): Int =
          "BroadcastHashJoin".r.findAllIn(
            s.sql(full).queryExecution.executedPlan.toString).length
        val cboPrev = s.conf.get("spark.sql.cbo.enabled")
        val thrPrev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        val (flags, res) =
          try {
            s.conf.set("spark.sql.cbo.enabled", "true")
            // NDV-only stats first: the uniform formula way over-prices
            s.sql(s"CALL $cat.system.analyze('fact', 'band,n_chars')")
            s.sql(s"CALL $cat.system.analyze('rdim', 'band')")
            val (estNdv, sizeNdv) = jStats()
            val ndvOverOk = if (estNdv >= BigInt(3) * trueJ) 1L else 0L
            // threshold between the two regimes' output sizes: the NDV
            // estimate must keep the join result OVER it
            s.conf.set("spark.sql.autoBroadcastJoinThreshold",
              (sizeNdv / 4).toString)
            val ndvPlanOk = if (nBcast() == 1) 1L else 0L
            // histograms: the join output prices at the rare bands' share
            s.sql(s"CALL $cat.system.analyze('fact', 'band,n_chars', 64)")
            s.sql(s"CALL $cat.system.analyze('rdim', 'band', 64)")
            val (estHist, sizeHist) = jStats()
            val histEstOk =
              if (estHist >= BigInt(1) && estHist <= BigInt(4) * trueJ &&
                BigInt(3) * estHist <= estNdv) 1L else 0L
            val histPlanOk =
              if (sizeHist * 4 <= sizeNdv && nBcast() == 2) 1L else 0L
            ((ndvOverOk, ndvPlanOk, histEstOk, histPlanOk), s.sql(full))
          } finally {
            s.conf.set("spark.sql.cbo.enabled", cboPrev)
            s.conf.set("spark.sql.autoBroadcastJoinThreshold", thrPrev)
          }
        res
          .withColumn("ndv_over_ok", lit(flags._1))
          .withColumn("ndv_plan_ok", lit(flags._2))
          .withColumn("hist_est_ok", lit(flags._3))
          .withColumn("hist_plan_ok", lit(flags._4))
      },
      Some("""WITH fact AS (
           |  SELECT doc_id,
           |         CASE WHEN doc_id % 20 <> 19 THEN 0
           |              ELSE doc_id % 380 // 20 + 1 END AS band,
           |         CAST(n_chars AS BIGINT) AS n_chars
           |  FROM documents
           |),
           |rdim AS (SELECT DISTINCT band FROM fact WHERE band >= 10)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(e.n_chars) AS BIGINT) AS sum_chars,
           |       CAST(1 AS BIGINT) AS ndv_over_ok,
           |       CAST(1 AS BIGINT) AS ndv_plan_ok,
           |       CAST(1 AS BIGINT) AS hist_est_ok,
           |       CAST(1 AS BIGINT) AS hist_plan_ok
           |FROM fact f JOIN rdim d ON f.band = d.band
           |JOIN fact e ON f.doc_id = e.doc_id""".stripMargin))

  /** x178: RANGE-CORRELATED EXISTS IN DML — `DELETE … WHERE EXISTS
    * (SELECT 1 FROM iv WHERE t.k BETWEEN iv.lo AND iv.hi)` and the
    * NOT-EXISTS UPDATE twin. Non-equality correlation has no keyed
    * rewrite, so the statement routes through the staged fallback with a
    * TRANSPLANT ([[graft.sql.GraftStager]]): the subquery's uncorrelated
    * child checkpoints once (statement-snapshot, reused across retries),
    * the outer references un-resolve to bare column names, and the
    * library's candidate reads re-analyze the EXISTS — Spark re-binds
    * the names and plans the membership test itself. Outer names a
    * subquery column would shadow refuse (capture hazard). Oracle
    * replays both correlated subqueries natively in DuckDB. */
  private def x178Spec: QuerySpec =
    QuerySpec("x178_sql_dml_range_exists",
      (s, d) => {
        val (cat, tbl, maxId) = dmlFixture(s, d, "x178_docs")
        val m = maxId + 1
        // BOUNDED interval set (~50 at any scale): the transplanted
        // EXISTS plans as a nested-loop join over candidates × intervals,
        // so the probe list must stay O(1) in the data — the realistic
        // blocklist shape. An interval set growing with the table would
        // make the statement quadratic by construction.
        val div = math.max(97L, maxId / 50)
        s.sql(s"""SELECT doc_id * 7 % $m AS lo, doc_id * 7 % $m + 40 AS hi
                 |FROM x178_docs WHERE doc_id % $div = 0""".stripMargin)
          .createOrReplaceTempView("x178_iv")
        s.sql(s"""DELETE FROM $cat.t t
                 |WHERE EXISTS (SELECT 1 FROM x178_iv v
                 |              WHERE t.doc_id BETWEEN v.lo AND v.hi)"""
          .stripMargin)
        s.sql(s"""UPDATE $cat.t t SET n_chars = n_chars + 1000
                 |WHERE NOT EXISTS (SELECT 1 FROM x178_iv v
                 |                  WHERE t.n_chars BETWEEN v.lo AND v.hi)
                 |  AND doc_id <= ${maxId / 2}""".stripMargin)
        s.sql(s"""SELECT count(*) AS n_rows,
                 |CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 |FROM $cat.t""".stripMargin)
      },
      Some("""WITH m AS (SELECT max(doc_id) + 1 AS mm,
           |                    greatest(97, (max(doc_id)) // 50) AS dv
           |             FROM documents),
           |iv AS (
           |  SELECT doc_id * 7 % mm AS lo, doc_id * 7 % mm + 40 AS hi
           |  FROM documents, m WHERE doc_id % dv = 0
           |),
           |kept AS (
           |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM documents t
           |  WHERE NOT EXISTS (SELECT 1 FROM iv
           |                    WHERE t.doc_id BETWEEN iv.lo AND iv.hi)
           |),
           |u AS (
           |  SELECT doc_id,
           |         n_chars + CASE WHEN doc_id <= (SELECT (mm - 1) // 2 FROM m)
           |                         AND NOT EXISTS (SELECT 1 FROM iv
           |                           WHERE kept.n_chars BETWEEN iv.lo AND iv.hi)
           |                        THEN 1000 ELSE 0 END AS n_chars
           |  FROM kept
           |)
           |SELECT count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM u""".stripMargin))

  /** x179: AUTO-REFRESH MATERIALIZED VIEW — `create_mv(…, auto_refresh
    * => 'true')` records `mv.auto`, and every READ of the view folds any
    * unapplied source versions first ([[graft.sql.GraftCatalog]]
    * freshness-on-read): two SQL DML mutations land on the source and
    * the view is simply SELECTed — no `refresh_mv` call anywhere — yet
    * the aggregate observes both. Deferred maintenance is the 100 TB
    * posture: work runs when someone reads (amortized by the
    * exactly-once note ledger — a fresh view costs one metadata check),
    * never per source commit. Oracle replays the mutations and the
    * GROUP BY relationally. */
  private def x179Spec: QuerySpec =
    QuerySpec("x179_sql_mv_auto",
      (s, d) => {
        import graft.io.Snapshots
        val tmp = java.nio.file.Files.createTempDirectory("graft_mva_run").toString
        val cat = s"graft_${tmp.hashCode.toHexString.takeRight(8)}"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root", tmp)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            col("n_chars").cast("long").as("n_chars"))
        Snapshots.commitAppend(docs.repartition(2), s"$tmp/src",
          recordSchema = true, statsCols = Seq("doc_id"),
          recordRowCounts = true)
        s.sql(s"""CALL $cat.system.create_mv('mv', 'src', 'doc_id',
                 |'source', 'n_chars', '', '', 'true')""".stripMargin)
        s.sql(s"DELETE FROM $cat.src WHERE doc_id % 3 = 0")
        s.sql(s"UPDATE $cat.src SET n_chars = n_chars + 10 WHERE doc_id % 5 = 0")
        // NO refresh_mv: the read itself catches the view up; reading
        // again must not move the view's version (fresh = metadata check)
        val out = s.sql(s"""SELECT source, n_rows,
                           |CAST(sum_n_chars AS BIGINT) AS sum_n_chars
                           |FROM $cat.mv ORDER BY source""".stripMargin)
        out.collect()
        val v0 = Snapshots.currentVersion(s, s"$tmp/mv")
        s.sql(s"SELECT count(*) FROM $cat.mv").collect()
        val freshOk = if (Snapshots.currentVersion(s, s"$tmp/mv") == v0) 1L else 0L
        out.withColumn("fresh_ok", lit(freshOk))
      },
      Some("""WITH m AS (
           |  SELECT source,
           |         CAST(n_chars AS BIGINT) +
           |           CASE WHEN doc_id % 5 = 0 THEN 10 ELSE 0 END AS n_chars
           |  FROM documents WHERE doc_id % 3 <> 0
           |)
           |SELECT source, count(*) AS n_rows,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
           |       CAST(1 AS BIGINT) AS fresh_ok
           |FROM m GROUP BY source ORDER BY source""".stripMargin))
}
