package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM subword tokenizer (the SentencePiece family) — the second
  * production tokenizer shape next to byte-level BPE ([[Bpe]]): a vocab of
  * scored pieces, and encoding = the max-likelihood segmentation of the
  * byte stream under an independence model, found by Viterbi DP. Unlike
  * BPE's greedy merge order, the unigram encoder globally optimizes the
  * whole word/sentence — the property SentencePiece ships on.
  *
  * Everything is EXACT-integer: piece scores are micro-nats (`round(ln p ×
  * 1e6)` longs), path scores are long sums, and ties break deterministically
  * (earliest split point wins = longest final piece), so the segmentation
  * is bit-stable across engines and replayable by an independent
  * reimplementation (`scripts/unigram_oracle.py`).
  *
  * Pieces are BYTE strings (the vocab must contain all 256 single bytes —
  * byte fallback — so every input segments totally and decode∘encode is the
  * identity on any text). Ids are the piece's rank in unsigned-byte
  * lexicographic order — a pure function of the piece set, so id streams
  * from two equal vocabs always agree.
  *
  * Scale shape: encoding is a narrow per-row expression (no shuffle); the
  * vocab ships as a Broadcast handle ([[GraftUnigram.unigramIdsBc]]), once
  * per executor, never in task closures. Seed training
  * ([[Unigram.trainSeed]]) is two aggregations over an exploded substring
  * stream with a bounded top-k collect — the one driver materialization is
  * the vocab itself (O(vocabSize)).
  */
object Unigram {

  /** Score assigned to the 256 fallback bytes a trained corpus never saw —
    * harshly negative so real pieces always beat fallback chains, but
    * finite so encoding stays total. */
  val fallbackScoreMicro: Long = -25000000L

  /** A scored piece vocabulary. `pieces` must be distinct byte strings and
    * MUST include every single byte; ids are indexes into the unsigned-
    * lexicographically sorted piece array. */
  final class Vocab private (
      val pieces: Array[Array[Byte]],      // sorted, id = index
      val scoresMicro: Array[Long],        // parallel to pieces
      val maxLen: Int) extends Serializable {

    // byte-string key (ISO-8859-1 is a bijection byte↔char) → id
    @transient lazy val index: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pieces.length * 2)
      var i = 0
      while (i < pieces.length) {
        m.put(new String(pieces(i), StandardCharsets.ISO_8859_1), Integer.valueOf(i))
        i += 1
      }
      m
    }
    def size: Int = pieces.length
  }

  object Vocab {
    /** Build from (pieceBytes → scoreMicro); adds any missing single bytes
      * at [[fallbackScoreMicro]], sorts, and assigns ids. */
    def apply(scored: Seq[(Array[Byte], Long)]): Vocab = {
      val m = new java.util.HashMap[String, Long](scored.size * 2)
      scored.foreach { case (p, s) =>
        require(p.nonEmpty, "empty piece")
        m.put(new String(p, StandardCharsets.ISO_8859_1), s)
      }
      var b = 0
      while (b < 256) {
        val k = new String(Array(b.toByte), StandardCharsets.ISO_8859_1)
        if (!m.containsKey(k)) m.put(k, fallbackScoreMicro)
        b += 1
      }
      // ISO-8859-1 string order = unsigned byte lexicographic order
      val keys = m.keySet().toArray(new Array[String](0)).sorted
      val pieces = keys.map(_.getBytes(StandardCharsets.ISO_8859_1))
      val scores = keys.map(m.get(_).longValue)
      new Vocab(pieces, scores, pieces.map(_.length).max)
    }
  }

  /** Viterbi max-likelihood segmentation of `text`'s UTF-8 bytes: returns
    * piece IDS. DP over byte positions; at each end position the candidate
    * start positions are scanned ASCENDING and replace only on a STRICTLY
    * greater score — so score ties keep the earliest start (the longest
    * final piece), a fixed total rule. Single-byte fallback guarantees
    * every position is reachable. */
  def encodeIds(text: String, v: Vocab): Array[Int] = {
    val b = text.getBytes(StandardCharsets.UTF_8)
    val n = b.length
    if (n == 0) return Array.empty
    val NEG = java.lang.Long.MIN_VALUE
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, NEG)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - v.maxLen)
      while (j < i) {
        if (best(j) != NEG) {
          val key = new String(b, j, i - j, StandardCharsets.ISO_8859_1)
          val id = v.index.get(key)
          if (id != null) {
            val s = best(j) + v.scoresMicro(id.intValue)
            if (s > best(i)) { best(i) = s; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    // unwind: collect split points right-to-left, emit left-to-right
    val cuts = new scala.collection.mutable.ArrayBuffer[Int]()
    var p = n
    while (p > 0) { cuts += p; p = back(p) }
    val out = new Array[Int](cuts.length)
    var k = cuts.length - 1
    var start = 0
    var o = 0
    while (k >= 0) {
      val end = cuts(k)
      out(o) = v.index.get(new String(b, start, end - start,
        StandardCharsets.ISO_8859_1)).intValue
      start = end; o += 1; k -= 1
    }
    out
  }

  /** Inverse: piece ids → original text (byte concat, UTF-8 decode). */
  def decodeIds(ids: Array[Int], v: Vocab): String = {
    var len = 0
    var i = 0
    while (i < ids.length) { len += v.pieces(ids(i)).length; i += 1 }
    val out = new Array[Byte](len)
    var o = 0
    i = 0
    while (i < ids.length) {
      val p = v.pieces(ids(i))
      System.arraycopy(p, 0, out, o, p.length)
      o += p.length; i += 1
    }
    new String(out, StandardCharsets.UTF_8)
  }

  /** Deterministic corpus-independent vocabulary over the lowercase
    * alphabet — the fixture-oracle vocab (`scripts/unigram_oracle.py`
    * rebuilds it independently): every letter 2-gram and 3-gram holds a
    * score chosen so Viterbi does real work (a 3-gram beats any 2-gram+
    * 1-gram split; 3+1 ties 2+2 on four letters, exercising the tie rule),
    * plus mildly-scored letters/space and fallback-priced other bytes. */
  def syntheticVocab: Vocab = {
    val letters = 'a' to 'z'
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long)]
    buf += ((" ".getBytes(StandardCharsets.UTF_8), -3000000L))
    letters.foreach(c => buf += ((s"$c".getBytes(StandardCharsets.UTF_8), -6500000L)))
    for (a <- letters; b <- letters)
      buf += ((s"$a$b".getBytes(StandardCharsets.UTF_8), -9000000L))
    for (a <- letters; b <- letters; c <- letters)
      buf += ((s"$a$b$c".getBytes(StandardCharsets.UTF_8), -11500000L))
    Vocab(buf.toSeq)
  }

  /** Seed-frequency training (the initialization step of SentencePiece's
    * unigram trainer, documented simplification: no EM refine/prune loop —
    * scores are `ln(count/total)` over the substring-candidate stream):
    * candidates are all ≤`maxPieceLen`-byte substrings of whitespace
    * words; the top `vocabSize` by (count desc, piece asc) become pieces.
    * Distributed: explode → count → global top-k (TakeOrdered, never a
    * full sort materialization); the only collect is the vocab itself. */
  def trainSeed(docs: org.apache.spark.sql.DataFrame, text: Column,
                vocabSize: Int = 2048, maxPieceLen: Int = 6): Vocab = {
    import org.apache.spark.sql.functions._
    val w = docs.select(explode(split(text, "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    // all substrings via HOFs: start s in [1, len], piece length l in
    // [1, min(maxPieceLen, len-s+1)] — Column.substr takes Column args
    val subs = w.select(explode(flatten(transform(
      sequence(lit(1), length(col("w"))),
      s => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - s + 1)),
        l => col("w").substr(s, l))))).as("piece"))
    // the piece-count table feeds both the normalizer and the top-k —
    // persist it so the substring explode (the dominant cost) runs once
    val counts = subs.groupBy("piece").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = counts.agg(sum(col("cnt"))).head.getLong(0)
      val rows = counts.orderBy(col("cnt").desc, col("piece").asc)
        .limit(vocabSize).collect()
      val scored = rows.toSeq.map { r =>
        val piece = r.getString(0).getBytes(StandardCharsets.UTF_8)
        val cnt = r.getLong(1)
        (piece, math.rint(math.log(cnt.toDouble / total) * 1e6).toLong)
      }
      Vocab(scored)
    } finally counts.unpersist(blocking = false)
  }

  /** FULL unigram training: seed-frequency candidates refined by `iters`
    * EM iterations (the SentencePiece trainer's core loop, distributed):
    * the E-step runs per word as a narrow expression
    * ([[GraftUnigram.unigramExpCounts]] — forward/backward over the byte
    * lattice, expected counts micro-rounded INSIDE the word so cross-word
    * aggregation is exact long addition), the M-step is one groupBy-sum
    * plus a vocab-sized collect, and pieces whose expected count hits zero
    * are pruned. Every float op happens in a fixed per-word scan order, so
    * the whole trainer is bit-reproducible by an independent
    * reimplementation (`scripts/unigram_em_oracle.py`).
    *
    * Candidate retention: the top `vocabSize` substrings by seed count
    * UNION every length-1 candidate seen — byte coverage keeps α(n) > 0
    * for every corpus word at every iteration. Final piece scores are
    * `rint(ln p × 1e6)`; unseen bytes get the [[fallbackScoreMicro]]
    * floor via [[Vocab.apply]]. */
  def trainEm(docs: org.apache.spark.sql.DataFrame, text: Column,
              vocabSize: Int = 2048, maxPieceLen: Int = 6,
              iters: Int = 2): Vocab = {
    import org.apache.spark.sql.functions._
    require(iters >= 1, s"iters >= 1, got $iters")
    val spark = docs.sparkSession
    val w = docs.select(explode(split(text, "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val words = w.groupBy("w").agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val subs = w.select(explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        s => transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - s + 1)),
          l => col("w").substr(s, l))))).as("piece"))
      val counts = subs.groupBy("piece").agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (top, singles) =
        try {
          (counts.orderBy(col("cnt").desc, col("piece").asc).limit(vocabSize).collect(),
            counts.filter(length(col("piece")) === 1).collect())
        } finally counts.unpersist(blocking = false)
      val cand = new java.util.TreeMap[String, Long]() // ISO keys: unsigned-lex order
      (top ++ singles).foreach { r =>
        cand.put(new String(r.getString(0).getBytes(StandardCharsets.UTF_8),
          StandardCharsets.ISO_8859_1), r.getLong(1))
      }
      var pieces = cand.keySet.toArray(new Array[String](0))
        .map(_.getBytes(StandardCharsets.ISO_8859_1))
      var cArr = cand.values.toArray(new Array[java.lang.Long](0)).map(_.longValue)
      var iter = 0
      while (iter < iters) {
        val total = cArr.sum
        val probs = cArr.map(_.toDouble / total.toDouble)
        val table = new UnigramEm.ProbTable(pieces, probs, pieces.map(_.length).max)
        val bc = spark.sparkContext.broadcast(table)
        val agg = words
          .select(explode(GraftUnigram.unigramExpCounts(col("w"), bc)).as("e"),
            col("freq"))
          .select(col("e.id").as("id"), (col("e.c") * col("freq")).as("cm"))
          .groupBy("id").agg(sum(col("cm")).as("cm"))
          .collect()
        val next = new Array[Long](pieces.length)
        agg.foreach(r => next(r.getInt(0)) = r.getLong(1))
        val keep = next.indices.filter(next(_) > 0L).toArray
        pieces = keep.map(pieces)
        cArr = keep.map(next)
        bc.destroy()
        iter += 1
      }
      val total = cArr.sum
      val scored = pieces.zip(cArr).toSeq.map { case (p, c) =>
        (p, math.rint(math.log(c.toDouble / total.toDouble) * 1e6).toLong)
      }
      Vocab(scored)
    } finally words.unpersist(blocking = false)
  }
}

/** EM refinement machinery for [[Unigram]] — see [[Unigram.trainEm]]. */
object UnigramEm {

  /** A probability table over candidate pieces (the EM state). Probs are
    * plain doubles derived by single IEEE divisions from exact integer
    * counts, so the table is bit-reproducible by an independent
    * reimplementation. */
  final class ProbTable(
      val pieces: Array[Array[Byte]],  // sorted unsigned-lexicographic
      val probs: Array[Double],
      val maxLen: Int) extends Serializable {
    @transient lazy val index: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pieces.length * 2)
      var i = 0
      while (i < pieces.length) {
        m.put(new String(pieces(i), StandardCharsets.ISO_8859_1), Integer.valueOf(i))
        i += 1
      }
      m
    }
  }

  /** The per-word E-step: forward/backward over the byte lattice under
    * independence, emitting each piece's EXPECTED COUNT in this word as
    * exact micro-units (`rint(E × 1e6)` longs) — the order-dependent float
    * work stays INSIDE one word with a fixed scan order (start ascending,
    * end ascending), so the cross-word aggregation is pure long addition
    * and the whole M-step is engine-order-independent. Returns sparse
    * (pieceId, countMicro) pairs; empty when the word has no segmentation
    * under the table (callers guarantee byte coverage). */
  def expectedCounts(wordBytes: Array[Byte], t: ProbTable): Array[(Int, Long)] = {
    val n = wordBytes.length
    if (n == 0) return Array.empty
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - t.maxLen)
      var a = 0.0
      while (j < i) {
        if (alpha(j) != 0.0) {
          val id = t.index.get(new String(wordBytes, j, i - j, StandardCharsets.ISO_8859_1))
          if (id != null) a += alpha(j) * t.probs(id.intValue)
        }
        j += 1
      }
      alpha(i) = a
      i += 1
    }
    if (alpha(n) == 0.0) return Array.empty
    beta(n) = 1.0
    var j2 = n - 1
    while (j2 >= 0) {
      var i2 = j2 + 1
      var b = 0.0
      val lim = math.min(n, j2 + t.maxLen)
      while (i2 <= lim) {
        if (beta(i2) != 0.0) {
          val id = t.index.get(new String(wordBytes, j2, i2 - j2, StandardCharsets.ISO_8859_1))
          if (id != null) b += t.probs(id.intValue) * beta(i2)
        }
        i2 += 1
      }
      beta(j2) = b
      j2 -= 1
    }
    val acc = new java.util.HashMap[Integer, Double]()
    var j3 = 0
    while (j3 < n) {
      if (alpha(j3) != 0.0) {
        var i3 = j3 + 1
        val lim = math.min(n, j3 + t.maxLen)
        while (i3 <= lim) {
          val id = t.index.get(new String(wordBytes, j3, i3 - j3, StandardCharsets.ISO_8859_1))
          if (id != null && beta(i3) != 0.0) {
            val c = alpha(j3) * t.probs(id.intValue) * beta(i3)
            val prev = acc.get(id)
            acc.put(id, if (prev == null) c else prev.doubleValue + c)
          }
          i3 += 1
        }
      }
      j3 += 1
    }
    val z = alpha(n)
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Long)](acc.size)
    // deterministic emission order (ascending id) — and micro-rounding
    // HERE, so everything downstream is exact integers
    val ids = acc.keySet.toArray(new Array[Integer](0)).sortBy(_.intValue)
    ids.foreach { id =>
      val m = math.rint(acc.get(id).doubleValue / z * 1e6).toLong
      if (m != 0L) out += ((id.intValue, m))
    }
    out.toArray
  }
}

/** Native Catalyst expressions for [[Unigram]] — broadcast-vocab encode /
  * decode / count, the [[GraftBpe]] pattern. */
object GraftUnigram {

  case class UnigramIdsBc(child: Expression, bc: Broadcast[Unigram.Vocab])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "unigram_ids"
    override protected def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        Unigram.encodeIds(input.asInstanceOf[UTF8String].toString, bc.value))
    override protected def withNewChildInternal(newChild: Expression): UnigramIdsBc =
      copy(child = newChild)
  }

  case class UnigramDetokIdsBc(child: Expression, bc: Broadcast[Unigram.Vocab])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "unigram_detok_ids"
    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val ids = new Array[Int](a.numElements())
      var i = 0
      while (i < ids.length) { ids(i) = a.getInt(i); i += 1 }
      UTF8String.fromString(Unigram.decodeIds(ids, bc.value))
    }
    override protected def withNewChildInternal(newChild: Expression): UnigramDetokIdsBc =
      copy(child = newChild)
  }

  /** word → sparse (pieceId, expectedCountMicro) pairs under a broadcast
    * EM probability table — the per-word E-step as a narrow expression. */
  case class UnigramExpCounts(child: Expression, bc: Broadcast[UnigramEm.ProbTable])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "unigram_exp_counts"
    override protected def nullSafeEval(input: Any): Any = {
      val pairs = UnigramEm.expectedCounts(
        input.asInstanceOf[UTF8String].toString.getBytes(StandardCharsets.UTF_8),
        bc.value)
      new GenericArrayData(pairs.map { case (id, c) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](id, c))
      }.toArray[Any])
    }
    override protected def withNewChildInternal(newChild: Expression): UnigramExpCounts =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def unigramIdsBc(text: Column, bc: Broadcast[Unigram.Vocab]): Column =
    column(UnigramIdsBc(expression(text), bc))
  def unigramDetokIds(ids: Column, bc: Broadcast[Unigram.Vocab]): Column =
    column(UnigramDetokIdsBc(expression(ids), bc))
  def unigramExpCounts(word: Column, bc: Broadcast[UnigramEm.ProbTable]): Column =
    column(UnigramExpCounts(expression(word), bc))
}
