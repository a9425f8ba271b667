package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer — the third tokenizer family next to byte-level BPE
  * ([[Bpe]]) and unigram-LM ([[Unigram]]): BERT's subword scheme (Schuster
  * & Nakajima 2012; Devlin et al. 2019 §A): per whitespace word, GREEDY
  * LONGEST-MATCH-FIRST from the left; pieces after the first carry the
  * `##` continuation prefix; a word with no match at any position becomes
  * ONE `[UNK]` token (whole-word UNK — partial pieces already matched are
  * discarded, exactly BERT's `WordpieceTokenizer` behavior).
  *
  * Reference analog: none (north-star extension) — the reference
  * tokenizes nothing; this rounds out the tokenizer-throughput surface a
  * training-data pipeline needs.
  *
  * Determinism: encoding is a pure function of (vocab, text); the trainer
  * is explode → count → top-k with a total (count desc, piece asc)
  * tie-break, so the vocab is a pure function of the corpus. No floats
  * anywhere.
  */
object WordPiece {

  val UnkId = 0
  val UnkPiece = "[UNK]"

  /** id ↔ piece tables. `pieces(id)` carries the `##` prefix for
    * continuation pieces; id 0 is `[UNK]`. Lookup maps split by class so
    * the encoder probes exactly one map per position. */
  final class Vocab(val pieces: Array[String]) extends Serializable {
    require(pieces.headOption.contains(UnkPiece), "pieces(0) must be [UNK]")
    @transient lazy val (initial, cont) = {
      val i = new java.util.HashMap[String, Integer]()
      val c = new java.util.HashMap[String, Integer]()
      pieces.zipWithIndex.drop(1).foreach { case (p, id) =>
        if (p.startsWith("##")) c.put(p.substring(2), id) else i.put(p, id)
      }
      (i, c)
    }
    @transient lazy val maxLen: Int =
      pieces.drop(1).map(p => if (p.startsWith("##")) p.length - 2 else p.length)
        .foldLeft(1)(math.max)
    def size: Int = pieces.length
  }

  object Vocab {
    /** Build from raw piece strings (`##`-prefixed = continuation), in a
      * canonical order: `[UNK]` first, then sorted pieces. The bare "##"
      * piece (continuation of the empty string) is unreachable by the
      * greedy matcher (l >= 1) and is dropped rather than stored under an
      * empty key. */
    def apply(raw: Seq[String]): Vocab =
      new Vocab((UnkPiece +: raw.distinct
        .filterNot(p => p == UnkPiece || p == "##").sorted).toArray)
  }

  /** Encode one text: whitespace words, greedy longest-match-first per
    * word, whole-word [UNK] on any mid-word miss. Total for every input. */
  def encodeIds(text: String, v: Vocab): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](text.length / 3 + 1)
    var ws = 0
    val n = text.length
    while (ws < n) {
      while (ws < n && Character.isWhitespace(text.charAt(ws))) ws += 1
      var we = ws
      while (we < n && !Character.isWhitespace(text.charAt(we))) we += 1
      if (we > ws) {
        val mark = out.length
        var i = ws
        var dead = false
        while (i < we && !dead) {
          val table = if (i == ws) v.initial else v.cont
          var l = math.min(v.maxLen, we - i)
          var hit = -1
          while (l >= 1 && hit < 0) {
            val id = table.get(text.substring(i, i + l))
            if (id != null) hit = id.intValue() else l -= 1
          }
          if (hit < 0) dead = true
          else { out += hit; i += l }
        }
        if (dead) { out.remove(mark, out.length - mark); out += UnkId }
      }
      ws = we
    }
    out.toArray
  }

  /** Decode: strip `##`, join words with single spaces. Lossless on texts
    * whose words all encode UNK-free and are single-space separated (the
    * canonical form — corpus-trained vocabs cover every corpus char, so
    * the x105 roundtrip holds corpus-wide). */
  def decodeIds(ids: Array[Int], v: Vocab): String = {
    val sb = new java.lang.StringBuilder(ids.length * 3)
    var i = 0
    while (i < ids.length) {
      val p = v.pieces(ids(i))
      if (p.startsWith("##")) sb.append(p, 2, p.length)
      else {
        if (sb.length > 0) sb.append(' ')
        sb.append(p)
      }
      i += 1
    }
    sb.toString
  }

  /** Distributed WordPiece vocab training — frequency-seeded (documented
    * simplification, same discipline as [[Unigram.trainSeed]]: the
    * published trainer scores merges by likelihood ratio; this takes the
    * top `vocabSize` POSITIONAL substrings by corpus count, which already
    * yields the long-piece-wins encoding behavior the encoder exercises).
    * Candidates: every ≤`maxPieceLen`-char substring of every word
    * occurrence, tagged initial (starts the word) or `##`-continuation.
    * ALL single chars seen in either class are retained beyond
    * `vocabSize` — full coverage, so corpus text never hits [UNK] and the
    * roundtrip law holds. Distributed: one explode → count, a global
    * top-k and a chars-only filter; the vocab itself is the only collect. */
  def train(docs: org.apache.spark.sql.DataFrame, text: Column,
            vocabSize: Int = 4096, maxPieceLen: Int = 8): Vocab = {
    import org.apache.spark.sql.functions._
    val w = docs.select(explode(split(text, "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    // Initial-position substrings that literally start with "##" (a corpus
    // word beginning with '#''#') are dropped: the raw-piece encoding uses
    // the "##" prefix to MEAN continuation, so such a piece would be
    // stored under a stripped key and be unreachable/misclassified. The
    // single char "#" survives in both classes, so those words still
    // encode UNK-free — just one piece at a time over the leading hashes.
    val subs = w.select(explode(flatten(transform(
      sequence(lit(1), length(col("w"))),
      s => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - s + 1)),
        l => when(s === 1 && col("w").substr(s, l).startsWith("##"),
          lit(null).cast("string"))
          .otherwise(concat(when(s === 1, lit("")).otherwise(lit("##")),
            col("w").substr(s, l))))))).as("piece"))
      .filter(col("piece").isNotNull)
    val counts = subs.groupBy("piece").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val top = counts.orderBy(col("cnt").desc, col("piece").asc)
        .limit(vocabSize).collect()
      val singles = counts.filter(
        length(regexp_replace(col("piece"), "^##", "")) === 1).collect()
      Vocab((top ++ singles).map(_.getString(0)).toSeq)
    } finally counts.unpersist(blocking = false)
  }

  /** Deterministic synthetic vocab for fixture pinning (x106): letters in
    * both classes, selected multi-char pieces that force interesting
    * greedy choices, and deliberate coverage HOLES (digits absent) so the
    * whole-word-UNK path is exercised. */
  def syntheticVocab: Vocab = Vocab(
    ('a' to 'z').map(_.toString) ++
      ('a' to 'z').map(c => s"##$c") ++
      Seq("the", "than", "th", "sca", "scan", "spark", "shuf",
        "##able", "##ble", "##le", "##ark", "##fle", "##ffle", "##an"))
}

/** Column-level WordPiece expressions over a broadcast vocab (the same
  * broadcast-handle shape as [[GraftBpe]]/[[GraftUnigram]] — the vocab
  * ships once per executor, never per task closure). */
object GraftWordPiece {

  case class WordPieceIdsBc(child: Expression, bc: Broadcast[WordPiece.Vocab])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "wordpiece_ids"
    override protected def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        WordPiece.encodeIds(input.asInstanceOf[UTF8String].toString, bc.value))
    override protected def withNewChildInternal(newChild: Expression): WordPieceIdsBc =
      copy(child = newChild)
  }

  case class WordPieceDetokIdsBc(child: Expression, bc: Broadcast[WordPiece.Vocab])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "wordpiece_detok_ids"
    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val ids = new Array[Int](a.numElements())
      var i = 0
      while (i < ids.length) { ids(i) = a.getInt(i); i += 1 }
      UTF8String.fromString(WordPiece.decodeIds(ids, bc.value))
    }
    override protected def withNewChildInternal(newChild: Expression): WordPieceDetokIdsBc =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def wordpieceIdsBc(text: Column, bc: Broadcast[WordPiece.Vocab]): Column =
    column(WordPieceIdsBc(expression(text), bc))
  def wordpieceDetokIds(ids: Column, bc: Broadcast[WordPiece.Vocab]): Column =
    column(WordPieceDetokIdsBc(expression(ids), bc))
}
