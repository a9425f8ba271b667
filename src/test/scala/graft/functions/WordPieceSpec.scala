package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def ids(text: String, v: WordPiece.Vocab): Seq[Int] =
    WordPiece.encodeIds(text, v).toSeq

  test("greedy longest-match-first picks the longest piece at every position") {
    val v = WordPiece.syntheticVocab
    def pieceOf(id: Int) = v.pieces(id)
    // "scan" matches whole ("scan" beats "sca"/"s")
    assert(ids("scan", v).map(pieceOf) === Seq("scan"))
    // "scans": "scan" + "##s" (never "sca"+"##n"+"##s")
    assert(ids("scans", v).map(pieceOf) === Seq("scan", "##s"))
    // "shuffle": "shuf" + "##fle" (##ffle loses: after shuf the rest is
    // "fle", and the match at that position tries longest first)
    assert(ids("shuffle", v).map(pieceOf) === Seq("shuf", "##fle"))
    // "table": "t" + "##able" — continuation longest-match wins over ##a
    assert(ids("table", v).map(pieceOf) === Seq("t", "##able"))
    // "than" whole beats "th"+"##an" and "the" never fires mid-word
    assert(ids("than", v).map(pieceOf) === Seq("than"))
  }

  test("whole-word [UNK]: a mid-word miss discards already-matched pieces") {
    val v = WordPiece.syntheticVocab
    // digits are coverage holes: "a1b" matches "a" then dies on '1'
    assert(ids("a1b", v) === Seq(WordPiece.UnkId))
    // case miss at word start
    assert(ids("The", v) === Seq(WordPiece.UnkId))
    // surrounding words are unaffected
    assert(ids("a The b", v).map(v.pieces(_)) === Seq("a", "[UNK]", "b"))
  }

  test("decode strips ## and joins words; roundtrip on UNK-free text") {
    val v = WordPiece.syntheticVocab
    val text = "the scan table shuffles spark"
    val enc = WordPiece.encodeIds(text, v)
    assert(WordPiece.decodeIds(enc, v) === text)
    // canonicalization: runs of whitespace collapse to single spaces
    assert(WordPiece.decodeIds(WordPiece.encodeIds("the   scan\n\ttable", v), v) ===
      "the scan table")
  }

  test("vocab id assignment is canonical: [UNK] first, sorted pieces, stable ids") {
    val v1 = WordPiece.Vocab(Seq("b", "a", "##b", "a")) // dup + unsorted
    val v2 = WordPiece.Vocab(Seq("##b", "b", "a"))
    assert(v1.pieces.toSeq === Seq("[UNK]", "##b", "a", "b"))
    assert(v1.pieces.toSeq === v2.pieces.toSeq)
  }

  test("trainer: single-char coverage in both classes makes corpus text UNK-free") {
    val docs = Seq("spark shuffles fast tables", "fast scans beat slow scans",
      "the table shuffle is fast").toDF("text")
    val v = WordPiece.train(docs, col("text"), vocabSize = 10, maxPieceLen = 4)
    // way past vocabSize, coverage is POSITIONAL: every word-starting
    // char as an initial piece, every word-internal char as ##-piece
    val words = "spark shuffles fast tables scans beat slow the table shuffle is".split(" ")
    words.map(_.head).distinct.foreach(c =>
      assert(v.initial.containsKey(c.toString), s"initial $c"))
    words.flatMap(_.tail).distinct.foreach(c =>
      assert(v.cont.containsKey(c.toString), s"cont $c"))
    val all = docs.as[String].collect().mkString(" ")
    val enc = WordPiece.encodeIds(all, v)
    assert(!enc.contains(WordPiece.UnkId))
    assert(WordPiece.decodeIds(enc, v) === all)
  }

  test("broadcast-expression encode equals local encode on every row") {
    val v = WordPiece.syntheticVocab
    val bc = spark.sparkContext.broadcast(v)
    val texts = Seq("the scan", "Than THAN than", "", "  spark  shuffle  ", "x9y zz")
    val got = texts.toDF("t")
      .select(GraftWordPiece.wordpieceIdsBc(col("t"), bc).as("ids"))
      .collect().map(_.getSeq[Int](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g === WordPiece.encodeIds(t, v).toSeq, s"text '$t'")
    }
  }
}
