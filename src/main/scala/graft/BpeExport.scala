package graft

/** Exports the default BPE merge table and the x30 fixture tokenizations so
  * the independent python reimplementation can re-verify them:
  *
  *   sbt "runMain graft.BpeExport /tmp"
  *   python3 scripts/bpe_oracle.py /tmp/bpe_merges.txt /tmp/bpe_fixture.txt
  *
  * The python script exits nonzero on any divergence and prints the VALUES
  * rows frozen into x30's oracle SQL — that is how the fixture counts were
  * precomputed (two independent codebases agreeing, not one echoing itself).
  */
object BpeExport {
  def main(args: Array[String]): Unit = {
    import graft.functions.Bpe
    val dir = if (args.nonEmpty) args(0) else "/tmp"
    val out = new java.io.PrintWriter(s"$dir/bpe_merges.txt", "UTF-8")
    Bpe.defaultMerges.foreach { case (a, b) => out.println(a + "\t" + b) }
    out.close()
    val fo = new java.io.PrintWriter(s"$dir/bpe_fixture.txt", "UTF-8")
    val cache = new java.util.HashMap[String, Array[String]]
    graft.queries.BpeFixture.strings.zipWithIndex.foreach { case (s, i) =>
      val toks = Bpe.encode(s, Bpe.defaultRanks, cache)
      fo.println(s"$i\t${toks.length}\t${toks.mkString(" ")}")
      require(Bpe.decode(toks) == s, s"roundtrip failed for fixture $i")
    }
    fo.close()

    // published-FORMAT fixture vocab (GPT-2 `vocab.bpe`/`encoder.json`
    // layouts): 100 merges — deliberately NOT the default table (seed
    // training saturates at 129, so a 100-merge budget yields a strictly
    // coarser vocab), so x51's counts can only come from the LOADED table.
    // Copied into src/main/resources/graft/bpe/ and frozen;
    // scripts/bpe_vocab_oracle.py recomputes the x51 VALUES independently.
    val fixtureMerges = Bpe.trainOnSeed(100)
    val vb = new java.io.PrintWriter(s"$dir/fixture_vocab.bpe", "UTF-8")
    vb.println("#version: 0.2")
    fixtureMerges.foreach { case (a, b) => vb.println(a + " " + b) }
    vb.close()
    def jsonEsc(s: String): String = s.flatMap {
      case '"'                        => "\\\""
      case '\\'                       => "\\\\"
      case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
      case c                          => c.toString
    }
    val enc = Bpe.encoderOf(fixtureMerges)
    val entries = {
      import scala.jdk.CollectionConverters._
      enc.asScala.toSeq.sortBy(_._2.intValue())
        .map { case (tok, id) => s""""${jsonEsc(tok)}": $id""" }
    }
    val ej = new java.io.PrintWriter(s"$dir/fixture_encoder.json", "UTF-8")
    ej.println(entries.mkString("{", ", ", "}"))
    ej.close()
    println(s"merges=${Bpe.defaultMerges.size} maxTokLen=${Bpe.defaultMaxTokenLen} " +
      s"fixtureMerges=${fixtureMerges.size} fixtureVocab=${enc.size}")
  }
}
