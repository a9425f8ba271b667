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
    println(s"merges=${Bpe.defaultMerges.size} maxTokLen=${Bpe.defaultMaxTokenLen}")
  }
}
