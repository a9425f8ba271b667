package graft.queries

/** Fixture strings for the BPE oracle (x30): chosen to exercise every
  * pre-tokenizer branch — contractions, space-prefixed words, digit runs,
  * punctuation runs, multi-space, unicode beyond latin-1, leading/trailing
  * whitespace — with expected token counts precomputed by an INDEPENDENT
  * python reimplementation of byte-level BPE over the exported merge table
  * (scripts/bpe_oracle.py), then frozen into x30's oracle SQL. */
object BpeFixture {
  val strings: Seq[String] = Seq(
    "The quick brown fox jumps over the lazy dog",
    "It's a truth universally acknowledged that it'll work",
    "In 2024 the pipeline processed 1048576 documents",
    "hello,  world!!!   spaces   everywhere   ",
    "naïve café résumé — déjà vu",
    "SELECT doc_id, count(*) FROM documents GROUP BY 1;",
    "the the the the the the",
    "a",
    "",
    "tokenization of untokenizable pseudoantidisestablishmentarianism",
    "line one\nline two\ttabbed\n\nblank",
    "价格是 100 元，含税。")
}
