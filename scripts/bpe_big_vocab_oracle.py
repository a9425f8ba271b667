#!/usr/bin/env python3
"""Independent check of the production-size synthetic vocab (x59): rebuilds
the deterministic ~50k-merge vocabulary from its spec (four lexicographic
phases over the lowercase alphabet — see Bpe.syntheticVocabText), tokenizes
the fixture strings with the independent BPE reimplementation from
bpe_oracle.py, maps tokens to GPT-2-convention ids (256 byte symbols, then
256+rank), and prints the (fid, n_tokens, id_sum) VALUES rows frozen into
x59's oracle SQL.

Usage: python3 scripts/bpe_big_vocab_oracle.py [num_merges=50000]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from bpe_oracle import encode, B2U  # the independent encoder implementation


def synthetic_vocab(num_merges):
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    g = B2U[0x20]  # the byte-mapped space marker
    merges = []

    def emit(a, b):
        if len(merges) < num_merges:
            merges.append((a, b))
        return len(merges) < num_merges

    open_ = True
    for c in letters:
        if not open_:
            break
        open_ = emit(g, c)
    for a in letters:
        if not open_:
            break
        for b in letters:
            if not open_:
                break
            open_ = emit(a, b)
    for a in letters:
        if not open_:
            break
        for b in letters:
            if not open_:
                break
            for c in letters:
                if not open_:
                    break
                open_ = emit(a + b, c)
    for a in letters:
        if not open_:
            break
        for b in letters:
            if not open_:
                break
            for c in letters:
                if not open_:
                    break
                for d in letters:
                    if not open_:
                        break
                    open_ = emit(a + b + c, d)
    assert len(merges) == num_merges, len(merges)
    ranks = {m: i for i, m in enumerate(merges)}
    encoder = {B2U[b]: b for b in range(256)}
    for i, (a, b) in enumerate(merges):
        encoder.setdefault(a + b, 256 + i)
    return ranks, encoder


def main():
    num = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    ranks, encoder = synthetic_vocab(num)
    # kept in sync with BpeFixture.scala (the x30/x51/x59 fixture strings)
    strings = [
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
        "价格是 100 元，含税。",
    ]
    print(f"-- VALUES rows (fid, n_tokens, id_sum) for x59 oracle SQL "
          f"({num} merges) --")
    for fid, s in enumerate(strings):
        toks = encode(s, ranks)
        ids = [encoder[t] for t in toks]
        print(f"({fid}, {len(toks)}, {sum(ids)}),")


if __name__ == "__main__":
    main()
