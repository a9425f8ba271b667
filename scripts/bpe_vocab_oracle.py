#!/usr/bin/env python3
"""Independent check of the published-format BPE vocab loader (x51):
reads the frozen fixture `vocab.bpe` + `encoder.json` (GPT-2 file
formats) with python's own parsers, tokenizes the fixture strings with
the independent BPE reimplementation from bpe_oracle.py, maps tokens to
ids via encoder.json, and prints the (fid, n_tokens, id_sum) VALUES rows
frozen into x51's oracle SQL.

Usage: python3 scripts/bpe_vocab_oracle.py \
         src/main/resources/graft/bpe/fixture_vocab.bpe \
         src/main/resources/graft/bpe/fixture_encoder.json
"""
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from bpe_oracle import encode  # the independent encoder implementation


def main():
    merges_path, encoder_path = sys.argv[1], sys.argv[2]
    ranks = {}
    with open(merges_path, encoding="utf-8") as f:
        i = 0
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            ranks[(a, b)] = i
            i += 1
    with open(encoder_path, encoding="utf-8") as f:
        encoder = json.load(f)

    # kept in sync with BpeFixture.scala (the x30/x51 fixture strings)
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
    print("-- VALUES rows (fid, n_tokens, id_sum) for x51 oracle SQL --")
    for fid, s in enumerate(strings):
        toks = encode(s, ranks)
        ids = [encoder[t] for t in toks]
        print(f"({fid}, {len(toks)}, {sum(ids)}),")


if __name__ == "__main__":
    main()
