#!/usr/bin/env python3
"""Independent byte-level BPE reimplementation (from the published GPT-2
algorithm) used to precompute x30's fixture token counts. Reads the merge
table exported from the Scala side and tokenizes the fixture strings with a
SEPARATE implementation — agreement pins the encoder, not just echoes it.

Usage: python3 scripts/bpe_oracle.py /tmp/bpe_merges.txt /tmp/bpe_fixture.txt
Exits nonzero on any mismatch; prints the VALUES rows for the oracle SQL.
"""
import sys, re

def bytes_to_unicode():
    bs = list(range(ord("!"), ord("~") + 1)) + \
         list(range(0xA1, 0xAC + 1)) + list(range(0xAE, 0xFF + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))

B2U = bytes_to_unicode()
PAT = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+"
                 .replace(r"[^\W\d_]", r"\w"), re.UNICODE)
# python re lacks \p{L}; emulate GPT-2's pattern with str.isalpha/isdigit splits
TOK = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?(?:[^\W\d_])+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+",
                 re.UNICODE)
# NOTE: python \d matches unicode digits like Java \p{N}; [^\W\d_] matches
# unicode letters like Java \p{L}; [^\s\w] misses '_' (in \w but not \p{L}
# or \p{N}) — handle '_' via the explicit alternative below.
TOK = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?(?:[^\W\d_])+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+",
    re.UNICODE)

def mapb(s):
    return "".join(B2U[b] for b in s.encode("utf-8"))

def bpe(word, ranks):
    parts = list(word)
    while len(parts) >= 2:
        cands = [(ranks.get((parts[i], parts[i + 1])), i)
                 for i in range(len(parts) - 1)]
        cands = [(r, i) for r, i in cands if r is not None]
        if not cands:
            break
        r, _ = min(cands)
        a, b = None, None
        for (rr, i) in cands:
            if rr == r:
                a, b = parts[i], parts[i + 1]
                break
        out, k = [], 0
        while k < len(parts):
            if k < len(parts) - 1 and parts[k] == a and parts[k + 1] == b:
                out.append(a + b)
                k += 2
            else:
                out.append(parts[k])
                k += 1
        parts = out
    return parts

def encode(text, ranks):
    toks = []
    for m in TOK.finditer(text):
        toks.extend(bpe(mapb(m.group()), ranks))
    return toks

def main():
    merges_path, fixture_path = sys.argv[1], sys.argv[2]
    ranks = {}
    with open(merges_path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            a, b = line.rstrip("\n").split("\t")
            ranks[(a, b)] = i
    fails = 0
    with open(fixture_path, encoding="utf-8") as f:
        fixture_lines = f.read().split("\n")
    rows = []
    for line in fixture_lines:
        if not line:
            continue
        fid, n_scala, toks_scala = line.split("\t")
        # fixture file stores the ORIGINAL string implicitly via index; re-read
        rows.append((int(fid), int(n_scala), toks_scala))
    # fixture strings duplicated here (kept in sync with BpeFixture.scala)
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
    for fid, n_scala, toks_scala in rows:
        toks = encode(strings[fid], ranks)
        joined = " ".join(toks)
        ok = len(toks) == n_scala and joined == toks_scala
        status = "OK " if ok else "FAIL"
        if not ok:
            fails += 1
            print(f"{status} fid={fid} python_n={len(toks)} scala_n={n_scala}")
            print(f"  python: {joined}")
            print(f"  scala : {toks_scala}")
        else:
            print(f"{status} fid={fid} n={len(toks)}")
    if fails:
        sys.exit(1)
    print("-- VALUES rows for oracle SQL --")
    for fid, n, _ in rows:
        print(f"({fid}, {n}),")

if __name__ == "__main__":
    main()
