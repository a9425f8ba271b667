#!/usr/bin/env python3
"""Independent reimplementation of the Unigram (SentencePiece-family)
Viterbi encoder over the deterministic synthetic vocabulary (see
graft.functions.Unigram.syntheticVocab): space at -3e6 micro-nats, letters
at -6.5e6, letter 2-grams at -9e6, letter 3-grams at -11.5e6, every other
single byte at the -25e6 fallback. Ids are the piece's rank in unsigned-
byte lexicographic order. Viterbi scans candidate start positions
ASCENDING and replaces only on a STRICTLY greater long score (ties keep
the earliest start = longest final piece).

Prints the (fid, n_pieces, id_sum) VALUES rows frozen into the
x81_unigram_fixture oracle SQL.
"""

FALLBACK = -25_000_000

FIXTURES = [
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


def build_vocab():
    scores = {}
    letters = [bytes([c]) for c in range(ord("a"), ord("z") + 1)]
    scores[b" "] = -3_000_000
    for a in letters:
        scores[a] = -6_500_000
    for a in letters:
        for b in letters:
            scores[a + b] = -9_000_000
    for a in letters:
        for b in letters:
            for c in letters:
                scores[a + b + c] = -11_500_000
    for b in range(256):
        scores.setdefault(bytes([b]), FALLBACK)
    pieces = sorted(scores)  # bytes sort = unsigned lexicographic
    ids = {p: i for i, p in enumerate(pieces)}
    max_len = max(len(p) for p in pieces)
    return scores, ids, max_len


def encode_ids(text, scores, ids, max_len):
    b = text.encode("utf-8")
    n = len(b)
    if n == 0:
        return []
    NEG = None
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            s = scores.get(b[j:i])
            if s is None:
                continue
            cand = best[j] + s
            if best[i] is None or cand > best[i]:
                best[i] = cand
                back[i] = j
    cuts = []
    p = n
    while p > 0:
        cuts.append(p)
        p = back[p]
    cuts.reverse()
    out = []
    start = 0
    for end in cuts:
        out.append(ids[b[start:end]])
        start = end
    return out


def main():
    scores, ids, max_len = build_vocab()
    rows = []
    for fid, t in enumerate(FIXTURES):
        e = encode_ids(t, scores, ids, max_len)
        rows.append((fid, len(e), sum(e)))
    print(",".join("(%d,%d,%d)" % r for r in rows))


if __name__ == "__main__":
    main()
