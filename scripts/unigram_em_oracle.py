#!/usr/bin/env python3
"""Independent reimplementation of the FULL unigram trainer
(graft.functions.Unigram.trainEm: seed-frequency candidates + EM
iterations + prune) and the Viterbi encoder, over the fixture strings —
frozen into x88's oracle VALUES.

Bit-parity contract with the Scala side (both are IEEE double):
  - words: regex \\s+ split, empties dropped; frequencies over occurrences;
  - seed candidates: all <=maxPieceLen-CHAR substrings per word occurrence,
    top vocabSize by (count desc, utf8-bytes asc) UNION all 1-char
    candidates;
  - E-step per word on UTF-8 BYTES: alpha with end ascending/start
    ascending, beta with start descending/end ascending, expected counts
    accumulated in (start asc, end asc) order, micro-rounded (rint =
    banker's) inside the word;
  - M-step: exact long sums of freq-weighted micro counts; prune zeros;
    probs = count/total (single float division);
  - final scores rint(ln(count/total)*1e6); missing single bytes at the
    -25e6 fallback; ids = unsigned-lex rank of the piece set.

Usage: python3 scripts/unigram_em_oracle.py [vocabSize=160] [maxLen=4] [iters=2]
"""
import math
import re
import sys
from collections import Counter

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


def words_with_freq():
    c = Counter()
    for t in FIXTURES:
        for w in re.split(r"\s+", t):
            if w:
                c[w] += 1
    return c


def seed(vocab_size, max_len):
    wf = words_with_freq()
    cnt = Counter()
    for w, f in wf.items():
        for s in range(len(w)):
            for l in range(1, min(max_len, len(w) - s) + 1):
                cnt[w[s:s + l]] += f
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0].encode("utf-8")))
    cand = dict(ranked[:vocab_size])
    for p, n in cnt.items():
        if len(p) == 1:
            cand[p] = n
    # byte-keyed, unsigned-lex sorted
    return wf, dict(sorted((p.encode("utf-8"), n) for p, n in cand.items()))


def expected_counts(wb, pieces, probs, idx, max_blen):
    n = len(wb)
    if n == 0:
        return {}
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        a = 0.0
        for j in range(max(0, i - max_blen), i):
            if alpha[j] != 0.0:
                k = idx.get(wb[j:i])
                if k is not None:
                    a += alpha[j] * probs[k]
        alpha[i] = a
    if alpha[n] == 0.0:
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for j in range(n - 1, -1, -1):
        b = 0.0
        for i in range(j + 1, min(n, j + max_blen) + 1):
            if beta[i] != 0.0:
                k = idx.get(wb[j:i])
                if k is not None:
                    b += probs[k] * beta[i]
        beta[j] = b
    acc = {}
    for j in range(n):
        if alpha[j] == 0.0:
            continue
        for i in range(j + 1, min(n, j + max_blen) + 1):
            k = idx.get(wb[j:i])
            if k is not None and beta[i] != 0.0:
                c = alpha[j] * probs[k] * beta[i]
                acc[k] = acc.get(k, 0.0) + c
    z = alpha[n]
    out = {}
    for k in sorted(acc):
        m = round(acc[k] / z * 1e6)
        if m != 0:
            out[k] = m
    return out


def train_em(vocab_size, max_len, iters):
    wf, cand = seed(vocab_size, max_len)
    pieces = list(cand.keys())           # sorted unsigned-lex
    counts = [cand[p] for p in pieces]
    for _ in range(iters):
        total = sum(counts)
        probs = [c / total for c in counts]
        idx = {p: i for i, p in enumerate(pieces)}
        max_blen = max(len(p) for p in pieces)
        nxt = [0] * len(pieces)
        for w, f in wf.items():
            for k, m in expected_counts(w.encode("utf-8"), pieces, probs,
                                        idx, max_blen).items():
                nxt[k] += m * f
        keep = [i for i, c in enumerate(nxt) if c > 0]
        pieces = [pieces[i] for i in keep]
        counts = [nxt[i] for i in keep]
    total = sum(counts)
    scores = {p: round(math.log(c / total) * 1e6) for p, c in zip(pieces, counts)}
    for b in range(256):
        scores.setdefault(bytes([b]), FALLBACK)
    spieces = sorted(scores)
    ids = {p: i for i, p in enumerate(spieces)}
    return scores, ids, max(len(p) for p in spieces)


def encode_ids(text, scores, ids, max_len):
    b = text.encode("utf-8")
    n = len(b)
    if n == 0:
        return []
    best = [None] * (n + 1)
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
    out, start = [], 0
    for end in cuts:
        out.append(ids[b[start:end]])
        start = end
    return out


def main():
    vs = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    ml = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    it = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    scores, ids, max_blen = train_em(vs, ml, it)
    rows = []
    for fid, t in enumerate(FIXTURES):
        e = encode_ids(t, scores, ids, max_blen)
        rows.append((fid, len(e), sum(e)))
    print(",".join("(%d,%d,%d)" % r for r in rows))


if __name__ == "__main__":
    main()
