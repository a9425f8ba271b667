#!/usr/bin/env python3
"""Independent WordPiece reimplementation for x106's frozen oracle VALUES.

Re-derives graft.functions.WordPiece.syntheticVocab from its spec (letters
in both classes + the listed multi-char pieces + digits ABSENT) and encodes
the BpeFixture strings with BERT's WordpieceTokenizer algorithm (greedy
longest-match-first, ## continuations, whole-word [UNK] on any mid-word
miss). Prints (fid, n_tokens, id_sum, n_unk) VALUES rows to freeze into
the x106 oracle SQL. Written independently of the Scala encoder — the two
implementations agreeing on every fixture is the check.
"""

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


def synthetic_vocab():
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    raw = letters + ["##" + c for c in letters] + [
        "the", "than", "th", "sca", "scan", "spark", "shuf",
        "##able", "##ble", "##le", "##ark", "##fle", "##ffle", "##an",
    ]
    # canonical order: [UNK] first, then sorted distinct
    pieces = ["[UNK]"] + sorted(set(raw))
    return pieces


def build_tables(pieces):
    initial, cont = {}, {}
    for pid, p in enumerate(pieces):
        if pid == 0:
            continue
        if p.startswith("##"):
            cont[p[2:]] = pid
        else:
            initial[p] = pid
    max_len = max(len(p) - 2 if p.startswith("##") else len(p)
                  for p in pieces[1:])
    return initial, cont, max_len


def encode(text, pieces):
    initial, cont, max_len = build_tables(pieces)
    out = []
    for word in text.split():
        ids = []
        i, dead = 0, False
        while i < len(word) and not dead:
            table = initial if i == 0 else cont
            hit = None
            for l in range(min(max_len, len(word) - i), 0, -1):
                pid = table.get(word[i:i + l])
                if pid is not None:
                    hit, step = pid, l
                    break
            if hit is None:
                dead = True
            else:
                ids.append(hit)
                i += step
        out.extend([0] if dead else ids)
    return out


def main():
    pieces = synthetic_vocab()
    rows = []
    for fid, text in enumerate(FIXTURES):
        ids = encode(text, pieces)
        rows.append((fid, len(ids), sum(ids), sum(1 for i in ids if i == 0)))
    print(",".join(f"({f},{n},{s},{u})" for f, n, s, u in rows))


if __name__ == "__main__":
    main()
