#!/usr/bin/env python3
"""Independent reimplementation of the image dHash pipeline (see
graft.functions.ImageExprs.ImageDHash) over the deterministic planted
corpus of x86/x87 — no codec needed: the synthetic pattern is closed-form
(r=(x*31+y*17)%256, g=(x*13+y*29)%256, b=(x*7+y*23)%256; PNG round-trips
8-bit RGB losslessly, proven by x29/x67), resizes are the explicit floor
mapping src = floor(dst*srcDim/dstDim), the 9x8 dHash grid uses the same
mapping, brightness is r+g+b, bit(y*8+x) = g(x+1,y) > g(x,y) row-major.

Corpus (img ids are sf-independent):
  base     i        (1..48): dims (i%16+17, i%12+13)
  variant  i+1000   (i%4==0): base resized to (sw+2, sh+1)
  copy     i+2000   (i%6==0): byte-identical re-encode of base

Near-dup rule (x87): 4 bands of 16 bits; candidate pairs share >=1 band
value; keep hamming <= 6, id_a < id_b.

Prints the VALUES rows for both oracles.
"""


def base_px(x, y):
    return ((x * 31 + y * 17) % 256, (x * 13 + y * 29) % 256, (x * 7 + y * 23) % 256)


def dims(i):
    return (i % 16 + 17, i % 12 + 13)


def dhash(px, w, h):
    def gray(gx, gy):
        sx = gx * w // 9
        sy = gy * h // 8
        r, g, b = px(sx, sy)
        return r + g + b
    hv = 0
    for y in range(8):
        for x in range(8):
            if gray(x + 1, y) > gray(x, y):
                hv |= 1 << (y * 8 + x)
    return hv


def signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def corpus():
    imgs = []
    for i in range(1, 49):
        sw, sh = dims(i)
        imgs.append((i, lambda x, y: base_px(x, y), sw, sh))
        if i % 4 == 0:
            vw, vh = sw + 2, sh + 1
            def vpx(x, y, sw=sw, sh=sh, vw=vw, vh=vh):
                return base_px(x * sw // vw, y * sh // vh)
            imgs.append((i + 1000, vpx, vw, vh))
        if i % 6 == 0:
            imgs.append((i + 2000, lambda x, y: base_px(x, y), sw, sh))
    return imgs


def main():
    hashes = [(iid, dhash(px, w, h)) for iid, px, w, h in corpus()]
    print("-- x86 (img_id, dhash):")
    print(",".join("(%d,%d)" % (iid, signed64(hv)) for iid, hv in hashes))

    by_band = {}
    for iid, hv in hashes:
        for b in range(4):
            by_band.setdefault((b, (hv >> (16 * b)) & 0xFFFF), []).append((iid, hv))
    cand = set()
    for members in by_band.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (a, ha), (b_, hb) = members[i], members[j]
                if a == b_:
                    continue
                lo, hi = min(a, b_), max(a, b_)
                cand.add((lo, hi))
    hm = dict(hashes)
    pairs = sorted((a, b, bin(hm[a] ^ hm[b]).count("1"))
                   for a, b in cand if bin(hm[a] ^ hm[b]).count("1") <= 6)
    print("-- x87 (id_a, id_b, hamming): %d pairs" % len(pairs))
    print(",".join("(%d,%d,%d)" % p for p in pairs))


if __name__ == "__main__":
    main()
