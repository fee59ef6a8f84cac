#!/usr/bin/env python3
"""Generate the committed PNG fixture corpus behind `image_phash`,
`dedup_image` and `image_meta` (src/main/resources/graft/images), plus the
hand-derived VALUES-oracle rows — computed HERE, in pure Python, with no
code shared with the Scala operators (the warc_host_stats pattern).

Images (all RGB, 8-bit, written by a stdlib-only PNG encoder):
  img0  64x64 base image: smooth gradients + a bright block (low-freq
        structure so the DCT hash has signal)
  img1  byte-level re-encode of img0 (identical pixels, different zlib
        level -> different file bytes): phash/dhash MUST equal img0's
  img2  img0 box-downsampled to 32x32 (exact integer 2x2 means, floored):
        a true resize near-dup -> small hamming distance to img0
  img3  distinct image (different gradient family)
  img4  distinct image (checkerboard + opposite gradient)

Hash definitions (the spec the Scala side implements):
  luma(px)   = 299*r + 587*g + 114*b            (integer milli-luma)
  dhash      - 9x8 grid of box sums over the ORIGINAL image, integer
               boundaries floor(i*W/9), floor(j*H/8); bit[j*8+i] = 1 iff
               mean(block[j][i]) < mean(block[j][i+1]), compared EXACTLY
               via cross-multiplied integer sums. 64 bits, %016x hex.
  phash      - box-mean the luma grid to 32x32 (double mean = sum/cnt),
               2-D DCT-II c(u,v) = sum_y sum_x m[y][x]*cos[u][x]*cos[v][y]
               with cos[u][x] = cos(pi*(2x+1)*u/64), accumulated in row-
               major order; coefficients (u,v) in the top-left 8x8 minus
               DC (63 values, (u,v) scanned v-major: v*8+u ... bit index
               below); median = sorted[31]; bit = coef > median. Bit i
               (i = v*8+u - 1, skipping DC) of a 64-bit word, bit 63 = 0.
  dedup      - 4 x 16-bit bands of the phash; candidate pairs share >= 1
               band; verified pairs have hamming(phash) <= 10.

The script asserts an ulp-safety margin: every DCT coefficient must sit
at relative distance > 1e-6 from the median, so a 1-ulp libm cos()
difference between JVM and CPython can never flip a bit (the VALUES
oracle is only pinnable because of this check).
"""
import math
import os
import struct
import sys
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "images")


def png_bytes(w, h, pix, level=9):
    """pix[y][x] = (r,g,b). Stdlib-only PNG encoder (color type 2)."""
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xffffffff))
    raw = b"".join(
        b"\x00" + bytes(c for x in range(w) for c in pix[y][x])
        for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" +
            chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)) +
            chunk(b"IDAT", zlib.compress(raw, level)) +
            chunk(b"IEND", b""))


def noise(x, y, salt):
    """Deterministic per-pixel scramble (integer hash, no RNG state) —
    linear gradients alone give separable DCT spectra full of knife-edge
    median ties; this keeps every coefficient distinct."""
    v = (x * 2654435761 + y * 40503 + salt * 69069) & 0xffffffff
    v ^= v >> 13
    v = (v * 1274126177) & 0xffffffff
    return (v >> 8) % 97


def base_img(w=64, h=64):
    pix = [[((x * 3 + y + noise(x, y, 1)) % 256,
             (x + y * 2 + noise(x, y, 2)) % 256,
             (x * 2 + y * 3 + noise(x, y, 3)) % 256)
            for x in range(w)] for y in range(h)]
    for y in range(8, 24):          # bright block: low-frequency structure
        for x in range(12, 44):
            pix[y][x] = (250 - noise(x, y, 4) % 16, 240, 230)
    for y in range(40, 56):         # dark block
        for x in range(30, 60):
            pix[y][x] = (10, 20 + noise(x, y, 5) % 16, 15)
    return pix


def img3(w=64, h=64):
    pix = [[((255 - x * 4 + noise(x, y, 7)) % 256,
             (x * 5 + y * 7 + noise(x, y, 8)) % 256,
             (y * 9 + noise(x, y, 9)) % 256)
            for x in range(w)] for y in range(h)]
    for y in range(30, 62):
        for x in range(2, 20):
            pix[y][x] = (240, 10 + noise(x, y, 10) % 20, 10)
    return pix


def img4(w=64, h=64):
    return [[(((x // 8 + y // 8) % 2) * 200 + noise(x, y, 11) % 55,
              (y * 3 + noise(x, y, 12)) % 256,
              (255 - y * 2 - noise(x, y, 13)) % 256)
             for x in range(w)] for y in range(h)]


def downsample2(pix):
    """Exact 2x2 integer box mean, floored per channel (img2 = resize)."""
    h, w = len(pix), len(pix[0])
    return [[tuple(sum(pix[2 * y + dy][2 * x + dx][c]
                       for dy in (0, 1) for dx in (0, 1)) // 4
                   for c in range(3))
             for x in range(w // 2)] for y in range(h // 2)]


def luma_grid(pix):
    return [[299 * r + 587 * g + 114 * b for (r, g, b) in row]
            for row in pix]


def dhash(pix):
    lm = luma_grid(pix)
    h, w = len(lm), len(lm[0])
    xs = [i * w // 9 for i in range(10)]
    ys = [j * h // 8 for j in range(9)]
    sums, cnts = {}, {}
    for j in range(8):
        for i in range(9):
            s = sum(lm[y][x] for y in range(ys[j], ys[j + 1])
                    for x in range(xs[i], xs[i + 1]))
            c = (ys[j + 1] - ys[j]) * (xs[i + 1] - xs[i])
            sums[(j, i)], cnts[(j, i)] = s, c
    bits = 0
    for j in range(8):
        for i in range(8):
            # mean(j,i) < mean(j,i+1)  <=>  s_a * c_b < s_b * c_a (exact)
            if (sums[(j, i)] * cnts[(j, i + 1)]
                    < sums[(j, i + 1)] * cnts[(j, i)]):
                bits |= 1 << (j * 8 + i)
    return bits


def phash(pix, check_margin=True):
    lm = luma_grid(pix)
    h, w = len(lm), len(lm[0])
    xs = [i * w // 32 for i in range(33)]
    ys = [j * h // 32 for j in range(33)]
    m = [[0.0] * 32 for _ in range(32)]
    for j in range(32):
        for i in range(32):
            s = sum(lm[y][x] for y in range(ys[j], ys[j + 1])
                    for x in range(xs[i], xs[i + 1]))
            c = (ys[j + 1] - ys[j]) * (xs[i + 1] - xs[i])
            m[j][i] = s / c
    cos = [[math.cos(math.pi * (2 * x + 1) * u / 64) for x in range(32)]
           for u in range(8)]
    coefs = []
    for v in range(8):
        for u in range(8):
            if u == 0 and v == 0:
                continue
            acc = 0.0
            for y in range(32):
                for x in range(32):
                    acc += m[y][x] * cos[u][x] * cos[v][y]
            coefs.append(acc)
    med = sorted(coefs)[31]
    if check_margin:
        margin = min(abs(c - med) for c in coefs if c != med)
        rel = margin / max(abs(med), 1.0)
        assert rel > 1e-6, f"ulp-unsafe DCT margin {rel}"
    bits = 0
    for i, c in enumerate(coefs):
        if c > med:
            bits |= 1 << i
    return bits


def hamming(a, b):
    return bin(a ^ b).count("1")


def main():
    os.makedirs(OUT, exist_ok=True)
    a = base_img()
    imgs = [
        ("img0.png", a, 9),
        ("img1.png", a, 1),            # re-encode: same pixels, new bytes
        ("img2.png", downsample2(a), 9),
        ("img3.png", img3(), 9),
        ("img4.png", img4(), 9),
    ]
    rows = []
    seen = {}
    for name, pix, level in imgs:
        data = png_bytes(len(pix[0]), len(pix), pix, level)
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        if name != "img1.png":         # img1 shares img0's pixel array
            assert data != seen.get("img0.png", b""), "re-encode degenerate"
        seen[name] = data
        doc_id = int(name[3])
        ph, dh = phash(pix), dhash(pix)
        lm = luma_grid(pix)
        rows.append((doc_id, len(pix[0]), len(pix),
                     len(pix) * len(pix[0]),
                     sum(sum(r) for r in lm), f"{ph:016x}", f"{dh:016x}"))
    assert seen["img0.png"] != seen["img1.png"], "re-encode produced same bytes"

    print("-- image_meta / image_phash VALUES rows "
          "(doc_id, width, height, n_pixels, luma_milli_total, phash, dhash)")
    for r in rows:
        print(f"  ({r[0]}, {r[1]}, {r[2]}, {r[3]}, {r[4]}, "
              f"'{r[5]}', '{r[6]}'),")

    print("\n-- image_resize VALUES rows (doc_id, width, height, "
          "luma_milli_total of the exact 2x2 box-downsampled image)")
    for name, pix, _ in imgs:
        small = downsample2(pix)
        lm = luma_grid(small)
        print(f"  ({int(name[3])}, {len(small[0])}, {len(small)}, "
              f"{sum(sum(r) for r in lm)}),")

    print("\n-- phash hamming distances")
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = hamming(int(rows[i][5], 16), int(rows[j][5], 16))
            print(f"  {rows[i][0]}-{rows[j][0]}: {d}")

    print("\n-- dedup_image pairs (banded candidates, hamming <= 10)")
    def bands(hsh):
        return {(k, (hsh >> (16 * k)) & 0xffff) for k in range(4)}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            hi, hj = int(rows[i][5], 16), int(rows[j][5], 16)
            if bands(hi) & bands(hj) and hamming(hi, hj) <= 10:
                print(f"  ({rows[i][0]}, {rows[j][0]}, "
                      f"{hamming(hi, hj)}),")
    return 0


if __name__ == "__main__":
    sys.exit(main())
