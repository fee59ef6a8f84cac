#!/usr/bin/env python3
"""Generate the committed AVI fixture corpus behind `video_phash`,
`dedup_video` and `video_dup_clusters` (src/main/resources/graft/videos),
plus the hand-derived VALUES-oracle rows — computed HERE, in pure Python,
with no code shared with the Scala operators (the make_image_fixture.py
pattern; this script IMPORTS that one's independent phash/luma derivation,
which was written against the published pHash definition, not against the
Scala code).

Videos (all 64x64 RGB 24-bit, written by a stdlib-only AVI muxer using
UNCOMPRESSED raw-DIB `##db` frames — the RIFF/AVI and BMP DIB layouts are
public specs and need no codec):
  vid0.avi  6 frames: the image fixture's deterministic noise/gradient
            pattern families, one salt per frame (distinct pHashes, each
            ulp-margin-checked)
  vid1.avi  RE-CONTAINER of vid0: identical pixels, but every frame is
            stored TOP-DOWN (negative biHeight DIB) instead of bottom-up,
            with JUNK chunks interleaved in the movi list — every byte of
            the container differs, every frame hash MUST be identical
  vid2.avi  PARTIAL near-dup: vid0's frames 0-3 plus two distinct frames
            -> 4/6 = 6666 bp coverage on both sides vs vid0/vid1 (above
            the 5000 bp gate)
  vid3.avi  6 fully distinct frames -> pairs with nothing

Pair definition (the spec the Scala side implements):
  frame phash  - identical to the image fixture's (box-mean 32x32, DCT-II,
                 median threshold; see make_image_fixture.py docstring)
  candidates   - frame pairs of DIFFERENT videos sharing >= 1 of the 4
                 16-bit phash bands, verified at hamming <= 10
  rollup       - per (video_a, video_b): matched_a/matched_b = DISTINCT
                 matched frame indexes per side; match_bp =
                 min(matched_a*10000//frames_a, matched_b*10000//frames_b);
                 keep pairs with match_bp >= 5000
  clusters     - connected components of the kept pairs, min-id label
"""
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_image_fixture import phash, hamming, noise, base_img, img3, img4

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "videos")

W = H = 64
MAX_HAMMING = 10
MIN_BP = 5000


def frame_a(salt, w=W, h=H):
    """Gradient family A with a per-frame moving bright block."""
    pix = [[((x * 3 + y + noise(x, y, salt)) % 256,
             (x + y * 2 + noise(x, y, salt + 1)) % 256,
             (x * 2 + y * 3 + noise(x, y, salt + 2)) % 256)
            for x in range(w)] for y in range(h)]
    off = (salt * 7) % 24
    for y in range(4 + off, 20 + off):
        for x in range(10, 50):
            pix[y][x] = (245 - noise(x, y, salt + 3) % 16, 235, 225)
    return pix


def frame_b(salt, w=W, h=H):
    """Distinct family B: inverse gradients + dark band."""
    pix = [[((255 - x * 5 + noise(x, y, salt)) % 256,
             (y * 6 + noise(x, y, salt + 1)) % 256,
             (x * 4 + y + noise(x, y, salt + 2)) % 256)
            for x in range(w)] for y in range(h)]
    off = (salt * 5) % 20
    for y in range(36 + off // 2, 60):
        for x in range(30 + off, 64):
            pix[y][x] = (8, 12 + noise(x, y, salt + 3) % 12, 20)
    return pix


def dib_rows(pix, top_down):
    """24-bit DIB pixel array: BGR triples, rows padded to 4 bytes,
    bottom-up unless top_down."""
    h, w = len(pix), len(pix[0])
    pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
    ys = range(h) if top_down else range(h - 1, -1, -1)
    return b"".join(
        bytes(c for x in range(w) for c in
              (pix[y][x][2], pix[y][x][1], pix[y][x][0])) + pad
        for y in ys)


def chunk(tag, data):
    return tag + struct.pack("<I", len(data)) + data + (
        b"\x00" if len(data) % 2 else b"")


def avi_bytes(frames, top_down=False, junk=False):
    """Stdlib AVI muxer: RIFF('AVI ') [ LIST(hdrl)[avih, LIST(strl)[strh,
    strf]], LIST(movi)[00db...] ] with raw 24-bit DIB frames."""
    h, w = len(frames[0]), len(frames[0][0])
    bi_h = -h if top_down else h
    strf = struct.pack("<IiiHHIIiiII", 40, w, bi_h, 1, 24, 0,
                       len(dib_rows(frames[0], top_down)), 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHiIIIIIIII",
            0, 0, 0, 0, 0, 1, 25, len(frames), 0, 0, 0, 0) +
            struct.pack("<hhhh", 0, 0, w, h))
    avih = struct.pack("<IIIIIIIIIIIIII", 40000, 0, 0, 0, len(frames), 0,
                       1, 0, w, h, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf))) + \
        b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi"
    for i, f in enumerate(frames):
        if junk:
            movi_body += chunk(b"JUNK", b"\x5a" * (17 + 3 * i))
        movi_body += chunk(b"00db", dib_rows(f, top_down))
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def main():
    os.makedirs(OUT, exist_ok=True)
    v0 = [frame_a(11), frame_a(29), frame_a(47), frame_a(83),
          base_img(), img3()]
    v2 = v0[:4] + [frame_b(19), img4()]
    v3 = [frame_b(7), frame_b(31), frame_b(53), frame_b(71),
          frame_b(97), frame_b(113)]
    vids = {0: v0, 1: v0, 2: v2, 3: v3}
    files = {
        0: avi_bytes(v0),
        1: avi_bytes(v0, top_down=True, junk=True),
        2: avi_bytes(v2),
        3: avi_bytes(v3),
    }
    assert files[0] != files[1], "re-container degenerate"
    for i, data in files.items():
        with open(os.path.join(OUT, f"vid{i}.avi"), "wb") as f:
            f.write(data)

    hashes = {i: [phash(f) for f in fs] for i, fs in vids.items()}
    print("-- video_phash VALUES rows (doc_id, frame_idx, phash)")
    for i in sorted(hashes):
        for k, ph in enumerate(hashes[i]):
            print(f"  ({i}, {k}, '{ph:016x}'),")
    assert hashes[0] == hashes[1], "top-down DIB changed a hash"

    def bands(hsh):
        return {(k, (hsh >> (16 * k)) & 0xffff) for k in range(4)}

    print("\n-- cross-video frame hamming (candidates only)")
    pairs = []
    for a in sorted(hashes):
        for b in sorted(hashes):
            if a >= b:
                continue
            ma, mb = set(), set()
            for ia, ha in enumerate(hashes[a]):
                for ib, hb in enumerate(hashes[b]):
                    if bands(ha) & bands(hb) and hamming(ha, hb) <= MAX_HAMMING:
                        ma.add(ia)
                        mb.add(ib)
            if not ma:
                continue
            fa, fb = len(hashes[a]), len(hashes[b])
            bp = min(len(ma) * 10000 // fa, len(mb) * 10000 // fb)
            print(f"  {a}-{b}: matched_a={len(ma)} matched_b={len(mb)} "
                  f"frames={fa}/{fb} bp={bp}")
            if bp >= MIN_BP:
                pairs.append((a, b, len(ma), len(mb), fa, fb, bp))

    print("\n-- dedup_video VALUES rows "
          "(doc_a, doc_b, matched_a, matched_b, frames_a, frames_b, match_bp)")
    for p in pairs:
        print(f"  ({p[0]}, {p[1]}, {p[2]}, {p[3]}, {p[4]}, {p[5]}, {p[6]}),")

    # connected components, min-id label
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b, *_ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    print("\n-- video_dup_clusters VALUES rows (doc_id, component)")
    for d in sorted(parent):
        print(f"  ({d}, {find(d)}),")
    return 0


if __name__ == "__main__":
    sys.exit(main())
