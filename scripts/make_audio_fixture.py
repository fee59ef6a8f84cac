#!/usr/bin/env python3
"""Generate the committed WAV fixture corpus behind `audio_fingerprint` and
`dedup_audio` (src/main/resources/graft/audio), plus the hand-derived
VALUES-oracle rows — computed HERE in pure Python (stdlib-only WAV writer,
its own fingerprint code; the make_image_fixture.py pattern).

Files (PCM s16le mono, 8000 Hz):
  snd0.wav  base signal: 6500 frames, a deterministic amplitude envelope
            (per-segment ramp) so adjacent segment energies differ by a
            wide margin
  snd1.wav  SAME PCM bytes, different file bytes: a LIST/INFO metadata
            chunk appended after `data` (a re-containered copy) ->
            fingerprint MUST equal snd0's
  snd2.wav  amplitude-halved copy (sample // 2): energy scales ~uniformly,
            the energy-gradient comparisons survive -> same fingerprint
  snd3.wav  different envelope -> far
  snd4.wav  different envelope -> far

Fingerprint (the spec the Scala side implements):
  split the frame sequence into 65 segments with integer boundaries
  floor(i*n/65); energy_i = sum of sample^2 over segment i (exact Long —
  bounded by 2^63 up to ~6e7 samples/segment, i.e. multi-hour audio);
  bit i (0..63) = 1 iff energy_i < energy_{i+1}. 64 bits, %016x hex.
  Amplitude-scaling invariant (energies scale together), container
  invariant (PCM-derived), and exact-integer engine-independent.

The generator asserts a >1%% relative margin between every adjacent
energy pair of every fixture signal so the halved copy (integer flooring
perturbs energies by ~1e-4 relative) can never flip a comparison.
"""
import math
import os
import struct
import sys

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "audio")
RATE = 8000
NSEG = 65


def wav_bytes(samples, extra_chunk=False):
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, RATE, RATE * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
              b"data" + struct.pack("<I", len(data)) + data)
    if extra_chunk:
        info = b"INFOISFT" + struct.pack("<I", 10) + b"graft-gen\x00"
        chunks += b"LIST" + struct.pack("<I", len(info)) + info
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def envelope_signal(n, seed, base=3000, step=997):
    """Deterministic integer 'audio': per-segment amplitude ladder times a
    fast integer oscillation — no libm in the SIGNAL either, so the PCM is
    reproducible bit-for-bit from this file alone."""
    segs = [i * n // NSEG for i in range(NSEG + 1)]
    out = []
    amp = []
    # seeded up/down amplitude WALK with a fixed 5/2 step ratio: adjacent
    # segment energies always differ ~6x (the margin the halved copy must
    # survive) while the direction SEQUENCE — the fingerprint — is the
    # seed's own shape
    a = 900 + (seed * 997) % 2200
    for i in range(NSEG):
        amp.append(a)
        h = (i * 2654435761 + seed * 40503 + step) & 0xffffffff
        h ^= h >> 13
        up = (h >> 5) & 1 == 1
        nxt_up = a * 5 // 2 if a * 5 // 2 <= 26000 else None
        nxt_dn = a * 2 // 5 if a * 2 // 5 >= 900 else None
        if up and nxt_up is not None:
            a = nxt_up
        elif not up and nxt_dn is not None:
            a = nxt_dn
        else:
            a = nxt_up if nxt_up is not None else nxt_dn
    for i in range(NSEG):
        for k in range(segs[i], segs[i + 1]):
            # square-ish oscillation: +amp, -amp alternating with a slide
            v = amp[i] if (k % 7) < 4 else -amp[i]
            v += ((k * (seed + 3)) % 101) - 50
            out.append(max(-32768, min(32767, v)))
    return out


def fingerprint(samples, check_margin=True):
    n = len(samples)
    segs = [i * n // NSEG for i in range(NSEG + 1)]
    en = [sum(s * s for s in samples[segs[i]:segs[i + 1]])
          for i in range(NSEG)]
    if check_margin:
        for i in range(NSEG - 1):
            lo, hi = sorted((en[i], en[i + 1]))
            assert hi > 0 and (hi - lo) / hi > 0.01, \
                f"segment energies {i},{i+1} too close: {en[i]} {en[i+1]}"
    bits = 0
    for i in range(NSEG - 1):
        if en[i] < en[i + 1]:
            bits |= 1 << i
    return bits


def hamming(a, b):
    return bin(a ^ b).count("1")


def main():
    os.makedirs(OUT, exist_ok=True)
    s0 = envelope_signal(6500, seed=1)
    files = [
        ("snd0.wav", s0, False),
        ("snd1.wav", s0, True),                    # re-containered copy
        ("snd2.wav", [s // 2 for s in s0], False), # amplitude-halved
        ("snd3.wav", envelope_signal(6500, seed=9), False),
        ("snd4.wav", envelope_signal(5000, seed=40, base=9000), False),
    ]
    rows = []
    for name, samples, extra in files:
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(wav_bytes(samples, extra))
        fp = fingerprint(samples, check_margin=not name.startswith("snd2"))
        rows.append((int(name[3]), RATE, len(samples), f"{fp:016x}"))
    assert rows[0][3] == rows[1][3], "re-container changed the PCM?!"
    assert rows[0][3] == rows[2][3], \
        "halved copy flipped a comparison — widen the margins"
    print("-- audio_fingerprint VALUES rows "
          "(doc_id, sample_rate, n_frames, fp)")
    for r in rows:
        print(f"  ({r[0]}, {r[1]}, {r[2]}, '{r[3]}'),")
    print("\n-- fp hamming distances")
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            print(f"  {rows[i][0]}-{rows[j][0]}: "
                  f"{hamming(int(rows[i][3], 16), int(rows[j][3], 16))}")
    print("\n-- dedup_audio pairs (banded candidates, hamming <= 5)")
    def bands(hsh):
        return {(k, (hsh >> (16 * k)) & 0xffff) for k in range(4)}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            hi, hj = int(rows[i][3], 16), int(rows[j][3], 16)
            if bands(hi) & bands(hj) and hamming(hi, hj) <= 5:
                print(f"  ({rows[i][0]}, {rows[j][0]}, {hamming(hi, hj)}),")
    return 0


if __name__ == "__main__":
    sys.exit(main())
