"""Perceptual-hash near-dup recall/cost curve at 10^5 scale (r4 verdict
item 3 / builder agenda item 3) — the media twin of the minhash band study.

Corpus: ``N_BASE`` deterministic 9x8 RGB PNGs whose dHash is EXACTLY
controllable — the image is already at dHash's 8-row x 9-col comparison
geometry (resize_nearest is the identity), all three channels carry the
same value (the 299/587/114 luma is then exact), and each row's pixel
walk encodes the wanted 64-bit pattern as +STEP / -STEP moves, far from
the < boundary.  For ``M_VARIANTS`` of the base images we plant:

* a brightness-shifted twin and a pixel-doubled twin (hamming 0 by dHash
  construction), and
* bit-flip variants at EXACT hamming distances {1, 3, 6} (flip k chosen
  comparison bits, rebuild the image).

Every planted pair's true distance is known, so recall is exact: at
radius r with the pigeonhole-sized slice count, recall of planted pairs
with distance <= r MUST be 1.0 — anything less is a bug by construction
(the r4 simhash blocking bug would have shown here as recall < 1 at
radius 6).  Cost is the candidate-row count BEFORE the hamming filter,
computed analytically per (n_chunks): sum over (slice, bucket,
partition) of C(m, 2) — exactly the rows the blocking self-join emits
pre-distinct — plus the measured wall of the full pair job.

The decode path is the real one: payloads go through PNG decode inside
``multimodal.image_dhashes`` (mapInPandas), not a hash shortcut.

Writes BENCH/phash_curve_r5.json.  Usage: python tools/phash_curve.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = f"{_ROOT}:" + os.environ.get("PYTHONPATH", "")

N_BASE = int(os.environ.get("CRAWLSPARK_PHASH_BASE", "100000"))
M_VARIANTS = int(os.environ.get("CRAWLSPARK_PHASH_VARIANTS", "2000"))
CORES = int(os.environ.get("CRAWLSPARK_PHASH_CORES", "16"))
OUT = os.path.join(_ROOT, "BENCH", "phash_curve_r5.json")

STEP = 12          # pixel walk step: |diff| = 12 >> 0, so brightness
BASE_VAL = 120     # shifts (no clipping) can never flip a comparison
FLIP_DISTS = (1, 3, 6)

# id layout: base i -> variants at N_BASE + i * 8 + slot
_SLOT_BRIGHT, _SLOT_DOUBLE = 0, 1
_SLOT_FLIP = {1: 2, 3: 3, 6: 4}


def _bits_of(i: int):
    """Deterministic 64-bit pattern for base image i (md5-seeded)."""
    import hashlib

    raw = hashlib.md5(f"phash-curve:{i}".encode()).digest()[:8]
    v = int.from_bytes(raw, "big")
    return [(v >> b) & 1 for b in range(64)]


def _img_from_bits(bits, shift: int = 0, double: bool = False):
    """9-col x 8-row RGB uint8 array whose dHash == bits (row-major)."""
    import numpy as np

    g = np.zeros((8, 9), dtype=np.int32)
    for r in range(8):
        v = BASE_VAL
        g[r, 0] = v
        for c in range(8):
            v = v + STEP if bits[r * 8 + c] else v - STEP
            g[r, c + 1] = v
    g = (g + shift).clip(0, 255).astype("uint8")
    if double:
        g = g.repeat(2, axis=0).repeat(2, axis=1)
    return np.stack([g, g, g], axis=-1)


def _flip(bits, k: int):
    """Flip k fixed positions (spread across slices so no single slice
    absorbs all flips — the adversarial case for blocking)."""
    out = list(bits)
    for j in range(k):
        pos = (j * 23 + 5) % 64
        out[pos] ^= 1
    return out


def _gen_batch(ids, n_base: int, m_variants: int):
    """Rows (media_id, kind, payload) for a batch of BASE ids, including
    each sampled base's planted variants."""
    from crawlspark.multimodal import encode_png

    rows = []
    for i in ids:
        bits = _bits_of(i)
        rows.append((i, "image", encode_png(_img_from_bits(bits))))
        if i < m_variants:
            vb = n_base + i * 8
            rows.append((vb + _SLOT_BRIGHT, "image",
                         encode_png(_img_from_bits(bits, shift=7))))
            rows.append((vb + _SLOT_DOUBLE, "image",
                         encode_png(_img_from_bits(bits, double=True))))
            for k, slot in _SLOT_FLIP.items():
                rows.append((vb + slot, "image",
                             encode_png(_img_from_bits(_flip(bits, k)))))
    return rows


def _planted_pairs(m_variants: int, n_base: int):
    """(id_a, id_b) -> true hamming distance for every planted pair."""
    truth = {}
    for i in range(m_variants):
        vb = n_base + i * 8
        truth[(i, vb + _SLOT_BRIGHT)] = 0
        truth[(i, vb + _SLOT_DOUBLE)] = 0
        for k, slot in _SLOT_FLIP.items():
            truth[(i, vb + slot)] = k
    return truth


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from crawlspark import multimodal, textops
    from crawlspark.session import get_spark

    spark = get_spark(
        f"phash-curve-{CORES}", master=f"local[{CORES}]",
        shuffle_partitions=max(16, CORES),
        extra_conf={"spark.driver.memory": "16g"},
    )

    # sanity: the constructed image's dHash must equal the bit pattern
    bits = _bits_of(7)
    want = sum(b << i for i, b in enumerate(bits))
    want = want - (1 << 64) if want >= (1 << 63) else want
    got = multimodal.image_dhash(_img_from_bits(bits))
    assert got == want, (got, want)
    assert multimodal.image_dhash(_img_from_bits(bits, shift=7)) == got
    assert multimodal.image_dhash(_img_from_bits(bits, double=True)) == got
    for k in FLIP_DISTS:
        d = bin((got ^ multimodal.image_dhash(
            _img_from_bits(_flip(bits, k)))) & ((1 << 64) - 1)).count("1")
        assert d == k, (k, d)

    def _gen(batches):
        for pdf in batches:
            rows = _gen_batch([int(x) for x in pdf["id"]], N_BASE, M_VARIANTS)
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload"])

    media = (
        spark.range(N_BASE)
        .repartition(CORES * 4)
        .mapInPandas(_gen, "media_id long, kind string, payload binary")
    )
    t0 = time.monotonic()
    hashes = (
        multimodal.image_dhashes(media)
        .filter(F.col("dhash").isNotNull())
        .localCheckpoint(eager=True)  # one decode pass for every cell
    )
    n_hashed = hashes.count()
    decode_wall = round(time.monotonic() - t0, 2)
    truth = _planted_pairs(M_VARIANTS, N_BASE)

    cells = []
    # (radius, n_chunks): pigeonhole default + an over-blocking contrast
    for radius, n_chunks in ((0, 2), (1, 2), (3, 4), (3, 8), (6, 8), (7, 8)):
        t0 = time.monotonic()
        pairs = textops.hamming_neardup_pairs(
            hashes, id_col="media_id", hash_col="dhash",
            max_hamming=radius, n_chunks=n_chunks,
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in pairs.collect()
        }
        wall = round(time.monotonic() - t0, 2)
        wanted = {p for p, d in truth.items() if d <= radius}
        missed = wanted - got
        recall = 1.0 if not wanted else round(
            (len(wanted) - len(missed)) / len(wanted), 4
        )
        # analytic candidate count: the blocking join's pre-distinct rows
        width = 64 // n_chunks
        mask = (1 << width) - 1
        sliced = hashes.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftrightunsigned(F.col("dhash"), c * width)
                        .bitwiseAND(F.lit(mask)).alias("cv"),
                    )
                    for c in range(n_chunks)
                ])
            ).alias("ch")
        ).select("ch.ci", "ch.cv")
        cand = (
            sliced.groupBy("ci", "cv").count()
            .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c"))
            .collect()[0]["c"]
        )
        cell = {
            "radius": radius, "n_chunks": n_chunks,
            "recall_planted": recall,
            "planted_expected": len(wanted), "planted_missed": len(missed),
            "pairs_found": len(got),
            "candidate_rows_prefilter": int(cand),
            "blowup_candidates_per_pair": round(cand / max(len(got), 1), 1),
            "wall_sec": wall,
        }
        cells.append(cell)
        print(f"cell {cell}", file=sys.stderr)

    out = {
        "metric": "perceptual-hash near-dup recall/cost vs radius & slices",
        "n_base": N_BASE, "m_variants": M_VARIANTS,
        "n_hashed": n_hashed, "cores": CORES,
        "decode_wall_sec": decode_wall,
        "cells": cells,
        "all_recall_1": all(c["recall_planted"] == 1.0 for c in cells),
    }
    spark.stop()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
