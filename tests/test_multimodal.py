from __future__ import annotations

import hashlib

import pytest

from crawlspark import multimodal


def test_plumbing_schema_and_determinism(spark):
    media = multimodal.synthesize_media(spark, 60)
    feats = multimodal.decode_features(media, strict=False)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 60
    r0 = rows[0]
    assert len(r0["features"]) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in r0["features"])
    # sha256 matches a local recomputation (payload integrity through Arrow)
    payload = hashlib.sha256(b"media:0").digest() * 1
    assert r0["payload_sha256"] == hashlib.sha256(payload).hexdigest()
    # second run identical
    rows2 = {r["media_id"]: r for r in multimodal.decode_features(media, strict=False).collect()}
    assert all(rows[k]["features"] == rows2[k]["features"] for k in rows)


def test_strict_mode_raises(spark):
    media = multimodal.synthesize_media(spark, 5)
    feats = multimodal.decode_features(media, strict=True)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        feats.collect()


def test_metadata_projection(spark):
    media = multimodal.synthesize_media(spark, 30)
    meta = multimodal.media_metadata(media).collect()
    assert len(meta) == 30
    kinds = {r["kind"] for r in meta}
    assert kinds == {"image", "audio", "video"}
    assert all(r["n_bytes"] > 0 for r in meta)


# ------------------------------------------------------- real codecs (stdlib)

def test_png_roundtrip_exact():
    import numpy as np

    rng = multimodal._seed_bytes("roundtrip", 12 * 10 * 3)
    arr = rng.reshape(12, 10, 3)
    data = multimodal.encode_png(arr)
    back = multimodal.decode_png(data)
    assert back.shape == (12, 10, 3)
    assert (back == arr).all()
    # gray and RGBA shapes too
    g = multimodal._seed_bytes("gray", 7 * 5).reshape(7, 5)
    assert (multimodal.decode_png(multimodal.encode_png(g))[:, :, 0] == g).all()
    a = multimodal._seed_bytes("rgba", 6 * 6 * 4).reshape(6, 6, 4)
    assert (multimodal.decode_png(multimodal.encode_png(a)) == a).all()


def test_png_all_filter_types_decode():
    """Re-filter a known image with every PNG filter type and check the
    decoder reconstructs identical pixels (spec §6 recurrences)."""
    import struct
    import zlib

    import numpy as np

    arr = multimodal._seed_bytes("filters", 9 * 9 * 3).reshape(9, 9, 3)
    h, w, ch = arr.shape
    stride, bpp = w * ch, ch
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = y % 5  # exercise None, Sub, Up, Average, Paeth
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (int(cur[i]) - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
    out = multimodal._unfilter_scanlines(bytes(raw), h, stride, bpp)
    assert (out.reshape(h, w, ch) == arr).all()


def test_wav_roundtrip_and_features():
    import numpy as np

    t = np.arange(16000, dtype=np.float32)
    samples = (np.sin(2 * np.pi * 440 * t / 16000) * 16384).astype(np.int16)
    data = multimodal.encode_wav(samples, 16000)
    rate, back = multimodal.decode_wav(data)
    assert rate == 16000 and back.shape == (16000, 1)
    assert (back[:, 0] == samples).all()
    f = multimodal._wav_features(data)
    assert abs(f[0] - 1.0 / 60.0) < 1e-3  # 1 second
    assert abs(f[3] - 0.3535) < 0.01  # rms of 0.5-amplitude sine = 0.5/sqrt(2)
    assert abs(f[5] - 440 * 2 / 16000) < 0.01  # zero-crossing rate of 440 Hz


def test_resize_nearest():
    import numpy as np

    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = multimodal.resize_nearest(arr, 2, 2)
    assert (small == np.array([[0, 2], [8, 10]], dtype=np.uint8)).all()
    big = multimodal.resize_nearest(arr, 8, 8)
    assert big.shape == (8, 8) and big[0, 0] == 0 and big[7, 7] == 15


def test_real_media_strict_decode(spark):
    """PNG/WAV/Y4M payloads decode for real even in strict mode, and mp4
    containers now box-parse to real metadata features; only the opaque
    codec-compressed blob (mkv-tagged) subset raises."""
    media = multimodal.synthesize_real_media(spark, 30)
    real = media.filter("meta_format != 'mkv'")
    rows = {r["media_id"]: r for r in multimodal.decode_features(real, strict=True).collect()}
    assert len(rows) == 28  # 30 minus media 11 and 29 (the opaque codec blobs)
    img0 = rows[0]  # media 0 is a 8x8 RGB PNG
    assert abs(img0["features"][0] - 8 / 4096.0) < 1e-6
    assert img0["features"][2] == 3 / 4.0
    aud = rows[1]  # media 1 is wav @16 kHz
    assert abs(aud["features"][1] - 16000 / 48000.0) < 1e-6  # float32 vs float64
    mp4 = rows[17]  # media 17 is the real ISOBMFF container (18s, 320x240)
    assert abs(mp4["features"][0] - 18.0 / 60.0) < 1e-6  # mvhd duration
    assert abs(mp4["features"][2] - 320 / 4096.0) < 1e-6  # tkhd width
    assert abs(mp4["features"][3] - 240 / 4096.0) < 1e-6  # tkhd height
    assert mp4["features"][5] == 1.0 and mp4["features"][6] == 1.0  # vide+soun
    # deterministic across runs
    rows2 = {r["media_id"]: r for r in multimodal.decode_features(real, strict=True).collect()}
    assert all(rows[k]["features"] == rows2[k]["features"] for k in rows)

    import pytest as _pytest

    vids = media.filter("meta_format = 'mkv'")
    with _pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.decode_features(vids, strict=True).collect()


def test_mp4_box_roundtrip():
    """encode_mp4_meta → parse_mp4_boxes round-trips every metadata field."""
    data = multimodal.encode_mp4_meta(
        12_500, 1920, 1080, timescale=90000, brand=b"mp42", handlers=(b"vide", b"soun")
    )
    info = multimodal.parse_mp4_boxes(data)
    assert info["major_brand"] == "mp42"
    assert info["timescale"] == 90000
    assert info["duration_ms"] == 12_500
    assert info["n_tracks"] == 2
    assert info["width"] == 1920 and info["height"] == 1080
    assert info["handlers"] == ["vide", "soun"]


def test_mp4_box_parser_robustness():
    """Truncation / corruption stop the walk cleanly instead of raising,
    keeping whatever parsed before the damage (same tolerance contract as
    warc.read_warc)."""
    data = multimodal.encode_mp4_meta(3000, 640, 480)
    # truncated mid-moov: ftyp still parsed, no crash
    cut = multimodal.parse_mp4_boxes(data[: len(data) // 2])
    assert cut["major_brand"] == "isom"
    # size field lies (points past EOF): clean stop
    bad = bytearray(data)
    bad[0:4] = (2**31).to_bytes(4, "big")
    assert multimodal.parse_mp4_boxes(bytes(bad))["timescale"] is None
    # garbage is not a container
    assert multimodal.parse_mp4_boxes(b"\x00" * 64)["n_tracks"] == 0
    # 64-bit largesize header on the ftyp box still parses
    ftyp_payload = data[8:24]  # brand + ver + compat
    large = (
        (1).to_bytes(4, "big")
        + b"ftyp"
        + (16 + len(ftyp_payload)).to_bytes(8, "big")
        + ftyp_payload
    )
    assert multimodal.parse_mp4_boxes(large)["major_brand"] == "isom"


def test_mp4_deep_nesting_no_recursion_error():
    """A crafted payload of thousands of nested container headers (ADVICE
    r3: ~8 KB of nested moov boxes blew the recursion limit) parses cleanly:
    the iterative walk caps depth and keeps whatever was extracted."""
    depth = 5000
    inner = b""
    for _ in range(depth):
        inner = (len(inner) + 8).to_bytes(4, "big") + b"moov" + inner
    payload = (16).to_bytes(4, "big") + b"ftypisom" + (0).to_bytes(4, "big") + inner
    info = multimodal.parse_mp4_boxes(payload)  # must not raise
    assert info["major_brand"] == "isom"
    # and the non-strict pipeline path degrades to the digest stub, not a
    # stage-killing exception
    feats = multimodal._decode_one(payload, "video", strict=False)
    assert feats is None or len(feats) == multimodal.FEATURE_DIM


def test_mp4_strict_decode_vs_digest_fallback():
    """An ISOBMFF payload takes the real box-parse path (strict OK); an
    ftyp-only shell with no moov falls back to the digest stub and raises
    under strict."""
    import pytest as _pytest

    real = multimodal.encode_mp4_meta(2000, 320, 240)
    feats = multimodal._decode_one(real, "video", strict=True)
    assert abs(feats[0] - 2.0 / 60.0) < 1e-6
    shell = real[:24]  # ftyp box only
    with _pytest.raises(NotImplementedError):
        multimodal._decode_one(shell, "video", strict=True)
    fallback = multimodal._decode_one(shell, "video", strict=False)
    assert len(fallback) == multimodal.FEATURE_DIM


def test_y4m_roundtrip_and_features():
    import numpy as np

    # byte-exact luma round-trip
    frames = np.arange(3 * 8 * 8, dtype=np.uint8).reshape(3, 8, 8)
    data = multimodal.encode_y4m(frames, (30, 1))
    (num, den), back = multimodal.decode_y4m(data)
    assert (num, den) == (30, 1) and back.shape == (3, 8, 8)
    assert (back == frames).all()

    # physical checks: duration, fps, dims, motion
    t, side, fps = 10, 16, 10
    static = np.full((t, side, side), 99, dtype=np.uint8)
    f = multimodal._y4m_features(multimodal.encode_y4m(static, (fps, 1)))
    assert abs(f[0] - (t / fps) / 60.0) < 1e-6  # 1 s clip
    assert abs(f[1] - fps / 120.0) < 1e-6
    assert abs(f[2] - side / 4096.0) < 1e-6 and abs(f[3] - side / 4096.0) < 1e-6
    assert abs(f[5] - 99 / 255.0) < 1e-3  # mean luma
    assert f[7] == 0.0  # static clip ⇒ zero motion

    moving = static.copy()
    for fr in range(t):
        moving[fr, :, (fr * 2) % side] = 255
    fm = multimodal._y4m_features(multimodal.encode_y4m(moving, (fps, 1)))
    assert fm[7] > 0.0  # moving stripe ⇒ positive motion

    # frame sampling bounds work on long clips
    assert multimodal.sample_frames(static, 4).shape[0] == 4
    assert (multimodal.sample_frames(static, 16) == static).all()


def test_y4m_colorspaces():
    import numpy as np

    frames = np.full((2, 4, 4), 42, dtype=np.uint8)
    y = frames.tobytes()
    for csp, chroma_per_frame in (
        ("C444", 2 * 16),
        ("C422", 2 * 8),
        ("Cmono", 0),
    ):
        head = f"YUV4MPEG2 W4 H4 F25:1 {csp}\n".encode()
        body = b"".join(b"FRAME\n" + y[i * 16 : (i + 1) * 16] + b"\x80" * chroma_per_frame for i in range(2))
        (_, _), back = multimodal.decode_y4m(head + body)
        assert back.shape == (2, 4, 4) and (back == 42).all()


def test_image_dhash_invariances():
    import numpy as np

    base = (
        multimodal._seed_bytes("dhash0", 32 * 32 * 3).reshape(32, 32, 3) % 128
    ) + 40  # range [40, 167]: headroom so shifts below never clip
    h = multimodal.image_dhash(base)
    assert h == multimodal.image_dhash(base)
    assert -(2 ** 63) <= h < 2 ** 63
    # uniform brightness shift keeps every adjacent-luma comparison: exact
    assert multimodal.image_dhash(base + 5) == h
    # exact pixel doubling samples the same thumbnail cells: exact
    doubled = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert multimodal.image_dhash(doubled) == h
    # grayscale 2-D input accepted
    gray = (multimodal._seed_bytes("dhashg", 16 * 16).reshape(16, 16) % 128) + 40
    assert isinstance(multimodal.image_dhash(gray), int)
    # different content is far away
    other = (
        multimodal._seed_bytes("dhash1", 32 * 32 * 3).reshape(32, 32, 3) % 128
    ) + 40
    d = bin(
        (multimodal.image_dhash(other) ^ h) & (2 ** 64 - 1)
    ).count("1")
    assert d > 10, f"distinct images should be many bits apart, got {d}"


def test_image_neardup_pairs_planted(spark):
    """Planted brightness-shifted PNG twins pair up at hamming 0; distinct
    images don't pair; non-PNG and corrupt payloads drop out as nulls."""
    import numpy as np

    rows = []
    for i in range(6):
        img = (
            multimodal._seed_bytes(f"nd{i}", 24 * 24 * 3).reshape(24, 24, 3) % 128
        ) + 40
        rows.append((i, None, "image", multimodal.encode_png(img), "png", None, 24, 24, None))
        rows.append(
            (
                100 + i,
                None,
                "image",
                multimodal.encode_png((img + 4).astype(np.uint8)),
                "png",
                None,
                24,
                24,
                None,
            )
        )
    rows.append((900, None, "audio", multimodal.encode_wav(np.zeros(160, dtype=np.int16)), "wav", None, None, None, 10))
    rows.append((901, None, "image", multimodal._PNG_SIG + b"\x00garbage", "png", None, 2, 2, None))
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    hashes = {r["media_id"]: r["dhash"] for r in multimodal.image_dhashes(media).collect()}
    assert hashes[900] is None and hashes[901] is None  # non-PNG + corrupt → null
    assert all(hashes[i] is not None for i in range(6))

    got = {(r["id_a"], r["id_b"]) for r in multimodal.image_neardup_pairs(media, max_hamming=3).collect()}
    assert got == {(i, 100 + i) for i in range(6)}

    # strict mode propagates the corrupt-payload error instead of nulling
    import pytest

    with pytest.raises(Exception):
        multimodal.image_dhashes(media, strict=True).collect()

    # r5: strict also rejects NULL payloads — strict=True now guarantees a
    # non-null hash per surviving row (was: nulls passed through silently)
    null_media = spark.createDataFrame(
        [(950, None, "image", None, "png", None, 2, 2, None)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):
        multimodal.image_dhashes(null_media, strict=True).collect()
    # non-strict keeps the pass-through-null contract
    got_null = multimodal.image_dhashes(null_media).collect()
    assert len(got_null) == 1 and got_null[0]["dhash"] is None


def test_audio_video_phash_invariances():
    import numpy as np

    # audio: seeded per-window amplitude patterns (constant-amplitude tones
    # have flat envelopes — useless for distance checks)
    def aud(tag):
        env = multimodal._seed_bytes(tag, 130).astype(np.int64) + 1
        return np.repeat(env * 50, 31).astype(np.int16)

    a = aud("audA")
    h = multimodal.audio_ahash(a)
    assert h == multimodal.audio_ahash(a)
    # exact gain invariance (no clipping) and integer stereo mono-mix
    assert multimodal.audio_ahash(a.astype(np.int64) * 3) == h
    assert multimodal.audio_ahash(np.stack([a, a], axis=1)) == h
    assert multimodal.audio_ahash(np.zeros(100, dtype=np.int16)) == 0
    assert multimodal.audio_ahash(np.zeros(0, dtype=np.int16)) == 0
    d = bin((multimodal.audio_ahash(aud("audB")) ^ h) & (2 ** 64 - 1)).count("1")
    assert d > 10, f"distinct audio should be many bits apart, got {d}"

    # video: seeded per-frame content
    def vid(tag):
        return multimodal._seed_bytes(tag, 10 * 16 * 16).reshape(10, 16, 16) % 200

    f = vid("vidA")
    hv = multimodal.video_mhash(f)
    assert hv == multimodal.video_mhash(f)
    # uniform brightness shift and exact spatial pixel-doubling: exact
    assert multimodal.video_mhash(f + 5) == hv
    assert multimodal.video_mhash(np.repeat(np.repeat(f, 2, axis=1), 2, axis=2)) == hv
    assert multimodal.video_mhash(np.full((5, 8, 8), 7, dtype=np.uint8)) == 0
    assert multimodal.video_mhash(np.zeros((0, 8, 8), dtype=np.uint8)) == 0
    dv = bin((multimodal.video_mhash(vid("vidB")) ^ hv) & (2 ** 64 - 1)).count("1")
    assert dv > 10, f"distinct video should be many bits apart, got {dv}"


def test_media_neardup_pairs_planted_all_kinds(spark):
    """One decode pass pairs near-dups within every kind; kind-partitioned
    blocking keeps the hash-0 degenerates (silent audio, static video)
    from cross-pairing."""
    import numpy as np

    img = (multimodal._seed_bytes("mm0", 24 * 24 * 3).reshape(24, 24, 3) % 128) + 40
    aud_env = multimodal._seed_bytes("mma", 130).astype(np.int64) + 1
    aud = np.repeat(aud_env * 50, 31).astype(np.int16)
    frames = multimodal._seed_bytes("mmv", 10 * 16 * 16).reshape(10, 16, 16) % 200
    rows = [
        (0, None, "image", multimodal.encode_png(img), "png", None, 24, 24, None),
        (1, None, "image", multimodal.encode_png((img + 4).astype(np.uint8)), "png", None, 24, 24, None),
        (2, None, "audio", multimodal.encode_wav(aud), "wav", None, None, None, None),
        (3, None, "audio", multimodal.encode_wav((aud.astype(np.int64) * 2).astype(np.int16)), "wav", None, None, None, None),
        (4, None, "video", multimodal.encode_y4m(frames.astype(np.uint8)), "y4m", None, 16, 16, None),
        (5, None, "video", multimodal.encode_y4m((frames + 5).astype(np.uint8)), "y4m", None, 16, 16, None),
        # hash-0 degenerates of DIFFERENT kinds: must never pair
        (6, None, "audio", multimodal.encode_wav(np.zeros(500, dtype=np.int16)), "wav", None, None, None, None),
        (7, None, "video", multimodal.encode_y4m(np.full((4, 8, 8), 9, dtype=np.uint8)), "y4m", None, 8, 8, None),
        # opaque blob: null phash, drops out
        (8, None, "video", bytes(multimodal._seed_bytes("blob", 64)), "mkv", None, None, None, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        (r["kind"], r["id_a"], r["id_b"], r["hamming"])
        for r in multimodal.media_neardup_pairs(media, max_hamming=3).collect()
    }
    assert got == {("image", 0, 1, 0), ("audio", 2, 3, 0), ("video", 4, 5, 0)}

    hashes = {r["media_id"]: r["phash"] for r in multimodal.media_phashes(media).collect()}
    assert hashes[6] == 0 and hashes[7] == 0  # degenerates really do collide at 0
    assert hashes[8] is None

    import pytest

    with pytest.raises(Exception):
        multimodal.media_phashes(media, strict=True).collect()


def test_twin_media_pairs_at_zero(spark):
    """synthesize_twin_media's perturbations (pixel-doubled image, stereo
    audio) are hash-invariant by construction: every twin pairs with its
    base at hamming 0 through the full decode→hash→block pipeline."""
    media = multimodal.synthesize_real_media(spark, 9)
    both = media.unionByName(multimodal.synthesize_twin_media(spark))
    got = {
        (r["kind"], r["id_a"], r["id_b"], r["hamming"])
        for r in multimodal.media_neardup_pairs(both).collect()
        if r["id_b"] >= 1000
    }
    assert got == {
        ("image", 0, 1000, 0),
        ("image", 3, 1003, 0),
        ("image", 6, 1006, 0),
        ("audio", 1, 1001, 0),
        ("audio", 4, 1004, 0),
        ("audio", 7, 1007, 0),
    }


def test_media_dedup_collapses_clusters(spark):
    """Twins and transitive video clusters collapse to min-id canonicals;
    unpaired and unhashable rows pass through."""
    media = multimodal.synthesize_real_media(spark, 9)
    both = media.unionByName(multimodal.synthesize_twin_media(spark))
    kept = sorted(r["media_id"] for r in multimodal.media_dedup(both).collect())
    # every twin (1000+) collapses onto its base; videos 2,5,8 are one
    # transitive near-identical cluster (moving squares) -> canonical 2
    assert kept == [0, 1, 2, 3, 4, 6, 7]
    # schema passes through intact
    assert multimodal.media_dedup(both).columns == both.columns


def test_mislabeled_kind_cannot_cross_pair(spark):
    """A row labeled kind='image' whose payload is WAV bytes is hashed by
    its BYTES (algo='audio'); (kind, algo) partitioning keeps it from
    pairing with images (different algo) AND from pairing with
    correctly-labeled audio (different kind) — no cross-algorithm or
    cross-label near-dups from crawl mislabeling."""
    import numpy as np

    env = multimodal._seed_bytes("mis", 130).astype(np.int64) + 1
    wav = multimodal.encode_wav(np.repeat(env * 50, 31).astype(np.int16))
    rows = [
        (0, None, "audio", wav, "wav", None, None, None, None),
        (1, None, "image", wav, "png", None, None, None, None),  # mislabeled copy
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    ph = {
        r["media_id"]: (r["algo"], r["phash"])
        for r in multimodal.media_phashes(media).collect()
    }
    assert ph[1][0] == "audio" and ph[1][1] == ph[0][1]  # routed by bytes, same hash
    assert multimodal.media_neardup_pairs(media).count() == 0


def test_phash_invariance_properties():
    """Hypothesis: the documented exact invariances hold for ARBITRARY
    content, not just the seeded fixtures — dHash under brightness shift
    (no clipping) and pixel-doubling; ahash under integer gain and
    stereo duplication; video_mhash under brightness shift and spatial
    doubling."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.integers(0, 2 ** 32 - 1), st.integers(3, 24), st.integers(3, 24),
           st.integers(1, 55))
    def img(seed, h, w, shift):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 200, size=(h, w, 3), dtype=np.int64)  # +55 never clips
        d = multimodal.image_dhash(a)
        assert multimodal.image_dhash(a + shift) == d
        assert multimodal.image_dhash(np.repeat(np.repeat(a, 2, 0), 2, 1)) == d

    @settings(max_examples=150, deadline=None)
    @given(st.integers(0, 2 ** 32 - 1), st.integers(1, 500), st.integers(2, 5))
    def aud(seed, n, gain):
        rng = np.random.default_rng(seed)
        s = rng.integers(-8000, 8000, size=n, dtype=np.int64)
        d = multimodal.audio_ahash(s)
        assert multimodal.audio_ahash(s * gain) == d
        assert multimodal.audio_ahash(np.stack([s, s], axis=1)) == d

    @settings(max_examples=150, deadline=None)
    @given(st.integers(0, 2 ** 32 - 1), st.integers(1, 40), st.integers(2, 12),
           st.integers(2, 12), st.integers(1, 55))
    def vid(seed, t, h, w, shift):
        rng = np.random.default_rng(seed)
        f = rng.integers(0, 200, size=(t, h, w), dtype=np.int64)
        d = multimodal.video_mhash(f)
        assert multimodal.video_mhash(f + shift) == d
        assert multimodal.video_mhash(np.repeat(np.repeat(f, 2, 1), 2, 2)) == d

    img()
    aud()
    vid()
