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
