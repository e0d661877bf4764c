from __future__ import annotations

import numpy as np
import pytest

from dig_entity_resolution_spark.operators.multimodal import (
    N_FEATURES,
    decode_bmp,
    decode_image_real,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    frame_sample_plan,
    resize_nearest,
    synth_assets,
    thumbnail_images,
)


# -- real codecs (pure numpy/struct, no external libs) ------------------------


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(5)
    for h, w in ((1, 1), (7, 3), (16, 24), (33, 31)):  # odd widths hit row padding
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(6)
    samples = (rng.standard_normal(1600) * 10000).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_resize_nearest():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    small = resize_nearest(img, 2, 3)
    assert small.shape == (2, 3, 3)
    assert np.array_equal(small[0, 0], img[0, 0])
    big = resize_nearest(img, 8, 12)
    assert big.shape == (8, 12, 3)
    assert np.array_equal(big[::2, ::2], img)  # each pixel duplicated 2x2


def test_decode_image_real_bmp_yes_compressed_no():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    assert decode_image_real(encode_bmp(img)).shape == (4, 4, 3)
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n\x1a\n")


# -- Spark-side stages ---------------------------------------------------------


def test_extract_features_shape_and_determinism(spark):
    assets = synth_assets(spark, n=30)
    rows = extract_features(assets).collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.features) == N_FEATURES
    again = extract_features(synth_assets(spark, n=30)).collect()
    a = {r.asset_id: tuple(r.features) for r in rows}
    b = {r.asset_id: tuple(r.features) for r in again}
    assert a == b


def test_extract_features_real_decode_paths(spark):
    """Images/audio in the fixture are REAL BMP/WAV payloads — their
    features must come from the decoded pixels/samples, not the byte
    histogram (whose 16 bins sum to 1; the real feature vectors end in the
    1.0 fill marker and carry aspect ratio / duration instead)."""
    assets = synth_assets(spark, n=30)
    rows = {r.asset_id: (r.kind, list(r.features)) for r in extract_features(assets).collect()}
    meta = {r.asset_id: r for r in assets.collect()}
    for aid, (kind, f) in rows.items():
        if kind == "image":
            assert f[15] == 1.0
            assert f[14] == pytest.approx(meta[aid].width / meta[aid].height)
        elif kind == "audio":
            assert f[15] == 1.0
            assert f[3] == pytest.approx(meta[aid].duration_ms / 1000, rel=0.05)
            assert f[0] > 0.1  # sine RMS, not near-silence
        else:  # video: compressed container → byte-histogram fallback
            assert sum(f) == pytest.approx(1.0)


def test_thumbnail_images_real_resize(spark):
    assets = synth_assets(spark, n=12)
    thumbs = {r.asset_id: bytes(r.thumb) for r in thumbnail_images(assets, 8, 8).collect()}
    imgs = {r.asset_id for r in assets.collect() if r.kind == "image"}
    assert set(thumbs) == imgs
    for payload in thumbs.values():
        assert decode_bmp(payload).shape == (8, 8, 3)


def test_frame_sample_plan(spark):
    assets = synth_assets(spark, n=12)
    plan = frame_sample_plan(assets, every_ms=1000).collect()
    by_asset = {}
    for r in plan:
        by_asset.setdefault(r.asset_id, []).append(r.frame_ts_ms)
    vids = {r.asset_id: r.duration_ms for r in assets.collect() if r.kind == "video"}
    assert set(by_asset) == set(vids)
    for aid, frames in by_asset.items():
        assert frames == list(range(0, vids[aid], 1000))
