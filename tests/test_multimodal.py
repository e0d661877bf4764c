from __future__ import annotations

import numpy as np
import pytest

from dig_entity_resolution_spark.operators.multimodal import (
    N_FEATURES,
    decode_image_real,
    extract_features,
    frame_sample_plan,
    synth_assets,
)


def test_extract_features_shape_and_determinism(spark):
    assets = synth_assets(spark, n=30)
    rows = extract_features(assets).collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.features) == N_FEATURES
        s = sum(r.features)
        assert s == pytest.approx(1.0)  # L1-normalized histogram
    again = extract_features(synth_assets(spark, n=30)).collect()
    a = {r.asset_id: tuple(r.features) for r in rows}
    b = {r.asset_id: tuple(r.features) for r in again}
    assert a == b


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


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")
