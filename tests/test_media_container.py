"""Media container layer (r6): ISO-BMFF (MP4) sample tables and MPEG
audio (MP3) framing parse for real — roundtrip-exact against the pinned
muxers, bomb-bounded against crafted headers — and the Spark frame-sample
stage emits the exact coded bytes the container addresses."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dig_entity_resolution_spark.operators.media_container import (
    _box,
    _full,
    extract_sample,
    media_stream_info,
    mp3_frame_walk,
    mux_mp3,
    mux_mp4,
    parse_mp4,
    sample_at,
    video_frame_samples,
)
from dig_entity_resolution_spark.operators.multimodal import (
    ASSET_SCHEMA,
    synth_assets,
)


def _frames(sizes, seed=0):
    rng = np.random.default_rng(seed)
    return [bytes(rng.integers(0, 256, s, dtype=np.uint8)) for s in sizes]


# -- MP4 ----------------------------------------------------------------------


def test_mp4_roundtrip_exact():
    samples = _frames((120, 80, 200, 55, 90))
    durs = [100, 100, 150, 150, 100]
    payload = mux_mp4(samples, durs)
    t = parse_mp4(payload)
    assert t["n_samples"] == 5
    assert t["duration_ms"] == 600
    assert list(t["sizes"]) == [120, 80, 200, 55, 90]
    assert list(t["ts_ms"]) == [0, 100, 200, 350, 500]
    assert list(t["dur_ms"]) == durs
    for i, s in enumerate(samples):
        assert extract_sample(payload, t, i) == s


def test_mp4_sample_at_covers_intervals():
    t = parse_mp4(mux_mp4(_frames((10, 10, 10)), [100, 200, 100]))
    assert sample_at(t, 0) == 0
    assert sample_at(t, 99) == 0
    assert sample_at(t, 100) == 1
    assert sample_at(t, 299) == 1
    assert sample_at(t, 300) == 2
    assert sample_at(t, 10_000) == 2  # clamp past EOS


def test_mp4_multi_chunk_stsc():
    """The general stsc path: 5 samples over 3 chunks (2+2+1) with two
    stsc entries — hand-built since the muxer writes one chunk."""
    samples = _frames((7, 9, 11, 13, 5), seed=3)
    sizes = [len(s) for s in samples]
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isom", b"iso2")
    # chunks at arbitrary (non-contiguous) mdat positions, gap bytes between
    mdat_body = (
        samples[0] + samples[1] + b"\xee" * 4 + samples[2] + samples[3]
        + b"\xee" * 2 + samples[4]
    )
    mdat = _box(b"mdat", mdat_body)
    base = len(ftyp) + 8
    chunk_offs = [base, base + 16 + 4, base + 16 + 4 + 24 + 2]
    stts = _full(b"stts", struct.pack(">I", 1), struct.pack(">II", 5, 40))
    stsc = _full(
        b"stsc",
        struct.pack(">I", 2),
        struct.pack(">III", 1, 2, 1) + struct.pack(">III", 3, 1, 1),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, 5),
        b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full(
        b"stco",
        struct.pack(">I", 3),
        b"".join(struct.pack(">I", o) for o in chunk_offs),
    )
    stbl = _box(b"stbl", _full(b"stsd", struct.pack(">I", 0)), stts, stsc, stsz, stco)
    mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 200), b"\x55\xc4\x00\x00")
    mdia = _box(b"mdia", mdhd, _box(b"minf", stbl))
    payload = ftyp + mdat + _box(b"moov", _box(b"trak", mdia))
    t = parse_mp4(payload)
    assert list(t["sizes"]) == sizes
    assert list(t["ts_ms"]) == [0, 40, 80, 120, 160]
    for i, s in enumerate(samples):
        assert extract_sample(payload, t, i) == s


def test_mp4_bombs_and_malformed_rejected():
    good = mux_mp4(_frames((10, 10)), [100, 100])
    # truncation anywhere must raise, never over-read
    with pytest.raises(ValueError):
        parse_mp4(good[:40])
    # stsz declaring a bomb sample count
    bomb_idx = good.find(b"stsz")
    bomb = bytearray(good)
    struct.pack_into(">I", bomb, bomb_idx + 12, 1 << 30)
    with pytest.raises(ValueError, match="cap|truncated"):
        parse_mp4(bytes(bomb))
    # stco pointing past the payload
    stco_idx = good.find(b"stco")
    oob = bytearray(good)
    struct.pack_into(">I", oob, stco_idx + 12, len(good) + 1000)
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4(bytes(oob))
    # zero timescale is a division bomb
    mdhd_idx = good.find(b"mdhd")
    zt = bytearray(good)
    struct.pack_into(">I", zt, mdhd_idx + 16, 0)
    with pytest.raises(ValueError, match="timescale"):
        parse_mp4(bytes(zt))
    with pytest.raises(ValueError, match="missing moov"):
        parse_mp4(b"\x00\x00\x00\x08free")


def test_mp4_mux_validates():
    with pytest.raises(ValueError, match="at least one"):
        mux_mp4([])
    with pytest.raises(ValueError, match="durations"):
        mux_mp4([b"x"], [1, 2])


# -- MP3 ----------------------------------------------------------------------


def test_mp3_walk_roundtrip_and_id3_skip():
    for id3 in (0, 57):
        payload = mux_mp3(9, id3_pad=id3)
        w = mp3_frame_walk(payload)
        assert w["n_frames"] == 9
        # 9 frames * 1152 samples @ 44100 Hz ≈ 235 ms
        assert w["duration_ms"] == int(9 * 1152 * 1000 / 44100)
        assert w["bitrate_kbps"] == 128
        # frames tile the stream exactly after the ID3 prefix
        start = w["offsets"][0]
        assert int(start) == (10 + id3 if id3 else 0)
        assert int((w["offsets"] + w["sizes"])[-1]) == len(payload)


def test_mp3_mpeg2_frame_supported():
    # MPEG-2 Layer III: version bits 10 → 0xF3; 80 kbps @ 22050 Hz
    flen = 72 * 80 * 1000 // 22050
    frame = bytes((0xFF, 0xF3, (9 << 4) | 0x00, 0x44)) + b"\x01" * (flen - 4)
    w = mp3_frame_walk(frame)
    assert w["n_frames"] == 1
    assert w["duration_ms"] == int(576 * 1000 / 22050)


def test_mp3_malformed_rejected():
    good = mux_mp3(3)
    with pytest.raises(ValueError, match="sync|trailing|overruns"):
        mp3_frame_walk(good + b"\x00\x01")
    with pytest.raises(ValueError, match="overruns"):
        mp3_frame_walk(good[:-5])
    # free-format (bitrate idx 0) and reserved samplerate are invalid
    bad = bytearray(good)
    bad[2] = 0x00
    with pytest.raises(ValueError, match="invalid bitrate"):
        mp3_frame_walk(bytes(bad))


# -- Spark stages -------------------------------------------------------------


def test_media_stream_info_on_synth_assets(spark):
    assets = synth_assets(spark, n=30)
    info = {r.asset_id: r for r in media_stream_info(assets).collect()}
    meta = {r.asset_id: r for r in assets.collect()}
    vids = {a for a, r in meta.items() if r.kind == "video"}
    # every synth video parses as mp4 with the metadata-consistent clock;
    # WAV audio is not an MPEG stream → correctly absent
    assert set(info) == vids
    for aid in vids:
        assert info[aid].container == "mp4"
        assert info[aid].duration_ms == meta[aid].duration_ms
        assert info[aid].n_samples == meta[aid].duration_ms // 100


def test_media_stream_info_mp3_path(spark):
    rows = [
        (1, "audio", bytearray(mux_mp3(12, id3_pad=33)), "audio/mpeg",
         None, None, None),
        (2, "audio", bytearray(b"\x00garbage"), "audio/mpeg", None, None, None),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = media_stream_info(df).collect()
    assert len(got) == 1 and got[0].container == "mp3"
    assert got[0].n_samples == 12 and got[0].bitrate_kbps == 128


def test_video_frame_samples_exact_bytes(spark):
    assets = synth_assets(spark, n=12)
    meta = {r.asset_id: r for r in assets.collect() if r.kind == "video"}
    rows = video_frame_samples(assets, every_ms=1000).collect()
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == set(meta)
    for aid, frames in by_asset.items():
        frames.sort(key=lambda r: r.frame_ts_ms)
        assert [r.frame_ts_ms for r in frames] == list(
            range(0, meta[aid].duration_ms, 1000)
        )
        # the emitted bytes are exactly what the container addresses
        parsed = parse_mp4(bytes(meta[aid].payload))
        for r in frames:
            i = sample_at(parsed, r.frame_ts_ms)
            assert r.sample_idx == i
            assert r.sample_ts_ms == int(parsed["ts_ms"][i])
            assert bytes(r.frame_payload) == extract_sample(
                bytes(meta[aid].payload), parsed, i
            )


def test_mp4_truncated_fullbox_bodies_raise_valueerror():
    """ADVICE r6 #1: an mdhd with an empty body or an stsz too short for
    its fixed header must fail as ValueError (media_stream_info /
    video_frame_samples skip on ValueError), never struct.error."""
    mdhd_empty = _full(b"mdhd")
    moov = _box(b"moov", _box(b"trak", _box(b"mdia", mdhd_empty)))
    with pytest.raises(ValueError, match="truncated mdhd"):
        parse_mp4(moov)

    mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 5000))
    stsz_short = _full(b"stsz", struct.pack(">I", 0))  # 4 bytes, needs 8
    stbl = _box(b"stbl", stsz_short)
    mdia = _box(b"mdia", mdhd, _box(b"minf", stbl))
    moov = _box(b"moov", _box(b"trak", mdia))
    with pytest.raises(ValueError, match="truncated stsz"):
        parse_mp4(moov)

    # stts/stco/stsc with empty bodies likewise (parse order: stsz → stts
    # → stco → stsc, so each case carries valid copies of the earlier ones)
    order = [
        (b"stsz", _full(b"stsz", struct.pack(">II", 10, 0))),
        (b"stts", _full(b"stts", struct.pack(">I", 0))),
        (b"stco", _full(b"stco", struct.pack(">I", 0))),
        (b"stsc", _full(b"stsc", struct.pack(">I", 0))),
    ]
    for i, (tag, _) in enumerate(order[1:], start=1):
        boxes = [good for _, good in order[:i]]
        boxes.append(_full(tag))  # empty body: header unpack must not escape
        stbl = _box(b"stbl", *boxes)
        mdia = _box(b"mdia", mdhd, _box(b"minf", stbl))
        moov = _box(b"moov", _box(b"trak", mdia))
        with pytest.raises(ValueError, match="truncated " + tag.decode()):
            parse_mp4(moov)
