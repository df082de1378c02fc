"""Multimodal media plumbing: resize, frame sampling, audio features.

Pins that the Arrow-batched kernels move real pixels/samples through the
binary columns (images fully real; audio/video over the deterministic
synthetic containers), and that foreign codecs fail loudly via the
documented NotImplementedError stub contract.
"""

import numpy as np
import pytest

from scrapy_products_tracker_spark.imaging import (
    audio_stats,
    decode_audio,
    decode_image,
    encode_audio,
    encode_image,
    encode_video,
    iter_video_frames,
    resize_images,
    resize_nearest,
    sample_frames,
)


def _gradient(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


def test_audio_container_roundtrip():
    pcm = (np.sin(np.linspace(0, 40, 800)) * 20000).astype(np.int16)
    sr, out = decode_audio(encode_audio(pcm, 8000))
    assert sr == 8000
    assert np.array_equal(out, pcm)


def test_foreign_codecs_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF....WAVE" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        list(iter_video_frames(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32))


def test_video_container_roundtrip():
    frames = [_gradient(6, 8, s) for s in range(5)]
    out = list(iter_video_frames(encode_video(frames)))
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_resize_nearest_exact_map():
    px = _gradient(8, 6)
    small = resize_nearest(px, 4, 3)
    assert small.shape == (4, 3)
    rows = np.arange(4) * 8 // 4
    cols = np.arange(3) * 6 // 3
    assert np.array_equal(small, px[np.ix_(rows, cols)])


def test_resize_images_spark(spark):
    imgs = [("img_%d" % i, encode_image(_gradient(16, 12, i), "png")) for i in range(6)]
    df = spark.createDataFrame(imgs, "image_id string, bytes binary")
    out = {r["image_id"]: r for r in resize_images(df, out_w=6, out_h=8).collect()}
    assert len(out) == 6
    for i in range(6):
        r = out["img_%d" % i]
        assert (r["w"], r["h"]) == (6, 8)
        got = decode_image(bytes(r["bytes"]))
        assert np.array_equal(got, resize_nearest(_gradient(16, 12, i), 8, 6))


def test_sample_frames_spark(spark):
    vids = [
        ("vid_a", "video", encode_video([_gradient(4, 4, s) for s in range(6)])),
        ("vid_b", "video", encode_video([_gradient(4, 4, 10 + s) for s in range(4)])),
        ("aud_x", "audio", encode_audio(np.zeros(10, dtype=np.int16), 8000)),
    ]
    df = spark.createDataFrame(vids, "media_id string, kind string, bytes binary")
    rows = sample_frames(df, every=2).collect()
    got = {(r["media_id"], r["frame_idx"]) for r in rows}
    assert got == {("vid_a", 0), ("vid_a", 2), ("vid_a", 4), ("vid_b", 0), ("vid_b", 2)}
    by_key = {(r["media_id"], r["frame_idx"]): r for r in rows}
    assert np.array_equal(
        decode_image(bytes(by_key[("vid_a", 2)]["bytes"])), _gradient(4, 4, 2)
    )


def test_audio_stats_spark(spark):
    pcm_a = (np.sin(np.linspace(0, 60, 1600)) * 10000).astype(np.int16)
    pcm_b = np.full(400, 5000, dtype=np.int16)
    media = [
        ("a", "audio", encode_audio(pcm_a, 16000)),
        ("b", "audio", encode_audio(pcm_b, 8000)),
        ("v", "video", encode_video([_gradient(4, 4)])),
    ]
    df = spark.createDataFrame(media, "media_id string, kind string, bytes binary")
    out = {r["media_id"]: r for r in audio_stats(df).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["sample_rate"] == 16000 and out["a"]["n_samples"] == 1600
    assert out["a"]["duration_s"] == pytest.approx(0.1)
    x = pcm_a.astype(np.float64)
    assert out["a"]["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))))
    assert out["b"]["rms"] == pytest.approx(5000.0)
    assert out["b"]["peak"] == 5000


def test_truncated_containers_raise_value_error():
    with pytest.raises(ValueError):
        decode_audio(b"SAUD\x01\x00")  # short header
    import struct

    with pytest.raises(ValueError):
        decode_audio(b"SAUD" + struct.pack("<II", 8000, 1000) + b"\x00\x00")  # short payload
    with pytest.raises(ValueError):
        list(iter_video_frames(b"SVID\x05\x00\x00\x00"))  # missing frame table


def test_corrupt_rows_skipped_not_fatal(spark):
    import struct

    good = encode_audio(np.full(10, 100, dtype=np.int16), 8000)
    bad = b"SAUD" + struct.pack("<II", 8000, 99999)  # truncated payload
    df = spark.createDataFrame(
        [("ok", "audio", good), ("bad", "audio", bad)],
        "media_id string, kind string, bytes binary",
    )
    out = audio_stats(df).collect()
    assert [r["media_id"] for r in out] == ["ok"]
    vids = spark.createDataFrame(
        [
            ("ok", "video", encode_video([_gradient(4, 4)])),
            ("bad", "video", b"SVID\x02\x00\x00\x00\xff\xff"),
        ],
        "media_id string, kind string, bytes binary",
    )
    frames = sample_frames(vids, every=1).collect()
    assert [r["media_id"] for r in frames] == ["ok"]


def test_hostile_rows_null_bytes_and_wrong_magic_skipped(spark):
    """ADVICE r02: a crawled payload with non-SAUD/SVID magic (raises
    NotImplementedError) or a NULL bytes column must skip the ROW, not
    kill the task — in all three kernels including resize_images."""
    good_a = encode_audio(np.full(10, 100, dtype=np.int16), 8000)
    rows = [
        ("ok", "audio", good_a),
        ("wrong_magic", "audio", b"RIFF....WAVE" + b"\x00" * 32),
        ("null_bytes", "audio", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, kind string, bytes binary")
    assert [r["media_id"] for r in audio_stats(df).collect()] == ["ok"]

    vids = spark.createDataFrame(
        [
            ("ok", "video", encode_video([_gradient(4, 4)])),
            ("wrong_magic", "video", b"\x00\x00mp4h264garbage"),
            ("null_bytes", "video", None),
        ],
        "media_id string, kind string, bytes binary",
    )
    assert [r["media_id"] for r in sample_frames(vids, every=1).collect()] == ["ok"]

    imgs = spark.createDataFrame(
        [
            ("ok", encode_image(_gradient(4, 4), "png")),
            ("garbage", b"JFIFnotdecodable"),
            ("null_bytes", None),
        ],
        "image_id string, bytes binary",
    )
    out = resize_images(imgs, 2, 2).collect()
    assert [r["image_id"] for r in out] == ["ok"]


def test_real_codec_import_try_seam(monkeypatch):
    """The production import-try seam: when a real decoder is present
    (monkeypatched here — the sandbox has none), non-synthetic payloads
    route through it instead of NotImplementedError."""
    from scrapy_products_tracker_spark.imaging import media as media_mod

    def fake_audio_decoder(data: bytes):
        assert data.startswith(b"RIFF")
        return 4000, np.full(8, 1000, dtype=np.int16)

    monkeypatch.setattr(media_mod, "_real_audio_decoder", fake_audio_decoder)
    sr, pcm = media_mod.decode_audio(b"RIFF....WAVE" + b"\x00" * 8)
    assert sr == 4000 and pcm.size == 8

    def fake_video_demuxer(data: bytes):
        yield _gradient(4, 4)
        yield _gradient(4, 4, seed=1)

    monkeypatch.setattr(media_mod, "_real_video_demuxer", fake_video_demuxer)
    frames = list(media_mod.iter_video_frames(b"\x00\x00\x00 ftypisom...."))
    assert len(frames) == 2 and frames[0].shape == (4, 4)
    # and back to the honest stub contract when the lib is absent
    monkeypatch.setattr(media_mod, "_real_audio_decoder", None)
    with pytest.raises(NotImplementedError):
        media_mod.decode_audio(b"RIFF....WAVE")
