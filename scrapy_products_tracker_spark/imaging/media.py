"""Multimodal media columns: opaque ``binary`` payloads + typed metadata.

The training-data pipeline treats images/audio/video exactly like the
image rows the crawl already carries (reference stores images as files,
save_images_pipeline.py:27-41 / file_saver.py:19-66; here every payload
is a ``BinaryType`` column): decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` kernels so bytes never
pass through row-at-a-time Python.

What is real vs stubbed in this sandbox (no PIL/libav/cv2 installed):

- **images**: fully real — pure-numpy PNG and the surrogate-lossy codec
  (``imaging/codec.py``); ``resize_images`` decodes, nearest-neighbor
  resamples, and re-encodes actual pixels.
- **audio/video**: the *container plumbing* is real over deterministic
  synthetic containers (``SAUD`` PCM16 audio, ``SVID`` = length-prefixed
  encoded frames), so schemas, batch shapes, and the frame fan-out are
  exercised end-to-end; payloads in real codecs (wav/mp3/h264/...) route
  through soundfile / PyAV when importable (the ``_real_audio_decoder``
  / ``_real_video_demuxer`` import-try seams below) and otherwise hit a
  clearly-marked ``NotImplementedError`` that the kernels count-and-skip
  per row. Every kernel treats payload bytes as hostile crawled content:
  NULL bytes, wrong magic, truncation, or unknown codecs skip the ROW,
  never the task (X6).

Scale notes: kernels are per-row independent (no shuffle); frame
sampling fans out rows, so callers should repartition by ``media_id``
*before* the kernel if the downstream stage is per-frame. Payload bytes
never enter a shuffle here — outputs carry either scalar stats or the
(re-encoded) bytes straight to a sink.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .codec import decode_image, encode_image

AUDIO_MAGIC = b"SAUD"  # u32 sample_rate, u32 n_samples, int16 PCM mono
VIDEO_MAGIC = b"SVID"  # u32 n_frames, then per frame: u32 len + encoded image

# Real-codec seam: when soundfile / av are importable (production image),
# payloads that are NOT the synthetic containers route through them instead
# of raising NotImplementedError. The sandbox has neither, so the hooks stay
# None here — tests exercise the seam by monkeypatching a fake decoder.
try:  # pragma: no cover - absent in sandbox
    import soundfile as _soundfile

    def _real_audio_decoder(data: bytes):
        import io as _io

        # translate library errors (LibsndfileError is a RuntimeError
        # subclass the kernels don't catch) into the kernels' skip-the-
        # row ValueError contract (X6) — one corrupt payload must never
        # kill the task
        try:
            x, sr = _soundfile.read(_io.BytesIO(data), dtype="int16")
        except Exception as e:  # noqa: BLE001 - decoder errors are row-local
            raise ValueError(f"audio decode failed: {e}") from e
        if x.ndim > 1:
            x = x[:, 0]
        return int(sr), np.ascontiguousarray(x, dtype=np.int16)

except ImportError:
    _real_audio_decoder = None

try:  # pragma: no cover - absent in sandbox
    import av as _av

    def _real_video_demuxer(data: bytes):
        import io as _io

        # same translation as the audio seam: av.FFmpegError etc. become
        # the row-local ValueError the kernels count-and-skip (X6)
        try:
            with _av.open(_io.BytesIO(data)) as container:
                for frame in container.decode(video=0):
                    yield frame.to_ndarray(format="rgb24")
        except (ValueError, GeneratorExit):
            raise
        except Exception as e:  # noqa: BLE001 - decoder errors are row-local
            raise ValueError(f"video demux failed: {e}") from e

except ImportError:
    _real_video_demuxer = None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("bytes", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)

AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


# --- container codecs (driver/executor-side pure functions) ---------------


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    pcm = np.asarray(samples, dtype=np.int16)
    return AUDIO_MAGIC + struct.pack("<II", int(sample_rate), pcm.size) + pcm.tobytes()


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples). Payloads that are not the synthetic
    SAUD container route through soundfile when importable (the
    ``_real_audio_decoder`` seam above); without it they raise
    NotImplementedError. Truncated/corrupt payloads raise ValueError.
    Either way the kernels count-and-skip the ROW, never the task (X6)."""
    if data[:4] != AUDIO_MAGIC:
        if _real_audio_decoder is not None:
            return _real_audio_decoder(data)
        raise NotImplementedError(
            "real audio codecs (wav/mp3/flac) need soundfile/librosa, absent here"
        )
    if len(data) < 12:
        raise ValueError("truncated SAUD header")
    sr, n = struct.unpack_from("<II", data, 4)
    if len(data) < 12 + 2 * n:
        raise ValueError("truncated SAUD payload")
    pcm = np.frombuffer(data, dtype=np.int16, count=n, offset=12)
    return sr, pcm


def encode_video(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    parts = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        payload = encode_image(fr, fmt)
        parts.append(struct.pack("<I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def iter_video_frames(data: bytes) -> Iterator[np.ndarray]:
    """Yield decoded frames of a SVID container. Non-SVID payloads route
    through PyAV when importable (the ``_real_video_demuxer`` seam) —
    same contract as ``decode_audio``; truncated containers raise
    ValueError."""
    if data[:4] != VIDEO_MAGIC:
        if _real_video_demuxer is not None:
            yield from _real_video_demuxer(data)
            return
        raise NotImplementedError("real video demux needs av/cv2, absent here")
    if len(data) < 8:
        raise ValueError("truncated SVID header")
    (n,) = struct.unpack_from("<I", data, 4)
    off = 8
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError("truncated SVID frame table")
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if off + ln > len(data):
            raise ValueError("truncated SVID frame payload")
        yield decode_image(data[off : off + ln])
        off += ln


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample (pure numpy index map)."""
    h, w = px.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return px[np.ix_(rows, cols)]


# --- mapInPandas kernels ---------------------------------------------------


def resize_images(df: DataFrame, out_w: int, out_h: int, fmt: str = "png") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, Arrow-batched.
    Expects (image_id, bytes[, ...]) rows; emits RESIZED_SCHEMA.
    NULL/undecodable payloads are crawled, untrusted bytes — those rows
    are skipped, never fatal (X6), so the output may be narrower than
    the input."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["image_id"], pdf["bytes"]):
                if data is None:
                    continue
                try:  # hostile payload: skip the ROW, not the task (X6)
                    px = resize_nearest(decode_image(bytes(data)), out_h, out_w)
                except (ValueError, NotImplementedError, TypeError, struct.error):
                    continue
                out.append((mid, out_w, out_h, encode_image(px, fmt)))
            yield pd.DataFrame(out, columns=["image_id", "w", "h", "bytes"])

    return df.select("image_id", "bytes").mapInPandas(_kernel, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Deterministic frame sampling: keep frame_idx % every == 0 of each
    video row (kind='video'); non-video rows are passed over. One input
    row fans out to ceil(n_frames/every) FRAME_SCHEMA rows."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["bytes"]):
                if kind != "video" or data is None:
                    continue
                try:  # hostile/corrupt/unknown-codec row: skip it, not the task (X6)
                    for idx, px in enumerate(iter_video_frames(bytes(data))):
                        if idx % every == 0:
                            out.append(
                                (mid, idx, int(px.shape[1]), int(px.shape[0]), encode_image(px, "png"))
                            )
                except (ValueError, NotImplementedError, TypeError, struct.error):
                    continue
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "w", "h", "bytes"])

    return df.select("media_id", "kind", "bytes").mapInPandas(_kernel, FRAME_SCHEMA)


def audio_stats(df: DataFrame) -> DataFrame:
    """Per-clip feature extraction (duration/RMS/peak) over the audio
    rows (kind='audio') — the audio twin of multimodal_decode_stats."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["bytes"]):
                if kind != "audio" or data is None:
                    continue
                try:  # hostile/corrupt/unknown-codec row: skip it, not the task (X6)
                    sr, pcm = decode_audio(bytes(data))
                except (ValueError, NotImplementedError, TypeError, struct.error):
                    continue
                x = pcm.astype(np.float64)
                out.append(
                    (
                        mid,
                        sr,
                        int(pcm.size),
                        float(pcm.size / sr) if sr else 0.0,
                        float(np.sqrt(np.mean(x * x))) if pcm.size else 0.0,
                        int(np.max(np.abs(x))) if pcm.size else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "sample_rate", "n_samples", "duration_s", "rms", "peak"],
            )

    return df.select("media_id", "kind", "bytes").mapInPandas(_kernel, AUDIO_STATS_SCHEMA)


PHASH_AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("phash", T.LongType()),  # stored (metadata) hash
        T.StructField("phash_pixels", T.LongType()),  # recomputed from payload
        T.StructField("dist", T.IntegerType()),
    ]
)

_MASK64 = (1 << 64) - 1


def phash_audit(df: DataFrame) -> DataFrame:
    """Payload-vs-metadata perceptual-hash audit: decode each payload,
    recompute the 64-bit average hash (codec.phash64 — the same
    definition the ``phash`` metadata column is contracted to carry),
    and report the Hamming distance between stored and recomputed.

    This is the deep counterpart of headers.header_integrity_flags:
    the header audit is free (no decode) and catches container-level
    corruption; this one costs a decode and catches a payload whose
    pixels no longer match the row's identity (substituted image,
    bit-rot past the header, stale phash after a re-encode). At 10^10
    rows you run it sampled or on suspect partitions, which is why it
    is a standalone operator and not folded into the filter path.

    Unlike the transform kernels above, undecodable rows are NOT
    dropped — an audit must surface them — so hostile payloads come
    back with ``phash_pixels``/``dist`` NULL (and the X6 contract
    still holds: no row can fail the task). Expected distances:
    0 for lossless ``png``; small (quantization noise on an average
    hash) for the lossy path.
    """
    from .codec import phash64

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, fmt, data, stored in zip(
                pdf["image_id"], pdf["fmt"], pdf["bytes"], pdf["phash"]
            ):
                stored = None if pd.isna(stored) else int(stored)
                recomputed = dist = None
                if data is not None:
                    try:  # hostile payload: report the row, never fail the task
                        recomputed = phash64(decode_image(bytes(data)))
                    except (ValueError, NotImplementedError, TypeError, struct.error):
                        recomputed = None
                if recomputed is not None and stored is not None:
                    dist = bin((stored ^ recomputed) & _MASK64).count("1")
                out.append((mid, fmt, stored, recomputed, dist))
            yield pd.DataFrame(
                out, columns=["image_id", "fmt", "phash", "phash_pixels", "dist"]
            )

    return df.select("image_id", "fmt", "bytes", "phash").mapInPandas(
        _kernel, PHASH_AUDIT_SCHEMA
    )


DHASH_SCHEMA = "image_id string, dhash long"


def dhash_table(df: DataFrame) -> DataFrame:
    """(image_id, dhash) via one Arrow decode kernel — the gradient
    hash companion of the metadata ``phash`` column (codec.dhash64).
    Undecodable payloads are REPORTED with NULL dhash (audit
    semantics, same contract as phash_audit). Map-only; payload bytes
    never leave the kernel."""
    from .codec import dhash64

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["image_id"], pdf["bytes"]):
                dh = None
                if data is not None:
                    try:
                        dh = dhash64(decode_image(bytes(data)))
                    except (ValueError, NotImplementedError, TypeError, struct.error):
                        dh = None
                out.append((mid, dh))
            yield pd.DataFrame(out, columns=["image_id", "dhash"])

    return df.select("image_id", "bytes").mapInPandas(
        _kernel, DHASH_SCHEMA
    )
