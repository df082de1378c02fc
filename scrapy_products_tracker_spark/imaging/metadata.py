"""Image metadata scrubbing — the multimodal twin of
:func:`..functions.text.pii_scrub`.

Training-image pipelines strip embedded metadata (EXIF GPS fixes,
camera serials, XMP author blocks, editor comments) before anything
downstream touches the payload: the pixels are the training signal,
the ancillary chunks are a privacy liability. This module removes the
metadata segments from PNG and JPEG containers at the *byte* level —
no decode, no re-encode, pixels bit-identical — as an Arrow-batched
``mapInPandas`` kernel over the north-rule payload table
``(image_id, bytes, …)``.

Reference parity: the reference stores fetched files untouched
(save_images_pipeline.py:27-41); this is the curation-side operator a
100 TB image corpus needs on top.

Containers handled (dispatch by signature, like
:func:`.codec.decode_image`):

- **PNG** (``\\x89PNG…``): drop the metadata chunk types ``tEXt zTXt
  iTXt tIME eXIf`` — the explicit metadata set, NOT all ancillary
  chunks (``tRNS``/``gAMA``/``pHYs`` affect rendering and are kept).
  Kept chunks are copied verbatim (CRCs untouched).
- **JPEG** (``\\xff\\xd8``): drop ``APP1``–``APP15`` (EXIF/XMP/ICC
  live here) and ``COM`` segments; ``APP0`` (JFIF) is structural and
  kept. Marker walk stops at ``SOS`` — everything from there is
  entropy-coded data, copied verbatim.
- **surrogate lossy** (``LSY1`` + PNG, the sandbox's PIL-free jpeg
  stand-in, codec.py:33): scrub the inner PNG, re-prefix.

Malformed payloads follow the repo's audit-kernel convention
(imaging/media.py): REPORT, never drop — bytes pass through unchanged
with ``n_meta_stripped`` NULL.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LOSSY_MAGIC = b"LSY1"
# PNG metadata chunk types (PNG spec §11.3.4 textual/time + eXIf ext)
PNG_META_CHUNKS = frozenset({b"tEXt", b"zTXt", b"iTXt", b"tIME", b"eXIf"})


def strip_png_metadata(data: bytes) -> tuple[bytes, int | None]:
    """``(scrubbed_bytes, n_stripped)``; ``(data, None)`` on malformed
    chunk structure. Kept chunks are byte-verbatim copies."""
    if data[:8] != _PNG_SIG:
        return data, None
    out = [data[:8]]
    pos, n, end = 8, 0, len(data)
    while pos < end:
        if pos + 8 > end:
            return data, None  # truncated chunk header
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        nxt = pos + 12 + length
        if nxt > end:
            return data, None  # truncated chunk body
        if ctype in PNG_META_CHUNKS:
            n += 1
        else:
            out.append(data[pos:nxt])
        if ctype == b"IEND":
            out.append(data[nxt:])  # trailing bytes (none in valid PNG)
            return b"".join(out), n
        pos = nxt
    return data, None  # no IEND


def strip_jpeg_metadata(data: bytes) -> tuple[bytes, int | None]:
    """Drop APP1–APP15 + COM segments from a JPEG marker stream;
    APP0 (JFIF) kept. From SOS on, bytes are copied verbatim."""
    if data[:2] != b"\xff\xd8":
        return data, None
    out = [data[:2]]
    pos, n, end = 2, 0, len(data)
    while pos < end:
        if data[pos] != 0xFF:
            return data, None  # marker desync
        marker = data[pos + 1] if pos + 1 < end else None
        if marker is None:
            return data, None
        if marker == 0xD9:  # EOI
            out.append(data[pos:])
            return b"".join(out), n
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            out.append(data[pos : pos + 2])
            pos += 2
            continue
        if pos + 4 > end:
            return data, None
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        nxt = pos + 2 + seglen
        if seglen < 2 or nxt > end:
            return data, None
        if marker == 0xDA:  # SOS: entropy-coded data follows
            out.append(data[pos:])
            return b"".join(out), n
        if (0xE1 <= marker <= 0xEF) or marker == 0xFE:  # APPn>0 / COM
            n += 1
        else:
            out.append(data[pos:nxt])
        pos = nxt
    return data, None  # no EOI/SOS


def strip_image_metadata(data: bytes | None) -> tuple[bytes | None, int | None]:
    """Container dispatch (PNG / JPEG / LSY1-wrapped PNG); unknown or
    NULL payloads pass through with ``None`` stripped-count."""
    if data is None:
        return None, None
    if data[:4] == _LOSSY_MAGIC:
        inner, n = strip_png_metadata(bytes(data[4:]))
        return (_LOSSY_MAGIC + inner, n) if n is not None else (data, None)
    if data[:8] == _PNG_SIG:
        return strip_png_metadata(bytes(data))
    if data[:2] == b"\xff\xd8":
        return strip_jpeg_metadata(bytes(data))
    return data, None


def _png_text_chunk(key: bytes, value: bytes) -> bytes:
    body = key + b"\x00" + value
    return (
        struct.pack(">I", len(body))
        + b"tEXt"
        + body
        + struct.pack(">I", zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF)
    )


def inject_metadata(data: bytes, entries: list[tuple[bytes, bytes]]) -> bytes:
    """Test/oracle helper: insert metadata into a payload — tEXt
    chunks after IHDR for PNG (and LSY1-wrapped PNG), COM segments
    after SOI for JPEG — so ``strip_image_metadata(inject(x)) ==
    strip_image_metadata(x)`` is checkable on payloads that carry no
    metadata of their own."""
    if not entries:
        return data
    if data[:4] == _LOSSY_MAGIC:
        return _LOSSY_MAGIC + inject_metadata(data[4:], entries)
    if data[:8] == _PNG_SIG:
        (ihdr_len,) = struct.unpack(">I", data[8:12])
        cut = 8 + 12 + ihdr_len  # end of IHDR chunk
        chunks = b"".join(_png_text_chunk(k, v) for k, v in entries)
        return data[:cut] + chunks + data[cut:]
    if data[:2] == b"\xff\xd8":
        segs = b"".join(
            b"\xff\xfe" + struct.pack(">H", len(k + b": " + v) + 2) + k + b": " + v
            for k, v in entries
        )
        return data[:2] + segs + data[2:]
    raise ValueError("unknown container for inject_metadata")


SCRUB_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("n_meta_stripped", T.LongType()),
    ]
)


def scrub_image_metadata(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """``(image_id, bytes, n_meta_stripped)`` with metadata segments
    removed — Arrow-batched ``mapInPandas``, bytes stay executor-side,
    map-only stage (no shuffle; join the result back on the unique id
    to retain other columns). ``n_meta_stripped`` NULL = malformed or
    unknown container, payload passed through untouched."""
    import pandas as pd

    def _kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_b, out_n = [], []
            for data in pdf["bytes"]:
                b, n = strip_image_metadata(data)
                out_b.append(b)
                out_n.append(n)
            yield pd.DataFrame(
                {
                    "image_id": pdf[id_col],
                    "bytes": out_b,
                    "n_meta_stripped": pd.array(out_n, dtype="Int64"),
                }
            )

    return df.select(id_col, "bytes").mapInPandas(_kernel, SCRUB_SCHEMA)
