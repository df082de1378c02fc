"""Payload-header integrity audit — fixed-offset binary parse, pure JVM.

At 100 TB the cheapest data-quality pass over an image table never
decodes a pixel: the container header already carries the dimensions,
so validating the ``(w, h, fmt)`` metadata columns against the payload
is a fixed-offset parse of the first ~30 bytes. Both operators here
are pure column algebra over the ``binary`` column — ``substring`` +
``hex`` + ``conv`` — so the whole audit runs inside whole-stage
codegen with zero shuffle and zero Python, and Parquet page-level
statistics still prune every other column.

Containers recognized:

- ``png`` — the 8-byte PNG signature; IHDR is mandated to be the
  first chunk (PNG spec §5.6), so width/height are the big-endian
  uint32s at byte offsets 16 and 20.
- ``lossy-png`` — the codec's deterministic lossy surrogate
  (``codec._LOSSY_MAGIC`` = ``LSY1`` + a PNG body; offsets shift +4).
- ``jpeg`` — a real JFIF stream (``FF D8 FF``). Real JPEG dimensions
  live in a variable-offset SOF marker, which a fixed-offset parse
  cannot reach — dims come back NULL and ``dims_ok`` is NULL
  (unknown), never a false mismatch.
- ``unknown`` — anything else (corrupt, truncated below the magic,
  or a format this table should not contain).

Reference parity note: the reference trusts whatever bytes the
download middleware hands it and writes them to disk untouched
(``save_images_pipeline.py:27-41``); this audit is the missing guard a
10^10-row image table needs before the bytes are declared good.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["header_integrity_flags", "png_header_dims"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LOSSY_MAGIC = b"LSY1"  # codec._LOSSY_MAGIC; kept literal so this module stays plan-only


def _be32(b: Column, pos: int) -> Column:
    """Big-endian uint32 at 1-indexed byte offset ``pos`` of a binary
    column: hex the 4-byte slice (codegen'd) and parse base-16. The
    caller guards length, so the slice is always exactly 4 bytes."""
    return F.conv(F.hex(F.substring(b, pos, 4)), 16, 10).cast("long")


def png_header_dims(
    df: DataFrame,
    bytes_col: str = "bytes",
    out_container: str = "container",
    out_w: str = "hdr_w",
    out_h: str = "hdr_h",
) -> DataFrame:
    """Attach ``(container, hdr_w, hdr_h)`` parsed from the payload
    header. ``hdr_w``/``hdr_h`` are NULL whenever the container does
    not expose fixed-offset dims (real jpeg / unknown) or the payload
    is truncated before the IHDR dims (container still reported, so a
    truncation shows up as container='png' + NULL dims)."""
    b = F.col(bytes_col)
    n = F.octet_length(b)
    is_png = F.substring(b, 1, 8) == F.lit(_PNG_SIG)
    is_lsy = F.substring(b, 1, 12) == F.lit(_LOSSY_MAGIC + _PNG_SIG)
    is_jpg = F.substring(b, 1, 3) == F.lit(b"\xff\xd8\xff")
    container = (
        F.when(b.isNull(), F.lit(None).cast("string"))
        .when(is_png, F.lit("png"))
        .when(is_lsy, F.lit("lossy-png"))
        .when(is_jpg, F.lit("jpeg"))
        .otherwise(F.lit("unknown"))
    )
    hdr_w = (
        F.when(is_png & (n >= 24), _be32(b, 17))
        .when(is_lsy & (n >= 28), _be32(b, 21))
        .otherwise(F.lit(None).cast("long"))
    )
    hdr_h = (
        F.when(is_png & (n >= 24), _be32(b, 21))
        .when(is_lsy & (n >= 28), _be32(b, 25))
        .otherwise(F.lit(None).cast("long"))
    )
    return df.withColumn(out_container, container).withColumn(out_w, hdr_w).withColumn(out_h, hdr_h)


def header_integrity_flags(
    df: DataFrame,
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Full metadata-vs-payload audit. Adds:

    - ``container`` / ``hdr_w`` / ``hdr_h`` (see png_header_dims),
    - ``container_ok`` — the stated ``fmt`` is consistent with the
      sniffed container (``png``→png; ``jpeg``→real jpeg OR the lossy
      surrogate). NULL bytes → false (a payload the table claims to
      hold but does not is an integrity failure).
    - ``dims_ok`` — header dims equal the metadata columns; NULL
      (unknown, not false) when the container exposes no fixed-offset
      dims, false when the header was parseable and disagrees or the
      payload is truncated before it.
    - ``ok`` — ``container_ok AND coalesce(dims_ok, true)``: the row
      passes unless something checkable failed.
    """
    out = png_header_dims(df, bytes_col=bytes_col)
    container = F.col("container")
    container_ok = (
        F.when(container.isNull(), F.lit(False))
        .when(F.col(fmt_col) == "png", container == "png")
        .when(F.col(fmt_col) == "jpeg", container.isin("jpeg", "lossy-png"))
        .otherwise(F.lit(False))
    )
    parseable = container.isin("png", "lossy-png")
    dims_ok = F.when(
        parseable,
        F.col("hdr_w").isNotNull()
        & (F.col("hdr_w") == F.col(w_col).cast("long"))
        & (F.col("hdr_h") == F.col(h_col).cast("long")),
    ).otherwise(F.lit(None).cast("boolean"))
    return (
        out.withColumn("container_ok", container_ok)
        .withColumn("dims_ok", dims_ok)
        .withColumn("ok", container_ok & F.coalesce(dims_ok, F.lit(True)))
    )
