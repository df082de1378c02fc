"""WARC (ISO 28500) shard sink + source for crawled HTTP responses.

Completes the web-archive trio next to the WebDataset tar sink
(``imaging/wds.py``) and the CDX capture index (``crawl/cdx.py``): WARC
is the public interchange format crawled corpora actually ship in
(Common Crawl, IA), so an engine replacing the reference's
store-rows-in-MySQL sink (``src/python/src/pipelines/*``) needs to
write and read it. Same design rules as the tar sink:

- **Deterministic bytes.** Every stat/entropy field a WARC writer would
  normally randomize is derived from the input row instead:
  ``WARC-Record-ID`` is ``urn:sha1:`` of (url, body), ``WARC-Date``
  comes from the caller's column/constant, headers are emitted in one
  fixed order. Shard bytes are a pure function of the member rows —
  re-runs and different partitionings produce byte-identical shards
  (the content-addressing property the roundtrip oracle pins).
- **Shard assignment is framing-independent.** Rows are packed by
  ``octet_length(body)`` through ``pack_shards``'s two-phase
  distributed prefix sum (no global single-task window), so the
  assignment is reproducible in plain SQL without modeling WARC
  header overhead.
- **Python only where bytes are framed.** Record framing/parsing is
  not a Catalyst expression; both kernels are Arrow-batched
  (applyInPandas / mapInPandas) and touch each payload byte once.
  Everything around them (assignment, index flatten, digest checks)
  is JVM column algebra.
- **Random access for free.** The writer emits a per-record
  ``(url, offset, length, digest)`` member index alongside the shard
  bytes — real byte offsets into the shard, the contract a CDX-style
  reader needs to fetch one record without scanning the shard
  (pinned by a slice-and-reparse test).

Scale notes (100 TB): one WARC per shard_id bounds the applyInPandas
group at ~``budget_bytes`` (callers size shards 100 MB – 1 GB); the
shuffle moves each payload byte once — the floor for any repacking
sink. ``read_warc_shards`` is embarrassingly parallel (one shard per
row, no shuffle); project payloads away before any downstream
exchange.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..imaging.dataset import pack_shards

WARC_SHARD_SCHEMA = (
    "shard_id int, warc_bytes binary, n_records int, data_bytes bigint, "
    "members array<struct<url:string, offset:bigint, length:bigint, digest:string>>"
)
WARC_RECORD_SCHEMA = (
    "shard_id int, url string, status int, body binary, warc_date string, "
    "digest_ok int"
)

_CRLF = b"\r\n"

# WARC headers are CRLF-framed: a CR/LF (or any C0 control byte) smuggled
# into a frontier URL by a hostile page (link_edges' href class admits
# them) would let the page inject arbitrary header lines into the record.
# Percent-encode control bytes so the header block stays attacker-free
# AND the URL still roundtrips uniquely through the member index.
_CTRL_RE = re.compile(r"[\x00-\x1f\x7f]")
_WARC_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z$")
_FALLBACK_DATE = "1970-01-01T00:00:00Z"


def _safe_header_url(url: str) -> str:
    return _CTRL_RE.sub(lambda m: "%%%02X" % ord(m.group(0)), url)


def _safe_header_date(date: str) -> str:
    return date if _WARC_DATE_RE.match(date) else _FALLBACK_DATE


def _response_record(url: str, status: int, body: bytes, date: str) -> tuple[bytes, str]:
    """One WARC/1.0 response record (bytes, payload sha1-hex).

    ``url`` is sanitized (control bytes percent-encoded) and ``date``
    validated (strict ISO-8601 Z form, else a fixed epoch constant) so
    no input row can inject header lines into the CRLF-framed block."""
    url = _safe_header_url(url)
    date = _safe_header_date(date)
    digest = hashlib.sha1(body).hexdigest()
    rec_id = hashlib.sha1(url.encode("utf-8") + b"\x00" + body).hexdigest()
    http = (
        f"HTTP/1.1 {int(status)} X\r\nContent-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    headers = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:sha1:{rec_id}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Payload-Digest: sha1:{digest}\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return headers + http + _CRLF + _CRLF, digest


def _warcinfo_record(shard_id: int, date: str) -> bytes:
    block = f"software: scrapy-products-tracker-spark\r\nshard: {shard_id}\r\n".encode()
    headers = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        f"WARC-Record-ID: <urn:sha1:{hashlib.sha1(block).hexdigest()}>\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(block)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return headers + block + _CRLF + _CRLF


def write_warc_shards(
    df: DataFrame,
    budget_bytes: int,
    range_col: str | None = None,
    url_col: str = "url",
    status_col: str = "status_code",
    body_col: str = "body",
    date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """(url, status, body) rows -> one deterministic WARC file per
    shard (``WARC_SHARD_SCHEMA``): a leading warcinfo record, then
    response records in url order. ``body`` may be binary or string
    (strings are written as their UTF-8 bytes; NULL -> empty). The
    ``members`` index carries real byte offsets/lengths per record."""
    assign = pack_shards(
        df,
        budget_bytes,
        id_col=url_col,
        payload_cols=(body_col,),
        range_col=range_col,
    ).withColumnRenamed("id", "_wurl")
    rows = df.select(
        F.col(url_col).alias("_wurl"),
        F.col(status_col).cast("int").alias("_wstatus"),
        F.col(body_col).cast("binary").alias("_wbody"),
    ).join(assign.select("_wurl", "shard_id"), "_wurl")

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_wurl")
        shard_id = int(pdf["shard_id"].iloc[0])
        parts = [_warcinfo_record(shard_id, date)]
        offset = len(parts[0])
        members = []
        data_bytes = 0
        for url, status, body in zip(pdf["_wurl"], pdf["_wstatus"], pdf["_wbody"]):
            b = bytes(body) if body is not None else b""
            safe_url = _safe_header_url(str(url))
            rec, digest = _response_record(safe_url, int(status), b, date)
            members.append(
                {
                    "url": safe_url,
                    "offset": offset,
                    "length": len(rec),
                    "digest": digest,
                }
            )
            parts.append(rec)
            offset += len(rec)
            data_bytes += len(b)
        return pd.DataFrame(
            [
                {
                    "shard_id": shard_id,
                    "warc_bytes": b"".join(parts),
                    "n_records": len(members),
                    "data_bytes": data_bytes,
                    "members": members,
                }
            ]
        )

    return rows.groupBy("shard_id").applyInPandas(_build, WARC_SHARD_SCHEMA)


def _parse_warc(data: bytes) -> Iterator[dict]:
    """Stream-parse WARC records (header block + Content-Length body +
    CRLF CRLF). Tolerant of trailing garbage: parsing stops at the
    first malformed header block (untrusted archive contract — never
    an exception path)."""
    pos, n = 0, len(data)
    while pos < n:
        end = data.find(b"\r\n\r\n", pos)
        if end < 0 or not data[pos : pos + 5] == b"WARC/":
            return
        headers: dict[str, str] = {}
        for line in data[pos:end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        block_start = end + 4
        block = data[block_start : block_start + length]
        if len(block) < length:
            return
        yield {"headers": headers, "block": block}
        pos = block_start + length
        if data[pos : pos + 4] == b"\r\n\r\n":
            pos += 4


def read_warc_shards(shards: DataFrame) -> DataFrame:
    """Parse ``(shard_id, warc_bytes)`` rows back to one row per
    response record (``WARC_RECORD_SCHEMA``). ``digest_ok`` recomputes
    the payload sha1 against the record's WARC-Payload-Digest header
    (1 ok / 0 mismatch) so a framing bug anywhere breaks the column,
    not just the payload hash downstream."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for shard_id, data in zip(pdf["shard_id"], pdf["warc_bytes"]):
                if data is None:
                    continue
                for rec in _parse_warc(bytes(data)):
                    h = rec["headers"]
                    if h.get("warc-type") != "response":
                        continue
                    block = rec["block"]
                    sep = block.find(b"\r\n\r\n")
                    if sep < 0:
                        continue
                    status_line = block[:sep].split(_CRLF)[0].decode("ascii", "replace")
                    try:
                        status = int(status_line.split(" ")[1])
                    except (IndexError, ValueError):
                        continue
                    body = block[sep + 4 :]
                    want = h.get("warc-payload-digest", "")
                    got = "sha1:" + hashlib.sha1(body).hexdigest()
                    out.append(
                        {
                            "shard_id": int(shard_id),
                            "url": h.get("warc-target-uri", ""),
                            "status": status,
                            "body": body,
                            "warc_date": h.get("warc-date", ""),
                            "digest_ok": 1 if want == got else 0,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "shard_id",
                    "url",
                    "status",
                    "body",
                    "warc_date",
                    "digest_ok",
                ],
            )

    return shards.select("shard_id", "warc_bytes").mapInPandas(
        _kernel, WARC_RECORD_SCHEMA
    )


def warc_member_index(shards: DataFrame) -> DataFrame:
    """Flatten the writer's per-record member index to CDX-joinable
    rows ``(shard_id, url, offset, length, digest)`` — pure JVM
    explode, no payload bytes in the plan."""
    m = F.explode("members").alias("m")
    return shards.select("shard_id", m).select(
        "shard_id",
        F.col("m.url").alias("url"),
        F.col("m.offset").alias("offset"),
        F.col("m.length").alias("length"),
        F.col("m.digest").alias("digest"),
    )
