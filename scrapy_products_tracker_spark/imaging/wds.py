"""WebDataset tar shard sink + source for image+caption tables.

The reference ships its output as CSV rows (``base_csv_exporter.py:
42-117``) — fine for 16-field product rows, wrong for binary image
payloads. The public standard for shipping a 100 TB image+caption
corpus to a training job is WebDataset (github.com/webdataset/
webdataset): size-bounded POSIX tar shards whose members group by a
shared key stem (``{key}.jpg`` + ``{key}.txt``), readable
sequentially with zero index structure. These two operators close the
loop the existing :func:`~.dataset.pack_shards` opens: *assignment*
(pack_shards) → *materialized tar bytes* (write) → *rows again*
(read).

- :func:`write_wds_shards` — groupBy(shard_id).applyInPandas building
  one deterministic tar archive per shard: ustar format, members in
  ``id`` order, two members per sample (``{id}.img`` payload,
  ``{id}.txt`` UTF-8 caption), all timestamps/uids zeroed so the
  bytes are a pure function of the input rows (byte-identical across
  partitionings and re-runs — the property the roundtrip oracle and
  any content-addressed shard store rely on).
- :func:`read_wds_shards` — mapInPandas over ``(shard_id,
  tar_bytes)`` rows parsing members back with ``tarfile``; pairs
  ``.img``/``.txt`` members by stem and yields one row per sample.

Python is unavoidable here (tar framing is not a Catalyst
expression), so both kernels are Arrow-batched and touch each byte
exactly once; NULL captions round-trip as a missing ``.txt`` member
(WebDataset's own convention for absent fields).

Scale notes (100 TB):

- One tar per shard_id means the applyInPandas group carries
  ~``budget_bytes`` of payload — the caller sizes shards (100 MB – 1
  GB is the WebDataset norm) so a group always fits an executor's
  Arrow batch comfortably; the shuffle moves each payload byte once,
  which is the floor for any repacking sink.
- The shard assignment reuses ``pack_shards``'s two-phase distributed
  prefix sum (no global single-task window); see its docstring for
  the ``range_col`` contract.
- ``read_wds_shards`` is embarrassingly parallel (one tar per row,
  no shuffle); downstream ops that only need metadata should project
  it out of the member listing *before* any exchange so the payload
  bytes never shuffle again.
"""

from __future__ import annotations

import io
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dataset import pack_shards

WDS_SHARD_SCHEMA = (
    "shard_id int, tar_bytes binary, n_members int, n_samples int, data_bytes bigint"
)
WDS_SAMPLE_SCHEMA = "shard_id int, image_id string, payload binary, caption string"


def _tar_info(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name=name)
    ti.size = size
    # determinism: zero every stat-derived field (tar headers embed
    # mtime/uid/gid/uname/gname; any nonzero value would make shard
    # bytes depend on the writing host, breaking content addressing)
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def write_wds_shards(
    df: DataFrame,
    budget_bytes: int,
    range_col: str | None = None,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
) -> DataFrame:
    """Materialize the ``pack_shards`` assignment as real tar bytes:
    ``(shard_id, tar_bytes, n_members, n_samples, data_bytes)``.

    ``data_bytes`` is the payload byte total (the prefix-sum quantity
    shards were budgeted on); ``tar_bytes`` is larger by the 512-byte
    header/padding framing tar adds per member."""
    assign = pack_shards(
        df,
        budget_bytes,
        id_col=id_col,
        payload_cols=(bytes_col, caption_col),
        range_col=range_col,
    )
    rows = df.select(
        F.col(id_col).alias("id"),
        F.col(bytes_col).alias("_payload"),
        F.col(caption_col).alias("_caption"),
    ).join(assign.select("id", "shard_id", "payload_bytes"), "id")

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        buf = io.BytesIO()
        n_members = 0
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for _, r in pdf.iterrows():
                payload = bytes(r["_payload"]) if r["_payload"] is not None else b""
                tf.addfile(_tar_info(f"{r['id']}.img", len(payload)), io.BytesIO(payload))
                n_members += 1
                if r["_caption"] is not None:
                    cap = str(r["_caption"]).encode("utf-8")
                    tf.addfile(_tar_info(f"{r['id']}.txt", len(cap)), io.BytesIO(cap))
                    n_members += 1
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "tar_bytes": [buf.getvalue()],
                "n_members": [n_members],
                "n_samples": [len(pdf)],
                "data_bytes": [int(pdf["payload_bytes"].sum())],
            }
        )

    return rows.groupBy("shard_id").applyInPandas(_build, WDS_SHARD_SCHEMA)


def read_wds_shards(shards: DataFrame) -> DataFrame:
    """Parse ``(shard_id, tar_bytes)`` rows back into samples:
    ``(shard_id, image_id, payload, caption)`` — the inverse of
    :func:`write_wds_shards` (roundtrip-exact, test- and
    oracle-pinned). A missing ``.txt`` member yields a NULL caption;
    a truncated/junk archive raises (a shard store is trusted
    infrastructure, unlike crawled payloads — no skip-the-row
    contract here)."""

    def _parse(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                with tarfile.open(fileobj=io.BytesIO(bytes(r["tar_bytes"]))) as tf:
                    samples: dict[str, dict] = {}
                    for m in tf.getmembers():
                        stem, _, kind = m.name.rpartition(".")
                        if not m.isfile() or not stem or kind not in ("img", "txt"):
                            # foreign member: unknown extension, or a
                            # non-regular entry (dir/symlink — extractfile
                            # returns None for those and would crash)
                            continue
                        data = tf.extractfile(m).read()
                        s = samples.setdefault(stem, {"payload": None, "caption": None})
                        if kind == "img":
                            s["payload"] = data
                        else:
                            s["caption"] = data.decode("utf-8")
                    for stem, s in samples.items():
                        out.append(
                            {
                                "shard_id": int(r["shard_id"]),
                                "image_id": stem,
                                "payload": s["payload"],
                                "caption": s["caption"],
                            }
                        )
            yield pd.DataFrame(
                out, columns=["shard_id", "image_id", "payload", "caption"]
            )

    return shards.select("shard_id", "tar_bytes").mapInPandas(
        _parse, WDS_SAMPLE_SCHEMA
    )
