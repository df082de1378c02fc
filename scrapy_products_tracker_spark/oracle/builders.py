"""Spark-free builders for DuckDB-oracle expected artifacts.

The CORRECTNESS gate runs each ``queries()`` entry against a DuckDB SQL
twin. For operators whose core work is not expressible in SQL (64-bit
hashing, the crawl loop, LSH planes), the twin consumes a parquet file
computed here by an INDEPENDENT pure-Python implementation:

- crawl/export artifacts come from the reference-semantics simulator
  (oracle/simulator.py) + the world generator's ground-truth product
  fields — no engine code in the data path;
- MinHash signatures / SimHash fingerprints reuse the pure-Python
  xxhash64 (functions/hashing.py, bit-parity-pinned against Spark) and
  plain Python arithmetic — independent of the DataFrame kernels in
  functions/similarity.py;
- ANN bucket assignments replicate the hyperplane projection with the
  same left-fold double arithmetic Spark's ``aggregate`` uses.

Builders are idempotent and cheap (they run at the CORRECTNESS scale,
sf=0.01 / the T1 smoke world); ``oracle_sql()`` calls them at string-
construction time so artifact existence never depends on query
execution order.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

from ..functions.hashing import xxhash64_str

# the driver runs the oracle comparison at this scale (TESTDATA.md);
# bench runs (other sf) never evaluate oracle SQL
CORRECTNESS_SF = "/root/testdata/sf0.01"
ORACLE_DIR = Path(tempfile.gettempdir()) / "sptspark_oracle_r2"

_MERSENNE31 = (1 << 31) - 1


def _write(df: pd.DataFrame, name: str, schema) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    ORACLE_DIR.mkdir(parents=True, exist_ok=True)
    path = ORACLE_DIR / name
    pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False), path)
    return str(path)


# ---------------------------------------------------------------------------
# crawl-engine artifacts: simulator + world ground truth (T1 smoke world)
# ---------------------------------------------------------------------------

_crawl_cache: dict = {}

EXPORT_COLS = [
    "url",
    "title",
    "description",
    "brand",
    "image_url",
    "additional_info",
    "category",
    "regular_price_cents",
    "current_price_cents",
    "currency",
    "is_in_stock",
    "stock",
    "units",
    "position",
    "session",
    "round",
]


def _sim_world():
    if "sim" not in _crawl_cache:
        from ..synth.world import T1_SMOKE, generate_world
        from .simulator import simulate_sessions

        world = generate_world(T1_SMOKE)
        _crawl_cache["world"] = world
        _crawl_cache["sim"] = simulate_sessions(world, n_sessions=2, chunk_size=50)
    return _crawl_cache["world"], _crawl_cache["sim"]


def build_crawl_order_expected() -> str:
    import pyarrow as pa

    _, sim = _sim_world()
    df = pd.DataFrame(sim.crawl_order, columns=["round", "url", "domain", "within_round_rank"])
    schema = pa.schema(
        [
            ("round", pa.int32()),
            ("url", pa.string()),
            ("domain", pa.string()),
            ("within_round_rank", pa.int32()),
        ]
    )
    return _write(df, "crawl_order.parquet", schema)


def build_export_expected() -> str:
    """Expected history⋈targets export rows: one per (fetched-OK,
    parseable) detail page per session — item rounds/positions from the
    simulator, product fields from the generator's ground truth."""
    import pyarrow as pa

    world, sim = _sim_world()
    truth = {r["url"]: r for _, r in world.truth.iterrows()}
    rows = []
    for url, round_no, _iid, _cap, pos in sim.items:
        t = truth.get(url)
        if t is None or not t["parse_ok"]:
            continue
        rows.append(
            {
                "url": url,
                "title": t["title"],
                "description": t["description"] if pd.notna(t["description"]) else None,
                "brand": t["brand"],
                "image_url": t["image_url"],
                "additional_info": t["additional_info"] if pd.notna(t["additional_info"]) else None,
                "category": t["category"],
                "regular_price_cents": int(t["regular_price_cents"]),
                "current_price_cents": int(t["current_price_cents"]),
                "currency": t["currency"],
                "is_in_stock": bool(t["is_in_stock"]),
                "stock": int(t["stock"]),
                "units": t["units"],
                "position": int(pos),
                "session": int(sim.session_of_round(round_no)),
                "round": int(round_no),
            }
        )
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("title", pa.string()),
            ("description", pa.string()),
            ("brand", pa.string()),
            ("image_url", pa.string()),
            ("additional_info", pa.string()),
            ("category", pa.string()),
            ("regular_price_cents", pa.int64()),
            ("current_price_cents", pa.int64()),
            ("currency", pa.string()),
            ("is_in_stock", pa.bool_()),
            ("stock", pa.int32()),
            ("units", pa.string()),
            ("position", pa.int32()),
            ("session", pa.int32()),
            ("round", pa.int32()),
        ]
    )
    return _write(pd.DataFrame(rows, columns=EXPORT_COLS), "export_expected.parquet", schema)


def stop_victims(n: int = 2) -> list[str]:
    """Deterministic stop-tracking victims: first n product urls."""
    world, sim = _sim_world()
    truth = {r["url"]: r for _, r in world.truth.iterrows()}
    urls = sorted(
        {u for (u, _r, _i, _c, _p) in sim.items if truth.get(u) is not None and truth[u]["parse_ok"]}
    )
    return urls[:n]


def build_stop_rearm_expected() -> str:
    """Frontier (url, status) after: 2-session crawl, stop-tracking the
    victims, rearm to session 3 (no further crawl). Terminal non-victim
    rows re-arm to PENDING; victims keep their terminal status;
    robots-skipped rows stay skipped."""
    import pyarrow as pa

    from ..schemas import ERROR, HARDWARE_ERROR, PENDING, SUCCESS

    _, sim = _sim_world()
    victims = set(stop_victims())
    rows = []
    for url, row in sim.seen.items():
        st = row["status"]
        if st in (SUCCESS, ERROR, HARDWARE_ERROR) and url not in victims:
            st = PENDING
        rows.append({"url": url, "status": int(st)})
    schema = pa.schema([("url", pa.string()), ("status", pa.int32())])
    return _write(pd.DataFrame(rows), "stop_rearm_expected.parquet", schema)


def build_multimodal_expected() -> str:
    """Expected per-format decode stats for the T1 payload table,
    computed from the generator's ground-truth source pixels — the
    codec's decode path is never called here. ``fmt='png'`` is lossless,
    so expected decoded pixels ARE the source pixels; ``fmt='jpeg'`` is
    the documented deterministic surrogate (imaging/codec.py docstring):
    quantization ``min((p // 6) * 6 + 3, 255)``, reproduced from that
    spec. A decode bug, a stats-kernel bug, or an agg/schema bug in
    q_multimodal_decode_stats all surface as a hash mismatch."""
    import pyarrow as pa

    from ..synth.world import _rng_for, _source_pixels

    world, _ = _sim_world()
    spec = world.spec
    per = []
    for image_id, fmt in zip(world.image_caption["image_id"], world.image_caption["fmt"]):
        pixels, fmt2 = _source_pixels(_rng_for(spec.seed, "img", image_id), spec)
        assert fmt2 == fmt, f"world fmt drift for {image_id}"
        if fmt == "jpeg":  # surrogate-lossy closed form, Q=6
            pixels = np.minimum((pixels.astype(np.int32) // 6) * 6 + 3, 255).astype(np.uint8)
        per.append((fmt, pixels.shape[0] * pixels.shape[1], float(pixels.mean())))
    pdf = pd.DataFrame(per, columns=["fmt", "px", "mean_intensity"])
    agg = (
        pdf.groupby("fmt", as_index=False)
        .agg(
            n=("px", "size"),
            total_px=("px", "sum"),
            avg_intensity=("mean_intensity", "mean"),
        )
        .sort_values("fmt")
    )
    agg["n_ok"] = agg["n"]  # every generated payload decodes
    agg["avg_intensity"] = agg["avg_intensity"].round(2)
    agg = agg[["fmt", "n", "n_ok", "total_px", "avg_intensity"]]
    schema = pa.schema(
        [
            ("fmt", pa.string()),
            ("n", pa.int64()),
            ("n_ok", pa.int64()),
            ("total_px", pa.int64()),
            ("avg_intensity", pa.float64()),
        ]
    )
    return _write(agg, "multimodal_expected.parquet", schema)


_MASK64 = (1 << 64) - 1


def _signed64(u: int) -> int:
    u &= _MASK64
    return u - (1 << 64) if u >= (1 << 63) else u


def build_phash_pairs_inputs() -> str:
    """(image_id, phash) table for the phash near-dup oracle: the T1
    payload table's ground-truth phashes plus, per image, one planted
    near-duplicate variant whose phash differs in at most 2 bits. The
    flipped bit positions come from the pure-Python xxhash64
    (bit-parity-pinned against Spark's), so the Spark query can rebuild
    the identical variants with ``F.xxhash64`` and the two sides share
    no code beyond that pinned kernel."""
    import pyarrow as pa

    world, _ = _sim_world()
    rows = []
    for image_id, ph in zip(world.image_caption["image_id"], world.image_caption["phash"]):
        ph = int(ph)
        rows.append((image_id, ph))
        b1 = xxhash64_str(image_id) % 64
        b2 = xxhash64_str(image_id + "b") % 64
        rows.append((image_id + "~v", _signed64((ph & _MASK64) ^ (1 << b1) ^ (1 << b2))))
    schema = pa.schema([("image_id", pa.string()), ("phash", pa.int64())])
    return _write(
        pd.DataFrame(rows, columns=["image_id", "phash"]), "phash_inputs.parquet", schema
    )


def build_dhash_inputs() -> str:
    """(image_id, dhash) fixture for the gradient-hash near-dup oracle:
    dhash64 (codec) over the generator's ground-truth source pixels
    (+ jpeg surrogate quantization — the decode kernel's contract),
    plus one <=2-bit planted variant per image at xxhash64-pinned
    positions ('d'/'e' salts, distinct from the phash fixture's)."""
    import pyarrow as pa

    from ..imaging.codec import dhash64
    from ..synth.world import _rng_for, _source_pixels

    world, _ = _sim_world()
    spec = world.spec
    rows = []
    for image_id, fmt in zip(world.image_caption["image_id"], world.image_caption["fmt"]):
        pixels, fmt2 = _source_pixels(_rng_for(spec.seed, "img", image_id), spec)
        assert fmt2 == fmt
        if fmt == "jpeg":
            pixels = np.minimum((pixels.astype(np.int32) // 6) * 6 + 3, 255).astype(np.uint8)
        dh = dhash64(pixels)
        rows.append((image_id, dh))
        b1 = xxhash64_str(image_id + "d") % 64
        b2 = xxhash64_str(image_id + "e") % 64
        rows.append((image_id + "~v", _signed64((dh & _MASK64) ^ (1 << b1) ^ (1 << b2))))
    schema = pa.schema([("image_id", pa.string()), ("dhash", pa.int64())])
    return _write(
        pd.DataFrame(rows, columns=["image_id", "dhash"]), "dhash_inputs.parquet", schema
    )


def build_patch_hash_inputs() -> str:
    """(image_id, patch_row, patch_col, patch_hash) fixture for the
    patch-overlap near-dup oracle: ground-truth source pixels (+ jpeg
    surrogate quantization) resized to 64x64 nearest-neighbor, 4x4
    integer-lattice patches hashed with codec.phash64 — the exact
    numeric twin of resize_images → patch_hash_table. Per image one
    planted overlay variant (``~v``): identical patch hashes except
    patch (0,0), whose hash is XOR-flipped at an xxhash64-pinned bit
    ('p' salt) — a localized edit that global phash would smear across
    the whole hash."""
    import pyarrow as pa

    from ..imaging.codec import phash64
    from ..imaging.media import resize_nearest
    from ..synth.world import _rng_for, _source_pixels

    world, _ = _sim_world()
    spec = world.spec
    rows = []
    for image_id, fmt in zip(world.image_caption["image_id"], world.image_caption["fmt"]):
        pixels, fmt2 = _source_pixels(_rng_for(spec.seed, "img", image_id), spec)
        assert fmt2 == fmt
        if fmt == "jpeg":
            pixels = np.minimum((pixels.astype(np.int32) // 6) * 6 + 3, 255).astype(np.uint8)
        rp = resize_nearest(pixels, 64, 64)
        flip = 1 << (xxhash64_str(image_id + "p") % 64)
        for i in range(4):
            for j in range(4):
                ph = phash64(rp[i * 16 : (i + 1) * 16, j * 16 : (j + 1) * 16])
                rows.append((image_id, i, j, ph))
                vh = _signed64((ph & _MASK64) ^ flip) if (i, j) == (0, 0) else ph
                rows.append((image_id + "~v", i, j, vh))
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("patch_row", pa.int32()),
            ("patch_col", pa.int32()),
            ("patch_hash", pa.int64()),
        ]
    )
    return _write(
        pd.DataFrame(rows, columns=["image_id", "patch_row", "patch_col", "patch_hash"]),
        "patch_hash_inputs.parquet",
        schema,
    )


def build_image_dedup_inputs() -> str:
    """(image_id, fp, phash) table for the composed image-dedup oracle:
    per T1 payload image, the original row, an exact byte duplicate
    (``~x`` — same bytes, same phash; the exact pass must keep only the
    lexicographically-lowest id), and a near-duplicate (``~v`` — bytes
    suffixed with one byte so it survives the exact pass, phash flipped
    in <=2 xxhash64-pinned bit positions so the perceptual pass drops
    it). ``fp`` is the pure-Python md5 of the bytes — the oracle's
    independent stand-in for the engine's Spark-side ``F.md5(bytes)``
    grouping (identical bytes => identical fp on both sides). ``ntok``
    is the caption's space-token count after the variants' caption
    edits (~x appends 2 tokens, ~v appends 3) — the prefer key of the
    best-caption query (captions are single-spaced by construction, so
    python split(' ') == Spark split(caption, ' '))."""
    import hashlib

    import pyarrow as pa

    world, _ = _sim_world()
    rows = []
    for image_id, data, ph, cap in zip(
        world.image_caption["image_id"],
        world.image_caption["bytes"],
        world.image_caption["phash"],
        world.image_caption["caption"],
    ):
        ph = int(ph)
        fp = hashlib.md5(bytes(data)).hexdigest()
        ntok = len(cap.split(" "))
        rows.append((image_id, fp, ph, ntok))
        rows.append((image_id + "~x", fp, ph, ntok + 2))
        b1 = xxhash64_str(image_id) % 64
        b2 = xxhash64_str(image_id + "b") % 64
        rows.append(
            (
                image_id + "~v",
                hashlib.md5(bytes(data) + b"v").hexdigest(),
                _signed64((ph & _MASK64) ^ (1 << b1) ^ (1 << b2)),
                ntok + 3,
            )
        )
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("fp", pa.string()),
            ("phash", pa.int64()),
            ("ntok", pa.int32()),
        ]
    )
    return _write(
        pd.DataFrame(rows, columns=["image_id", "fp", "phash", "ntok"]),
        "image_dedup_inputs.parquet",
        schema,
    )


# ---------------------------------------------------------------------------
# MinHash / SimHash / ANN artifacts (independent pure-Python impls)
# ---------------------------------------------------------------------------


def _documents(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _minhash_sig_rows(docs, n_hashes: int, k: int, seed: int) -> list[dict]:
    """Independent MinHash: same shingle/permutation definitions as
    functions/similarity.minhash_signature, computed with pure Python
    xxhash64 + integer arithmetic (no Spark). ``docs`` iterates
    (doc_id, text)."""
    import re

    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE31, n_hashes, dtype=np.int64)
    coefs = [pow(1315423911, j + 1, _MERSENNE31) for j in range(k)]
    out = []
    for doc_id, text in docs:
        t = text.strip()
        toks = re.split(r"\s+", t)
        if len(toks) >= k:
            hs = [xxhash64_str(tok) % _MERSENNE31 for tok in toks]
            xs = np.array(
                [
                    sum(hs[i + j] * coefs[j] % _MERSENNE31 for j in range(k)) % _MERSENNE31
                    for i in range(len(hs) - k + 1)
                ],
                dtype=np.int64,
            )
        else:
            xs = np.array([xxhash64_str(t) % _MERSENNE31], dtype=np.int64)
        sig = [int(((xs * int(a[i]) + int(b[i])) % _MERSENNE31).min()) for i in range(n_hashes)]
        out.append({"doc": int(doc_id), "sig": sig})
    return out


def build_minhash_signatures(sf_dir: str = CORRECTNESS_SF, n_hashes: int = 32, k: int = 3, seed: int = 42) -> str:
    import pyarrow as pa

    docs = _documents(sf_dir)
    out = _minhash_sig_rows(zip(docs["doc_id"], docs["text"]), n_hashes, k, seed)
    schema = pa.schema([("doc", pa.int64()), ("sig", pa.list_(pa.int64()))])
    return _write(pd.DataFrame(out), "minhash_sig.parquet", schema)


# --- planted-chain corpus for cluster-exact (transitive) dedup -------------

N_CHAINS = 30
N_CHAIN_SINGLETONS = 10
CHAIN_THRESHOLD = 0.15
# 32 hashes / 32 single-row bands: with the fixed seed every planted
# edge estimates >= 0.23 (checked), no X~Y false pair, no band miss —
# and 32-wide signatures keep whole-stage codegen compile time sane
# (128-wide ran the same 40-row answer 20x slower, all Janino)
CHAIN_N_HASHES = 32
CHAIN_BANDS = 32


def chain_corpus_rows() -> list[tuple[int, str]]:
    """Deterministic planted duplicate chains, one per component:
    X (id c*10) = words c*1000..+59, Y (id c*10+1) = words c*1000+500..
    +559 (vocabulary disjoint from X), hub H (id c*10+2) = first 30
    words of X + first 30 words of Y. True J(X,H) = J(Y,H) = 28/88 ~
    0.318 >= threshold 0.15 (est noise at CHAIN_N_HASHES=32 hashes
    stays well under the 0.17 margin);
    J(X,Y) = 0 — the component {X, Y, H} exists only transitively.
    Pairwise greedy-by-id drops only H (the higher id of BOTH pairs);
    cluster-exact must keep exactly the min id X. Plus singletons with
    their own vocabulary. The Spark side rebuilds the identical texts
    with JVM column algebra (no shared code with this builder)."""

    def words(start: int, cnt: int) -> str:
        return " ".join(f"w{j}" for j in range(start, start + cnt))

    rows = []
    for c in range(N_CHAINS):
        base = c * 1000
        rows.append((c * 10, words(base, 60)))
        rows.append((c * 10 + 1, words(base + 500, 60)))
        rows.append((c * 10 + 2, words(base, 30) + " " + words(base + 500, 30)))
    for s in range(N_CHAIN_SINGLETONS):
        rows.append((9000 + s, words(500_000 + s * 1000, 60)))
    return rows


def build_chain_signatures() -> str:
    import pyarrow as pa

    out = _minhash_sig_rows(chain_corpus_rows(), CHAIN_N_HASHES, k=3, seed=42)
    schema = pa.schema([("doc", pa.int64()), ("sig", pa.list_(pa.int64()))])
    return _write(pd.DataFrame(out), "chain_minhash_sig.parquet", schema)


def build_simhash_expected(sf_dir: str = CORRECTNESS_SF) -> str:
    import pyarrow as pa
    import re

    docs = _documents(sf_dir)
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        votes = [0] * 64
        for tok in re.split(r"\s+", text.strip()):
            h = xxhash64_str(tok)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        v = sum((1 << i) for i in range(63) if votes[i] > 0)
        if votes[63] > 0:
            v -= 1 << 63
        rows.append({"doc": int(doc_id), "simhash": v})
    schema = pa.schema([("doc", pa.int64()), ("simhash", pa.int64())])
    return _write(pd.DataFrame(rows), "simhash_expected.parquet", schema)


def _fold_dot(vec, plane) -> float:
    """Left-fold double dot product — the exact evaluation order of
    Spark's ``aggregate(zip_with(...))`` so projection signs match
    bit-for-bit."""
    acc = np.float64(0.0)
    for x, p in zip(vec, plane):
        acc = acc + np.float64(x) * np.float64(p)
    return float(acc)


def build_ann_assignments(sf_dir: str = CORRECTNESS_SF, n_planes: int = 8, seed: int = 42) -> tuple[str, int]:
    """(assignments parquet path, query bucket): replicates
    functions/similarity.lsh_bucket_col / ann_topk_lsh without Spark."""
    import pyarrow as pa

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(emb["embedding"].iloc[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).tolist()
    qvec = [float(x) for x in emb.loc[emb["vec_id"] == 0, "embedding"].iloc[0]]
    qb = int(
        sum(
            (1 << i)
            for i, p in enumerate(planes)
            if float(np.dot(np.asarray(p), np.asarray(qvec))) >= 0
        )
    )
    rows = []
    for vec_id, vec in zip(emb["vec_id"], emb["embedding"]):
        if vec_id == 0:
            continue
        bucket = sum(
            (1 << i) for i, p in enumerate(planes) if _fold_dot(vec, p) >= 0
        )
        rows.append({"vec_id": int(vec_id), "bucket": int(bucket)})
    schema = pa.schema([("vec_id", pa.int64()), ("bucket", pa.int64())])
    path = _write(pd.DataFrame(rows), "ann_buckets.parquet", schema)
    return path, qb


def build_band_assignments(
    sf_dir: str = CORRECTNESS_SF,
    n_bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
) -> str:
    """(vec_id, band, bucket) parquet: replicates
    functions/similarity.lsh_band_buckets without Spark (same
    random_hyperplanes seed stream, same left-fold projection sign)."""
    import pyarrow as pa

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(emb["embedding"].iloc[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands * planes_per_band, dim)).tolist()
    rows = []
    for vec_id, vec in zip(emb["vec_id"], emb["embedding"]):
        for b in range(n_bands):
            sub = planes[b * planes_per_band : (b + 1) * planes_per_band]
            bucket = sum((1 << i) for i, p in enumerate(sub) if _fold_dot(vec, p) >= 0)
            rows.append({"vec_id": int(vec_id), "band": b, "bucket": int(bucket)})
    schema = pa.schema([("vec_id", pa.int64()), ("band", pa.int32()), ("bucket", pa.int64())])
    return _write(pd.DataFrame(rows), "band_buckets.parquet", schema)


def build_image_caption_meta() -> str:
    """(image_id, w, h, fmt, caption, n_cap_tokens, n_payload_bytes)
    metadata table for the image+caption dataset-curation oracles
    (laion filter, aspect buckets, shard packing, caption-frequency
    filter). Token counts and payload byte sizes are computed HERE in
    pure Python (``str.split()`` / ``len(bytes) + len(caption.
    encode())``) — independent of the Spark-side ``split``/
    ``octet_length`` kernels they check — while dimensions/format/
    caption are the generator's shared ground truth (the same fixture
    role documents.parquet plays for the text oracles)."""
    import pyarrow as pa

    world, _ = _sim_world()
    ic = world.image_caption
    rows = []
    for image_id, data, w, h, fmt, caption in zip(
        ic["image_id"], ic["bytes"], ic["w"], ic["h"], ic["fmt"], ic["caption"]
    ):
        cap = caption if caption is not None else ""
        rows.append(
            {
                "image_id": image_id,
                "w": int(w),
                "h": int(h),
                "fmt": fmt,
                "caption": caption,
                "n_cap_tokens": len(cap.split()),
                "n_payload_bytes": len(data) + len(cap.encode("utf-8")),
                # wds-roundtrip oracle fields: image-only byte length
                # and pure-Python md5 of the image payload — checked
                # against what the Spark tar writer/reader hands back
                "n_img_bytes": len(data),
                "img_md5": hashlib.md5(bytes(data)).hexdigest(),
            }
        )
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("n_cap_tokens", pa.int32()),
            ("n_payload_bytes", pa.int64()),
            ("n_img_bytes", pa.int64()),
            ("img_md5", pa.string()),
        ]
    )
    return _write(pd.DataFrame(rows), "image_caption_meta.parquet", schema)


def _digits(image_id: str) -> int:
    """First run of digits in an id — the deterministic planting key
    the integrity-audit queries use on BOTH engines (Spark:
    ``regexp_extract(image_id, '([0-9]+)', 1)``)."""
    import re

    m = re.search(r"[0-9]+", image_id)
    return int(m.group()) if m else 0


def _sniff_container(data: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Independent pure-Python header parse (struct.unpack over fixed
    offsets) — checks the engine's substring/hex/conv column algebra
    in imaging/headers.py without sharing a line with it."""
    import struct as _struct

    png_sig = b"\x89PNG\r\n\x1a\n"
    if data is None:
        return None, None, None
    if data[:8] == png_sig:
        if len(data) >= 24:
            w, h = _struct.unpack(">II", data[16:24])
            return "png", w, h
        return "png", None, None
    if data[:12] == b"LSY1" + png_sig:
        if len(data) >= 28:
            w, h = _struct.unpack(">II", data[20:28])
            return "lossy-png", w, h
        return "lossy-png", None, None
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg", None, None
    return "unknown", None, None


def build_header_audit_inputs() -> str:
    """Planted-corruption table for the header-integrity oracle. The
    Spark query applies the SAME digit-keyed corruption plan to the T1
    payload table (d%7: 0=truncate to 10 bytes, 1=swap the fmt column,
    2=prepend 2 garbage bytes, 3=NULL bytes); this builder replicates
    the plan on the simulator world's raw bytes and parses the result
    with struct.unpack, so the artifact carries independently-derived
    (container, hdr_w, hdr_h) next to the ground-truth (fmt, w, h) —
    the oracle SQL computes the flags relationally from it."""
    import pyarrow as pa

    world, _ = _sim_world()
    ic = world.image_caption
    rows = []
    for image_id, data, w, h, fmt in zip(
        ic["image_id"], ic["bytes"], ic["w"], ic["h"], ic["fmt"]
    ):
        data = bytes(data)
        d = _digits(image_id) % 7
        if d == 0:
            data = data[:10]
        elif d == 1:
            fmt = "jpeg" if fmt == "png" else "png"
        elif d == 2:
            data = b"XX" + data
        elif d == 3:
            data = None
        container, hdr_w, hdr_h = _sniff_container(data)
        rows.append((image_id, fmt, int(w), int(h), container, hdr_w, hdr_h))
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("fmt", pa.string()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("container", pa.string()),
            ("hdr_w", pa.int64()),
            ("hdr_h", pa.int64()),
        ]
    )
    return _write(
        pd.DataFrame(rows, columns=["image_id", "fmt", "w", "h", "container", "hdr_w", "hdr_h"]),
        "header_audit_inputs.parquet",
        schema,
    )


def _ahash64_indep(pixels: np.ndarray) -> int:
    """Independent 64-bit average hash: integral-image block means
    (cumsum of exact-integer channel sums) instead of the engine's
    per-block ``.mean()`` loops (imaging/codec.py phash64). Bit-equal
    on well-formed inputs; any drift in either implementation shows up
    as an oracle hash mismatch."""
    px = pixels.astype(np.float64)
    gray3 = px.sum(axis=2) if px.ndim == 3 else px * 3.0  # 3x gray, integer-exact
    h, w = gray3.shape
    S = np.zeros((h + 1, w + 1))
    S[1:, 1:] = gray3.cumsum(axis=0).cumsum(axis=1)
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            area = (ys[i + 1] - ys[i]) * (xs[j + 1] - xs[j])
            s = S[ys[i + 1], xs[j + 1]] - S[ys[i], xs[j + 1]] - S[ys[i + 1], xs[j]] + S[ys[i], xs[j]]
            blocks[i, j] = s / area
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return _signed64(val)


def build_phash_audit_expected() -> str:
    """Expected (image_id, fmt, dist) for the phash-audit query: the
    stored hash AND the recomputed hash are both re-derived here from
    the generator's ground-truth source pixels via the independent
    integral-image average hash (_ahash64_indep) — the engine's
    decode path and codec.phash64 are never called. Plan (d = digits
    % 5): d==0 rows get junk-prepended bytes (undecodable -> dist
    NULL); d==1 rows get a stale stored hash (xor 0b111); lossy rows
    recompute over the closed-form quantized pixels, so their dist is
    the quantization noise of the average hash."""
    import pyarrow as pa

    from ..synth.world import _rng_for, _source_pixels

    world, _ = _sim_world()
    spec = world.spec
    rows = []
    for image_id, fmt in zip(world.image_caption["image_id"], world.image_caption["fmt"]):
        pixels, fmt2 = _source_pixels(_rng_for(spec.seed, "img", image_id), spec)
        assert fmt2 == fmt, f"world fmt drift for {image_id}"
        stored = _ahash64_indep(pixels)
        d = _digits(image_id) % 5
        if d == 1:
            stored = _signed64((stored & _MASK64) ^ 0b111)
        if d == 0:
            dist = None  # junk-prepended payload: undecodable
        else:
            decoded = pixels
            if fmt == "jpeg":  # surrogate-lossy closed form, Q=6
                decoded = np.minimum((pixels.astype(np.int32) // 6) * 6 + 3, 255).astype(
                    np.uint8
                )
            recomputed = _ahash64_indep(decoded)
            dist = bin(((stored ^ recomputed) & _MASK64)).count("1")
        rows.append((image_id, fmt, dist))
    schema = pa.schema(
        [("image_id", pa.string()), ("fmt", pa.string()), ("dist", pa.int32())]
    )
    return _write(
        pd.DataFrame(rows, columns=["image_id", "fmt", "dist"]),
        "phash_audit_expected.parquet",
        schema,
    )


def build_dsir_token_buckets(sf_dir: str = CORRECTNESS_SF, n_buckets: int = 512) -> str:
    """Per-token-instance (doc_id, tgt, b) table for the DSIR oracle:
    tokens from pure-Python ``str.split()`` (== trim + ``\\s+`` split
    for non-empty text), buckets from the pinned pure-Python xxhash64
    — independent of the Spark explode/pmod kernel. The histogram,
    smoothing, fixed-point log scores, and per-doc sums all happen
    relationally in the oracle SQL."""
    import pyarrow as pa

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    rows = []
    for doc_id, lang, text in zip(docs["doc_id"], docs["lang"], docs["text"]):
        tgt = lang == "en"
        for tok in (text.split() if isinstance(text, str) else []):
            rows.append((int(doc_id), tgt, xxhash64_str(tok) % n_buckets))
    schema = pa.schema(
        [("doc_id", pa.int64()), ("tgt", pa.bool_()), ("b", pa.int32())]
    )
    return _write(
        pd.DataFrame(rows, columns=["doc_id", "tgt", "b"]),
        "dsir_token_buckets.parquet",
        schema,
    )


def build_color_expected() -> str:
    """Expected per-row color/saturation metrics (quality.
    color_metrics) recomputed from ground-truth source pixels with
    independently-written formulas: std as explicit
    sqrt-of-mean-of-squares, channel spread via chained
    np.maximum/np.minimum instead of axis reductions, gray fraction
    as an integer count ratio. Planting mirrors q_image_color
    (digits % 8 == 0 rows get junk-prepended bytes -> NULL metrics)."""
    import pyarrow as pa

    from ..synth.world import _rng_for, _source_pixels

    world, _ = _sim_world()
    spec = world.spec
    rows = []
    for image_id, fmt in zip(world.image_caption["image_id"], world.image_caption["fmt"]):
        pixels, fmt2 = _source_pixels(_rng_for(spec.seed, "img", image_id), spec)
        assert fmt2 == fmt, f"world fmt drift for {image_id}"
        if _digits(image_id) % 8 == 0:
            rows.append((image_id, fmt, None, None, None))
            continue
        if fmt == "jpeg":  # surrogate-lossy closed form, Q=6
            pixels = np.minimum((pixels.astype(np.int32) // 6) * 6 + 3, 255).astype(np.uint8)
        r = pixels[:, :, 0].astype(np.float64)
        g = pixels[:, :, 1].astype(np.float64)
        b = pixels[:, :, 2].astype(np.float64)
        rg = r - g
        yb = (r + g) / 2.0 - b

        def _std(x):
            return float(np.sqrt(np.mean(np.square(x - x.mean()))))

        colorfulness = float(
            np.sqrt(_std(rg) ** 2 + _std(yb) ** 2)
            + 0.3 * np.sqrt(float(rg.mean()) ** 2 + float(yb.mean()) ** 2)
        )
        ri = pixels[:, :, 0].astype(np.int64)
        gi = pixels[:, :, 1].astype(np.int64)
        bi = pixels[:, :, 2].astype(np.int64)
        spread = np.maximum(np.maximum(ri, gi), bi) - np.minimum(np.minimum(ri, gi), bi)
        gray_frac = int((spread == 0).sum()) / spread.size
        sat_mean = float(spread.mean())
        rows.append(
            (
                image_id,
                fmt,
                int(round(colorfulness * 1000)),
                int(round(gray_frac * 1000)),
                int(round(sat_mean * 1000)),
            )
        )
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("fmt", pa.string()),
            ("colorfulness_milli", pa.int64()),
            ("gray_frac_milli", pa.int64()),
            ("sat_mean_milli", pa.int64()),
        ]
    )
    return _write(
        pd.DataFrame(
            rows,
            columns=[
                "image_id", "fmt", "colorfulness_milli", "gray_frac_milli",
                "sat_mean_milli",
            ],
        ),
        "color_expected.parquet",
        schema,
    )


def build_quality_expected() -> str:
    """Expected per-row image quality metrics, recomputed from the
    generator's ground-truth source pixels (never the codec) with an
    independently-written formula set: unique-count entropy instead of
    bincount, explicit column differences instead of np.diff, explicit
    sqrt-of-mean-square instead of .std(). Mathematically identical,
    differently coded — a formula or decode drift on either side shows
    as a value mismatch. Planting mirrors q_image_quality (digits % 9
    == 0 rows get junk-prepended bytes -> NULL metrics)."""
    import pyarrow as pa

    from ..synth.world import _rng_for, _source_pixels

    world, _ = _sim_world()
    spec = world.spec
    rows = []
    for image_id, fmt in zip(world.image_caption["image_id"], world.image_caption["fmt"]):
        pixels, fmt2 = _source_pixels(_rng_for(spec.seed, "img", image_id), spec)
        assert fmt2 == fmt, f"world fmt drift for {image_id}"
        if _digits(image_id) % 9 == 0:
            rows.append((image_id, fmt, None, None, None, None))
            continue
        if fmt == "jpeg":  # surrogate-lossy closed form, Q=6
            pixels = np.minimum((pixels.astype(np.int32) // 6) * 6 + 3, 255).astype(np.uint8)
        px = pixels if pixels.ndim == 3 else pixels[:, :, None]
        gray = px.mean(axis=2)
        brightness = float(gray.mean())
        contrast = float(np.sqrt(np.mean(np.square(gray - gray.mean()))))
        sharp = (
            float(np.mean(np.abs(gray[:, 1:] - gray[:, :-1]))) if gray.shape[1] > 1 else 0.0
        )
        vals, counts = np.unique(px.reshape(-1), return_counts=True)
        p = counts.astype(np.float64) / counts.sum()
        entropy = float(-(p * np.log2(p)).sum())
        rows.append(
            (
                image_id,
                fmt,
                int(round(brightness * 1000)),
                int(round(contrast * 1000)),
                int(round(sharp * 1000)),
                int(round(entropy * 1000)),
            )
        )
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("fmt", pa.string()),
            ("brightness_milli", pa.int64()),
            ("contrast_milli", pa.int64()),
            ("sharpness_milli", pa.int64()),
            ("entropy_milli", pa.int64()),
        ]
    )
    return _write(
        pd.DataFrame(
            rows,
            columns=[
                "image_id", "fmt", "brightness_milli", "contrast_milli",
                "sharpness_milli", "entropy_milli",
            ],
        ),
        "quality_expected.parquet",
        schema,
    )


def build_mm_dedup_inputs() -> str:
    """(image_id, phash, cap) table for the joint image+caption dedup
    oracle — the T1 payload rows plus the query's two planted variant
    families, phashes rebuilt with the pinned pure-Python xxhash64:

    - ``~cc`` (digits % 6 == 0): SAME caption as the base row, far
      random-ish phash (xxhash64 of image_id+'cc') — caption edge only;
    - ``~pp`` (digits % 6 == 1): base phash with ONE pinned bit
      flipped (dist 1 <= 7) and a unique caption — image edge only.

    The oracle SQL unions all-pairs Hamming edges with caption-equal
    edges and runs the recursive-CTE components."""
    import pyarrow as pa

    world, _ = _sim_world()
    ic = world.image_caption
    rows = []
    for image_id, ph, cap in zip(ic["image_id"], ic["phash"], ic["caption"]):
        ph = int(ph)
        rows.append((image_id, ph, cap))
        d = _digits(image_id) % 6
        if d == 0:
            rows.append((image_id + "~cc", xxhash64_str(image_id + "cc"), cap))
        elif d == 1:
            bit = xxhash64_str(image_id + "pp") % 64
            rows.append(
                (image_id + "~pp", _signed64((ph & _MASK64) ^ (1 << bit)), cap + " pp")
            )
    schema = pa.schema(
        [("image_id", pa.string()), ("phash", pa.int64()), ("cap", pa.string())]
    )
    return _write(
        pd.DataFrame(rows, columns=["image_id", "phash", "cap"]),
        "mm_dedup_inputs.parquet",
        schema,
    )


def build_sitemap_bodies() -> str:
    """(url, body) deterministic sitemap-XML fixture rendered from the
    T1 world's detail URLs — shared INPUT for the sitemap-ingest oracle
    (the fixture role render_detail_html plays for extraction): Spark
    parses it with crawl/sitemap.py, DuckDB re-parses it with its own
    regexp + try_strptime SQL, and the two parsers must agree
    field-exactly.

    Planting (n = the /p/{n} id): lastmod n%4 -> full W3C timestamp /
    date-only / absent / malformed "2026-99-99" (parses to NULL both
    engines); priority n%3 -> "0.{n%10}" / absent / out-of-range "1.5"
    (clamps to 1000). n%5==0 URLs are ALSO listed in the domain's
    dup-sitemap as a CDATA tracking-param variant with a later lastmod
    and priority 0.9 — the canonical merge must keep the max of both.
    Noise per chunk: one ftp:// loc and one loc-less entry; per domain
    one sitemap-index body; plus one non-XML junk body."""
    import pyarrow as pa

    world, _ = _sim_world()
    det = world.pages[world.pages["tier"] == 1]
    rows = []
    for d in sorted(det["domain"].unique()):
        urls = sorted(
            det[det["domain"] == d]["url"], key=lambda u: int(u.rsplit("/", 1)[1])
        )
        files, dup_entries = [], []
        for ci, start in enumerate(range(0, len(urls), 20)):
            ents = []
            for u in urls[start : start + 20]:
                n = int(u.rsplit("/", 1)[1])
                lm = {
                    0: f"<lastmod>2026-08-{10 + n % 18:02d}T{n % 24:02d}:30:00+00:00</lastmod>",
                    1: f"<lastmod>2026-07-{1 + n % 28:02d}</lastmod>",
                    2: "",
                    3: "<lastmod>2026-99-99</lastmod>",
                }[n % 4]
                pr = {0: f"<priority>0.{n % 10}</priority>", 1: "", 2: "<priority>1.5</priority>"}[
                    n % 3
                ]
                ents.append(f"  <url>\n    <loc>{u}</loc>\n    {lm}{pr}\n  </url>")
                if n % 5 == 0:
                    dup_entries.append(
                        f"  <url><loc><![CDATA[{u}?utm_source=x]]></loc>"
                        "<lastmod>2026-08-30</lastmod><priority>0.9</priority></url>"
                    )
            ents.append(f"  <url><loc>ftp://{d}/skip</loc></url>")
            ents.append("  <url><lastmod>2026-01-01</lastmod></url>")
            smurl = f"https://{d}/sitemap-{ci}.xml"
            files.append(smurl)
            rows.append(
                (
                    smurl,
                    '<?xml version="1.0" encoding="UTF-8"?>\n<urlset>\n'
                    + "\n".join(ents)
                    + "\n</urlset>\n",
                )
            )
        if dup_entries:
            smurl = f"https://{d}/sitemap-dup.xml"
            files.append(smurl)
            rows.append((smurl, "<urlset>\n" + "\n".join(dup_entries) + "\n</urlset>\n"))
        rows.append(
            (
                f"https://{d}/sitemap.xml",
                "<sitemapindex>\n"
                + "\n".join(f"  <sitemap><loc>{f}</loc></sitemap>" for f in files)
                + "\n</sitemapindex>\n",
            )
        )
    rows.append(("https://junk.example.com/sitemap.xml", "<html>503 unavailable</html>"))
    schema = pa.schema([("url", pa.string()), ("body", pa.string())])
    return _write(pd.DataFrame(rows, columns=["url", "body"]), "sitemap_bodies.parquet", schema)


def build_frontier_urls() -> str:
    """(url, domain) frontier-URL fixture for the template-mining /
    trap-rationing oracles: the T1 world's page URLs plus three planted
    families —

    - a calendar trap on cal.example.com: 180 ``/cal?y&m&d`` URLs,
      every (y, m, d) combination, a third of them written with the
      params in a DIFFERENT order (sorted-name unification must fold
      them into one template);
    - a session-id path family on d0.example.com: 30
      ``/s/{16-hex}/view`` URLs (hex-run collapse);
    - one benign ``/about`` per domain.

    Spark mines templates with crawl/traps.py; DuckDB re-mines them
    with its own regexp/list SQL — independent parsers, shared input."""
    import hashlib

    import pyarrow as pa

    world, _ = _sim_world()
    pages = world.pages
    rows = list(zip(pages["url"], pages["domain"]))
    for y in (2024, 2025, 2026):
        for m in range(1, 13):
            for d in range(1, 6):
                if (y + m + d) % 3 == 0:
                    u = f"https://cal.example.com/cal?m={m}&d={d}&y={y}"
                else:
                    u = f"https://cal.example.com/cal?y={y}&m={m}&d={d}"
                rows.append((u, "cal.example.com"))
    for i in range(30):
        h = hashlib.md5(f"sess{i}".encode()).hexdigest()[:16]
        rows.append((f"https://d0.example.com/s/{h}/view", "d0.example.com"))
    for d in sorted(set(pages["domain"])):
        rows.append((f"https://{d}/about", d))
    schema = pa.schema([("url", pa.string()), ("domain", pa.string())])
    return _write(
        pd.DataFrame(rows, columns=["url", "domain"]), "frontier_urls.parquet", schema
    )


def build_adaptive_inputs() -> tuple[str, str]:
    """(outcomes_path, budgets_path) for the AIMD politeness oracle.

    Outcomes: one row per T1 tier-1 page (its world status code mapped
    to 'timeout'/'403'/'404'/'ok') plus planted edge domains:
    edge.example.com sits EXACTLY at the 20% distress threshold (2/10 —
    strict >, so clean), dead.example.com is all failures,
    floor.example.com fails at budget 1 (floor holds), cap.example.com
    is clean at the max budget (cap holds). idle.example.com appears
    only in budgets (no signal -> unchanged)."""
    import pyarrow as pa

    world, _ = _sim_world()
    det = world.pages[world.pages["tier"] == 1]
    smap = {-1: "timeout", 403: "403", 404: "404"}
    rows = [
        (u, d, smap.get(int(s), "ok"))
        for u, d, s in zip(det["url"], det["domain"], det["status_code"])
    ]
    for i in range(10):
        rows.append((f"https://edge.example.com/p/{i}", "edge.example.com",
                     "403" if i < 2 else "ok"))
    for i in range(4):
        rows.append((f"https://dead.example.com/p/{i}", "dead.example.com", "timeout"))
        rows.append((f"https://floor.example.com/p/{i}", "floor.example.com", "timeout"))
        rows.append((f"https://cap.example.com/p/{i}", "cap.example.com", "ok"))
    o_schema = pa.schema(
        [("url", pa.string()), ("domain", pa.string()), ("fetch_status", pa.string())]
    )
    p_out = _write(
        pd.DataFrame(rows, columns=["url", "domain", "fetch_status"]),
        "adaptive_outcomes.parquet",
        o_schema,
    )
    budgets = [
        (d, int(b)) for d, b in zip(world.robots["domain"], world.robots["max_per_round"])
    ] + [
        ("edge.example.com", 8),
        ("dead.example.com", 64),
        ("floor.example.com", 1),
        ("cap.example.com", 1 << 20),
        ("idle.example.com", 7),
    ]
    b_schema = pa.schema([("domain", pa.string()), ("max_per_round", pa.int32())])
    p_bud = _write(
        pd.DataFrame(budgets, columns=["domain", "max_per_round"]),
        "adaptive_budgets.parquet",
        b_schema,
    )
    return p_out, p_bud


def build_pages_table() -> str:
    """(url, status_code, body) slice of the T1 world's page store —
    generator ground truth shared by both engines. The CDX oracle
    recomputes SURT urlkey / digest / length relationally in DuckDB
    from these rows; the engine computes them with Spark column
    algebra over the same parquet the crawl driver reads."""
    import pyarrow as pa

    world, _ = _sim_world()
    p = world.pages
    df = pd.DataFrame(
        {
            "url": p["url"].astype(str),
            "status_code": p["status_code"].astype("int64"),
            "body": p["body"],
            "domain": p["domain"].astype(str),
            "latency_ms": p["latency_ms"].astype("int64"),
        }
    )
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("status_code", pa.int32()),
            ("body", pa.string()),
            ("domain", pa.string()),
            ("latency_ms", pa.int32()),
        ]
    )
    return _write(df, "pages_cdx.parquet", schema)


# ---------------------------------------------------------------------------
# robots.txt decision fixture: hostile bodies + URL probes + expected
# longest-match verdicts from an INDEPENDENT mini-evaluator (structured
# as translate-all-rules-to-regexes + max-(spec, allow) selection —
# sharing no code with politeness/robots.py's line-state parser or the
# scheduler's F.aggregate fold)
# ---------------------------------------------------------------------------

_ROBOTS_AGENT = "sparkbot"

_ROBOTS_BODIES: list[tuple[str, str | None]] = [
    (
        "allowpath.test",
        "User-agent: *\nDisallow: /shop\nAllow: /shop/public\nAllow: /\nCrawl-delay: 2\n",
    ),
    (
        "wildallow.test",
        "User-agent: *\nDisallow: /docs\nAllow: /*.html$\nDisallow: /*.cgi\n",
    ),
    ("tie.test", "User-agent: *\nDisallow: /tie\nAllow: /tie\n"),
    (
        "groups.test",
        "User-agent: *\nDisallow: /a\nCrawl-delay: 1\n\n"
        "User-agent: *\nAllow: /a/sub\nCrawl-delay: 3\n\n"
        "User-agent: sparkbot\nDisallow: /only\nAllow: /only/yes\nCrawl-delay: 0.25\n",
    ),
    ("empty.test", None),
    ("junk.test", "random garbage\nDisallow: /pre-group\nCrawl-delay: NaN\n"),
    ("bom.test", "﻿User-agent: *\nDisallow: /private\n"),
    (
        "deep.test",
        "User-agent: *\nAllow: /p\nDisallow: /p/q\nAllow: /p/q/r\nDisallow: /p/q/r/s\n",
    ),
    ("star.test", "User-agent: *\nDisallow: /*.php\nAllow: /cgi/*.php$\n"),
]

_ROBOTS_PROBES: dict[str, list[str]] = {
    "allowpath.test": ["/shop/item", "/shop/public/x", "/other", "/shoppy"],
    "wildallow.test": ["/docs/a.html", "/docs/a.pdf", "/x/y.cgi", "/a.html", "/docs/a.html.bak"],
    "tie.test": ["/tie/x", "/other"],
    "groups.test": ["/only/no", "/only/yes/x", "/a/anything"],
    "empty.test": ["/anything"],
    "junk.test": ["/pre-group/x"],
    "bom.test": ["/private/x", "/public"],
    "deep.test": ["/p/x", "/p/q/x", "/p/q/r/x", "/p/q/r/s/x", "/z"],
    "star.test": ["/cgi/x.php", "/lib/x.php", "/cgi/x.phpX", "/plain"],
}


def _robots_groups(body: str) -> list[tuple[list[str], list[tuple[bool, str]], float]]:
    """Record-split pass, written as a two-phase tokenize-then-group
    (the engine parser is a single-pass line state machine)."""
    import re as _re

    toks = []
    for raw in body.lstrip("﻿").splitlines():
        m = _re.match(r"^\s*([A-Za-z-]+)\s*:\s*([^#]*?)\s*(?:#.*)?$", raw)
        if m:
            toks.append((m.group(1).lower(), m.group(2).strip()))
    groups, i = [], 0
    while i < len(toks):
        if toks[i][0] != "user-agent":
            i += 1
            continue
        agents = []
        while i < len(toks) and toks[i][0] == "user-agent":
            agents.append(toks[i][1].lower())
            i += 1
        rules, delay = [], 0.0
        while i < len(toks) and toks[i][0] != "user-agent":
            k, v = toks[i]
            if k in ("allow", "disallow") and v:
                rules.append((k == "allow", v))
            elif k == "crawl-delay":
                try:
                    d = float(v)
                    if d == d and 0 <= d < float("inf"):
                        delay = max(delay, min(d, 86_400.0))
                except ValueError:
                    pass
            i += 1
        groups.append((agents, rules, delay))
    return groups


def _robots_verdict(body: str | None, agent: str, path: str) -> tuple[int, int]:
    """(blocked, crawl_delay_ms) by translating every selected rule to a
    regex and taking max((spec, allow)) over the matches — tuple order
    makes allow win specificity ties, per RFC 9309 §2.2.2."""
    import re as _re

    if not body:
        return 0, 0
    groups = _robots_groups(body)

    def score(agents):
        best = -1
        for a in agents:
            if a == "*":
                best = max(best, 0)
            elif a and agent.lower().startswith(a):
                best = max(best, len(a))
        return best

    win = max((score(a) for a, _, _ in groups), default=-1)
    if win < 0:
        return 0, 0
    rules: list[tuple[bool, str]] = []
    delay = 0.0
    for agents, rls, d in groups:
        if score(agents) == win:
            rules.extend(rls)
            delay = max(delay, d)
    matches = []
    for allow, pat in rules:
        end = pat.endswith("$")
        core = pat[:-1] if end else pat
        rx = ".*".join(_re.escape(seg) for seg in core.split("*"))
        if _re.match(rx + ("$" if end else ""), path):
            matches.append((len(pat), allow))
    blocked = 0
    if matches and not max(matches)[1]:
        blocked = 1
    return blocked, int(round(delay * 1000))


def build_robots_fixture() -> tuple[str, str, str]:
    """(bodies_path, urls_path, expected_path): shared robots bodies +
    URL probes, and the independent evaluator's expected verdicts
    (blocked as INT per the nullable-boolean roundtrip rule)."""
    import pyarrow as pa

    bodies = pd.DataFrame(_ROBOTS_BODIES, columns=["domain", "body"])
    urls, expected = [], []
    for dom, body in _ROBOTS_BODIES:
        for p in _ROBOTS_PROBES[dom]:
            url = f"https://{dom}{p}"
            urls.append((url, dom))
            blocked, delay_ms = _robots_verdict(body, _ROBOTS_AGENT, p)
            expected.append((dom, url, blocked, delay_ms))
    p_bodies = _write(
        bodies,
        "robots_bodies.parquet",
        pa.schema([("domain", pa.string()), ("body", pa.string())]),
    )
    p_urls = _write(
        pd.DataFrame(urls, columns=["url", "domain"]),
        "robots_urls.parquet",
        pa.schema([("url", pa.string()), ("domain", pa.string())]),
    )
    p_exp = _write(
        pd.DataFrame(expected, columns=["domain", "url", "blocked", "crawl_delay_ms"]),
        "robots_expected.parquet",
        pa.schema(
            [
                ("domain", pa.string()),
                ("url", pa.string()),
                ("blocked", pa.int32()),
                ("crawl_delay_ms", pa.int64()),
            ]
        ),
    )
    return p_bodies, p_urls, p_exp


def build_bpe_merges(sf_dir: str = CORRECTNESS_SF, n_merges: int = 20, min_pair_count: int = 2) -> str:
    """Independent pure-Python BPE trainer (Sennrich et al. 2016 word-
    histogram algorithm; dict-based, no Spark): the engine's
    functions/bpe.bpe_train must learn the identical merge table —
    same argmax with (count desc, left asc, right asc) tie-break, same
    left-to-right non-overlapping rewrite."""
    import pyarrow as pa
    from collections import Counter

    docs = _documents(sf_dir)
    hist: Counter = Counter()
    for t in docs["text"]:
        if t is None or not str(t).strip():
            continue
        hist.update(str(t).split())
    pieces = {w: tuple(w) for w in hist}
    rows = []
    for rank in range(n_merges):
        pair_counts: Counter = Counter()
        for w, ps in pieces.items():
            c = hist[w]
            for i in range(len(ps) - 1):
                pair_counts[(ps[i], ps[i + 1])] += c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        if cnt < min_pair_count:
            break
        rows.append({"rank": rank, "left": left, "right": right, "pair_count": cnt})
        merged = left + right
        new_pieces = {}
        for w, ps in pieces.items():
            if len(ps) < 2:
                new_pieces[w] = ps
                continue
            out, i = [], 0
            while i < len(ps):
                if i + 1 < len(ps) and ps[i] == left and ps[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(ps[i])
                    i += 1
            new_pieces[w] = tuple(out)
        pieces = new_pieces
    schema = pa.schema(
        [("rank", pa.int64()), ("left", pa.string()), ("right", pa.string()), ("pair_count", pa.int64())]
    )
    return _write(pd.DataFrame(rows, columns=["rank", "left", "right", "pair_count"]), "bpe_merges.parquet", schema)


def _py_wordpiece_train(docs, n_merges: int, min_pair_count: int = 2):
    """Independent pure-Python WordPiece trainer (Schuster & Nakajima
    '12 likelihood-scored merges, dict-based, no Spark): score_femto =
    pair_count * 10^15 // (count(l) * count(r)) in exact Python ints,
    argmax tie-break (score desc, count desc, left, right). Returns
    (merge_rows, word_hist). The engine's functions/wordpiece.
    wordpiece_train must learn the identical table."""
    from collections import Counter

    hist: Counter = Counter()
    for t in docs["text"]:
        if t is None or not str(t).strip():
            continue
        hist.update(str(t).split())
    pieces = {w: tuple([w[0]] + ["##" + c for c in w[1:]]) for w in hist}
    rows = []
    for rank in range(n_merges):
        pair_counts: Counter = Counter()
        piece_counts: Counter = Counter()
        for w, ps in pieces.items():
            c = hist[w]
            for p in ps:
                piece_counts[p] += c
            for i in range(len(ps) - 1):
                pair_counts[(ps[i], ps[i + 1])] += c
        if not pair_counts:
            break
        # floor filters the candidate set BEFORE the argmax (rare pairs
        # score highest under likelihood; a winner-side check would
        # halt on a count-1 pair) — mirrors wordpiece_train exactly.
        scored = [
            (cnt * 10**15 // (piece_counts[l] * piece_counts[r]), cnt, l, r)
            for (l, r), cnt in pair_counts.items()
            if cnt >= min_pair_count
        ]
        if not scored:
            break
        sc, cnt, left, right = min(scored, key=lambda x: (-x[0], -x[1], x[2], x[3]))
        rows.append(
            {"rank": rank, "left": left, "right": right, "pair_count": cnt,
             "score_femto": sc}
        )
        merged = left + (right[2:] if right.startswith("##") else right)
        new_pieces = {}
        for w, ps in pieces.items():
            if len(ps) < 2:
                new_pieces[w] = ps
                continue
            out, i = [], 0
            while i < len(ps):
                if i + 1 < len(ps) and ps[i] == left and ps[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(ps[i])
                    i += 1
            new_pieces[w] = tuple(out)
        pieces = new_pieces
    return rows, hist


def build_wordpiece_merges(
    sf_dir: str = CORRECTNESS_SF, n_merges: int = 15, min_pair_count: int = 2
) -> str:
    """WordPiece merge-table fixture from the independent trainer."""
    import pyarrow as pa

    rows, _ = _py_wordpiece_train(_documents(sf_dir), n_merges, min_pair_count)
    schema = pa.schema(
        [
            ("rank", pa.int64()),
            ("left", pa.string()),
            ("right", pa.string()),
            ("pair_count", pa.int64()),
            ("score_femto", pa.int64()),
        ]
    )
    return _write(
        pd.DataFrame(rows, columns=["rank", "left", "right", "pair_count", "score_femto"]),
        "wordpiece_merges.parquet",
        schema,
    )


def build_wordpiece_segments(sf_dir: str = CORRECTNESS_SF, n_merges: int = 10) -> str:
    """Independent WordPiece SEGMENTATION fixture: train n_merges with
    the independent trainer, build the final vocab (corpus alphabet in
    first/## forms + merged pieces), then BERT greedy longest-match-
    first per word (whole-word [UNK] on any miss); emit
    (id, n_wp_tokens, toks_fp)."""
    import hashlib
    import pyarrow as pa

    docs = _documents(sf_dir)
    rows_m, hist = _py_wordpiece_train(docs, n_merges)
    vocab = set()
    for w in hist:
        vocab.add(w[0])
        vocab.update("##" + c for c in w[1:])
    for r in rows_m:
        vocab.add(
            r["left"]
            + (r["right"][2:] if r["right"].startswith("##") else r["right"])
        )

    def seg_word(word: str) -> list[str]:
        out: list[str] = []
        i, first = 0, True
        while i < len(word):
            for j in range(len(word), i, -1):
                cand = word[i:j] if first else "##" + word[i:j]
                if cand in vocab:
                    out.append(cand)
                    i = j
                    first = False
                    break
            else:
                return ["[UNK]"]
        return out

    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        toks: list[str] = []
        if t is not None and str(t).strip():
            for w in str(t).split():
                toks.extend(seg_word(w))
        rows.append(
            {
                "id": int(did),
                "n_wp_tokens": len(toks),
                "toks_fp": hashlib.md5("\x1f".join(toks).encode()).hexdigest(),
            }
        )
    schema = pa.schema(
        [("id", pa.int64()), ("n_wp_tokens", pa.int64()), ("toks_fp", pa.string())]
    )
    return _write(
        pd.DataFrame(rows, columns=["id", "n_wp_tokens", "toks_fp"]),
        "wordpiece_segments.parquet",
        schema,
    )


def build_bpe_segments(sf_dir: str = CORRECTNESS_SF, n_merges: int = 10) -> str:
    """Independent pure-Python BPE SEGMENTATION: train n_merges merges
    (same independent trainer as build_bpe_merges) and tokenize every
    doc with them; emit (id, n_bpe_tokens, toks_fp=md5 of the
    US-joined token list). The engine must reproduce both train AND
    apply dynamics to hash-match."""
    import hashlib
    import pyarrow as pa
    from collections import Counter

    docs = _documents(sf_dir)
    hist: Counter = Counter()
    for t in docs["text"]:
        if t is None or not str(t).strip():
            continue
        hist.update(str(t).split())
    pieces = {w: tuple(w) for w in hist}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, ps in pieces.items():
            c = hist[w]
            for i in range(len(ps) - 1):
                pair_counts[(ps[i], ps[i + 1])] += c
        if not pair_counts:
            break
        (left, right), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((left, right))
        merged = left + right
        new_pieces = {}
        for w, ps in pieces.items():
            out, i = [], 0
            while i < len(ps):
                if i + 1 < len(ps) and ps[i] == left and ps[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(ps[i])
                    i += 1
            new_pieces[w] = tuple(out)
        pieces = new_pieces

    def seg_word(w: str) -> list[str]:
        ps = list(w)
        for left, right in merges:
            if len(ps) < 2:
                break
            out, i = [], 0
            while i < len(ps):
                if i + 1 < len(ps) and ps[i] == left and ps[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(ps[i])
                    i += 1
            ps = out
        return ps

    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        toks: list[str] = []
        if t is not None and str(t).strip():
            for w in str(t).split():
                toks.extend(seg_word(w))
        rows.append(
            {
                "id": int(did),
                "n_bpe_tokens": len(toks),
                "toks_fp": hashlib.md5("\x1f".join(toks).encode()).hexdigest(),
            }
        )
    schema = pa.schema(
        [("id", pa.int64()), ("n_bpe_tokens", pa.int64()), ("toks_fp", pa.string())]
    )
    return _write(pd.DataFrame(rows), "bpe_segments.parquet", schema)


def build_incremental_image_inputs() -> str:
    """(image_id, fp, phash, is_new) table for the incremental image
    dedup oracle: corpus = the T1 payload images as-is; new batch = per
    corpus image an exact byte copy (``~x``), a <=2-bit phash
    near-duplicate with distinct bytes (``~v``, same xxhash64-pinned
    flips as build_image_dedup_inputs), and a far variant (``~n`` —
    bytes + b'nn', phash XOR 0xFFFF = Hamming 16 from its source).
    ``fp`` is the pure-Python md5 of the variant's bytes."""
    import hashlib

    import pyarrow as pa

    world, _ = _sim_world()
    rows = []
    for image_id, data, ph in zip(
        world.image_caption["image_id"],
        world.image_caption["bytes"],
        world.image_caption["phash"],
    ):
        ph = int(ph)
        data = bytes(data)
        rows.append((image_id, hashlib.md5(data).hexdigest(), ph, False))
        rows.append((image_id + "~x", hashlib.md5(data).hexdigest(), ph, True))
        b1 = xxhash64_str(image_id) % 64
        b2 = xxhash64_str(image_id + "b") % 64
        rows.append(
            (
                image_id + "~v",
                hashlib.md5(data + b"v").hexdigest(),
                _signed64((ph & _MASK64) ^ (1 << b1) ^ (1 << b2)),
                True,
            )
        )
        rows.append(
            (
                image_id + "~n",
                hashlib.md5(data + b"nn").hexdigest(),
                _signed64((ph & _MASK64) ^ 0xFFFF),
                True,
            )
        )
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("fp", pa.string()),
            ("phash", pa.int64()),
            ("is_new", pa.bool_()),
        ]
    )
    return _write(
        pd.DataFrame(rows, columns=["image_id", "fp", "phash", "is_new"]),
        "incremental_image_inputs.parquet",
        schema,
    )


def build_cdc_chunks(min_size: int = 64, avg_size: int = 512, max_size: int = 2048) -> str:
    """Per-chunk ground truth for the content-defined-chunking oracles
    (dedup/cdc.py): the TEXTBOOK reset-style Gear loop — ``h = (h << 1
    + GEAR[b]) mod 2^64`` per byte, ``h = 0`` at each chunk start, cut
    when the top ``log2(avg_size)`` bits are zero and the chunk has
    reached ``min_size``, forced cut at ``max_size``, short tail kept —
    over the T1 world's image payloads.  The engine kernel computes the
    same cuts from a vectorized SLIDING-WINDOW hash (equal to this loop
    whenever ``min_size >= 64`` — dedup/cdc.py module docstring);
    agreeing chunk tables pin that equivalence.  splitmix64 is
    re-implemented here so no table-construction code is shared."""
    import pyarrow as pa

    m64 = (1 << 64) - 1

    def smix(x: int) -> int:
        z = (x + 0x9E3779B97F4A7C15) & m64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & m64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & m64
        return z ^ (z >> 31)

    gear = [smix(b) for b in range(256)]
    bits = avg_size.bit_length() - 1
    mask = ((1 << bits) - 1) << (64 - bits)

    world, _ = _sim_world()
    ic = world.image_caption
    rows = []
    for image_id, data in zip(ic["image_id"], ic["bytes"]):
        b = bytes(data)
        if not b:
            continue
        h = 0
        start = 0
        idx = 0
        spans = []
        for i, byte in enumerate(b):
            h = ((h << 1) + gear[byte]) & m64
            ln = i - start + 1
            if (ln >= min_size and (h & mask) == 0) or ln == max_size:
                spans.append((start, ln))
                start = i + 1
                h = 0
        if start < len(b):
            spans.append((start, len(b) - start))
        for idx, (off, ln) in enumerate(spans):
            rows.append(
                {
                    "image_id": image_id,
                    "chunk_idx": idx,
                    "offset": off,
                    "length": ln,
                    "chunk_md5": hashlib.md5(b[off : off + ln]).hexdigest(),
                }
            )
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("chunk_idx", pa.int32()),
            ("offset", pa.int64()),
            ("length", pa.int64()),
            ("chunk_md5", pa.string()),
        ]
    )
    return _write(pd.DataFrame(rows), "cdc_chunks.parquet", schema)


def _unigram_core(
    sf_dir: str, vocab_size: int, n_iters: int, max_piece_len: int, min_count: int
):
    """Independent pure-Python unigram-LM trainer (Kudo '18 spec as
    pinned in functions/unigram.py's docstring — reimplemented here
    with dicts, no Spark/engine imports): word histogram -> positional
    substring counts -> micro-nat scores -> EM rounds of Viterbi
    segmentation + recount -> char-preserving frequency prune."""
    import math
    from collections import Counter

    UNK = -20_000_000

    docs = _documents(sf_dir)
    hist: Counter = Counter()
    for t in docs["text"]:
        if t is None or not str(t).strip():
            continue
        hist.update(str(t).split())

    def rescore(counts: dict) -> dict:
        total = sum(counts.values())
        return {
            p: math.floor(math.log(c / total) * 1_000_000)
            for p, c in counts.items()
            if c > 0
        }

    def viterbi(word: str, scores: dict) -> tuple:
        n = len(word)
        best = [None] * (n + 1)
        best[0] = (0, 0, ())
        for i in range(1, n + 1):
            for j in range(max(0, i - max_piece_len), i):
                prev = best[j]
                if prev is None:
                    continue
                piece = word[j:i]
                s = scores.get(piece)
                if s is None:
                    if len(piece) > 1:
                        continue
                    s = UNK
                cand = (prev[0] + s, prev[1] - 1, prev[2] + (piece,))
                cur = best[i]
                if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]) or (
                    (cand[0], cand[1]) == (cur[0], cur[1]) and cand[2] < cur[2]
                ):
                    best[i] = cand
        return best[n][2]

    counts: Counter = Counter()
    for w, c in hist.items():
        for s in range(len(w)):
            for L in range(1, min(max_piece_len, len(w) - s) + 1):
                counts[w[s : s + L]] += c
    counts = {
        p: c for p, c in counts.items() if len(p) == 1 or c >= min_count
    }
    scores = rescore(counts)
    chars = {p for p in counts if len(p) == 1}

    for _ in range(n_iters):
        seg_cache: dict = {}
        new_counts: Counter = Counter()
        for w, c in hist.items():
            toks = seg_cache.get(w)
            if toks is None:
                toks = viterbi(w, scores)
                seg_cache[w] = toks
            for t in toks:
                new_counts[t] += c
        for ch in chars:
            new_counts.setdefault(ch, 1)
        counts = dict(new_counts)
        scores = rescore(counts)

    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    n_multi = max(0, vocab_size - len(chars))
    final = {p: counts.get(p, 1) for p in chars}
    final.update(dict(multi[:n_multi]))
    fscores = rescore(final)
    return hist, final, fscores, viterbi


def build_unigram_vocab(
    sf_dir: str = CORRECTNESS_SF,
    vocab_size: int = 120,
    n_iters: int = 2,
    max_piece_len: int = 3,
    min_count: int = 2,
) -> str:
    import pyarrow as pa

    _, final, fscores, _ = _unigram_core(
        sf_dir, vocab_size, n_iters, max_piece_len, min_count
    )
    rows = sorted((p, final[p], fscores[p]) for p in final)
    df = pd.DataFrame(rows, columns=["piece", "count", "score"])
    schema = pa.schema(
        [("piece", pa.string()), ("count", pa.int64()), ("score", pa.int64())]
    )
    return _write(df, "unigram_vocab.parquet", schema)


def build_unigram_segments(
    sf_dir: str = CORRECTNESS_SF,
    vocab_size: int = 120,
    n_iters: int = 2,
    max_piece_len: int = 3,
    min_count: int = 2,
) -> str:
    """(doc_id, n_tokens, toks_fp): Viterbi-tokenize every doc with
    the trained vocab; fp = md5 of the unit-separator-joined tokens
    (the engine must reproduce train AND apply to hash-match)."""
    import hashlib

    import pyarrow as pa

    _, _, fscores, viterbi = _unigram_core(
        sf_dir, vocab_size, n_iters, max_piece_len, min_count
    )
    docs = _documents(sf_dir)
    rows = []
    cache: dict = {}
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        toks: list = []
        if t is not None and str(t).strip():
            for w in str(t).split():
                got = cache.get(w)
                if got is None:
                    got = viterbi(w, fscores)
                    cache[w] = got
                toks.extend(got)
        fp = hashlib.md5("\x1f".join(toks).encode("utf-8")).hexdigest()
        rows.append({"doc_id": int(doc_id), "n_tokens": len(toks), "toks_fp": fp})
    df = pd.DataFrame(rows)
    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("toks_fp", pa.string())]
    )
    return _write(df, "unigram_segments.parquet", schema)


def build_compression_ratios(sf_dir: str = CORRECTNESS_SF) -> str:
    """Independent per-doc deflate ratios (same zlib build as the
    engine kernel — the documented determinism contract)."""
    import zlib

    import pyarrow as pa

    docs = _documents(sf_dir)
    rows = []
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        b = ("" if t is None else str(t)).encode("utf-8")
        n = len(b)
        z = len(zlib.compress(b, 6)) if n else 0
        rows.append(
            {
                "id": int(doc_id),
                "raw_len": n,
                "zlib_len": z,
                "ratio_milli": z * 1000 // n if n else 1000,
            }
        )
    df = pd.DataFrame(rows)
    schema = pa.schema(
        [
            ("id", pa.int64()),
            ("raw_len", pa.int64()),
            ("zlib_len", pa.int64()),
            ("ratio_milli", pa.int64()),
        ]
    )
    return _write(df, "compression_ratios.parquet", schema)


def build_channel_stats_expected() -> str:
    """Expected per-format per-channel stats from the generator's
    ground-truth source pixels (+ the documented jpeg surrogate
    quantization) — the codec decode path never runs here. Same
    int64-sum/floor-milli arithmetic the engine op promises."""
    import pyarrow as pa

    from ..synth.world import _rng_for, _source_pixels

    world, _ = _sim_world()
    spec = world.spec
    acc: dict = {}
    for image_id, fmt in zip(world.image_caption["image_id"], world.image_caption["fmt"]):
        pixels, fmt2 = _source_pixels(_rng_for(spec.seed, "img", image_id), spec)
        assert fmt2 == fmt
        if fmt == "jpeg":
            pixels = np.minimum((pixels.astype(np.int32) // 6) * 6 + 3, 255).astype(np.uint8)
        n = pixels.shape[0] * pixels.shape[1]
        s = pixels.reshape(-1, pixels.shape[2]).sum(axis=0, dtype=np.int64)
        a = acc.setdefault(fmt, [0, 0, 0, 0, 0, 0])  # n, n_ok, px, s0, s1, s2
        a[0] += 1
        a[1] += 1
        a[2] += n
        a[3] += int(s[0])
        a[4] += int(s[1])
        a[5] += int(s[2])
    rows = [
        {
            "fmt": fmt,
            "n": a[0],
            "n_ok": a[1],
            "total_px": a[2],
            "ch0_mean_milli": a[3] * 1000 // a[2],
            "ch1_mean_milli": a[4] * 1000 // a[2],
            "ch2_mean_milli": a[5] * 1000 // a[2],
        }
        for fmt, a in sorted(acc.items())
    ]
    df = pd.DataFrame(rows)
    schema = pa.schema(
        [
            ("fmt", pa.string()),
            ("n", pa.int64()),
            ("n_ok", pa.int64()),
            ("total_px", pa.int64()),
            ("ch0_mean_milli", pa.int64()),
            ("ch1_mean_milli", pa.int64()),
            ("ch2_mean_milli", pa.int64()),
        ]
    )
    return _write(df, "channel_stats.parquet", schema)


def build_patch_stats_expected(grid: int = 4) -> str:
    """Expected ViT patch-grid stats from the generator's ground-truth
    source pixels (+ jpeg surrogate quantization) — the codec decode
    path never runs here. Same integer lattice ``r_i = i*h div g`` and
    int64-sum/floor-milli arithmetic imaging/quality.image_patch_stats
    promises."""
    import pyarrow as pa

    from ..synth.world import _rng_for, _source_pixels

    world, _ = _sim_world()
    spec = world.spec
    g = int(grid)
    rows = []
    for image_id, fmt in zip(world.image_caption["image_id"], world.image_caption["fmt"]):
        pixels, fmt2 = _source_pixels(_rng_for(spec.seed, "img", image_id), spec)
        assert fmt2 == fmt
        if fmt == "jpeg":
            pixels = np.minimum((pixels.astype(np.int32) // 6) * 6 + 3, 255).astype(np.uint8)
        h, w = pixels.shape[0], pixels.shape[1]
        for i in range(g):
            r0, r1 = (i * h) // g, ((i + 1) * h) // g
            for j in range(g):
                c0, c1 = (j * w) // g, ((j + 1) * w) // g
                patch = pixels[r0:r1, c0:c1]
                n = int(patch.shape[0] * patch.shape[1])
                if n == 0:
                    rows.append((image_id, i, j, 0, 0, 0, 0, None, None, None))
                    continue
                s = patch.reshape(-1, patch.shape[2]).sum(axis=0, dtype=np.int64)
                rows.append(
                    (
                        image_id, i, j, n,
                        int(s[0]), int(s[1]), int(s[2]),
                        int(s[0]) * 1000 // n, int(s[1]) * 1000 // n, int(s[2]) * 1000 // n,
                    )
                )
    cols = [
        "image_id", "patch_row", "patch_col", "n_px", "s0", "s1", "s2",
        "mean0_milli", "mean1_milli", "mean2_milli",
    ]
    df = pd.DataFrame(rows, columns=cols).sort_values(
        ["image_id", "patch_row", "patch_col"]
    )
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("patch_row", pa.int32()),
            ("patch_col", pa.int32()),
            ("n_px", pa.int64()),
            ("s0", pa.int64()),
            ("s1", pa.int64()),
            ("s2", pa.int64()),
            ("mean0_milli", pa.int64()),
            ("mean1_milli", pa.int64()),
            ("mean2_milli", pa.int64()),
        ]
    )
    return _write(df, "patch_stats.parquet", schema)


def build_border_stats_expected() -> str:
    """Expected letterbox-detection rows for the planted-border world:
    per image, pad the generator's ground-truth pixels (+ jpeg
    surrogate) with xxhash64-derived widths of color (8,8,8), then
    count uniform edge runs with an INDEPENDENT vectorized scan (the
    engine kernel scans row-by-row; this uses argmax over whole-row
    equality masks) — same contract, different code path."""
    import pyarrow as pa

    from ..synth.world import _rng_for, _source_pixels

    def borders(px: np.ndarray) -> tuple:
        h, w = int(px.shape[0]), int(px.shape[1])
        row_eq = lambda c: (px == c).all(axis=(1, 2))
        col_eq = lambda c: (px == c).all(axis=(0, 2))

        def lead(mask):
            return int(len(mask)) if mask.all() else int(np.argmax(~mask))

        top = lead(row_eq(px[0, 0]))
        bottom = lead(row_eq(px[h - 1, 0])[::-1])
        left = lead(col_eq(px[0, 0]))
        right = lead(col_eq(px[0, w - 1])[::-1])
        boxed = int((top > 0 and bottom > 0) or (left > 0 and right > 0))
        content = max(0, h - top - bottom) * max(0, w - left - right)
        return (h, w, top, bottom, left, right, boxed, content)

    world, _ = _sim_world()
    spec = world.spec
    rows = []
    for image_id, fmt in zip(world.image_caption["image_id"], world.image_caption["fmt"]):
        pixels, fmt2 = _source_pixels(_rng_for(spec.seed, "img", image_id), spec)
        assert fmt2 == fmt
        if fmt == "jpeg":
            pixels = np.minimum((pixels.astype(np.int32) // 6) * 6 + 3, 255).astype(np.uint8)
        t = xxhash64_str(image_id + "~bt") % 4
        b = xxhash64_str(image_id + "~bb") % 4
        lft = xxhash64_str(image_id + "~bl") % 4
        r = xxhash64_str(image_id + "~br") % 4
        h0, w0, ch = pixels.shape
        padded = np.empty((h0 + t + b, w0 + lft + r, ch), dtype=np.uint8)
        padded[:, :] = np.asarray((8, 8, 8), dtype=np.uint8)[:ch]
        padded[t:t + h0, lft:lft + w0] = pixels
        rows.append((image_id, 1) + borders(padded))
    cols = [
        "image_id", "ok", "h", "w", "top", "bottom", "left", "right",
        "letterboxed", "content_px",
    ]
    df = pd.DataFrame(rows, columns=cols).sort_values("image_id")
    schema = pa.schema(
        [("image_id", pa.string())]
        + [(c, pa.int32()) for c in cols[1:-1]]
        + [("content_px", pa.int64())]
    )
    return _write(df, "border_stats.parquet", schema)


def build_ct_expected(sf_dir: str = CORRECTNESS_SF, n: int = 3, top_k: int = 100) -> str:
    """Independent Cavnar-Trenkle twin (classify.ct_train/ct_classify):
    profiles self-trained on the documents' lang column, every doc
    classified by out-of-place distance — pure-Python Counters, same
    normalization (SQL trim = spaces only; ASCII \\s; rank ties by
    gram asc) and the same (distance, label) argmin."""
    import re
    from collections import Counter

    import pyarrow as pa

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def grams_of(t):
        norm = re.sub(r"\s+", "_", (t or "").strip(" ").lower(), flags=re.ASCII)
        return [norm[i : i + n] for i in range(len(norm) - n + 1)]

    prof_counts: dict = {}
    for lang, t in zip(docs["lang"], docs["text"]):
        prof_counts.setdefault(lang, Counter()).update(grams_of(t))
    profiles = {}
    for lang, c in prof_counts.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        profiles[lang] = {g: i + 1 for i, (g, _) in enumerate(ranked)}
    labels = sorted(profiles)
    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        c = Counter(grams_of(t))
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        dr = {g: i + 1 for i, (g, _) in enumerate(ranked)}
        best = None
        for lab in labels:
            p = profiles[lab]
            dist = sum(abs(r - p[g]) if g in p else top_k for g, r in dr.items())
            if best is None or (dist, lab) < best:
                best = (dist, lab)
        rows.append({"doc_id": int(did), "label": best[1], "distance": best[0]})
    schema = pa.schema(
        [("doc_id", pa.int64()), ("label", pa.string()), ("distance", pa.int64())]
    )
    return _write(
        pd.DataFrame(rows, columns=["doc_id", "label", "distance"]),
        "ct_expected.parquet",
        schema,
    )


def build_hll_overlap_expected(sf_dir: str = CORRECTNESS_SF) -> str:
    """Independent HLL-merge overlap twin (sketches.hll_overlap):
    corpus A = documents with doc_id % 3 != 0, corpus B = doc_id % 2
    != 0 (overlapping by construction), value = text. Registers via
    pure-Python xxhash64_str; union = register-wise max; estimates in
    the identical staged int64 arithmetic; intersection by clamped
    inclusion-exclusion; jaccard in integer milli."""
    import pyarrow as pa

    from ..functions.hashing import xxhash64_str

    docs = _documents(sf_dir)
    p, alpha_micro = 10, 720_541
    m, w = 1 << p, 64 - p

    def regs_of(rows):
        M: dict = {}
        for t in rows:
            if t is None:
                continue
            hu = xxhash64_str(str(t)) & ((1 << 64) - 1)
            b, suf = hu >> w, hu & ((1 << w) - 1)
            r = w + 1 - suf.bit_length()
            if r > M.get(b, 0):
                M[b] = r
        return M

    a_rows = [t for d, t in zip(docs["doc_id"], docs["text"]) if int(d) % 3 != 0]
    b_rows = [t for d, t in zip(docs["doc_id"], docs["text"]) if int(d) % 2 != 0]
    Ma, Mb = regs_of(a_rows), regs_of(b_rows)
    Mu = dict(Ma)
    for b, r in Mb.items():
        if r > Mu.get(b, 0):
            Mu[b] = r

    def est(M):
        S = sum((1 << 50) >> r for r in M.values()) + (m - len(M)) * (1 << 50)
        q = min((m * m << 30) // max(S >> 20, 1), 1 << 42)
        return (q * alpha_micro) // 1000

    ea, eb, eu = est(Ma), est(Mb), est(Mu)
    ei = max(ea + eb - eu, 0)
    jac = (ei * 1000) // max(eu, 1)
    schema = pa.schema(
        [
            ("est_a_milli", pa.int64()),
            ("est_b_milli", pa.int64()),
            ("est_union_milli", pa.int64()),
            ("est_inter_milli", pa.int64()),
            ("jaccard_milli", pa.int64()),
        ]
    )
    return _write(
        pd.DataFrame(
            [
                {
                    "est_a_milli": ea,
                    "est_b_milli": eb,
                    "est_union_milli": eu,
                    "est_inter_milli": ei,
                    "jaccard_milli": jac,
                }
            ]
        ),
        "hll_overlap_expected.parquet",
        schema,
    )


def build_hll_expected(sf_dir: str = CORRECTNESS_SF) -> str:
    """Independent HyperLogLog twin (functions/sketches.py contract):
    xxhash64(l_orderkey) registers per l_returnflag, raw-HLL estimate
    in the exact staged int64 arithmetic the engine promises (unit
    shift 50, >>20 / <<30 staging, 1<<42 clamp, alpha_micro 720541)."""
    import pyarrow as pa

    from ..functions.hashing import xxhash64_long

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_orderkey"]
    )
    p, alpha_micro = 10, 720_541
    m, w = 1 << p, 64 - p
    regs: dict = {}
    exact: dict = {}
    for flag, okey in zip(li["l_returnflag"], li["l_orderkey"]):
        if okey is None:
            continue
        exact.setdefault(flag, set()).add(int(okey))
        hu = xxhash64_long(int(okey)) & ((1 << 64) - 1)
        b, suf = hu >> w, hu & ((1 << w) - 1)
        M = regs.setdefault(flag, {})
        r = w + 1 - suf.bit_length()
        if r > M.get(b, 0):
            M[b] = r
    rows = []
    for flag in sorted(regs):
        M = regs[flag]
        nz = len(M)
        S = sum((1 << 50) >> r for r in M.values()) + (m - nz) * (1 << 50)
        q = min((m * m << 30) // max(S >> 20, 1), 1 << 42)
        est = (q * alpha_micro) // 1000
        ex = len(exact[flag])
        rows.append(
            {
                "l_returnflag": flag,
                "n_nonzero_registers": nz,
                "n_zero_registers": m - nz,
                "sum_units": S,
                "est_milli": est,
                "exact_distinct": ex,
                "rel_err_milli": abs(est - ex * 1000) // max(ex, 1),
            }
        )
    schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("n_nonzero_registers", pa.int32()),
            ("n_zero_registers", pa.int32()),
            ("sum_units", pa.int64()),
            ("est_milli", pa.int64()),
            ("exact_distinct", pa.int64()),
            ("rel_err_milli", pa.int64()),
        ]
    )
    return _write(pd.DataFrame(rows), "hll_expected.parquet", schema)


def build_cms_expected(sf_dir: str = CORRECTNESS_SF, d: int = 4, w: int = 1024, k: int = 40) -> str:
    """Independent Count-Min twin: exact token histogram (tokens_col
    whitespace convention), d x w grid via xxhash64('cms{r}:{tok}') %
    w, estimate = min over rows; probes = exact top-k (cnt desc,
    token asc)."""
    import re as _re

    import pyarrow as pa

    docs = _documents(sf_dir)
    cnt: dict = {}
    for t in docs["text"]:
        if t is None or str(t).strip() == "":
            continue
        for tok in _re.split(r"\s+", str(t).strip()):
            if tok:
                cnt[tok] = cnt.get(tok, 0) + 1
    cells: dict = {}
    for tok, c in cnt.items():
        for r in range(d):
            key = (r, xxhash64_str(f"cms{r}:{tok}") % w)
            cells[key] = cells.get(key, 0) + c
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    rows = []
    for tok, c in top:
        est = min(cells[(r, xxhash64_str(f"cms{r}:{tok}") % w)] for r in range(d))
        rows.append(
            {"token": tok, "exact_cnt": c, "cms_est": est, "overcount": est - c}
        )
    schema = pa.schema(
        [
            ("token", pa.string()),
            ("exact_cnt", pa.int64()),
            ("cms_est", pa.int64()),
            ("overcount", pa.int64()),
        ]
    )
    return _write(pd.DataFrame(rows), "cms_expected.parquet", schema)
