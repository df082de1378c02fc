"""Round-3 operators: WebDataset tar shard sink/source (imaging/wds),
CDX capture index (crawl/cdx), temperature re-sampling
(functions/sampling), paired CLIP-style alignment (functions/
similarity.paired_alignment)."""

import hashlib
import io
import tarfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl import cdx_index, surt_key
from scrapy_products_tracker_spark.functions import temperature_sample
from scrapy_products_tracker_spark.functions.similarity import paired_alignment
from scrapy_products_tracker_spark.imaging import read_wds_shards, write_wds_shards


@pytest.fixture(scope="module")
def ic(spark, t1_paths):
    return spark.read.parquet(t1_paths["image_caption"]).withColumn(
        "rng", F.substring("image_id", 1, 5)
    )


def test_wds_roundtrip_exact(spark, ic):
    """write -> read returns every sample byte-exactly (payload AND
    caption), once, with the pack_shards assignment."""
    src = {
        r["image_id"]: (bytes(r["bytes"]), r["caption"])
        for r in ic.select("image_id", "bytes", "caption").collect()
    }
    back = read_wds_shards(write_wds_shards(ic, 16384, range_col="rng")).collect()
    assert len(back) == len(src)
    for r in back:
        payload, caption = src[r["image_id"]]
        assert bytes(r["payload"]) == payload
        assert r["caption"] == caption


def test_wds_deterministic_and_valid_tar(spark, ic):
    """Shard bytes are a pure function of the rows: identical across
    partitionings; archives parse with stock tarfile and members are
    in id order with zeroed stat fields."""
    a = {r["shard_id"]: bytes(r["tar_bytes"])
         for r in write_wds_shards(ic, 16384, range_col="rng").collect()}
    b = {r["shard_id"]: bytes(r["tar_bytes"])
         for r in write_wds_shards(ic.repartition(7), 16384, range_col="rng").collect()}
    assert a == b and len(a) > 1
    for blob in a.values():
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            members = tf.getmembers()
            stems = [m.name.rpartition(".")[0] for m in members if m.name.endswith(".img")]
            assert stems == sorted(stems)
            assert all(m.mtime == 0 and m.uid == 0 and m.uname == "" for m in members)


def test_wds_null_caption_roundtrip(spark):
    rows = [("a1", b"\x00\x01", None), ("a2", b"", "hi there")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, caption string")
    back = {r["image_id"]: r for r in read_wds_shards(write_wds_shards(df, 1 << 20)).collect()}
    assert back["a1"]["caption"] is None
    assert bytes(back["a1"]["payload"]) == b"\x00\x01"
    assert back["a2"]["caption"] == "hi there"
    assert bytes(back["a2"]["payload"]) == b""


def test_cdx_surt_and_digest(spark):
    rows = [
        ("https://shop.example.com/p/1?x=2&y=3", 200, "<html>one</html>"),
        ("https://example.com/", 200, None),
        ("https://a.b.c.example.org/deep/path", 404, ""),
    ]
    df = spark.createDataFrame(rows, "url string, status_code int, body string")
    out = {r["url"]: r for r in cdx_index(df).collect()}
    r = out["https://shop.example.com/p/1?x=2&y=3"]
    assert r["urlkey"] == "com,example,shop)/p/1?x=2&y=3"
    assert r["digest"] == hashlib.md5(b"<html>one</html>").hexdigest()
    assert r["length"] == 16 and r["status"] == 200
    r = out["https://example.com/"]
    assert r["urlkey"] == "com,example)/"
    assert r["digest"] is None and r["length"] == 0
    r = out["https://a.b.c.example.org/deep/path"]
    assert r["urlkey"] == "org,example,c,b,a)/deep/path"
    assert r["digest"] == hashlib.md5(b"").hexdigest() and r["status"] == 404


def test_cdx_no_python_in_plan(spark):
    df = spark.createDataFrame([("https://x.com/a", 200, "b")],
                               "url string, status_code int, body string")
    plan = cdx_index(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_temperature_sample_quotas_and_determinism(spark):
    # skew: group g0 has 160 rows, g1 40, g2 10 -> sqrt weights flatten
    rows = [(f"g{g}", g * 1000 + i) for g, n in ((0, 160), (1, 40), (2, 10))
            for i in range(n)]
    df = spark.createDataFrame(rows, "src string, id long")
    out = temperature_sample(df, "src", "id", total_target=60)
    got = out.groupBy("src").count().collect()
    by = {r["src"]: r["count"] for r in got}
    quotas = {r["src"]: r["group_quota"]
              for r in out.select("src", "group_quota").distinct().collect()}
    assert by == quotas  # every quota met exactly (quota <= group size here)
    assert sum(by.values()) <= 60
    # natural share of g0 is 160/210 = 76%; sqrt share must sit well below
    assert by["g0"] / sum(by.values()) < 0.65
    assert by["g2"] >= 1
    # deterministic under partitioning: same ids selected
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(r["id"] for r in
                  temperature_sample(df.repartition(13), "src", "id", 60).collect())
    assert ids1 == ids2
    with pytest.raises(ValueError):
        temperature_sample(df, "src", "id", 0)


def test_paired_alignment_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["pair_id"]: r for r in paired_alignment(df, threshold_micro=0).collect()}
    assert len(out) == 10
    for p in range(10):
        a = vecs[2 * p].astype(np.float64)
        b = vecs[2 * p + 1].astype(np.float64)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(out[p]["cosine"] - round(cos, 6)) <= 1e-6
        assert out[p]["keep"] == (out[p]["cosine"] >= 0.0)
        assert out[p]["img_id"] == 2 * p and out[p]["txt_id"] == 2 * p + 1


def test_curate_funnel_stages(spark):
    from scrapy_products_tracker_spark.imaging import curate

    rows = [
        # (id, bytes, w, h, fmt, caption)
        ("i0", b"AAA", 64, 64, "png", "a good long caption here"),
        ("i1", b"AAA", 64, 64, "png", "duplicate payload of i0"),   # exact dup
        ("i2", b"BBB", 64, 64, "png", "short"),                      # caption_short
        ("i3", b"CCC", 0, 64, "png", "degenerate width row here"),   # degenerate
        ("i4", b"DDD", 64, 64, "jpeg", "another good caption here"),
        ("i5", b"EEE", 8, 64, "jpeg", "tiny image should drop too"), # small_image
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string"
    )
    out = curate(df, sample_target=10, shard_budget_bytes=1 << 20).collect()
    ids = sorted(r["image_id"] for r in out)
    assert ids == ["i0", "i4"]  # i1 deduped, i2/i3/i5 filtered
    for r in out:
        assert r["shard_id"] == 0 and r["payload_bytes"] > 0
        assert r["sample_rank"] >= 1 and r["group_quota"] >= 1


def test_caption_blocklist_edges(spark):
    from scrapy_products_tracker_spark.imaging import caption_blocklist_filter

    rows = [
        ("a", "a LAMP on granite"),      # 2 distinct terms, case-insensitive
        ("b", "lamplight is fine"),       # word boundary: no hit
        ("c", None),                      # NULL caption -> 0 hits
        ("d", "prism prism prism"),       # repeated term counts once
    ]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    out = {r["id"]: r for r in
           caption_blocklist_filter(df, ["lamp", "granite", "prism"]).collect()}
    assert out["a"]["n_hits"] == 2 and not out["a"]["keep"]
    assert out["b"]["n_hits"] == 0 and out["b"]["keep"]
    assert out["c"]["n_hits"] == 0 and out["c"]["keep"]
    assert out["d"]["n_hits"] == 1
    with pytest.raises(ValueError):
        caption_blocklist_filter(df, [])


def test_soft_dedup_weights_nulls_and_clusters(spark):
    from scrapy_products_tracker_spark.dedup import soft_dedup_weights

    rows = [(1, "same"), (2, "same"), (3, "same"), (4, "uniq"), (5, None), (6, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in soft_dedup_weights(df).collect()}
    for i in (1, 2, 3):
        assert out[i]["cluster_size"] == 3 and out[i]["weight_micro"] == 333333
    assert out[4]["cluster_size"] == 1 and out[4]["weight_micro"] == 1_000_000
    # NULL-text rows are singletons, never folded into one cluster
    assert out[5]["cluster_size"] == 1 and out[6]["cluster_size"] == 1


def test_temperature_threshold_variant(spark):
    from scrapy_products_tracker_spark.functions import temperature_sample_threshold

    rows = [(f"g{g}", g * 100000 + i) for g, n in ((0, 3000), (1, 800), (2, 200))
            for i in range(n)]
    df = spark.createDataFrame(rows, "src string, id long")
    out = temperature_sample_threshold(df, "src", "id", total_target=400)
    by = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    quotas = {r["src"]: r["group_quota"]
              for r in out.select("src", "group_quota").distinct().collect()}
    # binomial tolerance: |kept - quota| <= 4*sqrt(quota)
    for g, q in quotas.items():
        assert abs(by.get(g, 0) - q) <= 4 * (q ** 0.5) + 1, (g, by.get(g), q)
    # deterministic: identical selection on re-run and under repartition
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(r["id"] for r in temperature_sample_threshold(
        df.repartition(11), "src", "id", 400).collect())
    assert ids1 == ids2
    # plan: NO exchange other than the tiny aggregates — the data path
    # is scan -> broadcast join -> filter (no window/sort on the corpus)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    with pytest.raises(ValueError):
        temperature_sample_threshold(df, "src", "id", 0)


def test_temperature_sample_null_group_survives(spark):
    from scrapy_products_tracker_spark.functions import temperature_sample

    rows = [("a", 1), ("a", 2), ("a", 3), ("a", 4), (None, 10), (None, 11)]
    df = spark.createDataFrame(rows, "src string, id long")
    out = temperature_sample(df, "src", "id", total_target=6)
    srcs = [r["src"] for r in out.collect()]
    # NULL rows form their own group and take their quota share —
    # a plain equi-join would have dropped them silently
    assert None in srcs and "a" in srcs


def test_blocklist_nonword_edge_terms(spark):
    from scrapy_products_tracker_spark.imaging import caption_blocklist_filter

    rows = [("a", "rated 18+ content"), ("b", "learn c++ today"), ("c", "18 plus")]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    out = {r["id"]: r for r in caption_blocklist_filter(df, ["18+", "c++"]).collect()}
    assert out["a"]["n_hits"] == 1   # \b...\b would never match '18+'
    assert out["b"]["n_hits"] == 1
    assert out["c"]["n_hits"] == 0


def test_latency_percentile_names(spark):
    from scrapy_products_tracker_spark.politeness.scheduler import latency_percentiles

    df = spark.createDataFrame(
        [("d", i) for i in range(100)], "domain string, latency_ms int"
    )
    out = latency_percentiles(df, percentiles=(0.5, 0.999, 1.0))
    assert set(out.columns) == {"domain", "n_fetches", "p50_ms", "p999_ms", "p100_ms"}
    r = out.collect()[0]
    assert r["p100_ms"] == 99.0
    with pytest.raises(ValueError):
        latency_percentiles(df, percentiles=(1.5,)).collect()


def test_curate_null_bytes_rows_are_singletons(spark):
    from scrapy_products_tracker_spark.imaging import curate

    rows = [
        ("i0", None, 64, 64, "png", "caption for first null row"),
        ("i1", None, 64, 64, "png", "caption for second null row"),
        ("i2", b"XX", 64, 64, "png", "caption for a real payload"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string"
    )
    ids = sorted(r["image_id"] for r in curate(df).collect())
    assert ids == ["i0", "i1", "i2"]  # NULL-bytes rows never folded as dups


def test_shuffle_rank_exact_permutation_and_two_phase_plan(spark):
    """shuffle_rank: exact 0..n-1 permutation equal to the naive
    global-window rank, stable under repartitioning, and the
    distributed plan never runs a row_number window over the full
    data in one partition (the md5-prefix bucket is the partition
    key; offsets join broadcasts)."""
    import re

    from pyspark.sql import Window

    from scrapy_products_tracker_spark.functions.sampling import shuffle_rank

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    got = shuffle_rank(df, id_col="doc_id", salt="t1")
    rows = {r["id"]: r["shuffle_rank"] for r in got.collect()}
    assert sorted(rows.values()) == list(range(500))
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("t1")))
    naive = df.select(
        "doc_id",
        (F.row_number().over(Window.orderBy(key, "doc_id")) - 1).alias("r"),
    )
    assert {r["doc_id"]: r["r"] for r in naive.collect()} == rows
    # partitioning-independence
    rows2 = {
        r["id"]: r["shuffle_rank"]
        for r in shuffle_rank(df.repartition(7), id_col="doc_id", salt="t1").collect()
    }
    assert rows2 == rows
    # different salt -> different permutation (re-roll)
    rows3 = {
        r["id"]: r["shuffle_rank"]
        for r in shuffle_rank(df, id_col="doc_id", salt="t2").collect()
    }
    assert rows3 != rows
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    for m in re.finditer(r"Window \[row_number\(\)[^\n]*", plan):
        assert "_rng" in m.group(0), m.group(0)


def test_mixture_sample_quotas_allowlist_underfill(spark):
    """Explicit mixture: int64-exact quotas from curated weights,
    groups absent from the recipe dropped (allowlist), under-filled
    groups yield all rows with no redistribution, NULL group handled
    via the null-safe key (only if present in weights)."""
    from scrapy_products_tracker_spark.functions.sampling import mixture_sample

    rows = (
        [(i, "web") for i in range(100)]
        + [(200 + i, "code") for i in range(3)]   # under-filled
        + [(300 + i, "spam") for i in range(50)]  # not in recipe
    )
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = mixture_sample(df, "src", "doc_id", 40, {"web": 700, "code": 300})
    got = {}
    for r in out.collect():
        got.setdefault(r["src"], []).append(r)
    # quotas: web 40*700//1000 = 28, code 40*300//1000 = 12
    assert len(got["web"]) == 28 and all(r["group_quota"] == 28 for r in got["web"])
    assert len(got["code"]) == 3  # all rows; quota 12 unfilled
    assert "spam" not in got
    # determinism: same call -> same ids
    ids1 = sorted(r["doc_id"] for r in got["web"])
    out2 = mixture_sample(df, "src", "doc_id", 40, {"web": 700, "code": 300})
    assert sorted(r["doc_id"] for r in out2.collect() if r["src"] == "web") == ids1
    import pytest

    with pytest.raises(ValueError):
        mixture_sample(df, "src", "doc_id", 0, {"web": 1})
    with pytest.raises(ValueError):
        mixture_sample(df, "src", "doc_id", 10, {})


def test_cdx_revisit_records(spark):
    """Archive-dedup semantics: first capture per (urlkey, digest) is
    the stored response; identical later captures are revisits
    pointing at it; a content CHANGE starts a new response lineage;
    NULL bodies never dedup; stored_length sums to exactly one
    payload copy per distinct digest."""
    from scrapy_products_tracker_spark.crawl.cdx import cdx_revisit_index

    rows = [
        # url, status, body, ts
        ("https://a.com/p", 200, "same", 1),
        ("https://a.com/p", 200, "same", 2),      # revisit of ts=1
        ("https://a.com/p", 200, "changed", 3),   # new response
        ("https://a.com/p", 200, "changed", 4),   # revisit of ts=3
        ("https://a.com/r", 301, None, 1),        # digest-less: response
        ("https://a.com/r", 301, None, 2),        # digest-less: response again
    ]
    df = spark.createDataFrame(rows, "url string, status_code int, body string, ts long")
    got = {
        (r["urlkey"], r["ts"]): r.asDict()
        for r in cdx_revisit_index(df).collect()
    }
    p = "com,a)/p"
    assert got[(p, 1)]["record_type"] == "response" and got[(p, 1)]["stored_length"] == 4
    assert got[(p, 2)]["record_type"] == "revisit"
    assert got[(p, 2)]["refers_to_ts"] == 1 and got[(p, 2)]["stored_length"] == 0
    assert got[(p, 3)]["record_type"] == "response" and got[(p, 3)]["stored_length"] == 7
    assert got[(p, 4)]["record_type"] == "revisit" and got[(p, 4)]["refers_to_ts"] == 3
    r = "com,a)/r"
    assert got[(r, 1)]["record_type"] == "response"
    assert got[(r, 2)]["record_type"] == "response"  # NULL digest never dedups
    assert got[(r, 2)]["digest"] is None and got[(r, 2)]["stored_length"] == 0
    # archive footprint == one copy per distinct digest
    total = sum(v["stored_length"] for v in got.values())
    assert total == len("same") + len("changed")


def test_epoch_repeat_exact_counts(spark):
    """Fractional-epoch upsampling: whole copies exact, fractional tail
    deterministic and group-proportional; allowlist semantics."""
    import hashlib

    from scrapy_products_tracker_spark.functions import epoch_repeat

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = epoch_repeat(df, "src", "doc_id", {"a": 2500, "b": 500}).collect()
    got = {}
    for r in out:
        got.setdefault((r["src"], r["epoch"]), set()).add(r["doc_id"])
    # whole copies: every 'a' row in epochs 1 and 2
    a_ids = {i for i in range(200) if i % 2 == 0}
    assert got[("a", 1)] == a_ids and got[("a", 2)] == a_ids

    # fractional picks equal the md5 threshold definition exactly
    def picked(ids, frac):
        thr = format((frac << 128) // 1000, "032x")
        return {i for i in ids if hashlib.md5(f"ep1{i}".encode()).hexdigest() < thr}

    assert got[("a", 3)] == picked(a_ids, 500)
    # b (0.5 epochs): no whole copies — its ONLY rows are the
    # fractional pick at epoch index 1 (= whole 0 + 1)
    b_ids = {i for i in range(200) if i % 2 == 1}
    b_epochs = {e for (s, e) in got if s == "b"}
    assert b_epochs == {1}
    assert got[("b", 1)] == picked(b_ids, 500)


def test_curate_color_gate(spark):
    import numpy as np

    from scrapy_products_tracker_spark.imaging import curate
    from scrapy_products_tracker_spark.imaging.codec import encode_image

    def png(px):
        return bytearray(encode_image(px, "png"))

    colorful = np.random.default_rng(5).integers(0, 256, (16, 16, 3)).astype("uint8")
    gray3 = np.full((16, 16, 3), 120, dtype="uint8")  # neutral, stored 3-channel
    rows = [
        ("c0", png(colorful), 16, 16, "png", "a colorful caption right here"),
        ("g0", png(gray3), 16, 16, "png", "a grayscale caption right here"),
        ("j0", bytearray(b"not an image"), 16, 16, "png", "junk payload caption here"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string"
    )
    # gate off: all three survive the metadata rules
    assert sorted(r.image_id for r in curate(df).collect()) == ["c0", "g0", "j0"]
    # grayscale gate: neutral payload drops; undecodable fails the gate
    assert sorted(
        r.image_id for r in curate(df, drop_grayscale=True).collect()
    ) == ["c0"]
    # colorfulness floor only: grayscale (colorfulness 0) drops, junk drops
    out = curate(df, min_colorfulness_milli=1).collect()
    assert sorted(r.image_id for r in out) == ["c0"]
