import numpy as np
import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy_products_tracker_spark.dedup import (
    BloomTable,
    CuckooFilter,
    dedup_within_batch,
    optimal_params,
)
from scrapy_products_tracker_spark.functions import murmur3_str


def test_murmur3_matches_spark(spark):
    samples = ["", "a", "ab", "abc", "abcd", "abcde", "https://hot.example.com/p/1?x=1", "ünïcødé-路径", "x" * 100]
    df = spark.createDataFrame([(s,) for s in samples], ["s"]).select("s", F.hash("s").alias("h"))
    for row in df.collect():
        assert murmur3_str(row["s"]) == row["h"], row["s"]


def test_xxhash64_matches_spark(spark):
    from scrapy_products_tracker_spark.functions.hashing import xxhash64_long, xxhash64_str

    samples = [
        "", "a", "abc", "abcd", "abcdefg", "x" * 31, "x" * 32, "x" * 33, "x" * 100,
        "https://hot.example.com/p/1?x=1", "ünïcødé-路径",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for row in df.collect():
        assert xxhash64_str(row["s"]) == row["h"], row["s"]
    dfl = spark.createDataFrame(
        [(v,) for v in [0, 1, -1, 2**62, -(2**62), 123456789]], ["v"]
    ).select("v", F.xxhash64("v").alias("h"))
    for row in dfl.collect():
        assert xxhash64_long(row["v"]) == row["h"], row["v"]


@given(st.text(max_size=40))
@settings(max_examples=30, deadline=None)
def test_murmur3_stable(s):
    assert murmur3_str(s) == murmur3_str(s)
    assert -(2**31) <= murmur3_str(s) < 2**31


def test_optimal_params_fpr_shape():
    bits, k = optimal_params(10_000, 0.01)
    assert bits > 10_000 and 1 <= k <= 16


def _bloom_table(spark, df, tmpdir_path, n_buckets, bits, k):
    params = {"n_buckets": n_buckets, "bits": bits, "k": k}
    shards = BloomTable.build_shards_df(df, "url", n_buckets, bits, k)
    path = tmpdir_path + "/shards"
    shards.write.mode("overwrite").parquet(path)
    return BloomTable(spark, [path], params)


def test_bloom_no_false_negatives_and_fpr(spark, tmpdir_path):
    seen = spark.createDataFrame([(f"https://d{i % 5}.com/p/{i}",) for i in range(3000)], ["url"])
    bloom = _bloom_table(spark, seen, tmpdir_path, n_buckets=16, bits=65536, k=7)
    probe = spark.createDataFrame(
        [(f"https://d{i % 5}.com/p/{i}",) for i in range(2000, 5000)], ["url"]
    )
    marked = bloom.mark(probe).persist()
    n_maybe = marked.filter(F.col("_maybe_seen")).count()
    n_unseen = marked.filter(~F.col("_maybe_seen")).count()
    marked.unpersist()
    assert n_maybe + n_unseen == 3000
    assert n_maybe >= 1000  # the 1000 truly-seen must all be 'maybe'
    assert (n_maybe - 1000) / 2000 < 0.03  # FPR bound on truly-unseen


def test_bloom_delta_merge_matches_single_build(spark, tmpdir_path):
    """Building over A then delta-merging B must equal building A∪B."""
    a = spark.createDataFrame([(f"u{i}",) for i in range(500)], ["url"])
    b = spark.createDataFrame([(f"v{i}",) for i in range(300)], ["url"])
    both = a.unionByName(b)
    t_a = _bloom_table(spark, a, tmpdir_path + "/a", n_buckets=8, bits=16384, k=5)
    merged = BloomTable.merge_shards(t_a.shards_df(), t_a.delta_df(b))
    merged.write.mode("overwrite").parquet(tmpdir_path + "/m")
    t_m = BloomTable(spark, [tmpdir_path + "/m"], t_a.params)
    t_ab = _bloom_table(spark, both, tmpdir_path + "/ab", n_buckets=8, bits=16384, k=5)
    pm = {r["bucket"]: bytes(r["payload"]) for r in t_m.shards_df().collect()}
    pab = {r["bucket"]: bytes(r["payload"]) for r in t_ab.shards_df().collect()}
    assert pm == pab


def test_cuckoo_membership_delete():
    cf = CuckooFilter.for_capacity(4000)
    rng = np.random.default_rng(1)
    h1 = rng.integers(-(2**63), 2**63 - 1, 2000, dtype=np.int64)
    h2 = rng.integers(-(2**31), 2**31 - 1, 2000, dtype=np.int64)
    cf.add_many(h1, h2)
    assert cf.contains_many(h1, h2).all()
    q1 = rng.integers(-(2**63), 2**63 - 1, 4000, dtype=np.int64)
    q2 = rng.integers(-(2**31), 2**31 - 1, 4000, dtype=np.int64)
    assert cf.contains_many(q1, q2).mean() < 0.01
    cf.delete_many(h1[:200], h2[:200])
    assert cf.contains_many(h1[:200], h2[:200]).mean() < 0.05  # fp-only residue
    assert cf.contains_many(h1[200:], h2[200:]).all()  # others untouched


def test_dedup_within_batch_first_wins(spark):
    rows = [("u1", 3), ("u1", 1), ("u2", 5), ("u1", 2), ("u2", 4)]
    df = spark.createDataFrame(rows, ["url", "discovered_seq"])
    out = dedup_within_batch(df, ["discovered_seq"]).collect()
    got = {r["url"]: r["discovered_seq"] for r in out}
    assert got == {"u1": 1, "u2": 4}
