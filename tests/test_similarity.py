"""Similarity / near-dup operator tests (MinHash+LSH, SimHash, ANN).

Planted-duplicate design: a corpus of random-word docs plus known
near-duplicate pairs (small token edits). The pipeline must (a) surface
every planted pair as an LSH candidate, (b) estimate Jaccard close to
the exact shingle Jaccard, (c) rank near-dups closer than random pairs
under SimHash hamming distance, and (d) ANN-LSH must agree with the
exact brute-force top-k on its own bucket.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions import similarity as SIM

WORDS = [f"w{i}" for i in range(300)]


def _doc(rng, n=60):
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _mutate(rng, text, edits=2):
    toks = text.split()
    for _ in range(edits):
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


def _exact_shingle_jaccard(a: str, b: str, k=3) -> float:
    sa = {" ".join(a.split()[i : i + k]) for i in range(len(a.split()) - k + 1)}
    sb = {" ".join(b.split()[i : i + k]) for i in range(len(b.split()) - k + 1)}
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": _doc(rng)})
    # planted near-dups: ids 100+i duplicates of i with 2 token edits
    for i in range(8):
        rows.append({"doc_id": 100 + i, "text": _mutate(rng, rows[i]["text"])})
    return spark.createDataFrame(pd.DataFrame(rows)), rows


def test_minhash_lsh_finds_planted_pairs(spark, corpus):
    df, rows = corpus
    sig = SIM.minhash_signature(df, "doc_id", "text", n_hashes=32, k=3).persist()
    pairs = SIM.lsh_candidate_pairs(sig, n_hashes=32, bands=8)
    est = SIM.minhash_jaccard_estimate(sig, pairs, n_hashes=32)
    found = {(r["doc_a"], r["doc_b"]): r["jaccard_est"] for r in est.collect()}
    by_id = {r["doc_id"]: r["text"] for r in rows}
    for i in range(8):
        key = (i, 100 + i)
        assert key in found, f"planted near-dup {key} not surfaced by LSH"
        exact = _exact_shingle_jaccard(by_id[i], by_id[100 + i])
        assert abs(found[key] - exact) < 0.25, (key, found[key], exact)
    sig.unpersist()


def test_minhash_short_doc_handling(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["one two", "one two", "x"]})
    )
    sig = SIM.minhash_signature(df, "doc_id", "text", n_hashes=8, k=3)
    rows = {r["doc"]: [r[f"sig_{i}"] for i in range(8)] for r in sig.collect()}
    assert set(rows) == {1, 2, 3}  # sub-k-token docs still get signatures
    assert rows[1] == rows[2]  # identical short docs -> identical sigs


def test_simhash_orders_near_vs_far(spark, corpus):
    df, rows = corpus
    sh = {r["doc"]: r["simhash"] for r in SIM.simhash64(df, "doc_id", "text").collect()}

    def ham(a, b):  # mask: simhash is a signed int64
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    near = [ham(sh[i], sh[100 + i]) for i in range(8)]
    far = [ham(sh[i], sh[i + 10]) for i in range(8)]
    assert max(near) < min(far), (near, far)


def test_ann_lsh_subset_of_bucket_bruteforce(spark):
    rng = random.Random(11)
    rows = [
        {"vec_id": i, "embedding": [rng.gauss(0, 1) for _ in range(16)]} for i in range(200)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    q = rows[0]["embedding"]
    exact = [r["vec_id"] for r in SIM.ann_topk_bruteforce(df, q, k=5).collect()]
    approx = SIM.ann_topk_lsh(df, q, k=5, n_planes=4).collect()
    assert exact[0] == 0  # the query vector itself is its own nearest
    assert approx[0]["vec_id"] == 0  # query's bucket contains the query
    # every approx hit must be a true corpus vector with correct cosine
    exact_all = {
        r["vec_id"]: r["cosine"] for r in SIM.ann_topk_bruteforce(df, q, k=200).collect()
    }
    for r in approx:
        assert abs(exact_all[r["vec_id"]] - r["cosine"]) < 1e-9


def test_simhash_pairs_match_bruteforce(spark, corpus):
    """Banded SimHash pair join == all-pairs brute force at the same
    threshold (pigeonhole exactness), and planted near-dups appear."""
    df, rows = corpus
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in SIM.simhash_neardup_pairs(df, "doc_id", "text", threshold=7).collect()
    }
    sig = SIM.simhash64(df, "doc_id", "text")
    a = sig.select(F.col("doc").alias("id_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc").alias("id_b"), F.col("simhash").alias("hb"))
    brute = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", SIM.hamming64(F.col("ha"), F.col("hb")).alias("dist"))
        .filter(F.col("dist") <= 7)
        .collect()
    }
    assert pairs == brute
    assert any(a_ == i and b_ == 100 + i for (a_, b_) in pairs for i in range(8))


def test_dedup_corpus_drops_exact_and_near_dups(spark, corpus):
    from scrapy_products_tracker_spark.dedup import dedup_corpus

    df, rows = corpus
    extra = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 200, "text": rows[0]["text"]},  # exact dup of 0
                {"doc_id": 201, "text": "  " + rows[1]["text"].upper() + " "},  # normalized dup of 1
            ]
        )
    )
    surv = {
        r["doc_id"]
        for r in dedup_corpus(df.unionByName(extra), threshold=0.5).select("doc_id").collect()
    }
    assert 200 not in surv and 201 not in surv  # exact pass, first-wins
    assert 0 in surv and 1 in surv
    for i in range(8):  # near pass drops the higher-id planted variant
        assert 100 + i not in surv, i
        assert i in surv
    # untouched uniques survive
    assert all(i in surv for i in range(8, 40))


def test_dedup_corpus_null_text_passthrough(spark):
    """NULL-text docs share no content: they must all survive, not
    collapse into one 'duplicate' group via a NULL fingerprint."""
    import pandas as _pd

    from scrapy_products_tracker_spark.dedup import dedup_corpus

    df = spark.createDataFrame(
        _pd.DataFrame(
            {"doc_id": [1, 2, 3, 4], "text": [None, None, None, "real content here"]}
        ).astype({"doc_id": "int64"})
    )
    surv = {r["doc_id"] for r in dedup_corpus(df).select("doc_id").collect()}
    assert surv == {1, 2, 3, 4}


def test_embedding_lsh_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert SIM.embedding_neardup_lsh(empty).count() == 0


def test_hard_negative_mine_matches_pure_python(spark):
    """In-batch hard negatives vs an independent pure-Python miner:
    same batching, same 6-dp rounding-then-rank, same tie order."""
    import math

    rnd = random.Random(7)
    n_pairs, dim, bs, k = 24, 6, 8, 2
    vecs = {}
    rows = []
    for p in range(n_pairs):
        for par in (0, 1):
            v = [rnd.uniform(-1, 1) for _ in range(dim)]
            vecs[2 * p + par] = v
            rows.append((2 * p + par, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["pair_id"], r["neg_pair_id"], r["cosine"], r["rank"])
        for r in SIM.hard_negative_mine(df, k=k, batch_size=bs)
        .orderBy("pair_id", "rank")
        .collect()
    ]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    want = []
    for p in range(n_pairs):
        batch = p // bs
        cands = sorted(
            (
                (-cos(vecs[2 * p], vecs[2 * q + 1]), q)
                for q in range(n_pairs)
                if q // bs == batch and q != p
            ),
        )[:k]
        for i, (negcos, q) in enumerate(cands):
            want.append((p, q, -negcos, i + 1))
    assert got == want
    # every anchor got exactly k negatives, all from its own batch
    per_anchor = {}
    for p, q, _, _ in got:
        per_anchor.setdefault(p, []).append(q)
        assert q // bs == p // bs and q != p
    assert all(len(v) == k for v in per_anchor.values())
    assert len(per_anchor) == n_pairs


def test_retrieval_recall_pure_python(spark):
    """recall@k vs an independent pure-Python evaluator: same batching,
    count-based rank on the rounded grid, milli floor."""
    import math

    rnd = random.Random(11)
    n_pairs, dim, bs = 20, 5, 8
    vecs = {}
    rows = []
    for p in range(n_pairs):
        for par in (0, 1):
            v = [rnd.uniform(-1, 1) for _ in range(dim)]
            vecs[2 * p + par] = v
            rows.append((2 * p + par, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["k"]: (r["n_anchors"], r["n_hits"], r["recall_milli"])
        for r in SIM.retrieval_recall_at_k(df, ks=(1, 3), batch_size=bs).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))), 6)

    ranks = {}
    for p in range(n_pairs):
        batch = p // bs
        tc = cos(vecs[2 * p], vecs[2 * p + 1])
        better = sum(
            1
            for q in range(n_pairs)
            if q // bs == batch
            and q != p
            and (
                cos(vecs[2 * p], vecs[2 * q + 1]) > tc
                or (cos(vecs[2 * p], vecs[2 * q + 1]) == tc and q < p)
            )
        )
        ranks[p] = 1 + better
    for k in (1, 3):
        hits = sum(1 for r in ranks.values() if r <= k)
        assert got[k] == (n_pairs, hits, hits * 1000 // n_pairs)


def test_lsh_precision_audit_full_sample(spark):
    from scrapy_products_tracker_spark.functions.similarity import (
        lsh_precision_audit,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact copy: candidate + true positive
        (3, "completely different words about copper lamps and granite piers"),
        (4, "yet another unrelated sentence mentioning harbors ferns and signals"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = lsh_precision_audit(
        df, threshold_milli=500, sample_milli=1000
    ).collect()[0]
    assert r.n_candidates >= 1 and r.n_sampled == r.n_candidates
    assert r.n_true_pos >= 1
    # the identical pair estimates 1000 and is exactly 1000: if it is
    # the only candidate, precision is exact and the error is zero
    if r.n_candidates == 1:
        assert r.precision_milli == 1000 and r.avg_abs_est_err_milli == 0
    import pytest

    with pytest.raises(ValueError):
        lsh_precision_audit(df, sample_milli=0)


def test_label_centroid_drift_closed_forms(spark):
    from scrapy_products_tracker_spark.functions.similarity import (
        label_centroid_drift,
    )

    rows = [
        ("A", [1.0, 0.0]),
        ("A", [1.0, 0.0]),
        ("B", [0.0, 1.0]),
        ("C", [2.0, 0.0]),
        ("C", [0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    got = {
        (r.label_a, r.label_b): (r.n_a, r.n_b, r.cos)
        for r in label_centroid_drift(df).collect()
    }
    assert got[("A", "B")] == (2, 1, 0.0)       # orthogonal centroids
    assert got[("A", "C")] == (2, 2, 1.0)       # parallel: C mean = (1000, 0)
    assert got[("B", "C")][2] == 0.0
    # partition invariance
    got2 = {
        (r.label_a, r.label_b): (r.n_a, r.n_b, r.cos)
        for r in label_centroid_drift(df.repartition(5)).collect()
    }
    assert got == got2
