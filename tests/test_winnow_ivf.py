"""Winnowing fingerprints + IVF ANN: exactness vs independent oracles.

- winnow_fingerprints is checked against a from-scratch pure-Python
  winnower (hashlib md5, no Spark), plus the MOSS guarantee property:
  docs sharing a substring of length >= k+w-1 share a fingerprint.
- ann_topk_ivf is checked against numpy argmax assignment + probe, and
  must equal the brute-force baseline whenever every cell is probed.
"""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    embedding_neardup_lsh,
    ivf_assign,
    ivf_centroids_first,
)
from scrapy_products_tracker_spark.functions.text import winnow_fingerprints


def _py_winnow(text: str, k: int = 5, w: int = 4) -> set[str]:
    t = text.lower()
    if len(t) < k + w - 1:
        return {hashlib.md5(t.encode()).hexdigest()}
    hashes = [hashlib.md5(t[i : i + k].encode()).hexdigest() for i in range(len(t) - k + 1)]
    return {min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)}


DOCS = [
    (0, "The quick brown fox jumps over the lazy dog near the river bank today."),
    (1, "A totally different sentence that shares nothing with the first one at all!"),
    (2, "quick brown fox jumps over the lazy dog"),  # shared substring with 0
    (3, "tiny"),  # short-doc path
    (4, ""),  # empty text
    (5, "aaaaaaaaaaaaaaaa"),  # degenerate repeats -> single fingerprint
]


def test_winnow_matches_pure_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=5, w=4).collect():
        got.setdefault(r["doc"], set()).add(r["fp"])
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_winnow(text), f"doc {doc_id}"


def test_winnow_shared_substring_guarantee(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=5, w=4)
    a = {r["fp"] for r in fps.filter(F.col("doc") == 0).collect()}
    b = {r["fp"] for r in fps.filter(F.col("doc") == 2).collect()}
    c = {r["fp"] for r in fps.filter(F.col("doc") == 1).collect()}
    assert a & b, "docs sharing a >=k+w-1 substring must share a fingerprint"
    assert not (a & c), "unrelated docs should not collide here"


def test_winnow_xxhash64_mode_matches_pure_python(spark):
    """The at-scale hash mode (signed-long xxhash64 grams) must agree
    with a from-scratch winnower built on the bit-parity-pinned
    pure-Python xxhash64."""
    from scrapy_products_tracker_spark.functions.hashing import xxhash64_str

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    def py_winnow_xx(text, k=5, w=4):
        t = text.lower()
        if len(t) < k + w - 1:
            return {signed(xxhash64_str(t))}
        hs = [signed(xxhash64_str(t[i : i + k])) for i in range(len(t) - k + 1)]
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=5, w=4, hash_mode="xxhash64").collect():
        got.setdefault(r["doc"], set()).add(r["fp"])
    for doc_id, text in DOCS:
        assert got[doc_id] == py_winnow_xx(text), f"doc {doc_id}"


def test_winnow_prefix_cap(spark):
    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    capped = winnow_fingerprints(df, "doc_id", "text", k=5, w=4, prefix=20)
    got = {r["fp"] for r in capped.collect()}
    assert got == _py_winnow(DOCS[0][1][:20])


def test_bpe_token_count_hand_cases(spark):
    from scrapy_products_tracker_spark.functions.text import bpe_token_count

    cases = [
        # "it's fine" -> [it]["'s"][ fine] = 3
        (0, "it's fine", 3),
        # [Hello][,][ world][!] = 4 (punct splits from letters)
        (1, "Hello, world!", 4),
        # [abc][123][ x] = 3 (digit run separate from letter run)
        (2, "abc123 x", 3),
        (3, "", 0),
        # [we]["'ll"][ see][ 10][ %] -> ' ?%' punct run = 5
        (4, "we'll see 10 %", 5),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in cases], "id long, t string")
    got = {r["id"]: r["n"] for r in df.select("id", bpe_token_count(F.col("t")).alias("n")).collect()}
    for i, _, want in cases:
        assert got[i] == want, f"case {i}"


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((120, 16)).astype(np.float64)
    rows = [(i, vecs[i].tolist()) for i in range(120)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), vecs


def _np_cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_ivf_assignment_is_argmax(vectors):
    df, vecs = vectors
    corpus = df.filter(F.col("vec_id") > 0)
    cents = ivf_centroids_first(corpus, 8)
    got = {r["vec_id"]: r["cell_id"] for r in ivf_assign(corpus, cents).collect()}
    cent_ids = list(range(1, 9))
    for vid in range(1, 120):
        sims = [(round(_np_cos(vecs[vid], vecs[c]), 6), -c) for c in cent_ids]
        best = -max(sims)[1]
        assert got[vid] == best, f"vec {vid}"


def test_ivf_probe_all_equals_bruteforce(vectors):
    df, vecs = vectors
    corpus = df.filter(F.col("vec_id") > 0)
    q = vecs[0].tolist()
    bf = [(r["vec_id"], r["cosine"]) for r in ann_topk_bruteforce(corpus, q, k=10).collect()]
    ivf = [
        (r["vec_id"], r["cosine"])
        for r in ann_topk_ivf(corpus, q, k=10, n_cells=8, n_probe=8).collect()
    ]
    assert ivf == bf


def test_embedding_lsh_neardup_finds_planted_pairs(spark):
    """Banded hyperplane-LSH near-dup: planted ~0.999-cosine variants
    are recovered; unrelated random vectors are not reported at the
    0.95 threshold; and the plan is equi-join only (no cartesian)."""
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 16))
    planted = [(i, 100 + i) for i in (3, 17, 42)]
    rows = [(i, vecs[i].tolist()) for i in range(60)]
    rows += [(100 + i, (vecs[i] + rng.standard_normal(16) * 0.01).tolist()) for i, _ in planted]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_neardup_lsh(df, threshold=0.95, n_bands=4, planes_per_band=8)
    assert "CartesianProduct" not in out._jdf.queryExecution().executedPlan().toString()
    got = {(r["vec_a"], r["vec_b"]) for r in out.collect()}
    assert got == set(planted)


def test_ivf_pruned_probe_matches_numpy(vectors):
    df, vecs = vectors
    corpus = df.filter(F.col("vec_id") > 0)
    q = vecs[0]
    cent_ids = list(range(1, 9))
    assign = {
        vid: -max((round(_np_cos(vecs[vid], vecs[c]), 6), -c) for c in cent_ids)[1]
        for vid in range(1, 120)
    }
    probed = [
        -c for _, c in sorted(
            ((round(_np_cos(q, vecs[c]), 6), -c) for c in cent_ids), reverse=True
        )[:3]
    ]
    cand = [v for v, cell in assign.items() if cell in probed]
    expected = sorted(
        ((round(_np_cos(q, vecs[v]), 6), -v) for v in cand), reverse=True
    )[:10]
    expected = [(-nv, c) for c, nv in expected]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ann_topk_ivf(corpus, q.tolist(), k=10, n_cells=8, n_probe=3).collect()
    ]
    assert got == expected


def test_kmeans_refine_matches_numpy(vectors):
    """Two Lloyd's iterations from the deterministic seed equal a
    straight numpy implementation (same rounded-centroid fixpoint,
    same max-cosine/lowest-id tie-break); empty-cell carry and the
    zero-Exchange assignment plan are pinned too."""
    from scrapy_products_tracker_spark.functions.similarity import kmeans_refine

    df, vecs = vectors
    k, iters = 6, 2
    cents, assign = kmeans_refine(df, n_cells=k, iters=iters)

    ref = {c: vecs[c].tolist() for c in range(k)}  # seed = lowest ids
    for _ in range(iters):
        members: dict[int, list[int]] = {c: [] for c in ref}
        for vid in range(len(vecs)):
            sims = [(round(_np_cos(vecs[vid], np.array(ref[c])), 6), -c) for c in sorted(ref)]
            members[-max(sims)[1]].append(vid)
        ref = {
            c: ([round(float(x), 6) for x in np.mean(vecs[m], axis=0)] if m else ref[c])
            for c, m in members.items()
        }
    assert cents == ref
    got = {r["vec_id"]: r["cell_id"] for r in assign.collect()}
    for vid in range(len(vecs)):
        sims = [(round(_np_cos(vecs[vid], np.array(ref[c])), 6), -c) for c in sorted(ref)]
        assert got[vid] == -max(sims)[1], f"vec {vid}"
    # the assignment subtree is the literal-fold argmax: no Exchange
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_refine_zero_iters_is_seed_assignment(vectors):
    from scrapy_products_tracker_spark.functions.similarity import (
        ivf_assign,
        ivf_centroids_first,
        kmeans_refine,
    )

    df, _ = vectors
    cents, assign = kmeans_refine(df, n_cells=4, iters=0)
    base = ivf_assign(df, ivf_centroids_first(df, 4))
    a = {r["vec_id"]: r["cell_id"] for r in assign.collect()}
    b = {r["vec_id"]: r["cell_id"] for r in base.collect()}
    assert a == b and set(cents) == set(range(4))


def test_pq_encode_and_adc(spark):
    """PQ: codebook donors encode to their own code with ADC 0 against
    themselves; ADC equals a pure-Python recompute on int-quantized
    vectors (exact int64 arithmetic, no float folds)."""
    import numpy as np

    from scrapy_products_tracker_spark.functions.similarity import (
        pq_ann_topk,
        pq_codebooks,
        pq_encode,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_codebooks(df, m=2, k=4)
    assert len(cb) == 2 and len(cb[0]) == 4 and len(cb[0][0]) == 4
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, cb).collect()}
    # donor vectors reconstruct exactly -> their own code, ADC 0 vs self
    for donor in range(4):
        assert codes[donor] == [donor, donor]
    top = pq_ann_topk(df, [float(x) for x in vecs[2]], cb, topk=5).collect()
    assert top[0]["vec_id"] == 2 and top[0]["adc_units"] == 0

    # python recompute of the full ADC ranking
    iv = np.rint(vecs * 1000).astype(np.int64)
    books = [np.array(cb[s], dtype=np.int64) for s in range(2)]
    def enc(v):
        return [int(np.argmin(((books[s] - v[s * 4 : (s + 1) * 4]) ** 2).sum(1)))
                for s in range(2)]
    q = iv[2]
    luts = [((books[s] - q[s * 4 : (s + 1) * 4]) ** 2).sum(1) for s in range(2)]
    want = sorted(
        (int(sum(luts[s][c] for s, c in enumerate(enc(v)))), i)
        for i, v in enumerate(iv)
    )[:5]
    got = [(r["adc_units"], r["vec_id"]) for r in
           pq_ann_topk(df, [float(x) for x in vecs[2]], cb, topk=5).collect()]
    assert got == want


def test_pq_plan_shape(spark):
    """Encode is row-local (zero Exchange before the top-k); the ADC
    tail is TakeOrderedAndProject, and neither touches Python."""
    import numpy as np

    from scrapy_products_tracker_spark.functions.similarity import (
        pq_ann_topk,
        pq_codebooks,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 8)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_codebooks(df, m=2, k=4)
    plan = (
        pq_ann_topk(df, [float(x) for x in vecs[0]], cb, topk=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan and "CartesianProduct" not in plan


def test_ivfpq_probe_all_equals_pq(spark):
    """n_probe = n_cells -> the coarse stage prunes nothing, so IVFPQ
    must equal plain PQ ADC exactly (the probe-all==bruteforce style
    equivalence the IVF-Flat tests use)."""
    import numpy as np

    from scrapy_products_tracker_spark.functions.similarity import (
        ann_topk_ivfpq,
        pq_ann_topk,
        pq_codebooks,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 8)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_codebooks(df, m=2, k=4)
    q = [float(x) for x in vecs[5]]
    full = [(r["vec_id"], r["adc_units"]) for r in pq_ann_topk(df, q, cb, topk=8).collect()]
    allprobe = [
        (r["vec_id"], r["adc_units"])
        for r in ann_topk_ivfpq(df, q, cb, k=8, n_cells=4, n_probe=4).collect()
    ]
    assert allprobe == full
    # pruned probe returns a subset of corpus ids with sane ADC order
    pruned = ann_topk_ivfpq(df, q, cb, k=8, n_cells=4, n_probe=1).collect()
    adcs = [r["adc_units"] for r in pruned]
    assert adcs == sorted(adcs) and 0 < len(pruned) <= 8


def test_ivf_trained_centroids_probe_matches_numpy(vectors):
    """Trained-quantizer probe path: ann_topk_ivf(centroids=dict from
    kmeans_refine) must equal a from-scratch numpy Lloyd's (2 iters,
    round-6 per iteration) + probe + brute-force inside probed cells."""
    from scrapy_products_tracker_spark.functions.similarity import kmeans_refine

    df, vecs = vectors
    corpus = df.filter(F.col("vec_id") > 0)
    q = vecs[0]

    # numpy replica of kmeans_refine(n_cells=8, iters=2)
    cents = {c: vecs[c].copy() for c in range(1, 9)}
    for _ in range(2):
        assign = {
            vid: -max((round(_np_cos(vecs[vid], cents[c]), 6), -c) for c in cents)[1]
            for vid in range(1, 120)
        }
        for c in cents:
            members = [vecs[v] for v, cc in assign.items() if cc == c]
            if members:
                cents[c] = np.round(np.mean(members, axis=0), 6)
    got_cents, _ = kmeans_refine(corpus, n_cells=8, iters=2)
    for c in cents:
        assert np.allclose(got_cents[c], cents[c], atol=1e-9), f"cell {c}"

    assign = {
        vid: -max((round(_np_cos(vecs[vid], cents[c]), 6), -c) for c in cents)[1]
        for vid in range(1, 120)
    }
    probed = [
        -c for _, c in sorted(
            ((round(_np_cos(q, cents[c]), 6), -c) for c in cents), reverse=True
        )[:3]
    ]
    cand = [v for v, c in assign.items() if c in probed]
    want = sorted(
        ((round(_np_cos(vecs[v], q), 6), -v) for v in cand), reverse=True
    )[:5]
    want = [(-nv, s) for s, nv in want]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ann_topk_ivf(
            corpus, q.tolist(), k=5, n_probe=3, centroids=got_cents
        ).collect()
    ]
    assert got == want


def test_ivf_trained_centroids_df_equals_dict(vectors):
    """centroids= accepts either kmeans_refine's dict or a
    (cell_id, cvec) DataFrame — identical results."""
    from scrapy_products_tracker_spark.functions.similarity import kmeans_refine

    df, vecs = vectors
    corpus = df.filter(F.col("vec_id") > 0)
    cents, _ = kmeans_refine(corpus, n_cells=8, iters=1)
    cdf = corpus.sparkSession.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in cents.items()],
        "cell_id long, cvec array<double>",
    )
    q = vecs[0].tolist()
    a = [(r["vec_id"], r["cosine"]) for r in ann_topk_ivf(corpus, q, k=5, n_probe=3, centroids=cents).collect()]
    b = [(r["vec_id"], r["cosine"]) for r in ann_topk_ivf(corpus, q, k=5, n_probe=3, centroids=cdf).collect()]
    assert a == b
