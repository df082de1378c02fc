"""PageRank frontier priority, bigram-LM scoring, SemDeDup — each
checked against an independent pure-Python implementation."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.dedup import semdedup
from scrapy_products_tracker_spark.functions.graph import (
    hits_units,
    opic_units,
    pagerank_priority,
    pagerank_units,
)
from scrapy_products_tracker_spark.functions.text import lm_bigram_scores


# --- independent oracle: integer fixed-point PageRank ---------------------


def py_pagerank(edges, nodes, iters=3, damping_pct=85, unit=1_000_000):
    deg = Counter(s for s, _ in edges)
    r = {n: unit for n in nodes}
    teleport = (unit * (100 - damping_pct)) // 100
    for _ in range(iters):
        nxt = {n: teleport for n in nodes}
        for s, d in edges:
            nxt[d] += (r[s] * damping_pct) // (100 * deg[s])
        r = nxt
    return r


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 0), (4, 4),
]
NODES = [0, 1, 2, 3, 4, 5]  # 5 has no edges at all (teleport-only rank)


def test_pagerank_matches_pure_python(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in NODES], "node long")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank_units(e, nodes=n, iters=3).collect()
    }
    assert got == py_pagerank(EDGES, NODES, iters=3)


def test_pagerank_deterministic_across_partitionings(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    a = pagerank_units(e.repartition(7), iters=2).collect()
    b = pagerank_units(e.coalesce(1), iters=2).collect()
    assert sorted((r["node"], r["rank_units"]) for r in a) == sorted(
        (r["node"], r["rank_units"]) for r in b
    )


def test_pagerank_zero_iters_is_uniform(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    ranks = pagerank_units(e, iters=0).collect()
    assert {r["rank_units"] for r in ranks} == {1_000_000}


# --- independent oracle: synchronous OPIC cash flow -----------------------


def py_opic(edges, nodes, iters=3, unit=1_000_000):
    deg = Counter(s for s, _ in edges)
    cash = {n: unit for n in nodes}
    hist = {n: 0 for n in nodes}
    for _ in range(iters):
        nxt = {n: 0 for n in nodes}
        for s, d in edges:
            nxt[d] += cash[s] // deg[s]
        for n in nodes:
            hist[n] += cash[n]
        cash = nxt
    return {n: (cash[n], hist[n], cash[n] + hist[n]) for n in nodes}


def test_opic_matches_pure_python(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in NODES], "node long")
    got = {
        r["node"]: (r["cash_units"], r["hist_units"], r["opic_units"])
        for r in opic_units(e, nodes=n, iters=3).collect()
    }
    assert got == py_opic(EDGES, NODES, iters=3)


def test_opic_deterministic_across_partitionings(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    a = opic_units(e.repartition(7), iters=2).collect()
    b = opic_units(e.coalesce(1), iters=2).collect()
    assert sorted((r["node"], r["opic_units"]) for r in a) == sorted(
        (r["node"], r["opic_units"]) for r in b
    )


def test_opic_zero_iters_and_dangling(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in NODES], "node long")
    r0 = {r["node"]: r for r in opic_units(e, nodes=n, iters=0).collect()}
    assert all(
        (v["cash_units"], v["hist_units"], v["opic_units"]) == (1_000_000, 0, 1_000_000)
        for v in r0.values()
    )
    # node 5 has no edges at all: its cash banks once, then drains —
    # opic stays exactly unit (history keeps the record).
    r2 = {r["node"]: r for r in opic_units(e, nodes=n, iters=2).collect()}
    assert r2[5]["cash_units"] == 0
    assert r2[5]["opic_units"] == 1_000_000


def py_hits(edges, nodes, iters=2, unit=1_000_000):
    hub = {n: unit for n in nodes}
    auth = {n: unit for n in nodes}
    for _ in range(iters):
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[d] += hub[s]
        div = max(1, max(raw.values()) // unit)
        auth = {n: v // div for n, v in raw.items()}
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[s] += auth[d]
        div = max(1, max(raw.values()) // unit)
        hub = {n: v // div for n, v in raw.items()}
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_pure_python(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in NODES], "node long")
    got = {
        r["node"]: (r["hub_units"], r["auth_units"])
        for r in hits_units(e, nodes=n, iters=2).collect()
    }
    assert got == py_hits(EDGES, NODES, iters=2)


def test_hits_deterministic_across_partitionings(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    a = hits_units(e.repartition(7), iters=2).collect()
    b = hits_units(e.coalesce(1), iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hits_renormalization_bounds_scores(spark):
    # a star graph: one hub pointing at k authorities; after renorm the
    # hub score is ~unit (not unit*k growing per iteration — the
    # overflow-safety property the int renorm exists for).
    k = 50
    e = spark.createDataFrame([(0, i) for i in range(1, k + 1)], "src long, dst long")
    out = {r["node"]: (r["hub_units"], r["auth_units"])
           for r in hits_units(e, iters=3).collect()}
    assert out[0][0] <= 2_000_000  # hub bounded by ~unit, not unit*k^3
    assert all(out[i][1] == out[1][1] for i in range(2, k + 1))  # symmetric auths


def test_pagerank_priority_join(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    frontier = spark.createDataFrame(
        [(2, "https://a/x"), (99, "https://a/unranked")], "url_hash long, url string"
    )
    out = {r["url_hash"]: r["priority"] for r in
           pagerank_priority(frontier, e, iters=3).collect()}
    expect = py_pagerank(EDGES, sorted({x for ed in EDGES for x in ed}), iters=3)
    assert out[2] == -expect[2] < 0  # ranked page claims first (ascending key)
    assert out[99] == 0  # unranked URL sorts behind every ranked one


def test_pagerank_rejects_bad_params(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_units(e, damping_pct=101)
    with pytest.raises(ValueError):
        pagerank_units(e, iters=-1)


# --- independent oracle: add-1/2 bigram LM ---------------------------------


def py_lm_scores(texts, vocab_size, unit=1_000_000):
    toks = {i: t.lower().strip().split() for i, t in texts.items() if t and t.strip()}
    uni = Counter(w for ws in toks.values() for w in ws)
    vocab = set(w for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size])
    mapped = {i: [w if w in vocab else "<unk>" for w in ws] for i, ws in toks.items()}
    bg = {i: list(zip(["<s>"] + ws[:-1], ws)) for i, ws in mapped.items()}
    c12 = Counter(p for ps in bg.values() for p in ps)
    c1 = Counter(p[0] for ps in bg.values() for p in ps)
    out = {}
    for i, ps in bg.items():
        u = sum(
            int(_round_half_up(math.log((c12[p] + 0.5) / (c1[p[0]] + 0.5 * (vocab_size + 1))) * unit))
            for p in ps
        )
        out[i] = (len(ps), -u, round(-u / unit / len(ps), 6))
    return out


def _round_half_up(x):
    import decimal

    return decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_UP)


def test_lm_bigram_matches_pure_python(spark):
    texts = {
        0: "the cat sat on the mat",
        1: "the cat sat",
        2: "a rare unseen zebra sentence",
        3: "the the the",
        4: None,
        5: "   ",
        6: "one",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc"]: (r["n_bigrams"], r["nll_unats"], r["avg_nll"])
        for r in lm_bigram_scores(df, vocab_size=4).collect()
    }
    assert got == py_lm_scores(texts, vocab_size=4)
    assert 4 not in got and 5 not in got  # NULL/blank docs carry no score


def test_lm_bigram_rejects_bad_vocab(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_bigram_scores(df, vocab_size=0)


# --- SemDeDup --------------------------------------------------------------


def _planted(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0 -> loser
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.995, 0.02]),   # near-dup of 2 -> loser
        (4, [0.0, 0.0, 1.0]),      # unique
        (5, [0.7, 0.7, 0.14]),     # similar-ish but below tau
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_drops_planted_neardups(spark):
    e = _planted(spark)
    survivors, losers = semdedup(e, n_cells=3, iters=1, tau=0.98)
    kept = {r["vec_id"] for r in survivors.collect()}
    dropped = {r["vec_id"] for r in losers.collect()}
    assert dropped == {1, 3}
    assert kept == {0, 2, 4, 5}


def test_semdedup_lower_id_wins_and_tau_guard(spark):
    e = _planted(spark)
    survivors, _ = semdedup(e, n_cells=2, iters=1, tau=0.98)
    kept = {r["vec_id"] for r in survivors.collect()}
    assert 0 in kept and 2 in kept  # keepers are the min-id representatives
    with pytest.raises(ValueError):
        semdedup(e, tau=1.5)


def test_semdedup_no_cartesian_plan(spark):
    e = _planted(spark)
    survivors, losers = semdedup(e, n_cells=2, iters=1, tau=0.98)
    plan = losers._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_hot_cell_bound_enforced(spark):
    # adversarial skew: 90% of vectors IDENTICAL (one dense cluster) —
    # k-means cannot split ties, so the guard must fall through to the
    # deterministic rank-split and STILL respect the bound: without it
    # one cell holds 450 rows -> a 450²-pair task (10^15 pairs at 10^9
    # vectors). The bound caps every cell, hence every pair-join task.
    import warnings as _w

    from scrapy_products_tracker_spark.dedup import bounded_cells

    rows = [(i, [1.0, 0.0, 0.0]) for i in range(450)] + [
        (450 + i, [0.0, float(i % 7 + 1), float(i % 3)]) for i in range(50)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        assign = bounded_cells(
            e, n_cells=4, iters=1, max_cell_rows=100, max_split_depth=2
        )
        sizes = [
            int(r["n"])
            for r in assign.groupBy("cell_id").agg(F.count("*").alias("n")).collect()
        ]
    assert max(sizes) <= 100  # the hard bound holds
    assert sum(sizes) == 500  # no row dropped (never a silent cap)
    assert any("rank-split" in str(w.message) for w in rec)  # logged, not silent
    # ids stay unique per row
    assert assign.select("vec_id").distinct().count() == 500
    # and the bounded path still runs end-to-end through semdedup
    surv, losers = semdedup(
        e, n_cells=4, iters=1, tau=0.98, max_cell_rows=100, max_split_depth=2
    )
    assert surv.count() + losers.count() == 500


def test_semdedup_bound_noop_when_cells_small(spark):
    # a bound larger than every cell must leave the assignment (and the
    # dedup result) byte-identical to the unbounded path
    from scrapy_products_tracker_spark.dedup import bounded_cells

    e = _planted(spark)
    a0 = sorted(map(tuple, bounded_cells(e, n_cells=3, iters=1).collect()))
    a1 = sorted(
        map(
            tuple,
            bounded_cells(e, n_cells=3, iters=1, max_cell_rows=1000).collect(),
        )
    )
    assert a0 == a1
    s0, l0 = semdedup(e, n_cells=3, iters=1, tau=0.98)
    s1, l1 = semdedup(e, n_cells=3, iters=1, tau=0.98, max_cell_rows=1000)
    assert sorted(map(tuple, s0.collect())) == sorted(map(tuple, s1.collect()))
    assert sorted(map(tuple, l0.collect())) == sorted(map(tuple, l1.collect()))


# --- pointer-jumping alias resolution (crawl/alias.py) ---------------------


def py_resolve(edges, cap):
    f = {}
    for s, d in edges:
        f[s] = min(d, f.get(s, d))
    out = {}
    for s in f:
        cur, hops = f[s], 1
        while cur in f and hops < cap:
            cur, hops = f[cur], hops + 1
        out[s] = cur if cur not in f else None
    return out


def test_alias_resolution_chain_cycle_dup(spark):
    from scrapy_products_tracker_spark.crawl.alias import resolve_aliases

    edges = (
        [(i, i + 1) for i in range(64)]      # chain 0..64: 64 hops from 0
        + [(100, 101), (101, 102), (102, 100)]  # cycle
        + [(200, 250), (200, 210)]           # duplicate src -> min dst
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.src: r.canonical for r in resolve_aliases(e, max_doubling=6).collect()}
    assert got == py_resolve(edges, cap=64)
    assert got[0] == 64 and got[63] == 64          # full chain resolved
    assert got[100] is None and got[102] is None   # cycle unresolved
    assert got[200] == 210                         # min-dst determinism
    # halving the doubling budget (32-hop bound) strands the chain head
    # but not its tail
    got32 = {r.src: r.canonical for r in resolve_aliases(e, max_doubling=5).collect()}
    assert got32[0] is None and got32[40] == 64
    assert got32 == py_resolve(edges, cap=32)


def test_alias_resolution_plan_and_guard(spark):
    import pytest

    from scrapy_products_tracker_spark.crawl.alias import resolve_aliases

    with pytest.raises(ValueError):
        resolve_aliases(None, max_doubling=-1)
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    df = resolve_aliases(e, max_doubling=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert {r.src: (r.canonical, r.resolved) for r in df.collect()} == {
        1: (3, 1),
        2: (3, 1),
    }
