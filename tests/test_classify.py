"""Naive-Bayes classifier (functions/classify.py): exact parity with an
independent pure-Python NB, tie-break determinism, empty-doc prior
fallback, and plan shape (broadcast model, no cartesian blowup)."""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions.classify import nb_classify, nb_score, nb_train
from scrapy_products_tracker_spark.functions.hashing import xxhash64_str

DOC_SCHEMA = "doc_id long, lang string, text string"


def _round_half_up(x: float) -> int:
    # Spark F.round / DuckDB round are HALF_UP (away from zero);
    # python round() is banker's — replicate the engines' behavior
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _python_nb(rows, is_train, B=64, unit=10**6):
    """Independent dict-based NB (floats + half-up fixed-point), same
    tokenizer (str.split) and pinned pure-Python xxhash64 buckets."""
    train = [r for r in rows if is_train(r)]
    n_docs = Counter(r[1] for r in train)
    nd_tot = sum(n_docs.values())
    tok_counts = defaultdict(Counter)
    for _, lang, text in train:
        for tok in text.split() if isinstance(text, str) else []:
            tok_counts[lang][xxhash64_str(tok) % B] += 1
    labels = sorted(n_docs)
    w = {
        (lab, b): _round_half_up(
            unit
            * math.log(
                (tok_counts[lab].get(b, 0) + 1)
                / (sum(tok_counts[lab].values()) + B)
            )
        )
        for lab in labels
        for b in range(B)
    }
    prior = {
        lab: _round_half_up(unit * math.log(n_docs[lab] / nd_tot)) for lab in labels
    }
    out = {}
    for doc_id, _, text in rows:
        scores = {
            lab: prior[lab]
            + sum(
                w[(lab, xxhash64_str(tok) % B)]
                for tok in (text.split() if isinstance(text, str) else [])
            )
            for lab in labels
        }
        lab, s = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[doc_id] = (lab, s)
    return out


def test_nb_separable_vocab(spark):
    rows = [
        (0, "en", "the cat sat on the mat"),
        (2, "en", "the dog ate the food"),
        (4, "fr", "le chat est sur le tapis"),
        (6, "fr", "le chien mange le pain"),
        # held out (odd ids): same vocab families
        (1, "en", "the cat ate the mat"),
        (3, "fr", "le chien est sur le pain"),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        r["id"]: r["pred_label"]
        for r in nb_classify(df, F.col("doc_id") % 2 == 0, "lang", n_buckets=64).collect()
    }
    assert got[1] == "en" and got[3] == "fr"
    # train rows classify to their own class too (separable vocab)
    assert all(got[i] == lang for i, lang, _ in rows[:4])


def test_nb_matches_pure_python(spark):
    rows = [
        (0, "en", "the quick brown fox the fox"),
        (1, "en", "shared token alpha"),
        (2, "xx", "zork blit quux flarp zork"),
        (3, "xx", "shared token beta"),
        (4, "en", None),  # token-less: prior-only score
        (5, "zz", "singleton class doc"),
        (6, "en", ""),
        (7, "xx", "the zork"),  # mixed vocab
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    exp = _python_nb(rows, lambda r: r[0] % 2 == 0, B=64)
    got = {
        r["id"]: (r["pred_label"], r["score_unats"])
        for r in nb_classify(df, F.col("doc_id") % 2 == 0, "lang", n_buckets=64).collect()
    }
    assert got == exp


def test_nb_empty_doc_predicts_max_prior(spark):
    rows = [
        (0, "big", "aa bb"),
        (1, "big", "cc dd"),
        (2, "big", "ee ff"),
        (3, "sml", "gg hh"),
        (9, None, None),  # scored only (filter excludes NULL label rows)
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    w, p = nb_train(df.filter(F.col("lang").isNotNull()), "lang", n_buckets=32)
    got = {r["id"]: r for r in nb_score(df, w, p, n_buckets=32).collect()}
    # 3 "big" docs vs 1 "sml": token-less doc 9 takes the max prior
    assert got[9]["pred_label"] == "big"
    assert got[9]["score_unats"] == _round_half_up(10**6 * math.log(3 / 4))


def test_nb_tiebreak_label_asc(spark):
    # identical texts per class -> identical weights and priors ->
    # every score ties exactly -> lexicographically smallest label wins
    rows = [(0, "b", "x y"), (1, "a", "x y"), (2, None, "x x y")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    w, p = nb_train(df.filter(F.col("lang").isNotNull()), "lang", n_buckets=16)
    got = {r["id"]: r["pred_label"] for r in nb_score(df, w, p, n_buckets=16).collect()}
    assert got == {0: "a", 1: "a", 2: "a"}


VEC_SCHEMA = "vec_id long, label int, embedding array<float>"


def _python_prototype(rows, is_train, is_pos, unit=10**5):
    """Independent replica: fixed-point, per-dim integer sums, one
    float division per dim, exact integer dot products."""
    fixed = {
        vid: [_round_half_up(float(x) * unit) for x in vec] for vid, _, vec in rows
    }
    dim = max(len(v) for v in fixed.values())
    sp, sn, np_, nn = [0] * dim, [0] * dim, 0, 0
    for vid, lab, _ in rows:
        if not is_train(vid):
            continue
        tgt = is_pos(lab)
        np_, nn = np_ + tgt, nn + (not tgt)
        for d, v in enumerate(fixed[vid]):
            (sp if tgt else sn)[d] += v
    w = [
        _round_half_up((sp[d] / np_ if np_ else 0.0) - (sn[d] / nn if nn else 0.0))
        for d in range(dim)
    ]
    return {vid: sum(v * wv for v, wv in zip(fixed[vid], w)) for vid in fixed}


def test_prototype_matches_pure_python(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (
            i,
            i % 3,
            [rnd.uniform(-0.6, 0.6) + (0.3 if i % 3 == 1 else -0.1) for _ in range(8)],
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    exp = _python_prototype(
        [(i, l, v) for i, l, v in rows],
        is_train=lambda vid: vid % 2 == 0,
        is_pos=lambda lab: lab % 2 == 1,
    )
    from scrapy_products_tracker_spark.functions.classify import (
        prototype_direction,
        prototype_score,
    )

    w = prototype_direction(
        df.filter(F.col("vec_id") % 2 == 0), F.col("label") % 2 == 1
    )
    got = {r["id"]: r["score_fixed"] for r in prototype_score(df, w).collect()}
    # float32 storage: the python replica must quantize through float32
    # too — createDataFrame already did, so regenerate from the round trip
    back = {r["vec_id"]: r["embedding"] for r in df.collect()}
    exp32 = _python_prototype(
        [(i, l, back[i]) for i, l, _ in rows],
        is_train=lambda vid: vid % 2 == 0,
        is_pos=lambda lab: lab % 2 == 1,
    )
    assert got == exp32
    assert set(got) == set(exp)  # same ids either way


def test_prototype_separates_classes(spark):
    # class 1 shifted +0.4 on every dim: direction must classify both
    # train and held-out vectors correctly
    import random

    rnd = random.Random(11)
    rows = [
        (i, i % 2, [rnd.uniform(-0.1, 0.1) + (0.4 if i % 2 else -0.4) for _ in range(6)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    from scrapy_products_tracker_spark.functions.classify import (
        prototype_direction,
        prototype_score,
    )

    w = prototype_direction(df.filter(F.col("vec_id") < 20), F.col("label") == 1)
    got = {r["id"]: r["score_fixed"] for r in prototype_score(df, w).collect()}
    assert all((got[i] > 0) == (i % 2 == 1) for i, _, _ in rows)


def test_prototype_single_class_degrades(spark):
    # all-positive training: negative mean is 0, direction = positive
    # mean; no crash, no NULLs
    rows = [(i, 1, [0.5] * 4) for i in range(4)]
    df = spark.createDataFrame(rows, VEC_SCHEMA)
    from scrapy_products_tracker_spark.functions.classify import (
        prototype_direction,
        prototype_score,
    )

    w = prototype_direction(df, F.col("label") == 1)
    got = prototype_score(df, w).collect()
    assert all(r["score_fixed"] == 4 * 50_000 * 50_000 for r in got)


def test_curate_corpus_classifier_gate(spark):
    from scrapy_products_tracker_spark.dedup.text_corpus import curate_corpus
    from scrapy_products_tracker_spark.functions.classify import nb_score, nb_train

    rows = [
        (1, "wiki style prose with careful structure and citations everywhere"),
        (2, "wiki style prose with careful notes and citations throughout"),
        (3, "buy now cheap deals click buy now cheap deals click again"),
        (4, "discount codes click cheap deals buy now discount codes wow"),
        (5, "style prose with careful notes and citations everywhere too"),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA.replace("lang string, ", "")).selectExpr(
        "doc_id", "text"
    )
    target = F.col("text").contains("wiki")
    kw = dict(min_tokens=5, min_quality=0.0, threshold=0.99)

    base_ids = {r["doc_id"] for r in curate_corpus(df, **kw).collect()}
    # a floor margin keeps exactly the no-classifier set
    lo = {
        r["doc_id"]
        for r in curate_corpus(
            df, classifier_target=target, classifier_margin_unats=-(1 << 61), **kw
        ).collect()
    }
    assert lo == base_ids
    # an unreachable margin drops everything
    hi = curate_corpus(
        df, classifier_target=target, classifier_margin_unats=1 << 61, **kw
    ).count()
    assert hi == 0
    # margin 0 == manual composition of the same primitives
    labeled = df.withColumn("_cls", F.when(target, "t").otherwise("b"))
    w, p = nb_train(labeled, "_cls", n_buckets=512)
    grid = nb_score(df, w, p, all_scores=True, n_buckets=512).toPandas()
    piv = grid.pivot(index="id", columns="label", values="score_unats")
    exp = set(piv.index[piv["t"] - piv["b"] >= 0])
    got = {
        r["doc_id"]
        for r in curate_corpus(
            df, classifier_target=target, classifier_margin_unats=0, **kw
        ).collect()
    }
    assert got == exp
    # the spam-vocab rows fall below the margin; doc 5 (target vocab,
    # no marker word) is rescued by what it says
    assert {3, 4}.isdisjoint(got) and 5 in got


def test_nb_plan_shape(spark):
    rows = [(i, "en" if i % 3 else "fr", f"tok{i} tok{i % 5}") for i in range(30)]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = nb_classify(df, F.col("doc_id") % 2 == 0, "lang", n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # model joins broadcast; the only nested-loop is the tiny
    # docs x priors / labels x buckets fan-out — never a cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# --- Cavnar-Trenkle n-gram lang-ID (classify.ct_train/ct_classify) --------


def test_ct_profiles_and_classification(spark):
    from scrapy_products_tracker_spark.functions.classify import ct_classify, ct_train

    train = spark.createDataFrame(
        [
            (1, "aaa aaa aab aaa", "aa"),
            (2, "zzz zzy zzz zzz", "zz"),
        ],
        "doc_id long, text string, lang string",
    )
    prof = ct_train(train, top_k=5)
    rows = {(r.label, r.gram): r.rank for r in prof.collect()}
    # 'aaa' and '_aa' both occur 3x; the count tie breaks gram-asc
    assert rows[("aa", "_aa")] == 1 and rows[("aa", "aaa")] == 2
    assert all(rk <= 5 for rk in rows.values())

    test = spark.createDataFrame(
        [(10, "aaa aab aaa"), (11, "zzy zzz zzz"), (12, None)],
        "doc_id long, text string",
    )
    got = {r.id: (r.label, r.distance) for r in ct_classify(test, prof, top_k=5).collect()}
    assert got[10][0] == "aa"
    assert got[11][0] == "zz"
    # NULL/empty doc: empty gram sum -> distance 0, lowest label
    assert got[12] == ("aa", 0)


def test_ct_out_of_place_penalty_and_guards(spark):
    import pytest

    from scrapy_products_tracker_spark.functions.classify import ct_classify, ct_train

    train = spark.createDataFrame(
        [(1, "abcabcabc", "x")], "doc_id long, text string, lang string"
    )
    prof = ct_train(train, top_k=3)
    # a doc sharing no grams with the profile scores
    # n_distinct_doc_grams x penalty: 'zzzzz' has ONE distinct gram
    test = spark.createDataFrame([(7, "zzzzz")], "doc_id long, text string")
    r = ct_classify(test, prof, top_k=3).collect()[0]
    assert r.label == "x" and r.distance == 1 * 3
    with pytest.raises(ValueError):
        ct_train(train, top_k=0)
