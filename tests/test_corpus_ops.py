"""Training-data corpus operators: Gopher repetition filters,
paragraph-level exact dedup, and the deterministic stratified split.
Correctness is pinned against tiny hand-computable fixtures and a
pure-Python reference; plan tests pin the at-scale shuffle shape
(repetition and split are ZERO-exchange row-local algebra; paragraph
dedup pays exactly one fp-keyed exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions.text import (
    hash_split,
    ngram_repetition_stats,
    paragraph_dedup,
    paragraph_dedup_stats,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_stats_exact(spark):
    rows = [
        (1, "a b a b a b"),          # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
        (2, "x y z w"),              # all distinct
        (3, "q"),                    # no bigrams -> NULL fracs
        (4, None),                   # NULL text -> 0 words, NULL fracs
        (5, "  "),                   # whitespace-only -> 0 words
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in ngram_repetition_stats(df).collect()}
    r1 = got[1]
    assert r1["n_words"] == 6
    assert r1["dup_bigram_frac"] == round(1 - 2 / 5, 6)
    assert r1["dup_trigram_frac"] == round(1 - 2 / 4, 6)  # aba bab aba bab
    assert r1["top_bigram_frac"] == round(3 / 5, 6)  # 'a b' x3
    assert r1["repetitive"] is True
    r2 = got[2]
    assert r2["dup_bigram_frac"] == 0.0 and r2["top_bigram_frac"] == round(1 / 3, 6)
    assert r2["repetitive"] is True  # top bigram 1/3 > 0.2 on a tiny doc
    for d in (3, 4, 5):
        assert got[d]["dup_bigram_frac"] is None and got[d]["top_bigram_frac"] is None
        assert got[d]["repetitive"] is False
    assert got[3]["n_words"] == 1 and got[4]["n_words"] == 0 and got[5]["n_words"] == 0


def test_repetition_matches_python_reference(spark):
    """Property: the column-algebra stats equal a brute-force Python
    computation on word-soup docs (same texts the corpus fixtures use)."""
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta"]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in ngram_repetition_stats(df).collect()}
    for i, text in rows:
        w = text.split() if text.strip() else []
        for n, col in ((2, "dup_bigram_frac"), (3, "dup_trigram_frac")):
            grams = [" ".join(w[j : j + n]) for j in range(len(w) - n + 1)]
            exp = round(1 - len(set(grams)) / len(grams), 6) if grams else None
            assert got[i][col] == exp, (i, col)
        bi = [" ".join(w[j : j + 2]) for j in range(len(w) - 1)]
        exp_top = round(max(bi.count(g) for g in set(bi)) / len(bi), 6) if bi else None
        assert got[i]["top_bigram_frac"] == exp_top, i


def test_repetition_plan_zero_exchange(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    assert "Exchange" not in _plan(ngram_repetition_stats(df))


def test_paragraph_dedup_first_wins(spark):
    rows = [
        (1, "Alpha one.\n\nShared para.\n\nBeta."),
        (2, "Shared para.\n\nGamma two."),
        (3, "shared  PARA.\n\nGamma two."),  # normalization: same fp as doc 2's
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    marked = {(r["doc"], r["pos"]): r["is_dup"] for r in paragraph_dedup(df).collect()}
    assert marked[(1, 1)] is False  # first 'shared para.' wins (doc 1, pos 1)
    assert marked[(2, 0)] is True
    assert marked[(3, 0)] is False  # 'shared  PARA.' trims/lowers but inner spaces differ
    assert marked[(3, 1)] is True  # 'gamma two.' first seen in doc 2
    stats = {r["doc_id"]: r for r in paragraph_dedup_stats(df).collect()}
    assert stats[1]["n_paras"] == 3 and stats[1]["n_dup_paras"] == 0
    assert stats[2]["n_dup_paras"] == 1 and stats[2]["dup_para_frac"] == 0.5
    assert stats[4]["n_paras"] == 0 and stats[4]["dup_para_frac"] is None
    assert stats[5]["n_paras"] == 0


def test_paragraph_dedup_single_exchange(spark):
    df = spark.createDataFrame([(1, "a\n\nb")], "doc_id int, text string")
    plan = _plan(paragraph_dedup(df))
    assert plan.count("Exchange") == 1  # only the fp-keyed window shuffle
    assert "CartesianProduct" not in plan


def test_hash_split_deterministic_and_stratified(spark):
    df = spark.range(0, 20_000).select(F.col("id").alias("doc_id"))
    s1 = hash_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert abs(counts["train"] / 20_000 - 0.98) < 0.01
    # deterministic: re-run equals itself row for row
    a = dict(s1.select("doc_id", "split").collect())
    b = dict(hash_split(df, "doc_id").select("doc_id", "split").collect())
    assert a == b
    # salting re-rolls assignments
    c = dict(hash_split(df, "doc_id", salt="v2").select("doc_id", "split").collect())
    assert a != c
    # zero-shuffle row-local plan
    assert "Exchange" not in _plan(hash_split(df, "doc_id"))


def test_bm25_matches_python_reference(spark):
    """BM25 scores equal a textbook Python implementation (same idf
    form), including length normalization and absent-term idf."""
    import math

    from scrapy_products_tracker_spark.functions.text import bm25_topk

    docs = {
        1: "spark join shuffle join window",
        2: "window window window small",
        3: "nothing relevant here at all",
        4: "join",
        5: None,
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    terms, k1, b = ["join", "window"], 1.2, 0.75
    got = {r["doc"]: r["score"] for r in bm25_topk(df, terms, k=10).collect()}

    toks = {d: (t.lower().split() if t else None) for d, t in docs.items()}
    dls = {d: (len(w) if w is not None else 0) for d, w in toks.items()}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    exp = {}
    for d, w in toks.items():
        if w is None:
            continue
        s = 0.0
        for t in terms:
            tf = w.count(t)
            dfreq = sum(1 for ww in toks.values() if ww and t in ww)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
        if round(s, 6) > 0:
            exp[d] = round(s, 6)
    assert got == exp
    plan = _plan(bm25_topk(df, terms))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bm25_rejects_empty_query(spark):
    import pytest

    from scrapy_products_tracker_spark.functions.text import bm25_topk

    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])


def test_decontaminate_planted_overlap(spark):
    from scrapy_products_tracker_spark.functions.text import decontaminate_ngram_overlap

    shared = "one two three four five six seven eight nine ten"  # 3 distinct 8-grams
    train = spark.createDataFrame(
        [
            (1, f"prefix words {shared} suffix words"),
            (2, "completely different content with no overlap whatsoever at all here"),
            (3, None),
        ],
        "doc_id int, text string",
    )
    ev = spark.createDataFrame([(100, shared), (101, "unrelated eval probe text")],
                               "doc_id int, text string")
    got = {(r["train_doc"], r["eval_doc"]): r["n_shared"]
           for r in decontaminate_ngram_overlap(train, ev, n=8, min_shared=3).collect()}
    assert got == {(1, 100): 3}
    # below threshold -> empty
    assert decontaminate_ngram_overlap(train, ev, n=8, min_shared=4).count() == 0
    # eval side broadcast: training grams never shuffle
    plan = _plan(decontaminate_ngram_overlap(train, ev, n=8, min_shared=3))
    assert "BroadcastHashJoin" in plan


def test_hash_split_rejects_bad_weights(spark):
    import pytest

    df = spark.range(1).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", weights={"train": 0.5, "valid": 0.1})


# --- script_profile / corpus_stats ------------------------------------------


def test_script_profile_exact(spark):
    from scrapy_products_tracker_spark.functions.text import script_profile

    rows = [
        (1, "hello world"),
        (2, "Привет мир"),
        (3, "γειά σου"),
        (4, "مرحبا"),
        (5, "你好 こんにちは 안녕"),
        (6, "123 %% !!"),        # no scripted codepoints
        (7, None),               # NULL text
        (8, "mixa Привет hi"),   # latin 6, cyrillic 6 -> tie -> latin (first)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in script_profile(df).collect()}
    assert got[1]["latin_chars"] == 10 and got[1]["dominant_script"] == "latin"
    assert got[1]["script_conf_milli"] == 1000
    assert got[2]["cyrillic_chars"] == 9 and got[2]["dominant_script"] == "cyrillic"
    assert got[3]["dominant_script"] == "greek"
    assert got[4]["dominant_script"] == "arabic"
    assert got[5]["cjk_chars"] == 9 and got[5]["dominant_script"] == "cjk"
    for d in (6, 7):
        assert got[d]["dominant_script"] is None
        assert got[d]["script_conf_milli"] is None
        assert got[d]["latin_chars"] == 0
    r8 = got[8]
    assert r8["latin_chars"] == 6 and r8["cyrillic_chars"] == 6
    assert r8["dominant_script"] == "latin"  # tie -> first-listed class
    assert r8["script_conf_milli"] == 1000 * 6 // 12


def test_script_profile_plan_no_shuffle(spark):
    from scrapy_products_tracker_spark.functions.text import script_profile

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = script_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_corpus_stats_rollup_exact(spark):
    from scrapy_products_tracker_spark.functions.text import corpus_stats

    rows = [
        (1, "the cat sat on the mat today just fine", "en", "a"),
        (2, "the dog ran to the park and back again", "en", "a"),
        (3, "un deux trois quatre cinq six sept", "fr", "a"),
        (4, None, None, "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {
        (r["source"], r["lang"], r["gid"]): r.asDict()
        for r in corpus_stats(df, ("source", "lang")).collect()
    }
    # grand total: gid=3, both keys NULL
    gt = got[(None, None, 3)]
    assert gt["n_docs"] == 4 and gt["total_tokens"] == 9 + 9 + 7 + 0
    # source subtotal (gid=1) vs leaf rows (gid=0)
    assert got[("a", None, 1)]["n_docs"] == 3
    assert got[("a", "en", 0)]["n_docs"] == 2
    assert got[("a", "fr", 0)]["total_tokens"] == 7
    # genuine NULL lang leaf is distinguishable from the subtotal row
    assert got[("b", None, 0)]["n_docs"] == 1
    assert got[("b", None, 1)]["n_docs"] == 1
    assert got[("b", None, 0)]["total_chars"] == 0
    # integer quality mass is additive: leaf sums == subtotal
    assert (
        got[("a", "en", 0)]["sum_quality_micro"] + got[("a", "fr", 0)]["sum_quality_micro"]
        == got[("a", None, 1)]["sum_quality_micro"]
    )


# --- readability (functions/text.readability_scores) ----------------------


def test_readability_hand_case(spark):
    from scrapy_products_tracker_spark.functions.text import readability_scores

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, None), (3, "   "), (4, "xyz 42")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in readability_scores(df).collect()}
    r1 = got[1]
    # 6 words, 2 sentence runs, 6 single-vowel-group words
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
    assert r1.flesch_milli == 206835 - (1015 * 6) // 2 - (84600 * 6) // 6
    assert r1.fk_grade_milli == (390 * 6) // 2 + (11800 * 6) // 6 - 15590
    for k in (2, 3):
        assert got[k].n_words is None and got[k].flesch_milli is None
    # vowel-less tokens floor at 1 syllable; no [.!?] -> 1 sentence
    r4 = got[4]
    assert (r4.n_words, r4.n_sentences, r4.n_syllables) == (2, 1, 2)


def test_readability_zero_exchange_plan(spark):
    from scrapy_products_tracker_spark.functions.text import readability_scores

    df = spark.createDataFrame([(1, "a b.")], "doc_id long, text string")
    plan = readability_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
