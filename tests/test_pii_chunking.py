"""PII scrubbing and sliding token-window chunking: hand-computable
fixtures pin the redaction bytes, counts, window boundaries and tail
semantics; a plan test pins both ops as zero-exchange row-local
algebra (the explode in chunk_windows grows rows but never shuffles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapy_products_tracker_spark.functions.text import (
    chunk_windows,
    pii_counts,
    pii_scrub,
    pii_scrub_stats,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_scrub_redacts_all_three_classes(spark):
    rows = [
        (1, "mail a.b-c+d@ex-ample.co.uk or x@y.io today"),
        (2, "server at 10.0.0.7 and 192.168.1.255 up"),
        (3, "call 555-867-5309 or 123.456.7890 now"),
        (4, "mixed: u@v.org via 8.8.8.8 tel 111-222-3333"),
        (5, "clean text with no identifiers at all"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id", pii_scrub(F.col("text")).alias("s"), *[
                c.alias(n)
                for c, n in zip(pii_counts(F.col("text")), ["ne", "ni", "np"])
            ]
        ).collect()
    }
    assert got[1]["s"] == "mail <EMAIL> or <EMAIL> today"
    assert (got[1]["ne"], got[1]["ni"], got[1]["np"]) == (2, 0, 0)
    assert got[2]["s"] == "server at <IP> and <IP> up"
    assert (got[2]["ne"], got[2]["ni"], got[2]["np"]) == (0, 2, 0)
    # 123.456.7890 is a dotted phone, not an IPv4 (7890 has 4 digits)
    assert got[3]["s"] == "call <PHONE> or <PHONE> now"
    assert (got[3]["ne"], got[3]["ni"], got[3]["np"]) == (0, 0, 2)
    assert got[4]["s"] == "mixed: <EMAIL> via <IP> tel <PHONE>"
    assert got[5]["s"] == rows[4][1]
    assert got[6]["s"] is None and got[6]["ne"] is None


def test_pii_scrub_order_email_before_phone(spark):
    # the email local part carries a phone-shaped digit run: email pass
    # must consume it whole, leaving nothing for the phone pass
    df = spark.createDataFrame([(1, "reach 555-123-4567x@corp.net ok")], "i int, text string")
    assert df.select(pii_scrub(F.col("text")).alias("s")).first()["s"] == "reach <EMAIL> ok"


def test_chunk_windows_boundaries_and_tail(spark):
    words = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    rows = [(1, words), (2, "a b c"), (3, ""), (4, None), (5, "solo")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    ch = chunk_windows(df, win=10, stride=7)
    got = ch.collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,7,…,98 -> 15 chunks; tail at 98 has 2 tokens
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert len(c1) == 15
    assert c1[0]["chunk_text"].split() == [f"w{i}" for i in range(10)]
    assert c1[1]["chunk_text"].split() == [f"w{i}" for i in range(7, 17)]
    assert c1[-1]["chunk_tokens"] == 2 and c1[-1]["chunk_text"] == "w98 w99"
    # doc 2: 3 tokens < stride -> exactly one chunk, kept short
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_tokens"] == 3
    # empty / NULL docs emit no chunks
    assert 3 not in by_doc and 4 not in by_doc
    assert by_doc[5][0]["chunk_text"] == "solo"
    # overlap property: stride < win duplicates exactly win-stride tokens
    assert c1[0]["chunk_text"].split()[7:] == c1[1]["chunk_text"].split()[:3]


def test_curate_corpus_scrub_pii_collapses_pii_variants(spark):
    # two docs identical except for distinct emails: scrubbing first
    # makes them byte-identical, so exact-fingerprint dedup keeps one;
    # the survivor's text carries the placeholder, not the address
    base = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "runs back to the barn with that dog for this is a fine day "
    ) * 2
    rows = [
        (1, base + "write a@x.com"),
        (2, base + "write b@y.org"),
        (3, "the " + " ".join(f"other words here w{i} and of to in is for" for i in range(8))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from scrapy_products_tracker_spark.dedup import curate_corpus

    out = curate_corpus(df, min_tokens=10, min_quality=0.3, scrub_pii=True).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3]  # first-wins: doc 1 survives, doc 2 is its exact dup
    t1 = next(r["text"] for r in out if r["doc_id"] == 1)
    assert "<EMAIL>" in t1 and "a@x.com" not in t1


def test_pii_and_chunking_plans_are_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    assert "Exchange" not in _plan(pii_scrub_stats(df))
    assert "Exchange" not in _plan(chunk_windows(df))


def test_curate_corpus_ppl_gate_drops_tail(spark):
    """ppl_drop_tail: the funnel's kept set minus the gated set must
    be exactly the docs perplexity_buckets labels 'tail' on the same
    survivors (consistency against the standalone operators)."""
    import random

    from scrapy_products_tracker_spark.dedup import curate_corpus
    from scrapy_products_tracker_spark.functions.text import (
        lm_bigram_scores,
        perplexity_buckets,
    )

    rnd = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(40)), "en")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    base_kwargs = dict(min_tokens=5, min_quality=0.0, threshold=0.99, n_hashes=8, bands=8)
    without = {r["doc_id"] for r in curate_corpus(df, **base_kwargs).collect()}
    gated = {
        r["doc_id"]
        for r in curate_corpus(
            df, ppl_drop_tail=True, ppl_group_col="lang", **base_kwargs
        ).collect()
    }
    # all 20 docs pass the rule stage here, so the standalone split
    # over df is exactly the split the funnel computed over `kept`
    scores = lm_bigram_scores(df, vocab_size=64)
    scored = scores.join(df.select(F.col("doc_id").alias("doc"), "lang"), "doc")
    tail = {
        r["doc"]
        for r in perplexity_buckets(scored, group_col="lang")
        .filter(F.col("bucket") == "tail")
        .collect()
    }
    assert gated and tail and gated == without - tail


def test_curate_corpus_dedup_lines_collapses_boilerplate_variants(spark):
    # two pages share identical content but different REPEATED nav
    # lines; line-dedup reduces each nav to one line, but contents
    # still differ -> both survive. Two pages identical except one
    # repeats its own lines -> collapse to one after line dedup.
    content = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "runs back to the barn with that dog for this is a fine day "
    ) * 2
    rows = [
        (1, content),
        (2, content + "\n" + content),  # self-repeat: dedups to doc 1's text? no —
        # line-dedup collapses the repeated LINE, making doc 2 == doc 1
        (3, "the " + " ".join(f"other words here w{i} and of to in is for" for i in range(8))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from scrapy_products_tracker_spark.dedup import curate_corpus

    out = curate_corpus(df, min_tokens=10, min_quality=0.3, dedup_lines=True).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3]  # doc 2 collapsed onto doc 1
    # the line pass made doc 2 EXACTLY doc 1's text (first-wins keeps 1),
    # and the survivor's text is the single-copy content
    t1 = next(r["text"] for r in out if r["doc_id"] == 1)
    assert t1 == content


def test_curate_corpus_zratio_gate_drops_template_spam(spark):
    prose = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "runs back to the barn with that dog for this is a fine day "
    ) * 2
    spam = "the best cheap deal for this fine thing is here " * 20
    rows = [(1, prose), (2, spam)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from scrapy_products_tracker_spark.dedup import curate_corpus
    from scrapy_products_tracker_spark.functions.text import compression_ratio_stats

    ratios = {r["id"]: r["ratio_milli"] for r in compression_ratio_stats(df).collect()}
    assert ratios[2] < ratios[1]  # spam compresses better
    floor = (ratios[1] + ratios[2]) // 2
    kept = sorted(
        r["doc_id"]
        for r in curate_corpus(
            df, min_tokens=10, min_quality=0.3, min_zratio_milli=floor
        ).collect()
    )
    assert kept == [1]


def test_nfc_normalize_combining_sequences(spark):
    """NFC: combining sequences compose, precomposed text untouched,
    NULL passes through; fingerprints converge for equal renderings."""
    from scrapy_products_tracker_spark.functions.text import nfc_stats

    rows = [
        (1, "café"),   # decomposed -> café
        (2, "café"),    # precomposed
        (3, "plain"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in nfc_stats(df).collect()}
    assert got[1]["changed"] == 1 and got[2]["changed"] == 0
    assert got[1]["len_before"] == 5 and got[1]["len_after"] == 4
    assert got[1]["fp"] == got[2]["fp"]  # same text after normalization
    assert got[3]["changed"] == 0 and got[3]["fp"] is not None
    assert got[4]["changed"] is None and got[4]["fp"] is None


def test_curate_nfc_gate_collapses_renderings(spark):
    """curate_corpus(nfc=True): decomposed and precomposed renderings
    of the same doc become exact duplicates and dedup to one survivor;
    off, both survive (byte-different fingerprints)."""
    from scrapy_products_tracker_spark.dedup import curate_corpus

    body = "the quick brown fox jumps over the lazy dog caf"
    rows = [
        (1, body + "é and more shared filler words here to pass"),
        (2, body + "é and more shared filler words here to pass"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept_off = curate_corpus(df, min_tokens=5, min_quality=0.0, threshold=0.99)
    kept_on = curate_corpus(df, min_tokens=5, min_quality=0.0, threshold=0.99, nfc=True)
    assert {r["doc_id"] for r in kept_off.select("doc_id").collect()} == {1, 2}
    assert {r["doc_id"] for r in kept_on.select("doc_id").collect()} == {1}
