"""WARC → curated LM-corpus parquet shards capstone
(crawl/text_export.py): full export equals the directly-run funnel,
re-export is byte-identical, incremental runs publish only genuinely
new content and never touch delivered files."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.crawl.text_export import export_text_corpus
from scrapy_products_tracker_spark.crawl.warc import write_warc_shards


def _page(i, words=24, host="a.test"):
    body = " ".join(f"w{i}tok{j}" for j in range(words))
    return (f"https://{host}/p{i:03d}", 200, f"<html><body>{body}</body></html>".encode())


def _archive(spark, pages):
    df = spark.createDataFrame(pages, "url string, status_code int, body binary")
    return write_warc_shards(df, budget_bytes=1 << 16)


def _file_md5s(out_dir):
    return {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(out_dir + "/corpus-*.parquet")
    }


def test_full_export_and_determinism(spark, tmpdir_path):
    pages = [_page(i) for i in range(12)] + [
        ("https://a.test/404", 404, b"<html>gone</html>"),
        ("https://a.test/null", 200, None),
    ]
    out = tmpdir_path + "/corpus"
    man = export_text_corpus(
        spark,
        _archive(spark, pages),
        out,
        budget_tokens=100,
        seq_len=10,
        main_content=False,
        min_tokens=5,
    ).collect()
    assert len(man) >= 2  # 12 docs x 25 tokens >> 100/shard
    files = _file_md5s(out)
    total_docs = 0
    for m in man:
        assert files[os.path.basename(m.path)] == m.parquet_md5
        total_docs += m.n_docs
    assert total_docs == 12  # 404 + empty-body rows never enter
    # shard rows concatenate to one contiguous packed token stream
    rows = sorted(
        (r.tok_before, r.n_tokens, r.doc_id)
        for p in files
        for r in spark.read.parquet(out + "/" + p).collect()
    )
    off = 0
    for tok_before, n_tokens, _ in rows:
        assert tok_before == off
        off += n_tokens
    # deterministic re-export: byte-identical shard files
    out2 = tmpdir_path + "/corpus2"
    export_text_corpus(
        spark, _archive(spark, pages), out2,
        budget_tokens=100, seq_len=10, main_content=False, min_tokens=5,
    ).collect()
    assert set(_file_md5s(out2).values()) == set(files.values())


def test_incremental_delta_publishes_only_new(spark, tmpdir_path):
    v1 = [_page(i) for i in range(8)]
    out = tmpdir_path + "/inc"
    kw = dict(budget_tokens=100, seq_len=10, main_content=False, min_tokens=5)
    export_text_corpus(spark, _archive(spark, v1), out, incremental=True, **kw)
    before = _file_md5s(out)
    max_shard_before = max(int(p.split("-")[1].split(".")[0]) for p in before)

    # v2 archive: the old pages re-crawled, one near-dup of page 0
    # under a new url, and two genuinely new pages
    near = ("https://b.test/copy", 200, _page(0)[2])
    v2 = v1 + [near, _page(100, host="b.test"), _page(101, host="b.test")]
    man2 = export_text_corpus(
        spark, _archive(spark, v2), out, incremental=True, **kw
    ).collect()
    after = _file_md5s(out)
    # delivered files untouched; delta shards numbered after them
    for p, h in before.items():
        assert after[p] == h
    new_files = set(after) - set(before)
    assert new_files and all(
        int(p.split("-")[1].split(".")[0]) > max_shard_before for p in new_files
    )
    # only the two new docs shipped: the re-crawls are id-dups, the
    # byte-copy under a new url dies in the cross-set dedup
    assert sum(m.n_docs for m in man2) == 2
    # empty delta: nothing new -> nothing published
    man3 = export_text_corpus(
        spark, _archive(spark, v2), out, incremental=True, **kw
    ).collect()
    assert man3 == []
    assert _file_md5s(out) == after


def test_crash_before_pointer_flip_drops_nothing(spark, tmpdir_path, monkeypatch):
    # the round-4 bug: published ids landed before the manifest, so a
    # crash between the two writes marked docs published while their
    # shards were missing from the manifest — the retry computed an
    # EMPTY delta and those docs were dropped from the corpus forever.
    # Now both tables stage invisibly and ONE atomic pointer flip
    # commits them: a crash anywhere before the flip must leave the
    # retry able to republish the full delta.
    import scrapy_products_tracker_spark.export_commit as ec

    v1 = [_page(i) for i in range(8)]
    out = tmpdir_path + "/crash"
    kw = dict(budget_tokens=100, seq_len=10, main_content=False, min_tokens=5)
    export_text_corpus(spark, _archive(spark, v1), out, incremental=True, **kw)
    assert ec.committed_deltas(out) == [0]

    v2 = v1 + [_page(100, host="b.test"), _page(101, host="b.test")]
    real_commit = ec.commit_delta

    def boom(*a, **k):
        raise RuntimeError("simulated crash before pointer flip")

    monkeypatch.setattr(ec, "commit_delta", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        export_text_corpus(spark, _archive(spark, v2), out, incremental=True, **kw)
    # pointer unflipped: the torn delta is invisible
    assert ec.committed_deltas(out) == [0]

    monkeypatch.setattr(ec, "commit_delta", real_commit)
    man2 = export_text_corpus(
        spark, _archive(spark, v2), out, incremental=True, **kw
    ).collect()
    assert sum(m.n_docs for m in man2) == 2  # both new docs republished
    # trainer-visible corpus holds every doc exactly once
    all_rows = [
        r.doc_id
        for p in _file_md5s(out)
        for r in spark.read.parquet(out + "/" + p).collect()
    ]
    assert len(all_rows) == len(set(all_rows)) == 10


def test_recrawl_keeper_is_deterministic(spark, tmpdir_path):
    # one url fetched twice with DIFFERENT bodies (a re-crawl): the
    # keeper must be the min-md5(text) row regardless of archive order
    # or partitioning, preserving the byte-identical-shards contract.
    url = "https://a.test/page"
    b1 = b"<html><body>" + b" ".join(b"alpha%d" % j for j in range(24)) + b"</body></html>"
    b2 = b"<html><body>" + b" ".join(b"beta%d" % j for j in range(24)) + b"</body></html>"
    kw = dict(budget_tokens=100, seq_len=10, main_content=False, min_tokens=5)
    outs = []
    for order, name in [((b1, b2), "fwd"), ((b2, b1), "rev")]:
        pages = [(url, 200, order[0]), (url, 200, order[1])] + [
            _page(i) for i in range(4)
        ]
        out = tmpdir_path + "/keeper_" + name
        export_text_corpus(spark, _archive(spark, pages), out, **kw).collect()
        outs.append(_file_md5s(out))
    assert outs[0] == outs[1]  # same bytes whichever record came first


def test_budget_guard(spark, tmpdir_path):
    with pytest.raises(ValueError):
        export_text_corpus(
            spark, None, tmpdir_path + "/x", budget_tokens=5, seq_len=10
        )
