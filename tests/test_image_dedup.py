"""Composed image dedup cascade (imaging/neardup.image_dedup_survivors):
exact byte-identity pass + perceptual near-dup pruning, pairwise and
cluster-exact modes, NULL-bytes pass-through."""

import pytest
from pyspark.sql import functions as F

from scrapy_products_tracker_spark.imaging import image_dedup_survivors


def _ids(df):
    return sorted(r.image_id for r in df.select("image_id").collect())


def test_exact_then_neardup(spark):
    rows = [
        ("a", bytearray(b"xx1"), 7),
        ("a2", bytearray(b"xx1"), 7),  # exact byte dup of a -> dropped in pass 1
        ("b", bytearray(b"xx2"), 7 ^ 1),  # phash dist 1 from a -> dropped (a < b)
        ("c", bytearray(b"yy"), 1 << 40),  # unique -> kept
        ("n", None, 123),  # NULL bytes -> pass-through untouched
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, phash long")
    assert _ids(image_dedup_survivors(df, threshold=2)) == ["a", "c", "n"]


def test_exact_dup_does_not_shadow_neardup():
    # exact pass keeps the LOWEST id per byte group, so the survivor of
    # the exact group must still participate in the phash join
    pass  # covered by test_exact_then_neardup: 'a' (exact survivor) prunes 'b'


def test_transitive_vs_pairwise(spark):
    # a ~ c (dist 2), b ~ c (dist 2), a !~ b (dist 4): pairwise drops only
    # c (the only id_b), transitive collapses the whole component to min id a
    rows = [
        ("a", bytearray(b"1"), 0),
        ("b", bytearray(b"2"), 0b111100),
        ("c", bytearray(b"3"), 0b110000),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, phash long")
    assert _ids(image_dedup_survivors(df, threshold=2, transitive=False)) == ["a", "b"]
    assert _ids(image_dedup_survivors(df, threshold=2, transitive=True)) == ["a"]


def test_original_columns_survive(spark):
    rows = [("a", bytearray(b"x"), 1, "cap-a"), ("z", bytearray(b"x"), 1, "cap-z")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, phash long, caption string")
    out = image_dedup_survivors(df).collect()
    assert len(out) == 1 and out[0].caption == "cap-a"
    assert set(out[0].asDict()) == {"image_id", "bytes", "phash", "caption"}


def test_all_null_bytes_passthrough(spark):
    df = spark.createDataFrame(
        [("a", None, 5), ("b", None, 5)], "image_id string, bytes binary, phash long"
    )
    # identical phash, but no content to compare: both pass through
    assert _ids(image_dedup_survivors(df)) == ["a", "b"]


def test_prefer_best_caption(spark):
    ntok = -F.size(F.split("caption", " "))
    rows = [
        # exact byte group: z has the longer caption -> z survives pass 1
        ("a", bytearray(b"same"), 0, "one two"),
        ("z", bytearray(b"same"), 0, "one two three"),
        # phash cluster with z (dist 1): m has the longest caption -> keeper
        ("m", bytearray(b"other"), 1, "one two three four"),
        # singleton cluster (8 bits away): survives regardless of caption length
        ("s", bytearray(b"third"), 0xFF, "x"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, phash long, caption string")
    out = image_dedup_survivors(df, threshold=2, transitive=True, prefer=ntok)
    assert _ids(out) == ["m", "s"]
    # ties on the prefer key fall back to lowest id
    rows_tie = [
        ("b", bytearray(b"1"), 0, "one two"),
        ("a", bytearray(b"2"), 1, "one two"),
    ]
    df_tie = spark.createDataFrame(
        rows_tie, "image_id string, bytes binary, phash long, caption string"
    )
    assert _ids(image_dedup_survivors(df_tie, threshold=2, transitive=True, prefer=ntok)) == ["a"]


def test_prefer_requires_transitive(spark):
    df = spark.createDataFrame(
        [("a", bytearray(b"x"), 1, "c")], "image_id string, bytes binary, phash long, caption string"
    )
    with pytest.raises(ValueError):
        image_dedup_survivors(df, prefer=F.lit(0))


def test_threshold_guard(spark):
    df = spark.createDataFrame(
        [("a", bytearray(b"x"), 1)], "image_id string, bytes binary, phash long"
    )
    with pytest.raises(ValueError):
        image_dedup_survivors(df, threshold=8, n_bands=8).collect()


def test_image_caption_dedup_union_chain(spark):
    from scrapy_products_tracker_spark.imaging import image_caption_dedup

    rows = [
        # a ~ b by image (dist 1); b ~ c by caption; chain collapses to a
        ("a", 0b0000, "alpha text"),
        ("b", 0b0001, "Shared  Caption"),
        ("c", 0b110011, "shared caption"),
        # d: no signal matches anything -> survives
        ("d", 0b11110000111100001111000011110000, "solo"),
        # e/f: NULL caption + far phash -> both survive
        ("e", 0x7000000000000000, None),
        ("f", 0x0FF0000000000000, ""),
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    out = sorted(r["image_id"] for r in image_caption_dedup(df, threshold=2).collect())
    assert out == ["a", "d", "e", "f"]


def test_image_caption_dedup_caption_star_not_quadratic(spark):
    from scrapy_products_tracker_spark.imaging import image_caption_dedup

    # 50 rows sharing one caption, images all far apart (golden-ratio
    # multiplies spread ~32 differing bits per pair): one survivor
    mask = (1 << 63) - 1
    rows = [(f"x{i:02d}", ((i + 1) * 0x9E3779B97F4A7C15) & mask, "same cap") for i in range(50)]
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    out = image_caption_dedup(df, threshold=2).collect()
    assert [r["image_id"] for r in out] == ["x00"]


# --- image_dedup_against_corpus: incremental ingestion -----------------------


def test_image_dedup_against_corpus_planted(spark):
    from scrapy_products_tracker_spark.imaging.neardup import (
        image_dedup_against_corpus,
    )

    corpus = spark.createDataFrame(
        [("c1", b"imgbytes-one", 0), ("c2", b"imgbytes-two", 1 << 40)],
        "image_id string, bytes binary, phash long",
    )
    new = spark.createDataFrame(
        [
            ("n1", b"imgbytes-one", 0),          # exact byte copy of c1
            ("n2", b"imgbytes-one-x", 3),        # dist 2 from c1 -> cross near
            ("n3", b"fresh-bytes", 0xFFFF << 24),# far from both -> survives
            ("n4", b"fresh-bytes", 0xFFFF << 24),# within-batch exact dup of n3
            ("n5", None, 5),                     # NULL bytes pass through
        ],
        "image_id string, bytes binary, phash long",
    )
    got = sorted(
        r["image_id"]
        for r in image_dedup_against_corpus(new, corpus, threshold=7).collect()
    )
    assert got == ["n3", "n5"]


def test_image_dedup_against_corpus_null_phash_survives_perceptual(spark):
    """A new row with bytes but NULL phash can only be dropped by the
    exact pass, never the perceptual one."""
    from scrapy_products_tracker_spark.imaging.neardup import (
        image_dedup_against_corpus,
    )

    corpus = spark.createDataFrame(
        [("c1", b"aa", 0)], "image_id string, bytes binary, phash long"
    )
    new = spark.createDataFrame(
        [("n1", b"bb", None), ("n2", b"aa", None)],
        "image_id string, bytes binary, phash long",
    )
    got = sorted(
        r["image_id"]
        for r in image_dedup_against_corpus(new, corpus, threshold=7).collect()
    )
    assert got == ["n1"]  # n2 killed by exact bytes; n1 immune to phash pass


# --- patch-hash overlap (imaging/patches.py) ------------------------------


def _png_payload(px):
    from scrapy_products_tracker_spark.imaging.codec import encode_image

    return bytearray(encode_image(px, "png"))


def _noise_px(seed, h=64, w=64):
    import numpy as np

    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype("uint8")


def test_patch_overlap_detects_local_edit(spark):
    import numpy as np

    from scrapy_products_tracker_spark.imaging import (
        patch_hash_table,
        patch_overlap_pairs,
    )

    a = _noise_px(1)
    b = a.copy()
    b[32:48, 32:48] = 0  # overlay exactly patch (2,2) of the 4x4 grid
    c = _noise_px(2)
    df = spark.createDataFrame(
        [("a", _png_payload(a)), ("b", _png_payload(b)), ("c", _png_payload(c))],
        "image_id string, bytes binary",
    )
    ph = patch_hash_table(df, grid=4)
    assert ph.count() == 48  # 16 rows per image, all reported
    pairs = {
        (r.id_a, r.id_b): r.shared_patches
        for r in patch_overlap_pairs(ph, min_shared=12).collect()
    }
    assert pairs == {("a", "b"): 15}  # the edited patch is the only miss

    # global phash smears the same edit across the whole hash: the pair
    # is far in whole-image Hamming space (> banded threshold 7)
    from scrapy_products_tracker_spark.imaging.codec import phash64

    assert bin(phash64(a) ^ phash64(b)).count("1") > 7


def test_patch_overlap_background_frequency_cap(spark):
    import numpy as np

    from scrapy_products_tracker_spark.imaging import (
        patch_hash_table,
        patch_overlap_pairs,
    )

    flat = np.full((64, 64, 3), 255, dtype="uint8")
    rows = [(f"w{i}", _png_payload(flat)) for i in range(5)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    ph = patch_hash_table(df, grid=4)
    # every patch of every image hashes identically -> 1 distinct
    # (image, hash) row each; the hash appears in 5 images
    assert patch_overlap_pairs(ph, min_shared=1, max_images_per_hash=4).count() == 0
    got = patch_overlap_pairs(ph, min_shared=1, max_images_per_hash=10).collect()
    assert len(got) == 10 and all(r.shared_patches == 1 for r in got)


def test_patch_table_audit_semantics(spark):
    from scrapy_products_tracker_spark.imaging import patch_hash_table

    small = _noise_px(3, h=6, w=6)  # patches < 8px -> NULL hashes
    df = spark.createDataFrame(
        [("junk", bytearray(b"not an image")), ("tiny", _png_payload(small))],
        "image_id string, bytes binary",
    )
    out = patch_hash_table(df, grid=4).collect()
    assert len(out) == 32  # both rows reported, never dropped
    assert all(r.patch_hash is None for r in out)


def test_patch_overlap_rejects_bad_params_and_plan(spark):
    import pytest as _pytest

    from scrapy_products_tracker_spark.imaging import (
        patch_hash_table,
        patch_overlap_pairs,
    )

    with _pytest.raises(ValueError):
        patch_overlap_pairs(None, min_shared=0)
    with _pytest.raises(ValueError):
        patch_overlap_pairs(None, max_images_per_hash=1)
    with _pytest.raises(ValueError):
        patch_hash_table(None, grid=0)
    df = spark.createDataFrame(
        [("a", 1, 1, 5), ("b", 1, 2, 5)],
        "image_id string, patch_row int, patch_col int, patch_hash long",
    )
    plan = (
        patch_overlap_pairs(df, min_shared=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
