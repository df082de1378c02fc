"""Entry-point contract checks: flagship runs, and a sample of the
queries()/oracle_sql() pairs match DuckDB (the full matrix is run by
tools/check_oracles.py and by the driver at sf=0.01)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SAMPLE = ["frontier_claim_topk", "history_export_join", "dedup_exact_text", "ann_cosine_topk"]


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.round(6)
        elif s.dtype == object:
            pdf[c] = s.astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"url", "domain", "discovered_seq", "rank_in_domain"}


def test_every_query_has_callable_and_oracle_keys_subset():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)  # every oracle refers to a real query
    assert len(qs) >= 25


@pytest.mark.parametrize("name", SAMPLE)
def test_sampled_oracle_parity(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    sdf = _normalize(entrymod.queries()[name](spark, SF).toPandas())
    ddf = _normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf)
    pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False)
