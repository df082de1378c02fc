"""Local replica of the driver's correctness gate: run each
__spark_entry__ query on Spark and its oracle on DuckDB over the same
sf dir, compare row count + order-insensitive values (columns sorted
by name). Usage: python tools/check_oracles.py [sf_dir] [names...]

Every full run also writes ``ORACLES_LAST.log`` at the repo root
(override with ``ORACLES_LOG=path``): one line per query plus a
summary header with git HEAD and the sf dir — committed per round so
the FULL registry's green gate is recorded builder-side even when the
driver's CORRECTNESS file samples a prefix (VERDICT r03 #2).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod
from scrapy_products_tracker_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
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


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    fails = 0
    lines: list[str] = []

    def emit(line: str) -> None:
        print(line)
        lines.append(line)

    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            emit(f"FAIL {name}: spark error {str(e)[:200]}")
            fails += 1
            continue
        if name not in os_:
            emit(f"ROWS-ONLY {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(os_[name]).df()
        except Exception as e:
            emit(f"FAIL {name}: duckdb error {str(e)[:200]}")
            fails += 1
            continue
        a, b = normalize(sdf), normalize(ddf)
        if len(a) != len(b):
            emit(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            fails += 1
        elif list(a.columns) != list(b.columns):
            emit(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fails += 1
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            if int(bad.sum()) == 0:
                # values equal but pandas .equals() is dtype-sensitive:
                # the classic cause is int32 (Spark row_number) vs
                # int64 (DuckDB BIGINT) — name the columns outright
                dt = [
                    f"{c}: spark={a[c].dtype} duck={b[c].dtype}"
                    for c in a.columns
                    if a[c].dtype != b[c].dtype
                ]
                emit(f"FAIL {name}: values equal, dtypes differ ({'; '.join(dt)})")
            else:
                emit(f"FAIL {name}: {int(bad.sum())} differing rows; first:")
                print(pd.concat([a[bad].head(3), b[bad].head(3)], keys=["spark", "duck"]))
            fails += 1
        else:
            emit(f"OK   {name}: {len(a)} rows  ({time.time()-t0:.1f}s)")
    spark.stop()

    n_run = len(lines)
    n_ok = sum(1 for l in lines if l.startswith("OK"))
    n_rows_only = sum(1 for l in lines if l.startswith("ROWS-ONLY"))
    summary = (
        f"SUMMARY: {n_ok} OK, {fails} FAIL, {n_rows_only} ROWS-ONLY"
        f" of {n_run} run ({len(qs)} registered)  [{time.time()-t_start:.0f}s total]"
    )
    print(summary)
    if not only:  # full-registry runs are the committable artifact
        try:
            head = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True,
            ).stdout.strip()
        except OSError:
            head = "?"
        log_path = os.environ.get("ORACLES_LOG", "ORACLES_LAST.log")
        with open(log_path, "w") as f:
            f.write(f"# oracle gate: sf_dir={sf} git={head} "
                    f"date={time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}\n")
            f.write(summary + "\n")
            f.write("\n".join(lines) + "\n")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
