"""Snapshot-committed frontier storage (Iceberg semantics, Parquet files).

The reference keeps its frontier in MySQL with transactional upserts
(utils/read_csv.py:66-70) and relies on RabbitMQ durability for
in-flight work (pika_select_connection.py:185-191). The north rule
replaces that with an Iceberg-backed table + snapshot checkpoints.

This sandbox has no Iceberg runtime jar, so ``SnapshotParquetStore``
implements the same contract with Parquet data files plus JSON
manifests and an atomically-replaced ``LATEST`` pointer:

- a commit writes new data directories, then a ``snapshots/v{n}.json``
  manifest naming them, then atomically flips ``LATEST`` (os.replace).
  The pointer flip is the commit point; a crash before it leaves only
  unreferenced garbage (exactly Iceberg's model).
- the **frontier is hash-bucketized**: rows live under
  ``fb=pmod-equivalent(url_hash, B)`` directories and the manifest maps
  bucket -> file path. A round's commit (``frontier_updates`` +
  ``frontier_inserts``) reads and rewrites ONLY the dirty buckets —
  the buckets containing updated or inserted url_hashes — so per-round
  commit cost is bounded by the claim chunk + discoveries, not the
  10^10-row frontier (Iceberg MERGE INTO on a ``bucket(url_hash)``
  partition spec behaves identically). Clean buckets are carried
  forward by reference, like Iceberg manifests reusing data files.
- the **seen-set (Bloom/cuckoo) shards are a parquet table** under
  ``data/seen/``, also referenced per-shard, with the same dirty-shard
  delta commit; shard payloads never pass through the driver
  (dedup/seen_table.py).
- results / crawl-order are append-only file lists.
- time travel / resume = read any retained manifest.
- the manifest also carries the run metadata the north rule requires:
  round number, session, fetch/dedup/skip counters, per-partition
  (per-domain) lineage counts.

On a real cluster with Iceberg jars present, ``IcebergFrontierStore``
maps commit -> MERGE INTO/append + snapshot id; the engine only talks
to the abstract interface, so the swap is config-only.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dedup.seen_table import (
    BLOOM_SHARD_SCHEMA,
    CUCKOO_SHARD_SCHEMA,
    BloomTable,
    open_seen_table,
)


class CommitConflictError(RuntimeError):
    """Another writer advanced LATEST since this commit's base snapshot
    was read (Iceberg optimistic-concurrency semantics): the commit's
    deltas were computed against a stale base, so applying them would
    silently lose the other writer's updates. The loser re-reads and
    retries; its already-written data files are orphans the next
    ``expire_snapshots`` GC sweeps."""


def frontier_bucket_col(url_hash_col, n_buckets: int):
    """Bucket key for the frontier layout; same two's-complement AND the
    Bloom shards use, exact for power-of-two bucket counts."""
    return url_hash_col.bitwiseAND(F.lit(n_buckets - 1)).cast("int")


class SnapshotParquetStore:
    def __init__(
        self,
        root: str,
        n_frontier_buckets: int | None = None,
        frontier_commit: str = "cow",
        frontier_log_max_runs: int = 16,
        frontier_log_max_rows: int = 4_000_000,
        cluster_frontier_files: bool = True,
    ):
        """``frontier_commit`` selects the round-delta strategy:

        - ``"cow"`` (default): dirty-bucket copy-on-write — each round
          rewrites every bucket containing an updated/inserted hash.
          Cost per round is O(dirty-bucket rows); the 50x bench measured
          it growing 2.5 -> 6.2 s/round as rounds dirty all buckets and
          buckets grow with the frontier.
        - ``"log"``: LSM-style delta commit — each round appends ONLY
          its update/insert rows as per-bucket log runs (O(chunk) write,
          flat in frontier size); readers merge base+log at read time
          (pushdown-preserving, see ``_merged_frontier_view``) and
          ``compact_frontier_log`` folds runs back into clustered
          bucket files every ``frontier_log_max_runs`` commits (the
          Iceberg merge-on-read + rewrite_data_files pattern).

        Log-mode contract: delta UPDATES may only target rows whose
        merged status is PENDING (true of every claim-derived update —
        claims only take PENDING rows). Arbitrary status surgery uses a
        full-frontier commit (rearm_session / refresh_robots already
        do)."""
        if n_frontier_buckets is not None and (
            n_frontier_buckets < 1 or (n_frontier_buckets & (n_frontier_buckets - 1)) != 0
        ):
            raise ValueError("n_frontier_buckets must be a power of two")
        if frontier_commit not in ("cow", "log"):
            raise ValueError("frontier_commit must be 'cow' or 'log'")
        self.frontier_commit = frontier_commit
        self.frontier_log_max_runs = int(frontier_log_max_runs)
        # second auto-compaction trigger: total outstanding log ROWS.
        # The merge-on-read view broadcasts the latest-update aggregate,
        # so the log must stay broadcast-sized whatever the chunk size —
        # million-row rounds hit this cap long before the run cap.
        self.frontier_log_max_rows = int(frontier_log_max_rows)
        # the (status, claim-key) clustered file layout (§3.4). On by
        # default; the off switch exists so its write-side cost can be
        # isolated like-for-like in A/B benches — row order is
        # semantics-free either way.
        self.cluster_frontier_files = bool(cluster_frontier_files)
        self.root = Path(root)
        (self.root / "snapshots").mkdir(parents=True, exist_ok=True)
        (self.root / "data").mkdir(exist_ok=True)
        # re-opening an existing store adopts its committed bucket count
        # (a rebucket_frontier may have outgrown the default); an
        # EXPLICIT mismatching value is refused rather than silently
        # overridden — resharding is rebucket_frontier's job, and a
        # silent 32-vs-1024 downgrade would make every dirty-bucket
        # rewrite 32x larger than the caller asked for
        m = self.read_manifest()
        committed = (
            int(m["frontier"]["n_buckets"])
            if m and isinstance(m.get("frontier"), dict) and m["frontier"].get("n_buckets")
            else None
        )
        if committed is not None:
            if n_frontier_buckets is not None and n_frontier_buckets != committed:
                raise ValueError(
                    f"store already committed with {committed} frontier buckets; "
                    f"use rebucket_frontier() to change the layout"
                )
            self.n_frontier_buckets = committed
        else:
            self.n_frontier_buckets = n_frontier_buckets if n_frontier_buckets is not None else 32

    # --- pointer ---------------------------------------------------------
    def latest_version(self) -> int | None:
        p = self.root / "LATEST"
        if not p.exists():
            return None
        return int(p.read_text().strip())

    def _manifest_path(self, version: int) -> Path:
        return self.root / "snapshots" / f"v{version}.json"

    def read_manifest(self, version: int | None = None) -> dict | None:
        version = self.latest_version() if version is None else version
        if version is None or not self._manifest_path(version).exists():
            return None
        m = json.loads(self._manifest_path(version).read_text())
        if "version" not in m:
            return None  # claim placeholder of an in-flight/crashed commit
        return m

    # --- readers ---------------------------------------------------------
    def _frontier_paths(self, m: dict, buckets=None) -> list[str]:
        fr = m["frontier"]
        if isinstance(fr, str):  # legacy unbucketized layout
            return [str(self.root / fr)]
        bmap = fr["buckets"]
        if buckets is None:
            return [str(self.root / p) for p in bmap.values()]
        return [str(self.root / bmap[str(b)]) for b in buckets if str(b) in bmap]

    @staticmethod
    def _frontier_log(m: dict) -> list[dict]:
        fr = m["frontier"]
        return fr.get("log", []) if isinstance(fr, dict) else []

    def read_frontier(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        m = self.read_manifest(version)
        if m is None:
            return None
        if self._frontier_log(m):
            return self._merged_frontier_view(spark, m)
        return spark.read.parquet(*self._frontier_paths(m))

    def read_frontier_buckets(
        self, spark: SparkSession, buckets, version: int | None = None
    ) -> DataFrame | None:
        """Read only the named hash buckets — partition pruning for the
        seen-set exact-confirm anti-join (candidates' buckets only)."""
        m = self.read_manifest(version)
        if m is None:
            return None
        if self._frontier_log(m):
            return self._merged_frontier_view(spark, m, buckets=buckets)
        paths = self._frontier_paths(m, buckets)
        if not paths:
            return self.read_frontier(spark, version).limit(0)
        return spark.read.parquet(*paths)

    def _merged_frontier_view(
        self, spark: SparkSession, m: dict, buckets=None
    ) -> DataFrame:
        """Merge-on-read view of base buckets + outstanding log runs
        (``frontier_commit='log'``), optionally restricted to named
        buckets.

        The plan is built so the claim scan keeps its parquet row-group
        skip index (BASELINE.md §3.4) while a log is outstanding:

        - terminal base rows pass through untouched in their own union
          branch carrying ``status != PENDING`` — by the log-mode
          contract (class docstring) no log update can target them, and
          a caller's ``status == PENDING`` filter folds this branch to
          empty at plan time;
        - PENDING base rows ∪ log-insert rows take a broadcast left
          join against the per-key LATEST update (one tiny aggregate
          over the log runs — per column, the newest non-null run wins,
          exactly the sequential-coalesce semantics of the COW MERGE)
          and coalesce status/attempt/session. The pushed
          ``status = PENDING`` scan filter on this branch's base side
          is what preserves the row-group skip.

        Log rows are bounded by ``frontier_log_max_runs × chunk`` (the
        auto-compaction contract), so the update aggregate and the
        insert union stay broadcast-sized at any frontier scale."""
        from ..schemas import PENDING

        fr = m["frontier"]
        bmap = fr["buckets"]
        sel = None if buckets is None else {str(b) for b in buckets}
        base_paths = [
            str(self.root / p) for b, p in bmap.items() if sel is None or b in sel
        ]
        if base_paths:
            base = spark.read.parquet(*base_paths)
        else:
            allp = [str(self.root / p) for p in bmap.values()]
            base = spark.read.parquet(*allp).limit(0)
        ins_paths: list[str] = []
        upd_runs: list[tuple[int, list[str]]] = []
        for entry in self._frontier_log(m):
            ip = [
                str(self.root / p)
                for b, p in entry.get("ins", {}).items()
                if sel is None or b in sel
            ]
            up = [
                str(self.root / p)
                for b, p in entry.get("upd", {}).items()
                if sel is None or b in sel
            ]
            ins_paths.extend(ip)
            if up:
                upd_runs.append((int(entry["seq"]), up))
        pend = base.filter(F.col("status") == PENDING)
        term = base.filter(F.col("status") != PENDING)
        if ins_paths:
            pend = pend.unionByName(
                spark.read.parquet(*ins_paths).select(*base.columns)
            )
        if upd_runs:
            runs = [
                spark.read.parquet(*paths).withColumn("_seq", F.lit(seq))
                for seq, paths in upd_runs
            ]
            upd = runs[0]
            for r in runs[1:]:
                upd = upd.unionByName(r, allowMissingColumns=True)
            has_sess = "new_session" in upd.columns
            aggs = [
                F.max(F.struct("_seq", "new_status", "new_attempt")).alias("_sa")
            ]
            if has_sess:
                aggs.append(
                    F.max(
                        F.when(
                            F.col("new_session").isNotNull(),
                            F.struct("_seq", "new_session"),
                        )
                    ).alias("_ss")
                )
            latest = upd.groupBy("url_hash", "url").agg(*aggs)
            pend = (
                pend.join(F.broadcast(latest), ["url_hash", "url"], "left")
                .withColumn(
                    "status",
                    F.coalesce(F.col("_sa").getField("new_status"), F.col("status")),
                )
                .withColumn(
                    "attempt",
                    F.coalesce(F.col("_sa").getField("new_attempt"), F.col("attempt")),
                )
            )
            if has_sess:
                pend = pend.withColumn(
                    "session",
                    F.coalesce(F.col("_ss").getField("new_session"), F.col("session")),
                )
            pend = pend.drop("_sa", *(["_ss"] if has_sess else []))
        return term.unionByName(pend.select(*term.columns))

    def frontier_n_buckets(self, version: int | None = None) -> int | None:
        m = self.read_manifest(version)
        if m is None or isinstance(m["frontier"], str):
            return None
        return int(m["frontier"]["n_buckets"])

    def _read_appendlist(self, spark: SparkSession, key: str, version: int | None) -> DataFrame | None:
        m = self.read_manifest(version)
        if not m or not m.get(key):
            return None
        return spark.read.parquet(*[str(self.root / p) for p in m[key]])

    def read_results(self, spark, version=None):
        return self._read_appendlist(spark, "results", version)

    def read_crawl_order(self, spark, version=None):
        return self._read_appendlist(spark, "crawl_order", version)

    def read_history(self, spark, version=None):
        return self._read_appendlist(spark, "history", version)

    def read_link_edges(self, spark, version=None):
        """Append-only (src_url_hash, dst_url_hash, round) discovered
        link graph — recorded when CrawlConfig(record_link_edges=True);
        the input of jobs/rank_job.py's importance re-prioritization."""
        return self._read_appendlist(spark, "link_edges", version)

    def read_products(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        m = self.read_manifest(version)
        if m is None or not m.get("products"):
            return None
        return spark.read.parquet(
            *[str(self.root / p) for p in m["products"]["buckets"].values()]
        )

    def read_seen(self, spark: SparkSession | None = None, version: int | None = None):
        """Seen-table handle (BloomTable/CuckooTable) for the snapshot;
        state stays in parquet — this only returns paths + params."""
        m = self.read_manifest(version)
        if not m or not m.get("seen"):
            return None
        spark = spark or SparkSession.getActiveSession()
        s = m["seen"]
        paths = [str(self.root / p) for p in s["files"].values()]
        return open_seen_table(spark, s["kind"], paths, s["params"])

    def read_bloom(self, version: int | None = None):
        t = self.read_seen(version=version)
        return t if t is not None and t.kind == "bloom" else None

    def read_cuckoo(self, version: int | None = None):
        t = self.read_seen(version=version)
        return t if t is not None and t.kind == "cuckoo" else None

    # --- write helpers ---------------------------------------------------
    # Physical clustering of frontier bucket files: (status, claim key).
    # The claim scan filters `status = PENDING` (crawl/driver.py:479);
    # with statuses CLUSTERED, parquet row-group min/max stats make that
    # filter skip whole row groups of finished rows — on a mature
    # 10^10-row frontier (95%+ terminal statuses) that's a ~20x claim-
    # scan I/O cut on every round, for the price of a map-side local
    # sort per dirty-bucket rewrite (no extra shuffle: sortWithin-
    # Partitions after the bucket repartition). The claim-key tail
    # (CLAIM_ORDER, politeness/scheduler.py:40) additionally leaves the
    # PENDING groups in priority order, so their row-group stats carry
    # tight (priority, depth) ranges for any future cutoff pushdown.
    # Row order is semantics-free everywhere (discovered_seq is content-
    # derived via encode_seq, never file position) — pinned by
    # tests/test_store.py::test_frontier_files_clustered_by_status.
    FRONTIER_SORT = ("status", "priority", "depth", "discovered_seq")

    def _frontier_sort(self):
        return self.FRONTIER_SORT if self.cluster_frontier_files else ()

    def _write_partitioned(
        self, df: DataFrame, rel_dir: str, part_col, sort_cols=()
    ) -> dict[str, str]:
        """Write df into ``rel_dir`` partitioned by the given bucket
        column expression; returns bucket -> relpath of the dirs that
        actually materialized. ``sort_cols`` (those present in df)
        cluster rows inside each bucket file — a free local sort that
        turns row-group stats into a skip index for the claim scan."""
        out = self.root / rel_dir
        w = df.withColumn("pb", part_col).repartition("pb")
        # one task per bucket -> ~one file per dir
        sort_cols = [c for c in sort_cols if c in df.columns]
        if sort_cols:
            w = w.sortWithinPartitions("pb", *sort_cols)
        (
            w.write.mode("overwrite")
            .partitionBy("pb")
            .parquet(str(out))
        )
        found: dict[str, str] = {}
        for child in out.iterdir():
            if child.is_dir() and child.name.startswith("pb="):
                found[child.name.split("=", 1)[1]] = f"{rel_dir}/{child.name}"
        return found

    def _commit_frontier_full(self, frontier: DataFrame, version: int):
        rel = f"data/frontier/v{version}"
        if "url_hash" not in frontier.columns:
            # legacy/simple tables (unit tests): single directory
            frontier.write.mode("overwrite").parquet(str(self.root / rel))
            return rel
        B = self.n_frontier_buckets
        written = self._write_partitioned(
            frontier, rel, frontier_bucket_col(F.col("url_hash"), B),
            sort_cols=self._frontier_sort(),
        )
        return {"n_buckets": B, "buckets": written}

    def _commit_frontier_delta(
        self,
        prev: dict,
        updates: DataFrame | None,
        inserts: DataFrame | None,
        version: int,
        dirty: list[int] | None = None,
    ):
        """Dirty-bucket MERGE: read only buckets containing updated or
        inserted hashes, apply the copy-on-write merge plan, rewrite
        those buckets; clean buckets carry forward by reference."""
        from .merge import merge_inserts, merge_status_updates

        fr = prev["frontier"]
        if isinstance(fr, str):
            raise ValueError("delta commit requires a bucketized frontier")
        if fr.get("log"):
            raise ValueError(
                "frontier has outstanding log runs; run compact_frontier_log() "
                "first or open the store with frontier_commit='log'"
            )
        B = int(fr["n_buckets"])
        bmap = dict(fr["buckets"])
        spark = (updates or inserts).sparkSession

        if dirty is None:  # caller may precompute this inside its stats job
            def _fb(df):
                return df.select(frontier_bucket_col(F.col("url_hash"), B).alias("fb"))

            parts = [_fb(d) for d in (updates, inserts) if d is not None]
            dirty_df = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
            dirty = sorted(int(r["fb"]) for r in dirty_df.distinct().collect())
        else:
            dirty = sorted(int(b) for b in dirty)
        if not dirty:
            return {"n_buckets": B, "buckets": bmap}, []
        sub_paths = [str(self.root / bmap[str(b)]) for b in dirty if str(b) in bmap]
        if sub_paths:
            sub = spark.read.parquet(*sub_paths)
        else:
            sub = self.read_frontier(spark).limit(0)
        merged = sub if updates is None else merge_status_updates(sub, updates)
        if inserts is not None:
            merged = merge_inserts(merged, inserts)
        rel = f"data/frontier/v{version}"
        written = self._write_partitioned(
            merged, rel, frontier_bucket_col(F.col("url_hash"), B),
            sort_cols=self._frontier_sort(),
        )
        for b in dirty:
            sb = str(b)
            if sb in written:
                bmap[sb] = written[sb]
            else:  # bucket emptied (cannot happen today: rows never deleted)
                bmap.pop(sb, None)
        return {"n_buckets": B, "buckets": bmap}, dirty

    def _commit_frontier_logdelta(
        self,
        prev: dict,
        updates: DataFrame | None,
        inserts: DataFrame | None,
        version: int,
        dirty: list[int] | None = None,
    ):
        """LSM-style delta commit: append the round's update/insert rows
        as per-bucket log runs — NO base bucket is read or rewritten, so
        commit cost is O(round delta) regardless of frontier size (the
        cost the 50x bench measured growing under COW). Readers merge
        via ``_merged_frontier_view``; ``compact_frontier_log`` folds
        runs down. Dirty buckets fall out of the partitioned write for
        free (no collect)."""
        fr = prev["frontier"]
        if isinstance(fr, str):
            raise ValueError("log delta commit requires a bucketized frontier")
        B = int(fr["n_buckets"])
        log = list(fr.get("log", []))
        upd_written: dict[str, str] = {}
        ins_written: dict[str, str] = {}
        if updates is not None:
            cols = ["url_hash", "url", "new_status", "new_attempt"] + (
                ["new_session"] if "new_session" in updates.columns else []
            )
            upd_written = self._write_partitioned(
                updates.select(*cols),
                f"data/frontier_log/v{version}/upd",
                frontier_bucket_col(F.col("url_hash"), B),
            )
        if inserts is not None:
            ins_written = self._write_partitioned(
                inserts,
                f"data/frontier_log/v{version}/ins",
                frontier_bucket_col(F.col("url_hash"), B),
                sort_cols=self._frontier_sort(),
            )
        if dirty is None:
            dirty = sorted({int(b) for b in (*upd_written, *ins_written)})
        else:
            dirty = sorted(int(b) for b in dirty)
        # row tally for the broadcast-size compaction trigger: a
        # parquet footer count over the just-written run (metadata-only
        # scan, no data read)
        spark = (updates or inserts).sparkSession
        paths = [
            str(self.root / p)
            for p in (*upd_written.values(), *ins_written.values())
        ]
        n_rows = int(spark.read.parquet(*paths).count()) if paths else 0
        log.append(
            {"seq": version, "upd": upd_written, "ins": ins_written, "rows": n_rows}
        )
        return {
            "n_buckets": B,
            "buckets": dict(fr["buckets"]),
            "log": log,
        }, dirty

    def compact_frontier_log(
        self, spark: SparkSession, expected_version: int | None = None
    ) -> dict | None:
        """Fold outstanding frontier log runs back into clustered base
        bucket files (Iceberg ``rewrite_data_files`` over a
        merge-on-read table) and commit a log-free snapshot. Only
        buckets touched by some run are rewritten; clean buckets carry
        forward by reference. Amortized over ``frontier_log_max_runs``
        rounds this is the same dirty-bucket COW work the per-round
        commit used to do EVERY round. Returns a summary dict, or None
        when no log is outstanding. OCC-guarded like every maintenance
        commit."""
        prev = self.read_manifest()
        if prev is None:
            raise RuntimeError("no committed snapshot to compact")
        log = self._frontier_log(prev)
        if not log:
            return None
        fr = prev["frontier"]
        B = int(fr["n_buckets"])
        bmap = dict(fr["buckets"])
        dirty = sorted(
            {int(b) for e in log for b in (*e.get("upd", {}), *e.get("ins", {}))}
        )
        version = prev["version"] + 1
        while True:
            try:
                with open(self._manifest_path(version), "x") as fh:
                    fh.write('{"claimed": true}')
                break
            except FileExistsError:
                version += 1
        merged = self._merged_frontier_view(spark, prev, buckets=dirty)
        written = self._write_partitioned(
            merged,
            f"data/frontier/v{version}",
            frontier_bucket_col(F.col("url_hash"), B),
            sort_cols=self._frontier_sort(),
        )
        for b in dirty:
            sb = str(b)
            if sb in written:
                bmap[sb] = written[sb]
        manifest = {
            **prev,
            "version": version,
            "committed_at": time.time(),
            "frontier": {"n_buckets": B, "buckets": bmap},
            "meta": {
                **prev["meta"],
                "frontier_log_compacted": {"runs": len(log), "buckets": len(dirty)},
            },
        }
        if expected_version is None:
            expected_version = prev["version"]
        if self.latest_version() != expected_version:
            raise CommitConflictError(
                f"base snapshot v{expected_version} is stale "
                f"(LATEST is v{self.latest_version()}); re-read and retry"
            )
        mtmp = self.root / "snapshots" / f"v{version}.json.tmp"
        mtmp.write_text(json.dumps(manifest, indent=1))
        os.replace(mtmp, self._manifest_path(version))
        tmp = self.root / "LATEST.tmp"
        tmp.write_text(str(version))
        os.replace(tmp, self.root / "LATEST")
        return {"version": version, "runs": len(log), "buckets": len(dirty)}

    def _commit_products_delta(
        self,
        prev: dict,
        upsert: DataFrame | None,
        set_updates: DataFrame | None,
        version: int,
    ) -> dict:
        """Dirty-bucket MERGE for the product_targets table — the K4
        16-field upsert (products/tables.upsert_products) or a
        set-columns MERGE (mark-sent K9 / stop-tracking O6). Same
        copy-on-write layout as the frontier; first upsert creates the
        table."""
        from ..products.tables import merge_set_columns, upsert_products

        delta = upsert if upsert is not None else set_updates
        spark = delta.sparkSession
        entry = prev.get("products") if prev else None
        B = int(entry["n_buckets"]) if entry else self.n_frontier_buckets
        bmap = dict(entry["buckets"]) if entry else {}
        dirty = sorted(
            int(r["fb"])
            for r in delta.select(
                frontier_bucket_col(F.col("url_hash"), B).alias("fb")
            )
            .distinct()
            .collect()
        )
        if not dirty:
            return entry
        sub_paths = [str(self.root / bmap[str(b)]) for b in dirty if str(b) in bmap]
        if sub_paths:
            sub = spark.read.parquet(*sub_paths)
        elif entry:
            sub = self.read_products(spark).limit(0)
        else:
            if set_updates is not None:
                raise ValueError("products_set requires an existing products table")
            sub = spark.createDataFrame([], upsert.schema)
        merged = (
            upsert_products(sub, upsert)
            if upsert is not None
            else merge_set_columns(sub, set_updates)
        )
        rel = f"data/products/v{version}"
        written = self._write_partitioned(
            merged, rel, frontier_bucket_col(F.col("url_hash"), B)
        )
        for b in dirty:
            if str(b) in written:
                bmap[str(b)] = written[str(b)]
        return {"n_buckets": B, "buckets": bmap}

    def _commit_seen_build(self, kind: str, params: dict, shards_df: DataFrame, version: int) -> dict:
        written = self._write_partitioned(shards_df, f"data/seen/v{version}", F.col("bucket"))
        return {"kind": kind, "params": params, "files": written}

    def _commit_seen_delta(
        self, prev_seen: dict, delta_df: DataFrame, version: int, dirty: list[int] | None = None
    ) -> dict:
        """Merge a round's delta into the dirty shards only. The delta is
        small (bounded by the round's inserts) but its distinct-shard
        set is what bounds the rewrite, exactly like the frontier."""
        kind, params = prev_seen["kind"], prev_seen["params"]
        files = dict(prev_seen["files"])
        spark = delta_df.sparkSession
        delta_df = delta_df.persist()
        try:
            if dirty is None:
                dirty = sorted(
                    int(r["bucket"]) for r in delta_df.select("bucket").distinct().collect()
                )
            else:
                dirty = sorted(int(b) for b in dirty)
            if not dirty:
                return prev_seen
            existing_paths = [str(self.root / files[str(b)]) for b in dirty if str(b) in files]
            schema = BLOOM_SHARD_SCHEMA if kind == "bloom" else CUCKOO_SHARD_SCHEMA
            existing = (
                spark.read.parquet(*existing_paths)
                if existing_paths
                else spark.createDataFrame([], schema)
            )
            table = open_seen_table(spark, kind, [], params)
            if kind == "bloom":
                merged = BloomTable.merge_shards(existing, delta_df)
            else:
                merged = table.merge_shards(existing, delta_df)
            written = self._write_partitioned(merged, f"data/seen/v{version}", F.col("bucket"))
            for b in dirty:
                if str(b) in written:
                    files[str(b)] = written[str(b)]
            return {"kind": kind, "params": params, "files": files}
        finally:
            delta_df.unpersist()

    # --- commit ----------------------------------------------------------
    def commit(
        self,
        frontier: DataFrame | None = None,
        *,
        frontier_updates: DataFrame | None = None,
        frontier_inserts: DataFrame | None = None,
        new_results: DataFrame | None = None,
        new_crawl_order: DataFrame | None = None,
        new_history: DataFrame | None = None,
        new_link_edges: DataFrame | None = None,
        products_upsert: DataFrame | None = None,
        products_set: DataFrame | None = None,
        seen_build: tuple[str, dict, DataFrame] | None = None,
        seen_delta: DataFrame | None = None,
        frontier_dirty: list[int] | None = None,
        seen_dirty: list[int] | None = None,
        meta: dict | None = None,
        expected_version: int | None = None,
    ) -> int:
        """One atomic snapshot. Exactly one of ``frontier`` (full
        rewrite: seeding, session re-arm) or ``frontier_updates``/
        ``frontier_inserts`` (dirty-bucket delta: a crawl round) should
        be provided. The pointer flip after ALL writes land is the
        commit point; a crash before it leaves the previous snapshot
        fully intact (reference nack-redelivery semantics, X4/X5)."""
        prev = self.read_manifest()
        # reserve a UNIQUE version number before any data write (O_EXCL
        # create of the manifest path): concurrent committers therefore
        # write to disjoint v{n} data dirs, so the loser of the
        # expected_version race really does leave only GC-able orphans
        # (without this, two writers computing the same prev+1 would
        # overwrite each other's files before the flip check runs).
        # A crashed claim leaves a placeholder manifest that LATEST
        # never points to; readers and GC skip it.
        version = (prev["version"] + 1) if prev else 1
        while True:
            try:
                with open(self._manifest_path(version), "x") as fh:
                    fh.write('{"claimed": true}')
                break
            except FileExistsError:
                version += 1
        delta_mode = frontier_updates is not None or frontier_inserts is not None
        if delta_mode and frontier is not None:
            raise ValueError("pass either frontier or frontier_updates/inserts, not both")
        if delta_mode and not prev:
            raise ValueError("delta commit requires an existing snapshot")
        if products_upsert is not None and products_set is not None:
            raise ValueError("pass either products_upsert or products_set, not both")

        # independent Spark jobs -> submit concurrently from driver
        # threads (scheduler interleaves across executors); atomicity is
        # unchanged since the pointer flips only after all writes land.
        results = list(prev.get("results", [])) if prev else []
        order = list(prev.get("crawl_order", [])) if prev else []
        history = list(prev.get("history", [])) if prev else []
        link_edges = list(prev.get("link_edges", [])) if prev else []
        jobs = []
        if new_results is not None:
            rdir = f"data/results/v{version}"
            results.append(rdir)
            jobs.append((new_results, rdir))
        if new_crawl_order is not None:
            odir = f"data/crawl_order/v{version}"
            order.append(odir)
            jobs.append((new_crawl_order, odir))
        if new_history is not None:
            hdir = f"data/history/v{version}"
            history.append(hdir)
            jobs.append((new_history, hdir))
        if new_link_edges is not None:
            edir = f"data/link_edges/v{version}"
            link_edges.append(edir)
            jobs.append((new_link_edges, edir))

        from concurrent.futures import ThreadPoolExecutor

        dirty_frontier: list[int] = []
        with ThreadPoolExecutor(max_workers=len(jobs) + 2) as pool:
            futs = [
                pool.submit(
                    lambda df, d: df.write.mode("overwrite").parquet(str(self.root / d)),
                    df,
                    d,
                )
                for df, d in jobs
            ]
            if delta_mode:
                f_frontier = pool.submit(
                    self._commit_frontier_logdelta
                    if self.frontier_commit == "log"
                    else self._commit_frontier_delta,
                    prev,
                    frontier_updates,
                    frontier_inserts,
                    version,
                    frontier_dirty,
                )
            elif frontier is not None:
                f_frontier = pool.submit(self._commit_frontier_full, frontier, version)
            else:
                f_frontier = None
            if seen_build is not None:
                kind, params, shards_df = seen_build
                f_seen = pool.submit(self._commit_seen_build, kind, params, shards_df, version)
            elif seen_delta is not None:
                f_seen = pool.submit(
                    self._commit_seen_delta, prev["seen"], seen_delta, version, seen_dirty
                )
            else:
                f_seen = None
            if products_upsert is not None or products_set is not None:
                f_products = pool.submit(
                    self._commit_products_delta, prev or {}, products_upsert, products_set, version
                )
            else:
                f_products = None
            for f in futs:
                f.result()
            if f_frontier is not None:
                fres = f_frontier.result()
                frontier_entry = fres[0] if delta_mode else fres
                if delta_mode:
                    dirty_frontier = fres[1]
            else:
                frontier_entry = prev["frontier"]
            seen_entry = f_seen.result() if f_seen is not None else (prev.get("seen") if prev else None)
            products_entry = (
                f_products.result()
                if f_products is not None
                else (prev.get("products") if prev else None)
            )

        # meta carries forward: bookkeeping commits (mark-sent, stop-
        # tracking) must not erase the crawl counters/round state the
        # resume path reads
        merged_meta = dict(prev["meta"]) if prev else {}
        merged_meta.pop("dirty_frontier_buckets", None)
        merged_meta.update(meta or {})
        manifest = {
            "version": version,
            "committed_at": time.time(),
            "frontier": frontier_entry,
            "results": results,
            "crawl_order": order,
            "history": history,
            "link_edges": link_edges,
            "products": products_entry,
            "seen": seen_entry,
            "meta": merged_meta,
        }
        if delta_mode:
            manifest["meta"]["dirty_frontier_buckets"] = len(dirty_frontier)
        # optimistic concurrency (Iceberg commit semantics): refuse the
        # pointer flip if another writer advanced LATEST past the base
        # this commit's deltas were computed against. Checked at the
        # last possible moment — all data writes above are version-
        # namespaced, so a losing commit leaves only GC-able orphans.
        if expected_version is not None and self.latest_version() != expected_version:
            raise CommitConflictError(
                f"base snapshot v{expected_version} is stale "
                f"(LATEST is v{self.latest_version()}); re-read and retry"
            )
        mtmp = self.root / "snapshots" / f"v{version}.json.tmp"
        mtmp.write_text(json.dumps(manifest, indent=1))
        os.replace(mtmp, self._manifest_path(version))
        tmp = self.root / "LATEST.tmp"
        tmp.write_text(str(version))
        os.replace(tmp, self.root / "LATEST")  # atomic commit point
        # log mode: fold runs down once they pass the cap — a separate
        # OCC commit AFTER the snapshot lands, so a compaction crash
        # never touches the round's durability
        if delta_mode and self.frontier_commit == "log":
            log_entries = frontier_entry.get("log", [])
            over_runs = (
                self.frontier_log_max_runs
                and len(log_entries) >= self.frontier_log_max_runs
            )
            over_rows = (
                self.frontier_log_max_rows
                and sum(int(e.get("rows") or 0) for e in log_entries)
                >= self.frontier_log_max_rows
            )
            if over_runs or over_rows:
                self.compact_frontier_log(
                    (frontier_updates or frontier_inserts).sparkSession,
                    expected_version=version,
                )
        return version

    # --- observability ---------------------------------------------------
    def snapshot_diff(self, spark: SparkSession, v_from: int, v_to: int | None = None) -> DataFrame:
        """Frontier status-transition counts between two snapshots:
        ``(from_status, to_status, n)`` with NULL ``from_status`` for
        rows inserted in the window (and NULL ``to_status`` for the
        impossible-today deleted case). The time-travel audit surface:
        "what did session K actually do" as one tiny aggregate.

        Scale shape: a full-outer equi-join of two frontier versions on
        ``url_hash`` (8-byte shuffle key, url-equality confirm) — both
        sides share the same bucket layout, so on a bucketized store
        this is the co-partitioned join pattern; the output is
        O(status²) rows."""
        a = self.read_frontier(spark, v_from)
        b = self.read_frontier(spark, v_to)
        if a is None or b is None:
            raise ValueError("both snapshot versions must exist")
        left = a.select(
            F.col("url_hash").alias("h"), F.col("url").alias("u"), F.col("status").alias("from_status")
        )
        right = b.select(
            F.col("url_hash").alias("h"), F.col("url").alias("u"), F.col("status").alias("to_status")
        )
        return (
            left.join(right, ["h", "u"], "full_outer")
            .groupBy("from_status", "to_status")
            .agg(F.count("*").cast("long").alias("n"))
        )

    # --- maintenance (Iceberg table-maintenance analogs) -----------------
    def rebucket_frontier(self, spark: SparkSession, factor: int = 2) -> int:
        """Online frontier re-shard: rewrite into ``factor``× hash
        buckets and commit as a new snapshot (everything else carries
        forward by reference).

        Why it exists: dirty-bucket delta commits scale with the dirty
        set, but a FIXED bucket count means per-bucket size grows with
        the frontier — at 10^10 rows, 32 buckets of 300M rows each make
        every dirty-bucket rewrite a 300M-row job. The standard fix is
        epoch doubling (LSM/Dynamo-style): when buckets outgrow a
        target size, double the count. Because ``bucket = url_hash &
        (B-1)``, each old bucket splits into exactly ``factor`` new
        ones — the rewrite is one full-table pass with NO cross-bucket
        shuffle beyond the split (each row moves to one of ``factor``
        children of its current bucket), amortized over an entire
        growth epoch. Crash-safe like every commit: the pointer flips
        only after all bucket files land; delta commits read the bucket
        count from the manifest, so in-flight sessions resume correctly
        on either side of the flip."""
        prev = self.read_manifest()
        if prev is None:
            raise ValueError("rebucket requires an existing snapshot")
        if factor < 2 or (factor & (factor - 1)) != 0:
            raise ValueError("factor must be a power of two >= 2")
        old_b = self.frontier_n_buckets()
        if old_b is None:
            raise ValueError("rebucket requires a bucketized frontier")
        fr = self.read_frontier(spark)
        new_b = old_b * factor
        # the crawl driver's claim-scan pruning reads exact per-bucket
        # PENDING counts from meta, keyed by bucket id — carry-forward
        # would leave them keyed to the OLD layout (silently skipping
        # live buckets), so recompute for the new one (O(buckets) rows,
        # same contract as the seed commit's tally)
        from ..schemas import PENDING

        rows = (
            fr.groupBy(frontier_bucket_col(F.col("url_hash"), new_b).alias("fb"))
            .agg(F.sum(F.when(F.col("status") == PENDING, 1).otherwise(0)).alias("n_pend"))
            .collect()
        )
        ppb = {str(r["fb"]): int(r["n_pend"] or 0) for r in rows}
        self.n_frontier_buckets = new_b
        return self.commit(
            fr,
            meta={
                "rebucketed": {"from": old_b, "to": new_b},
                "pending_per_bucket": ppb,
            },
            expected_version=prev["version"],
        )

    def rebuild_seen(self, spark: SparkSession, scale: int = 2, params: dict | None = None) -> int:
        """Resize the Bloom seen pre-filter: rebuild every shard from
        the frontier's EXACT url set at ``scale``× bits per bucket (or
        explicit ``params``) and commit.

        Why it is safe: the Bloom table is a *pre*-filter — the exact
        truth is the frontier itself (maybe-seen candidates are always
        confirmed by the anti-join). So a rebuild needs no insert log:
        one distributed pass over frontier urls, the same
        ``build_shards_df`` path the seed commit used. Run it when
        :func:`dedup.seen_table.bloom_fill_stats` reports shards past
        ~500 fill_milli (fp = fill^k stops paying for itself); at
        10^10 keys this is a periodic maintenance job, exactly like
        Iceberg compaction."""
        from ..dedup.seen_table import BloomTable

        prev = self.read_manifest()
        if prev is None or not prev.get("seen"):
            raise ValueError("rebuild_seen requires an existing seen table")
        kind = prev["seen"]["kind"]
        if kind != "bloom":
            raise ValueError("rebuild_seen supports the bloom kind (cuckoo resizes via params_for_capacity + re-seed)")
        old = dict(prev["seen"]["params"])
        new_params = params or {**old, "bits": int(old["bits"]) * int(scale)}
        fr = self.read_frontier(spark)
        shards = BloomTable.build_shards_df(
            fr, "url", int(new_params["n_buckets"]), int(new_params["bits"]), int(new_params["k"])
        )
        return self.commit(
            seen_build=(kind, new_params, shards),
            meta={"seen_rebuilt": {"from_bits": int(old["bits"]), "to_bits": int(new_params["bits"])}},
            expected_version=prev["version"],
        )

    APPEND_KEYS = ("results", "crawl_order", "history", "link_edges")

    def compact_appendlogs(
        self,
        spark: SparkSession,
        keys: tuple[str, ...] = APPEND_KEYS,
        target_files: int = 32,
        expected_version: int | None = None,
    ) -> dict | None:
        """Small-file compaction for the append-only logs (Iceberg
        ``rewrite_data_files`` analog). Every crawl round appends one
        ``data/<key>/v{n}`` directory per log; after 10^5 rounds a
        ``read_results`` scan opens 10^5 directories of round-sized
        files — the classic streaming small-file problem. This rewrites
        each multi-dir log as ONE coalesced directory and commits a
        snapshot whose manifest references only it; the superseded dirs
        stay referenced by older manifests and are swept by
        ``expire_snapshots`` once out of the retention window, so
        time-travel within the window still works.

        Row-set preserving by construction (one read → one write, no
        transformation); ``coalesce`` keeps it shuffle-free. Returns a
        summary dict, or None when nothing has more than one dir.
        OCC-guarded like every maintenance commit (defaults to the
        manifest read at entry)."""
        prev = self.read_manifest()
        if prev is None:
            raise RuntimeError("no committed snapshot to compact")
        unknown = set(keys) - set(self.APPEND_KEYS)
        if unknown:
            raise ValueError(f"unknown append logs: {sorted(unknown)}")
        if target_files < 1:
            raise ValueError("target_files must be >= 1")
        todo = {k: prev.get(k) or [] for k in keys}
        todo = {k: d for k, d in todo.items() if len(d) > 1}
        if not todo:
            return None
        version = prev["version"] + 1
        while True:
            try:
                with open(self._manifest_path(version), "x") as fh:
                    fh.write('{"claimed": true}')
                break
            except FileExistsError:
                version += 1
        logs = {k: list(prev.get(k) or []) for k in self.APPEND_KEYS}
        summary: dict = {}
        for key, dirs in todo.items():
            df = spark.read.parquet(*[str(self.root / p) for p in dirs])
            out = f"data/{key}/v{version}"
            df.coalesce(int(target_files)).write.mode("overwrite").parquet(
                str(self.root / out)
            )
            logs[key] = [out]
            summary[key] = {"dirs_before": len(dirs), "dirs_after": 1}
        manifest = {
            **prev,
            "version": version,
            "committed_at": time.time(),
            **logs,
            "meta": {**prev["meta"], "compacted": summary},
        }
        if expected_version is None:
            expected_version = prev["version"]
        if self.latest_version() != expected_version:
            raise CommitConflictError(
                f"base snapshot v{expected_version} is stale "
                f"(LATEST is v{self.latest_version()}); re-read and retry"
            )
        mtmp = self.root / "snapshots" / f"v{version}.json.tmp"
        mtmp.write_text(json.dumps(manifest, indent=1))
        os.replace(mtmp, self._manifest_path(version))
        tmp = self.root / "LATEST.tmp"
        tmp.write_text(str(version))
        os.replace(tmp, self.root / "LATEST")
        return {"version": version, "compacted": summary}

    def rollback(self, version: int) -> None:
        """Time-travel the pointer back (seen-set state rolls back with
        it since shards are referenced per-manifest; the cuckoo variant
        additionally supports explicit deletion deltas)."""
        if not self._manifest_path(version).exists():
            raise ValueError(f"no snapshot v{version}")
        tmp = self.root / "LATEST.tmp"
        tmp.write_text(str(version))
        os.replace(tmp, self.root / "LATEST")

    def expire_snapshots(self, keep_last: int = 3) -> None:
        """GC versions older than the retained window (Iceberg
        expire_snapshots analog). Bucketized layouts are partially
        live: a version dir survives as long as any of its bucket
        subdirectories is still referenced by a retained manifest."""
        latest = self.latest_version()
        if latest is None:
            return
        keep = set(range(max(1, latest - keep_last + 1), latest + 1))
        live: set[str] = set()
        for v in keep:
            m = self.read_manifest(v)
            if not m or "frontier" not in m:
                continue  # missing or claim placeholder (crashed commit)
            fr = m["frontier"]
            if isinstance(fr, str):
                live.add(fr)
            elif fr:
                live.update(fr["buckets"].values())
                for e in fr.get("log", []):
                    live.update(e.get("upd", {}).values())
                    live.update(e.get("ins", {}).values())
            live.update(m.get("results", []))
            live.update(m.get("crawl_order", []))
            live.update(m.get("history", []))
            live.update(m.get("link_edges", []))
            if m.get("products"):
                live.update(m["products"]["buckets"].values())
            if m.get("seen"):
                live.update(m["seen"]["files"].values())
            for legacy in ("bloom", "cuckoo"):
                if m.get(legacy) and isinstance(m[legacy], str):
                    live.add(m[legacy])

        def _gc(child: Path) -> None:
            rel = str(child.relative_to(self.root))
            if rel in live:
                return
            if child.is_dir() and any(p.startswith(rel + "/") for p in live):
                for grand in child.iterdir():
                    if grand.name.startswith(("_", ".")):
                        continue  # _SUCCESS markers
                    _gc(grand)
                return
            shutil.rmtree(child, ignore_errors=True) if child.is_dir() else child.unlink()

        for sub in ("frontier", "frontier_log", "results", "crawl_order", "history", "link_edges", "products", "seen", "bloom", "cuckoo"):
            d = self.root / "data" / sub
            if not d.exists():
                continue
            for child in d.iterdir():
                _gc(child)
        for mp in (self.root / "snapshots").glob("v*.json"):
            if int(mp.stem[1:]) not in keep:
                mp.unlink()


class IcebergFrontierStore:
    """Same contract on a real Iceberg catalog (production path).

    commit() = one MERGE INTO the frontier table (Iceberg copy-on-write
    over a ``bucket(N, url_hash)`` partition spec does exactly the
    dirty-bucket rewrite ``SnapshotParquetStore`` implements by hand —
    reference upsert semantics: /root/reference/src/python/src/utils/
    read_csv.py:66-70 ``INSERT ... ON DUPLICATE KEY UPDATE``) + appends
    to the results/crawl_order/history logs; the Iceberg snapshot id is
    the checkpoint (resume = ``VERSION AS OF``; rollback =
    ``rollback_to_snapshot``). The SQL is generated by the static
    builders below — pure string functions, unit-tested WITHOUT a
    catalog (tests/test_store.py::test_iceberg_sql_builders) — so the
    only environment-gated part is execution: the constructor refuses
    to run without the runtime jar + catalog conf this sandbox lacks.
    """

    FRONTIER_COLS = (
        "url string, url_hash bigint, domain string, tier int, "
        "priority int, depth int, discovered_seq bigint, "
        "discovered_round int, status int, attempt int, session int, "
        "source string"
    )

    # --- SQL builders (pure, testable; schema mirrors schemas.FRONTIER_SCHEMA)
    @staticmethod
    def create_frontier_sql(table: str, n_buckets: int = 32) -> str:
        """CREATE TABLE with the bucket(url_hash) spec + the clustered
        write order §3.4 relies on (status-leading sort -> row-group
        skip on the claim scan's pushed status filter)."""
        return (
            f"CREATE TABLE IF NOT EXISTS {table} "
            f"({IcebergFrontierStore.FRONTIER_COLS}) USING iceberg "
            f"PARTITIONED BY (bucket({int(n_buckets)}, url_hash)) "
            "TBLPROPERTIES ('write.distribution-mode'='hash', "
            "'sort-order'='status ASC, priority ASC, depth ASC, "
            "discovered_seq ASC')"
        )

    @staticmethod
    def merge_updates_sql(table: str, updates_view: str, with_session: bool = False) -> str:
        """The round's status MERGE: column-wise coalesce identical to
        ``frontier.merge.merge_status_updates`` (url_hash join key with
        url equality confirm — collision-safe at 64-bit scale)."""
        sess = (
            ", t.session = coalesce(s.new_session, t.session)"
            if with_session
            else ""
        )
        return (
            f"MERGE INTO {table} t USING {updates_view} s "
            "ON t.url_hash = s.url_hash AND t.url = s.url "
            "WHEN MATCHED THEN UPDATE SET "
            "t.status = coalesce(s.new_status, t.status), "
            f"t.attempt = coalesce(s.new_attempt, t.attempt){sess}"
        )

    @staticmethod
    def merge_inserts_sql(table: str, inserts_view: str) -> str:
        """Discovery inserts: already deduplicated by the seen-set
        anti-join upstream, so NOT MATCHED insert is the whole clause
        (matched rows are impossible by construction; the guard keeps
        the statement idempotent on at-least-once retries)."""
        return (
            f"MERGE INTO {table} t USING {inserts_view} s "
            "ON t.url_hash = s.url_hash AND t.url = s.url "
            "WHEN NOT MATCHED THEN INSERT *"
        )

    @staticmethod
    def rollback_sql(catalog: str, table: str, snapshot_id: int) -> str:
        return (
            f"CALL {catalog}.system.rollback_to_snapshot"
            f"('{table}', {int(snapshot_id)})"
        )

    @staticmethod
    def expire_snapshots_sql(catalog: str, table: str, older_than: str) -> str:
        return (
            f"CALL {catalog}.system.expire_snapshots"
            f"('{table}', TIMESTAMP '{older_than}')"
        )

    # --- execution (needs the runtime jar + catalog conf) -----------------
    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        if not spark.conf.get(f"spark.sql.catalog.{catalog}", None):
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured; add the "
                "iceberg-spark-runtime jar and spark.sql.catalog.* confs, "
                "or use SnapshotParquetStore."
            )
        self.spark, self.catalog, self.namespace = spark, catalog, namespace

    def _t(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def create_tables(self, n_buckets: int = 32) -> None:  # pragma: no cover
        self.spark.sql(self.create_frontier_sql(self._t("frontier"), n_buckets))

    def commit(
        self,
        frontier: DataFrame | None = None,
        *,
        frontier_updates: DataFrame | None = None,
        frontier_inserts: DataFrame | None = None,
        new_results: DataFrame | None = None,
        new_crawl_order: DataFrame | None = None,
        new_history: DataFrame | None = None,
        **_ignored,
    ) -> int:  # pragma: no cover - needs Iceberg runtime jars
        """One snapshot per round, mirroring ``SnapshotParquetStore``:
        MERGEs + appends land, then the returned snapshot id of the
        frontier table is the checkpoint (Iceberg's own optimistic
        commit protocol replaces ``expected_version``)."""
        t = self._t("frontier")
        if frontier is not None:
            frontier.writeTo(t).overwritePartitions()
        if frontier_updates is not None:
            frontier_updates.createOrReplaceTempView("_round_updates")
            self.spark.sql(
                self.merge_updates_sql(
                    t,
                    "_round_updates",
                    with_session="new_session" in frontier_updates.columns,
                )
            )
        if frontier_inserts is not None:
            frontier_inserts.createOrReplaceTempView("_round_inserts")
            self.spark.sql(self.merge_inserts_sql(t, "_round_inserts"))
        for name, df in (
            ("results", new_results),
            ("crawl_order", new_crawl_order),
            ("history", new_history),
        ):
            if df is not None:
                df.writeTo(self._t(name)).append()
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {t}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row["snapshot_id"])

    def read_frontier(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:  # pragma: no cover - needs Iceberg runtime jars
        t = self._t("frontier")
        if version is None:
            return spark.table(t)
        return spark.sql(f"SELECT * FROM {t} VERSION AS OF {int(version)}")

    def rollback(self, snapshot_id: int) -> None:  # pragma: no cover
        self.spark.sql(
            self.rollback_sql(self.catalog, self._t("frontier"), snapshot_id)
        )
