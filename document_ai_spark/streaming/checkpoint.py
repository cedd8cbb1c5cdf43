"""Checkpointed, resumable extraction runs with per-partition lineage.

North-rule requirement: "every partition writes lineage + row-count/latency
metrics to a checkpoint table so a killed job resumes exactly at the last
committed Iceberg snapshot". No Iceberg runtime jars ship in this sandbox,
so the snapshot semantics are emulated behind a small storage interface
(SURVEY.md §7.6): Parquet data files + per-bucket JSON manifests committed
via atomic rename — the same commit/visibility contract an Iceberg catalog
gives (an output bucket is visible iff its manifest exists; manifests are
only ever created whole).

Layout under ``root``:
    data/bucket=<b>/      committed parquet output for bucket b
    _staging/<b>/          in-flight writes (never read)
    _manifests/<b>.json    commit record = lineage row (atomic rename)

A "partition" here is a deterministic doc_id hash bucket — stable across
runs and cluster sizes, which is what makes resume exact: re-running skips
every bucket whose manifest exists, and reprocessing a bucket is idempotent
(same input slice -> same output, staging overwritten, rename replaces
nothing because commit is checked first).

The reference analog is the batch-job progress dict + per-file error
capture (reference backend/main.py:522-562) and the WorkflowState
reasoning log (backend/services/coordinator.py:19-29) — there, in-memory
and lost on crash; here, durable and resumable.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


class JobKilled(RuntimeError):
    """Raised by the test hook to simulate a mid-run crash."""


@dataclass
class Lineage:
    run_id: str
    partition_id: int
    snapshot_id: str
    rows_in: int
    rows_out: int
    latency_ms: float
    committed_at: str


class ManifestStore:
    """Atomic-rename manifest commits emulating Iceberg snapshot visibility."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.staging_dir = os.path.join(root, "_staging")
        self.manifest_dir = os.path.join(root, "_manifests")
        for d in (self.data_dir, self.staging_dir, self.manifest_dir):
            os.makedirs(d, exist_ok=True)

    def committed_buckets(self) -> Dict[int, dict]:
        out = {}
        for name in os.listdir(self.manifest_dir):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    m = json.load(f)
                out[int(m["partition_id"])] = m
        return out

    def snapshot_id(self) -> str:
        """Current snapshot = count of committed manifests (monotone)."""
        return f"snap-{len(self.committed_buckets()):06d}"

    def staged_path(self, bucket: int) -> str:
        return os.path.join(self.staging_dir, str(bucket))

    def committed_path(self, bucket: int) -> str:
        return os.path.join(self.data_dir, f"bucket={bucket}")

    def commit(self, lineage: Lineage) -> None:
        """Promote staging -> data, then write the manifest atomically.
        Crash between the two leaves the bucket uncommitted (manifest
        absent) and the re-run overwrites staging + re-renames: idempotent."""
        src, dst = self.staged_path(lineage.partition_id), \
            self.committed_path(lineage.partition_id)
        if os.path.exists(dst):
            import shutil
            shutil.rmtree(dst)
        os.rename(src, dst)
        tmp = os.path.join(self.manifest_dir,
                           f".tmp-{lineage.partition_id}.json")
        with open(tmp, "w") as f:
            json.dump(lineage.__dict__, f)
        os.rename(tmp, os.path.join(self.manifest_dir,
                                    f"{lineage.partition_id}.json"))

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        """The checkpoint/metrics table as a DataFrame."""
        rows = list(self.committed_buckets().values())
        if not rows:
            return spark.createDataFrame(
                [], "run_id string, partition_id int, snapshot_id string, "
                    "rows_in long, rows_out long, latency_ms double, "
                    "committed_at string")
        return spark.createDataFrame(rows).select(
            "run_id", "partition_id", "snapshot_id", "rows_in", "rows_out",
            "latency_ms", "committed_at")

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """Union of all committed bucket outputs (the visible snapshot)."""
        paths = [self.committed_path(b) for b in self.committed_buckets()]
        if not paths:
            raise ValueError("no committed buckets")
        return spark.read.parquet(*paths)


def run_checkpointed(
    spark: SparkSession,
    docs_df: DataFrame,
    payloads_df: DataFrame,
    out_root: str,
    run_id: str = "run-0",
    buckets: int = 16,
    extract_fn: Optional[Callable[[DataFrame, DataFrame], DataFrame]] = None,
    fail_after: Optional[int] = None,
) -> ManifestStore:
    """Bucket-at-a-time checkpointed run; resumes by skipping committed
    buckets. ``fail_after`` commits N buckets then raises (crash test)."""
    from ..plans.pipeline import extract as default_extract

    extract_fn = extract_fn or default_extract
    store = ManifestStore(out_root)
    # The bucket count defines the doc->partition assignment; resuming with
    # a different count would skip the wrong slices. Pin it in store meta.
    meta_path = os.path.join(out_root, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta["buckets"] != buckets:
            raise ValueError(
                f"store at {out_root} was created with buckets="
                f"{meta['buckets']}; cannot resume with buckets={buckets}")
    else:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"buckets": buckets, "run_id": run_id}, f)
        os.rename(tmp, meta_path)
    done = store.committed_buckets()
    bucket_col = F.pmod(F.xxhash64("doc_id"), F.lit(buckets))
    committed_this_run = 0

    for b in range(buckets):
        if b in done:
            continue
        t0 = time.monotonic()
        sub = docs_df.where(bucket_col == b)
        rows_in = sub.count()
        out = extract_fn(sub, payloads_df)
        staged = store.staged_path(b)
        out.write.mode("overwrite").parquet(staged)
        rows_out = spark.read.parquet(staged).count()  # metadata-only
        store.commit(Lineage(
            run_id=run_id,
            partition_id=b,
            snapshot_id=store.snapshot_id(),
            rows_in=rows_in,
            rows_out=rows_out,
            latency_ms=round((time.monotonic() - t0) * 1000, 3),
            committed_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        ))
        committed_this_run += 1
        if fail_after is not None and committed_this_run >= fail_after:
            raise JobKilled(
                f"simulated crash after {committed_this_run} buckets")
    return store
