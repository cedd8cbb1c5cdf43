"""Snapshot-store interface behind the checkpointed extraction runner.

Two implementations of one contract (SURVEY.md §7.6):

  * ManifestStore — Parquet data files + per-bucket JSON manifests
    committed via atomic rename. Runs anywhere; emulates Iceberg's
    commit/visibility semantics (a bucket is visible iff its manifest
    exists; manifests are only ever created whole).
  * IcebergStore — a real Iceberg catalog table partitioned by bucket,
    with lineage in a companion table and snapshot ids from the table's
    own metadata. Requires the iceberg-spark runtime jars; construction
    probes for them and raises IcebergUnavailable when absent (this
    sandbox ships no jars, so tests parameterize over both stores and
    skip Iceberg cleanly).

The runner (checkpoint.run_checkpointed) only talks to the interface:
    committed_buckets() -> {bucket: lineage dict}
    write_bucket(bucket, out_df) -> rows_out   (data write, maybe staged)
    commit(lineage)                            (atomic publish)
    read_committed(spark) / lineage_df(spark) / snapshot_id()
    delete_docs(spark, doc_ids, buckets) -> n_buckets_rewritten
"""
from __future__ import annotations

import abc
import json
import os
import time
from dataclasses import dataclass
from typing import Dict, Iterable, List

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F


@dataclass
class Lineage:
    run_id: str
    partition_id: int
    snapshot_id: str
    rows_in: int
    rows_out: int
    latency_ms: float
    committed_at: str
    # Monotone commit sequence, stamped by the store's commit() — the ONLY
    # safe "latest wins" ordering key. Iceberg snapshot ids are random
    # 64-bit longs (not monotone) and committed_at has second granularity
    # (ties), so neither orders re-commits correctly on its own.
    seq: int = 0
    # JSON dict of per-bucket plan metrics observed during the write job
    # (missing_payloads, lsh_cap_dropped, lsh_max_bucket, ...) — the
    # observe() numbers a 100 TB operator would otherwise only see in the
    # Spark UI, persisted where resume/monitoring actually looks. Kept as
    # a JSON string so the lineage schema stays stable as ops add metrics.
    metrics: str = "{}"


_LINEAGE_SCHEMA = ("run_id string, partition_id int, snapshot_id string, "
                   "rows_in long, rows_out long, latency_ms double, "
                   "committed_at string, seq long, metrics string")


class IcebergUnavailable(RuntimeError):
    """Raised when the Iceberg Spark runtime is not on the classpath."""


def observed_value(obs: Observation, key: str,
                   timeout_sec: float = 5.0):
    """Bounded Observation read: the metric value, or None when the
    observed subtree never materialized. Two failure modes a bare
    ``obs.get`` does not survive: AQE's PropagateEmptyRelation can
    collapse the observed subtree to an empty LocalTableScan (get then
    throws inside toPyRow), and a plan whose CollectMetrics node never
    executed leaves get BLOCKING forever (the dedup._CapCollector
    lesson — e.g. an extract_fn whose output does not derive from the
    observed input). Polls the JVM getRowOrEmpty, which resolves on the
    first check in the normal already-fired case."""
    deadline = time.monotonic() + timeout_sec
    while True:
        jo = getattr(obs, "_jo", None)
        if jo is not None and jo.getRowOrEmpty().isDefined():
            try:
                return obs.get.get(key)
            except Exception:          # noqa: BLE001 — telemetry only
                return None
        if time.monotonic() >= deadline:
            return None
        # Not fired yet: sleep between polls — a never-firing
        # observation would otherwise spin py4j RPCs at full rate for
        # the whole timeout (round-6 ADVICE). The already-fired fast
        # path above still resolves on iteration one.
        time.sleep(0.05)


class SnapshotStore(abc.ABC):
    """Commit/visibility contract for bucket-at-a-time checkpointed runs."""

    @abc.abstractmethod
    def committed_buckets(self) -> Dict[int, dict]: ...

    @abc.abstractmethod
    def snapshot_id(self) -> str: ...

    @abc.abstractmethod
    def write_bucket(self, bucket: int, out_df: DataFrame) -> int:
        """Write one bucket's output (staged where the backend allows);
        returns rows_out observed during the single write job."""

    @abc.abstractmethod
    def commit(self, lineage: Lineage) -> None:
        """Atomically publish the bucket written by write_bucket."""

    @abc.abstractmethod
    def read_committed(self, spark: SparkSession) -> DataFrame: ...

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        """The checkpoint/metrics table as a DataFrame — one shared
        implementation over committed_buckets() (the two stores'
        copies had drifted; setdefault covers pre-seq/metrics legacy
        manifest rows)."""
        rows = list(self.committed_buckets().values())
        if not rows:
            return spark.createDataFrame([], _LINEAGE_SCHEMA)
        for r in rows:
            r.setdefault("seq", 0)
            if r.get("metrics") is None:
                r["metrics"] = "{}"
            r.setdefault("metrics", "{}")
        return spark.createDataFrame(rows).select(
            "run_id", "partition_id", "snapshot_id", "rows_in", "rows_out",
            "latency_ms", "committed_at", "seq", "metrics")

    @abc.abstractmethod
    def delete_docs(self, spark: SparkSession, doc_ids: Iterable[str],
                    buckets: int) -> int:
        """Row-level delete (reference DELETE endpoint, backend/main.py:
        695-705): remove the given doc_ids from committed data, preserving
        snapshot semantics. Ids hashing into UNCOMMITTED buckets are
        recorded as pending tombstones so a later resume cannot resurrect
        them from the ingested input. Returns the number of buckets
        rewritten."""

    @abc.abstractmethod
    def pending_tombstones(self, bucket: int) -> List[str]:
        """doc_ids deleted while `bucket` was still uncommitted; the
        runner filters them out when it finally processes the bucket."""

    @abc.abstractmethod
    def clear_tombstones(self, bucket: int) -> None:
        """Drop the bucket's pending tombstones (called after the bucket
        commits with the tombstones applied)."""


def bucket_of_ids(spark: SparkSession, doc_ids: Iterable[str],
                  buckets: int) -> Dict[int, List[str]]:
    """{bucket: [doc_ids hashing into it]} — computed with the SAME Spark
    expression that assigned them (pmod(xxhash64(doc_id), B)); a Python
    reimplementation of xxhash64 would silently drift."""
    ids = [(str(d),) for d in doc_ids]
    if not ids:
        return {}
    out: Dict[int, List[str]] = {}
    for r in (spark.createDataFrame(ids, "doc_id string")
              .select("doc_id",
                      F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).alias("b"))
              .collect()):
        out.setdefault(int(r["b"]), []).append(r["doc_id"])
    return out


def affected_buckets(spark: SparkSession, doc_ids: Iterable[str],
                     buckets: int) -> List[int]:
    """Buckets the given doc_ids hash into (see bucket_of_ids)."""
    return sorted(bucket_of_ids(spark, doc_ids, buckets))


class ManifestStore(SnapshotStore):
    """Atomic-rename manifest commits emulating Iceberg snapshot visibility.

    Layout under ``root``:
        data/bucket=<b>/      committed parquet output for bucket b
        _staging/<b>/          in-flight writes (never read)
        _manifests/<b>.json    commit record = lineage row (atomic rename)
        _snapshot.json         monotone commit counter (survives deletes)
    """

    def __init__(self, root: str) -> None:
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.staging_dir = os.path.join(root, "_staging")
        self.manifest_dir = os.path.join(root, "_manifests")
        self.tombstone_dir = os.path.join(root, "_tombstones")
        for d in (self.data_dir, self.staging_dir, self.manifest_dir,
                  self.tombstone_dir):
            os.makedirs(d, exist_ok=True)

    def committed_buckets(self) -> Dict[int, dict]:
        out = {}
        for name in os.listdir(self.manifest_dir):
            # dot-prefixed names are in-flight temps (.tmp-<b>.json): a
            # crash mid-commit leaves one behind, and reading it would
            # either raise on the partial JSON (bricking every resume)
            # or fabricate a commit record — both violate the
            # manifests-are-created-whole contract.
            if name.endswith(".json") and not name.startswith("."):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    m = json.load(f)
                out[int(m["partition_id"])] = m
        return out

    # -- snapshot counter ---------------------------------------------------

    def _seq_path(self) -> str:
        return os.path.join(self.root, "_snapshot.json")

    def _seq(self) -> int:
        if os.path.exists(self._seq_path()):
            with open(self._seq_path()) as f:
                return json.load(f)["seq"]
        return len(self.committed_buckets())

    def _write_seq(self, seq: int) -> None:
        tmp = self._seq_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"seq": seq}, f)
        os.rename(tmp, self._seq_path())

    def snapshot_id(self) -> str:
        """Monotone commit counter — advances on every commit, including
        delete rewrites (a manifest-count would stand still there)."""
        return f"snap-{self._seq():06d}"

    # -- paths --------------------------------------------------------------

    def staged_path(self, bucket: int) -> str:
        return os.path.join(self.staging_dir, str(bucket))

    def committed_path(self, bucket: int) -> str:
        return os.path.join(self.data_dir, f"bucket={bucket}")

    # -- write / commit -----------------------------------------------------

    def write_bucket(self, bucket: int, out_df: DataFrame) -> int:
        """Stage the bucket's parquet; rows_out comes from an Observation
        riding the same write job — no second count() pass. When AQE
        elides the observed subtree (runtime-empty bucket), fall back to
        counting the STAGED files just written — never a recompute of
        the plan, and telemetry must not kill the run."""
        obs = Observation()
        (out_df.observe(obs, F.count(F.lit(1)).alias("rows_out"))
         .write.mode("overwrite").parquet(self.staged_path(bucket)))
        rows = observed_value(obs, "rows_out")
        if rows is None:
            rows = out_df.sparkSession.read.parquet(
                self.staged_path(bucket)).count()
        return int(rows)

    def commit(self, lineage: Lineage) -> None:
        """Promote staging -> data, then write the manifest atomically.

        Crash-window discipline (each step leaves a resumable state):
          1. counter FIRST — a crash after it leaves a seq gap, never a
             duplicate (seq is the documented latest-wins key; writing
             it last could reissue the same seq to two commits);
          2. on RE-commit, the old manifest is removed before the data
             swap — the bucket reads as uncommitted for the swap window,
             so a crash inside it means redo, never a manifest pointing
             at missing/half-swapped data (the old rmtree-before-rename
             left exactly that: manifest committed, directory gone);
          3. old data renamed ASIDE (bucket=<b>.old), new renamed in,
             aside deleted — no point where the committed path is
             missing while a manifest references it;
          4. manifest written whole + renamed (atomic publish).
        A leftover .old directory is swept on the next commit of the
        same bucket; .old paths are never read (reads go through
        committed_path only)."""
        import shutil
        seq_next = self._seq() + 1
        lineage.seq = seq_next       # monotone 'latest commit wins' key
        # The id of the snapshot that CONTAINS this commit (the counter
        # value after it) — mirrors the Iceberg path, which records the
        # post-write table snapshot; recording the pre-commit id was
        # off by one (review finding).
        lineage.snapshot_id = f"snap-{seq_next:06d}"
        self._write_seq(seq_next)
        src, dst = self.staged_path(lineage.partition_id), \
            self.committed_path(lineage.partition_id)
        man = os.path.join(self.manifest_dir,
                           f"{lineage.partition_id}.json")
        if os.path.exists(man):
            os.remove(man)
        # Sweep a leftover aside UNCONDITIONALLY (round-6 ADVICE): a
        # crash between rename(dst, aside) and rename(src, dst) leaves
        # dst absent and the aside behind, and the recovery re-commit
        # takes the not-exists(dst) branch — which previously never
        # swept it, leaking the directory until some later commit
        # happened to find dst present.
        shutil.rmtree(dst + ".old", ignore_errors=True)
        if os.path.exists(dst):
            aside = dst + ".old"
            os.rename(dst, aside)
            os.rename(src, dst)
            shutil.rmtree(aside, ignore_errors=True)
        else:
            os.rename(src, dst)
        tmp = os.path.join(self.manifest_dir,
                           f".tmp-{lineage.partition_id}.json")
        with open(tmp, "w") as f:
            json.dump(lineage.__dict__, f)
        os.rename(tmp, man)

    # -- tombstones -----------------------------------------------------------

    def _tombstone_path(self, bucket: int) -> str:
        return os.path.join(self.tombstone_dir, f"{bucket}.json")

    def pending_tombstones(self, bucket: int) -> List[str]:
        p = self._tombstone_path(bucket)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)["doc_ids"]

    def _add_tombstones(self, bucket: int, doc_ids: List[str]) -> None:
        merged = sorted(set(self.pending_tombstones(bucket)) | set(doc_ids))
        tmp = self._tombstone_path(bucket) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"doc_ids": merged}, f)
        os.rename(tmp, self._tombstone_path(bucket))

    def clear_tombstones(self, bucket: int) -> None:
        p = self._tombstone_path(bucket)
        if os.path.exists(p):
            os.remove(p)

    def read_committed(self, spark: SparkSession) -> DataFrame:
        """Union of all committed bucket outputs (the visible snapshot)."""
        paths = [self.committed_path(b) for b in self.committed_buckets()]
        if not paths:
            raise ValueError("no committed buckets")
        return spark.read.parquet(*paths)

    # -- delete ---------------------------------------------------------------

    def delete_docs(self, spark: SparkSession, doc_ids: Iterable[str],
                    buckets: int) -> int:
        """Rewrite only the buckets the doc_ids hash into, minus those
        docs, and commit each rewrite as a new snapshot. Untouched buckets
        keep their files byte-identical. Buckets NOT yet committed get a
        pending tombstone instead (the ingested input under _input still
        contains the deleted docs — without the tombstone a later resume
        would silently resurrect them; the runner applies + clears the
        tombstone when it finally commits the bucket)."""
        ids = [str(d) for d in doc_ids]
        done = self.committed_buckets()
        rewritten = 0
        for b, b_ids in sorted(bucket_of_ids(spark, ids, buckets).items()):
            if b not in done:
                self._add_tombstones(b, b_ids)
                continue
            t0 = time.monotonic()
            cur = spark.read.parquet(self.committed_path(b))
            kept = cur.where(~F.col("doc_id").isin(b_ids))
            rows_out = self.write_bucket(b, kept)
            prev = done[b]
            self.commit(Lineage(
                run_id=f"delete:{prev['run_id']}",
                partition_id=b,
                snapshot_id=self.snapshot_id(),
                rows_in=prev["rows_out"],
                rows_out=rows_out,
                latency_ms=round((time.monotonic() - t0) * 1000, 3),
                committed_at=time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime()),
            ))
            rewritten += 1
        return rewritten


def iceberg_available(spark: SparkSession) -> bool:
    """Capability probe: is the Iceberg Spark runtime on the classpath?"""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergStore(SnapshotStore):
    """SnapshotStore over a real Iceberg catalog.

    Data lives in ``<table>`` partitioned by bucket; lineage in
    ``<table>_lineage``. Bucket publication uses overwritePartitions —
    an atomic Iceberg snapshot replacing exactly that bucket's partition.
    A crash between the data commit and the lineage append leaves the
    bucket without a lineage row, so resume redoes it; overwritePartitions
    makes the redo idempotent (same input slice -> same partition
    contents), preserving the exactly-at-last-snapshot resume contract.

    Construction raises IcebergUnavailable when the runtime jars are
    missing, so callers fall back to ManifestStore.
    """

    def __init__(self, spark: SparkSession, table: str) -> None:
        if not iceberg_available(spark):
            raise IcebergUnavailable(
                "iceberg-spark runtime jars not on the classpath")
        self.spark = spark
        self.table = table
        self.lineage_table = f"{table}_lineage"
        self.tombstone_table = f"{table}_tombstones"
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.lineage_table} "
            f"({_LINEAGE_SCHEMA}) USING iceberg")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.tombstone_table} "
            f"(bucket int, doc_id string) USING iceberg")

    def _lineage_rows(self) -> List[dict]:
        if not self.spark.catalog.tableExists(self.lineage_table):
            return []
        return [r.asDict() for r in
                self.spark.table(self.lineage_table).collect()]

    def committed_buckets(self) -> Dict[int, dict]:
        out: Dict[int, dict] = {}
        # 'Latest commit wins' MUST order on the monotone seq column:
        # Iceberg snapshot ids are random longs (string-sorting them is
        # not even numeric order) and committed_at ties at second
        # granularity — seq is the commit order by construction, with
        # committed_at as a legacy-row tiebreaker.
        for r in sorted(self._lineage_rows(),
                        key=lambda r: (r.get("seq") or 0,
                                       r["committed_at"])):
            out[int(r["partition_id"])] = r
        return out

    def _next_seq(self) -> int:
        rows = self._lineage_rows()
        return 1 + max((r.get("seq") or 0 for r in rows), default=0)

    def snapshot_id(self) -> str:
        if not self.spark.catalog.tableExists(self.table):
            return "snap-000000"
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.table}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").collect()
        return f"snap-{row[0]['snapshot_id']}" if row else "snap-000000"

    def write_bucket(self, bucket: int, out_df: DataFrame) -> int:
        obs = Observation()
        tagged = (out_df.observe(obs, F.count(F.lit(1)).alias("rows_out"))
                  .withColumn("bucket", F.lit(bucket)))
        existed = self.spark.catalog.tableExists(self.table)
        if existed:
            tagged.writeTo(self.table).overwritePartitions()
        else:
            (tagged.writeTo(self.table).partitionedBy("bucket")
             .using("iceberg").create())
        rows = observed_value(obs, "rows_out")
        if rows is None:
            # AQE elides the observed subtree exactly when the write's
            # input is empty, so None means ZERO rows written — the
            # old fallback counted the table partition, which still
            # holds stale rows from a crashed prior write: it returned
            # a nonzero rows_out AND skipped the truncation below,
            # committing resurrected (possibly tombstone-deleted) rows
            # with a wrong lineage count (round-6 ADVICE, medium).
            rows = 0
        # Dynamic overwritePartitions with an EMPTY input replaces
        # nothing — stale rows from a crashed prior write of this
        # bucket would stay visible (resurrecting tombstone-deleted
        # docs). Truncate the partition explicitly when this write
        # produced zero rows.
        if int(rows) == 0 and existed:
            self.spark.sql(f"DELETE FROM {self.table} "
                           f"WHERE bucket = {int(bucket)}")
        return int(rows)

    def commit(self, lineage: Lineage) -> None:
        lineage.seq = self._next_seq()
        self.spark.createDataFrame([lineage.__dict__], _LINEAGE_SCHEMA) \
            .writeTo(self.lineage_table).append()

    def read_committed(self, spark: SparkSession) -> DataFrame:
        committed = list(self.committed_buckets())
        if not committed:
            raise ValueError("no committed buckets")
        return (spark.table(self.table)
                .where(F.col("bucket").isin(committed)).drop("bucket"))

    def pending_tombstones(self, bucket: int) -> List[str]:
        if not self.spark.catalog.tableExists(self.tombstone_table):
            return []
        return sorted(r["doc_id"] for r in self.spark
                      .table(self.tombstone_table)
                      .where(F.col("bucket") == bucket).collect())

    def clear_tombstones(self, bucket: int) -> None:
        self.spark.sql(f"DELETE FROM {self.tombstone_table} "
                       f"WHERE bucket = {int(bucket)}")

    def delete_docs(self, spark: SparkSession, doc_ids: Iterable[str],
                    buckets: int) -> int:
        ids = [str(d) for d in doc_ids]
        done = self.committed_buckets()
        per_bucket = bucket_of_ids(spark, ids, buckets)
        hit = [b for b in sorted(per_bucket) if b in done]
        # Uncommitted buckets: tombstone instead of DELETE — the data
        # isn't in the table yet, and a resume would otherwise reprocess
        # the deleted docs back in from the ingested input.
        pend = [(b, i) for b in sorted(per_bucket) if b not in done
                for i in per_bucket[b]]
        if pend:
            spark.createDataFrame(pend, "bucket int, doc_id string") \
                .writeTo(self.tombstone_table).append()
        if not hit:
            return 0
        # Iceberg row-level DELETE: one atomic snapshot, only the affected
        # partitions' files rewritten (copy-on-write) or delete files added
        # (merge-on-read). Ids are SQL-escaped ('' doubling) — a quote in a
        # doc_id must not break or inject into the statement.
        id_list = ", ".join("'{}'".format(i.replace("'", "''"))
                            for i in ids)
        bucket_list = ", ".join(str(int(b)) for b in hit)
        t0 = time.monotonic()
        spark.sql(f"DELETE FROM {self.table} "
                  f"WHERE doc_id IN ({id_list}) "
                  f"AND bucket IN ({bucket_list})")
        latency = round((time.monotonic() - t0) * 1000, 3)
        # Keep the two store implementations' delete contracts symmetric:
        # ManifestStore records a delete:<run_id> lineage row per rewritten
        # bucket and advances the snapshot; mirror that here.
        snap = self.snapshot_id()
        now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        for b in hit:
            prev = done[b]
            rows_out = (spark.table(self.table)
                        .where(F.col("bucket") == b).count())
            self.commit(Lineage(
                run_id=f"delete:{prev['run_id']}",
                partition_id=b,
                snapshot_id=snap,
                rows_in=prev["rows_out"],
                rows_out=rows_out,
                latency_ms=latency,
                committed_at=now,
            ))
        return len(hit)
