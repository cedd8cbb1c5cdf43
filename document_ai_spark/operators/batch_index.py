"""Shared atomic-commit machinery for persisted operator indexes.

Both the MinHash sketch index (sketch_index.py) and the embedding
vector/codebook indexes (vector_index.py) persist per-batch parquet
directories under ``root/index/`` with the same discipline:

  * writes land in ``root/_staging/<batch>`` first and are atomically
    renamed into place — a crash mid-append leaves the index at the
    previous consistent snapshot;
  * each committed batch carries a ``_seq.json`` monotone sequence
    stamped at commit, so listing order is COMMIT order, not
    lexicographic batch names;
  * ``_meta.json`` pins the parameters that define on-disk
    joinability (band counts, k, format version, ...); opening with
    different parameters raises instead of silently producing rows
    that never join old ones.

Re-running an already-committed batch id is idempotent: subclasses
detect the existing ``_SUCCESS`` and replay against exactly the index
state the batch saw the first time (``index_df(before_seq=...)``).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List

from pyspark.sql import DataFrame, SparkSession


class AtomicBatchIndex:
    """Base: parameter pinning + atomic per-batch commits + seq order."""

    #: subclasses set: meta format version + row schema of index files
    FORMAT: int = 1
    SCHEMA: str = ""

    def __init__(self, root: str, params: Dict):
        self.root = root
        self.index_dir = os.path.join(root, "index")
        self.staging_dir = os.path.join(root, "_staging")
        for d in (self.index_dir, self.staging_dir):
            os.makedirs(d, exist_ok=True)
        meta_path = os.path.join(root, "_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            fmt = meta.get("format", 1)   # pre-versioning indexes are v1
            if fmt != self.FORMAT:
                raise ValueError(
                    f"index at {root} has on-disk format v{fmt}; this code "
                    f"writes v{self.FORMAT}. Rebuild the index — appending "
                    "would silently produce un-joinable rows.")
            for key, val in params.items():
                if meta.get(key) != val:
                    raise ValueError(
                        f"index at {root} was built with {key}="
                        f"{meta.get(key)!r}; cannot append with {key}={val!r}")
        else:
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({**params, "format": self.FORMAT}, f)
            os.rename(tmp, meta_path)
        self.params = dict(params)

    def _batch_seq(self, name: str) -> int:
        with open(os.path.join(self.index_dir, name, "_seq.json")) as f:
            return json.load(f)["seq"]

    def committed_batches(self) -> List[str]:
        """Committed batch names in COMMIT order."""
        done = [d for d in os.listdir(self.index_dir)
                if os.path.exists(os.path.join(self.index_dir, d,
                                               "_SUCCESS"))]
        return sorted(done, key=self._batch_seq)

    def index_df(self, spark: SparkSession,
                 before_seq: int = None) -> DataFrame:
        """Committed index rows; with ``before_seq``, only batches
        committed strictly earlier (what a replayed batch must see)."""
        paths = [os.path.join(self.index_dir, d)
                 for d in self.committed_batches()
                 if before_seq is None or self._batch_seq(d) < before_seq]
        if not paths:
            return spark.createDataFrame([], self.SCHEMA)
        return spark.read.parquet(*paths)

    def _next_seq(self) -> int:
        return 1 + max((self._batch_seq(d)
                        for d in self.committed_batches()), default=0)

    def _stage_paths(self, batch_id: str):
        return (os.path.join(self.staging_dir, batch_id),
                os.path.join(self.index_dir, batch_id))

    def _is_committed(self, batch_id: str) -> bool:
        return os.path.exists(
            os.path.join(self.index_dir, batch_id, "_SUCCESS"))

    def _stamp_seq(self, stage: str, seq: int) -> None:
        with open(os.path.join(stage, "_seq.json"), "w") as f:
            json.dump({"seq": seq}, f)

    def _commit(self, stage: str, final: str) -> None:
        import shutil
        shutil.rmtree(final, ignore_errors=True)
        os.rename(stage, final)

    # -- shared append skeleton ------------------------------------------
    # Every incremental index follows the same prologue/epilogue around
    # its find/score logic; subclasses compose these three instead of
    # re-spelling the replay discipline (a fix to the shared protocol
    # lands once, not per index).

    def _open_batch(self, spark: SparkSession, batch_id: str, build_fn):
        """Stage-or-replay prologue: materialize ``build_fn()`` (the
        batch's index rows) into staging — the parquet write IS the
        one-time materialization the find logic re-reads — or, on
        replay of a committed batch_id, reuse the committed files and
        the seq they were stamped with. Returns
        (rows_df, seq, replay, stage, final)."""
        stage, final = self._stage_paths(batch_id)
        replay = self._is_committed(batch_id)
        if replay:
            src, seq = final, self._batch_seq(batch_id)
        else:
            build_fn().write.mode("overwrite").parquet(stage)
            src = stage
            seq = self._next_seq()
            self._stamp_seq(stage, seq)
        return spark.read.parquet(src), seq, replay, stage, final

    def _has_prior(self, seq: int) -> bool:
        """Any batch committed strictly before ``seq`` (what a replayed
        or fresh batch may probe)."""
        return any(self._batch_seq(d) < seq
                   for d in self.committed_batches())

    def _close_batch(self, result_df: DataFrame, replay: bool,
                     stage: str, final: str) -> DataFrame:
        """Epilogue: materialize the result BEFORE the commit rename
        invalidates the staging path its lazy plan reads from, then
        commit (no-op on replay)."""
        out = result_df.localCheckpoint()
        if not replay:
            self._commit(stage, final)
        return out
