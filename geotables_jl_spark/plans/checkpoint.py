"""Snapshot checkpoints: resumable stages with per-partition lineage.

North-star requirement: "all stages are resumable from Iceberg snapshot
checkpoints with per-partition lineage and row-count metrics logged".
This container has no Iceberg catalog, so snapshots are modeled the way
Iceberg models them — an immutable data directory plus a manifest that
commits it atomically:

- a stage writes parquet to ``<root>/<stage>/data`` with a
  ``_lineage_part`` column (the producing task's partition id);
- per-partition row counts + schema + input fingerprint go into
  ``<root>/<stage>/_MANIFEST.json``, written AFTER the data and moved
  into place atomically (rename) — a crash mid-write leaves no
  manifest, so the stage simply recomputes on resume (same contract as
  an uncommitted Iceberg snapshot);
- resume = if a manifest exists and its fingerprint matches the
  caller's current inputs, read the parquet back instead of recomputing
  (snapshot read), else recompute and commit a new snapshot.

Swapping the parquet+manifest pair for ``df.writeTo(table)`` +
snapshot-id bookkeeping is a sink change only — the stage API and
lineage/metrics contract stay identical.

Metrics land in ``<root>/metrics.jsonl`` (one line per stage commit /
resume hit) for the run-level observability the north star asks for.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COL = "_lineage_part"


class Checkpointer:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "run"):
        self.spark = spark
        self.root = os.path.join(root, run_id)
        os.makedirs(self.root, exist_ok=True)

    # -- public API ---------------------------------------------------------

    def stage(self, name: str, fingerprint: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Run (or resume) one stage.

        ``fingerprint`` identifies the stage's logical inputs (upstream
        snapshot ids, parameters, code version); a committed snapshot
        with the same fingerprint is reused without recompute.
        """
        manifest = self._manifest_path(name)
        data_dir = os.path.join(self.root, name, "data")
        existing = self._read_manifest(manifest)
        if existing is not None and existing.get("fingerprint") == fingerprint:
            self._log(name, "resume_hit", existing)
            return self.spark.read.parquet(data_dir)

        t0 = time.time()
        df = build()
        if LINEAGE_COL not in df.columns:
            df = df.withColumn(LINEAGE_COL, F.spark_partition_id())
        df.write.mode("overwrite").parquet(data_dir)

        out = self.spark.read.parquet(data_dir)
        part_counts = {
            str(r[LINEAGE_COL]): r["cnt"]
            for r in out.groupBy(LINEAGE_COL).agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        meta = {
            "stage": name,
            "fingerprint": fingerprint,
            "rows": int(sum(part_counts.values())),
            "partitions": len(part_counts),
            "partition_rows": part_counts,
            "schema": out.schema.simpleString(),
            "wall_sec": round(time.time() - t0, 3),
            "committed_at": time.time(),
        }
        self._commit_manifest(manifest, meta)
        self._log(name, "commit", meta)
        return out

    def invalidate(self, name: str) -> None:
        m = self._manifest_path(name)
        if os.path.exists(m):
            os.remove(m)

    def manifest(self, name: str) -> dict | None:
        return self._read_manifest(self._manifest_path(name))

    # -- internals ----------------------------------------------------------

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, name, "_MANIFEST.json")

    @staticmethod
    def _read_manifest(path: str) -> dict | None:
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None  # torn manifest == uncommitted snapshot

    @staticmethod
    def _commit_manifest(path: str, meta: dict) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, path)  # atomic commit

    def _log(self, name: str, event: str, meta: dict) -> None:
        line = {
            "ts": time.time(),
            "stage": name,
            "event": event,
            "rows": meta.get("rows"),
            "partitions": meta.get("partitions"),
        }
        with open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(line) + "\n")
