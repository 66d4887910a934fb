"""Parquet-backed table catalog with Iceberg-style snapshot semantics.

No Iceberg runtime jar ships in this sandbox (SURVEY.md §7), so this shim
provides the subset of table semantics the engine relies on — append-only
snapshots, snapshot lineage metadata, and time travel — over plain parquet
directories.  The API mirrors what the Iceberg writer would be
(``df.writeTo(tbl).append()``), so swapping in a real catalog is a writer
change, not a redesign.

Layout per table:
    <root>/<table>/_snapshots.jsonl       append-only snapshot log
    <root>/<table>/snap=<id>/*.parquet    one directory per snapshot

A snapshot record carries id, parent id, wall-clock, operation, row count
and schema — the lineage the north rule's checkpoint/metrics requirement
asks for, queryable as a DataFrame via ``snapshots_df``.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class Table:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.name = name
        os.makedirs(self.dir, exist_ok=True)

    @property
    def _log(self) -> str:
        return os.path.join(self.dir, "_snapshots.jsonl")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._log):
            return []
        with open(self._log) as f:
            return [json.loads(ln) for ln in f if ln.strip()]

    def current_snapshot(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def append(self, df: DataFrame, operation: str = "append") -> str:
        snap_id = uuid.uuid4().hex[:16]
        path = os.path.join(self.dir, f"snap={snap_id}")
        df.write.mode("errorifexists").parquet(path)
        spark = df.sparkSession
        n_rows = spark.read.parquet(path).count()
        parent = self.current_snapshot()
        rec = {
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "ts": time.time(),
            "operation": operation,
            "added_rows": n_rows,
            "schema": df.schema.simpleString(),
        }
        with open(self._log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return snap_id

    def overwrite(self, df: DataFrame) -> str:
        """Logical overwrite: a new snapshot that supersedes the lineage —
        readers at this snapshot see only the new data (history retained)."""
        return self.append(df, operation="overwrite")

    def _paths_for(self, snapshot_id: str | None) -> list[str]:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"table {self.name} has no snapshots")
        if snapshot_id is not None:
            upto = []
            for s in snaps:
                upto.append(s)
                if s["snapshot_id"] == snapshot_id:
                    break
            else:
                raise KeyError(f"unknown snapshot {snapshot_id}")
            snaps = upto
        # an overwrite truncates visible lineage at that snapshot
        visible: list[dict] = []
        for s in snaps:
            if s["operation"] == "overwrite":
                visible = [s]
            else:
                visible.append(s)
        return [os.path.join(self.dir, f"snap={s['snapshot_id']}") for s in visible]

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        """Latest view, or time travel to (the state as of) snapshot_id."""
        return spark.read.parquet(*self._paths_for(snapshot_id))

    def snapshots_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(s["snapshot_id"], s["parent_id"], float(s["ts"]), s["operation"],
              int(s["added_rows"]), s["schema"]) for s in self.snapshots()],
            "snapshot_id string, parent_id string, ts double, operation string, "
            "added_rows bigint, schema string")


class ParquetCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> Table:
        return Table(self.root, name)

    def list_tables(self) -> list[str]:
        return sorted(d for d in os.listdir(self.root)
                      if os.path.isdir(os.path.join(self.root, d)))
