"""TableIO — storage seam (parquet now, Iceberg when a catalog exists).

The design targets Iceberg (snapshot-pinned reads for resumability,
overwrite-by-partition for idempotent violation writes); the sandbox has no
Iceberg catalog jars, so the parquet backend implements the same interface
with directory-per-table + a `_snapshot` manifest file.  Swapping backends
is a constructor argument, not a code change.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt
        if fmt == "iceberg" and not spark.conf.get(
            "spark.sql.catalog.spark_catalog", None
        ):
            raise RuntimeError("iceberg backend requires a configured catalog")

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.table(name)
        return self.spark.read.parquet(self.path(name))

    def read_snapshot(self, name: str, snapshot_id: str | None = None) -> DataFrame:
        """Snapshot-pinned read. Iceberg: time-travel by snapshot-id.
        Parquet backend: snapshots are immutable directories."""
        if self.fmt == "iceberg" and snapshot_id:
            return self.spark.read.option("snapshot-id", snapshot_id).table(name)
        return self.read(name)

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> str:
        """Write a table; returns a snapshot id usable for pinned re-reads."""
        if self.fmt == "iceberg":
            df.writeTo(name).createOrReplace()
            return str(
                self.spark.sql(f"SELECT snapshot_id FROM {name}.snapshots ORDER BY committed_at DESC LIMIT 1")
                .first()[0]
            )
        df.write.mode(mode).parquet(self.path(name))
        snap = f"{int(time.time())}-{uuid.uuid4().hex[:8]}"
        with open(os.path.join(self.path(name), "_snapshot"), "w") as f:
            json.dump({"snapshot_id": snap}, f)
        return snap

    def snapshot_id(self, name: str) -> str | None:
        p = os.path.join(self.path(name), "_snapshot")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)["snapshot_id"]
        return None
