"""TableIO seam: snapshot-per-round table storage (SURVEY K6, O10-O11).

Production target is Iceberg (atomic snapshots, time travel); the
sandbox has no Iceberg jars, so this implements the same narrow API
over parquet directories plus a JSON manifest that is written LAST —
a round's snapshot is visible only once its manifest exists, giving
crash-consistent resume (the reference's analog is the id_log.txt
checkpoint, tianyan_crawler.py:173-176,226-230).

Layout:
  <root>/round=<r>/<table>/*.parquet
  <root>/round=<r>/manifest.json      (commit record, written last)
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _round_dir(self, r: int) -> Path:
        return self.root / f"round={r}"

    def write_round(self, r: int, tables: dict[str, DataFrame], meta: dict) -> None:
        """Write all tables for round r, then commit the manifest."""
        rdir = self._round_dir(r)
        written = {}
        for name, df in tables.items():
            path = str(rdir / name)
            df.write.mode("overwrite").parquet(path)
            written[name] = path
        manifest = {"round": r, "tables": written, **meta}
        tmp = rdir / "manifest.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        tmp.rename(rdir / "manifest.json")  # atomic commit point

    def latest_round(self) -> int | None:
        """Highest round with a committed manifest (crash-safe)."""
        best = None
        for d in self.root.glob("round=*"):
            if (d / "manifest.json").exists():
                r = int(d.name.split("=", 1)[1])
                best = r if best is None or r > best else best
        return best

    def manifest(self, r: int) -> dict:
        return json.loads((self._round_dir(r) / "manifest.json").read_text())

    def read(self, spark: SparkSession, r: int, name: str) -> DataFrame:
        return spark.read.parquet(str(self._round_dir(r) / name))

    def has_table(self, r: int, name: str) -> bool:
        return name in self.manifest(r)["tables"]
