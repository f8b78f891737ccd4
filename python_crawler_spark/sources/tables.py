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
from pyspark.sql import functions as F


_LINEAGE_BUCKETS = 64  # checksum partitioning constant, not a run config


def _partition_lineage(df: DataFrame) -> dict | None:
    """Per-bucket lineage record for a snapshot state table: row count
    + order-independent XOR checksum per bucket. Hash-bucketed tables
    (seen, fetch_log) use their native (bucket, key_hash); URL-keyed
    tables without those columns (the frontier) derive
    bucket=pmod(xxhash64(url), 64) and checksum xxhash64(all columns),
    so a dropped row OR a mutated column flips the XOR. O(#buckets)
    driver data (bucket count is a constant, never row-proportional),
    so this scales to any frontier size. North_rule: 'resumes with
    per-partition lineage and fetch/dedup metrics'."""
    if "bucket" in df.columns and "key_hash" in df.columns:
        bucket, csum = F.col("bucket"), F.col("key_hash")
    elif "url" in df.columns:
        bucket = F.pmod(F.xxhash64("url"), F.lit(_LINEAGE_BUCKETS))
        # MAP columns are not hashable in Spark (same map, different
        # hashcode) — checksum over every non-MAP column
        hashable = [
            f.name for f in df.schema.fields if "MapType" not in f.dataType.__repr__()
        ]
        csum = F.xxhash64(*[F.col(c) for c in hashable])
    else:
        return None
    rows = (
        df.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), F.bit_xor(csum).alias("x"))
        .collect()
    )
    return {str(r["bucket"]): [int(r["n"]), int(r["x"])] for r in rows}


class SnapshotStore:
    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _round_dir(self, r: int) -> Path:
        return self.root / f"round={r}"

    def write_round(self, r: int, tables: dict[str, DataFrame], meta: dict) -> None:
        """Write all tables for round r, then commit the manifest.
        Hash-bucketed state tables (frontier/seen) get a per-partition
        lineage record in the manifest — count + key_hash XOR per
        bucket — so a resume can verify partition integrity before
        trusting the snapshot (:meth:`verify_round`)."""
        rdir = self._round_dir(r)
        written = {}
        lineage = {}
        for name, df in tables.items():
            path = str(rdir / name)
            df.write.mode("overwrite").parquet(path)
            written[name] = path
            lin = _partition_lineage(df)
            if lin is not None:
                lineage[name] = lin
        manifest = {"round": r, "tables": written, "lineage": lineage, **meta}
        tmp = rdir / "manifest.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        tmp.rename(rdir / "manifest.json")  # atomic commit point

    def verify_round(self, spark: SparkSession, r: int) -> None:
        """Recompute every lineage-tracked table's per-bucket (count,
        key_hash XOR) from the stored parquet and compare to the
        manifest — raises ValueError naming the first diverging
        (table, bucket) on corruption/truncation."""
        recorded = self.manifest(r).get("lineage", {})
        for name, want in recorded.items():
            got = _partition_lineage(self.read(spark, r, name))
            if got != want:
                bad = sorted(
                    set(want) ^ set(got)
                    | {b for b in set(want) & set(got) if want[b] != got[b]}
                )
                raise ValueError(
                    f"snapshot round={r} table={name}: per-partition lineage "
                    f"mismatch at buckets {bad[:5]}"
                )

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
