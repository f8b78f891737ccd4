"""Subprocess worker for the parallelism-invariance test: run the full
crawl in a FRESH JVM at the given core count and dump the replay
artifacts as JSON.

Usage: python -m tests.parallel_probe <cores> <out_json>

A separate process per core count is the point — the scaling claim
(BASELINE.json north_rule: same output at N and 4N executors) needs two
genuinely different masters, not one session with different salt
counts.
"""

from __future__ import annotations

import hashlib
import json
import sys

from python_crawler_spark.plans.crawl import CrawlConfig, CrawlRun
from python_crawler_spark.session import get_spark
from python_crawler_spark.sources.worldgen import WorldSpec


def main(cores: int, out_path: str) -> None:
    spark = get_spark(
        app_name=f"parallel-probe-{cores}",
        parallelism=cores,
        shuffle_partitions=max(cores * 2, 4),
    )
    cfg = CrawlConfig(spec=WorldSpec(n_tianyan_seeds=6), n_buckets=4, n_salts=4)
    results = CrawlRun(spark, cfg).run()
    order = [
        (r["source"], r["url"], r["attempt"], r["ref_seq"], round(r["ref_virtual_ts"], 9))
        for r in results["fetch_order"]
        .select("source", "url", "attempt", "ref_seq", "ref_virtual_ts")
        .collect()
    ]
    seen = sorted(r["dedup_key"] for r in results["seen"].select("dedup_key").collect())
    # pixel/caption invariants (north_rule): per-image decoded-byte
    # digest + caption + phash + dims must be identical across cluster
    # sizes, not just the row count
    images = sorted(
        (
            r["image_id"],
            r["caption"],
            hashlib.md5(bytes(r["bytes"])).hexdigest(),
            int(r["phash"]),
            int(r["w"]),
            int(r["h"]),
            r["fmt"],
        )
        for r in results["images"]
        .select("image_id", "caption", "bytes", "phash", "w", "h", "fmt")
        .collect()
    )
    payload = {
        "cores": cores,
        "order": order,
        "seen": seen,
        "images": images,
        "n_articles": results["articles"].count(),
        "n_images": results["images"].count(),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
