"""Payload-axis two-cluster-size scaling evidence (graft axes A+B).

`BENCH/bench_scaling.py` evidences the north rule's N->4N criterion on
the frontier scheduler (axis A); this harness runs the same
methodology over the IMAGE payload chain (axis B): fetch -> real
PNG/JPEG decode -> phash -> visual features -> EXIF parse, all
Arrow-batched mapInPandas with zero Exchange. Because the chain never
shuffles, its scaling ceiling is the host's, not the plan's — this
harness measures that claim instead of asserting it.

Methodology (inherited from bench_scaling.py): each level runs in a
fresh subprocess JVM, cpuset-bound via `taskset` to exactly `cores`
CPUs at SCALE_CPUSET_BASE (default 24 — off the IRQ-taxed low cores),
heap proportional at SCALE_HEAP_PER_CORE_G (default 3) GB/core, one
in-process warm-up rep discarded, median of `reps` reported.

    python BENCH/bench_multimodal_scaling.py [n_images] [reps] [N] [4N]

Defaults: 6000 images, 3 reps, 2 -> 8 cores (the pair for which this
host has genuinely independent hardware — see scaling_run_4_16.md for
why 4->16 measures SMT core-sharing instead). Writes
BENCH/multimodal_scaling.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = """
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from python_crawler_spark.session import get_spark
from python_crawler_spark.operators.multimodal import (
    extract_image_exif, extract_image_features, fetch_and_decode_images,
)

cores, n, reps = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark(
    app_name="mm-scale", parallelism=cores, shuffle_partitions=cores,
    extra_conf={{"spark.driver.extraJavaOptions":
                 f"-XX:ActiveProcessorCount={{cores}}"}},
)
urls = spark.range(n).selectExpr(
    "concat('http://img.example.invalid/bench/', CAST(id AS STRING), '.bin') AS src"
)

def build():
    return extract_image_exif(
        extract_image_features(fetch_and_decode_images(urls, "src"))
    ).drop("bytes")

build().write.format("noop").mode("overwrite").save()  # warm-up, discarded
times = []
for _ in range(reps):
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    times.append(time.time() - t0)
print("RESULT " + json.dumps({{"times": times}}))
spark.stop()
"""


def run_level(cores: int, n: int, reps: int) -> dict:
    env = dict(os.environ)
    per_core_g = int(env.get("SCALE_HEAP_PER_CORE_G", "3"))
    env["SPARK_DRIVER_MEMORY"] = f"{per_core_g * cores}g"
    env["PYSPARK_PYTHON"] = sys.executable
    cmd = [sys.executable, "-c", CHILD.format(repo=str(REPO)),
           str(cores), str(n), str(reps)]
    base = int(env.get("SCALE_CPUSET_BASE", "24"))
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"{base}-{base + cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=3600, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(
        f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    import time as _time

    res: dict = {"n_images": n, "reps": reps}
    for cores in (lo, hi):
        _time.sleep(10)
        r = run_level(cores, n, reps)
        med = statistics.median(r["times"])
        res[str(cores)] = {
            "median_sec": round(med, 2),
            "times": [round(t, 2) for t in r["times"]],
            "images_per_sec": round(n / med, 1),
        }
        print(f"local[{cores}]: median {med:.1f}s -> {n/med:,.1f} img/s "
              f"(runs: {[f'{t:.1f}' for t in r['times']]})")
    eff = (res[str(hi)]["images_per_sec"] / res[str(lo)]["images_per_sec"]) / (hi / lo)
    res["efficiency"] = round(eff, 2)
    res["pair"] = f"{lo}->{hi}"
    print(f"payload-axis scaling efficiency ({lo} -> {hi} cores): {eff:.2f}")
    with open(Path(__file__).parent / "multimodal_scaling.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
