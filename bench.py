"""Per-round benchmark harness (driver contract).

Runs the headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
synthetic-frontier scheduler throughput bench (the BASELINE.json
target metric), and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is total wall seconds across the headline queries (lower is
better); `frontier_urls_per_sec` reports the scheduler throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_crawler_spark.bench_frontier import run_schedule_pipeline  # noqa: E402
from python_crawler_spark.queries import QUERIES  # noqa: E402
from python_crawler_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "frontier_schedule", "politeness_topk", "first_occurrence", "sessionize",
    "anti_join_dedup", "exact_dedup_docs", "minhash_near_dup", "simhash_dedup",
    "cosine_topk", "token_quality", "tpch_q1", "star_join_revenue",
    "salted_skew_agg", "hourly_window_agg", "url_kernel",
]

FRONTIER_N = int(os.environ.get("BENCH_FRONTIER_N", "8000000"))

# Effective partition parallelism cap. The sandbox VM advertises 32
# vCPUs with no SMT topology, but delivers ~16 independent cores'
# throughput: the 8M-URL schedule runs in 19.9s with 16-way partitions
# vs 35.7s with 32-way (sibling-thread thrash on sorts/shuffles).
# Override with SPARK_GRAFT_EFF_CPUS.
EFF_CPUS = int(os.environ.get("SPARK_GRAFT_EFF_CPUS", "16"))


def _jvm_cpu_seconds(spark) -> float:
    """Cumulative CPU seconds of the local-mode JVM (all executor
    threads), read from /proc. Printed per frontier rep so a slow rep
    is attributable: wall up + CPU flat = host steal (another tenant
    on this shared-silicon guest), wall up + CPU up = the job itself.

    The gateway JVM's pid comes from RuntimeMXBean.getName() ("pid@
    host") via py4j — exact regardless of how many wrapper processes
    (spark-submit, shell) sit between the Python driver and the JVM
    (ADVICE r4: the old PPID==driver match silently returned NaN
    whenever the JVM was a grandchild)."""
    try:
        jvm_pid = int(
            spark._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean()
            .getName()
            .split("@")[0]
        )
        with open(f"/proc/{jvm_pid}/stat") as fh:
            raw = fh.read()
        parts = raw.rsplit(")", 1)[1].split()
        utime, stime = int(parts[11]), int(parts[12])
        return (utime + stime) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return float("nan")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    # Partition count is sized to EFFECTIVE cores, not advertised vCPUs
    # (see EFF_CPUS above). The master stays local[cpus] (the driver
    # contract); fewer partitions simply bound task concurrency.
    eff = min(cpus, EFF_CPUS)
    spark = get_spark(
        app_name="pcs-bench",
        parallelism=cpus,
        shuffle_partitions=eff,
        extra_conf={"spark.default.parallelism": str(eff)},
    )

    def run_full(df) -> None:
        # noop sink forces every output column; a count() action would
        # let Catalyst prune window/projection stages out of the plan
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM/Arrow/codegen paths once so numbers measure the
    # operators, not session startup or whole-stage-codegen JIT
    run_full(QUERIES["tpch_q1"](spark, sf_dir))
    run_schedule_pipeline(spark, 500_000)

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        run_full(QUERIES[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)

    # prepare the frontier/seen/bloom state once, run one warm-up pass
    # (JIT + Arrow workers for THIS state shape), then time the second
    # pass — matching BENCH/bench_scaling.py methodology
    from python_crawler_spark.bench_frontier import prepare_state, timed_schedule

    state = prepare_state(spark, FRONTIER_N)
    # 3 warm-up passes excluded, matching BENCH/bench_scaling.py: this
    # JVM's C2 JIT settles slowly on the schedule plan, and the first
    # post-warm reps still drift on a shared-silicon guest
    for _ in range(3):
        timed_schedule(spark, state)
    # median of 5: this VM shows ±25% rep-to-rep spread (JIT/GC/other
    # tenants), and early reps settle slowly — 3 reps let one bad rep
    # drag the median (BENCH/BASELINE.md methodology notes)
    raw = []
    cpu_per_rep = []
    for _ in range(5):
        c0 = _jvm_cpu_seconds(spark)
        raw.append(timed_schedule(spark, state))
        cpu_per_rep.append(round(_jvm_cpu_seconds(spark) - c0, 1))
    print(
        f"frontier reps: wall {[round(r[0], 2) for r in raw]}"
        f" cpu {cpu_per_rep}",
        file=sys.stderr,
    )
    reps = sorted(raw)
    fdt, fsched = reps[2]
    fn = FRONTIER_N
    times["frontier_pipeline"] = round(fdt, 3)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "frontier_urls": fn,
        "frontier_scheduled": fsched,
        "frontier_urls_per_sec": round(fn / fdt, 1),
        "cpus": cpus,
    }
    payload = json.dumps(out)

    # Driver-proof emission (round-2 failure: BENCH_r02.json parsed:null).
    # Local-mode shutdown floods stdout/stderr with a
    # RejectedExecutionException storm from executor pools tearing down,
    # pushing the metric JSON out of the driver's tail-capture window. So:
    #   1. persist the metric to BENCH/result.json (file survives any noise),
    #   2. stop Spark with BOTH real fds (1 and 2) pointed at /dev/null —
    #      the JVM writes to the raw descriptors, so contextlib redirect
    #      is not enough,
    #   3. restore fds, print the JSON as the final stdout line,
    #   4. os._exit(0) so no late JVM/daemon thread can print after it.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "result.json"), "w") as fh:
        fh.write(payload + "\n")

    print(payload, flush=True)  # early copy in case shutdown hangs entirely
    sys.stdout.flush()
    sys.stderr.flush()
    saved_out, saved_err = os.dup(1), os.dup(2)
    devnull = os.open(os.devnull, os.O_WRONLY)
    os.dup2(devnull, 1)
    os.dup2(devnull, 2)
    try:
        # Drain persistent blocks with BLOCKING unpersists first: the
        # per-rep cleanup uses unpersist(blocking=False), and a stop()
        # racing those still-in-flight continuations shut their
        # single-thread pool down mid-future — the
        # RejectedExecutionException storm in every r3/r4 bench tail
        # (VERDICT r4 'What's wrong' #5). A synchronous drain
        # serializes behind the queued removals, so stop() finds the
        # pools idle. (Note the fd redirect below only silences the
        # PYTHON side; the JVM child owns its own fd 2, so the storm
        # had to be prevented, not redirected.)
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist(True)
        spark.sparkContext.setLogLevel("OFF")
        spark.stop()
        time.sleep(1.0)  # let async shutdown threads finish their noise
    except Exception:
        pass
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os.dup2(saved_out, 1)
        os.dup2(saved_err, 2)
        os.close(devnull)
    print(payload, flush=True)  # guaranteed final line of stdout
    os._exit(0)


if __name__ == "__main__":
    main()
