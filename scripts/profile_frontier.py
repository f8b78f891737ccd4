"""Stage-level wall-clock profile of the frontier scheduling pipeline.

Times cumulative prefixes of the exact stage chain
`bench_frontier.timed_schedule` runs, so stage cost = delta between
consecutive prefixes (each prefix forced through the noop sink). Use to
decide WHERE the next optimization goes instead of guessing.

    python scripts/profile_frontier.py [n_urls] [cores]

Defaults: 8,000,000 URLs on local[32] (the bench's sf0.1 shape).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from python_crawler_spark import bench_frontier as bf  # noqa: E402
from python_crawler_spark.functions.hashing import bucket_col  # noqa: E402
from python_crawler_spark.functions.urls import canonicalize_split, host_col  # noqa: E402
from python_crawler_spark.operators import gating  # noqa: E402
from python_crawler_spark.operators.dedup import (  # noqa: E402
    batch_first_occurrence,
    dedup_against_seen,
)
from python_crawler_spark.operators.scheduler import (  # noqa: E402
    PRIORITY_COLS,
    CheckpointHandle,
    free_schedule_checkpoints,
    schedule,
)
from python_crawler_spark.parse.udfs import canonicalize_urls_udf  # noqa: E402
from python_crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(app_name="profile-frontier", parallelism=cores,
                      shuffle_partitions=cores)
    state = bf.prepare_state(spark, n)
    frontier, seen, filters, rules, filters_bytes = state

    # Checkpoints created while BUILDING the stage list (the eager
    # pre-schedule localCheckpoint and schedule()'s internal one) must
    # outlive every timing rep: localCheckpoint truncates lineage, so
    # freeing them while the lazily-held '+schedule' plan is still to
    # be timed crashes that plan with a missing-checkpoint-block error
    # (ADVICE r3 #1). Track them here; free AFTER the last stage.
    sched_ckpt = CheckpointHandle()
    build_ckpt_ids: set[int] = set()

    def stages():
        """Yield (name, DataFrame) for each cumulative prefix."""
        f = canonicalize_split(frontier, canonicalize_urls_udf)
        yield "canonicalize", f
        f = f.withColumn("key_hash", F.xxhash64("canon_url")).drop("canon_url")
        f = f.withColumn("bucket", bucket_col(F.col("key_hash"), bf.N_BUCKETS))
        f = f.withColumn("host", host_col(F.col("url"))).drop(
            "title", "summary", "cover", "name"
        )
        yield "+hash/bucket/host", f
        f = gating.robots_gate(f, rules)
        yield "+robots_gate", f
        f = batch_first_occurrence(f, "key_hash", ["source"] + PRIORITY_COLS[1:])
        yield "+first_occurrence", f
        f = dedup_against_seen(
            f, seen, filters, seen_unique=True, filters_total_bytes=filters_bytes
        )
        yield "+seen_anti_join", f
        pre = bf._persistent_rdd_ids(spark)
        f = f.localCheckpoint(eager=True)
        build_ckpt_ids.update(bf._persistent_rdd_ids(spark) - pre)
        plan = schedule(f, n_salts=32,
                        n_range_partitions=spark.sparkContext.defaultParallelism * 2,
                        handle=sched_ckpt)
        yield "+schedule", plan

    # Warm-up full pipeline twice (JIT + Arrow workers), then time each
    # prefix fresh (median of 3).
    for _ in range(2):
        bf.timed_schedule(spark, state)

    prev = 0.0
    print(f"{'stage':24s} {'cum_s':>8s} {'delta_s':>8s}")
    for name, df in list(stages()):
        reps = []
        for _ in range(3):
            pre = bf._persistent_rdd_ids(spark)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
            # free only blocks THIS rep created; the build-time
            # checkpoints stay live for the stages still to come
            bf._unpersist_rdds(spark, bf._persistent_rdd_ids(spark) - pre)
        cum = sorted(reps)[1]
        print(f"{name:24s} {cum:8.2f} {cum - prev:8.2f}")
        prev = cum
    free_schedule_checkpoints(spark, sched_ckpt)
    bf._unpersist_rdds(spark, build_ckpt_ids)
    spark.stop()


if __name__ == "__main__":
    main()
