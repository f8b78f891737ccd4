"""Synthetic-frontier scheduler benchmark (BASELINE.json::metric).

Generates an N-URL frontier entirely on executors (spark.range — the
10^10 production frontier is generated exactly the same way, never
materialized on the driver), pre-seeds a seen set, then runs the real
pipeline stages under measurement:

  canonicalize (JVM fast path; Arrow UDF only for irregular URLs) ->
  xxhash64/bucket (JVM) -> robots gate ->
  within-batch first-occurrence dedup -> bloom prefilter + exact
  anti-join vs seen -> priority schedule (distributed global
  rank/prefix-sum + salted per-host politeness windows)

Throughput = input URLs / wall seconds. Hosts are deliberately skewed
(half of all URLs share one hot host, mirroring the reference where
every weixin article lives on mp.weixin.qq.com) so the salted windows
and AQE skew handling are actually exercised.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import bucket_col
from .functions.urls import canonicalize_split, host_col
from .operators import gating
from .operators.dedup import batch_first_occurrence, build_bloom_filters, dedup_against_seen
from .operators.scheduler import (
    PRIORITY_COLS,
    SOURCE_RANK,
    CheckpointHandle,
    free_schedule_checkpoints,
    packed_dedup_order_col,
    schedule,
)
from .parse.udfs import canonicalize_urls_udf
from .plans.crawl import crawl_delay_col

N_BUCKETS = 64


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of all RDDs currently holding persisted/checkpointed blocks
    (JVM-side; includes localCheckpoint blocks that the catalog
    CacheManager does not track)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def _unpersist_rdds(spark: SparkSession, ids: set[int]) -> None:
    """Free the blocks of the given persisted RDD ids (non-blocking)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in jmap.keySet().toArray():
        if int(rid) in ids:
            jmap.get(rid).unpersist(False)


def synthetic_frontier(spark: SparkSession, n: int, dup_frac: float = 0.1) -> DataFrame:
    """N frontier rows, generated on executors. ~dup_frac of rows are
    exact duplicates (same URL twice) to exercise batch dedup; hosts
    are skewed: even ids -> one hot host, odd ids spread over 1000."""
    uniq = int(n * (1 - dup_frac))
    df = spark.range(0, n).withColumn("uid", F.col("id") % uniq)
    host = F.when(
        F.col("uid") % 2 == 0, F.lit("hot.example.com")
    ).otherwise(F.concat(F.lit("h"), (F.col("uid") % 1000).cast("string"), F.lit(".example.com")))
    src = F.element_at(
        F.array(F.lit("weixin"), F.lit("chuansongmen"), F.lit("tianyan")),
        (F.col("uid") % 3 + 1).cast("int"),
    )
    return df.select(
        F.concat(F.lit("http://"), host, F.lit("/n/"), F.col("uid").cast("string")).alias("url"),
        src.alias("source"),
        F.lit("bench").alias("name"),
        (F.col("uid") % 100000).cast("int").alias("seed_id"),
        (F.col("uid") % 100000).cast("int").alias("line_no"),
        F.lit(2).alias("stage"),
        ((F.col("uid") / 100000).cast("long") % 50).cast("int").alias("page_no"),
        (F.col("uid") % 12).cast("int").alias("link_idx"),
        F.lit(0).alias("attempt"),
        F.lit(1).alias("depth"),
        F.lit("").alias("title"),
        F.lit("").alias("summary"),
        F.lit("").alias("cover"),
    ).withColumn("crawl_delay", crawl_delay_col(F.col("source"), F.col("stage"), F.col("url")))


def pre_seen(spark: SparkSession, n: int, frac: float = 0.05) -> DataFrame:
    """Pre-populate the seen set with the first `frac` of unique URLs
    (same construction as synthetic_frontier even ids)."""
    k = int(n * frac)
    df = spark.range(0, k)
    host = F.when(
        F.col("id") % 2 == 0, F.lit("hot.example.com")
    ).otherwise(F.concat(F.lit("h"), (F.col("id") % 1000).cast("string"), F.lit(".example.com")))
    url = F.concat(F.lit("http://"), host, F.lit("/n/"), F.col("id").cast("string"))
    return df.select(
        F.xxhash64(url).alias("key_hash"),
        url.alias("url"),
        url.alias("dedup_key"),
        F.lit(0).alias("round"),
    ).withColumn("bucket", bucket_col(F.col("key_hash"), N_BUCKETS))


def prepare_state(spark: SparkSession, n: int, use_bloom: bool = True):
    """Materialize the benchmark's input + state once: the frontier
    candidates, the historical seen set, its Bloom filters, the rules
    table. State is maintained incrementally across rounds in
    production — building it is not part of the per-round work the
    URLs/sec metric measures."""
    frontier = synthetic_frontier(spark, n).localCheckpoint(eager=True)
    seen = pre_seen(spark, n).localCheckpoint(eager=True)
    rules = gating.rules_df(spark)
    filters = None
    filters_bytes = 0
    if use_bloom:
        filters = build_bloom_filters(seen).localCheckpoint(eager=True)
        filters_bytes = int(filters.agg(F.sum(F.expr("m_bits / 8"))).first()[0] or 0)
    return frontier, seen, filters, rules, filters_bytes


def timed_schedule(
    spark: SparkSession,
    state,
    n_salts: int = 32,
    n_range_partitions: int | None = None,
) -> tuple[float, int]:
    """One timed pass of the scheduling pipeline over prepared state.
    Returns (seconds, scheduled_urls).

    Shuffled rows are pruned to what the schedule needs (the string
    key columns are dropped once key_hash exists — at 10^10 rows the
    difference is terabytes of shuffle)."""
    frontier, seen, filters, rules, filters_bytes = state
    if n_range_partitions is None:
        n_range_partitions = spark.sparkContext.defaultParallelism * 2
    t0 = time.time()
    f = canonicalize_split(frontier, canonicalize_urls_udf)
    f = f.withColumn("key_hash", F.xxhash64("canon_url")).drop("canon_url")
    f = f.withColumn("bucket", bucket_col(F.col("key_hash"), N_BUCKETS))
    f = f.withColumn(
        "host", host_col(F.col("url"))
    ).drop("title", "summary", "cover", "name")
    f = gating.robots_gate(f, rules)
    f = batch_first_occurrence(
        f,
        "key_hash",
        ["source"] + PRIORITY_COLS[1:],
        order_col=packed_dedup_order_col(sorted(SOURCE_RANK)),
    )
    new = dedup_against_seen(
        f, seen, filters, seen_unique=True, filters_total_bytes=filters_bytes
    )
    # Materialize the deduped frontier ONCE: this is the round's
    # surviving-candidate set (written as frontier state in production
    # anyway). Without it, the scheduler's percentile-bounds job, its
    # offsets pass, and its window pass would each re-execute the whole
    # canonicalize+dedup chain (correct either way since round 5 — the
    # bucket is a pure row function — but 3x the work).
    pre_ckpt_ids = _persistent_rdd_ids(spark)
    new = new.localCheckpoint(eager=True)
    ckpt = CheckpointHandle()
    plan = schedule(
        new, n_salts=n_salts, n_range_partitions=n_range_partitions, handle=ckpt
    )
    # Force EVERY schedule column with a noop sink. (A count() action
    # lets Catalyst prune the window operators entirely — the plan for
    # count(plan) contains no Window nodes — so counting would time a
    # pipeline that never computes ref_seq/host_scheduled_at at all.)
    plan.write.format("noop").mode("overwrite").save()
    scheduled = new.count()  # reads the localCheckpoint: no recompute
    dt = time.time() - t0
    # localCheckpoint blocks live at the RDD level, OUTSIDE the catalog
    # CacheManager — the ContextCleaner frees them only after GC, so
    # repeated timed reps would briefly accumulate ~0.85*N-row
    # checkpoint blocks (this rep's `new` — since round 4 the scheduler
    # itself materializes nothing), skewing the very timings being
    # measured. Unpersist exactly the RDDs this rep checkpointed
    # (never the long-lived seen/filters state).
    _unpersist_rdds(spark, _persistent_rdd_ids(spark) - pre_ckpt_ids)
    free_schedule_checkpoints(spark, ckpt)  # this rep's scheduler blocks only
    return dt, scheduled


def run_schedule_pipeline(
    spark: SparkSession,
    n: int,
    use_bloom: bool = True,
    n_salts: int = 32,
    n_range_partitions: int | None = None,
) -> tuple[float, int, int]:
    """Convenience: prepare state and run one timed pass.
    Returns (seconds, input_urls, scheduled_urls)."""
    state = prepare_state(spark, n, use_bloom)
    dt, scheduled = timed_schedule(spark, state, n_salts, n_range_partitions)
    return dt, n, scheduled
