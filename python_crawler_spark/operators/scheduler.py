"""Politeness scheduler (SURVEY §2.6, O1-O11).

The reference's fetch order is the sequential program order of three
single-threaded loops; its politeness budget is sleep() calls. Here:

- ordering is a SORT KEY, never task timing: the priority tuple
  (source_rank, line_no, stage, page_no, link_idx, attempt) totally
  orders all fetches exactly as the reference's nested loops would
  (O1 seed-file order, stage separates list/article phases, O2 DOM
  order via link_idx, O3 page order, O8 retries directly after their
  failed attempt);
- politeness delays are VIRTUAL TIME: cumulative sums of crawl_delay
  in priority order give each fetch its scheduled_at. Nothing sleeps;
  scheduler throughput is compute-bound (BASELINE.md note).

Two schedules are computed:
- ref_seq / ref_virtual_ts: per-source single-thread-equivalent clock,
  the oracle-comparable replay (O4-O7);
- host_rank / host_scheduled_at: per-(host, salt) queues — the
  schedule a distributed fetcher would honor; salting splits hot-host
  queues (all weixin articles share one host, weixin_public.py:39)
  into n_salts parallel polite queues (north_rule skew handling).

Scale note: a naive Window.partitionBy(source) puts ~all rows of a
10^10 frontier into a handful of partitions. global_rank_and_cumsum
below is the scalable replacement: range-repartition by the priority
tuple, rank + prefix-sum within each partition, then add broadcast
per-partition offsets (two jobs, no single-partition shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRIORITY_COLS = ["source_rank", "line_no", "stage", "page_no", "link_idx", "attempt"]

# Bit widths for packing the priority tuple into ONE non-negative
# BIGINT whose numeric order is exactly the tuple's lexicographic
# order. Every sort/comparator over the tuple (SortAggregate in
# first-occurrence dedup, the range partitioner, both window sorts)
# runs millions of comparisons; one long compare vs a 6-field struct
# compare measured ~35% off the dedup stage at 8M rows. Widths are
# deliberately generous for 10^10-URL scale and GUARDED: a field out
# of range raises rather than silently mis-ordering. 4+30+3+12+10+4 =
# 63 bits — the packed value stays non-negative in a signed 64-bit
# long.
# Widths give each field the guarded domain [-1, 2^bits - 2] (the +1
# bias in pack_order spends one code point on the -1 sentinel and the
# guard excludes the all-ones top value), so the usable maxima are one
# LESS than the naive 2^bits reading (ADVICE r4):
PRIORITY_WIDTHS = [
    ("source_rank", 4),   # ranks -1..14: 15 sources (3 known + sentinel today)
    ("line_no", 30),      # up to 2^30 - 2 = 1,073,741,822 seed lines per source
    ("stage", 3),         # stages -1..6
    ("page_no", 12),      # up to 4094 list pages
    ("link_idx", 10),     # up to 1022 links harvested per page
    ("attempt", 4),       # up to 14 retries
]


def pack_order(fields) -> "F.Column":
    """Pack ``[(column, bits, name), ...]`` (most-significant first)
    into one guarded BIGINT with the same lexicographic order as the
    tuple. Injective over in-range inputs, so ties in the packed value
    are exactly ties in the tuple. Each field is biased by +1 so the
    engine's ``-1`` sentinel (the seed/list row itself, ordered before
    link 0) packs as 0; the valid domain is [-1, 2^bits - 2].
    Out-of-range raises per row — fail loudly beats a silent
    mis-sort."""
    acc = F.lit(0).cast("long")
    for col, bits, name in fields:
        c = col.cast("long") + F.lit(1)
        guarded = F.when(
            c.isNull() | (c < 0) | (c >= (1 << bits)),
            F.raise_error(F.lit(f"pack_order: {name} out of [-1, 2^{bits}-2]")),
        ).otherwise(c)
        acc = F.shiftleft(acc, bits) + guarded
    return acc


def packed_priority_col() -> "F.Column":
    """The full priority tuple (PRIORITY_COLS, source_rank first) as
    one packed BIGINT — order-identical to sorting by the tuple."""
    return pack_order([(F.col(n), b, n) for n, b in PRIORITY_WIDTHS])


def lex_source_rank(sources: list[str]) -> "F.Column":
    """Rank of the ``source`` string within the LEXICOGRAPHICALLY
    sorted known-source list — substituting this rank for the string
    in a packed ordering preserves exactly the semantics of ordering
    by the string itself. Unknown sources raise — DELIBERATELY
    stricter than with_priority's shared sentinel rank (ADVICE r4):
    scheduling only needs unknown sources grouped after the known ones
    (ties there shift ref_seq labels, never which rows fetch), but
    first-occurrence dedup uses this rank to pick WHICH duplicate row
    survives, and a shared sentinel would make two distinct unknown
    sources compare equal — a nondeterministic winner. A new source
    must be added to SOURCE_RANK (one line) before its rows may reach
    dedup; failing loudly here beats silently unstable dedup output."""
    rank = None
    for i, s in enumerate(sorted(sources)):
        rank = (rank.when if rank is not None else F.when)(
            F.col("source") == s, F.lit(i)
        )
    return rank.otherwise(
        F.raise_error(F.concat(F.lit("lex_source_rank: unknown source "), F.col("source")))
    )


def packed_dedup_order_col(sources: list[str]) -> "F.Column":
    """Packed BIGINT ordering equivalent to the dedup order tuple
    (source string, line_no, stage, page_no, link_idx, attempt) —
    the ``["source"] + PRIORITY_COLS[1:]`` ordering every
    first-occurrence call site uses."""
    fields = [(lex_source_rank(sources), PRIORITY_WIDTHS[0][1], "source")]
    fields += [(F.col(n), b, n) for n, b in PRIORITY_WIDTHS[1:]]
    return pack_order(fields)

class CheckpointHandle:
    """Per-call registry of RDD ids a schedule() /
    global_rank_and_cumsum() call localCheckpointed. Since round 4 the
    scheduler checkpoints NOTHING (round 5: the bucket id is a pure
    function of the row against driver-collected literal bounds, so
    the offsets and window passes agree by construction — see
    global_rank_and_cumsum), so handles
    free zero blocks; the API is kept so call sites stay uniform and
    so any future materialization slots back into the same
    deterministic-free contract (free by handle, never a global
    drain — ADVICE r3 #2)."""

    __slots__ = ("rdd_ids",)

    def __init__(self) -> None:
        self.rdd_ids: list[int] = []


# Fallback registry for calls made WITHOUT a handle. A handle-less
# free_schedule_checkpoints(spark) drains this entire list, so the
# no-handle flow is only safe when a single caller at a time builds and
# materializes schedule plans (the original round-3 contract). Any
# caller that may overlap with another live schedule plan must pass its
# own CheckpointHandle. Single-threaded-driver assumption: the pre/post
# persistent-id diff that fills these registries is not safe against
# concurrent checkpointing jobs in the same JVM.
_ckpt_rdd_ids: list[int] = []


def _persistent_rdd_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def free_schedule_checkpoints(spark, handle: CheckpointHandle | None = None) -> int:
    """Unpersist checkpoint blocks registered by schedule() /
    global_rank_and_cumsum, deterministically (no GC dependence).

    With ``handle``: frees exactly that call's blocks (the safe,
    per-call path). Without: drains the module-global fallback registry
    — every no-handle call's blocks, whoever made them. Call AFTER the
    returned plan has been materialized (written / collected /
    checkpointed downstream); the blocks are only needed to compute
    that plan once. Returns how many RDDs were freed. Idempotent:
    already-collected ids are skipped."""
    registry = handle.rdd_ids if handle is not None else _ckpt_rdd_ids
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    freed = 0
    wanted = set(registry)
    for rid in jmap.keySet().toArray():
        if int(rid) in wanted:
            jmap.get(rid).unpersist(False)
            freed += 1
    registry.clear()
    return freed

SOURCE_RANK = {"weixin": 0, "chuansongmen": 1, "tianyan": 2}

# frontier stages: list/search pages fetch before any of their children
STAGE_ROOT = 0      # account root (csm) / search page (tianyan) / list (weixin)
STAGE_LIST = 1      # csm ?start= list pages
STAGE_CHILD = 2     # article / detail fetches


def with_priority(frontier: DataFrame) -> DataFrame:
    """Attach source_rank; the rest of the tuple is carried from
    frontier expansion (each child inherits line_no and gets its DOM
    position as link_idx — SURVEY O1-O4)."""
    rank = F.create_map(
        *[x for s, r in SOURCE_RANK.items() for x in (F.lit(s), F.lit(r))]
    )
    # Unknown sources must NOT collapse to NULL: a NULL rank would merge
    # them into one range-partition group whose offsets join misses
    # (NULL != NULL), duplicating ref_seq. Unmapped sources get a
    # sentinel rank after all known ones; ties broken by the rest of
    # the priority tuple.
    return frontier.withColumn(
        "source_rank",
        F.coalesce(rank[F.col("source")], F.lit(len(SOURCE_RANK))).cast("int"),
    )


def global_rank_and_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    partition_col: str | None = None,
    n_range_partitions: int = 32,
    rank_name: str = "seq",
    cumsum_name: str = "virtual_ts",
    handle: CheckpointHandle | None = None,
    bounds_sample: float | None = 0.05,
) -> DataFrame:
    """Distributed total-order rank + exclusive prefix sum.

    Within each ``partition_col`` group (e.g. source), computes
    rank_name = 1-based position in ``order_cols`` order and
    cumsum_name = sum of ``value_col`` over all STRICTLY PRIOR rows
    (the single-thread virtual clock: a fetch starts after the delays
    of everything before it).

    Three steps: (1) a one-job bounds pass collects ~n_range_partitions
    approximate per-group percentile cut points of the order key to the
    driver (O(groups * n) rows — the same cardinality
    repartitionByRange's own sampler collects) and embeds them as
    LITERALS; (2) ``_bucket`` = count of cut points <= key, a PURE
    FUNCTION OF THE ROW, order-monotone in the key; (3) a per-bucket
    window computes local rank/cumsum while a map-side-combined
    groupBy(part, _bucket) computes per-bucket totals, whose exclusive
    prefix sums are broadcast back as offsets — O(groups * buckets)
    driver data, no single-partition shuffle at any scale.

    Rounds 2-4 derived the bucket from repartitionByRange +
    spark_partition_id() instead. That made the offsets pass and the
    window pass two physically independent executions of the SAME
    range exchange (Catalyst's relation dedup gives the two branches
    different attribute ids, so neither planner-time exchange reuse
    nor AQE's stage cache unifies them — verified in the executed
    plan), and correctness of the _pid match between the passes then
    rested on the exchange's sampler resampling identically from a
    possibly order-nondeterministic shuffle child (ADVICE r4 #1).
    Literal bounds make the bucket assignment identical across
    re-executions BY CONSTRUCTION — either pass may recompute freely,
    in any order — and drop both full-data range exchanges from the
    plan (the window's hash exchange on (part, _bucket) is now the
    only full-data shuffle; the totals pass partially aggregates
    map-side before its tiny shuffle).
    """
    part = [partition_col] if partition_col else []
    if len(order_cols) != 1:
        raise ValueError(
            "global_rank_and_cumsum orders by ONE column; pack compound "
            "priorities first (pack_order) so every comparator and the "
            "bucket bounds work on a single BIGINT"
        )
    key = order_cols[0]
    qs = [i / n_range_partitions for i in range(1, n_range_partitions)]
    # The bounds job only steers BALANCE, never correctness (any bound
    # set yields exact ranks — ties at a cut point share a bucket and
    # the offsets join is exact), so it reads a fixed-seed sample
    # instead of the full input — the same idea as
    # repartitionByRange's reservoir sampler, but one job instead of
    # one per exchange. At 10^10 frontier rows the difference is a
    # full extra scan vs a ~5% one. A group too small to surface in
    # the sample simply lands in one bucket (bucket 0), which is the
    # right plan for a small group anyway.
    bsrc = (
        df.sample(fraction=bounds_sample, seed=42)
        if bounds_sample is not None and bounds_sample < 1.0
        else df
    )
    brows = (
        bsrc.groupBy(*part)
        .agg(F.percentile_approx(key, qs, 10_000).alias("_b"))
        .collect()
    )

    def _bucket_of(bounds: list) -> "F.Column":
        # count of cut points <= key, evaluated as a BALANCED BINARY
        # comparison tree (nested CASE WHEN, depth ceil(log2(n+1))) —
        # O(log n) codegen compares per row, so the bucket count can
        # grow with cluster size (thousands of buckets on 1000
        # executors) without the per-row cost growing linearly.
        # Monotone in key; ties at a cut point share a bucket; ANY
        # bound set is CORRECT (percentile accuracy only affects
        # balance).
        def tree(lo: int, hi: int) -> "F.Column":
            # rows with bounds[lo-1] <= key < bounds[hi] (virtual
            # sentinels) get bucket in [lo, hi]; resolve by bisection
            if lo == hi:
                return F.lit(lo)
            mid = (lo + hi) // 2
            return (
                F.when(F.col(key) >= F.lit(bounds[mid]), tree(mid + 1, hi))
                .otherwise(tree(lo, mid))
            )

        return tree(0, len(bounds))

    if part:
        bucket = F.lit(0)
        for r in brows:
            bounds = sorted(set(r["_b"] or []))
            if bounds:
                bucket = (
                    F.when(F.col(part[0]) == r[part[0]], _bucket_of(bounds))
                    .otherwise(bucket)
                )
    else:
        bounds = sorted(set(brows[0]["_b"] or [])) if brows else []
        bucket = _bucket_of(bounds) if bounds else F.lit(0)
    dfp = df.withColumn("_pid", bucket.cast("int"))
    totals = (
        dfp.groupBy(*part, "_pid")
        .agg(F.count("*").alias("_cnt"), F.sum(value_col).alias("_sum"))
    )
    w_off = (
        Window.partitionBy(*[F.col(c) for c in part])
        if part
        else Window.partitionBy(F.lit(1))
    )
    offsets = totals.select(
        *part,
        "_pid",
        (
            F.sum("_cnt").over(w_off.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1))
        ).alias("_cnt_off"),
        (
            F.sum("_sum").over(w_off.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1))
        ).alias("_sum_off"),
    ).fillna(0, subset=["_cnt_off", "_sum_off"])

    w_in = Window.partitionBy(*part, "_pid").orderBy(*[F.col(c) for c in order_cols])
    ranked = (
        dfp.withColumn("_rn", F.row_number().over(w_in))
        .withColumn(
            "_cs",
            F.coalesce(
                F.sum(value_col).over(w_in.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            ),
        )
        .join(F.broadcast(offsets), part + ["_pid"], "left")
        .withColumn(rank_name, F.col("_rn") + F.coalesce(F.col("_cnt_off"), F.lit(0)))
        .withColumn(
            cumsum_name, F.col("_cs") + F.coalesce(F.col("_sum_off"), F.lit(0.0))
        )
        .drop("_pid", "_rn", "_cs", "_cnt_off", "_sum_off")
    )
    return ranked


def schedule(
    frontier: DataFrame,
    n_salts: int = 8,
    n_range_partitions: int = 32,
    handle: CheckpointHandle | None = None,
) -> DataFrame:
    """Produce the round's fetch plan.

    Adds:
      ref_seq, ref_virtual_ts  — per-source sequential replay clock
      host_salt                — xxhash64(url) mod n_salts
      host_rank, host_scheduled_at — per-(host,salt) polite queue
    Output is the input plus schedule columns; emit order for a
    sequential replay is (source_rank, ref_seq).
    """
    f = with_priority(frontier)
    # partition/order by the INT source_rank, not the source string:
    # the rank is 1:1 with the source, and every shuffle-sort comparator
    # runs millions of times — integer compares, not UTF-8 compares.
    # Going further, the whole 6-int priority tuple is packed into ONE
    # guarded BIGINT (order-identical and injective, see pack_order):
    # the range partitioner and both window sorts below compare one
    # long instead of six fields per row-pair.
    f = f.withColumn("_prio", packed_priority_col())
    f = global_rank_and_cumsum(
        f,
        ["_prio"],
        "crawl_delay",
        partition_col="source_rank",
        n_range_partitions=n_range_partitions,
        rank_name="ref_seq",
        cumsum_name="ref_virtual_ts",
        handle=handle,
    )
    f = f.withColumn("host_salt", F.pmod(F.xxhash64("url"), F.lit(n_salts)).cast("int"))
    # same trick for the politeness queues: group by xxhash64(host)
    # (8-byte sort prefix) instead of the host string; the host column
    # itself is untouched in the output. A 64-bit collision would merge
    # two hosts' queues — at web scale (~10^9 hosts) the chance is
    # ~10^18/2^65 ≈ 3e-2ppm; politeness only gets (harmlessly) stricter.
    f = f.withColumn("_host_key", F.xxhash64("host"))
    w_host = Window.partitionBy("_host_key", "host_salt").orderBy("_prio")
    f = f.withColumn("host_rank", F.row_number().over(w_host)).withColumn(
        "host_scheduled_at",
        F.coalesce(
            F.sum("crawl_delay").over(w_host.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0.0),
        ),
    )
    return f.drop("_host_key", "_prio")
