"""Seen-set operator tests (SURVEY §5, build-plan step 3): Bloom has
no false negatives, two-phase dedup equals exact anti-join, batch
dedup is first-occurrence-wins by priority order."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_crawler_spark.functions.hashing import bucket_col
from python_crawler_spark.operators.dedup import (
    anti_join_seen,
    batch_first_occurrence,
    bloom_prefilter,
    build_bloom_filters,
    dedup_against_seen,
)

N_BUCKETS = 8


def _keyed(spark, ids, extra=None):
    df = spark.range(0, 0)
    rows = [(i, f"url-{i}", extra or 0) for i in ids]
    df = spark.createDataFrame(rows, "id long, url string, x int")
    df = df.withColumn("key_hash", F.xxhash64("url"))
    return df.withColumn("bucket", bucket_col(F.col("key_hash"), N_BUCKETS))


def test_bloom_no_false_negatives(spark):
    seen = _keyed(spark, range(0, 500))
    cand = _keyed(spark, range(0, 1000))
    filters = build_bloom_filters(seen)
    flagged = bloom_prefilter(cand, filters)
    # every truly-seen candidate must be flagged might_seen
    missed = (
        flagged.filter(~F.col("might_seen"))
        .join(seen.select("key_hash"), "key_hash", "inner")
        .count()
    )
    assert missed == 0


def test_two_phase_equals_exact(spark):
    seen = _keyed(spark, range(0, 300))
    cand = _keyed(spark, range(250, 600))
    filters = build_bloom_filters(seen)
    two_phase = sorted(
        r["id"] for r in dedup_against_seen(cand, seen, filters).collect()
    )
    exact = sorted(r["id"] for r in anti_join_seen(cand, seen).collect())
    assert two_phase == exact == list(range(300, 600))


def test_batch_first_occurrence_priority_order(spark):
    rows = [
        ("k1", 2, "late"),
        ("k1", 1, "early"),
        ("k2", 5, "only"),
        ("k1", 3, "latest"),
    ]
    df = spark.createDataFrame(rows, "key string, prio int, tag string")
    out = {
        r["key"]: r["tag"]
        for r in batch_first_occurrence(df, "key", ["prio"]).collect()
    }
    assert out == {"k1": "early", "k2": "only"}
