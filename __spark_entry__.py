"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship politeness-scheduler query on sf0.001.
queries()/oracle_sql(): one entry per implemented operator family
(SURVEY.md §2) — all SQL-expressible ones carry a DuckDB oracle;
`crawl_fetch_schedule` is the real frontier engine end-to-end on the
deterministic synthetic web (non-SQL-expressible: iterative round
loop + Arrow parse UDFs -> rows-only check; its exact-match oracle
lives in tests/test_crawl_e2e.py against the sequential simulator).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_crawler_spark.queries import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["frontier_schedule"](spark, "/root/testdata/sf0.001")


def _crawl_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual frontier engine: seeds -> rounds -> fetch order with
    per-source virtual politeness clocks, on the deterministic
    synthetic web (sf_dir unused — the crawl domain has its own
    deterministic input; scale is fixed so row counts are stable)."""
    from python_crawler_spark.plans.crawl import CrawlConfig, CrawlRun
    from python_crawler_spark.sources.worldgen import WorldSpec

    cfg = CrawlConfig(spec=WorldSpec(n_tianyan_seeds=8), n_buckets=8)
    run = CrawlRun(spark, cfg)
    run.run()
    return run.fetch_order().select(
        "source", "url", "attempt", "ref_seq",
        F.round("ref_virtual_ts", 3).alias("ref_virtual_ts"),
        "host", "host_rank",
        F.round("host_scheduled_at", 3).alias("host_scheduled_at"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(QUERIES)
    out["crawl_fetch_schedule"] = _crawl_fetch_schedule
    return out


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)  # crawl_fetch_schedule intentionally omitted
