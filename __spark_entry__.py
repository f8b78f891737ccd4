"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship politeness-scheduler query on sf0.001.
queries()/oracle_sql(): one entry per implemented operator family
(SURVEY.md §2) — every entry carries a DuckDB oracle.
`crawl_fetch_schedule` is the real frontier engine end-to-end on the
deterministic synthetic web; its oracle is the sequential reference-
semantics simulator (tests/oracle.py — pure Python, no Spark): the
golden fetch schedule is generated at oracle_sql() time and embedded
as a VALUES table, so the driver gate arbitrates the engine itself,
not just the operator-family queries (round-2 verdict #2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_crawler_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["frontier_schedule"](spark, "/root/testdata/sf0.001")


def _crawl_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual frontier engine: seeds -> rounds -> fetch order with
    per-source virtual politeness clocks, on the deterministic
    synthetic web (sf_dir unused — the crawl domain has its own
    deterministic input; scale is fixed so row counts are stable).
    Oracled by :func:`golden_schedule_sql` (the sequential simulator's
    golden rows as a VALUES table) — keep the CrawlConfig here and the
    generator's parameters in lockstep."""
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


def _crawl_fetch_schedule_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 4: the SAME engine end-to-end, but the synthetic web
    emits DIRTY real-world markup (worldgen.dirty_html — reordered/
    requoted/uppercased attributes, unclosed tails) and the plan
    parses it with the tolerant stdlib-DOM family
    (parse/tolerant.py). Oracled by the sequential simulator
    configured identically — and since the dirt is semantics-
    preserving, the golden rows provably equal the clean world's
    (tests/test_crawl_e2e.py pins that too)."""
    from python_crawler_spark.plans.crawl import CrawlConfig, CrawlRun
    from python_crawler_spark.sources.worldgen import WorldSpec

    cfg = CrawlConfig(
        spec=WorldSpec(n_tianyan_seeds=6), n_buckets=8,
        html_parser="tolerant", dirty_web=True,
    )
    run = CrawlRun(spark, cfg)
    run.run()
    return run.fetch_order().select(
        "source", "url", "attempt", "ref_seq",
        F.round("ref_virtual_ts", 3).alias("ref_virtual_ts"),
        "host", "host_rank",
        F.round("host_scheduled_at", 3).alias("host_scheduled_at"),
    )


def golden_schedule_sql(
    n_tianyan_seeds: int = 8,
    n_salts: int = 4,
    html_parser: str = "dialect",
    dirty_web: bool = False,
) -> str:
    """DuckDB VALUES oracle for `crawl_fetch_schedule`, generated from
    the pure-Python sequential simulator (tests/oracle.py) at the SAME
    spec the Spark query runs — the parameters mirror
    `_crawl_fetch_schedule`'s CrawlConfig (n_salts is its default).

    The simulator emits the reference-semantics event stream; this
    derives exactly the columns the engine's fetch_order() projects:
      ref_seq / ref_virtual_ts  — per-source 1-based position and
        exclusive delay cumsum (the sim's per-source virtual clock);
      host_rank / host_scheduled_at — per-(host, salt) polite-queue
        rank and exclusive cumsum in priority-tuple order, with
        salt = pmod(xxhash64(url), n_salts) via the Spark-parity
        Python xxhash64 (functions/hashing.py).
    Doubles are rounded exactly as Spark's round(col, 3): HALF_UP on
    the binary value (decimal.Decimal quantize), matching the query's
    projection."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from python_crawler_spark.functions.hashing import xxhash64
    from python_crawler_spark.functions.urls import host_of
    from python_crawler_spark.operators.scheduler import SOURCE_RANK
    from python_crawler_spark.sources.worldgen import WorldSpec
    from tests.oracle import Oracle

    sim = Oracle(
        spec=WorldSpec(n_tianyan_seeds=n_tianyan_seeds),
        html_parser=html_parser,
        dirty_web=dirty_web,
    ).run()
    seq: dict[str, int] = {}
    rows = []
    for e in sim.events:
        s = e["source"]
        seq[s] = seq.get(s, 0) + 1
        rows.append(
            {
                "source": s,
                "url": e["url"],
                "attempt": e["attempt"],
                "ref_seq": seq[s],
                "ref_virtual_ts": e["virtual_ts"],
                "host": host_of(e["url"]),
                "_salt": xxhash64(e["url"]) % n_salts,
                "_prio": (
                    SOURCE_RANK[s], e["line_no"], e["stage"],
                    e["page_no"], e["link_idx"], e["attempt"],
                ),
                "_delay": e["crawl_delay"],
            }
        )
    queues: dict[tuple, list] = defaultdict(list)
    for r in rows:
        queues[(r["host"], r["_salt"])].append(r)
    for g in queues.values():
        g.sort(key=lambda r: r["_prio"])
        t = 0.0
        for i, r in enumerate(g):
            r["host_rank"] = i + 1
            r["host_scheduled_at"] = t
            t += r["_delay"]

    def r3(x: float) -> float:
        return float(Decimal(x).quantize(Decimal("0.001"), rounding=ROUND_HALF_UP))

    vals = []
    for r in rows:
        assert "'" not in r["url"] and "'" not in r["host"]  # literal safety
        vals.append(
            "('{source}','{url}',{attempt},{ref_seq},{vt!r},'{host}',{hr},{hs!r})".format(
                source=r["source"], url=r["url"], attempt=r["attempt"],
                ref_seq=r["ref_seq"], vt=r3(r["ref_virtual_ts"]), host=r["host"],
                hr=r["host_rank"], hs=r3(r["host_scheduled_at"]),
            )
        )
    return (
        "SELECT source, url, CAST(attempt AS INTEGER) AS attempt, "
        "CAST(ref_seq AS BIGINT) AS ref_seq, "
        "CAST(ref_virtual_ts AS DOUBLE) AS ref_virtual_ts, host, "
        "CAST(host_rank AS INTEGER) AS host_rank, "
        "CAST(host_scheduled_at AS DOUBLE) AS host_scheduled_at "
        "FROM (VALUES\n" + ",\n".join(vals) + "\n) AS t(source, url, attempt, "
        "ref_seq, ref_virtual_ts, host, host_rank, host_scheduled_at)"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(QUERIES)
    out["crawl_fetch_schedule"] = _crawl_fetch_schedule
    out["crawl_fetch_schedule_tolerant"] = _crawl_fetch_schedule_tolerant
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLE_SQL)
    out["crawl_fetch_schedule"] = golden_schedule_sql()
    out["crawl_fetch_schedule_tolerant"] = golden_schedule_sql(
        n_tianyan_seeds=6, html_parser="tolerant", dirty_web=True
    )
    return out
