"""Robots longest-prefix gate (J8, RFC 9309 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_crawler_spark.operators.gating import RULES_SCHEMA, robots_prefix_gate


def _gate(spark, urls, rules):
    f = spark.createDataFrame([(u,) for u in urls], "url string").withColumn(
        "host", F.lower(F.parse_url(F.col("url"), F.lit("HOST")))
    )
    rdf = spark.createDataFrame(
        [("robots_prefix", h, p, a) for h, p, a in rules], RULES_SCHEMA
    )
    return {r["url"] for r in robots_prefix_gate(f, rdf).collect()}


def test_longest_prefix_wins(spark):
    rules = [("h.com", "/n/", "deny"), ("h.com", "/n/1", "allow")]
    got = _gate(
        spark,
        ["http://h.com/n/15", "http://h.com/n/25", "http://h.com/other"],
        rules,
    )
    # /n/15: longer allow carve-out wins; /n/25: blanket deny; /other: no match
    assert got == {"http://h.com/n/15", "http://h.com/other"}


def test_tie_prefers_allow_and_no_rules_allows(spark):
    rules = [("h.com", "/x", "deny"), ("h.com", "/x", "allow")]
    got = _gate(spark, ["http://h.com/x9", "http://other.com/x9"], rules)
    assert got == {"http://h.com/x9", "http://other.com/x9"}


def test_root_deny_blocks_everything_on_host(spark):
    rules = [("h.com", "/", "deny")]
    got = _gate(spark, ["http://h.com/a", "http://h.com/", "http://i.com/a"], rules)
    assert got == {"http://i.com/a"}
