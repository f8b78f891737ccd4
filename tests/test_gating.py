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


# ------------------------------------------------------- wildcard gate


def _wgate(spark, urls, rules):
    from python_crawler_spark.functions.urls import host_col
    from python_crawler_spark.operators.gating import robots_wildcard_gate

    # host_col, not try_parse_url: java.net.URI rejects paths with bad
    # percent-escapes (e.g. '/p%q/') and nulls the host; the engine's
    # guarded substring path is robust to them
    f = spark.createDataFrame([(u,) for u in urls], "url string").withColumn(
        "host", host_col(F.col("url"))
    )
    rdf = spark.createDataFrame(
        [("robots_wildcard", h, p, a) for h, p, a in rules], RULES_SCHEMA
    )
    return {r["url"] for r in robots_wildcard_gate(f, rdf).collect()}


def test_wildcard_star_matches_any_run(spark):
    # RFC 9309 example shape: deny any path containing a segment,
    # wherever it appears
    rules = [("h.com", "/*/private/", "deny")]
    got = _wgate(
        spark,
        [
            "http://h.com/a/private/x",
            "http://h.com/a/b/private/x",
            "http://h.com/private/x",   # '*' needs >= 0 chars between slashes
            "http://h.com/a/public/x",
        ],
        rules,
    )
    # /private/x: '/*/private/' needs '/' + run + '/private/' — the run
    # may be empty, so '//private/' would match but '/private/' cannot
    assert got == {"http://h.com/private/x", "http://h.com/a/public/x"}


def test_wildcard_dollar_anchors_end(spark):
    rules = [("h.com", "/*.php$", "deny")]
    got = _wgate(
        spark,
        [
            "http://h.com/a.php",
            "http://h.com/deep/b.php",
            "http://h.com/a.php5",      # not at end -> allowed
            "http://h.com/a.phpx/y",
        ],
        rules,
    )
    assert got == {"http://h.com/a.php5", "http://h.com/a.phpx/y"}


def test_wildcard_mid_dollar_is_literal_and_metachars_escaped(spark):
    # '$' not at pattern end is literal; '%' and '_' in rules must be
    # escaped, never treated as LIKE wildcards
    rules = [
        ("h.com", "/a$b", "deny"),
        ("i.com", "/p%q", "deny"),
        ("j.com", "/x_y", "deny"),
    ]
    got = _wgate(
        spark,
        [
            "http://h.com/a$b/c",   # literal $ matches
            "http://h.com/aXb/c",   # $ is not a wildcard
            "http://i.com/p%q/",    # literal % matches
            "http://i.com/pZq/",    # % must NOT match as LIKE-any-run
            "http://j.com/x_y",     # literal _ matches
            "http://j.com/xAy",     # _ must NOT match as LIKE-any-char
        ],
        rules,
    )
    assert got == {"http://h.com/aXb/c", "http://i.com/pZq/", "http://j.com/xAy"}


def test_wildcard_longest_pattern_wins_and_tie_allows(spark):
    rules = [
        ("h.com", "/n/*", "deny"),        # len 5
        ("h.com", "/n/*.html", "allow"),  # len 10 -> wins on .html paths
        ("i.com", "/a*", "deny"),         # len 4
        ("i.com", "/a/*", "allow"),       # len 4 tie -> allow wins
    ]
    got = _wgate(
        spark,
        [
            "http://h.com/n/x.html",
            "http://h.com/n/x.gif",
            "http://i.com/a/z",
        ],
        rules,
    )
    assert got == {"http://h.com/n/x.html", "http://i.com/a/z"}


def test_wildcard_most_specific_is_octets_not_chars(spark):
    """RFC 9309 §2.2.2 ranks most-specific by OCTET length (ADVICE
    r3): deny '/p/éé' is 5 characters but 7 UTF-8 octets, allow
    '/p/*11' is 6 characters and 6 octets. Character ranking would
    pick allow (6 > 5); octet ranking must pick deny (7 > 6)."""
    rules = [
        ("h.com", "/p/éé", "deny"),    # 5 chars, 7 octets
        ("h.com", "/p/*11", "allow"),  # 6 chars, 6 octets
    ]
    got = _wgate(spark, ["http://h.com/p/éé11"], rules)
    assert got == set(), "octet-length ranking must let the deny rule win"


def test_wildcard_translation_parity(spark):
    """The Spark-side rule translation (replace chain) must equal the
    scalar reference robots_wildcard_pattern_to_like on every pattern
    shape — the oracle SQL is generated with the scalar version."""
    from python_crawler_spark.operators.gating import (
        _LIKE_ESC,
        robots_wildcard_pattern_to_like,
    )

    pats = [
        "/", "/a", "/a/*", "/*.php$", "/a$b", "/p%q", "/x_y", "/*$",
        "/a*b*c", "/$", "$", "*", "/a%*_$", "/\x01odd", "",
    ]
    rdf = spark.createDataFrame(
        [("robots_wildcard", "h.com", p, "deny") for p in pats], RULES_SCHEMA
    )
    p = F.col("pattern")
    anchored = p.endswith("$")
    core = F.when(anchored, p.substr(F.lit(1), F.length(p) - 1)).otherwise(p)
    esc2 = _LIKE_ESC + _LIKE_ESC
    core = F.replace(
        F.replace(
            F.replace(core, F.lit(_LIKE_ESC), F.lit(esc2)),
            F.lit("%"), F.lit(_LIKE_ESC + "%"),
        ),
        F.lit("_"), F.lit(_LIKE_ESC + "_"),
    )
    core = F.replace(core, F.lit("*"), F.lit("%"))
    like_pat = F.when(anchored, core).otherwise(F.concat(core, F.lit("%")))
    got = {r["pattern"]: r["lp"] for r in rdf.select("pattern", like_pat.alias("lp")).collect()}
    for pat in pats:
        assert got[pat] == robots_wildcard_pattern_to_like(pat)[0], pat
