"""URL kernels: canonicalization, signature, absolute-join, pagination.

Spark-column variants (JVM, codegen) are the data plane; the pandas
variants back the Arrow-vectorized UDF path and the pure-Python oracle.
Both implement the SAME spec so ordering/seen-set equality holds.

Reference semantics reimplemented (not copied):
- pic signature = 3rd path segment, None if path has <4 segments
  (/root/reference/crawler/weixin_public.py:118-123, SURVEY X2).
- absolute-URL join: prefix base when href is not http*
  (/root/reference/crawler/weixin_public.py:198-200,
   /root/reference/crawler/chuansongmen.py:85, SURVEY X4).
- pagination: link + '?start=' + 12*(i-1), i in [1, max_page)
  (/root/reference/crawler/chuansongmen.py:65-68, SURVEY X5).
- query-param extract with default
  (/root/reference/crawler/weixin_public.py:269-275, SURVEY X3).

Canonicalization itself is NEW (the reference has none): lowercase
scheme+host, strip default port, strip fragment, drop trailing '?',
sort query params. It is idempotent (property-tested).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Scalar canonicalizer (oracle path)."""
    if url is None:
        return None
    url = url.strip()
    if not url:
        return url
    try:
        scheme, netloc, path, query, _frag = urlsplit(url)
    except ValueError:
        return url
    scheme = scheme.lower()
    netloc = netloc.lower()
    if ":" in netloc:
        host, _, port = netloc.rpartition(":")
        if _DEFAULT_PORTS.get(scheme) == port:
            netloc = host
    if not path:
        path = "/"
    if query:
        query = urlencode(sorted(parse_qsl(query, keep_blank_values=True)))
    # trailing strip again: fragment removal can expose trailing spaces
    return urlunsplit((scheme, netloc, path, query, "")).strip()


# already-canonical shape: lowercase scheme+host, no port, non-empty
# path, no query/fragment/whitespace — the overwhelmingly common case
# on a well-formed frontier, testable with one C-speed regex pass.
# End anchor is (?![\s\S]) — absolute end-of-input in BOTH Java regex
# (rlike) and Python re — because `$` matches BEFORE a trailing
# newline in both engines, which would let 'http://a.com/x\n' skip the
# scalar canonicalizer that strips the whitespace (ADVICE r2).
_FAST_CANONICAL_RE = r"^https?://[a-z0-9.\-]+/[^?#\s]*(?![\s\S])"

# Java-regex \s (no MULTILINE/UNICODE flags) is exactly these six
# ASCII chars — the builtin predicate below must match rlike's
# semantics bit-for-bit (property-tested in test_kernels).
_JAVA_WS = " \t\n\x0b\f\r"
_HOST_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789.-"


def fast_canonical_pred(url: Column) -> Column:
    """JVM predicate equivalent to ``url rlike _FAST_CANONICAL_RE``,
    built from codegen string primitives (startswith/locate/substring/
    translate — single linear passes, no java.util.regex). Measured 8x
    faster than the rlike on an 8M-row frontier (1.5s vs 12.6s at
    local[32]): java.util.regex allocates a Matcher per row and
    backtracks through the char-class runs, while translate is one
    table-lookup pass.

    Decomposition of ^https?://[a-z0-9.\\-]+/[^?#\\s]*(?![\\s\\S]):
      - scheme: startswith http:// or https://
      - host: chars between the scheme and the FIRST '/' after it are
        a non-empty run of [a-z0-9.-] (translate deletes legal chars;
        empty residue = all legal)
      - a '/' exists after the host (locate > 0)
      - nowhere in the url: '?', '#', or Java \\s whitespace (global
        translate check; scheme/host literals can't contain them, so
        global == path-only)
    """
    # 1-based host start: len("http://")+1 = 8, len("https://")+1 = 9
    is_https = url.startswith("https://")
    hs = F.when(is_https, F.lit(9)).otherwise(F.lit(8))
    # first '/' strictly after the scheme (locate's pos must be a
    # literal, hence the branch)
    slash = F.when(is_https, F.locate("/", url, 10)).otherwise(F.locate("/", url, 9))
    host = url.substr(hs, slash - hs)
    return (
        (url.startswith("http://") | is_https)
        & (slash > 0)
        & (F.length(host) > 0)
        & (F.translate(host, _HOST_CHARS, "") == "")
        & (F.translate(url, "?#" + _JAVA_WS, "") == url)
    )


def canonicalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer for the Arrow UDF path.

    Fast path: URLs already in canonical shape pass through untouched
    (vectorized regex, no per-row Python). Only irregular URLs (ports,
    uppercase, queries to sort, fragments) take the scalar path —
    idempotence guarantees fast-path outputs equal slow-path outputs.
    """
    fast = urls.str.match(_FAST_CANONICAL_RE, na=False)
    if fast.all():
        return urls
    out = urls.copy()
    slow = ~fast & urls.notna()
    out[slow] = urls[slow].map(canonicalize_url)
    return out


def host_of(url: str) -> str:
    """Scalar host extraction (oracle path)."""
    if url is None:
        return None
    netloc = urlsplit(url).netloc.lower()
    return netloc.rpartition(":")[0] if ":" in netloc else netloc


def pic_signature(url: str) -> str | None:
    """Scalar: 3rd path segment, or None when the path has fewer than
    4 '/'-separated segments (weixin_public.py:118-123 semantics)."""
    if url is None:
        return None
    parts = urlsplit(url).path.split("/")
    return parts[2] if len(parts) >= 4 else None


def absolutize(href: str, base: str) -> str:
    """Scalar: prefix ``base`` unless href already starts with http."""
    if href is None:
        return None
    return href if href.startswith("http") else base + href


# ---------------------------------------------------------------- Spark side


def canonicalize_col(url: Column, slow_udf) -> Column:
    """Column-level canonicalize with a JVM fast-path REGEX but an
    unconditional UDF evaluation: Spark extracts Python UDFs into an
    ArrowEvalPython operator that runs for EVERY row regardless of the
    CASE WHEN around it, so this variant still pays the Arrow crossing
    for all rows (~12% of the 8M-row scheduling pipeline, measured).
    Prefer :func:`canonicalize_split` on DataFrames — kept for
    call-sites that need a pure Column expression."""
    fast = fast_canonical_pred(url)
    return F.when(fast, url).otherwise(slow_udf(url))


def canonicalize_split(
    df, slow_udf, url_col: str = "url", out: str = "canon_url", n_parts: int | None = None
):
    """Canonicalize with the fast path ACTUALLY skipping Python:
    already-canonical URLs (the overwhelmingly common case on a
    well-formed frontier) are selected by one codegen regex and never
    cross the Arrow boundary; only irregular rows (ports, uppercase,
    queries to sort, fragments, nulls) flow through the vectorized
    Python UDF branch. The two branches are unioned — downstream
    ordering never depends on row arrival order in this engine (the
    priority tuple is the only order), so the union is safe anywhere
    canonicalization is used.

    This exists because a CASE WHEN around a Python UDF does NOT make
    it conditional: Catalyst extracts the UDF into ArrowEvalPython,
    which evaluates every row. A filter/union split is the only way to
    keep regular rows JVM-side. Idempotence of the canonicalizer
    (property-tested) guarantees the branches agree on any row either
    could receive.

    Both branches SCAN the input, so callers should pass a cheap-to-
    rescan ``df`` (a materialized source or localCheckpoint — every
    engine call site does); a live expensive pipeline would execute
    twice.

    ``n_parts`` bounds the union's map-stage concurrency (see below);
    when None it defaults to ``sparkContext.defaultParallelism``.
    Deliberately NOT derived from ``df.rdd.getNumPartitions()``:
    touching ``.rdd`` mid-plan finalizes the physical plan under AQE
    and can execute upstream stages as a side effect."""
    url = F.col(url_col)
    is_fast = fast_canonical_pred(url)
    fast = df.filter(is_fast).withColumn(out, url)
    slow = df.filter(~is_fast | url.isNull()).withColumn(out, slow_udf(url_col))
    # A plain union DOUBLES the map-stage partition count (both
    # branches scan the source); on an oversubscribed local[N] that
    # doubles concurrent tasks and thrashes SMT siblings (measured 2x
    # regression at local[32]). Coalesce back to one input's worth —
    # shuffle-free; each output partition chains one fast + one slow
    # partition.
    if n_parts is None:
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    return fast.unionByName(slow).coalesce(max(n_parts, 1))


def host_col(url: Column) -> Column:
    """Host of a URL, lowercased, port stripped — JVM-side.

    parse_url costs ~4.1s per 8M rows (java.net.URI allocation per
    row); the common case — an http(s) URL whose authority is a bare
    lowercase [a-z0-9.-]+ host — is answered by two substring_index
    passes (0.5s measured). Rows that fail the guard (uppercase, port,
    userinfo, IPv6 brackets, percent-escapes, non-http schemes) fall
    back to try_parse_url inside the same CASE WHEN: JVM conditionals
    evaluate lazily per row, so the slow branch only runs for the
    irregular minority (unlike Python UDFs, which ArrowEvalPython
    evaluates unconditionally). try_parse_url, not parse_url: under
    Spark 4 ANSI mode parse_url THROWS on an invalid URL — one
    malformed href harvested into a 10^10-row frontier must yield
    null, not kill the stage.

    INTENDED divergence from try_parse_url (ADVICE r3): on
    malformed-but-guard-passing URLs — a space or bad percent-escape
    in the PATH ('http://a.com/x y', 'http://a.com/p%q/'), or a
    host that is lexically [a-z0-9.-]+ but not a valid DNS name
    ('-a-.com', 'a..com') — java.net.URI nulls the host while the
    fast path returns the substring. The fast path's answer is the
    one the ENGINE wants: a malformed href harvested into the
    frontier should still group under its host for politeness and
    robots gating rather than escape both gates via null. The
    divergence is pinned in
    tests/test_scheduler.py::test_host_path_col_fast_vs_fallback."""
    # everything between '://' and the first subsequent '/' (or end):
    # substring_index(url, '/', 3) = 'http://host' (returns the whole
    # string when fewer than 3 slashes exist, i.e. no path — still
    # correct), then take what follows '://'
    raw = F.substring_index(F.substring_index(url, "/", 3), "://", -1)
    ok = (
        (url.startswith("http://") | url.startswith("https://"))
        & (F.length(raw) > 0)
        & (F.translate(raw, _HOST_CHARS, "") == "")
    )
    return F.when(ok, raw).otherwise(F.lower(F.try_parse_url(url, F.lit("HOST"))))


def path_col(url: Column) -> Column:
    """Path of a URL (no query/fragment) — JVM-side, same fast-path/
    parse_url-fallback design as :func:`host_col`: the guarded common
    case is three substring passes instead of a java.net.URI parse.

    Fast path: chars after 'scheme://host' (= after the prefix
    substring_index(url, '/', 3)), with everything from the first '?'
    or '#' stripped. Guarded by the host_col guard plus a non-empty
    path; anything else (no path, exotic authority, non-http scheme)
    falls back to try_parse_url PATH — including its
    null-for-missing-or-invalid convention, which callers coalesce."""
    host_raw = F.substring_index(F.substring_index(url, "/", 3), "://", -1)
    pwf = F.substr(url, F.length(F.substring_index(url, "/", 3)) + 1)
    path = F.substring_index(F.substring_index(pwf, "?", 1), "#", 1)
    # Same INTENDED divergence as host_col (see its docstring): when
    # the guard passes but the path is malformed per java.net.URI
    # (space, bad %-escape), the fast path returns the literal
    # substring where try_parse_url would null — malformed paths must
    # still hit the robots gate.
    ok = (
        (url.startswith("http://") | url.startswith("https://"))
        & (F.length(host_raw) > 0)
        & (F.translate(host_raw, _HOST_CHARS, "") == "")
        & (F.length(path) > 0)
    )
    return F.when(ok, path).otherwise(F.try_parse_url(url, F.lit("PATH")))


def pic_signature_col(url: Column) -> Column:
    """Column variant of :func:`pic_signature` (SURVEY X2)."""
    parts = F.split(F.parse_url(url, F.lit("PATH")), "/")
    return F.when(F.size(parts) >= 4, F.element_at(parts, 3))


def query_param_col(url: Column, param: str, default: str) -> Column:
    """``coalesce(parse_url(url,'QUERY',param), default)`` (SURVEY X3)."""
    return F.coalesce(F.parse_url(url, F.lit("QUERY"), F.lit(param)), F.lit(default))


def absolutize_col(href: Column, base: Column) -> Column:
    """Column variant of :func:`absolutize` (SURVEY X4)."""
    return F.when(href.startswith("http"), href).otherwise(F.concat(base, href))


def pagination_urls_col(link: Column, max_page: Column) -> Column:
    """Array of page URLs ``link?start=12*(i-1)`` for i in [1, max_page)
    (SURVEY X5 — range EXCLUDES max_page, chuansongmen.py:65)."""
    pages = F.sequence(F.lit(1), max_page - 1)
    return F.transform(
        pages, lambda i: F.concat(link, F.lit("?start="), ((i - 1) * 12).cast("string"))
    )
