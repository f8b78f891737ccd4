"""End-to-end: the distributed round-loop pipeline must equal the
sequential reference-semantics oracle exactly (SURVEY §5.1) —
fetch order, per-source virtual clocks, seen-set membership, and
extracted article/company/image records."""

from __future__ import annotations

import pytest

from python_crawler_spark.plans.crawl import CrawlConfig, CrawlRun
from python_crawler_spark.sources.worldgen import WorldSpec

from .oracle import Oracle

SPEC = WorldSpec(n_tianyan_seeds=12)


@pytest.fixture(scope="module")
def run_and_oracle(spark):
    cfg = CrawlConfig(spec=SPEC, n_buckets=8, use_bloom=True)
    run = CrawlRun(spark, cfg)
    results = run.run()
    oracle = Oracle(spec=SPEC, fixed_date=cfg.fixed_date).run()
    return results, oracle


def test_fetch_order_matches_oracle(run_and_oracle):
    results, oracle = run_and_oracle
    got = [
        (r["source"], r["url"], r["attempt"])
        for r in results["fetch_order"].select("source", "url", "attempt").collect()
    ]
    want = [(e["source"], e["url"], e["attempt"]) for e in oracle.events]
    assert got == want


def test_trim_shape_diversity_exercised(run_and_oracle):
    """The equality tests only mean something if the world actually
    contains marker diversity: accounts that produced articles must
    span at least 4 of the 5 trim shapes, including the backward
    (previous_elements) one."""
    from python_crawler_spark.sources.worldgen import trim_shape

    results, _ = run_and_oracle
    accounts = {
        r["resource_from"] for r in results["articles"].select("resource_from").collect()
    }
    shapes = {trim_shape(a) for a in accounts}
    assert len(shapes) >= 4, shapes
    assert 3 in shapes, "backward (strip_before) shape not exercised"


def test_fetch_identity_matches_oracle(run_and_oracle):
    """S5/S7: (render, ua_id, proxy_id) carried through the plan and
    equal to the oracle's identity model on every fetch."""
    results, oracle = run_and_oracle
    got = [
        (r["url"], r["attempt"], r["render"], r["ua_id"], r["proxy_id"])
        for r in results["fetch_order"]
        .select("url", "attempt", "render", "ua_id", "proxy_id")
        .collect()
    ]
    want = [
        (e["url"], e["attempt"], e["render"], e["ua_id"], e["proxy_id"])
        for e in oracle.events
    ]
    assert got == want


def test_antibot_retry_rotates_identity(run_and_oracle):
    """O8 + S5: every anti-bot retry must fetch under a DIFFERENT
    (ua_id, proxy_id) than the blocked attempt — the reference's
    install_new_driver rotation (tianyan_crawler.py:145-152)."""
    results, oracle = run_and_oracle
    rows = results["fetch_order"].select("url", "attempt", "ua_id", "proxy_id").collect()
    by_url: dict[str, dict[int, tuple]] = {}
    for r in rows:
        by_url.setdefault(r["url"], {})[r["attempt"]] = (r["ua_id"], r["proxy_id"])
    retried = {u: a for u, a in by_url.items() if len(a) > 1}
    assert retried, "world must contain at least one anti-bot retry"
    for url, attempts in retried.items():
        assert attempts[0][0] != attempts[1][0], f"ua not rotated for {url}"
        assert attempts[0][1] != attempts[1][1], f"proxy not rotated for {url}"


def test_virtual_clock_matches_oracle(run_and_oracle):
    results, oracle = run_and_oracle
    got = {
        (r["url"], r["attempt"]): (r["ref_virtual_ts"], r["crawl_delay"])
        for r in results["fetch_order"]
        .select("url", "attempt", "ref_virtual_ts", "crawl_delay")
        .collect()
    }
    for e in oracle.events:
        ts, d = got[(e["url"], e["attempt"])]
        assert ts == pytest.approx(e["virtual_ts"], abs=1e-9), e["url"]
        assert d == pytest.approx(e["crawl_delay"], abs=1e-9), e["url"]


def test_seen_set_matches_oracle(run_and_oracle):
    results, oracle = run_and_oracle
    got = {r["dedup_key"] for r in results["seen"].select("dedup_key").collect()}
    assert got == oracle.seen


def test_articles_match_oracle(run_and_oracle):
    results, oracle = run_and_oracle
    cols = [
        "src_url", "title", "author_name", "resource_from", "content",
        "content_src", "content_read", "audit_status", "publish_time",
        "create_time", "summary", "src_header", "cover_small",
    ]
    got = sorted(
        tuple(r[c] for c in cols) for r in results["articles"].select(cols).collect()
    )
    want = sorted(tuple(a[c] for c in cols) for a in oracle.articles)
    assert got == want


def test_csm_texts_match_oracle(run_and_oracle):
    results, oracle = run_and_oracle
    got = sorted(
        (r["src_url"], r["account"], r["text"])
        for r in results["articles_text"].collect()
    )
    want = sorted((a["src_url"], a["account"], a["text"]) for a in oracle.articles_text)
    assert got == want


def test_companies_match_oracle(run_and_oracle):
    results, oracle = run_and_oracle
    scalar_cols = [
        "company_id", "sourceFrom", "last_update", "name", "phone", "email",
        "url", "address", "score", "register_capital", "status",
        "register_time", "legal_repr",
    ]
    rows = results["companies"].collect()
    got = {r["company_id"]: r for r in rows}
    want = {c["company_id"]: c for c in oracle.companies}
    assert set(got) == set(want)
    for cid, w in want.items():
        g = got[cid]
        for c in scalar_cols:
            assert g[c] == w[c], (cid, c)
        assert [tuple(s) for s in (g["staff_info"] or [])] == [
            (s["name"], s["href"], s["title"]) for s in w["staff_info"]
        ]
        assert [tuple(s) for s in (g["holder_info"] or [])] == [
            (s["name"], s["link"], s["type"], s["money"]) for s in w["holder_info"]
        ]
        assert [tuple(s) for s in (g["out_invest"] or [])] == [
            (s["name"], s["link"], s["type"], s["money"]) for s in w["out_invest"]
        ]
        assert dict(g["details"] or {}) == w["details"]


def test_images_match_oracle(run_and_oracle):
    results, oracle = run_and_oracle
    cols = ["image_id", "w", "h", "fmt", "caption", "phash", "small", "sig",
            "src_url", "article_url", "rehost_url", "dec_fmt", "n_bytes"]
    got = sorted(tuple(r[c] for c in cols) for r in results["images"].select(cols).collect())
    want = sorted(tuple(i[c] for i in [img] for c in cols) for img in oracle.images for i in [img])
    assert got == want


def test_image_pixel_invariant_psnr(run_and_oracle):
    """input_hint: decoded-pixel allclose (PSNR>=40dB lossy) + caption
    equality vs the (oracle) reference pipeline."""
    import numpy as np

    from python_crawler_spark.functions.images import decode_image, psnr
    from python_crawler_spark.operators.multimodal import synth_image_pixels

    results, oracle = run_and_oracle
    rows = results["images"].select("src_url", "bytes", "caption", "dec_fmt").collect()
    assert rows
    # the synthetic web serves all four wire layouts (plain + Adam7
    # PNG, baseline + progressive JPEG) — every decoder is exercised
    # end-to-end
    def _layout(b: bytes) -> str:
        if b[:4] == b"\x89PNG":
            return "png_adam7" if b[28] == 1 else "png"  # IHDR interlace byte
        return "jpeg_prog" if b"\xff\xc2" in b else "jpeg_base"

    sigs = {_layout(bytes(r["bytes"])) for r in rows}
    assert sigs == {"png", "png_adam7", "jpeg_base", "jpeg_prog"}
    oracle_by_src = {i["src_url"]: i for i in oracle.images}
    for r in rows:
        ref_px, _ = synth_image_pixels(r["src_url"])
        w, h, fmt, dec = decode_image(bytes(r["bytes"]))
        if fmt == "png":
            assert np.array_equal(dec, ref_px)
        else:
            assert psnr(ref_px, dec) >= 40.0
        assert r["caption"] == oracle_by_src[r["src_url"]]["caption"]


# ------------------------------------------------- dirty web, tolerant parse


@pytest.fixture(scope="module")
def run_and_oracle_dirty(spark):
    """The round-4 production-boundary e2e: worldgen emits DIRTY
    markup (reordered/requoted/uppercased attributes, unclosed tails)
    and the engine parses it with the TOLERANT stdlib-DOM family
    (CrawlConfig.html_parser='tolerant') — against the sequential
    oracle configured identically."""
    dirty_spec = WorldSpec(n_tianyan_seeds=8)
    cfg = CrawlConfig(
        spec=dirty_spec, n_buckets=8, use_bloom=True,
        html_parser="tolerant", dirty_web=True,
    )
    results = CrawlRun(spark, cfg).run()
    oracle = Oracle(
        spec=dirty_spec, fixed_date=cfg.fixed_date,
        html_parser="tolerant", dirty_web=True,
    ).run()
    clean_oracle = Oracle(spec=dirty_spec, fixed_date=cfg.fixed_date).run()
    return results, oracle, clean_oracle


def test_dirty_fetch_order_and_seen_match_oracle(run_and_oracle_dirty):
    results, oracle, clean = run_and_oracle_dirty
    got = [
        (r["source"], r["url"], r["attempt"])
        for r in results["fetch_order"].select("source", "url", "attempt").collect()
    ]
    assert got == [(e["source"], e["url"], e["attempt"]) for e in oracle.events]
    # and the dirt changed NOTHING semantically: same order as the
    # clean/dialect world
    assert got == [(e["source"], e["url"], e["attempt"]) for e in clean.events]
    seen = {r["dedup_key"] for r in results["seen"].select("dedup_key").collect()}
    assert seen == oracle.seen == clean.seen


def test_dirty_articles_match_both_oracles(run_and_oracle_dirty):
    results, oracle, clean = run_and_oracle_dirty
    cols = [
        "src_url", "title", "author_name", "resource_from", "content",
        "content_src", "publish_time", "summary", "cover_small",
    ]
    got = sorted(
        tuple(r[c] for c in cols) for r in results["articles"].select(cols).collect()
    )
    assert got == sorted(tuple(a[c] for c in cols) for a in oracle.articles)
    # vs the CLEAN world all values except the raw content html agree
    vals = [c for c in cols if c != "content"]
    got_v = sorted(tuple(r[: len(vals)]) for r in (tuple(t[cols.index(c)] for c in vals) for t in got))
    want_v = sorted(tuple(a[c] for c in vals) for a in clean.articles)
    assert got_v == want_v


def test_dirty_companies_and_texts_match_clean_world(run_and_oracle_dirty):
    results, oracle, clean = run_and_oracle_dirty
    got_t = sorted(
        (r["src_url"], r["account"], r["text"])
        for r in results["articles_text"].collect()
    )
    assert got_t == sorted(
        (a["src_url"], a["account"], a["text"]) for a in clean.articles_text
    )
    rows = {r["company_id"]: r for r in results["companies"].collect()}
    want = {c["company_id"]: c for c in clean.companies}
    assert set(rows) == set(want)
    for cid, w in want.items():
        g = rows[cid]
        for c in ("name", "phone", "score", "status", "legal_repr"):
            assert g[c] == w[c], (cid, c)
        assert dict(g["details"] or {}) == w["details"]


def test_dirty_images_match_clean_world(run_and_oracle_dirty):
    results, oracle, clean = run_and_oracle_dirty
    cols = ["image_id", "w", "h", "fmt", "caption", "phash", "small", "sig",
            "src_url", "article_url", "rehost_url"]
    got = sorted(tuple(r[c] for c in cols) for r in results["images"].select(cols).collect())
    assert got == sorted(tuple(i[c] for c in cols) for i in clean.images)
    assert got, "dirty world produced no images"


# -------------------------------------------------- cuckoo filter family


def test_cuckoo_filter_family_same_results(spark, run_and_oracle):
    """CrawlConfig.filter_family='cuckoo' (round 4: the cuckoo seen-set
    prefilter wired into the engine) must produce the IDENTICAL fetch
    order and seen set — prefilters only route candidates, the exact
    anti-join is the last word."""
    _, oracle = run_and_oracle
    cfg = CrawlConfig(spec=SPEC, n_buckets=8, filter_family="cuckoo")
    run = CrawlRun(spark, cfg)
    results = run.run()
    assert run.filter_family == "cuckoo"
    assert run.filters is not None  # maintained, not rebuilt-per-probe
    assert "stash_fp" in run.filters.columns  # cuckoo rows, not bloom
    got = [
        (r["source"], r["url"], r["attempt"])
        for r in results["fetch_order"].select("source", "url", "attempt").collect()
    ]
    assert got == [(e["source"], e["url"], e["attempt"]) for e in oracle.events]
    seen = {r["dedup_key"] for r in results["seen"].select("dedup_key").collect()}
    assert seen == oracle.seen


def test_incremental_filter_maintenance_carries_untouched_buckets(spark):
    """_update_filters must rebuild ONLY the buckets a round touched:
    untouched buckets' filter rows stay byte-identical across rounds
    (the SCALE.md incremental claim, previously untested), and the
    merged table equals a from-scratch full rebuild."""
    from python_crawler_spark.operators.cuckoo import build_cuckoo_filters
    from python_crawler_spark.operators.dedup import build_bloom_filters

    schema = "bucket int, key_hash long, dedup_key string, url string, round int"
    for family, full_build in (
        ("bloom", build_bloom_filters),
        ("cuckoo", build_cuckoo_filters),
    ):
        run = CrawlRun(spark, CrawlConfig(filter_family=family, n_buckets=8))
        s1 = spark.createDataFrame(
            [(0, 11, "a", "u1", 0), (0, 12, "d", "u4", 0), (1, 22, "b", "u2", 0)],
            schema,
        )
        run.seen = s1.localCheckpoint(eager=True)
        run._update_filters(s1)
        f1 = {r["bucket"]: r for r in run.filters.collect()}
        assert set(f1) == {0, 1}
        # round 2 touches bucket 1 only
        s2 = spark.createDataFrame([(1, 33, "c", "u3", 1)], schema)
        run.seen = run.seen.unionByName(s2).localCheckpoint(eager=True)
        run._update_filters(s2)
        f2 = {r["bucket"]: r for r in run.filters.collect()}
        assert f2[0] == f1[0], f"{family}: untouched bucket 0 was rebuilt"
        assert f2[1] != f1[1], f"{family}: dirty bucket 1 not rebuilt"
        full = {r["bucket"]: r for r in full_build(run.seen).collect()}
        assert f2 == full, f"{family}: incremental != full rebuild"


def test_filter_family_none_and_validation(spark):
    import pytest

    run = CrawlRun(spark, CrawlConfig(use_bloom=False))
    assert run.filter_family == "none"
    with pytest.raises(ValueError, match="filter_family"):
        CrawlRun(spark, CrawlConfig(filter_family="xor"))
