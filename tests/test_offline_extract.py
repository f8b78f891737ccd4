"""Offline HTML-dir extractor (reference entry point 4,
tianyan_extractor.py:15-30): real Spark wholetext file source ->
parse_company UDF -> rows equal to the scalar kernel's output."""

from __future__ import annotations

from python_crawler_spark.parse import html as H
from python_crawler_spark.plans.offline_extract import (
    extract_companies_from_dir,
    wrap_company_docs,
)
from python_crawler_spark.sources import worldgen as W


def test_extract_companies_from_dir(spark, tmp_path):
    d = tmp_path / "result"
    d.mkdir()
    cids = [101, 202, 303]
    for cid in cids:
        (d / f"{cid}.html").write_text(W.tyc_detail_page(cid), encoding="utf-8")

    out = extract_companies_from_dir(spark, str(d))
    rows = {r["company_id"]: r for r in out.collect()}
    assert sorted(rows) == ["101", "202", "303"]
    for cid in cids:
        want = H.parse_company(W.tyc_detail_page(cid))
        got = rows[str(cid)]
        assert got["name"] == want["name"]
        assert got["sourceFrom"] == "tianyancha"
        # nested arrays and the dynamic MapType column survive the
        # file source + Arrow UDF round trip
        assert [s["name"] for s in got["staff_info"]] == [
            s["name"] for s in want["staff_info"]
        ]
        assert dict(got["details"] or {}) == (want["details"] or {})

    docs = wrap_company_docs(out).collect()
    assert len(docs) == 3
    assert docs[0]["company"][0]["sourceFrom"] == "tianyancha"
