"""Tolerant real-HTML parse path (parse/tolerant.py — round-4
headline). Three layers, no Spark session needed (pure kernels):

1. CORPUS PARITY: on every clean worldgen page shape, each tolerant
   extraction function equals its regex-dialect twin exactly.
2. DIRTY PARITY: the same pages put through worldgen.dirty_html
   (reordered/requoted/uppercased attributes, unclosed tails) parse to
   the SAME VALUES through the tolerant family as the clean pages do
   through the dialect family.
3. MESSY SHAPES: handwritten real-world markup (unclosed tags,
   single-quoted/unquoted attributes, stray '<' in text, mismatched
   end tags) exercises tolerance the worldgen dirt doesn't generate.
"""

from __future__ import annotations

import pytest

from python_crawler_spark.parse import html as H
from python_crawler_spark.parse import tolerant as TOL
from python_crawler_spark.sources import worldgen as W

SPEC = W.DEFAULT_SPEC


def _corpus() -> list[tuple[str, str]]:
    """(label, html) for every page shape the worldgen web serves."""
    pages = []
    for name in W.WEIXIN_SEEDS[:6]:
        pages.append((f"wx-list-{name}", W.weixin_list_page(name, SPEC)))
        for idx in range(SPEC.weixin_articles_per_account):
            pages.append((f"wx-art-{name}-{idx}", W.weixin_article_page(name, idx, SPEC)))
    for _cid, name, url in W.CSM_SEEDS[:4]:
        slug = url.rsplit("/", 1)[1]
        pages.append((f"csm-acct-{slug}", W.csm_account_page(slug, SPEC)))
        pages.append((f"csm-list-{slug}", W.csm_list_page(slug, 1, SPEC)))
    for art_id in (12345, 999, 31013):
        pages.append((f"csm-art-{art_id}", W.csm_article_page(art_id)))
    for i in range(8):
        name = f"同步公司{i:04d}"
        pages.append((f"tyc-search-{i}", W.tyc_search_page(name)))
        pages.append((f"tyc-detail-{i}", W.tyc_detail_page(W._h("tyc-search", name) % 10**7)))
    return pages


_FAMILIES = [
    "parse_article_list",
    "parse_article",
    "parse_images",
    "parse_links",
    "parse_max_page",
    "parse_company",
    "parse_msg_link",
    "first_query_link",
    "csm_body_text",
    "tiny_html",
]


def test_corpus_parity_clean():
    """Every tolerant extraction == its dialect twin on every clean
    worldgen page (including body_html raw spans byte-for-byte)."""
    for label, html in _corpus():
        for fam in _FAMILIES:
            got = getattr(TOL, fam)(html)
            want = getattr(H, fam)(html)
            assert got == want, (label, fam, got, want)


def _article_values(p: dict) -> dict:
    """parse_article minus body_html (raw spans legitimately differ
    between a dirty page and its clean original)."""
    return {k: v for k, v in p.items() if k != "body_html"}


def test_dirty_parity_values():
    """Tolerant extraction from the DIRTY page == dialect extraction
    from the CLEAN page, for every value the engine consumes. This is
    the property the dirty-web e2e rests on."""
    checked = 0
    for label, html in _corpus():
        dirty = W.dirty_html(html, label)
        if dirty != html:
            checked += 1
        assert TOL.parse_article_list(dirty) == H.parse_article_list(html), label
        assert _article_values(TOL.parse_article(dirty)) == _article_values(
            H.parse_article(html)
        ), label
        # body TEXT must survive even though body_html differs
        assert TOL.parse_article(dirty)["body_text"] == H.parse_article(html)["body_text"], label
        assert TOL.parse_images(dirty) == H.parse_images(html), label
        assert TOL.parse_links(dirty) == H.parse_links(html), label
        assert TOL.parse_max_page(dirty) == H.parse_max_page(html), label
        assert TOL.parse_company(dirty) == H.parse_company(html), label
        assert TOL.first_query_link(dirty) == H.first_query_link(html), label
        assert TOL.csm_body_text(dirty) == H.csm_body_text(html), label
    assert checked > 20, "dirty_html barely dirtied anything — dirt knobs broken"


def test_dirty_html_actually_dirties():
    """The dirt generator must produce each advertised shape somewhere
    in the corpus (else the tolerant path is tested against nothing)."""
    import re

    saw = {"single": False, "unquoted": False, "upper": False, "tail": False}
    for label, html in _corpus():
        d = W.dirty_html(html, label)
        if re.search(r"<[\w-]+[^>]*='[^']*'", d):
            saw["single"] = True
        if re.search(r"<[\w-]+[^>]*\s[\w-]+=[^\s>\"'][^\s>]*", d):
            saw["unquoted"] = True
        if re.search(r"<[A-Z][\w-]*[\s>]", d):
            saw["upper"] = True
        if html.endswith("</html>") and not d.endswith("</html>"):
            saw["tail"] = True
    assert all(saw.values()), saw


def test_dirty_trim_markers_untouched():
    """lit: trim markers are byte-literal searches over body_html —
    dirty_html must never rewrite attr-less tags (<p>, <hr>, closers),
    so every account's trim rule still fires on the dirty page."""
    for name in W.WEIXIN_SEEDS:
        marker, direction = W.trim_rule_for(name)
        for idx in range(SPEC.weixin_articles_per_account):
            html = W.weixin_article_page(name, idx, SPEC)
            dirty = W.dirty_html(html, f"k-{name}-{idx}")
            if marker.startswith("lit:") and marker[4:] in html:
                assert marker[4:] in dirty, (name, idx, marker)
            # trim + tiny of the dirty body flattens to the same text
            body_d = TOL.parse_article(dirty)["body_html"]
            body_c = H.parse_article(html)["body_html"]
            if body_c is None:
                assert body_d is None
                continue
            out_d = TOL.tiny_html(TOL.trim_dom(body_d, marker, direction))
            out_c = H.tiny_html(H.trim_dom(body_c, marker, direction))
            assert H.text_flatten(out_d) == H.text_flatten(out_c), (name, idx)


# ----------------------------------------------------------- messy shapes


def test_messy_attribute_styles():
    html = (
        "<div msgid=3><H4 HREFS='/s?__biz=1&idx=0' class=weui_media_title>标题A</H4>"
        "<p class='weui_media_desc'>摘要</p>"
        "<span style=background:url(http://pic/mmbiz/SIG1/640?wx_fmt=png)></span></div>"
    )
    got = TOL.parse_article_list(html)
    assert got == [
        {
            "href": "/s?__biz=1&idx=0",
            "title": "标题A",
            "summary": "摘要",
            "cover": "http://pic/mmbiz/SIG1/640?wx_fmt=png",
        }
    ]


def test_messy_unclosed_and_mismatched():
    # body div never closed (EOF), <p> unclosed, stray </em> ignored
    html = (
        '<em id="post-date">2016-01-02</em></em>'
        '<div id="js_content"><p>段一<p>段二'
    )
    p = TOL.parse_article(html)
    assert p["publish_time"] == "2016-01-02"
    assert p["body_text"] == "段一 段二"
    assert p["body_html"] == "<p>段一<p>段二"


def test_messy_stray_lt_in_text():
    html = '<div id="js_content"><p>a < b 且 x<y</p></div>'
    p = TOL.parse_article(html)
    assert "a < b" in p["body_text"]


def test_messy_links_order_and_case():
    html = (
        "<A HREF='/n/1' TARGET=_blank>一</A>"
        '<a target="_self" href="/n/2">二</a>'
        "<a href=/n/3 target=_blank>三</a>"
    )
    assert TOL.parse_links(html) == ["/n/1", "/n/3"]


def test_messy_company_reordered():
    html = (
        "<body><h1 class='company-name'>某公司</h1>"
        "<span class=contact>电话:123-456</span>"
        '<i ng-alt="总综合评分：88"></i>'  # X13: fixed 6-char label slice
        "<td class='td-regStatus-value'><p class='ng-binding'>存续</p>"
        "<table class=staff><tr><td><a href='/human/7'>张三</a><td>李四</tr>"
        "<tr><td>董事长</td><td>监事</td></tr></table>"
    )
    rec = TOL.parse_company(html)
    assert rec["name"] == "某公司"
    assert rec["phone"] == "123-456"
    assert rec["score"] == "88"
    assert rec["status"] == "存续"
    assert rec["staff_info"] == [
        {"name": "张三", "href": "/human/7", "title": "董事长"},
        {"name": "李四", "href": "", "title": "监事"},
    ]


def test_document_offsets_with_newlines_and_entities():
    html = '<div\n id="js_content">A &amp; B\n<em>角</em></div>'
    doc = TOL.parse_standard_html(html)
    body = TOL.find(doc.root, "div")
    assert doc.inner(body) == "A &amp; B\n<em>角</em>"
    assert doc.text(body) == "A &amp; B 角"  # entities stay literal


def test_oracle_dirty_tolerant_end_to_end_kernels():
    """The sequential simulator itself runs green with
    (html_parser='tolerant', dirty_web=True) and produces the SAME
    fetch order, seen set, and extracted VALUES as the clean/dialect
    run — the kernel-level version of the Spark e2e."""
    from tests.oracle import Oracle

    spec = W.WorldSpec(n_tianyan_seeds=6)
    clean = Oracle(spec=spec).run()
    dirty = Oracle(spec=spec, html_parser="tolerant", dirty_web=True).run()
    assert dirty.fetch_order() == clean.fetch_order()
    assert dirty.seen == clean.seen
    assert [
        {k: v for k, v in a.items() if k != "content"} for a in dirty.articles
    ] == [{k: v for k, v in a.items() if k != "content"} for a in clean.articles]
    assert [H.text_flatten(a["content"]) for a in dirty.articles] == [
        H.text_flatten(a["content"]) for a in clean.articles
    ]
    assert dirty.articles_text == clean.articles_text
    assert dirty.companies == clean.companies
    assert dirty.images == clean.images
