"""Sequential reference-semantics simulator (SURVEY §5.1).

Replays the reference crawler's loop semantics (O1-O11, F1-F18, J1-J6,
plus the rebuild's robots gate J8) one URL at a time, in plain Python,
using the SAME pure kernels as the Spark engine (worldgen pages, parse
functions, canonicalizer, xxhash64, image codec). Produces the golden
fetch order, per-source virtual clocks, seen set, and extracted
records that the distributed pipeline must reproduce exactly.

Any nondeterminism in the reference (unseeded random delays, py2 str
hash, wall clock) is replaced by the engine's seeded/deterministic
spec — equality is against THIS simulator configured identically
(SURVEY §7 hard-parts), not against unreproducible py2 artifacts.
"""

from __future__ import annotations

import re

from python_crawler_spark.functions.hashing import xxhash64
from python_crawler_spark.functions.images import decode_image, is_small, phash64
from python_crawler_spark.functions.urls import (
    absolutize,
    canonicalize_url,
    host_of,
    pic_signature,
)
from python_crawler_spark.operators.multimodal import TFS_BASE, synth_image_blob
from python_crawler_spark.parse import html as H
from python_crawler_spark.sources import worldgen as W

ROBOTS_DENY = {"chuansong.me": re.compile(r"^/n/\d*13$")}
TITLE_SKIP_GLOBAL = [re.compile("^每日花语"), re.compile("潮汐·扑克问答")]
TITLE_SKIP_BY_ACCOUNT = {
    "扑克投资家": [re.compile("百家第.*期报名")],
    "华商韬略": [re.compile("今日财经头条")],
}


class Oracle:
    def __init__(self, spec: W.WorldSpec = W.DEFAULT_SPEC, fixed_date: str = "2016-06-01",
                 first_seed: int = 0, seed_limit: int | None = None,
                 html_parser: str = "dialect", dirty_web: bool = False):
        self.spec = spec
        self.fixed_date = fixed_date
        self.first_seed = first_seed
        self.seed_limit = seed_limit
        # same knobs as CrawlConfig: parse-kernel family + dirty markup
        if html_parser == "dialect":
            self.P = H
        else:
            from python_crawler_spark.parse import tolerant as _TOL

            self.P = _TOL
        self.dirty_web = dirty_web
        self.events: list[dict] = []
        self.seen: set[str] = set()
        self.articles: list[dict] = []
        self.articles_text: list[dict] = []
        self.companies: list[dict] = []
        self.images: list[dict] = []
        self._img_cache: set[str] = set()
        self._clock: dict[str, float] = {}
        self._black_sigs = set(W.black_pic_signatures())

    # ------------------------------------------------------------- helpers

    def _robots_denied(self, url: str) -> bool:
        pat = ROBOTS_DENY.get(host_of(url))
        if not pat:
            return False
        from urllib.parse import urlsplit

        return pat.match(urlsplit(url).path) is not None

    def _fetch(self, url: str, source: str, name: str, seed_id: int, line_no: int,
               stage: int, page_no: int, link_idx: int, attempt: int,
               dedup_key: str, delay: float) -> tuple[str, str]:
        kind, html = W.fetch_url(url, attempt=attempt, spec=self.spec,
                                 dirty=self.dirty_web)
        ts = self._clock.get(source, 0.0)
        ua_id, proxy_id = W.fetch_identity(url, attempt)  # S5/S7
        self.events.append(
            dict(url=url, dedup_key=dedup_key, source=source, name=name,
                 seed_id=seed_id, line_no=line_no, stage=stage, page_no=page_no,
                 link_idx=link_idx, attempt=attempt, crawl_delay=delay,
                 kind=kind, virtual_ts=ts,
                 render=W.render_required(source, stage),
                 ua_id=ua_id, proxy_id=proxy_id)
        )
        self._clock[source] = ts + delay
        self.seen.add(dedup_key)
        return kind, html

    def _title_skipped(self, account: str, title: str) -> bool:
        for pat in TITLE_SKIP_GLOBAL:
            if pat.search(title):
                return True
        for pat in TITLE_SKIP_BY_ACCOUNT.get(account, []):
            if pat.search(title):
                return True
        return False

    # -------------------------------------------------------------- weixin

    def _run_weixin(self, seed: dict) -> None:
        name, line_no, seed_id = seed["name"], seed["line_no"], seed["seed_id"]
        url = seed["url"]
        key = canonicalize_url(url)
        if key in self.seen:
            return
        _, html = self._fetch(url, "weixin", name, seed_id, line_no,
                              0, 0, -1, 0, key, 5.0)
        for pos, item in enumerate(self.P.parse_article_list(html)):
            if item["cover"] == "":  # F4
                continue
            title = re.sub("^原创", "", item["title"]).strip()  # F5
            if self._title_skipped(name, title):  # F6
                continue
            if title in self.seen:  # J1/J6 (title dedup)
                continue
            art_url = absolutize(item["href"], W.WEIXIN_BASE)  # X4
            if self._robots_denied(art_url):
                continue
            kind, art_html = self._fetch(art_url, "weixin", name, seed_id, line_no,
                                         2, 0, pos, 0, title, 1.0)
            p = self.P.parse_article(art_html)
            if p["body_html"] is None or p["has_video"] or p["publish_time"] is None:
                continue  # F8, F9, F10
            if "课程详情" in p["body_text"] and "报名需知" in p["body_text"]:
                continue  # F11
            self._emit_images(p["body_html"], art_url, title, line_no, 0, pos)
            # D6: the account's trim rule (one of the five marker
            # shapes — same assignment the rules table carries)
            marker, direction = W.trim_rule_for(name)
            content = self.P.tiny_html(self.P.trim_dom(p["body_html"], marker, direction))
            self.articles.append(
                dict(src_url=art_url, title=title, author_name=p["author_name"],
                     resource_from=name, content=content, content_src=p["msg_link"],
                     content_read=0, audit_status=0, publish_time=p["publish_time"],
                     create_time=self.fixed_date, summary=item["summary"],
                     src_header="", cover_small=item["cover"], seed_id=seed_id,
                     line_no=line_no, page_no=0, link_idx=pos)
            )

    def _emit_images(self, body_html: str, art_url: str, caption: str,
                     line_no: int, page_no: int, link_idx: int) -> None:
        for img in self.P.parse_images(body_html):
            src = img["src"]
            sig = pic_signature(src)  # X2
            if sig in self._black_sigs:  # F15
                continue
            if src in self._img_cache:  # download cache
                continue
            self._img_cache.add(src)
            from urllib.parse import parse_qs, urlsplit

            q = parse_qs(urlsplit(src).query)
            fmt = img["data_type"] or q.get("wx_fmt", ["jpg"])[0]  # X3
            blob = synth_image_blob(src)
            w, h, dec_fmt, dec = decode_image(blob)
            small = is_small(blob)  # F16
            image_id = str(abs(xxhash64(src)))  # X7
            suffix = "." if small else "_L."  # X8
            self.images.append(
                dict(image_id=image_id, w=w, h=h, fmt=fmt, caption=caption,
                     phash=phash64(dec), small=small, sig=sig, src_url=src,
                     article_url=art_url,
                     rehost_url=f"{TFS_BASE}{image_id}{suffix}{fmt}",
                     dec_fmt=dec_fmt, n_bytes=len(blob))
            )

    # ---------------------------------------------------------------- csm

    def _run_csm(self, seed: dict) -> None:
        name, line_no, seed_id = seed["name"], seed["line_no"], seed["seed_id"]
        url = seed["url"]
        key = canonicalize_url(url)
        if key in self.seen:
            return
        _, html = self._fetch(url, "chuansongmen", name, seed_id, line_no,
                              0, 0, -1, 0, key, 3.0)
        max_page = self.P.parse_max_page(html)
        link_candidates: list[tuple[int, int, str]] = []
        for pg in range(1, max_page):  # X5: excludes max_page
            pg_url = f"{url}?start={12 * (pg - 1)}"
            pg_key = canonicalize_url(pg_url)
            if pg_key in self.seen:
                continue
            _, pg_html = self._fetch(pg_url, "chuansongmen", name, seed_id, line_no,
                                     1, pg, -1, 0, pg_key, 3.0)
            for pos, href in enumerate(self.P.parse_links(pg_html)):  # D8 DOM order
                if re.match(r"^/n/\d*", href):  # F14
                    link_candidates.append((pg, pos, href))
        for pg, pos, href in link_candidates:  # O2/O3: (page, pos) order
            art_url = absolutize(href, W.CSM_BASE)
            art_key = canonicalize_url(art_url)
            if art_key in self.seen:
                continue
            if self._robots_denied(art_url):  # J8
                continue
            _, art_html = self._fetch(art_url, "chuansongmen", name, seed_id, line_no,
                                      2, pg, pos, 0, art_key, 3.0)
            self.articles_text.append(
                dict(src_url=art_url, account=name, seed_id=seed_id, line_no=line_no,
                     page_no=pg, link_idx=pos,
                     text=self.P.csm_body_text(art_html))
            )

    # ------------------------------------------------------------- tianyan

    def _run_tianyan(self, seed: dict) -> None:
        name, line_no, seed_id = seed["name"], seed["line_no"], seed["seed_id"]
        if not name.strip():  # F1
            return
        if name in W.NAME_BLACKLIST:  # F3
            return
        url = seed["url"]
        key = canonicalize_url(url)
        if key in self.seen:
            return
        d_search = 8.0 + (W._h("delay", url) % 7001) / 1000.0  # O7 deterministic
        _, html = self._fetch(url, "tianyan", name, seed_id, line_no,
                              0, 0, -1, 0, key, d_search)
        if W.ANTI_BOT_TEXT in html:  # F12 -> O8 retry once
            _, html = self._fetch(url, "tianyan", name, seed_id, line_no,
                                  0, 0, -1, 1, key + "#a1",
                                  d_search + W.BACKOFF["tianyan"])
        href = self.P.first_query_link(html)
        if not href:  # F13
            return
        detail_url = absolutize(href, W.TYC_BASE)
        d_key = canonicalize_url(detail_url)
        if d_key in self.seen:
            return
        d_detail = 15.0 + (W._h("delay", detail_url) % 20001) / 1000.0
        _, d_html = self._fetch(detail_url, "tianyan", name, seed_id, line_no,
                                2, 0, 0, 0, d_key, d_detail)
        rec = self.P.parse_company(d_html)
        cid = re.search(r"/company/(\d+)", detail_url).group(1)
        self.companies.append(
            dict(company_id=cid, sourceFrom="tianyancha", last_update=self.fixed_date,
                 seed_id=seed_id, line_no=line_no, **rec)
        )

    # ----------------------------------------------------------------- run

    def run(self) -> "Oracle":
        seeds = W.gen_seeds(self.spec)
        by_source = {"weixin": [], "chuansongmen": [], "tianyan": []}
        for s in seeds:
            if s["line_no"] < self.first_seed:
                continue  # F2
            if self.seed_limit is not None and s["line_no"] >= self.seed_limit:
                continue
            by_source[s["source"]].append(s)
        for s in by_source["weixin"]:
            self._run_weixin(s)
        for s in by_source["chuansongmen"]:
            self._run_csm(s)
        for s in by_source["tianyan"]:
            self._run_tianyan(s)
        return self

    def fetch_order(self) -> list[str]:
        return [e["url"] for e in self.events]
