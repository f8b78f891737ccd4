"""Arrow-vectorized Spark UDFs wrapping the parse kernels.

Each UDF takes a pd.Series of html strings per Arrow batch and returns
typed columns — the Spark-side face of SURVEY §2.8 ("no per-row
Python" means no row-at-a-time F.udf; every batch crosses the Arrow
boundary once and is processed with pandas .map over the batch).

Two kernel families share one UDF factory (:func:`make_udfs`):

* ``dialect`` — the compiled-regex kernels (parse/html.py) for the
  clean synthetic worldgen markup: the fast path.
* ``tolerant`` — the stdlib-html.parser DOM kernels
  (parse/tolerant.py) for real-world markup: unclosed tags,
  single-quoted/unquoted/reordered attributes, uppercase tag names.

Module-level UDF names stay bound to the dialect family (back-compat
with round-3 call sites); the crawl plan selects a family via
:func:`udfs_for` (CrawlConfig.html_parser).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import html as H
from . import tolerant as TOL

LIST_ITEM_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("summary", T.StringType()),
            T.StructField("cover", T.StringType()),
        ]
    )
)

ARTICLE_TYPE = T.StructType(
    [
        T.StructField("body_html", T.StringType()),
        T.StructField("body_text", T.StringType()),
        T.StructField("has_video", T.BooleanType()),
        T.StructField("publish_time", T.StringType()),
        T.StructField("author_name", T.StringType()),
        T.StructField("msg_link", T.StringType()),
    ]
)

IMG_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("data_type", T.StringType()),
        ]
    )
)

COMPANY_TYPE = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("address", T.StringType()),
        T.StructField("score", T.StringType()),
        T.StructField("register_capital", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("register_time", T.StringType()),
        T.StructField("legal_repr", T.StringType()),
        T.StructField(
            "staff_info",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("href", T.StringType()),
                        T.StructField("title", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "holder_info",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("link", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("money", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "out_invest",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("link", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("money", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("details", T.MapType(T.StringType(), T.StringType())),
    ]
)


def make_udfs(K) -> dict:
    """Build the full UDF family over kernel module ``K`` (parse.html
    or parse.tolerant — same function names and return shapes)."""

    @F.pandas_udf(LIST_ITEM_TYPE)
    def parse_article_list_udf(html: pd.Series) -> pd.Series:
        return html.map(K.parse_article_list, na_action="ignore")

    @F.pandas_udf(ARTICLE_TYPE)
    def parse_article_udf(html: pd.Series) -> pd.DataFrame:
        recs = html.map(K.parse_article, na_action="ignore")
        return pd.DataFrame(
            [r if isinstance(r, dict) else {} for r in recs], index=html.index
        )

    @F.pandas_udf(IMG_TYPE)
    def parse_images_udf(html: pd.Series) -> pd.Series:
        return html.map(K.parse_images, na_action="ignore")

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def parse_links_udf(html: pd.Series) -> pd.Series:
        return html.map(K.parse_links, na_action="ignore")

    @F.pandas_udf(T.IntegerType())
    def parse_max_page_udf(html: pd.Series) -> pd.Series:
        return html.map(K.parse_max_page, na_action="ignore").astype("Int32")

    @F.pandas_udf(COMPANY_TYPE)
    def parse_company_udf(html: pd.Series) -> pd.DataFrame:
        recs = html.map(K.parse_company, na_action="ignore")
        return pd.DataFrame(
            [r if isinstance(r, dict) else {} for r in recs], index=html.index
        )

    @F.pandas_udf(T.StringType())
    def text_flatten_udf(html: pd.Series) -> pd.Series:
        return html.map(K.text_flatten, na_action="ignore")

    @F.pandas_udf(T.StringType())
    def tiny_html_udf(html: pd.Series) -> pd.Series:
        return html.map(K.tiny_html, na_action="ignore")

    @F.pandas_udf(T.StringType())
    def trim_dom_udf(
        html: pd.Series, marker: pd.Series, direction: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                K.trim_dom(h, m, d) if h is not None else None
                for h, m, d in zip(html, marker, direction)
            ],
            index=html.index,
        )

    @F.pandas_udf(T.StringType())
    def first_query_link_udf(html: pd.Series) -> pd.Series:
        return html.map(K.first_query_link, na_action="ignore")

    @F.pandas_udf(T.StringType())
    def csm_body_text_udf(html: pd.Series) -> pd.Series:
        return html.map(K.csm_body_text, na_action="ignore")

    return {
        "parse_article_list": parse_article_list_udf,
        "parse_article": parse_article_udf,
        "parse_images": parse_images_udf,
        "parse_links": parse_links_udf,
        "parse_max_page": parse_max_page_udf,
        "parse_company": parse_company_udf,
        "text_flatten": text_flatten_udf,
        "tiny_html": tiny_html_udf,
        "trim_dom": trim_dom_udf,
        "first_query_link": first_query_link_udf,
        "csm_body_text": csm_body_text_udf,
    }


_FAMILIES: dict[str, dict] = {}


def udfs_for(html_parser: str) -> dict:
    """UDF family by name: 'dialect' (regex fast path) or 'tolerant'
    (stdlib-DOM real-HTML path). Families are built once per driver."""
    if html_parser not in ("dialect", "tolerant"):
        raise ValueError(f"unknown html_parser: {html_parser!r}")
    if html_parser not in _FAMILIES:
        _FAMILIES[html_parser] = make_udfs(H if html_parser == "dialect" else TOL)
    return _FAMILIES[html_parser]


# back-compat module-level names: the dialect family
_D = udfs_for("dialect")
parse_article_list_udf = _D["parse_article_list"]
parse_article_udf = _D["parse_article"]
parse_images_udf = _D["parse_images"]
parse_links_udf = _D["parse_links"]
parse_max_page_udf = _D["parse_max_page"]
parse_company_udf = _D["parse_company"]
text_flatten_udf = _D["text_flatten"]
tiny_html_udf = _D["tiny_html"]
trim_dom_udf = _D["trim_dom"]


@F.pandas_udf(T.StringType())
def canonicalize_urls_udf(urls: pd.Series) -> pd.Series:
    from ..functions.urls import canonicalize_urls

    return canonicalize_urls(urls)
