"""Arrow-vectorized Spark UDFs wrapping the parse kernels.

Each UDF takes a pd.Series of html strings per Arrow batch and returns
typed columns — the Spark-side face of SURVEY §2.8 ("no per-row
Python" means no row-at-a-time F.udf; every batch crosses the Arrow
boundary once and is processed with pandas .map over the batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import html as H

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


@F.pandas_udf(LIST_ITEM_TYPE)
def parse_article_list_udf(html: pd.Series) -> pd.Series:
    return html.map(H.parse_article_list, na_action="ignore")


@F.pandas_udf(ARTICLE_TYPE)
def parse_article_udf(html: pd.Series) -> pd.DataFrame:
    recs = html.map(H.parse_article, na_action="ignore")
    return pd.DataFrame(
        [r if isinstance(r, dict) else {} for r in recs], index=html.index
    )


@F.pandas_udf(IMG_TYPE)
def parse_images_udf(html: pd.Series) -> pd.Series:
    return html.map(H.parse_images, na_action="ignore")


@F.pandas_udf(T.ArrayType(T.StringType()))
def parse_links_udf(html: pd.Series) -> pd.Series:
    return html.map(H.parse_links, na_action="ignore")


@F.pandas_udf(T.IntegerType())
def parse_max_page_udf(html: pd.Series) -> pd.Series:
    return html.map(H.parse_max_page, na_action="ignore").astype("Int32")


@F.pandas_udf(COMPANY_TYPE)
def parse_company_udf(html: pd.Series) -> pd.DataFrame:
    recs = html.map(H.parse_company, na_action="ignore")
    return pd.DataFrame(
        [r if isinstance(r, dict) else {} for r in recs], index=html.index
    )


@F.pandas_udf(T.StringType())
def text_flatten_udf(html: pd.Series) -> pd.Series:
    return html.map(H.text_flatten, na_action="ignore")


@F.pandas_udf(T.StringType())
def tiny_html_udf(html: pd.Series) -> pd.Series:
    return html.map(H.tiny_html, na_action="ignore")


@F.pandas_udf(T.StringType())
def trim_dom_udf(html: pd.Series, marker: pd.Series, direction: pd.Series) -> pd.Series:
    return pd.Series(
        [
            H.trim_dom(h, m, d) if h is not None else None
            for h, m, d in zip(html, marker, direction)
        ],
        index=html.index,
    )


@F.pandas_udf(T.StringType())
def canonicalize_urls_udf(urls: pd.Series) -> pd.Series:
    from ..functions.urls import canonicalize_urls

    return canonicalize_urls(urls)
