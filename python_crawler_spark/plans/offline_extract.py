"""Offline HTML-dir extractor (the reference's 4th entry point).

tianyan_extractor.py:15-30,241-245 scans a directory of saved company
pages (`listdir` + open, one at a time) and inserts a nested Mongo doc
per file. Here that is a one-job Spark dataflow over a REAL file
source:

  spark.read wholetext over <dir>/*.html (S9)
    -> parse_company Arrow UDF (D10-D14)
    -> typed company rows + doc-wrap envelope (D15, K2 analog)
    -> sinks.write_companies(target)

The company id comes from the file name (`result/<id>.html`,
tianyan_crawler.py:169-172), exactly like the reference keys its
records. `binaryFile` would also work; wholetext keeps the html as a
string column with no decode step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..parse.udfs import parse_company_udf


def read_html_dir(spark: SparkSession, path: str) -> DataFrame:
    """S9: one row per saved page file — (path, file_id, html)."""
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(f"{path}/*.html")
        .withColumn("path", F.input_file_name())
    )
    return df.select(
        "path",
        F.regexp_extract("path", r"([^/]+)\.html$", 1).alias("file_id"),
        F.col("value").alias("html"),
    )


def extract_companies_from_dir(
    spark: SparkSession, path: str, fixed_date: str = "2016-06-01"
) -> DataFrame:
    """Full offline extraction: dir scan -> parse -> typed rows.

    Column-compatible with the crawl pipeline's companies table
    (plans/crawl._extract_companies) so both paths feed one sink."""
    pages = read_html_dir(spark, path)
    parsed = pages.withColumn("c", parse_company_udf("html"))
    return parsed.select(
        F.col("file_id").alias("company_id"),
        F.lit("tianyancha").alias("sourceFrom"),
        F.lit(fixed_date).alias("last_update"),
        "c.*",
    )


def wrap_company_docs(companies: DataFrame) -> DataFrame:
    """D15: the {'company': [record]} envelope the Mongo sink receives
    (tianyan_extractor.py:23-30)."""
    payload = F.struct(*[F.col(c) for c in companies.columns])
    return companies.select(F.array(payload).alias("company"))
