"""Driver-contract guards: queries()/oracle_sql() stay aligned and the
registry's plans keep their scale-critical physical properties."""

from __future__ import annotations

import pytest

from python_crawler_spark.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"

# entries intentionally WITHOUT a SQL oracle (rows-only driver check)
NON_SQL = {"streaming_fetch_plan"}


def test_registry_alignment():
    assert set(QUERIES) - set(ORACLE_SQL) == NON_SQL
    assert set(ORACLE_SQL) <= set(QUERIES)


def test_entry_module_contract():
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert set(q) - set(o) == NON_SQL | {"crawl_fetch_schedule"}
    assert callable(q["frontier_schedule"])


@pytest.mark.parametrize(
    "name, fragment",
    [
        ("tpch_q1", "PushedFilters: [IsNotNull(l_shipdate)"),  # scan pushdown
        ("star_join_revenue", "BroadcastHashJoin"),  # dims broadcast
        ("cosine_topk", "TakeOrderedAndProject"),  # distributed top-k
    ],
)
def test_plan_properties(spark, name, fragment):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert fragment in plan, f"{name} plan lost '{fragment}':\n{plan[:3000]}"


def test_star_join_has_no_sort_merge(spark):
    df = QUERIES["star_join_revenue"](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["phash_hamming", "minhash_near_dup", "embed_cosine_dedup", "ngram_jaccard_pairs"],
)
def test_near_dup_joins_are_banded_not_cartesian(spark, name):
    """Every near-dup pair generator must candidate via an equi-join
    on its band/bucket key — never a cartesian or nested-loop pair
    space (the round-1 phash plan was all-pairs within source;
    VERDICT 'What's wrong' #2)."""
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
