"""Connected-component operators (operators/components.py): the two
algorithms agree with each other and with a pure-Python union-find on
graph shapes that stress them differently — near-cliques (the real
near-dup shape), long chains (adversarial for propagation), and a mix
with singleton handling via isolated vertices in the edge list."""

from __future__ import annotations

import random

from python_crawler_spark.operators.components import (
    cc_alternating_stars,
    cc_label_propagation,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _graphs():
    rng = random.Random(42)
    # near-cliques: the actual near-dup component shape
    cliques = []
    base = 0
    for size in (2, 3, 5, 8):
        members = list(range(base, base + size))
        cliques += [(a, b) for a in members for b in members if a < b]
        base += size + 3  # gaps -> ids are not contiguous
    # long chain: diameter 40, worst case for propagation
    chain = [(i, i + 1) for i in range(100, 140)]
    # random sparse graph
    nodes = list(range(200, 260))
    rand = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
    rand = [(a, b) for a, b in rand if a != b]
    return cliques + chain + rand


def test_cc_algorithms_agree(spark):
    edges = _graphs()
    nodes = sorted({n for e in edges for n in e})
    want = _union_find(nodes, edges)

    edf = spark.createDataFrame(edges, "a long, b long").localCheckpoint(eager=True)
    got_lp = {
        r["doc_id"]: r["cluster"] for r in cc_label_propagation(edf).collect()
    }
    got_st = {
        r["doc_id"]: r["cluster"] for r in cc_alternating_stars(edf).collect()
    }
    assert got_lp == want
    assert got_st == want


def test_alternating_stars_round_bound(spark):
    """The star algorithm must finish a 40-hop chain in far fewer
    rounds than its diameter (that's its whole point); max_rounds=8
    (~2*log2(41)) must suffice where propagation would need 40."""
    chain = [(i, i + 1) for i in range(40)]
    edf = spark.createDataFrame(chain, "a long, b long").localCheckpoint(eager=True)
    got = {r["doc_id"]: r["cluster"] for r in cc_alternating_stars(edf, max_rounds=8).collect()}
    assert got == {i: 0 for i in range(41)}


def test_non_convergence_raises_not_silent(spark):
    """Round-3 verdict 'What's wrong #1': exhausting max_rounds used
    to RETURN partially merged labels — wrong survivor election that
    looks exactly like valid output. Both algorithms must now raise
    ConvergenceError instead. A 12-hop chain needs 12 propagation
    rounds and ~2*log2(13)≈8 star rounds; cap both below that."""
    import pytest

    from python_crawler_spark.operators.components import ConvergenceError

    chain = [(i, i + 1) for i in range(12)]
    edf = spark.createDataFrame(chain, "a long, b long").localCheckpoint(eager=True)
    with pytest.raises(ConvergenceError):
        cc_label_propagation(edf, max_rounds=3)
    with pytest.raises(ConvergenceError):
        cc_alternating_stars(edf, max_rounds=1)
    # converged runs on the same graph still succeed (guard only trips
    # on exhaustion, never on a legitimate fixed point)
    got = {r["doc_id"]: r["cluster"] for r in cc_label_propagation(edf).collect()}
    assert got == {i: 0 for i in range(13)}


def test_cc_frees_intermediate_checkpoints(spark):
    """Per-round checkpoints must be unpersisted as the loop advances
    (O(1) live blocks, not O(rounds)) and the edge input freed; only
    the blocks the RETURNED plan reads may remain."""
    from python_crawler_spark.operators.components import _rdd_ids, _unpersist

    chain = [(i, i + 1) for i in range(30)]
    edf = spark.createDataFrame(chain, "a long, b long")
    base = _rdd_ids(spark)
    labels = cc_label_propagation(edf, max_rounds=50)
    labels.count()
    live = _rdd_ids(spark) - base
    # final labels checkpoint only (sym + all per-round labels freed)
    assert len(live) <= 1, f"leaked checkpoints: {sorted(live)}"
    _unpersist(spark, live)

    base = _rdd_ids(spark)
    labels = cc_alternating_stars(edf, max_rounds=30)
    labels.count()
    live = _rdd_ids(spark) - base
    # singletons + final edge set only
    assert len(live) <= 2, f"leaked checkpoints: {sorted(live)}"
    _unpersist(spark, live)
