"""Property-based check of connected_components against a reference
union-find on random graphs (the hypothesis gap-fill strategy applied
to the iterative operator): for ANY edge list, the Spark hash-min
propagation must produce exactly the union-find components with
min-id canonical labels."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, set[int]] = {}
    for node in parent:
        groups.setdefault(find(node), set()).add(node)
    return {node: min(members) for members in groups.values() for node in members}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_components_match_union_find(spark, edges):
    from s1tiling_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    want = _union_find(edges)
    assert got == want


def test_long_chain_converges_with_pointer_jumping(spark):
    """A 60-node path graph (diameter 59) must converge well inside
    max_iters — pointer jumping gives O(log diameter) rounds where pure
    hash-min would need 59 and raise."""
    from s1tiling_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(59)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, max_iters=12).collect()
    }
    assert got == {i: 0 for i in range(60)}


def test_near_dup_survivors_keeps_one_per_cluster(spark):
    """Survivor composition: docs in no pair survive; each pair-graph
    cluster keeps exactly its minimum doc_id."""
    from s1tiling_spark.operators.dedup import near_dup_survivors

    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(10)], "doc_id long, text string"
    )
    #  clusters: {0,1,2} (chain), {5,6} — 3,4,7,8,9 untouched
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    got = sorted(r["doc_id"] for r in near_dup_survivors(docs, pairs).collect())
    assert got == [0, 3, 4, 5, 7, 8, 9]
