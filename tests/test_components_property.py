"""Property-based test: connected_components must agree with a union-find
reference on arbitrary generated graphs (cycles, chains, self-loops,
duplicate edges, multiple components)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

node_s = st.integers(min_value=0, max_value=11)


def uf_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None)
@given(edges=st.lists(st.tuples(node_s, node_s), min_size=1, max_size=16))
def test_components_match_union_find(spark_global, edges):
    from mrcond_spark.operators.components import connected_components

    spark = spark_global
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["node"]: r["component"] for r in connected_components(df, max_iter=16).collect()
    }
    assert got == uf_reference(edges)
