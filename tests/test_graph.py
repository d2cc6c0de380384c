"""Both connected-components paths (driver union-find, distributed
large-star/small-star contraction) produce identical components."""

from dwh_spark.operators.graph import connected_components


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


EDGES = [
    (1, 2), (2, 3),          # chain -> {1,2,3}
    (10, 11),                # pair
    (20, 21), (21, 22), (20, 22),  # triangle
    (30, 31), (31, 32), (32, 33), (33, 34),  # long chain (diameter 4)
]

WANT = {
    1: 1, 2: 1, 3: 1,
    10: 10, 11: 10,
    20: 20, 21: 20, 22: 20,
    30: 30, 31: 30, 32: 30, 33: 30, 34: 30,
}


def test_driver_union_find_path(spark):
    assert _components(spark, EDGES) == WANT


def test_distributed_star_contraction_path(spark):
    assert _components(spark, EDGES, driver_threshold=0) == WANT


def test_star_contraction_long_chain_converges_fast(spark):
    """A diameter-40 chain must reach a VERIFIED fixpoint inside
    max_rounds=8 (measured: 7 rounds, incl. the confirming one) where
    naive min-label propagation would need 40 rounds — the O(log² n)
    star-contraction bound."""
    chain = [(i, i + 1) for i in range(100, 140)]
    want = {i: 100 for i in range(100, 141)}
    assert _components(spark, chain, driver_threshold=0, max_rounds=8) == want


def test_star_contraction_raises_on_round_exhaustion(spark):
    """If the fixpoint is not reached within max_rounds the operator
    must raise, not emit a plausible-but-unverified labeling."""
    import pytest

    chain = [(i, i + 1) for i in range(100, 140)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _components(spark, chain, driver_threshold=0, max_rounds=2)


def test_star_contraction_string_nodes(spark):
    """Doc-id (string) nodes: lexicographic min is the component id on
    both paths, matching the dedup canonical-survivor policy."""
    edges = [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    for kw in ({}, {"driver_threshold": 0}):
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, **kw).collect()
        }
        assert got == {
            "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
            "x": "x", "y": "x",
        }
