"""Both connected-components paths (driver union-find, distributed
label propagation) produce identical components."""

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


def test_distributed_propagation_path(spark):
    assert _components(spark, EDGES, driver_threshold=0) == WANT
