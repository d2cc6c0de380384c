"""Iterative graph operator: connected components over dedup pairs.

Near-duplicate PAIRS (dedup.py) are only half the dedup story — to
keep one canonical doc per duplicate *group*, transitively-linked
pairs must collapse into components (a~b, b~c ⇒ {a,b,c} even when
a,c were never compared).

Two execution paths, chosen by measured edge count:

- **Driver union-find** (graph below ``driver_threshold`` edges): the
  pair graph is orders of magnitude smaller than its corpus — 100 TB
  of text yields millions of dup edges, which fit in driver memory
  trivially. Collecting them and running union-find beats scheduling
  Spark stages per iteration (each distributed round pays plan +
  codegen + task scheduling that dwarfs the compute at this size).
- **Distributed min-label propagation** (above threshold): every node
  starts labeled with its own id; each round takes the min label over
  itself + neighbors; fixpoint = components labeled by min member.
  One join+groupBy shuffle per round, labels persisted per round,
  rounds bounded by graph diameter (shallow for dup clusters). At
  extreme scale swap in large-star/small-star (Kiveris et al. 2014) —
  same building blocks, provably fewer rounds.

Both paths return identical results (pinned by tests/test_graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _driver_union_find(sym: DataFrame, node_field) -> DataFrame:
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in sym.collect():
        a, b = row["a"], row["b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the component id is the min member
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(n, find(n)) for n in parent]
    schema = StructType([
        StructField("node", node_field.dataType),
        StructField("component", node_field.dataType),
    ])
    return sym.sparkSession.createDataFrame(out, schema)


def _propagate(sym: DataFrame, max_rounds: int) -> DataFrame:
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()
    for _ in range(max_rounds):
        neighbor_labels = (
            sym.join(labels, sym.a == labels.node)
            .select(F.col("b").alias("node"), "label")
        )
        new_labels = (
            labels.select("node", "label")
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 20,
    driver_threshold: int = 10_000_000,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component id =
    min node id in the component. Deterministic regardless of
    partitioning and identical across both execution paths."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    n_edges = sym.count()
    try:
        if n_edges <= driver_threshold:
            return _driver_union_find(sym, edges.schema[src])
        return _propagate(sym, max_rounds)
    finally:
        # both paths have materialized everything they need by now
        sym.unpersist()


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank by bounded power iteration.

    Each round is the classic message-passing shape: every node sends
    ``rank · w/out_total`` along its out-edges (one join), messages
    aggregate per destination (one map-side-combinable shuffle), and
    ranks re-teleport with the damping factor. Rounds are a fixed
    ``n_iter``, so the plan is a finite unrolled pipeline — no driver
    loop over ``.collect()``; the node count (the only scalar pulled to
    the driver) is bounded by the vertex-table cardinality.

    Determinism across engines (registry.py rules): per-edge messages
    are ``round(rank · (w / out_total), 12)`` — products of exact
    6-decimal ranks with correctly-rounded double ratios — accumulated
    as DECIMAL(16,12) so partition order can't drift the sum; ranks are
    re-rounded to 6 decimals every round. Dangling nodes leak rank
    (standard simplification), identically on both engines.

    Returns (name, rank) after ``n_iter`` rounds.
    """
    # The aggregated edge list is vertex²-bounded (tiny next to the
    # fact tables it came from) but is consumed once per round — persist
    # it so the upstream build (often a multi-table star join) runs
    # exactly once, not n_iter times.
    edges = edges.persist()
    nodes = (
        edges.select(F.col(src).alias("name"))
        .union(edges.select(F.col(dst).alias("name")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    outw = edges.groupBy(src).agg(F.sum(weight).alias("out_total"))
    # All float constants stay as IEEE-double *expressions* (1.0 - d,
    # x / n), never Python-pre-folded: 1.0 - 0.85 != double(0.15) at
    # the ulp level, and the oracle computes the SQL-side sequence.
    n_dbl = F.lit(float(n))
    ranks = nodes.select("name", F.round(F.lit(1.0) / n_dbl, 6).alias("rank"))
    for _ in range(n_iter):
        msgs = (
            ranks.join(edges, ranks["name"] == edges[src])
            .join(outw, src)
            .select(
                F.col(dst).alias("name"),
                F.round(
                    F.col("rank") * (F.col(weight) / F.col("out_total").cast("double")),
                    12,
                )
                .cast("decimal(16,12)")
                .alias("m"),
            )
        )
        inbox = msgs.groupBy("name").agg(F.sum("m").cast("double").alias("s"))
        ranks = nodes.join(inbox, "name", "left").select(
            "name",
            F.round(
                (F.lit(1.0) - F.lit(damping)) / n_dbl
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                6,
            ).alias("rank"),
        )
    return ranks
