"""Iterative graph operator: connected components by label propagation.

Near-duplicate PAIRS (dedup.py) are only half the dedup story — to
keep one canonical doc per duplicate *group*, transitively-linked
pairs must collapse into components (a~b, b~c ⇒ {a,b,c} even when
a,c were never compared). That's a connected-components computation,
the one genuinely iterative algorithm in the pipeline.

Spark-first shape: min-label propagation — every node starts labeled
with its own id; each round, every node takes the min label among
itself and its neighbors; fixpoint = components labeled by their min
member. Each round is one shuffle (join + groupBy-min).

Scale notes: rounds needed = graph diameter, and near-dup graphs are
shallow (dense clusters, tiny diameter), so 3-5 rounds close most
corpora. Each round persists its labels and unpersists the previous
(lineage would otherwise grow exponentially). The convergence check
is one small count per round. At extreme scale swap in the
large-star/small-star algorithm (Kiveris et al. 2014) — same
join+min building blocks, provably fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component id =
    min node id in the component. Deterministic regardless of
    partitioning (min is associative-commutative)."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()  # materialize before the loop
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
