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
- **Distributed large-star/small-star contraction** (above threshold):
  alternate the two star operations of Kiveris et al. 2014 ("Connected
  Components in MapReduce and Beyond") until the edge set is a union of
  stars centered at component minima. Each half-round is one
  groupBy-min + one equi-join shuffle; convergence is O(log² n) rounds
  regardless of diameter — a billion-edge chain finishes in ~a dozen
  shuffles where naive min-label propagation would need diameter-many.

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
    # pandas input → Arrow → JVM LocalRelation; a python-list input
    # would re-run defaultParallelism python-RDD partitions on every
    # downstream action (see operators/sketch.py:mg_merge)
    import pandas as pd

    return sym.sparkSession.createDataFrame(
        pd.DataFrame(out, columns=["node", "component"]), schema
    )


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected pair list → both directions, self-loops dropped."""
    return (
        edges.select("a", "b")
        .unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to m(u) = min(Γ(u) ∪ {u})."""
    s = _symmetrize(edges)
    m = s.groupBy("a").agg(F.least(F.col("a"), F.min("b")).alias("m"))
    return (
        s.filter(F.col("b") > F.col("a"))
        .join(m, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's strictly-smaller neighborhood N⁻(u), connect
    every member (and u itself) to min(N⁻(u))."""
    d = _symmetrize(edges).filter(F.col("b") < F.col("a"))
    m = d.groupBy("a").agg(F.min("b").alias("m"))
    nbr = (
        d.join(m, "a")
        .filter(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    return nbr.unionByName(m.select("a", F.col("m").alias("b"))).distinct()


def _pair_invariant(edges: DataFrame) -> tuple:
    """Order-insensitive fingerprint of a distinct canonical pair set:
    (count, xor of 64-bit pair hashes). One map-side-combinable
    aggregate — no join, no shuffle of the edge set itself."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("x"),
    ).collect()[0]
    return row["n"], row["x"]


def _star_contract(sym: DataFrame, max_rounds: int) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al. 2014) until the
    edge set stabilizes as stars; label every node with its star center
    (= min id of its component).

    Each round ends in an eager ``localCheckpoint`` — NOT a bare
    ``persist``: one round references ``edges`` ~6× (two symmetrize
    passes + the fixpoint probe), so without lineage truncation the
    logical plan grows 6^k nodes by round k and Catalyst analysis OOMs
    the driver long before the data does. On a real cluster swap in
    ``checkpoint()`` against the cluster FS if executor loss must be
    survivable mid-algorithm; the shape is identical.

    Convergence probe: non-converged rounds pay ONE aggregate over the
    new edge set (count + xor-of-pair-hashes, `_pair_invariant`), not
    the two full `exceptAll` shuffles the r4 version paid. Only when
    the invariant ties do we confirm exactly with a single one-sided
    `exceptAll` (equal distinct cardinality + empty one-sided diff ⇒
    equal sets), so the exact check runs once, on the final round.

    Raises RuntimeError if the fixpoint is not reached within
    ``max_rounds``: the closing labeling (node → least(a, min Γ(a))) is
    only correct on a stabilized star edge set, so falling through
    silently would emit plausible-looking wrong components."""
    edges = sym.filter(F.col("a") < F.col("b")).distinct().localCheckpoint()
    inv = _pair_invariant(edges)
    converged = False
    for _ in range(max_rounds):
        contracted = _small_star(_large_star(edges))
        # canonicalize for a well-defined fixpoint test (star edges come
        # out center-last; compare as unordered pairs)
        new_edges = (
            contracted.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .distinct()
            .localCheckpoint()
        )
        new_inv = _pair_invariant(new_edges)
        if new_inv == inv and new_edges.exceptAll(edges).count() == 0:
            edges = new_edges
            converged = True
            break
        inv = new_inv
        edges = new_edges
    if not converged:
        raise RuntimeError(
            f"star contraction did not converge within max_rounds={max_rounds}; "
            "the labeling would be wrong on an unstabilized edge set — raise "
            "max_rounds (Kiveris et al. bound O(log² n) rounds)"
        )
    s = _symmetrize(edges)
    return s.groupBy("a").agg(F.least(F.col("a"), F.min("b")).alias("component")).select(
        F.col("a").alias("node"), "component"
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 20,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component id =
    min node id in the component. Deterministic regardless of
    partitioning and identical across both execution paths.

    ``driver_threshold`` bounds the union-find path by what a driver
    holds comfortably: 1M symmetric string-keyed pairs is ~100-200 MB
    of Python dict — safe; beyond that the star-contraction path takes
    over (r3 verdict: the old 10M default was driver-memory-optimistic
    at ~GBs)."""
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
        return _star_contract(sym, max_rounds)
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
