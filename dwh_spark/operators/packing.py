"""Sequence packing — batching documents into fixed token budgets.

LLM pretraining consumes fixed-length context windows; feeding one
short document per window wastes most of it. Packing assigns documents
to consecutive "packs" so each pack's token total approaches the
budget. This is the *next-fit-by-offset* formulation: documents are
laid out in a deterministic order and a document belongs to the pack
its STARTING token offset falls in. It is a pure prefix-sum over the
corpus — no driver loop, no UDF — at the cost of letting a document
straddle a pack boundary (exactly how GPT-style pretraining packs
tokens: concatenate-then-slice).

Scale: the running sum is windowed per shard column (e.g. language or
a hash shard), so the layout parallelizes across shards; within a
shard the window is one ordered scan. Shard width controls the only
sort — pick shards so one shard's documents fit a task's spill budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_by_budget(
    df: DataFrame,
    tokens: Column,
    budget: int,
    shard: str,
    order: str,
) -> DataFrame:
    """Append ``n_tok`` and ``pack_id``: consecutive documents (ordered
    by ``order`` within ``shard``) whose starting token offset falls in
    the same ``budget``-sized window share a pack."""
    w = (
        Window.partitionBy(shard)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_tok = df.withColumn("n_tok", tokens)
    start_offset = F.sum("n_tok").over(w) - F.col("n_tok")
    return with_tok.withColumn(
        "pack_id", F.floor(start_offset / F.lit(float(budget))).cast("long")
    )
