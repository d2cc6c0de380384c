"""Mergeable bounded-rank-error quantile sketch (deterministic MRL).

The 128-bucket histogram (plans/pipeline_extra.py:
events_value_histogram_quantiles) has DATA-DEPENDENT error — a skewed
distribution can put most mass in one bucket. This module adds the
complementary sketch with a distribution-independent guarantee: a
compactor hierarchy in the Manku-Rajagopalan-Lindsay / KLL family
("Mergeable Summaries", Agarwal et al. 2012; KLL, Karnin et al. 2016).

Design choices, deliberately different from stock KLL:

- **Deterministic compaction** (always keep odd merge positions)
  instead of random coin flips: for a FIXED merge order the estimates
  are bit-reproducible across runs, which the cross-engine
  correctness gate requires — the operator pins that order by merging
  per-partition sketches sorted by partition id. Compaction is eager,
  so DIFFERENT merge orders may yield (boundedly) different
  estimates; what is order-independent is the certified ±err_bound
  rank guarantee, and the collapse pair selection is content-
  canonical so a given buffer multiset always collapses the same way.
  The price of determinism is the O(n·log(n/k)/k) MRL bound, not
  KLL's tighter randomized one.
- **Self-tracked error bound**: every collapse of two weight-``w``
  buffers adds exactly ``w`` to ``err_bound`` (the classical per-
  collapse worst case). The sketch therefore carries its own certified
  ±err_bound rank guarantee — the property test and the driver query
  assert against what the sketch *claims*, so the guarantee can never
  silently drift from the implementation.
- **Mergeability is the point at scale**: one sketch per partition
  (built batch-wise from Arrow record batches), merged in a fixed
  order. At 100 TB that is the map-side-combine shape: k·log(n/k)
  floats per partition cross the wire, never the raw values. The
  same property lets daily sketches roll up into monthly ones without
  touching raw data (the hypertable-rollup pattern).

Reference parity: the reference exposes estimated aggregates through
its query layer (SURVEY.md §2 D5 family); this extends the estimated
family from distinct counts (KMV/HLL) to quantiles.
"""

from __future__ import annotations

import numpy as np


class MRLSketch:
    """Deterministic mergeable quantile sketch.

    ``k`` is the buffer size: memory is O(k·log(n/k)); the tracked
    worst-case rank error after n inserts is ~n·log2(n/k)/(2k) (the
    sketch reports its exact accumulated bound in ``err_bound``).
    """

    def __init__(self, k: int = 512) -> None:
        if k < 2 or k % 2:
            raise ValueError("k must be an even integer >= 2")
        self.k = k
        # full buffers: list of (weight, sorted np.ndarray of size k),
        # kept in a canonical order (weight asc, then creation seq)
        self.buffers: list[tuple[int, np.ndarray]] = []
        self.fill = np.empty(0, np.float64)  # weight-1 staging, < k items
        self.n = 0
        self.err_bound = 0

    # ------------------------------------------------------------- build

    def insert_batch(self, values: np.ndarray) -> None:
        values = np.asarray(values, np.float64)
        values = values[~np.isnan(values)]
        self.n += len(values)
        self.fill = np.concatenate([self.fill, values])
        while len(self.fill) >= self.k:
            head, self.fill = self.fill[: self.k], self.fill[self.k :]
            self.buffers.append((1, np.sort(head)))
            self._collapse()

    def _collapse(self) -> None:
        """While two buffers share a weight, merge them: sort the 2k
        union, keep ODD positions (deterministic), weight doubles,
        err_bound += w. The processing order is CONTENT-canonical —
        buffers sort by (weight, values lexicographically), not by
        arrival — so the final state is a pure function of the
        buffer multiset, independent of merge/insertion order (equal-
        weight ties resolve by value, and identical-content ties merge
        symmetrically)."""
        while True:
            self.buffers.sort(key=lambda b: (b[0], tuple(b[1])))
            pair = None
            for i in range(len(self.buffers) - 1):
                if self.buffers[i][0] == self.buffers[i + 1][0]:
                    pair = i
                    break
            if pair is None:
                return
            w, a = self.buffers.pop(pair)
            _, b = self.buffers.pop(pair)
            merged = np.sort(np.concatenate([a, b]))
            self.buffers.append((2 * w, merged[1::2]))
            self.err_bound += w

    # ------------------------------------------------------------- merge

    def merge(self, other: "MRLSketch") -> "MRLSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        self.n += other.n
        self.err_bound += other.err_bound
        self.buffers.extend(other.buffers)
        self._collapse()
        # combine staging areas; SORT before re-chunking so the merged
        # fill (and any weight-1 buffers it spills into) depends only
        # on the value multiset, never on which side was `self`
        fill = np.sort(np.concatenate([self.fill, other.fill]))
        self.fill = np.empty(0, np.float64)
        self.n -= len(fill)  # insert_batch re-counts them
        self.insert_batch(fill)
        return self

    # ------------------------------------------------------------- query

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = [self.fill] + [buf for _, buf in self.buffers]
        wgts = [np.ones(len(self.fill))] + [
            np.full(len(buf), float(w)) for w, buf in self.buffers
        ]
        v = np.concatenate(vals)
        w = np.concatenate(wgts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Smallest retained value whose estimated rank ≥ ceil(q·n)."""
        if self.n == 0:
            raise ValueError("empty sketch")
        v, w = self._weighted()
        target = max(1, int(np.ceil(q * self.n)))
        ix = int(np.searchsorted(np.cumsum(w), target))
        return float(v[min(ix, len(v) - 1)])

    def rank(self, x: float) -> float:
        """Estimated number of inserted values ≤ x (0 below the min —
        a bare [idx-1] would wrap to the TOTAL weight)."""
        v, w = self._weighted()
        idx = np.searchsorted(v, x, side="right") if len(v) else 0
        return float(np.cumsum(w)[idx - 1]) if idx > 0 else 0.0

    # --------------------------------------------------------- transport

    def to_rows(self) -> list[tuple[int, list[float]]]:
        """Serialize as (weight, values) rows — the shuffle-friendly
        shape for collecting per-partition sketches."""
        rows = [(w, buf.tolist()) for w, buf in self.buffers]
        if len(self.fill):
            rows.append((0, self.fill.tolist()))  # weight-0 marks staging
        return rows

    @classmethod
    def from_rows(
        cls, rows: list[tuple[int, list[float]]], k: int, n: int, err_bound: int
    ) -> "MRLSketch":
        s = cls(k)
        for w, vals in rows:
            if w == 0:
                s.fill = np.asarray(vals, np.float64)
            else:
                s.buffers.append((int(w), np.asarray(vals, np.float64)))
        s.n = n
        s.err_bound = err_bound
        return s

    def audit_bound(self) -> int:
        """Certified worst-case |true_rank(quantile(q)) − ceil(q·n)|:
        accumulated collapse error plus one buffer of discretization."""
        return self.err_bound + self.k
