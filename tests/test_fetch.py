"""Fetch-stage plumbing: per-url rows, error rows, rate limiting."""

import time

from pyspark.sql import functions as F

from dwh_spark.sources.fetch import deterministic_transport, fetch_urls


def test_fetch_emits_row_per_url_with_errors(spark):
    urls = spark.createDataFrame(
        [("http://x/1",), ("http://x/missing/2",), ("http://x/3",)], "url string"
    )
    rows = {r["url"]: r for r in fetch_urls(urls).collect()}
    assert len(rows) == 3
    assert rows["http://x/1"]["status"] == 200
    assert rows["http://x/missing/2"]["status"] == 404
    assert rows["http://x/missing/2"]["n_bytes"] == 0
    assert '"ok": true' in rows["http://x/3"]["body"]


def test_fetch_transport_exception_becomes_error_row(spark):
    def bomb(url):
        raise RuntimeError("connection reset")

    urls = spark.createDataFrame([("http://x/a",)], "url string")
    (row,) = fetch_urls(urls, transport=bomb).collect()
    assert row["status"] == -1 and row["body"] == ""


def test_fetch_rate_limit_paces_worker(spark):
    urls = spark.createDataFrame([(f"http://x/{i}",) for i in range(6)], "url string")
    single = urls.coalesce(1)
    t0 = time.monotonic()
    assert fetch_urls(single, per_worker_rps=20).count() == 6
    elapsed = time.monotonic() - t0
    # 6 fetches at 20 rps on one worker >= 0.25 s of enforced spacing
    assert elapsed >= 0.25


def test_deterministic_transport_is_pure():
    assert deterministic_transport("http://a") == deterministic_transport("http://a")
