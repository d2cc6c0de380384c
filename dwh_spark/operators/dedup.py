"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference deduplicates binary content by md5 content hash
(`x/imgresizer/resizer.go:137-174`, `x/imgstorage/storage.go:37-61`);
a 100 TB training-data pipeline needs the near-duplicate family too.
All operators are pure DataFrame compositions (no Python UDFs) and
use md5-derived hashing so a DuckDB oracle can reproduce them
bit-for-bit.

Scale notes:
- exact dedup = hash groupBy: one shuffle on a 128-bit key, partial
  aggregation collapses duplicates map-side.
- n-gram Jaccard via inverted shingle index: the candidate join blows
  up quadratically in shingle frequency — correct at small scale,
  superseded by MinHash LSH at 100 TB (band-bucket join bounds the
  candidate set; false negatives only below the similarity threshold).
- MinHash here uses lexicographic-min md5(seed:shingle) as the hash
  family — engine-portable, deterministic, no RNG state to ship.
- SimHash blocks on the high 16 bits, so the hamming join only
  compares within blocks (at scale: permute-and-reblock to cover
  rotations; one permutation implemented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dwh_spark.functions.text import shingles, word_hash32, words


def exact_duplicates(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts (md5 + equality): one row per
    duplicated content hash with the canonical (min) key and count."""
    return (
        df.groupBy(F.md5(F.col(text)).alias("content_md5"))
        .agg(F.min(key).alias("canonical_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def shingle_index(df: DataFrame, text: str = "text", key: str = "doc_id", k: int = 3) -> DataFrame:
    """Inverted index: (key, shingle) with per-doc distinct shingles."""
    return df.select(F.col(key), F.explode(shingles(F.col(text), k)).alias("shingle"))


def jaccard_pairs(
    df: DataFrame, text: str = "text", key: str = "doc_id", k: int = 3, threshold: float = 0.7
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via inverted index.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    idx = shingle_index(df, text, key, k)
    sizes = idx.groupBy(key).agg(F.count("*").alias("n_sh"))
    a = idx.select(F.col(key).alias("id_a"), "shingle")
    b = idx.select(F.col(key).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(key).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(key).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, text: str = "text", key: str = "doc_id", k: int = 3, n_hashes: int = 16
) -> DataFrame:
    """(key, seed, minhash) — minhash = lexicographic min of
    md5('<seed>:' || shingle) over the doc's shingles."""
    idx = shingle_index(df, text, key, k)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    return (
        idx.select(key, "shingle")
        .select(key, "shingle", seeds)
        .groupBy(key, "seed")
        .agg(F.min(F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle")))).alias("minhash"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing ≥1 identical band.

    rows_per_band = n_hashes / bands; band key = md5 of the
    concatenated minhashes in seed order. This is THE scale path for
    near-dup at 100 TB: candidates are bounded by bucket collisions,
    not by shingle frequency.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text, key, k, n_hashes)
    banded = (
        sigs.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(key, "band")
        # seed order inside the band must be deterministic
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(F.struct("seed", "minhash"))).getField("minhash"))).alias("band_key"))
    )
    a = banded.select(F.col(key).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(key).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash-LSH pipeline: band-bucket candidates, then exact
    Jaccard verification of candidates only."""
    cands = lsh_candidate_pairs(df, text, key, k, n_hashes, bands)
    idx = shingle_index(df, text, key, k)
    sizes = idx.groupBy(key).agg(F.count("*").alias("n_sh"))
    a = idx.select(F.col(key).alias("id_a"), "shingle")
    b = idx.select(F.col(key).alias("id_b"), "shingle")
    common = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(key).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(key).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text: str = "text", key: str = "doc_id", bits: int = 32) -> DataFrame:
    """32-bit SimHash over distinct words (md5-derived bit weights)."""
    toks = df.select(key, F.explode(F.array_distinct(words(F.col(text)))).alias("word"))
    hashed = toks.withColumn("h", word_hash32(F.col("word")))
    expanded = hashed.select(
        key, "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    )
    # shiftright/shiftleft take only literal amounts in the Python API;
    # the SQL forms accept a column shift
    weighted = expanded.withColumn(
        "w", F.when(F.expr("shiftright(h, j)").bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
    )
    return (
        weighted.groupBy(key, "j")
        .agg(F.sum("w").alias("wsum"))
        .groupBy(key)
        .agg(
            F.sum(
                F.when(F.col("wsum") > 0, F.expr("shiftleft(cast(1 as bigint), j)")).otherwise(0)
            ).alias("simhash")
        )
    )


def simhash_near_duplicates(
    df: DataFrame, text: str = "text", key: str = "doc_id", max_hamming: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on the high
    16 bits so the join never goes quadratic in the table size."""
    sh = simhash(df, text, key)
    blocked = sh.withColumn("block", F.shiftright(F.col("simhash"), 16))
    a = blocked.select(F.col(key).alias("id_a"), F.col("simhash").alias("sh_a"), "block")
    b = blocked.select(F.col(key).alias("id_b"), F.col("simhash").alias("sh_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
