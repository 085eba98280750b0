"""Per-partition Bloom-filter sidecar for the URL-seen set.

The north_star design point: at a 10^10-URL frontier the exact seen
anti-join shuffles every candidate link; a Bloom pre-pass answers
"definitely new" for the overwhelming majority of links partition-locally,
so only "maybe seen" candidates reach the exact anti-join (which stays the
authority — Bloom has false positives, never false negatives, so results
are byte-identical with the filter on or off; tests assert this).

Layout: the seen keys bucket by ``xxhash64(host_group) % num_buckets``
(same bucketing as the frontier, so screening co-partitions); one bitmap
row per bucket, built with ``applyInPandas`` (vectorized numpy, k indexes
derived from the md5 key material itself — no extra hashing pass). The
sidecar is itself a small DataFrame/table: (bucket, bitmap, n_keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StructField, StructType)

SIDECAR_SCHEMA = StructType([
    StructField("bucket", IntegerType()),
    StructField("bitmap", BinaryType()),
    StructField("n_keys", LongType()),
])


def _indexes(keys: pd.Series, bits: int, k: int) -> np.ndarray:
    """k bit-positions per key, derived from the md5-hex seen key itself
    (worker.py:120-128 keys are md5 hexdigests — 128 bits of entropy to
    slice, no rehash needed). Returns (n, k) int array."""
    out = np.empty((len(keys), k), dtype=np.int64)
    for i, key in enumerate(keys):
        h = int(key, 16)
        for j in range(k):
            out[i, j] = (h >> (j * 24)) % bits if j * 24 + 24 <= 128 else \
                ((h * (2 * j + 1)) & ((1 << 128) - 1)) % bits
    return out


def bucket_col(group_col, num_buckets: int):
    return F.pmod(F.xxhash64(group_col), F.lit(num_buckets)).cast("int")


def build_sidecar(seen: DataFrame, key_col: str, group_col: str,
                  num_buckets: int = 16, bits: int = 1 << 20,
                  k: int = 4) -> DataFrame:
    """One Bloom bitmap per bucket from the seen-key table."""
    with_bucket = seen.select(
        bucket_col(F.col(group_col), num_buckets).alias("bucket"),
        F.col(key_col).alias("key"))

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(bits // 8, dtype=np.uint8)
        idx = _indexes(pdf["key"], bits, k).ravel()
        np.bitwise_or.at(bm, idx // 8, (1 << (idx % 8)).astype(np.uint8))
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "bitmap": [bm.tobytes()],
            "n_keys": [len(pdf)],
        })

    return with_bucket.groupBy("bucket").applyInPandas(make, SIDECAR_SCHEMA)


def screen(cand: DataFrame, sidecar: DataFrame, key_col: str,
           group_col: str, num_buckets: int = 16, bits: int = 1 << 20,
           k: int = 4) -> "tuple[DataFrame, DataFrame]":
    """Split candidates into (definitely_new, maybe_seen). definitely_new
    rows skip the exact anti-join entirely."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    withb = cand.withColumn("__bucket",
                            bucket_col(F.col(group_col), num_buckets))
    joined = withb.join(
        F.broadcast(sidecar.withColumnRenamed("bucket", "__bucket")),
        "__bucket", "left")

    @pandas_udf(BooleanType())
    def may_contain(key: pd.Series, bitmap: pd.Series) -> pd.Series:
        out = np.zeros(len(key), dtype=bool)
        for i, (kk, bm) in enumerate(zip(key, bitmap)):
            if bm is None:
                continue
            arr = np.frombuffer(bm, dtype=np.uint8)
            h = int(kk, 16)
            hit = True
            for j in range(k):
                pos = (h >> (j * 24)) % bits if j * 24 + 24 <= 128 else \
                    ((h * (2 * j + 1)) & ((1 << 128) - 1)) % bits
                if not (arr[pos // 8] >> (pos % 8)) & 1:
                    hit = False
                    break
            out[i] = hit
        return pd.Series(out)

    flagged = joined.withColumn(
        "__maybe", may_contain(F.col(key_col), F.col("bitmap")))
    keep_cols = cand.columns
    definitely_new = flagged.filter(~F.col("__maybe")).select(*keep_cols)
    maybe = flagged.filter(F.col("__maybe")).select(*keep_cols)
    return definitely_new, maybe
