"""Cuckoo-filter alternative to the Bloom sidecar (north_star names both).

Standard partial-key cuckoo filter (Fan et al., CoNEXT'14 — public
algorithm): 16-bit fingerprints, 4-slot buckets, two candidate buckets
(i, i ^ hash(fp)), insert-with-eviction. Compared to Bloom: supports
deletion (a crawl that un-sees URLs on recrawl windows) and better lookup
locality; same no-false-negative guarantee, so the exact anti-join stays
authoritative and results are unchanged.

Serialized as one uint16 array per host bucket — the same sidecar-table
shape as operators/bloom.py, built with applyInPandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StructField, StructType)

from .bloom import bucket_col

SLOTS = 4
MAX_KICKS = 500

SIDECAR_SCHEMA = StructType([
    StructField("bucket", IntegerType()),
    StructField("table", BinaryType()),     # uint16 array, n_buckets*SLOTS
    StructField("n_buckets", IntegerType()),
    StructField("n_keys", LongType()),
])


def _fingerprint(h: int) -> int:
    fp = (h >> 64) & 0xFFFF
    return fp or 1  # 0 means empty slot


def _index_pair(h: int, fp: int, n_buckets: int) -> "tuple[int, int]":
    i1 = h % n_buckets
    # partial-key displacement: i2 = i1 xor H(fp)
    i2 = (i1 ^ (fp * 0x5BD1E995)) % n_buckets
    return i1, i2


class CuckooFilter:
    """Driver/executor-side filter over md5-hex keys."""

    def __init__(self, capacity: int):
        self.n_buckets = max(8, 1 << (capacity * 2 // SLOTS).bit_length())
        self.table = np.zeros(self.n_buckets * SLOTS, dtype=np.uint16)
        self.n = 0
        # homeless fingerprints from failed evict chains: without this, a
        # failed insert silently drops a PREVIOUSLY-inserted victim — a
        # false negative, which would corrupt the seen-set screen
        self.stash: set = set()

    @classmethod
    def from_bytes(cls, raw: bytes, n_buckets: int,
                   stash: "set | None" = None) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.n_buckets = n_buckets
        cf.table = np.frombuffer(raw, dtype=np.uint16).copy()
        cf.n = 0
        cf.stash = stash or set()
        return cf

    def _slots(self, i: int) -> np.ndarray:
        return self.table[i * SLOTS:(i + 1) * SLOTS]

    def insert(self, key: str) -> bool:
        h = int(key, 16)
        fp = _fingerprint(h)
        i1, i2 = _index_pair(h, fp, self.n_buckets)
        for i in (i1, i2):
            s = self._slots(i)
            empty = np.where(s == 0)[0]
            if len(empty):
                s[empty[0]] = fp
                self.n += 1
                return True
        # evict
        i, rng = i1, np.random.RandomState(h & 0xFFFFFFFF)
        for _ in range(MAX_KICKS):
            s = self._slots(i)
            j = int(rng.randint(0, SLOTS))
            fp, s[j] = int(s[j]), fp
            i = (i ^ (fp * 0x5BD1E995)) % self.n_buckets
            s = self._slots(i)
            empty = np.where(s == 0)[0]
            if len(empty):
                s[empty[0]] = fp
                self.n += 1
                return True
        # table effectively full: stash the homeless victim so no earlier
        # insert ever goes false-negative; report failure so callers rebuild
        self.stash.add((i, fp))
        self.n += 1
        return False

    def contains(self, key: str) -> bool:
        h = int(key, 16)
        fp = _fingerprint(h)
        i1, i2 = _index_pair(h, fp, self.n_buckets)
        if (self._slots(i1) == fp).any() or (self._slots(i2) == fp).any():
            return True
        return (i1, fp) in self.stash or (i2, fp) in self.stash

    def delete(self, key: str) -> bool:
        h = int(key, 16)
        fp = _fingerprint(h)
        for i in _index_pair(h, fp, self.n_buckets):
            s = self._slots(i)
            hit = np.where(s == fp)[0]
            if len(hit):
                s[hit[0]] = 0
                self.n -= 1
                return True
            if (i, fp) in self.stash:
                self.stash.discard((i, fp))
                self.n -= 1
                return True
        return False


def build_sidecar(seen: DataFrame, key_col: str, group_col: str,
                  num_buckets: int = 16) -> DataFrame:
    with_bucket = seen.select(
        bucket_col(F.col(group_col), num_buckets).alias("bucket"),
        F.col(key_col).alias("key"))

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        cap = max(64, len(pdf) * 2)
        while True:
            cf = CuckooFilter(capacity=cap)
            if all(cf.insert(k) for k in pdf["key"]):
                break
            cap *= 2  # rebuild bigger until every key has a real slot
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "table": [cf.table.tobytes()],
            "n_buckets": [cf.n_buckets],
            "n_keys": [len(pdf)],
        })

    return with_bucket.groupBy("bucket").applyInPandas(make, SIDECAR_SCHEMA)


def screen(cand: DataFrame, sidecar: DataFrame, key_col: str,
           group_col: str, num_buckets: int = 16):
    """(definitely_new, maybe_seen) — same contract as bloom.screen."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    withb = cand.withColumn("__bucket",
                            bucket_col(F.col(group_col), num_buckets))
    joined = withb.join(
        F.broadcast(sidecar.withColumnRenamed("bucket", "__bucket")),
        "__bucket", "left")

    @pandas_udf(BooleanType())
    def may_contain(key: pd.Series, table: pd.Series,
                    n_buckets: pd.Series) -> pd.Series:
        """Vectorized lookup, same semantics as CuckooFilter.contains with
        an empty stash (build_sidecar rebuilds until no key is stashed):
        batch uint64 key halves, one slot-gather per distinct table."""
        from .bloom import _split_u64
        out = np.zeros(len(key), dtype=bool)
        if not len(key):
            return pd.Series(out)
        lo, hi = _split_u64(key)
        fp = hi & np.uint64(0xFFFF)
        fp[fp == 0] = np.uint64(1)           # 0 means empty slot
        codes, uniques = pd.factorize(table)  # None → code -1
        for c, t in enumerate(uniques):
            rows = np.nonzero(codes == c)[0]
            nb = int(n_buckets.iloc[rows[0]])
            assert nb & (nb - 1) == 0, "cuckoo table size is a power of two"
            arr = np.frombuffer(t, dtype=np.uint16).reshape(nb, SLOTS)
            mask = np.uint64(nb - 1)
            f = fp[rows]
            i1 = lo[rows] & mask
            i2 = (i1 ^ (f * np.uint64(0x5BD1E995))) & mask
            f16 = f.astype(np.uint16)[:, None]
            out[rows] = ((arr[i1.astype(np.int64)] == f16).any(axis=1)
                         | (arr[i2.astype(np.int64)] == f16).any(axis=1))
        return pd.Series(out)

    flagged = joined.withColumn(
        "__maybe", may_contain(F.col(key_col), F.col("table"),
                               F.col("n_buckets")))
    keep = cand.columns
    return (flagged.filter(~F.col("__maybe")).select(*keep),
            flagged.filter(F.col("__maybe")).select(*keep))
