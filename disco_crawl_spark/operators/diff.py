"""Snapshot diff: classify every URL across two crawl snapshots as
``new`` / ``gone`` / ``changed`` / ``unchanged`` — the incremental-crawl
delta a recurring web corpus computes between consecutive crawls (what
changed since last month's snapshot drives refetch scheduling, and the
``changed`` + ``new`` set IS the incremental training-data delta).

The reference crawler is single-shot (worker.py runs one crawl to
completion); a production corpus pipeline re-crawls on a cadence and
diffs snapshots. ``icelite``'s snapshot lineage (tables.py) gives the two
inputs for free — any two committed snapshots of the pages table.

Scale shape (the 100 TB reading): each side is reduced to
``(key, content-hash)`` BEFORE the join, so the one full-outer shuffle
moves two narrow columns per row — never the html/text payload. The
content hash is md5 of the concatenated content columns (delimited with a
field separator so column boundaries can't alias); comparing hashes
instead of payloads makes the exchange ~50 bytes/row regardless of page
size. With both snapshots stored bucketed by the key column (icelite's
url-bucketed pages layout), the full-outer join is co-located and
exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["snapshot_diff", "content_novelty"]


def snapshot_diff(old_df: DataFrame, new_df: DataFrame, key_col: str,
                  content_cols: "list[str] | tuple" = ("text",)) -> DataFrame:
    """Full-outer diff of two snapshots on ``key_col``.

    Returns one row per key present in either snapshot:
    ``(key, status, in_old, in_new)`` with status in
    ``new`` (key only in ``new_df``), ``gone`` (only in ``old_df``),
    ``changed`` (both, any content column differs),
    ``unchanged`` (both, identical content).

    Content equality is md5-over-concatenation of ``content_cols`` (nulls
    become a ``\\x01null`` marker so ``NULL`` vs ``''`` still differ, and
    the marker stays representable in the DuckDB oracle — no NUL bytes). Keys are assumed unique per snapshot (crawl snapshots are
    keyed by canonical url); duplicate keys diff pairwise-arbitrarily.
    """
    sep = F.lit("\x1f")

    def _h(df):
        parts = []
        for c in content_cols:
            parts.append(F.coalesce(F.col(c).cast("string"),
                                    F.lit("\x01null")))
            parts.append(sep)
        return df.select(F.col(key_col).alias("key"),
                         F.md5(F.concat(*parts)).alias("h"))

    o = _h(old_df).withColumnRenamed("h", "h_old")
    n = _h(new_df).withColumnRenamed("h", "h_new")
    j = o.join(n, "key", "full_outer")
    status = (F.when(F.col("h_old").isNull(), F.lit("new"))
              .when(F.col("h_new").isNull(), F.lit("gone"))
              .when(F.col("h_old") == F.col("h_new"), F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(
        F.col("key"), status.alias("status"),
        F.col("h_old").isNotNull().cast("int").alias("in_old"),
        F.col("h_new").isNotNull().cast("int").alias("in_new"))


def content_novelty(df: DataFrame, text_col: str, round_col: str,
                    ngram: int = 3) -> DataFrame:
    """Per-crawl-round content novelty: of the distinct token
    ``ngram``-grams a round's pages contain, what fraction was never
    seen in ANY earlier round. The crawl-policy stopping signal the
    reference never computes — when a host's rounds stop producing new
    shingles, further budget there is waste (the frontier should shift
    to hosts still yielding novelty). Returns
    ``(round, n_grams, n_new, novelty_micro)``; novelty is fixed-point
    micros (integer division, engine-portable).

    Scale shape: explode 64-bit gram keys (never gram strings — the
    decontaminate trick), distinct per (round, gram), then min-round
    per gram and one join back on the gram key: two hash aggregations
    plus one co-partitioned join, all map-side-combinable. At 100 TB
    the gram table is the big side; everything keys on the 8-byte gram
    so skew is hash-flat by construction.
    """
    from .textstats import _gram_array
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col),
                                               F.lit(""))), r"\s+"),
                    lambda x: x != "")
    g = (df.select(F.col(round_col).alias("round"), toks.alias("__tk"))
         .select("round", F.explode(_gram_array(F.col("__tk"), ngram))
                 .alias("g"))
         .distinct())
    first = g.groupBy("g").agg(F.min("round").alias("r0"))
    per = (g.join(first, "g")
           .groupBy("round")
           .agg(F.count(F.lit(1)).alias("n_grams"),
                F.sum((F.col("r0") == F.col("round")).cast("long"))
                .alias("n_new")))
    return per.withColumn("novelty_micro",
                          F.expr("(n_new * 1000000) div n_grams"))
