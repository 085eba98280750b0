"""Frontier scheduling operators beyond the reference's fixed per-host
chunk: global budget reallocation across hosts.

The reference crawler gives every host the same per-round budget
(worker.py:563-640 — a fixed chunk size per steward batch), so rounds
waste budget on hosts with few pending URLs while starving deep hosts.
``budget_waterfill`` computes the classic max-min fair (water-filling)
allocation instead: satisfy small demands in full, split what remains
evenly across the rest — entirely in integer arithmetic so the result
is exact, reproducible, and oracle-checkable.

Scale notes (the 100 TB reading): the computation sorts HOSTS, not
URLs — host cardinality is 10^6-10^7 at a 10^10-URL frontier, so the
single global sort window is a bounded narrow table (host, demand), two
columns.  Everything else is one 1-row aggregate broadcast back over the
sorted table.  The per-URL work (counting demand per host) is the one
big map-side-combinable aggregation, exactly the shuffle the steward
batch already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["budget_waterfill"]


def budget_waterfill(demands: DataFrame, budget: int,
                     host_col: str = "host",
                     demand_col: str = "demand") -> DataFrame:
    """Max-min fair integer allocation of ``budget`` fetch slots across
    hosts with pending-URL ``demand``: find the water level L such that
    ``sum(min(demand, L))`` exhausts the budget; hosts below the level
    are satisfied in full, hosts above it get ``L`` (with the integer
    remainder distributed one slot each to the first hosts in
    (demand, host) order — deterministic, no RNG).

    Returns (host, demand, allocated) with the invariants
    ``allocated <= demand``, ``sum(allocated) == min(budget,
    sum(demand))``, and no satisfied host ever receives less than an
    unsatisfied one.

    Pure integer window algebra: rank hosts by (demand, host), prefix-sum
    the demands, pick the largest rank k whose demand could be granted to
    every remaining host within budget (``prefix[k-1] + d[k]*(n-k+1) <=
    B``); the 1-row (k, prefix[k], n) aggregate is broadcast back and the
    allocation is a closed-form expression per row.
    """
    d = demands.select(F.col(host_col).alias("host"),
                       F.col(demand_col).cast("long").alias("demand"))
    w = Window.orderBy("demand", "host")
    ranked = d.select(
        "host", "demand",
        F.row_number().over(w).alias("rn"),
        F.sum("demand").over(w).alias("prefix"),
    )
    b = F.lit(int(budget)).cast("long")
    # largest k with prefix[k-1] + d[k] * (n - k + 1) <= B  (the level
    # test: grant host k's full demand to it and every larger host)
    scalar = (ranked
              .withColumn("n", F.max("rn").over(Window.partitionBy()))
              .withColumn(
                  "ok",
                  (F.col("prefix") - F.col("demand")
                   + F.col("demand") * (F.col("n") - F.col("rn") + 1)) <= b)
              .agg(F.max(F.when(F.col("ok"), F.col("rn"))
                         .otherwise(0)).alias("k"),
                   F.max(F.when(F.col("ok"), F.col("prefix"))
                         .otherwise(0)).alias("pk"),
                   F.max("rn").alias("n")))
    out = ranked.crossJoin(F.broadcast(scalar))
    rem_hosts = F.col("n") - F.col("k")
    leftover = b - F.col("pk")
    # greatest(...,1) guards the k == n (everyone satisfied) case: the
    # otherwise-branch is then never taken, but ANSI mode would still
    # reject a divide-by-zero in the expression
    level = (leftover / F.greatest(rem_hosts, F.lit(1))).cast("long")
    extra = leftover - level * rem_hosts  # == leftover mod rem_hosts
    alloc = (F.when(F.col("rn") <= F.col("k"), F.col("demand"))
             .otherwise(level
                        + F.when(F.col("rn") - F.col("k") <= extra, 1)
                        .otherwise(0)))
    return (out.select("host", "demand",
                       alloc.cast("long").alias("allocated")))


def trap_templates(urls: DataFrame, host_col: str = "host",
                   path_col: str = "path", cap: int = 40) -> DataFrame:
    """Spider-trap detection via URL structural templates: collapse every
    digit run in the path to ``N`` and count distinct URLs per
    (host, template).  A template whose URL count explodes (calendar
    pages, session ids, faceted search) is an infinite-URL-space
    signature — the frontier-hygiene gate crawlers apply before
    scheduling (IRLbot's spam/trap budgeting, Mercator's dup-URL
    observations); the reference has no equivalent (its scope filter is
    host-level only, worker.py:231-268).

    Returns (host, tmpl, n_urls, share_micro, is_trap): the distinct-URL
    count per template, its fixed-point share of the host's distinct
    URLs, and the over-``cap`` flag.

    100 TB shape: two map-side-combinable hash aggregations — distinct
    (host, template, path) then the (host, template) rollup — plus a
    per-host total joined back on the host key (host cardinality is
    bounded, and the join input is already the small rollup, never raw
    URLs).  Pure built-ins, no UDF, no window.
    """
    t = urls.select(
        F.col(host_col).alias("host"),
        F.regexp_replace(F.col(path_col), "[0-9]+", "N").alias("tmpl"),
        F.col(path_col).alias("path"))
    per = (t.groupBy("host", "tmpl")
           .agg(F.count_distinct("path").alias("n_urls")))
    tot = (per.groupBy("host")
           .agg(F.sum("n_urls").alias("host_urls")))
    return (per.join(tot, "host")
            .select("host", "tmpl", "n_urls",
                    F.expr("CAST(n_urls AS BIGINT) * 1000000 DIV "
                           "CAST(host_urls AS BIGINT)").alias("share_micro"),
                    F.when(F.col("n_urls") > cap, 1).otherwise(0)
                    .alias("is_trap")))
