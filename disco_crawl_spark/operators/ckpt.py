"""Shared localCheckpoint bookkeeping for the iterative operators
(connected components, PageRank, HITS, BPE merge learning).

``localCheckpoint(eager=True)`` truncates lineage but registers blocks
that ``DataFrame.unpersist`` alone does not free; every iterative
operator therefore tracks the persistent-RDD ids each checkpoint
registers and releases the superseded round's blocks explicitly, so at
most two generations of a loop's tables are ever live on executors.
This module is the single implementation of that pattern (it previously
existed as four identical closures).
"""

from __future__ import annotations


def ckpt_tools(sc):
    """Return ``(ckpt, release)`` bound to a SparkContext.

    ``ckpt(df)`` eagerly localCheckpoints ``df`` and returns
    ``(checkpointed_df, new_rdd_ids)``; ``release(rdd_ids)`` unpersists
    those blocks (tolerating ids already collected by context GC).
    """
    def ckpt(df):
        before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        out = df.localCheckpoint(eager=True)
        new = set(sc._jsc.getPersistentRDDs().keySet().toArray()) - before
        return out, new

    def release(rdd_ids):
        jmap = sc._jsc.getPersistentRDDs()
        for i in rdd_ids:
            if jmap.containsKey(i):
                jmap.get(i).unpersist()

    return ckpt, release
