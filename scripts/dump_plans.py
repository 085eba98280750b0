#!/usr/bin/env python3
"""Generate PLANS.md: formatted physical plans of the headline queries with
the properties that matter at 100 TB called out — the '.explain and
iterate' evidence."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"

CASES = [
    ("tpch_q1", "Filter pushed to the parquet scan (PushedFilters), columns "
                "pruned (ReadSchema has 6 of 11 columns), map-side "
                "partial_sum before the single exchange."),
    ("seen_anti_join", "The URL-seen anti-join shape: the small seen side "
                       "broadcasts (BroadcastHashJoin LeftAnti) — no "
                       "shuffle of the big side."),
    ("window_budget_rank", "The politeness-budget window: one exchange on "
                           "the partition key, rank filter applied before "
                           "any wide downstream operator."),
    ("ann_cosine_topk", "Embedding cosine entirely in Catalyst expressions "
                        "(no Python in the plan) + TakeOrderedAndProject "
                        "for top-k — no global sort."),
    ("dedup_token_jaccard", "All-pairs capped variant: the id_cap filter is "
                            "pushed to both scan branches before the "
                            "theta-join."),
    ("dedup_minhash_lsh", "The scalable near-dup path: ArrowEvalPython only "
                          "for signatures; banding/bucketing/verify are "
                          "joins and windows."),
    ("dedup_simhash", "Vectorized simhash signatures (one unpackbits "
                      "pipeline per Arrow batch); hamming filter applied "
                      "before the pair-dedup exchange; chunk buckets "
                      "bounded by a window count."),
    ("dedup_embedding_cosine", "Banded hyperplane LSH candidates (one "
                               "matmul per batch covers all bands); the "
                               "banding self-join moves only (id, band, "
                               "bucket) triples, pairs dedup BEFORE the "
                               "exact codegen cosine, and embeddings "
                               "re-attach to distinct pairs only."),
    ("repetition_stats", "Gopher repetition signals with built-ins only: "
                         "n-grams via transform(sequence(...)), one "
                         "(doc, ngram) aggregation with map-side combine, "
                         "window max inside the same shuffle."),
    ("corpus_mix_sample", "Hash-Bernoulli sampling as a pure filter "
                          "expression — no RNG state, no exchange; the "
                          "predicate sits directly on the scan."),
    ("bm25_topk", "Corpus-wide work confined to the checkpointed "
                  "query-term postings (IN filter below the explode, "
                  "BEFORE any exchange); doc_freq and the N/avgdl stats "
                  "broadcast; the only exchange aggregates the MB-sized "
                  "postings per doc, and the top-k is a TakeOrdered — "
                  "never a full sort."),
    ("pq_ann_topk", "The PQ re-rank stage: after the zero-shuffle ADC "
                    "map over 16-byte codes shortlists 100 candidates, "
                    "the exact re-rank is a bounded point-lookup — the "
                    "ids land in the scan as a pushed In filter, the "
                    "distance is a codegen'd fold over the row's own "
                    "embedding, top-k is a TakeOrdered. No exchange "
                    "anywhere."),
    ("dedup_fuzzy_edit", "Blocked Levenshtein verify: the blocking "
                        "joins move only (id, length, block-key) rows; "
                        "the candidate distinct is on narrow id pairs "
                        "(no wide first() aggregate); the O(n*m) "
                        "levenshtein kernel sits above the id-equi "
                        "string-fetch joins, never as a blocking-join "
                        "residual (as one it ran per block-matched row "
                        "incl. self-pairs — measured 2-3x the query)."),
    ("containment_pairs", "Inverted-index containment: the hot-gram cap "
                          "is a BroadcastHashJoin LeftAnti (only "
                          "over-cap grams build), the pair count is a "
                          "map-side-combinable hash agg on (id_a, "
                          "id_b), and true denominators join the small "
                          "rollup — raw grams shuffle exactly once."),
    ("budget_waterfill", "Water-filling allocation: the only window "
                         "sorts the bounded HOST table (2 narrow "
                         "columns); the level scalar is a 1-row "
                         "aggregate broadcast back (BroadcastNestedLoop "
                         "over 1 row, not a shuffle); per-URL work "
                         "never appears in the plan."),
    ("link_cocitation", "The super-hub-bounded pair join: the out-degree "
                        "cap (row_number window) runs BEFORE the per-src "
                        "self-join, so the pair blowup is C(cap,2) per "
                        "source; the final (a,b) count is one "
                        "map-side-combinable hash aggregation behind the "
                        "join's own src partitioning."),
    ("redirect_resolve", "Pointer doubling: ceil(log2(cap)) self-joins of "
                         "the checkpointed redirect map — each round ONE "
                         "hash exchange on the join key over an O(map) "
                         "table with a flat plan (no lineage growth), so "
                         "chain resolution is O(log cap) rounds, never "
                         "O(chain length)."),
    ("host_line_dedup", "The (group, line) count and the line join-back "
                        "share one exchange key; the reassembly "
                        "aggregation is the only other shuffle; whole "
                        "documents never move — only exploded lines."),
    ("url_param_mining", "Query-string split/explode stays in codegen; "
                         "two map-side-combinable hash aggs over (param, "
                         "path, others) triples; the final join is on the "
                         "param-cardinality table, so AQE broadcasts it."),
    ("cms_heavy_hitters", "Count-min sketch: the counter build exchanges "
                          "at most depth*width partial counters per "
                          "partition (map-side combine over the exploded "
                          "probe array); the merged grid broadcasts back "
                          "for the point queries — key cardinality never "
                          "crosses the wire."),
    ("cdx_surt_index", "SURT keying entirely inside whole-stage codegen "
                       "beside the scan (regexp/split/reverse/sort "
                       "built-ins, no Python); the only exchange is the "
                       "index group-by on the finished key."),
    ("rendezvous_shards", "HRW assignment as a row-local literal struct "
                          "array + array_max — both fleet assignments "
                          "compute with ZERO exchanges; the only shuffles "
                          "are the candidate distinct and the tiny "
                          "transition-matrix aggregation."),
    ("quality_percentile_gate", "Per-group adaptive quality threshold: the "
                                "rank window and the per-group count share "
                                "ONE exchange on the group key; the kept "
                                "flag is a row-local integer predicate — "
                                "no second shuffle, no float compare."),
    ("badwords_gate", "Blocklist gate as a single codegen projection: "
                      "split + higher-order filter against an array "
                      "literal — no explode, no UDF, no exchange; the "
                      "blocklist rides the plan as a literal."),
    ("soft_404_detect", "Soft-404 hygiene as a pure scan-side projection: "
                        "regexp + length in whole-stage codegen, zero "
                        "exchanges — free relative to the fetch that "
                        "produced the bytes."),
    ("cdc_chunks", "Content-defined chunking: ONE ArrowEvalPython/"
                   "mapInPandas pass over the projected 2-column scan — "
                   "zero exchanges; the rolling hash for every position "
                   "of a doc is one numpy sliding-window matmul."),
    ("warc_revisit_dedup", "Revisit-record election: the (ts, url) "
                           "winner key packed into one sortable string "
                           "so the per-digest min stays a HashAggregate "
                           "(min(struct) compiled to SortAggregate — "
                           "caught by this dump and rewritten) + one "
                           "join back on digest — no sort anywhere; "
                           "boilerplate-digest skew is AQE-splittable "
                           "join skew, not a single sorted partition."),
    ("pld_rollup", "eTLD+1 rollup entirely in whole-stage codegen "
                   "(split/slice/array_join + CASE), one "
                   "map-side-combinable aggregation on the PLD."),
    ("phrase_search", "Phrase retrieval as ONE aggregation: the posting "
                      "stream is filtered to the phrase vocabulary before "
                      "any exchange, anchors aggregate with map-side "
                      "combine — no join, window, or sort in the plan."),
    ("fingerprint_overlap", "Winnowing sketches now fully in codegen "
                            "(transform/slice/array_min row-local — no "
                            "ArrowEvalPython node anywhere); the only "
                            "exchanges are the fingerprint self-join key "
                            "and the pair count."),
    ("minhash_calibration", "Calibration probe: signatures row-local in "
                            "codegen, the sample cap a TakeOrdered (never "
                            "a global sort window), the all-pairs join a "
                            "broadcast bounded by sample² by "
                            "construction."),
    ("vocab_drift", "Drift monitor: one term-keyed hash agg folds both "
                    "slices via conditional sums, totals broadcast as a "
                    "1-row scalar, top-k via TakeOrderedAndProject."),
]


def main():
    from disco_crawl_spark import plans, queries as q
    from disco_crawl_spark.session import build_session

    spark = build_session("plans", master="local[8]", shuffle_partitions=8)
    out = ["# PLANS — physical plans of headline queries (sf0.01)",
           "",
           "Generated by `python scripts/dump_plans.py`. The commentary "
           "under each plan names the property that decides 100 TB "
           "behavior; `tests/test_sources_streaming_plans.py` asserts the "
           "load-bearing ones so regressions fail CI.",
           ""]
    for name, why in CASES:
        df = q.queries()[name](spark, SF)
        plan = plans.explain_str(df, "formatted")
        # keep plans readable: the operator tree plus the scan details that
        # carry the pushdown/pruning evidence
        head = plan.split("\n\n")[0]
        details = [l for l in (plans.pushed_filters(df) + "\n"
                               + plans.scan_schema(df)).splitlines() if l]
        out += [f"## {name}", "", f"**Why it's right:** {why}", "",
                "```", head.strip(), *details, "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
