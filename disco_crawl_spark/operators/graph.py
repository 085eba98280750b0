"""Link-graph operators: PageRank over the outlink graph and anchor-text
aggregation — the two classic web-corpus graph computations a crawl
pipeline runs between rounds (frontier prioritization by authority, and
per-target anchor summaries for indexing).

The reference crawler orders its frontier by discovery generation +
per-host budget only (worker.py:563-640 hash-ordered steward batches); a
web-scale crawl additionally prioritizes by link authority. ``pagerank``
supplies that signal as a first-class DataFrame operator so the scheduler
can join it into the priority expression.

Scale notes (the 100 TB reading):

* ``pagerank`` is the standard synchronous power iteration expressed as
  DataFrame joins: each round is ONE shuffle on ``src`` (contributions)
  plus one hash aggregation on ``dst``; the edge table is repartitioned by
  ``src`` and persisted ONCE so every round's rank-join co-locates against
  the same layout instead of re-shuffling the (much larger) edge side.
  Ranks are a narrow (node, rank) table — the only thing that moves per
  round. Dangling mass is folded in via a broadcast of a 1-row aggregate,
  never a driver collect.
* Each round's ranks are ``localCheckpoint``-ed: the rank plan is
  referenced three times per iteration (contributions, dangling mass,
  the outer node join), so without lineage truncation the logical plan
  grows ~3^k and planning itself becomes the bottleneck — the same
  failure mode measured for connected_components (dedup.py). Superseded
  checkpoints are unpersisted explicitly.
* ``anchor_text_agg`` is two map-side-combinable hash aggregations and
  nothing else — no window, no sort: the per-target winner is elected
  with ``max(struct(cnt, anchor))`` exactly like the passage-dedup winner
  election. Two narrow exchanges ((target, anchor) counts, then the
  per-target rollup), both behind partial aggregation — deliberately NOT
  collapsed to one by pre-partitioning on target, which would shuffle
  raw link rows uncombined (anchor text repeats massively on the web;
  the map-side combine is worth the second exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .ckpt import ckpt_tools

__all__ = ["pagerank", "anchor_text_agg", "hits", "bfs_depth",
           "cocitation", "label_propagation", "resolve_redirects",
           "reciprocity", "opic", "harmonic_centrality"]


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 5, damping: float = 0.85,
             dedup_edges: bool = True,
             personalization: DataFrame | None = None,
             seed_col: str | None = None,
             ckpt_every: int = 6) -> DataFrame:
    """Power-iteration PageRank over an edge table; returns (node, pagerank).

    Semantics (the textbook formulation, so the DuckDB oracle can unroll
    it exactly):

    * node set = distinct union of src and dst endpoints
    * r0(v) = 1/N for every node
    * r_{t+1}(v) = (1-d)/N + d * (sum_{u->v} r_t(u)/outdeg(u) + D_t/N)
      where D_t = total rank mass on dangling nodes (no out-edges)
    * exactly ``iters`` synchronous rounds, no convergence test — the
      caller picks the round count (rank deltas decay ~d^t).

    With ``personalization`` (a one-column DataFrame of seed node ids)
    this becomes TrustRank (Gyöngyi et al. 2004) — the spam-demotion
    variant a web crawl runs with a hand-vetted seed list: the teleport
    vector p(v) is uniform over the SEEDS (0 elsewhere) instead of 1/N,
    and both the (1-d) teleport term and the dangling redistribution use
    p(v), so rank mass can only enter the graph at trusted nodes:

    * r0(v) = p(v)
    * r_{t+1}(v) = (1-d)*p(v) + d * (sum_{u->v} r_t(u)/outdeg(u)
      + D_t*p(v))

    Seeds absent from the node set are ignored (they can neither receive
    nor forward mass); an empty effective seed set raises. p rides in the
    one checkpointed state table (n, dangling, p) every round's blend
    joins — never a driver-side structure.

    Multi-edges are collapsed first when ``dedup_edges`` (a crawl link
    graph counts a link once per (src, dst) page pair); self-loops are
    kept as ordinary edges if present upstream — filter before calling if
    the graph semantics exclude them.

    Round materialization policy (round-6 shape): the FINAL round is
    always eagerly localCheckpoint-ed (consumers read settled blocks and
    a downstream ``count()`` measures real work). On dangling-free
    graphs a round references the previous ranks exactly once, so up to
    ``ckpt_every`` intermediate rounds chain lazily as a straight-line
    plan (linear work — verified with a noop sink); with dangling nodes
    present the per-round 1-row dangling aggregate adds a second
    reference, and lazily chained copies stop being stage-cache-
    deduplicatable once column pruning de-canonicalizes them (O(2^k)
    real work), so those graphs checkpoint every round.
    """
    # checkpoint bookkeeping mirrors dedup.connected_components: track the
    # persistent-RDD ids each localCheckpoint registers and release the
    # superseded round's blocks explicitly (DataFrame.unpersist alone does
    # not free a checkpoint RDD), so at most two rank tables are ever live
    sc = edges.sparkSession.sparkContext

    _ckpt, _release = ckpt_tools(sc)

    # the deduped edge table feeds THREE derivations (node set, outdeg,
    # the per-round join layout) — materialize it once so none of them
    # re-runs the upstream lineage
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    if dedup_edges:
        e = e.distinct()
    e, e_held = _ckpt(e)
    nodes = (e.select(F.col("src").alias("n"))
             .union(e.select(F.col("dst").alias("n")))
             .distinct())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double")
                               .alias("outdeg"))
    # one edge-side shuffle for the whole run: pre-joined with outdeg,
    # laid out by src so every round's rank join is exchange-free on the
    # (big) edge side
    contrib_edges = (e.join(deg, "src")
                     .repartition("src")
                     .sortWithinPartitions("src")
                     .persist())
    # ONE state table carries everything a round needs beside the edges:
    # (n, dangling, p). Folding outdeg-existence and the teleport vector
    # into the state removes three per-round operators AND three setup
    # materializations the previous shape paid for — the dangling
    # anti-join against deg, the outer join against nodes, and (for
    # TrustRank) the pvec join — so a round is exactly: one edge join +
    # one (dst) aggregation [+ one conditional 1-row aggregate] + one
    # outer join back to the state.
    state = (nodes.join(deg, nodes["n"] == deg["src"], "left")
             .select("n", F.col("outdeg").isNull().alias("dangling")))
    if personalization is not None:
        scol = seed_col if seed_col is not None else personalization.columns[0]
        seeds = (personalization.select(F.col(scol).alias("n")).distinct()
                 .withColumn("__seed", F.lit(True)))
        state = (state.join(seeds, "n", "left")
                 .select("n", "dangling",
                         F.coalesce("__seed", F.lit(False)).alias("seed")))
    else:
        state = state.select("n", "dangling", F.lit(False).alias("seed"))
    state, state_held = _ckpt(state)
    # three bounded driver scalars (one row) over the materialized blocks
    # — NOT a per-row collect. n_dangling == 0 lets every round skip the
    # dangling aggregation + broadcast outright (dmass ≡ 0 exactly): a
    # data-dependent fast path that is exact at any scale, and real link
    # graphs deduped on (src, dst) usually have few or no dangling nodes
    counts = state.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("dangling").cast("long")).alias("__d"),
        F.sum(F.col("seed").cast("long")).alias("__s")).collect()[0]
    n_nodes = counts["__n"]
    n_dangling = counts["__d"] or 0
    n_seeds = counts["__s"] or 0
    if personalization is not None and n_seeds == 0:
        contrib_edges.unpersist()
        _release(e_held)
        _release(state_held)
        raise ValueError("pagerank personalization: no seed node is "
                         "present in the graph")
    base = (1.0 - damping) / n_nodes
    # teleport vector p as a lazy projection over the state blocks
    state = state.select(
        "n", "dangling",
        (F.when(F.col("seed"), F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0))
         if personalization is not None else F.lit(0.0)).alias("p"))
    # ranks carries the dangling flag so the per-round 1-row dangling
    # aggregate scans the rank table alone (no join back to state)
    ranks = state.select(
        "n", "dangling",
        (F.col("p") if personalization is not None
         else F.lit(1.0 / n_nodes)).alias("r"))
    # Round chaining: the final round is ALWAYS eagerly localCheckpoint-ed
    # (materializing every column — so a downstream count() measures the
    # real computation and consumers read settled blocks, exactly like the
    # previous per-round shape). Intermediate rounds are chained lazily
    # only on dangling-free graphs, where each round references the
    # previous ranks exactly ONCE (the contrib join) — the chained
    # segment is a straight-line plan whose materialization executes
    # every exchange once (linear work, verified with a noop sink), it
    # just pays one job-dispatch sequence instead of one per round.
    # With dangling nodes present the per-round 1-row dangling aggregate
    # adds a second reference to ranks (2^k duplicated subtrees per
    # k-round segment once column pruning de-canonicalizes the copies),
    # so those graphs keep the eager per-round checkpoint.
    if n_dangling > 0:
        ckpt_every = 1
    held = set()
    for t in range(1, iters + 1):
        r_src = ranks.select(F.col("n").alias("src"), "r")
        contrib = (contrib_edges.join(r_src, "src")
                   .groupBy("dst")
                   .agg(F.sum(F.col("r") / F.col("outdeg")).alias("contrib")))
        joined = state.join(contrib, state["n"] == contrib["dst"], "left")
        if n_dangling > 0:
            # dangling mass: conditional 1-row aggregate over the rank
            # table (same addend set as the former deg anti-join —
            # summation order is already nondeterministic across
            # partitions, which the 6dp round-trip tolerates by
            # construction)
            dangling = ranks.agg(
                F.coalesce(F.sum(F.when(F.col("dangling"), F.col("r"))),
                           F.lit(0.0)).alias("dmass"))
            joined = joined.crossJoin(F.broadcast(dangling))
            dmass = F.col("dmass")
        else:
            dmass = F.lit(0.0)
        if personalization is None:
            ranks = joined.select(
                "n", "dangling",
                (F.lit(base) + F.lit(damping)
                 * (F.coalesce(F.col("contrib"), F.lit(0.0))
                    + dmass / F.lit(float(n_nodes)))).alias("r"))
        else:
            ranks = joined.select(
                "n", "dangling",
                (F.lit(1.0 - damping) * F.col("p") + F.lit(damping)
                 * (F.coalesce(F.col("contrib"), F.lit(0.0))
                    + dmass * F.col("p"))).alias("r"))
        if t % ckpt_every == 0 or t == iters:
            ranks, new_held = _ckpt(ranks)
            _release(held)
            held = new_held
    # the final round is materialized — nothing downstream references the
    # edge layout or the setup state any more; only the final rank blocks
    # stay live
    contrib_edges.unpersist()
    _release(e_held)
    _release(state_held)
    return ranks.select(F.col("n").alias("node"), F.col("r").alias("pagerank"))


def anchor_text_agg(links: DataFrame, target: str = "target",
                    anchor: str = "anchor") -> DataFrame:
    """Per-target anchor-text summary: total in-links, distinct anchors,
    and the modal anchor text (ties broken toward the lexicographically
    LARGEST anchor so the winner is deterministic on both engines).

    Returns (target, n_links, n_anchors, top_anchor). Two hash
    aggregations, both map-side combinable; the winner election is
    ``max(struct(cnt, anchor))`` — no window, no per-target sort.
    """
    per_anchor = (links.groupBy(F.col(target).alias("target"),
                                F.col(anchor).alias("anchor"))
                  .agg(F.count(F.lit(1)).alias("cnt")))
    return (per_anchor.groupBy("target")
            .agg(F.sum("cnt").alias("n_links"),
                 F.count(F.lit(1)).alias("n_anchors"),
                 F.max(F.struct("cnt", "anchor")).alias("_w"))
            .select("target", "n_links", "n_anchors",
                    F.col("_w.anchor").alias("top_anchor")))


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iters: int = 5, round_dp: int = 9) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) — PageRank's companion
    frontier signal: authorities are pages many hubs point to, hubs are
    pages that point to many authorities. Returns (node, authority, hub),
    both L1-normalized, 6dp.

    Semantics (textbook synchronous iteration, so the oracle unrolls it):
    h0(v) = 1 for every node; each round computes
    a(v) = Σ_{u→v} h(u) then L1-normalizes, then h(u) = Σ_{u→v} a(v)
    then L1-normalizes — exactly ``iters`` rounds, no convergence test.
    Scores are rounded to ``round_dp`` dp after EVERY normalization in
    both engines (the quality_lr GD lesson): summation-order drift can
    never compound across iterations, so the DuckDB mirror matches the
    6dp output exactly.

    Scale shape: the edge table is shuffled ONCE per join side — two
    persisted layouts (by src for the hub→authority push, by dst for the
    authority→hub pull), the standard space-for-shuffle trade; only the
    narrow, SPARSE (node, score) tables move per round (zero rows carry
    no L1 mass and no join contribution — zeros are re-attached once at
    the end). Each half-step checkpoints its RAW sums; the L1 norm is one
    bounded driver scalar collected over the materialized blocks and
    folded back as a literal (bit-identical IEEE division, no broadcast
    exchange, and the norm never re-runs the edge join — the simhash
    lesson applied to a 1-row aggregate). Superseded blocks are released
    explicitly (the connected-components pattern)."""
    if iters < 1:
        raise ValueError("hits() needs iters >= 1 (scores are only "
                         "L1-normalized after a full round)")
    sc = edges.sparkSession.sparkContext

    _ckpt, _release = ckpt_tools(sc)

    # the deduped edge table feeds THREE derivations (the two persisted
    # join layouts and the node set) — materialize it once so none of
    # them re-runs the upstream lineage (the pagerank setup lesson)
    e, e_held = _ckpt(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct())
    nodes = (e.select(F.col("src").alias("n"))
             .union(e.select(F.col("dst").alias("n")))
             .distinct())
    by_src = e.repartition("src").sortWithinPartitions("src").persist()
    by_dst = e.repartition("dst").sortWithinPartitions("dst").persist()

    def _l1_over_ckpt(ckpted, key, col):
        # ckpted is a materialized (localCheckpointed) raw-score table:
        # the 1-row L1 norm is collected as a bounded driver scalar over
        # its blocks (one double — the pagerank n_nodes idiom) and folded
        # back as a literal; a Python float IS an IEEE-754 double, so the
        # division is bit-identical to the former broadcast-column form
        # while skipping one broadcast-exchange job per half-step
        norm = ckpted.agg(F.sum(col)).collect()[0][0]
        return ckpted.select(F.col(key).alias("n"),
                             F.round(F.col(col) / F.lit(norm),
                                     round_dp).alias(col))

    # Internal states are SPARSE: a score table only carries nodes whose
    # raw sum has a contributing edge — a dense zero row neither moves
    # any L1 norm (adds 0.0) nor any push/pull sum (joins contribute 0),
    # so the per-half-step outer join against the full node set that the
    # previous shape paid for is equivalent to one left join at the END
    # that re-attaches 0.0 for never-scored nodes. A half-step checkpoint
    # is now exactly: edge join + (dst|src) aggregation — the eager
    # per-half-step cadence stays, because the L1 norm aggregate
    # references the raw scores a second time (a lazily chained segment
    # would re-execute each half-step's join once per reference after
    # column pruning de-canonicalizes the copies).
    # h0 over out-edge sources only (other nodes' hub 1.0 feeds no push).
    h = by_src.select(F.col("src").alias("n")).distinct() \
        .select("n", F.lit(1.0).alias("hub"))
    a = None
    a_held, h_held = set(), set()
    for _ in range(iters):
        raw_a, na_held = _ckpt(
            by_src.join(h.select(F.col("n").alias("src"), "hub"), "src")
            .groupBy("dst").agg(F.sum("hub").alias("authority")))
        _release(a_held)
        a, a_held = _l1_over_ckpt(raw_a, "dst", "authority"), na_held
        raw_h, nh_held = _ckpt(
            by_dst.join(a.select(F.col("n").alias("dst"), "authority"),
                        "dst")
            .groupBy("src").agg(F.sum("authority").alias("hub")))
        _release(h_held)
        h, h_held = _l1_over_ckpt(raw_h, "src", "hub"), nh_held
    # materialize the full output once (every column — a downstream
    # count() then measures the real computation, and the zero-attach
    # left joins cannot be pruned away), then free the loop state
    out, _out_held = _ckpt(
        nodes.join(a, "n", "left").join(h, "n", "left")
        .select(F.col("n").alias("node"),
                F.round(F.coalesce("authority", F.lit(0.0)), 6)
                .alias("authority"),
                F.round(F.coalesce("hub", F.lit(0.0)), 6).alias("hub")))
    by_src.unpersist()
    by_dst.unpersist()
    _release(e_held)
    _release(a_held)
    _release(h_held)
    return out


def bfs_depth(edges: DataFrame, seeds: DataFrame, src: str = "src",
              dst: str = "dst", seed_col: str | None = None,
              max_iters: int = 32) -> DataFrame:
    """Seed-set BFS: minimum link distance from any seed to each reachable
    node — the crawl-depth signal (the reference tracks a per-URL discovery
    generation only implicitly, via its round counter; worker.py's steward
    loop never exposes "how many hops from the seed list is this page",
    which is the standard frontier-quality / crawl-policy feature: depth
    correlates with spam and decreasing utility on the web graph).

    Returns (node, depth) for REACHED nodes only (seeds at depth 0);
    unreachable nodes are absent — left-join downstream if a NULL-depth
    row per orphan is wanted. Deterministic: min over a set, no RNG.

    Semantics (so the DuckDB oracle can mirror it with a bounded
    recursive CTE): depth(v) = length of the shortest directed path from
    any seed, computed by synchronous frontier expansion — round t settles
    exactly the nodes whose BFS depth is t. Raises if a frontier is still
    non-empty after ``max_iters`` rounds (web-graph diameters are tiny;
    a deeper graph means the caller's bound, and the oracle's recursion
    bound, must rise together).

    Scale shape: the edge table is shuffled ONCE (repartitioned by src,
    persisted) and every round's expansion joins the narrow frontier
    against that fixed layout; each round checkpoints ONLY its frontier
    (flat plans — the connected_components lesson), and the settled set
    is the lazy union of those O(diameter) materialized narrow blocks,
    so no round pays a second materialization for a dense settled table.
    Each round is one join + distinct + anti-join — all hash-partitioned
    on the node id; total work is O(edges within the reached subgraph),
    the textbook frontier BFS bound, in O(diameter) synchronized rounds.
    The emptiness test reads the round's already-materialized frontier
    blocks (no second job over lineage); the output is consolidated into
    ONE checkpoint at the end and the per-round blocks are released."""
    sc = edges.sparkSession.sparkContext
    _ckpt, _release = ckpt_tools(sc)

    if seed_col is None:
        seed_col = seeds.columns[0]
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct()
         .repartition("src").sortWithinPartitions("src").persist())
    frontier, fheld = _ckpt(
        seeds.select(F.col(seed_col).alias("node")).distinct()
        .withColumn("depth", F.lit(0).cast("long")))
    # settled is a LAZY union of the checkpointed per-round frontiers —
    # each round's anti-join scans the union of O(diameter) materialized
    # narrow blocks instead of paying a second materialization per round
    # for a dense settled table (halves the round's checkpoint jobs; web
    # diameters keep the union width tiny)
    frontiers, helds = [frontier], [fheld]
    empty = False
    for t in range(1, max_iters + 1):
        settled = frontiers[0]
        for f in frontiers[1:]:
            settled = settled.unionByName(f)
        new_frontier, nfheld = _ckpt(
            e.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node")).distinct()
            .join(settled.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(t).cast("long")))
        frontier = new_frontier
        if frontier.isEmpty():
            _release(nfheld)
            empty = True
            break
        frontiers.append(frontier)
        helds.append(nfheld)
    if not empty:
        # the last frontier was still non-empty
        e.unpersist()
        for hd in helds:
            _release(hd)
        raise RuntimeError(
            f"bfs_depth did not exhaust the frontier in {max_iters} "
            f"rounds (graph deeper than the recursion bound the "
            f"oracle mirrors)")
    e.unpersist()
    out = frontiers[0]
    for f in frontiers[1:]:
        out = out.unionByName(f)
    # consolidate the O(diameter) per-round frontier blocks into ONE
    # materialized table and free them — callers hold a single checkpoint
    out, _out_held = _ckpt(out)
    for hd in helds:
        _release(hd)
    return out


def cocitation(edges: DataFrame, src: str = "src", dst: str = "dst",
               max_out_degree: int = 50, min_count: int = 2) -> DataFrame:
    """Co-citation similarity (Small 1973, the webgraph related-pages /
    mirror-detection primitive): two pages are related when many sources
    link to BOTH. Returns (a, b, cocite) with a < b — the count of
    distinct sources citing both endpoints.

    Scale shape: the all-pairs blowup is bounded BEFORE the self-join by
    capping each source's out-list at ``max_out_degree`` (keep the
    lexicographically smallest targets — deterministic, so both engines
    cap identically): a mega-hub directory page would otherwise
    contribute O(outdeg²) pairs on its own while carrying almost no
    similarity signal (the standard super-hub drop in co-citation /
    collaborative-filtering pipelines). After the cap the join is
    per-src bounded at C(cap, 2) pairs, partitioned on src, and the
    final (a, b) count is one map-side-combinable aggregation;
    ``min_count`` prunes the long singleton tail before it ships to the
    caller. Multi-edges collapse first (a source cites a target once).
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct())
    w = Window.partitionBy("src").orderBy("dst")
    capped = (e.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= max_out_degree).drop("__rn"))
    x, y = capped.alias("x"), capped.alias("y")
    return (x.join(y, (F.col("x.src") == F.col("y.src"))
                   & (F.col("x.dst") < F.col("y.dst")))
            .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
            .agg(F.count(F.lit(1)).alias("cocite"))
            .filter(F.col("cocite") >= min_count))


def label_propagation(edges: DataFrame, src: str = "src", dst: str = "dst",
                      iters: int = 4) -> DataFrame:
    """Synchronous, deterministic label propagation communities (LPA,
    Raghavan et al. 2007) over the undirected link graph: every node
    starts labeled with itself; each round it adopts the most frequent
    label among its neighbors, ties broken by the SMALLEST label.  Fixed
    ``iters`` synchronous rounds make the result a pure function of the
    graph (asynchronous/randomized LPA is not reproducible — useless for
    an oracle-checked pipeline).  Detects host communities / mirror
    farms / link rings between crawl rounds — the policy signal that
    caps or downweights a whole community rather than one host.

    Returns (node, community).

    100 TB shape: per round exactly two map-side-combinable hash
    aggregations — (node, neighbor-label) counts, then the per-node
    winner via ``max(struct(cnt, -label))`` — no window, no sort.  The
    symmetrized edge table is repartitioned on the join key and persisted
    ONCE; labels are the only narrow table that moves per round, each
    generation localCheckpoint-ed and the superseded one released
    (the connected_components pattern).
    """
    a, b = F.col(src).alias("a"), F.col(dst).alias("b")
    und = (edges.select(a, b)
           .union(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
           .filter(F.col("a") != F.col("b"))
           .distinct()
           .repartition("b")
           .sortWithinPartitions("b")
           .persist())
    labels = (und.select(F.col("a").alias("n")).distinct()
              .select("n", F.col("n").alias("lab")))
    sc = edges.sparkSession.sparkContext
    _ckpt, _release = ckpt_tools(sc)
    # the identity labeling is never joined (round one degenerates, see
    # below) — no point materializing it; iters=0 returns it lazily
    held = set()
    for rnd in range(iters):
        if rnd == 0:
            # identity labels: every neighbor label is distinct (und is a
            # deduped pair set), so the frequency vote degenerates to the
            # -label tie-break — round one is exactly min(neighbor id)
            # per node: one aggregation, no join, no second groupBy
            new = (und.groupBy("a").agg(F.min("b").alias("lab"))
                   .select(F.col("a").alias("n"), "lab"))
        else:
            nb = und.join(labels.withColumnRenamed("n", "b"), "b")
            cnt = nb.groupBy("a", "lab").agg(F.count(F.lit(1)).alias("cnt"))
            new = (cnt.groupBy("a")
                   .agg(F.max(F.struct(F.col("cnt"),
                                       (-F.col("lab")).alias("neg")))
                        .alias("w"))
                   .select(F.col("a").alias("n"),
                           (-F.col("w.neg")).alias("lab")))
        new, new_held = _ckpt(new)
        _release(held)
        labels, held = new, new_held
    und.unpersist()
    return labels.select("n", F.col("lab").alias("community"))


def resolve_redirects(redirects: DataFrame, src: str = "src",
                      dst: str = "dst", max_hops: int = 8) -> DataFrame:
    """Whole-graph redirect-chain resolution: for every URL in the
    redirect map (sources and targets), the terminal URL its chain lands
    on, the exact hop count, and whether the chain resolves within
    ``max_hops``. The reference follows redirects one hop at a time with
    ``allow_redirects=False`` during its scheme/www probes
    (crawler-node/src/crawler/worker.py:286-340, is_redirect_local at
    worker.py:228-245) and caps the walk; this is the batch analog a
    frontier needs — collapsing every discovered URL to its redirect
    terminal BEFORE the seen-check, so `a → b → c` never occupies three
    frontier slots and re-crawls of moved sites dedup to the new home.

    Input must be a FUNCTIONAL map (at most one ``dst`` per ``src`` — an
    HTTP response has one Location header); duplicate sources would make
    the walk nondeterministic, so duplicates raise. Returns
    ``(url, final_url, hops, resolved)`` for every distinct URL in
    src ∪ dst: terminals resolve to themselves at hop 0; a chain of
    length L ≤ max_hops resolves with ``hops = L``; longer chains AND
    cycles (a cycle never terminates) report ``final_url = NULL,
    hops = max_hops, resolved = 0`` — exactly what a crawler's
    too-many-redirects abort records.

    Algorithm: pointer doubling on the map itself. Round k's table maps
    each source to the node 2^k hops away — or to its terminal with the
    exact hop count if the chain ends sooner (the left join simply
    misses, freezing the row). ceil(log2(max_hops)) rounds therefore
    settle every chain of length ≤ max_hops, and every row still
    mid-chain afterwards has walked ≥ max_hops hops, which proves its
    chain is longer than the cap — no cycle detection pass needed.
    Each round is ONE self-join of the checkpointed map, shuffling on
    the join key; rounds are O(log max_hops), not O(chain length), and
    per-round plans stay flat (the connected_components lineage lesson).
    At a 10^10-URL frontier the map is the redirect subset (~1-5% of
    URLs); every stage is hash-partitioned on the URL — no driver-side
    state, no collect.
    """
    sc = redirects.sparkSession.sparkContext
    _ckpt, _release = ckpt_tools(sc)

    m = redirects.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    jump = m.select("a", "b", F.lit(1).cast("long").alias("s"))
    jump, held = _ckpt(jump)
    dup = (jump.groupBy("a").count().filter(F.col("count") > 1).isEmpty())
    if not dup:
        _release(held)
        raise ValueError("resolve_redirects needs a functional map: "
                         "a src with two dsts has no single chain")
    rounds = max(1, (max_hops - 1).bit_length())  # ceil(log2(max_hops))
    for _ in range(rounds):
        nxt = (jump.alias("l")
               .join(jump.select(F.col("a").alias("b"),
                                 F.col("b").alias("b2"),
                                 F.col("s").alias("s2")).alias("r"),
                     "b", "left")
               .select(F.col("l.a").alias("a"),
                       F.coalesce("r.b2", "l.b").alias("b"),
                       (F.col("l.s")
                        + F.coalesce("r.s2", F.lit(0))).alias("s")))
        nxt, nheld = _ckpt(nxt)
        _release(held)
        jump, held = nxt, nheld
    srcs = m.select(F.col("a").alias("t")).distinct()
    uni = (m.select(F.col("a").alias("url"))
           .union(m.select(F.col("b").alias("url"))).distinct())
    mark = srcs.select(F.col("t").alias("b"), F.lit(1).alias("__in_map"))
    res = (uni.join(jump.withColumnRenamed("a", "url"), "url", "left")
           .join(mark, "b", "left"))
    terminal = F.col("__in_map").isNull()
    resolved = (F.col("b").isNotNull() & terminal
                & (F.col("s") <= max_hops)) | F.col("b").isNull()
    return res.select(
        "url",
        F.when(F.col("b").isNull(), F.col("url"))
        .when(resolved, F.col("b")).alias("final_url"),
        F.when(F.col("b").isNull(), F.lit(0).cast("long"))
        .when(resolved, F.col("s"))
        .otherwise(F.lit(max_hops).cast("long")).alias("hops"),
        resolved.cast("int").alias("resolved"))


def reciprocity(edges: DataFrame, src: str = "src",
                dst: str = "dst") -> DataFrame:
    """Per-node link reciprocity — the classic link-farm / link-exchange
    signal (Gyöngyi & Garcia-Molina, "Link Spam Alliances", 2005): spam
    cliques reciprocate nearly every edge, while organic authority is
    overwhelmingly one-directional. Run over the HOST graph (collapse
    page edges to host edges first — host cardinality is 10^6-10^7 at a
    10^10-URL frontier, so the input here is the small graph). Returns
    ``(node, out_deg, mutual, reciprocity_micro)`` per source node:
    distinct out-neighbors, how many of them link back, and the
    fixed-point ratio (micros, integer division — exact and
    engine-portable, the frontier_priority lesson).

    Scale shape: dedup the edge set once, then ONE self-semi-join on the
    full (src, dst) pair marks mutual edges — both sides hash-partition
    on the same composite key — and two map-side-combinable counts per
    src finish it. No windows, no driver state.
    """
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    mutual = e.join(rev, ["a", "b"], "left_semi")
    out = e.groupBy("a").agg(F.count(F.lit(1)).alias("out_deg"))
    mut = mutual.groupBy("a").agg(F.count(F.lit(1)).alias("mutual"))
    return (out.join(mut, "a", "left")
            .select(F.col("a").alias("node"), "out_deg",
                    F.coalesce("mutual", F.lit(0)).alias("mutual"))
            .withColumn("reciprocity_micro",
                        F.expr("(mutual * 1000000) div out_deg")))


def opic(edges: DataFrame, src: str = "src", dst: str = "dst",
         iters: int = 5, cash0: int = 1_000_000,
         dedup_edges: bool = True) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobéna, WWW 2003): the importance estimator built FOR crawling.
    Unlike PageRank (a batch fixpoint over a frozen snapshot), OPIC's
    cash/history pair is incremental — a crawler can update it one page
    at a time as fetches land, and the running ``history + cash`` total
    ranks the frontier at any instant without waiting for convergence.
    This operator is the synchronous batch step a Spark round runs over
    the links discovered so far; the reference crawler has no importance
    signal at all (its steward batches are hash-ordered,
    steward.py:100-130), so this is the upgrade path its frontier needs.

    Semantics (exact, so the DuckDB oracle can unroll it):

    * node set = distinct src ∪ dst endpoints; multi-edges collapse when
      ``dedup_edges``
    * cash_0(v) = ``cash0`` micros, history_0(v) = 0
    * each round, synchronously: every node banks its cash into history
      and distributes it — ``cash DIV outdeg`` to each out-neighbor;
      DANGLING nodes distribute ``cash DIV n_nodes`` to every node (the
      paper's virtual page, flattened)
    * importance after the round = history + received cash

    All arithmetic is INTEGER micros with floor division, so the result
    is bit-reproducible cross-engine; the remainders (< outdeg micros
    per node·round) are retired, a documented sub-ppm mass decay instead
    of a float-summation-order hazard.

    Scale shape mirrors ``pagerank``: the edge table pays ONE
    src-partitioned shuffle for the whole run, each round is one
    co-partitioned join + one dst-keyed aggregation, the dangling mass
    is a broadcast 1-row scalar, and per-round states are
    localCheckpoint-ed with superseded blocks released — O(iters) flat
    plans, no driver-side per-node state.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if dedup_edges:
        e = e.distinct()
    nodes = (e.select(F.col("src").alias("n"))
             .union(e.select(F.col("dst").alias("n")))
             .distinct())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    contrib_edges = (e.join(deg, "src")
                     .repartition("src")
                     .sortWithinPartitions("src")
                     .persist())
    sc = edges.sparkSession.sparkContext
    _ckpt, _release = ckpt_tools(sc)
    nodes, nodes_held = _ckpt(nodes)
    deg, deg_held = _ckpt(deg)
    n_nodes = nodes.count()  # bounded driver scalar, like pagerank's

    state = nodes.select(
        "n", F.lit(int(cash0)).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"))
    held = set()
    for _ in range(iters):
        c_src = state.select(F.col("n").alias("src"), "cash")
        recv = (contrib_edges.join(c_src, "src")
                .groupBy("dst")
                .agg(F.sum(F.expr("cash div outdeg")).alias("recv")))
        dangling = (state.join(deg, state["n"] == deg["src"], "left_anti")
                    .agg(F.coalesce(F.sum("cash"), F.lit(0))
                         .cast("long").alias("dcash")))
        new_state = (state.join(recv, state["n"] == recv["dst"], "left")
                     .crossJoin(F.broadcast(dangling))
                     .select(
                         state["n"],
                         (F.coalesce(F.col("recv"), F.lit(0))
                          + F.expr(f"dcash div {n_nodes}"))
                         .cast("long").alias("cash"),
                         (F.col("hist") + F.col("cash")).cast("long")
                         .alias("hist")))
        state, new_held = _ckpt(new_state)
        _release(held)
        held = new_held
    contrib_edges.unpersist()
    _release(nodes_held)
    _release(deg_held)
    return state.select(F.col("n").alias("node"), "cash", "hist",
                        (F.col("cash") + F.col("hist"))
                        .alias("importance_micro"))


def harmonic_centrality(edges: DataFrame, src: str = "src",
                        dst: str = "dst", max_iters: int = 32,
                        mode: str = "exact", log2m: int = 6,
                        seed: int = 7) -> DataFrame:
    """Harmonic centrality H(v) = sum over u != v reaching v of 1/d(u, v)
    — the ranking Common Crawl publishes for its host graph (Boldi &
    Vigna, "Axioms for centrality", 2014) and the standard crawl-priority
    signal that, unlike PageRank, is well-defined on the web graph's many
    non-strongly-connected components. Distance is directed u -> v, so
    centrality counts the pages that can REACH v (incoming authority),
    matching the Common Crawl host-rank convention. The reference orders
    its frontier by hash + budget only (worker.py:563-640); harmonic is
    the between-rounds authority signal its scheduler lacks.

    Two physical strategies behind one semantic:

    * ``mode="exact"`` — all-pairs BFS by pair-frontier expansion:
      settled (node, origin, dist) triples grow one synchronous round at
      a time; round t settles exactly the pairs at shortest distance t
      (the anti-join keeps minima, like bfs_depth). Output per reached
      node: ``harmonic_micro`` = sum of floor(1e6 / d) per reaching
      origin (per-term integer floor, then integer sum — exact in any
      order, so a DuckDB recursive-CTE oracle matches bit-for-bit) and
      ``n_reachers``. Pair tuples are O(n^2) worst case — this is the
      oracle-parity / small-graph path, NOT the 100 TB plan.
    * ``mode="hyperball"`` — the scale path (HyperBall, Boldi & Vigna
      2013): each node carries a 2^log2m-register HyperLogLog sketch of
      its in-ball B(v, t); one synchronous round unions every node's
      sketch with its in-neighbors' (register-wise max), and the harmonic
      sum accumulates (|B(v,t)| - |B(v,t-1)|) / t from the HLL estimates.
      Registers are held SPARSE as (node, idx, rho) rows — absent
      register == 0 — so a round is one join on ``src`` plus one
      (node, idx) max-aggregation: all built-ins, no UDF, rows bounded by
      n * 2^log2m, and the union is the same map-side-combinable max the
      seen-filter sketches use. Per-node state is 2^log2m registers
      regardless of graph size — the property that lets a 10^10-node
      host graph fit; estimates carry standard HLL error (~1.04/sqrt(m)).
      Returns (node, harmonic_est) for every node.

    Both modes shuffle the edge table ONCE (repartitioned by src,
    persisted); every round joins the narrow frontier/sketch table
    against that fixed layout. Round state is localCheckpoint-ed with
    superseded blocks released (the pagerank/bfs bookkeeping). Exact mode
    raises past ``max_iters`` non-empty frontiers, mirroring the oracle's
    recursion bound; hyperball stops early when no register rises.
    """
    sc = edges.sparkSession.sparkContext
    _ckpt, _release = ckpt_tools(sc)
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .distinct()
         .repartition("src").sortWithinPartitions("src").persist())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())

    if mode == "exact":
        frontier, fheld = _ckpt(
            nodes.select("node", F.col("node").alias("origin"),
                         F.lit(0).cast("long").alias("dist")))
        # settled is a LAZY union of the checkpointed per-round pair
        # frontiers (the bfs_depth shape): each round's anti-join scans
        # O(diameter) materialized narrow blocks instead of paying a
        # second materialization per round for a dense settled table
        frontiers, helds = [frontier], [fheld]
        empty = False
        for t in range(1, max_iters + 1):
            settled = frontiers[0]
            for f in frontiers[1:]:
                settled = settled.unionByName(f)
            new_frontier, nfheld = _ckpt(
                e.join(frontier.select(F.col("node").alias("src"),
                                       "origin"), "src")
                .select(F.col("dst").alias("node"), "origin").distinct()
                .join(settled.select("node", "origin"),
                      ["node", "origin"], "left_anti")
                .withColumn("dist", F.lit(t).cast("long")))
            frontier = new_frontier
            if frontier.isEmpty():
                _release(nfheld)
                empty = True
                break
            frontiers.append(frontier)
            helds.append(nfheld)
        if not empty:
            e.unpersist()
            for hd in helds:
                _release(hd)
            raise RuntimeError(
                f"harmonic_centrality(exact) frontier still non-empty "
                f"after {max_iters} rounds — raise max_iters AND the "
                f"oracle's recursion bound together")
        settled = frontiers[0]
        for f in frontiers[1:]:
            settled = settled.unionByName(f)
        out = (settled.filter(F.col("dist") > 0)
               .groupBy("node")
               .agg(F.sum(F.floor(F.lit(1000000) / F.col("dist")))
                    .cast("long").alias("harmonic_micro"),
                    F.count(F.lit(1)).cast("long").alias("n_reachers")))
        # one materializing pass before releasing the inputs it reads
        out, oheld = _ckpt(out)
        e.unpersist()
        for hd in helds:
            _release(hd)
        return out

    if mode != "hyperball":
        raise ValueError(f"unknown mode {mode!r}")

    m = 1 << log2m
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213)
    h = F.xxhash64(F.col("node"), F.lit(seed))
    idx = h.bitwiseAND(F.lit(m - 1)).cast("int")
    # 48 uniform bits above the index; rho = trailing zeros + 1 (the
    # lowest set bit w & -w is an exact power of two < 2^53, so log2 of
    # its double is exact)
    w = F.shiftright(h, log2m).bitwiseAND(F.lit((1 << 48) - 1))
    rho = (F.when(w == 0, F.lit(49))
           .otherwise(F.log2((w.bitwiseAND(-w)).cast("double"))
                      .cast("int") + 1)).cast("int")

    def estimate(regs: DataFrame) -> DataFrame:
        per = regs.groupBy("node").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
            F.count(F.lit(1)).alias("c_present"))
        z = F.col("s_present") + (F.lit(float(m)) - F.col("c_present"))
        raw = F.lit(alpha * m * m) / z
        v_zero = F.lit(float(m)) - F.col("c_present")
        est = F.when((raw <= 2.5 * m) & (v_zero > 0),
                     F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero)
                     ).otherwise(raw)
        return per.select("node", est.alias("est"))

    regs, rheld = _ckpt(nodes.select("node", idx.alias("idx"),
                                     rho.alias("rho")))
    acc, aheld = _ckpt(estimate(regs).select(
        "node", F.lit(0.0).alias("h"), F.col("est").alias("prev_est")))
    for t in range(1, max_iters + 1):
        nbr = (e.join(regs.select(F.col("node").alias("src"),
                                  "idx", "rho"), "src")
               .select(F.col("dst").alias("node"), "idx", "rho"))
        merged = (regs.unionByName(nbr)
                  .groupBy("node", "idx")
                  .agg(F.max("rho").alias("rho")))
        merged, mheld = _ckpt(merged)
        changed = (merged.alias("m")
                   .join(regs.alias("r"), ["node", "idx"], "left")
                   .filter(F.col("r.rho").isNull()
                           | (F.col("m.rho") > F.col("r.rho"))))
        if changed.isEmpty():
            _release(mheld)
            break
        new_acc = (acc.join(estimate(merged), "node")
                   .select("node",
                           (F.col("h")
                            + F.greatest(F.col("est") - F.col("prev_est"),
                                         F.lit(0.0)) / F.lit(float(t)))
                           .alias("h"),
                           F.col("est").alias("prev_est")))
        new_acc, naheld = _ckpt(new_acc)
        _release(rheld)
        _release(aheld)
        regs, rheld = merged, mheld
        acc, aheld = new_acc, naheld
    out, oheld = _ckpt(acc.select("node", F.col("h").alias("harmonic_est")))
    e.unpersist()
    _release(rheld)
    _release(aheld)
    return out


def degree_powerlaw(edges: DataFrame, src: str = "src", dst: str = "dst",
                    direction: str = "out", d_min: int = 1,
                    dedup_edges: bool = True) -> DataFrame:
    """Degree-distribution audit for a link graph: the full degree
    histogram with exact integer CCDF plus the Hill (1975) MLE of the
    power-law tail exponent, alpha = 1 + n / sum ln(d_i / d_min) over
    nodes with d_i >= d_min — the web-graph sanity check (in/out degrees
    are famously Zipfian, alpha ~ 2.1/2.7 for the web) and the input to
    skew planning: the histogram IS the evidence for whether a
    hot-host/hot-digest key needs salting, and alpha says how bad the
    heaviest key grows with corpus size.

    Returns one row per distinct degree: (degree, n_nodes, ccdf_micro,
    alpha_mhat) — ccdf_micro = floor(1e6 * |{v: deg(v) >= d}| / n), all
    integer arithmetic (exact across engines); alpha_mhat repeats on
    every row, rounded to 6 dp (a sum of ~n logs carries last-ulp
    accumulation-order noise; 6 dp is 9 orders above it).

    Scale shape: two map-side-combinable hash aggregations (node degree,
    then histogram) and ONE global window over the HISTOGRAM — bounded
    by the number of DISTINCT degrees (≤ max degree, thousands at web
    scale), not by nodes; the Hill sum is a 1-row broadcast aggregate
    over the degree table. Nothing row-scale is sorted.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if dedup_edges:
        e = e.distinct()
    deg = (e.groupBy(F.col("src" if direction == "out" else "dst")
                     .alias("node"))
           .agg(F.count(F.lit(1)).cast("long").alias("degree")))
    hist = (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("degree") >= d_min,
                     F.log(F.col("degree") / F.lit(float(d_min)))))
        .alias("slog"),
        F.sum(F.when(F.col("degree") >= d_min, 1).otherwise(0))
        .cast("long").alias("n_tail"))
    w = Window.orderBy(F.col("degree").desc())
    return (hist.withColumn("cum", F.sum("n_nodes").over(w))
            .crossJoin(F.broadcast(stats))
            .select("degree", "n_nodes",
                    F.expr("(cum * 1000000) div n_total")
                    .cast("long").alias("ccdf_micro"),
                    F.round(F.lit(1.0)
                            + F.col("n_tail") / F.col("slog"), 6)
                    .alias("alpha_mhat")))
