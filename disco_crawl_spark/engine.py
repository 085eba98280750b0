"""The PySpark crawl engine — the reference's whole distributed loop as
DataFrame jobs over snapshot-versioned tables.

Design (SURVEY.md §1.3/§3.1 'Spark rewrite'):

- **frontier / url_seen / crawl_log are DataFrames** backed by icelite
  snapshot tables (tables.py); collected links derive from the crawl log.
  One crawl round commits one snapshot set — that IS the checkpoint
  (resumable mid-crawl, north_star).
- **domains is tiny** (thousands of hosts vs 10^10 URLs): lifecycle
  decisions (steward pick, start gauntlet, budgets, cursors) run driver-side
  via the same ``lifecycle`` functions the oracle simulator uses. All
  per-URL work — fetch join, parse, link explode, seen anti-join,
  generation build — is distributed.
- **fetch is a join**: the sandbox has no network, so fetching URL u is
  ``schedule ⋈ pages ON fetch_url = url`` (left join; a miss is a 404).
  On a real cluster the join becomes an async-HTTP mapInPandas stage; the
  surrounding plan is unchanged.
- **politeness is computed, not slept**: per-host budgets (robots.py)
  bound each host's rows per round via the schedule's pos-range — the
  window-rank equivalent; govCMS-style groups are serialized by the
  steward's group lock.
- **two shuffles per round** on the hot path: the fetch join (by url) and
  the generation-build distinct/anti-join (by host,link). Everything else
  is broadcast (bounds, robots) or narrow (parse UDF, explode).

Scale notes (100 TB / 10^10-URL design; local runs verify correctness):
- **pages** can be a url-bucketed catalog table (``pages_bucketed=True``
  + ``sources.write_pages(buckets=N)``): the fetch join then exchanges
  only the per-round schedule, never the corpus (plan-asserted in tests).
- **url_seen** compacts every K rounds (``compact_seen_every``) into a
  table bucketed+sorted on exactly the anti-join key (host, url_key): the
  generation-build anti-join reads it in place — no exchange of the seen
  side — while the between-compactions tail stays broadcast-sized.
- **frontier/crawl_log** compact every K rounds (``compact_tables_every``)
  via the icelite rewrite-data-files op into host-sorted files, bounding
  the O(rounds x parallelism) small-file growth that natural-parallelism
  delta commits trade for scaling (``compact_tables``).
- hot politeness groups are serialized by the group lock; AQE skew-join
  splitting covers hot-host fetch joins; optionally a per-partition
  Bloom/cuckoo filter (operators/bloom.py) screens the bulk of candidates
  before the exact anti-join.

Reference-faithful quirks reproduced (see refsim module docstring for the
full list): seen-at-schedule-time, blacklist-then-cap, cap-exit-not-
finished with crawl-log resume, un-blacklisted kickstarts.

Run ``python -m disco_crawl_spark.engine --selftest`` for an end-to-end
engine-vs-oracle equivalence check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import functions as cf, lifecycle, robots as robots_mod, udfs
from .refsim import SimConfig
from .tables import Catalog


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots_corpus: dict,
        host_attrs: dict,
        warehouse: str,
        config: "SimConfig | None" = None,
        seeds: "list | None" = None,
        use_bloom: bool = False,
        seen_filter: "str | None" = None,
        pages_bucketed: bool = False,
        compact_seen_every: "int | None" = None,
        compact_tables_every: "int | None" = None,
        pages_cache_partitions: "int | None" = None,
    ):
        self.spark = spark
        self.cfg = config or SimConfig()
        # Approximate-membership pre-pass over the seen set (north_star:
        # 'Bloom/cuckoo URL-seen filter'): candidates the filter proves new
        # skip the exact anti-join; the anti-join stays the authority for
        # 'maybe seen' rows, so results are identical with the filter on or
        # off (asserted by tests for both implementations). Worth it when
        # the seen set dwarfs per-round candidates (the 10^10 regime); pure
        # overhead at toy scale, hence opt-in.
        # seen_filter: None | 'bloom' | 'cuckoo' (use_bloom kept for
        # back-compat).
        self.seen_filter = seen_filter or ("bloom" if use_bloom else None)
        self.robots = robots_mod.RobotsCache(robots_corpus)
        self.attrs = host_attrs
        self.cat = Catalog(warehouse)
        self.t_frontier = self.cat.table("frontier")
        self.t_seen = self.cat.table("url_seen")
        self.t_log = self.cat.table("crawl_log")
        self.t_metrics = self.cat.table("metrics")
        self.robots_allow = udfs.make_robots_allow(spark, robots_corpus)
        # Delta commits write at the job's NATURAL parallelism (0 = no
        # coalesce, the default). The previous one-file-per-commit
        # coalesce(1) was measured to be the round loop's scaling killer:
        # coalesce collapses everything after the delta plan's last
        # exchange — the fetch-parse UDF, the frontier window — into ONE
        # task, a serial term that grows linearly with round width
        # (BENCH/BASELINE.md §3: efficiency pinned at ~0.2 across 1x-16x
        # round sizes until this fix). Small files per round are the
        # correct Iceberg-shaped trade; compaction (compact_seen) is the
        # remedy, never a serial write path. Set DISCO_COMMIT_FILES=N to
        # force small fixed fan-in where a tiny corpus makes file-count
        # dominate.
        self._commit_files = int(os.environ.get("DISCO_COMMIT_FILES", "0"))
        if "redirect_to" not in pages.columns:
            pages = pages.withColumn("redirect_to", F.lit(None).cast("string"))
        if pages_bucketed:
            # pages came from a url-bucketed catalog table
            # (sources.write_pages/register_bucketed_pages): the fetch join
            # reads it in place — no exchange of the pages side, no cache
            # pin of the whole corpus. This is the 100 TB path; the
            # repartition+persist below is the small-corpus convenience.
            self.pages = pages
        else:
            # partitioned AND sorted by the join key once, reused every
            # round: InMemoryTableScan propagates the cached ordering, so
            # the per-round fetch SortMergeJoin needs NO sort of the pages
            # side. Without the sortWithinPartitions every round re-ran an
            # external sort over the full corpus' html payloads inside
            # each task — measured as the round loop's scaling ceiling
            # (spill-bound: ~11 s/round at ANY core count on a 409k-page
            # corpus; sorted cache: 5.4 s at 4 cores, 2.6 s at 16).
            #
            # Partition COUNT must be sized to the DATA, not the core
            # count: a bare repartition(col) inherits
            # spark.sql.shuffle.partitions, so a 39 GB corpus on a
            # 16-thread / 16-shuffle-partition session unrolls as 16
            # concurrent ~2.5 GB deserialized blocks during the cache
            # build — measured as a deterministic driver-JVM heap OOM at
            # wide-64000h/local[16] (BENCH/worker_err_crawl_wide_*.log,
            # 2026-08-20) while the SAME corpus at local[4] survived with
            # only 4 unrolls in flight. Callers that know the corpus size
            # pass pages_cache_partitions ~ bytes/192MB; the default keeps
            # the session's shuffle width (fine for test-scale corpora).
            # The 100 TB path is pages_bucketed above — no cache at all.
            if pages_cache_partitions:
                part = pages.repartition(int(pages_cache_partitions),
                                         F.col("url"))
            else:
                part = pages.repartition(F.col("url"))
            self.pages = part.sortWithinPartitions("url").persist()
            # fill the sorted fetch-join cache NOW, at engine startup:
            # left lazy it materialized inside round 0's first consumer
            # (the probe-table aggregation), charging the one-time corpus
            # sort/upload to the first crawl round — a production engine
            # warms its join layout before the loop, and for a driver-
            # built corpus the dominant cost is re-serializing the local
            # relation, which this bounds to exactly once
            self.pages.count()
        # Index-probe state for the domain-start gauntlet (dual-domain +
        # index HEAD, worker.py:283-353,636-644) is LAZY: no Spark work at
        # init. On the first steward batch that needs it, one O(hosts)
        # aggregation over the pages table is written as a small parquet
        # table (never a URL-level collect — holds at a 10^10-URL corpus,
        # hosts ~10^6); each batch then collects ONLY its candidate hosts'
        # rows from that table (batch-bounded collect, memoized), so the
        # driver never holds an all-hosts dict and a crawl that touches 50
        # hosts pays 50 probe rows. Same dict shape as refsem.root_probes;
        # parity with the simulator is asserted by the e2e suite.
        # plain dir name: a leading underscore would make Spark's file
        # index treat the path as hidden metadata in recursive listings
        self._probe_tbl_path = os.path.join(warehouse, "root_probes.cache")
        self._probe_tbl_ready = False
        self._probe_cache: dict = {}   # host -> probe dict | None (absent)
        # compacted url_seen base (bucketed catalog table) + per-round tail;
        # see compact_seen()
        self._seen_base = None
        self.compact_seen_every = compact_seen_every
        self.compact_tables_every = compact_tables_every
        self.dom: dict = {}          # host -> driver state dict
        self.events: list = []       # (round, host, event)
        self.metrics: list = []      # per-round per-host fetch/parse stats
        # checkpoint watermarks: events/metrics below these indexes are
        # already committed in earlier state snapshots (deltas only)
        self._ckpt_events = 0
        self._ckpt_metrics = 0
        self.round_no = 0
        # In-run views of the state tables: each committed delta's parquet
        # files are read back and unioned here (flat lineage, no recompute).
        # The snapshots are the durable checkpoint; ``resume`` rebuilds the
        # views from the committed history.
        self._mem: dict = {"frontier": None, "url_seen": None,
                           "crawl_log": None}
        if seeds:
            for s in seeds:
                self._seen_host(s, 0)

    # ------------------------------------------------------------------
    # driver-side domain state
    # ------------------------------------------------------------------
    def _seen_host(self, host: str, round_no: int):
        # merely-SEEN hosts carry the 3-field compact form (state, group,
        # first-seen) — at 10^6 discovered hosts the driver dict stays
        # O(3 fields)/host; the full crawl fields inflate lazily on start
        # (_inflate_host) and compact again on finish (_finish_host), so
        # only steward-batch-bounded ACTIVE hosts ever hold the wide form.
        if host not in self.dom:
            self.dom[host] = {
                "state": "seen",
                "group": lifecycle.politeness_group(host, self.attrs.get(host)),
                "first_seen_round": round_no,
            }

    def _inflate_host(self, host: str):
        """Attach the per-crawl fields a host needs while active; a cap-exit
        host re-entering keeps its session/ever_crawled history."""
        d = self.dom[host]
        for k, v in (("scheme", None), ("budget", 0), ("gen", 0),
                     ("gen_size", 0), ("cursor", 0), ("crawled", 0),
                     ("session", 0), ("ever_crawled", False)):
            d.setdefault(k, v)

    def _event(self, round_no: int, host: str, msg: str):
        self.events.append((round_no, host, msg))

    def _finish_host(self, host: str):
        """Terminal transition: drop the per-host crawl fields and keep only
        what the steward needs to never restart it (state + group). Driver
        memory for completed hosts is O(2 strings), so the dict survives a
        10^6-host crawl; active hosts are bounded by the steward batch."""
        d = self.dom[host]
        self.dom[host] = {"state": "finished", "group": d["group"]}

    def _active_hosts(self) -> list:
        return sorted(h for h, d in self.dom.items() if d["state"] == "active")

    # ------------------------------------------------------------------
    # lazy root-probe lookups (index HEAD / dual-domain gauntlet inputs)
    # ------------------------------------------------------------------
    def _ensure_probe_table(self):
        """Materialize the O(hosts) probe table once, on first use. The
        host key normalization (lowercased authority with userinfo
        stripped, port kept) is IDENTICAL to refsem.root_probes — the two
        sides previously used parse_url(HOST) vs urlparse().netloc, which
        diverge on ports/userinfo/case (round-3 ADVICE)."""
        if self._probe_tbl_ready:
            return
        is_root = F.col("url").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+/$")
        auth = F.regexp_extract(
            "url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
        host = F.lower(F.regexp_replace(auth, r"^[^@/]*@", ""))
        (self.pages.select(host.alias("h"), is_root.alias("r"), "redirect_to")
         .groupBy("h")
         .agg(F.max("r").alias("has_root"),
              F.max(F.when(F.col("r"), F.coalesce("redirect_to", F.lit(""))))
               .alias("rr"))
         # host-cardinality table (~30 B/host — tens of MB at the 10^6-host
         # design point): one file reads fastest for the per-batch isin
         # collects and skips the 32-file commit overhead
         .repartition(1)
         .write.mode("overwrite").parquet(self._probe_tbl_path))
        self._probe_tbl_ready = True

    def _probes_for(self, hosts) -> dict:
        """Probe rows for a steward batch: the batch's hosts plus their
        www/bare counterparts (is_dual_domain consults both). Collect is
        bounded by the batch size; results (including known-absent hosts)
        are memoized for the crawl's lifetime."""
        need = set()
        for h in hosts:
            bare = h[4:] if h.startswith("www.") else h
            need.update((bare, "www." + bare))
        missing = [h for h in need if h not in self._probe_cache]
        if missing:
            self._ensure_probe_table()
            rows = (self.spark.read.parquet(self._probe_tbl_path)
                    .filter(F.col("h").isin(missing)).collect())
            got = {
                r["h"]: {"root": bool(r["has_root"]),
                         "redirect": (r["rr"] or None) if r["has_root"]
                         else None}
                for r in rows}
            for h in missing:
                self._probe_cache[h] = got.get(h)
        return {h: v for h in need
                if (v := self._probe_cache.get(h)) is not None}

    # ------------------------------------------------------------------
    # state-table plumbing: commit a delta to parquet AND to the in-memory
    # accumulated view
    # ------------------------------------------------------------------
    def _table(self, name: str):
        return {"frontier": self.t_frontier, "url_seen": self.t_seen,
                "crawl_log": self.t_log}[name]

    def _append(self, name: str, delta: DataFrame):
        import time as _time
        _prof = os.environ.get("DISCO_PROFILE") == "1"
        _t0 = _time.time()
        # Commit the delta to parquet (ONE Spark action), then use the
        # written files as the in-run view. Reading back the files both
        # truncates lineage (without this, every round's plan nests the
        # whole previous union and planning cost grows exponentially) and
        # keeps each append at a single job (per-action dispatch overhead
        # dominates round latency at small delta sizes).
        # Materialize the pre-append view FIRST: after a resume the view
        # must be seeded from the committed parquet history, not from this
        # delta alone (reading after the append would double-count it).
        cur = self._view(name)
        if self._commit_files:
            delta = delta.coalesce(self._commit_files)
        _t1 = _time.time()
        _, data_dir = self._table(name).append(delta, self.round_no)
        _t2 = _time.time()
        # explicit schema: parquet reads without one spend a driver job on
        # footer/schema inference — at round-loop cadence that is one
        # wasted dispatch per append (3/round), pure serial cost
        delta_view = self.spark.read.schema(delta.schema).parquet(data_dir)
        self._mem[name] = (delta_view if cur is None
                           else cur.unionByName(delta_view))
        if _prof:
            print(f"#   append[{name}] view={_t1 - _t0:.2f} "
                  f"write={_t2 - _t1:.2f} reread={_time.time() - _t2:.2f}",
                  flush=True)
        return delta_view

    def _view(self, name: str) -> "DataFrame | None":
        if self._mem[name] is None:
            if name == "url_seen" and self._seen_base is not None:
                # the compacted base holds the whole committed history;
                # the tail view stays empty until the next append
                return None
            self._mem[name] = self._table(name).read(self.spark)
        return self._mem[name]

    def _seen_view(self) -> "DataFrame | None":
        """Full url_seen view: compacted bucketed base ∪ per-round tail."""
        parts = [p for p in (self._seen_base, self._view("url_seen"))
                 if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])

    def compact_seen(self, buckets: int = 16):
        """Compact url_seen into a catalog table bucketed AND sorted by the
        anti-join key (host, url_key). After this, the generation-build
        anti-join never exchanges the seen side: the bucketed scan feeds the
        SortMergeJoin directly and only the (per-round, small) candidate
        side shuffles — the layout the north_star names for the 10^10-URL
        frontier. Per-round deltas after the compaction form a small tail
        that anti-joins separately (broadcast-sized between compactions)."""
        full = self._seen_view()
        if full is None:
            return
        import uuid as _uuid
        rel = f"data/compact-r{self.round_no:05d}-{_uuid.uuid4().hex[:8]}"
        out = os.path.join(self.t_seen.path, rel)
        name = f"url_seen_b{buckets}_{_uuid.uuid4().hex[:8]}"
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        (full.write.mode("overwrite").format("parquet")
         .bucketBy(buckets, "host", "url_key").sortBy("host", "url_key")
         .option("path", out).saveAsTable(name))
        # an overwrite snapshot: the compacted dir replaces the delta chain
        # (same rows, bucketed layout) — time travel to older snapshots and
        # resume both keep working through the ordinary read path
        self.t_seen._new_snapshot([rel], self.round_no, "compact", [], None,
                                  files_reset=True)
        self._seen_base = self.spark.table(name)
        self._mem["url_seen"] = None  # tail restarts empty (guarded above)

    def compact_tables(self, target_files: "int | None" = None):
        """Iceberg ``rewrite_data_files`` maintenance pass over the
        delta-accumulating tables. The r4 scaling fix commits every
        round's deltas at the job's NATURAL parallelism (the serial
        ``coalesce(1)`` was the round loop's Amdahl killer,
        BENCH/CRAWL_BISECT.md) — the deliberate trade is
        O(rounds x parallelism) small files on a long-lived table. This
        is the remedy: every ``compact_tables_every`` rounds, frontier
        and crawl_log rewrite their whole delta chain into
        ``target_files`` host-range-sorted files (ES's implicit segment
        merge is the reference analog that kept worker.py:244-280 resume
        scans viable). Host-sorting makes the per-file min/max footer
        stats disjoint, so ``Table.read(eq={'host': h})`` manifest
        pruning touches O(1) files after compaction. Time travel,
        rollback, and mid-crawl resume are unaffected: the compact
        snapshot holds the same rows, and older snapshots keep their
        dirs until an explicit ``expire_before``. url_seen has its own
        bucketed-layout path (``compact_seen``) tuned for the anti-join
        and is not touched here.

        The compact snapshot is stamped with the LAST CHECKPOINTED round
        (the hook runs after ``round_no`` advances): resume rolls each
        table back to its newest snapshot with round <= the checkpoint's,
        so a compaction stamped with the not-yet-run next round would be
        discarded on every resume; stamped with the finished round it IS
        the snapshot resume lands on."""
        tf = target_files or max(
            2, self.spark.sparkContext.defaultParallelism // 2)
        rnd = max(self.round_no - 1, 0)
        for name in ("frontier", "crawl_log"):
            t = self._table(name)
            cur = t.current_snapshot()
            if not cur or not cur["data"] or len(cur.get("files", ())) <= tf:
                continue                    # nothing worth rewriting
            t.compact(self.spark, rnd, target_files=tf,
                      sort_cols=["host"])
            # re-seed the in-run view from the compacted snapshot: the
            # old view stays correct (old dirs persist) but would keep
            # planning over the uncompacted file list
            self._mem[name] = None

    def _release(self):
        # drop in-run views (incl. the compacted base — the committed
        # snapshots hold the same rows); later reads re-load from them
        self._mem = {k: None for k in self._mem}
        self._seen_base = None

    # ------------------------------------------------------------------
    # generation preparation (worker.py:685-693): normalize + robots filter,
    # dense positions in raw order
    # ------------------------------------------------------------------
    def _prepare(self, raw: DataFrame) -> DataFrame:
        """raw: (host, session, gen, ord, link_raw) → frontier rows."""
        allowed = raw.filter(self.robots_allow(F.col("host"), F.col("link_raw")))
        w = Window.partitionBy("host", "session", "gen").orderBy("ord")
        return (
            allowed
            .withColumn("link", udfs.normalize_href(F.col("link_raw")))
            .withColumn("pos", F.row_number().over(w) - 1)
            .select("host", "session", "gen", "pos", "link")
        )

    def _commit_frontier(self, prepared: DataFrame) -> dict:
        """Append new generation rows; return per-host row counts."""
        delta = self._append("frontier", prepared)
        return {r["host"]: r["count"]
                for r in delta.groupBy("host").count().collect()}

    # ------------------------------------------------------------------
    # domain starts (steward + start gauntlet)
    # ------------------------------------------------------------------
    def _start_domains(self):
        states = {h: d["state"] for h, d in self.dom.items()}
        groups = {h: d["group"] for h, d in self.dom.items()}
        active_groups = {self.dom[h]["group"] for h in self._active_hosts()}
        picks = lifecycle.pick_domains(states, groups, active_groups,
                                       self.round_no, self.cfg.steward_batch)
        probes = self._probes_for(picks)
        fresh, resumed = [], []
        for host in picks:
            d = lifecycle.start_decision(host, self.attrs.get(host),
                                         self.robots, probes=probes)
            self._inflate_host(host)
            st = self.dom[host]
            if d.action == "dual-skip":
                self._seen_host("www." + host, self.round_no)
                self._event(self.round_no, host, "dual-domain")
                self._event(self.round_no, host, "finished")
                self._finish_host(host)
                continue
            if d.action == "broken":
                self._event(self.round_no, host, "broken")
                self._finish_host(host)
                continue
            self._event(self.round_no, host, "started")
            st.update(state="active", scheme=d.scheme, budget=d.budget,
                      gen=1, cursor=0, crawled=0, gen_size=0,
                      session=st["session"] + 1)
            (resumed if st["ever_crawled"] else fresh).append(host)

        new_frontier = []
        if fresh:
            rows = [(h, self.dom[h]["session"], 1, 0,
                     f"{self.dom[h]['scheme']}://{h}/") for h in fresh]
            # one slice: the bootstrap frame is <= steward_batch rows, and
            # a parallelized local relation pays ~0.15 s per SLICE on
            # every downstream interaction in this environment (the
            # repartition(1) end-of-run lesson) — 32 four-row slices made
            # round 0's frontier prepare+commit a multi-second job
            df = self.spark.createDataFrame(
                rows,
                "host string, session int, gen int, ord int, link_raw string"
            ).repartition(1)
            new_frontier.append(self._prepare(df))
        if resumed:
            new_frontier.append(self._resume_kickstart(resumed))
        if new_frontier:
            prepared = new_frontier[0]
            for extra in new_frontier[1:]:
                prepared = prepared.unionByName(extra)
            counts = self._commit_frontier(prepared)
            for h in fresh + resumed:
                self.dom[h]["gen_size"] = counts.get(h, 0)

    def _resume_kickstart(self, hosts: list) -> DataFrame:
        """Resume from the crawl log (worker.py:244-280): blacklist-seed with
        every previously fetched URL's key; kickstart = their internal links
        minus fetched, sorted, capped. Kickstart links are NOT seen-inserted
        (reference-faithful)."""
        logs = self._view("crawl_log").filter(F.col("host").isin(hosts))
        sess = self.spark.createDataFrame(
            [(h, self.dom[h]["session"], self.dom[h]["scheme"])
             for h in hosts],
            "host string, session int, scheme string")
        crawled = (logs.select("host", "url").distinct()
                   .withColumn("url_key", udfs.url_seen_key(F.col("url"))))
        seen_rows = (crawled.join(F.broadcast(sess.select("host", "session")),
                                  "host")
                     .withColumn("host_group", cf.host_group(F.col("host")))
                     .select("host", "session", "host_group", "url_key"))
        self._append("url_seen", seen_rows)
        kick = (logs.select("host", F.explode("links").alias("link_raw"))
                .distinct()
                .withColumn("url_key", udfs.url_seen_key(F.col("link_raw")))
                .join(crawled.select("host", "url_key"),
                      ["host", "url_key"], "left_anti"))
        w = Window.partitionBy("host").orderBy("link_raw")
        kick = (kick.withColumn("ord", F.row_number().over(w))
                .filter(F.col("ord") <= self.cfg.max_pages)
                .join(F.broadcast(sess.select("host", "session")), "host")
                .withColumn("gen", F.lit(1))
                .select("host", "session", "gen", "ord", "link_raw"))
        # a host whose every logged link was already crawled restarts from
        # its root (worker.py:678-679 'if not next_links'), like a fresh start
        roots = (sess.join(kick.select("host").distinct(), "host", "left_anti")
                 .select("host", "session", F.lit(1).alias("gen"),
                         F.lit(0).alias("ord"),
                         F.concat(F.col("scheme"), F.lit("://"), F.col("host"),
                                  F.lit("/")).alias("link_raw")))
        return self._prepare(kick.unionByName(roots))

    # ------------------------------------------------------------------
    # one crawl round
    # ------------------------------------------------------------------
    def step(self):
        import time as _time
        _prof = os.environ.get("DISCO_PROFILE") == "1"
        _marks: list = []

        def _mark(label):
            if _prof:
                _marks.append((label, _time.time()))

        rnd = self.round_no
        _mark("begin")
        self._start_domains()
        _mark("start_domains")

        # -- schedule: per-host pos range [cursor, cursor+budget) ------
        bounds_rows = []
        for h in self._active_hosts():
            d = self.dom[h]
            if d["cursor"] < d["gen_size"]:
                bounds_rows.append((h, d["session"], d["gen"], d["cursor"],
                                    min(d["cursor"] + d["budget"],
                                        d["gen_size"]), d["scheme"]))
        results = None
        schedule = None
        if bounds_rows:
            bounds = self.spark.createDataFrame(
                bounds_rows,
                "host string, session int, gen int, lo int, hi int, scheme string")
            frontier = self._view("frontier")
            # generation pushdown: the frontier view unions every
            # generation's delta files, but a round only schedules from
            # the handful of generations active hosts sit in. The isin
            # filter reaches the parquet scan (each delta dir holds one
            # generation, so min(gen)==max(gen) per file and row-group
            # stats skip WHOLE dead-generation files) — without it a
            # long-lived crawl re-reads its entire frontier history
            # every round just to join-discard it
            active_gens = sorted({g for _, _, g, _, _, _ in bounds_rows})
            schedule = (
                frontier.filter(F.col("gen").isin(active_gens))
                .join(F.broadcast(bounds), ["host", "session", "gen"])
                .filter((F.col("pos") >= F.col("lo")) & (F.col("pos") < F.col("hi")))
                .withColumn("seq", F.col("pos") - F.col("lo"))
                .withColumn("fetch_url", udfs.domainize(
                    F.col("host"), F.col("link"), F.col("scheme")))
            )
            # -- fetch join + parse (the two hot stages) ---------------
            fetched = schedule.join(
                self.pages.select(F.col("url").alias("fetch_url"), "html",
                                  "warc_ts", "redirect_to"),
                "fetch_url", "left")
            parsed = fetched.withColumn(
                "p", udfs.parse_page(F.col("html"), F.col("fetch_url"),
                                     F.col("host"), F.col("scheme"),
                                     F.col("redirect_to")))
            ct = F.when(F.col("html").isNotNull(),
                        F.lit("text/html; charset=utf-8"))
            # full ES-document field parity (SURVEY §1.1 table); omitted by
            # design: uuid (nondeterministic), requestTime/SpiderErrorMessage
            # (no live network), indexedAt (the round IS the clock),
            # externalDomains (dead code in the reference)
            results = (
                parsed.select(
                    F.lit(rnd).alias("round"), "host", "session", "gen",
                    "seq", F.col("fetch_url").alias("url"), "link",
                    F.when(F.col("redirect_to").isNotNull(), F.lit(302))
                     .when(F.col("html").isNotNull(), F.lit(200))
                     .otherwise(F.lit(404)).alias("status"),
                    F.col("redirect_to"),
                    udfs.sha256_url(F.col("fetch_url")).alias("url_sha256"),
                    F.lit("v3").alias("crawler"),
                    cf.host_group(F.col("host")).alias("host_group"),
                    cf.jurisdiction(F.col("host")).alias("jurisdiction"),
                    cf.mime_type(ct).alias("mime_type"),
                    cf.mime_encoding(ct).alias("mime_encoding"),
                    cf.mime_group(ct).alias("mime_group"),
                    cf.mime_format(ct).alias("mime_format"),
                    cf.filename_guess(F.col("fetch_url")).alias("filename"),
                    F.lit("en-us").alias("language"),
                    F.col("warc_ts").alias("date_created"),
                    F.col("p.links").alias("links"),
                    F.size("p.links").alias("links_count"),
                    # schema parity with the ES doc (parser.py:147-173):
                    # externalLinks is a map keyed by url whose values are
                    # always empty dicts (the prefetch is dead code that
                    # returns {url: {}}). Value type is an empty map — it
                    # JSON-serializes to {} exactly like the reference's
                    # value, and unlike struct<> it is parquet-storable
                    # (parquet forbids empty groups).
                    F.map_from_arrays(
                        F.col("p.external_links"),
                        F.transform("p.external_links",
                                    lambda _: F.map_from_arrays(
                                        F.array().cast("array<string>"),
                                        F.array().cast("array<string>"))))
                     .alias("external_links"),
                    F.size("p.external_links").alias("external_links_count"),
                    F.col("p.discovered").alias("discovered"),
                    F.col("p.title").alias("title"),
                    F.col("p.keywords").alias("keywords"),
                    F.col("p.content_hash").alias("content_hash"),
                    F.col("p.content_size").alias("content_size"),
                    F.col("p.text").alias("text"),
                )
            )
            results = self._append("crawl_log", results)
            _mark("fetch_parse_log")
            # one aggregation drives BOTH new-domain discovery and the
            # per-host fetch/parse metrics (statsd-counter taxonomy of
            # worker.py:466,492,499-501), recorded in the round-state
            # snapshot. NOT collected here: when a generation ends this
            # round, _build_generations folds it into its own counts
            # collect — one driver action per round instead of two (the
            # per-action dispatch latency is the round loop's serial
            # floor)
            stats_df = results.groupBy("host").agg(
                F.count(F.lit(1)).alias("scheduled"),
                F.sum(F.when(F.col("status") == 200, 1).otherwise(0))
                 .alias("fetched_200"),
                F.sum(F.size("links")).alias("internal_links"),
                F.sum(F.size("external_links")).alias("external_links"),
                F.flatten(F.collect_set("discovered")).alias("discovered"),
            )
        else:
            stats_df = None

        # -- driver cursor/crawl accounting ----------------------------
        ended = []
        for h, s, g, lo, hi, _ in bounds_rows:
            d = self.dom[h]
            n = hi - lo
            d["cursor"] += n
            d["crawled"] += n
            if n:
                d["ever_crawled"] = True
        for h in self._active_hosts():
            d = self.dom[h]
            if d["cursor"] >= d["gen_size"]:
                ended.append(h)

        # -- generation end --------------------------------------------
        capped = [h for h in ended if self.dom[h]["crawled"] >= self.cfg.max_pages]
        build = [h for h in ended if h not in capped]
        for h in capped:
            self.dom[h]["state"] = "seen"  # cap exit: NOT finished
        if build:
            stats_rows = self._build_generations(build, schedule, stats_df)
        elif stats_df is not None:
            stats_rows = stats_df.collect()
        else:
            stats_rows = []
        _mark("build_generations")

        # -- per-host fetch/parse metrics + new-domain discovery -------
        discovered_all = set()
        for r in stats_rows:
            sch = r["scheduled"] if "scheduled" in r else None
            if sch is None:
                continue
            self.metrics.append({
                "round": rnd, "host": r["host"],
                "scheduled": sch,
                "fetched_200": int(r["fetched_200"]),
                "fetched_404": sch - int(r["fetched_200"]),
                "internal_links": int(r["internal_links"]),
                "external_links": int(r["external_links"]),
            })
            discovered_all.update(r["discovered"])
        for d in sorted(discovered_all):
            self._seen_host(d, rnd)
        _mark("stats_rows")

        # -- snapshot the driver state (the round checkpoint) ----------
        self.t_log.commit_state(rnd, self._state_dict())
        # watermarks advance only after the checkpoint LANDS: a failed
        # commit leaves the deltas pending for the next attempt
        self._ckpt_events = len(self.events)
        self._ckpt_metrics = len(self.metrics)
        _mark("commit_state")
        if _prof:
            parts = " ".join(
                f"{lbl}={_marks[i][1] - _marks[i - 1][1]:.2f}"
                for i, (lbl, _) in enumerate(_marks) if i)
            print(f"# round {rnd}: {parts}", flush=True)
        self.round_no += 1
        if self.compact_seen_every and \
                self.round_no % self.compact_seen_every == 0:
            self.compact_seen()
        if self.compact_tables_every and \
                self.round_no % self.compact_tables_every == 0:
            self.compact_tables()

    def _build_generations(self, hosts: list, schedule: "DataFrame | None",
                           stats_df: "DataFrame | None" = None):
        """SURVEY.md §8.3 frontier-update rule, one distributed pass for all
        generation-ending hosts. ``stats_df`` (the round's per-host
        fetch/parse aggregation) rides along in the counts collect so the
        whole round runs ONE driver action beyond its three table
        commits; returns the collected rows for the caller's metrics
        accounting."""
        import time as _time
        _prof = os.environ.get("DISCO_PROFILE") == "1"
        _t = _time.time()

        def _mark(lbl):
            nonlocal _t
            if _prof:
                now = _time.time()
                print(f"#   build_gen {lbl}={now - _t:.2f}", flush=True)
                _t = now
        sess = self.spark.createDataFrame(
            [(h, self.dom[h]["session"], self.dom[h]["gen"],
              self.dom[h]["scheme"]) for h in hosts],
            "host string, session int, gen int, scheme string")
        # collected links are derived from the crawl log (the log stores
        # each page's raw internal links, exactly like the reference's ES
        # docs) — no separate table, no extra per-round write
        log = self._view("crawl_log")
        if log is None:
            cand = self.spark.createDataFrame(
                [], "host string, link string, scheme string")
        else:
            cand = (log.join(F.broadcast(sess), ["host", "session", "gen"])
                    .select("host", F.explode("links").alias("link"), "scheme")
                    .distinct())
        # minus the generation's LAST chunk (this round's schedule)
        if schedule is not None:
            last_chunk = (schedule.filter(F.col("host").isin(hosts))
                          .select("host", "link").distinct())
            cand = cand.join(last_chunk, ["host", "link"], "left_anti")
        cand = (cand
                .withColumn("url_key", udfs.url_seen_key(F.col("link")))
                .withColumn("host_group", cf.host_group(F.col("host"))))
        # authoritative anti-join against this session's seen keys, with an
        # optional Bloom pre-pass that lets provably-new candidates skip it
        segments = [s for s in (self._seen_base, self._view("url_seen"))
                    if s is not None]
        if segments and self.seen_filter:
            seen = (segments[0] if len(segments) == 1
                    else segments[0].unionByName(segments[1]))
            cur_seen = (seen.join(F.broadcast(sess.select("host", "session")),
                                  ["host", "session"])
                        .select("host", "url_key").distinct())
            if self.seen_filter == "cuckoo":
                from .operators import cuckoo as filter_mod
            else:
                from .operators import bloom as filter_mod
            sidecar = filter_mod.build_sidecar(
                cur_seen, "url_key", "host", num_buckets=16)
            definitely_new, maybe = filter_mod.screen(
                cand, sidecar, "url_key", "host", num_buckets=16)
            cand = definitely_new.unionByName(
                maybe.join(cur_seen, ["host", "url_key"], "left_anti"))
        elif segments:
            # one anti-join per segment (equivalent to anti-joining the
            # union): the compacted base is bucketed+sorted on exactly
            # (host, url_key), so its scan feeds the SortMergeJoin with NO
            # exchange — only the per-round candidate side shuffles; the
            # un-compacted tail is broadcast-sized between compactions
            for seg in segments:
                seg_seen = (seg.join(
                    F.broadcast(sess.select("host", "session")),
                    ["host", "session"])
                    .select("host", "url_key").distinct())
                cand = cand.join(seg_seen, ["host", "url_key"], "left_anti")
        # within-batch key dedup: first raw link per key wins (the oracle
        # marks keys sequentially in sorted order)
        _mark("plan_cand")
        wk = Window.partitionBy("host", "url_key").orderBy("link")
        cand = (cand.withColumn("rn", F.row_number().over(wk))
                .filter(F.col("rn") == 1).drop("rn").persist())
        # fill the shared cand cache ONCE at natural parallelism (one
        # cheap parallel count over the round's delta). This (a) lets the
        # two table commits below run CONCURRENTLY — the r4 experiment
        # that measured concurrent commits slower raced both jobs into
        # materializing this cache; with the cache pre-filled the race is
        # gone — and (b) returns the exact candidate count that sizes the
        # seen append's output files from DATA instead of inheriting the
        # cached plan's partition count (32 near-empty files per round at
        # bench widths; ~1.5 M keys ≈ 100 MB per file at any width, so
        # wide rounds keep writing many files in parallel)
        n_cand = cand.count()
        _mark("cand_fill")
        # every survivor is seen-inserted, even ones the cap then drops
        new_seen = (cand.join(F.broadcast(sess.select("host", "session")), "host")
                    .select("host", "session", "host_group", "url_key")
                    .coalesce(int(n_cand // 1_500_000) + 1))
        nxt = cand.withColumn("link_raw", udfs.domainize(
            F.col("host"), F.col("link"), F.col("scheme")))
        if schedule is not None:
            nxt = nxt.join(
                last_chunk.select("host", F.col("link").alias("link_raw")),
                ["host", "link_raw"], "left_anti")
        w = Window.partitionBy("host").orderBy("link")
        nxt = (nxt.withColumn("ord", F.row_number().over(w))
               .filter(F.col("ord") <= self.cfg.max_pages)
               .join(F.broadcast(sess.select(
                   "host", "session", (F.col("gen") + 1).alias("gen"))),
                   ["host"])
               .select("host", "session", "gen", "ord", "link_raw"))
        nxt = nxt.persist()
        # the two commits touch different tables and both read only the
        # pre-filled cand cache; a mid-round kill discards BOTH tables'
        # uncheckpointed deltas on resume (rollback is per-table by round,
        # engine.resume), so commit order between them is immaterial —
        # overlap them so the frontier job's tail backfills the seen
        # write's idle executors (guide §2.6 shape)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_seen = pool.submit(self._append, "url_seen", new_seen)
            f_front = pool.submit(
                lambda: self._append("frontier", self._prepare(nxt)))
            prepared_delta = f_front.result()
            f_seen.result()
        _mark("seen_frontier_append")
        # ONE collect for everything the driver needs this round: raw
        # next-gen size (finish decision — an all-robots-filtered gen
        # still stays active one round, like the reference), prepared
        # size (the schedule cursor bound), and — when the caller hands
        # one in — the round's per-host fetch/parse stats
        counts_df = (nxt.groupBy("host").agg(F.count(F.lit(1)).alias("raw_n"))
                     .join(prepared_delta.groupBy("host")
                           .agg(F.count(F.lit(1)).alias("prep_n")),
                           "host", "full_outer"))
        if stats_df is not None:
            counts_df = stats_df.join(counts_df, "host", "full_outer")
        stats = counts_df.collect()
        _mark("counts_collect")
        raw_counts = {r["host"]: (r["raw_n"] or 0) for r in stats}
        counts = {r["host"]: (r["prep_n"] or 0) for r in stats}
        cand.unpersist()
        nxt.unpersist()
        for h in hosts:
            d = self.dom[h]
            if raw_counts.get(h, 0) == 0:
                self._event(self.round_no, h, "finished")
                self._finish_host(h)
            else:
                d.update(gen=d["gen"] + 1, cursor=0,
                         gen_size=counts.get(h, 0))
        return stats

    # ------------------------------------------------------------------
    # run / resume / results
    # ------------------------------------------------------------------
    def _state_dict(self) -> dict:
        """Round-checkpoint payload. ``dom`` is the full mutable state
        (O(active + seen hosts), compact 3-field entries for inactive
        hosts); events/metrics are PER-ROUND DELTAS — serializing the
        full accumulated lists made the checkpoint an O(rounds x hosts)
        serial term that grew every round (measured 0.1 -> 6 s/round
        over a 10-round 1000-host crawl). ``resume`` replays the deltas
        of every state snapshot in commit order, so the reconstructed
        lists are identical to the in-memory ones."""
        return {"round": self.round_no, "dom": self.dom,
                "events_delta": [list(e) for e in
                                 self.events[self._ckpt_events:]],
                "metrics_delta": self.metrics[self._ckpt_metrics:]}

    def run(self, max_rounds: "int | None" = None) -> dict:
        import time as _time
        max_rounds = max_rounds or self.cfg.max_rounds
        self.round_walls: list = []   # (round_no, wall_secs) per step
        while self.round_no < max_rounds:
            states = {h: d["state"] for h, d in self.dom.items()}
            groups = {h: d["group"] for h, d in self.dom.items()}
            active = [h for h, s in states.items() if s == "active"]
            startable = lifecycle.pick_domains(
                states, groups, {groups[h] for h in active},
                self.round_no, self.cfg.steward_batch)
            if not active and not startable:
                break
            _t0 = _time.time()
            self.step()
            self.round_walls.append((self.round_no - 1, _time.time() - _t0))
        # persist the metrics + domain-event tables (queryable forms of the
        # per-round stats carried in the state snapshots; events mirror the
        # reference's domain-lifecycle ES index, worker.py:535-547)
        # driver-built frames are small: always a single file each
        if self.metrics:
            # explicit schema + tuple rows: createDataFrame over a list of
            # dicts pays a full-list schema-inference pass on the driver
            # (measured ~5 s for a 10-round run's metrics)
            # column order/types match what dict inference produced
            # (alphabetical keys, longs) so downstream readers see the
            # identical table schema
            self.t_metrics.overwrite(
                self.spark.createDataFrame(
                    [(m["external_links"], m["fetched_200"],
                      m["fetched_404"], m["host"], m["internal_links"],
                      m["round"], m["scheduled"])
                     for m in self.metrics],
                    "external_links bigint, fetched_200 bigint, "
                    "fetched_404 bigint, host string, "
                    "internal_links bigint, round bigint, scheduled bigint")
                .repartition(1), self.round_no)
        if self.events:
            self.cat.table("domain_events").overwrite(
                self.spark.createDataFrame(
                    [(r, h, m) for r, h, m in self.events],
                    "round int, host string, event string")
                .repartition(1), self.round_no)
        # drop cached deltas; later reads come from the committed snapshots
        self._release()
        return {"rounds": self.round_no,
                "states": {h: d["state"] for h, d in self.dom.items()}}

    @classmethod
    def resume(cls, spark, pages, robots_corpus, host_attrs, warehouse,
               config=None) -> "CrawlEngine":
        """Rebuild an engine from the latest committed round checkpoint.

        Crash-safe against mid-round kills: a round's table appends land
        before its ``commit_state`` checkpoint, so after an abort the head
        snapshots can be op='append' deltas of a round that never finished.
        Recovery scans history for the newest real checkpoint (op='state')
        and ROLLS BACK frontier/url_seen/crawl_log to their last snapshot of
        that round — aborted deltas are discarded from every view, and the
        re-run round recomputes them identically (the engine is
        deterministic given the checkpoint state)."""
        eng = cls(spark, pages, robots_corpus, host_attrs, warehouse,
                  config=config)
        ckpt = next((s for s in reversed(eng.t_log.history())
                     if s["op"] == "state" and s.get("state")), None)
        if ckpt is None:
            # no finished round: start over from scratch
            for name in ("frontier", "url_seen", "crawl_log"):
                eng._table(name).rollback(None)
            return eng
        st = eng.t_log.load_state(ckpt["state"])
        eng.round_no = st["round"] + 1 if "round" in st else 0
        eng.dom = st["dom"]
        # events/metrics are per-round deltas (one per state snapshot):
        # replay every checkpoint up to and including the chosen one, in
        # commit order. Old-style full-list keys ("events"/"metrics")
        # replace instead of extend, so pre-delta checkpoints still load.
        eng.events, eng.metrics = [], []
        for s in eng.t_log.history():
            if s["op"] != "state" or not s.get("state"):
                continue
            if s["id"] > ckpt["id"]:
                break
            ss = s["state"]
            if "events" in ss:
                eng.events = [tuple(e) for e in ss["events"]]
            eng.events.extend(tuple(e) for e in ss.get("events_delta", []))
            if "metrics" in ss:
                eng.metrics = list(ss["metrics"])
            eng.metrics.extend(ss.get("metrics_delta", []))
        eng._ckpt_events = len(eng.events)
        eng._ckpt_metrics = len(eng.metrics)
        ckpt_round = st.get("round", -1)
        for name in ("frontier", "url_seen", "crawl_log"):
            t = eng._table(name)
            good = [s for s in t.history() if s["round"] <= ckpt_round]
            t.rollback(good[-1]["id"] if good else None)
        return eng

    def crawl_order(self) -> list:
        df = self._view("crawl_log")
        if df is None:
            return []
        rows = (df.select("round", "host", "seq", "url")
                .orderBy("round", "host", "seq").collect())
        return [(r["round"], r["host"], r["seq"], r["url"]) for r in rows]

    def url_seen_set(self) -> set:
        df = self._seen_view()
        if df is None:
            return set()
        return {(r["host_group"], r["url_key"])
                for r in df.select("host_group", "url_key").distinct().collect()}

    def metrics_df(self) -> "DataFrame | None":
        """Per-round per-host fetch/parse metrics as a DataFrame (the
        table-shaped view of the round-state snapshots)."""
        if not self.metrics:
            return None
        return self.spark.createDataFrame(self.metrics)

    def texts(self) -> dict:
        df = self._view("crawl_log")
        if df is None:
            return {}
        rows = (df.filter(F.col("text").isNotNull())
                .select("url", "text").distinct().collect())
        return {r["url"]: r["text"] for r in rows}


# ---------------------------------------------------------------------------
# self-test: engine vs oracle end-to-end
# ---------------------------------------------------------------------------


def selftest(tmpdir: "str | None" = None, **corpus_kwargs) -> bool:
    import shutil
    import tempfile

    from . import corpus as corpus_mod, refsim
    from .session import build_session

    c = corpus_mod.generate(**corpus_kwargs)
    sim = refsim.Simulator(c).run()

    spark = build_session("disco-selftest")
    wh = tmpdir or tempfile.mkdtemp(prefix="disco_wh_")
    try:
        pages = spark.createDataFrame(
            [(r["url"], r["warc_ts"], bytearray(r["html"]), r["text"], r["lang"],
              r.get("redirect_to"))
             for r in c.page_rows()],
            "url string, warc_ts timestamp, html binary, text string, lang string, redirect_to string")
        eng = CrawlEngine(spark, pages, c.robots, c.hosts, wh, seeds=c.seeds)
        eng.run()
        ok = True
        order_s, order_e = sim.order, eng.crawl_order()
        if order_s != order_e:
            ok = False
            print(f"ORDER MISMATCH: sim={len(order_s)} eng={len(order_e)}")
            for a, b in zip(order_s, order_e):
                if a != b:
                    print("  first diff:", a, "vs", b)
                    break
        seen_s = {(g, k) for g, ks in sim.url_seen.items() for k in ks}
        if seen_s != eng.url_seen_set():
            ok = False
            print(f"SEEN MISMATCH: sim={len(seen_s)} eng={len(eng.url_seen_set())}")
        texts_e = eng.texts()
        bad_text = [u for u, t in sim.texts.items()
                    if texts_e.get(u, "").encode() != t.encode()]
        if bad_text:
            ok = False
            print(f"TEXT MISMATCH on {len(bad_text)} urls, e.g. {bad_text[:3]}")
        ev_s, ev_e = set(sim.events), set(eng.events)
        if ev_s != ev_e:
            ok = False
            print("EVENT MISMATCH:", ev_s ^ ev_e)
        print("SELFTEST", "PASS" if ok else "FAIL",
              f"({len(order_s)} fetches, {eng.round_no} rounds)")
        return ok
    finally:
        if tmpdir is None:
            shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    import sys
    if "--selftest" in sys.argv:
        sys.exit(0 if selftest() else 1)
